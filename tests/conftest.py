"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated the standard JAX way — by forcing the host
platform to expose 8 virtual devices (no TPU needed; the driver separately
dry-runs the multi-chip path, see __graft_entry__.py).

Note: the environment's sitecustomize may register a TPU plugin and force
jax_platforms at interpreter startup, so setting the env var alone is not
enough — we re-override through jax.config before any backend is touched.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent CPU compile cache: makes scripts/run_tests.sh's fresh-interpreter
# per-file runs cheap, and shrinks the window for the rare XLA
# backend_compile segfault (cache hits skip compilation entirely).
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), os.pardir,
                               ".jax_cache_cpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.devices()[0].platform == "cpu", jax.devices()


@pytest.fixture
def rng():
    return np.random.default_rng(0)
