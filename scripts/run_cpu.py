"""Run a driver script on the CPU backend (exact fp32 arithmetic).

In this environment the env var alone is insufficient: jax reads
jax_platforms at import of the backend, and the axon plugin registers
itself regardless, so the config update must land before any backend
touch (see CLAUDE.md).  Usage:

    python scripts/run_cpu.py test.py --pipeline label ...
"""
import os
import runpy
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

script = sys.argv[1]
sys.argv = sys.argv[1:]
sys.path.insert(0, os.path.dirname(os.path.abspath(script)) or ".")
runpy.run_path(script, run_name="__main__")
