"""Worker process for the multi-host runtime test (tests/test_multiprocess.py).

Each worker owns 4 virtual CPU devices; two workers rendezvous through the
JAX coordination service into one 8-device global mesh and run one sharded
train step — the single-machine stand-in for a 2-host TPU slice (per
SURVEY.md §4: multi-chip is tested via xla_force_host_platform_device_count
mesh simulation).

Usage: python multiprocess_worker.py <process_id> <num_processes> <port>
Prints "RESULT <loss> <devices>" on success.
"""
import os
import sys

proc_id, num_proc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["DEEPSIR_COORDINATOR"] = f"localhost:{port}"
os.environ["DEEPSIR_NUM_PROCESSES"] = str(num_proc)
os.environ["DEEPSIR_PROCESS_ID"] = str(proc_id)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from deepsir_tpu.parallel.distributed import initialize_from_env  # noqa: E402

assert initialize_from_env()
assert jax.process_count() == num_proc, jax.process_count()
assert jax.device_count() == 4 * num_proc, jax.device_count()

import numpy as np  # noqa: E402

from deepsir_tpu.config import Config, DataConfig, ModelConfig, replace  # noqa: E402
from deepsir_tpu.parallel.mesh import make_mesh  # noqa: E402
from deepsir_tpu.parallel.sharded import (make_sharded_train_step,  # noqa: E402
                                          replicate_state, shard_batch)
from deepsir_tpu.training import create_train_state, make_optimizer  # noqa: E402

model_cfg = ModelConfig(feat_len=3, num_points=128, num_knn=8,
                        sub_sampling_ratio=(4, 4), d_out=(8, 16),
                        out_feat_dim=16, num_classes=5, num_train_reg_iter=1,
                        num_reg_iter=1)
cfg = Config(pipeline="align", model=model_cfg,
             data=DataConfig(dataset_type="Synthetic")).resolved()
cfg = replace(cfg, train=replace(cfg.train, batch_size=8))

GLOBAL_BATCH = 8
rng = np.random.default_rng(0)          # identical global batch on every host
arrays = {
    "points_src": rng.normal(size=(GLOBAL_BATCH, 128, 3)).astype(np.float32),
    "points_ref": rng.normal(size=(GLOBAL_BATCH, 128, 3)).astype(np.float32),
    "transform_gt": np.tile(np.eye(3, 4, dtype=np.float32),
                            (GLOBAL_BATCH, 1, 1)),
}

# params are initialized identically on every process (same seed)
model, state = create_train_state(cfg, arrays, steps_per_epoch=10)
tx = make_optimizer(cfg, 10)

mesh = make_mesh()                       # over GLOBAL devices
assert mesh.shape["data"] == 4 * num_proc

state = replicate_state(mesh, state)
step = make_sharded_train_step(cfg, model, tx, mesh)

# each process feeds its local half of the global batch
per_proc = GLOBAL_BATCH // num_proc
local = {k: v[proc_id * per_proc:(proc_id + 1) * per_proc]
         for k, v in arrays.items()}
dev_batch = shard_batch(mesh, local)

new_state, aux = step(state, dev_batch, jax.random.PRNGKey(0))
loss = float(np.asarray(jax.device_get(aux["loss"])))
assert np.isfinite(loss)
print(f"RESULT {loss:.10f} {jax.device_count()}", flush=True)
