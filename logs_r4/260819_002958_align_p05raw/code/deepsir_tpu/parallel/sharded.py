"""Data-parallel train/eval steps over a device mesh.

The single-device steps in training.py are already pure jitted functions of
(state, batch-arrays, rng); scaling out is therefore a sharding annotation,
not a rewrite: batch arrays are sharded over the mesh's ``data`` axis,
parameters and optimizer state are replicated, and XLA inserts the gradient
all-reduce (psum over ICI) where the replicated-params/sharded-batch
contraction requires it.

This replaces nothing in the reference — it has no distributed runtime at
all (SURVEY.md §2.5) — and is where the >=20x pairs/sec/chip target comes
from: vmapped pair batching per chip x DP over the slice.
"""
from __future__ import annotations

from typing import Dict

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from deepsir_tpu.config import Config
from deepsir_tpu.parallel.matching import make_ring_matcher
from deepsir_tpu.parallel.mesh import (DATA_AXIS, MODEL_AXIS, batch_sharding,
                                       replicated)
from deepsir_tpu.training import (TrainState, make_eval_step, make_train_step)


def shard_batch(mesh: Mesh, arrays: Dict[str, np.ndarray]):
    """Place host batch arrays on the mesh, batch dim split over 'data'.

    Single-process: `arrays` is the GLOBAL batch (divisible by the data-axis
    size). Multi-process (after parallel.distributed.initialize_from_env):
    each process passes its LOCAL portion of the batch — the per-host loader
    shard — and the global array is assembled across processes without any
    cross-host data movement.
    """
    sh = batch_sharding(mesh)
    out = {}
    if jax.process_count() > 1:
        for k, v in arrays.items():
            out[k] = jax.make_array_from_process_local_data(sh, np.asarray(v))
        return out
    ndata = mesh.shape[DATA_AXIS]
    for k, v in arrays.items():
        assert v.shape[0] % ndata == 0, (
            f"batch dim {v.shape[0]} of '{k}' not divisible by data axis {ndata}")
        out[k] = jax.device_put(v, sh)
    return out


def replicate_state(mesh: Mesh, state: TrainState) -> TrainState:
    if jax.process_count() > 1:
        # device_put cannot target non-addressable devices; every process
        # holds an identical copy (same init seed / restored checkpoint), so
        # assembling the replicated global array from local data is exact
        rep = replicated(mesh)
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                rep, np.asarray(x)), state)
    return jax.device_put(state, replicated(mesh))


def model_with_mesh_matcher(model, mesh: Mesh, chunk: int = 1024):
    """Route the align forward's correspondence search through the
    ring-sharded matcher when the mesh has a model axis (>1 shard).

    The matcher is parameter-free, so the clone shares the original params —
    a checkpoint trained single-device runs point-sharded unchanged. This is
    the config-level switch that makes ref-cloud sharding (SURVEY §5.7) a
    model capability rather than a standalone library function.
    """
    if mesh.shape.get(MODEL_AXIS, 1) <= 1 or model.pipeline != "align":
        return model
    return model.clone(matcher=make_ring_matcher(mesh, chunk=chunk))


def make_sharded_train_step(cfg: Config, model, tx, mesh: Mesh):
    """Jitted DP train step: params replicated, batch sharded on 'data'.

    Returns a function (state, arrays, rng) -> (state, aux); inputs may be
    host arrays (they are placed according to the shardings at call time).
    """
    base = make_train_step(cfg, model_with_mesh_matcher(model, mesh), tx)
    rep = replicated(mesh)
    bat = batch_sharding(mesh)
    return jax.jit(
        base.__wrapped__,  # unwrap the inner fn; re-jit with shardings
        in_shardings=(rep, bat, rep),
        out_shardings=(rep, rep),
        donate_argnums=(0,))


def make_sharded_eval_step(cfg: Config, model, mesh: Mesh, num_iter=None):
    base = make_eval_step(cfg, model_with_mesh_matcher(model, mesh), num_iter)
    rep = replicated(mesh)
    bat = batch_sharding(mesh)
    return jax.jit(
        base.__wrapped__,
        in_shardings=(rep, bat),
        out_shardings=None)
