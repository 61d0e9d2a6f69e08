"""Multi-chip correspondence search: ref-cloud sharding over the mesh.

For clouds too large for one chip's HBM (or to cut per-chip matching time),
the reference cloud's points/features are sharded across the mesh's
``model`` axis and each chip reduces a *running* nearest-neighbour argmin
while reference shards rotate around the ring — the registration analog of
ring attention. Src rows only ever meet one ref shard at a time, so the
full N x M distance matrix never exists on any chip.

The reference has no counterpart (single device; its large-N strategy is a
stride-6000 chunk loop on one GPU, /root/reference/network/model.py:558-569).

Two strategies:
  * ``sharded_nearest_neighbour_index`` — each shard computes its local
    argmin, then one all_gather of (dist, idx) pairs (d x N values) and a
    final reduction. Simple; best when the axis is small.
  * ``ring_nearest_neighbour_index`` — ref shards rotate via ppermute over
    ICI, each hop overlapping the next shard's transfer with the current
    distance tile; memory per chip stays O(N + M/d). Best for long axes.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from deepsir_tpu.ops.distance import _nn_index_single
from deepsir_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS


def _local_min(src, ref_shard, chunk):
    """Per-src min distance and argmin against one ref shard.

    src (N, C), ref_shard (Ms, C) -> dist (N,), idx (N,) local to the shard.
    """
    n = src.shape[0]
    idx = _nn_index_single(src, ref_shard, chunk)
    d = jnp.sum((src - ref_shard[idx]) ** 2, axis=-1)
    return d, idx


def sharded_nearest_neighbour_index(feat_src: jnp.ndarray,
                                    feat_ref: jnp.ndarray,
                                    mesh: Mesh,
                                    axis: str = MODEL_AXIS,
                                    chunk: int = 1024) -> jnp.ndarray:
    """All-gather combine. feat_src (N, C) replicated, feat_ref (M, C)
    sharded on `axis`; returns global argmin indices (N,) int32."""
    nshards = mesh.shape[axis]
    m_total = feat_ref.shape[0]
    assert m_total % nshards == 0, (
        f"ref point count {m_total} must divide the '{axis}' axis "
        f"({nshards} shards); pad the cloud to a multiple")
    m_local = m_total // nshards

    def body(src, ref_shard):
        d, idx = _local_min(src, ref_shard, chunk)
        offset = jax.lax.axis_index(axis).astype(jnp.int32) * m_local
        d_all = jax.lax.all_gather(d, axis)            # (d, N)
        i_all = jax.lax.all_gather(idx + offset, axis)  # (d, N)
        win = jnp.argmin(d_all, axis=0)                # (N,)
        return jnp.take_along_axis(i_all, win[None, :], axis=0)[0]

    fn = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(axis, None)),
        out_specs=P(),
        # outputs are replicated by construction (every chip reduces over
        # all shards); the static checker can't prove it through the
        # gather/ppermute, so we assert it
        check_vma=False)
    return fn(feat_src, feat_ref)


def _ring_argmin_body(src, ref_shard, axis, nshards, m_local, chunk):
    """Ring reduction body; runs inside shard_map on one device.

    src (..., N, C) replicated on `axis`; ref_shard (..., Ms, C) is this
    device's slice. Returns global argmin indices (..., N) int32, identical
    on every device (lowest-global-index tie-break).
    """
    local_min = _local_min
    for _ in range(src.ndim - 2):
        local_min = jax.vmap(local_min, in_axes=(0, 0, None))
    me = jax.lax.axis_index(axis).astype(jnp.int32)
    perm = [(i, (i + 1) % nshards) for i in range(nshards)]
    best_d = jnp.full(src.shape[:-1], jnp.inf, src.dtype)
    best_i = jnp.zeros(src.shape[:-1], jnp.int32)

    def step(k, carry):
        best_d, best_i, shard = carry
        owner = jnp.mod(me - k, nshards).astype(jnp.int32)
        d, idx = local_min(src, shard, chunk)
        gidx = idx + owner * m_local
        take = (d < best_d) | ((d == best_d) & (gidx < best_i))
        best_d = jnp.where(take, d, best_d)
        best_i = jnp.where(take, gidx, best_i)
        shard = jax.lax.ppermute(shard, axis, perm)
        return best_d, best_i, shard

    best_d, best_i, _ = jax.lax.fori_loop(
        0, nshards, step, (best_d, best_i, ref_shard))
    return best_i


def make_ring_matcher(mesh: Mesh, axis: str = MODEL_AXIS,
                      data_axis: str = DATA_AXIS, chunk: int = 1024):
    """Build a batched matcher that shards the ref cloud over `axis`.

    Returns matcher(feat_src (B, N, C), feat_ref (B, M, C)) -> (B, N) int32,
    a drop-in for ops.distance.nearest_neighbour_index inside a jitted
    forward: the batch dim rides the `data_axis`, ref points are split over
    the `axis` ring, and the result is replicated along `axis` (every device
    reduces over all ref shards with a deterministic lowest-global-index
    tie-break). This is the in-model integration of the ring strategy — the
    replacement for the reference's single-GPU stride-6000 loop
    (/root/reference/network/model.py:558-569) at multi-chip scale.
    """
    nshards = mesh.shape[axis]

    def matcher(feat_src: jnp.ndarray, feat_ref: jnp.ndarray) -> jnp.ndarray:
        feat_src = jax.lax.stop_gradient(feat_src)
        feat_ref = jax.lax.stop_gradient(feat_ref)
        m_total = feat_ref.shape[-2]
        assert m_total % nshards == 0, (
            f"ref point count {m_total} must divide the '{axis}' axis "
            f"({nshards} shards); pad the cloud to a multiple")
        m_local = m_total // nshards

        def body(src, ref_shard):
            return _ring_argmin_body(src, ref_shard, axis, nshards,
                                     m_local, chunk)

        fn = jax.shard_map(
            body, mesh=mesh,
            in_specs=(P(data_axis), P(data_axis, axis, None)),
            out_specs=P(data_axis),
            # replicated along `axis` by construction (deterministic ring
            # reduction over all shards); the checker can't see through
            # ppermute, so we assert it
            check_vma=False)
        return fn(feat_src, feat_ref)

    return matcher


def ring_nearest_neighbour_index(feat_src: jnp.ndarray,
                                 feat_ref: jnp.ndarray,
                                 mesh: Mesh,
                                 axis: str = MODEL_AXIS,
                                 chunk: int = 1024) -> jnp.ndarray:
    """Ring combine: ref shards rotate by ppermute; each chip keeps a
    running (min-dist, global-idx) for its (replicated) src rows."""
    nshards = mesh.shape[axis]
    m_total = feat_ref.shape[0]
    assert m_total % nshards == 0, (
        f"ref point count {m_total} must divide the '{axis}' axis "
        f"({nshards} shards); pad the cloud to a multiple")
    m_local = m_total // nshards

    def body(src, ref_shard):
        # lowest-global-index tie-break keeps every device's reduction
        # identical despite different shard visit orders (exact ties are
        # routine: fixed_resample pads clouds by duplicating points), so the
        # replicated out_specs claim holds and matches jnp.argmin's
        # first-occurrence convention.
        return _ring_argmin_body(src, ref_shard, axis, nshards, m_local,
                                 chunk)

    fn = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(axis, None)),
        out_specs=P(),
        # outputs are replicated by construction (every chip reduces over
        # all shards); the static checker can't prove it through the
        # gather/ppermute, so we assert it
        check_vma=False)
    return fn(feat_src, feat_ref)
