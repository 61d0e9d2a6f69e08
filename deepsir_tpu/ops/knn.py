"""Exact k-nearest-neighbour search, tiled for TPU.

TPU-native replacement for torch_points_kernels.knn (the reference's CPU
OpenMP extension used to build the RandLA index pyramid every batch,
/root/reference/dataloader/data_base.py:153-183). Runs in-graph so the
pyramid is built on-device inside the jitted step.

The (N, M) distance matrix is computed in query tiles (one (tile, 3) x (3, M)
matmul each) and each tile row is reduced with lax.top_k. Results match a
brute-force oracle exactly (same ordering by distance; ties broken by lowest
index, which is also top_k's behaviour on negated distances).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _knn_single(query: jnp.ndarray, ref: jnp.ndarray, k: int, chunk: int,
                recall_target: float):
    """query (N, D), ref (M, D) -> idx (N, k) int32, dist (N, k) sq-L2."""
    n = query.shape[0]
    rem = (-n) % chunk
    if rem:
        query = jnp.pad(query, ((0, rem), (0, 0)))
    tiles = query.reshape(-1, chunk, query.shape[1])
    ref_sq = jnp.sum(ref * ref, axis=-1)

    def tile_body(tile):
        d = (jnp.sum(tile * tile, axis=-1)[:, None]
             + ref_sq[None, :] - 2.0 * jnp.matmul(tile, ref.T, precision='highest'))     # (chunk, M)
        if k == 1:
            # top_k lowers to a full row sort on TPU; a plain argmin reduce
            # is ~two orders of magnitude cheaper for the k=1 interp search
            idx = jnp.argmin(d, axis=-1, keepdims=True).astype(jnp.int32)
            return idx, jnp.take_along_axis(d, idx, axis=-1)
        if recall_target >= 1.0:
            neg, idx = jax.lax.top_k(-d, k)              # exact, ascending
            return idx.astype(jnp.int32), -neg
        # approx_min_k lowers directly to the TPU ApproxTopK (PartialReduce)
        # custom call — unlike lax.top_k, whose sort+slice pattern fails to
        # rewrite to TopK inside scan bodies and degenerates into a full
        # 18000-wide row sort (profiled at 368 ms/call vs ~memory-bound for
        # the partial reduce). recall ~0.99 measured at target 0.95; the
        # RandLA neighbourhood aggregation is insensitive to that.
        dist, idx = jax.lax.approx_min_k(d, k, recall_target=recall_target)
        return idx.astype(jnp.int32), dist

    idx, dist = jax.lax.map(tile_body, tiles)
    idx = idx.reshape(-1, k)[:n]
    dist = dist.reshape(-1, k)[:n]
    return idx, jnp.maximum(dist, 0.0)


@partial(jax.jit, static_argnames=("k", "chunk", "recall_target"))
def knn(query: jnp.ndarray, ref: jnp.ndarray, k: int, chunk: int = 1024,
        recall_target: float = 0.95):
    """k nearest refs for each query point, ascending by distance.

    query: (..., N, D); ref: (..., M, D)
    Returns (idx (..., N, k) int32, sq_dist (..., N, k) float).

    recall_target < 1.0 uses the TPU-accelerated ApproxTopK reduction
    (exact on CPU, ~0.99 recall on TPU); pass 1.0 for guaranteed-exact.
    k=1 is always exact (argmin).
    """
    fn = _knn_single
    for _ in range(query.ndim - 2):
        fn = jax.vmap(fn, in_axes=(0, 0, None, None, None))
    return fn(query, ref, k, chunk, recall_target)
