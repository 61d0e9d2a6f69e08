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


def _knn_single(query: jnp.ndarray, ref: jnp.ndarray, k: int, chunk: int):
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
        neg, idx = jax.lax.top_k(-d, k)                  # ascending distance
        return idx.astype(jnp.int32), -neg

    idx, dist = jax.lax.map(tile_body, tiles)
    idx = idx.reshape(-1, k)[:n]
    dist = dist.reshape(-1, k)[:n]
    return idx, jnp.maximum(dist, 0.0)


@partial(jax.jit, static_argnames=("k", "chunk"))
def knn(query: jnp.ndarray, ref: jnp.ndarray, k: int, chunk: int = 1024):
    """k nearest refs for each query point, ascending by distance.

    query: (..., N, D); ref: (..., M, D)
    Returns (idx (..., N, k) int32, sq_dist (..., N, k) float).
    """
    fn = _knn_single
    for _ in range(query.ndim - 2):
        fn = jax.vmap(fn, in_axes=(0, 0, None, None))
    return fn(query, ref, k, chunk)
