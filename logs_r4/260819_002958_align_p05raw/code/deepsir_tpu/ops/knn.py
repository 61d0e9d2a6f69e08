"""k-nearest-neighbour search, tiled for TPU.

TPU-native replacement for torch_points_kernels.knn (the reference's CPU
OpenMP extension used to build the RandLA index pyramid every batch,
/root/reference/dataloader/data_base.py:153-183). Runs in-graph so the
pyramid is built on-device inside the jitted step.

Two paths, selected by `recall_target`:
  1.0   guaranteed-exact XLA path: the (N, M) distance matrix is computed
        in query tiles (one (tile, D) x (D, M) matmul each) and each tile
        row is reduced with lax.top_k (k=1: plain argmin).
  <1.0  TPU fast path. For low-dimensional points (D <= 8, M <= 32768) the
        fused Pallas kernel (ops/pallas_knn.py) streams distance tiles
        through VMEM — nothing (N, M)-sized ever touches HBM — at measured
        recall ~0.98-0.999 with distances quantized to 8 mantissa bits.
        Otherwise jax.lax.approx_min_k (the TPU ApproxTopK custom call) at
        the requested recall, which still materializes the distance tiles.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from deepsir_tpu.ops.window import TQ, VB, window_geometry


def _knn_single(query: jnp.ndarray, ref: jnp.ndarray, k: int, chunk: int,
                recall_target: float):
    """query (N, D), ref (M, D) -> idx (N, k) int32, dist (N, k) sq-L2.

    k > M (tiny deepest pyramid levels) pads by duplicating the farthest
    neighbour — every returned index stays valid for downstream gathers.
    """
    m = ref.shape[0]
    if k > m:
        idx, dist = _knn_single(query, ref, m, chunk, recall_target)
        idx = jnp.concatenate([idx] + [idx[:, -1:]] * (k - m), axis=1)
        dist = jnp.concatenate([dist] + [dist[:, -1:]] * (k - m), axis=1)
        return idx, dist
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
        if recall_target >= 1.0 or m <= 256:
            # exact path; also for tiny refs, where the ApproxTopK custom
            # call rejects k ~ M and a full sort is cheap anyway
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


def _knn_single_windowed(query: jnp.ndarray, ref: jnp.ndarray, k: int,
                         halo: int):
    """Curve-rank-windowed KNN: query (N, D) x ref (M, D) -> (N, k) x2.

    Valid ONLY for clouds sorted along a space-filling curve
    (ops/morton.py): each TQ-row query tile searches the value window of
    ops/window.py — exactly the window the gather kernels later read — and
    is EXACT within it. Selection misses only true neighbours outside the
    window (measured ceiling: scripts/morton_recall.py). XLA path, used on
    CPU and as the TPU fallback; the Pallas kernel
    (pallas_knn.knn_topk_windowed) computes the identical window.
    """
    n, d = query.shape
    m = ref.shape[0]
    width, start_block = window_geometry(n, m, halo)
    w = width * VB
    rem = (-n) % TQ
    if rem:
        query = jnp.pad(query, ((0, rem), (0, 0)))
    tiles = query.reshape(-1, TQ, d)
    starts = jnp.asarray([int(start_block(i)) * VB
                          for i in range(tiles.shape[0])], jnp.int32)
    ref_pad = jnp.pad(ref, ((0, (-m) % VB), (0, 0)))

    def tile_body(args):
        tile, start = args
        win = jax.lax.dynamic_slice(ref_pad, (start, 0), (w, d))
        dmat = (jnp.sum(tile * tile, axis=-1)[:, None]
                + jnp.sum(win * win, axis=-1)[None, :]
                - 2.0 * jnp.matmul(tile, win.T, precision="highest"))
        col = start + jnp.arange(w, dtype=jnp.int32)[None, :]
        dmat = jnp.where(col >= m, jnp.inf, dmat)
        if k == 1:
            idx = jnp.argmin(dmat, axis=-1, keepdims=True).astype(jnp.int32)
            return idx + start, jnp.take_along_axis(dmat, idx, axis=-1)
        neg, idx = jax.lax.top_k(-dmat, k)
        return idx.astype(jnp.int32) + start, -neg

    idx, dist = jax.lax.map(tile_body, (tiles, starts))
    return (idx.reshape(-1, k)[:n],
            jnp.maximum(dist.reshape(-1, k)[:n], 0.0))


# measured recall floor of the fused Pallas kernel (ops/pallas_knn.py);
# requests above this are routed to ApproxTopK, which honors the target
_PALLAS_RECALL_FLOOR = 0.98


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


@partial(jax.jit, static_argnames=("k", "chunk", "recall_target",
                                   "window_halo"))
def knn(query: jnp.ndarray, ref: jnp.ndarray, k: int, chunk: int = 1024,
        recall_target: float = 0.95, window_halo: int = 0):
    """k nearest refs for each query point, ascending by distance.

    query: (..., N, D); ref: (..., M, D)
    Returns (idx (..., N, k) int32, sq_dist (..., N, k) float).

    recall_target < 1.0 selects the TPU fast paths (fused Pallas kernel for
    low-D points, else ApproxTopK — exact on CPU, recall ~0.98+ on TPU);
    pass 1.0 for guaranteed-exact. k=1 on the XLA paths is a plain argmin.

    window_halo > 0 restricts the search to the ops/window.py curve-rank
    window — ONLY valid for curve-sorted clouds (ops/morton.py; the pyramid
    passes it under `sample="strided"`). Exact within the window; recall
    vs unrestricted search is bounded by the window coverage
    (scripts/morton_recall.py). No-op when the window covers the array.

    The Pallas kernels run at a FIXED measured recall (~0.98-0.999 within
    their search set, distances quantized to 8 mantissa bits), so they only
    serve requests that tolerate that floor (recall_target <= 0.98);
    callers asking for 0.98 < target < 1 get ApproxTopK at their target.
    """
    from deepsir_tpu.ops.window import windowed as _is_windowed
    if window_halo > 0 and _is_windowed(query.shape[-2], ref.shape[-2],
                                        window_halo):
        if recall_target <= _PALLAS_RECALL_FLOOR and _on_tpu():
            from deepsir_tpu.ops import pallas_knn
            if pallas_knn.supported_windowed(ref.shape[-2],
                                             query.shape[-1], k):
                return pallas_knn.knn_topk_windowed(query, ref, k,
                                                    window_halo)
        fn = _knn_single_windowed
        for _ in range(query.ndim - 2):
            fn = jax.vmap(fn, in_axes=(0, 0, None, None))
        return fn(query, ref, k, window_halo)
    if recall_target <= _PALLAS_RECALL_FLOOR and _on_tpu():
        from deepsir_tpu.ops import pallas_knn
        if pallas_knn.supported(ref.shape[-2], query.shape[-1], k):
            return pallas_knn.knn_topk(query, ref, k)
    fn = _knn_single
    for _ in range(query.ndim - 2):
        fn = jax.vmap(fn, in_axes=(0, 0, None, None, None))
    return fn(query, ref, k, chunk, recall_target)
