"""Pallas TPU kernel: fused distance + top-k for the KNN index pyramid.

The XLA KNN path (ops/knn.py) materializes each (chunk, M) distance tile in
HBM before the ApproxTopK custom call consumes it — at the 18000-point
protocol that is ~2.6 GB of HBM write+read traffic per cloud per pyramid
level 0, on a forward that is HBM-bandwidth-bound (BASELINE.md: 31.5 GB
accessed, arithmetic intensity 3.6 FLOP/byte). This kernel keeps every
distance tile in VMEM: the grid walks (query block, ref tile); each step
computes exact squared distances by direct subtraction (numerically BETTER
than the |a|^2+|b|^2-2ab expansion the XLA path must use for the MXU — no
large-norm cancellation), packs them into sortable int32 keys, and folds a
per-tile candidate set into a running per-row top-k held in VMEM scratch.
Only the points come in and only (N, k) indices/distances go out.

Key packing: squared distances are non-negative, so their f32 bit pattern
is order-preserving under int32 comparison. The low bits of the key are
replaced with the global ref index (15 bits for M <= 32768, growing to 17
at the 131072-ref cap): one min-reduce then yields both the (quantized)
distance and its argmin, and ties resolve to the lowest index (the XLA
path's convention). Quantization keeps 8 mantissa bits (relative distance
error <= 2^-9 ~ 0.2%; 6 bits at the cap), which can only reorder near-tied
neighbours — the same class of deviation as the ApproxTopK path the model
already runs at recall_target 0.95.

Selection is exact within a tile set when the ref fits one tile; across
tiles each 128-lane bucket contributes its minimum per grid step (ApproxTopK
style partial reduce). Measured recall vs the exact oracle at the pyramid's
shapes is ~0.99 (tests/test_pallas_knn.py pins a floor).

Replaces torch_points_kernels.knn (reference dataloader/data_base.py:13,
153-183) at the kernel level for the in-graph pyramid build.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

QUERY_BLOCK = 256        # query rows per grid step
REF_TILE = 2048          # ref columns per grid step
DIM_PAD = 8              # xyz (or xyz+extras) padded to one sublane group
MIN_IDX_BITS = 15        # index width grows with M, up to MAX_IDX_BITS
MAX_IDX_BITS = 17        # 131072 refs; keeps >= 6 mantissa bits in the key
_KEY_MAX = np.int32(np.iinfo(np.int32).max)


def _idx_bits(m: int) -> int:
    bits = MIN_IDX_BITS
    while (1 << bits) < m:
        bits += 1
    return bits


def supported(m: int, d: int, k: int) -> bool:
    """Ref size within index capacity, coords within one sublane group."""
    return k <= m <= (1 << MAX_IDX_BITS) and d <= DIM_PAD and 1 <= k <= 128


def _knn_kernel(q_ref, rT_ref, idx_out, dist_out, cand_buf,
                *, k: int, d_real: int, m_real: int, bucket_w: int,
                idx_mask: int):
    """Grid (i, j): query block i vs ref tile j; `cand_buf` persists over j.

    q_ref:    (QUERY_BLOCK, DIM_PAD) VMEM — query coords
    rT_ref:   (DIM_PAD, REF_TILE) VMEM — ref coords, transposed
    idx_out:  (QUERY_BLOCK, k) int32
    dist_out: (QUERY_BLOCK, k) f32 (quantized, see module docstring)
    cand_buf: (QUERY_BLOCK, bucket_w * nj) int32 scratch — per-tile bucket
              minima; the k-pass selection runs ONCE per query block on the
              last ref tile (cross-lane min reductions are the expensive VPU
              op here — doing top-k merging per tile was measured 3-4x
              slower end-to-end than the XLA ApproxTopK path it replaces)
    """
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    # exact squared distance by direct subtraction (no norm cancellation)
    q = q_ref[:]
    acc = jnp.zeros((QUERY_BLOCK, REF_TILE), jnp.float32)
    for dd in range(d_real):
        diff = q[:, dd:dd + 1] - rT_ref[dd:dd + 1, :]
        acc = acc + diff * diff

    gcol = j * REF_TILE + jax.lax.broadcasted_iota(
        jnp.int32, (QUERY_BLOCK, REF_TILE), 1)
    key_mask = np.int32(~idx_mask)
    key = (pltpu.bitcast(acc, jnp.int32) & key_mask) | gcol
    key = jnp.where(gcol >= m_real, _KEY_MAX, key)

    if bucket_w == REF_TILE:
        cand = key                                   # exact: keep every col
    else:
        # ApproxTopK-style partial reduce: bucket b holds the columns
        # congruent to b mod bucket_w; elementwise slab minima only
        cand = key[:, 0:bucket_w]
        for g in range(1, REF_TILE // bucket_w):
            cand = jnp.minimum(cand, key[:, g * bucket_w:(g + 1) * bucket_w])
    cand_buf[:, pl.dslice(j * bucket_w, bucket_w)] = cand

    @pl.when(j == nj - 1)
    def _():
        # k selection passes of (extract global min, mask it out); keys are
        # globally unique (the low bits are the ref index) so each pass
        # consumes exactly one element per row
        buf = cand_buf[:]
        mins = []
        for _ in range(k):
            m = jnp.min(buf, axis=1, keepdims=True)  # (TQ, 1)
            mins.append(m)
            buf = jnp.where(buf == m, _KEY_MAX, buf)
        best = jnp.concatenate(mins, axis=1)         # (TQ, k) ascending
        idx_out[:] = best & idx_mask
        dist_out[:] = pltpu.bitcast(best & key_mask, jnp.float32)


def _pad_axis(x, axis, multiple, value=0.0):
    rem = (-x.shape[axis]) % multiple
    if rem == 0:
        return x
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, rem)
    return jnp.pad(x, pad, constant_values=value)


@partial(jax.jit, static_argnames=("k",))
def knn_topk_single(query: jnp.ndarray, ref: jnp.ndarray, k: int):
    """(N, D) x (M, D) -> (idx (N, k) int32, sq_dist (N, k) f32), ascending.

    D <= 8, M <= 131072 (see `supported`). Distances are computed exactly
    in f32 and quantized to 8 (>= 6 for M > 32768) mantissa bits in the
    returned values / selection keys. Selection is exact for M <= REF_TILE
    and ~0.99-recall bucketed partial-reduce beyond that.
    """
    n0, d = query.shape
    m0 = ref.shape[0]
    assert supported(m0, d, k), (m0, d, k)
    q = _pad_axis(_pad_axis(query.astype(jnp.float32), 0, QUERY_BLOCK), 1,
                  DIM_PAD)
    rT = _pad_axis(_pad_axis(ref.astype(jnp.float32).T, 0, DIM_PAD), 1,
                   REF_TILE)
    n = q.shape[0]
    m = rT.shape[1]
    grid = (n // QUERY_BLOCK, m // REF_TILE)

    # exact selection when the ref fits one tile; otherwise 128-wide buckets
    bucket_w = REF_TILE if grid[1] == 1 else 128
    kernel = partial(_knn_kernel, k=k, d_real=d, m_real=m0,
                     bucket_w=bucket_w,
                     idx_mask=(1 << _idx_bits(m)) - 1)
    idx, dist = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((QUERY_BLOCK, DIM_PAD), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((DIM_PAD, REF_TILE), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((QUERY_BLOCK, k), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((QUERY_BLOCK, k), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, k), jnp.int32),
            jax.ShapeDtypeStruct((n, k), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((QUERY_BLOCK, bucket_w * grid[1]),
                                   jnp.int32)],
        cost_estimate=pl.CostEstimate(
            flops=3 * n * m * d,
            bytes_accessed=(n + m) * DIM_PAD * 4 + n * k * 8,
            transcendentals=0),
    )(q, rT)
    return idx[:n0], dist[:n0]


def knn_topk(query: jnp.ndarray, ref: jnp.ndarray, k: int):
    """Batched wrapper: (..., N, D) x (..., M, D) -> (..., N, k) x2."""
    fn = partial(knn_topk_single, k=k)
    for _ in range(query.ndim - 2):
        fn = jax.vmap(fn, in_axes=(0, 0))
    return fn(query, ref)


# ---------------------------------------------------------------- windowed

def supported_windowed(m: int, d: int, k: int) -> bool:
    return supported(m, d, k)


def _knn_windowed_kernel(q_ref, rT_ref, idx_out, dist_out, cand_buf,
                         *, k: int, d_real: int, m_real: int, width: int,
                         start_block, vb: int, idx_mask: int):
    """Grid (i, j): query tile i vs window block j of its curve-rank window.

    Identical distance/key scheme to _knn_kernel, but the ref operand walks
    only the `width` blocks starting at start_block(i) (ops/window.py — the
    SAME formula the gather kernels use, so every returned index lands in
    the consumers' value windows). Selection keeps every in-window column
    (cand_buf holds the full window) and is exact within it.
    """
    j = pl.program_id(1)
    b0 = start_block(pl.program_id(0))

    q = q_ref[:]
    nq = q.shape[0]
    acc = jnp.zeros((nq, vb), jnp.float32)
    for dd in range(d_real):
        diff = q[:, dd:dd + 1] - rT_ref[dd:dd + 1, :]
        acc = acc + diff * diff

    gcol = (b0 + j) * vb + jax.lax.broadcasted_iota(jnp.int32, (nq, vb), 1)
    key_mask = np.int32(~idx_mask)
    key = (pltpu.bitcast(acc, jnp.int32) & key_mask) | gcol
    key = jnp.where(gcol >= m_real, _KEY_MAX, key)
    cand_buf[:, pl.dslice(j * vb, vb)] = key

    @pl.when(j == width - 1)
    def _():
        buf = cand_buf[:]
        mins = []
        for _ in range(k):
            m = jnp.min(buf, axis=1, keepdims=True)
            mins.append(m)
            buf = jnp.where(buf == m, _KEY_MAX, buf)
        best = jnp.concatenate(mins, axis=1)
        idx_out[:] = best & idx_mask
        dist_out[:] = pltpu.bitcast(best & key_mask, jnp.float32)


@partial(jax.jit, static_argnames=("k", "halo"))
def knn_topk_windowed_single(query: jnp.ndarray, ref: jnp.ndarray, k: int,
                             halo: int):
    """Curve-rank-windowed fused KNN: (N, D) x (M, D) -> (N, k) x2.

    Requires curve-sorted inputs (ops/morton.py). Exact within the
    ops/window.py window (distances quantized as in knn_topk_single);
    recall vs unrestricted search is the measured window coverage.
    """
    from deepsir_tpu.ops.window import TQ, VB, window_geometry, windowed
    n0, d = query.shape
    m0 = ref.shape[0]
    assert supported_windowed(m0, d, k) and windowed(n0, m0, halo), \
        (m0, d, k, halo)
    width, start_block = window_geometry(n0, m0, halo)
    q = _pad_axis(_pad_axis(query.astype(jnp.float32), 0, TQ), 1, DIM_PAD)
    rT = _pad_axis(_pad_axis(ref.astype(jnp.float32).T, 0, DIM_PAD), 1, VB)
    n = q.shape[0]
    m = rT.shape[1]
    grid = (n // TQ, width)

    kernel = partial(_knn_windowed_kernel, k=k, d_real=d, m_real=m0,
                     width=width, start_block=start_block, vb=VB,
                     idx_mask=(1 << _idx_bits(m)) - 1)
    idx, dist = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TQ, DIM_PAD), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((DIM_PAD, VB),
                         lambda i, j: (0, start_block(i) + j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TQ, k), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TQ, k), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, k), jnp.int32),
            jax.ShapeDtypeStruct((n, k), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((TQ, VB * width), jnp.int32)],
        cost_estimate=pl.CostEstimate(
            flops=3 * n * width * VB * d,
            bytes_accessed=(n + width * VB) * DIM_PAD * 4 + n * k * 8,
            transcendentals=0),
    )(q, rT)
    return idx[:n0], dist[:n0]


def knn_topk_windowed(query: jnp.ndarray, ref: jnp.ndarray, k: int,
                      halo: int):
    """Batched wrapper: (..., N, D) x (..., M, D) -> (..., N, k) x2."""
    fn = partial(knn_topk_windowed_single, k=k, halo=halo)
    for _ in range(query.ndim - 2):
        fn = jax.vmap(fn, in_axes=(0, 0))
    return fn(query, ref)
