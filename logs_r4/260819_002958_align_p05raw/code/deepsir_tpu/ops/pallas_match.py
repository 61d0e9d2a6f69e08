"""Pallas TPU kernel: fused distance + argmin correspondence search.

The XLA path (ops/distance.py) computes each (TQ, M) distance tile with a
matmul, materializes it, then reduces — the tile round-trips through memory.
This kernel fuses the two: the grid walks (query block, ref tile); each step
is one (TQ, C) x (C, TR) MXU matmul immediately reduced into a running
(min-dist, argmin) accumulator held in VMEM scratch, written out on the last
ref tile. Exact (no approximation); ties resolve to the lowest index like
jnp.argmin.

Replaces the reference's stride-6000 chunked matching loop
(/root/reference/network/model.py:558-569) at the kernel level.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

QUERY_BLOCK = 512        # rows of src per grid step. 1024 halves the
                         # ref-tile reload traffic but measured SLOWER
                         # end-to-end on v5e (14.8 vs 15.3 pairs/sec — the
                         # 8 MB distance intermediate crowds VMEM and
                         # stalls the input pipeline); keep 512
REF_TILE = 2048          # columns of ref per grid step
LANE = 128               # feature dim padded to the f32 lane width


def _match_kernel(src_ref, refT_ref, ref_sq_ref, idx_out,
                  best_d, best_i):
    """Grid (i, j): query block i vs ref tile j.

    src_ref:   (QUERY_BLOCK, LANE) VMEM
    refT_ref:  (LANE, REF_TILE) VMEM
    ref_sq_ref:(1, REF_TILE) VMEM — +inf on padded columns
    idx_out:   (QUERY_BLOCK, 1) int32
    best_d/best_i: VMEM scratch (QUERY_BLOCK, 1), persists across j
    """
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        best_d[:] = jnp.full_like(best_d, jnp.inf)
        best_i[:] = jnp.zeros_like(best_i)

    # |s - r|^2 = |s|^2 + |r|^2 - 2 s.r ; |s|^2 is constant per row -> skip.
    # The dot inherits the AMBIENT matmul precision at trace time — the
    # model scopes it to cfg.matcher_matmul_precision (network.py). DEFAULT
    # is 2.1x faster than HIGHEST (2.1 ms vs 4.6 ms at 18000^2 x 64) at the
    # cost of rounding-order differences vs the XLA path on near-tied
    # neighbours (~0.6% of rows on random clouds, all equidistant
    # alternatives — harmless under the learned inlier filter; A/B'd at the
    # 128-pair held-out with exact descriptors: quality unchanged).
    prod = jnp.dot(src_ref[:], refT_ref[:],
                   preferred_element_type=jnp.float32)       # (TQ, TR) on MXU
    d = ref_sq_ref[:] - 2.0 * prod
    tile_best = jnp.min(d, axis=1, keepdims=True)            # (TQ, 1)
    tile_arg = jnp.argmin(d, axis=1, keepdims=True).astype(jnp.int32)
    tile_arg = tile_arg + j * REF_TILE
    take = tile_best < best_d[:]
    best_d[:] = jnp.where(take, tile_best, best_d[:])
    best_i[:] = jnp.where(take, tile_arg, best_i[:])

    @pl.when(j == nj - 1)
    def _():
        idx_out[:] = best_i[:]


def supported(n: int, m: int, c: int) -> bool:
    """The streamed-tile design supports any size with c <= LANE."""
    return c <= LANE


def _pad_axis(x, axis, multiple, value=0.0):
    rem = (-x.shape[axis]) % multiple
    if rem == 0:
        return x
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, rem)
    return jnp.pad(x, pad, constant_values=value)


def _match_bidir_kernel(src_ref, refT_ref, ref_sq_ref, src_sq_ref,
                        idx_out, ridx_out,
                        best_d, best_i, col_d):
    """Grid (i, j): query block i vs ref tile j, reducing BOTH directions.

    Row direction as in _match_kernel (running (min, argmin) over ref tiles
    in per-block scratch). Column direction: a full-width (1, M) distance
    scratch persists across the outer i sweep, and the argmins go straight
    into the full-width `ridx_out` block (constant index map -> one
    continuous VMEM-resident visit; Pallas forbids re-visiting a j-mapped
    output block across non-consecutive i iterations). Each tile's column
    reduction is over rows — the sublane direction, the cheap axis on TPU
    (the expensive cross-LANE reduction caveat from ops/pallas_knn.py does
    not apply). src_sq carries +inf on padded query rows so they can never
    win a column.
    """
    i = pl.program_id(0)
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        best_d[:] = jnp.full_like(best_d, jnp.inf)
        best_i[:] = jnp.zeros_like(best_i)

    @pl.when(i == 0)
    def _():
        col_d[:, pl.dslice(j * REF_TILE, REF_TILE)] = jnp.full(
            (1, REF_TILE), jnp.inf, col_d.dtype)
        ridx_out[:, pl.dslice(j * REF_TILE, REF_TILE)] = jnp.zeros(
            (1, REF_TILE), jnp.int32)

    prod = jnp.dot(src_ref[:], refT_ref[:],
                   preferred_element_type=jnp.float32)       # (TQ, TR) on MXU
    d = ref_sq_ref[:] - 2.0 * prod                           # row-relative
    tile_best = jnp.min(d, axis=1, keepdims=True)            # (TQ, 1)
    tile_arg = jnp.argmin(d, axis=1, keepdims=True).astype(jnp.int32)
    tile_arg = tile_arg + j * REF_TILE
    take = tile_best < best_d[:]
    best_d[:] = jnp.where(take, tile_best, best_d[:])
    best_i[:] = jnp.where(take, tile_arg, best_i[:])

    # column direction needs |s|^2 (constant per row, so the row argmin
    # skips it; across rows it matters)
    dc = d + src_sq_ref[:]                                   # (TQ, TR)
    ctile_best = jnp.min(dc, axis=0, keepdims=True)          # (1, TR)
    ctile_arg = (jnp.argmin(dc, axis=0, keepdims=True).astype(jnp.int32)
                 + i * QUERY_BLOCK)
    sl = pl.dslice(j * REF_TILE, REF_TILE)
    ctake = ctile_best < col_d[:, sl]
    col_d[:, sl] = jnp.where(ctake, ctile_best, col_d[:, sl])
    ridx_out[:, sl] = jnp.where(ctake, ctile_arg, ridx_out[:, sl])

    @pl.when(j == nj - 1)
    def _():
        idx_out[:] = best_i[:]


@partial(jax.jit, static_argnames=("low_precision",))
def match_argmin_bidirectional(src: jnp.ndarray, ref: jnp.ndarray,
                               low_precision: bool = False):
    """(N, C) x (M, C) -> (idx (N,), ridx (M,)) int32: nearest-ref index for
    every src row AND nearest-src index for every ref row, in ONE pass over
    the distance tiles.

    The mutual-consistency gate (ops/distance.py::mutual_gate) needs both
    directions; two `match_argmin_single` calls would stream every tile
    twice. This kernel reduces each (QUERY_BLOCK, REF_TILE) tile into both a
    row accumulator (per-block scratch, as in the one-directional kernel)
    and a column accumulator (full-width (1, M) scratch that persists
    across the outer query sweep — 2 x 4 x M bytes of VMEM, ~150 KB at
    M=18432). Tie-break is lowest index in both directions, matching
    jnp.argmin.
    """
    n0, c = src.shape
    m0 = ref.shape[0]
    assert c <= LANE, c
    src = _pad_axis(_pad_axis(src, 0, QUERY_BLOCK), 1, LANE)
    ref = _pad_axis(ref, 0, REF_TILE)
    n, m = src.shape[0], ref.shape[0]
    refT = _pad_axis(ref.T, 0, LANE)                         # (LANE, M)
    ref_sq = jnp.sum(ref * ref, axis=-1)
    ref_sq = jnp.where(jnp.arange(m) >= m0, jnp.inf, ref_sq)[None, :]
    src_sq = jnp.sum(src * src, axis=-1)
    src_sq = jnp.where(jnp.arange(n) >= n0, jnp.inf, src_sq)[:, None]
    if low_precision:
        src = src.astype(jnp.bfloat16)
        refT = refT.astype(jnp.bfloat16)

    grid = (n // QUERY_BLOCK, m // REF_TILE)
    idx, ridx = pl.pallas_call(
        _match_bidir_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((QUERY_BLOCK, LANE), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((LANE, REF_TILE), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, REF_TILE), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((QUERY_BLOCK, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((QUERY_BLOCK, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, m), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((QUERY_BLOCK, 1), jnp.float32),
            pltpu.VMEM((QUERY_BLOCK, 1), jnp.int32),
            pltpu.VMEM((1, m), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * n * m * LANE,
            bytes_accessed=(n * LANE + m * LANE) * 4 + (n + m) * 4,
            transcendentals=0),
    )(src, refT, ref_sq, src_sq)
    return idx[:n0, 0], ridx[0, :m0]


@partial(jax.jit, static_argnames=("low_precision",))
def match_argmin_single(src: jnp.ndarray, ref: jnp.ndarray,
                        low_precision: bool = False) -> jnp.ndarray:
    """(N, C) x (M, C) -> (N,) int32 nearest-ref index under squared L2.

    Pads internally: query rows are computed and sliced off; padded ref
    columns get +inf norms so they can never win; the feature dim is
    zero-padded to the lane width (adds nothing to the dot product).

    low_precision=True feeds the MXU bf16 operands (fp32 accumulation,
    fp32 |r|^2 correction): half the tile traffic and twice the MXU rate
    for descriptors that are L2-normalized O(1 ) values — deviations are
    near-tie swaps, the same class as the DEFAULT-precision note above.
    """
    n0, c = src.shape
    m0 = ref.shape[0]
    assert c <= LANE, c
    src = _pad_axis(_pad_axis(src, 0, QUERY_BLOCK), 1, LANE)
    ref = _pad_axis(ref, 0, REF_TILE)
    n, m = src.shape[0], ref.shape[0]
    refT = _pad_axis(ref.T, 0, LANE)                         # (LANE, M)
    ref_sq = jnp.sum(ref * ref, axis=-1)
    ref_sq = jnp.where(jnp.arange(m) >= m0, jnp.inf, ref_sq)[None, :]
    if low_precision:
        src = src.astype(jnp.bfloat16)
        refT = refT.astype(jnp.bfloat16)

    grid = (n // QUERY_BLOCK, m // REF_TILE)
    out = pl.pallas_call(
        _match_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((QUERY_BLOCK, LANE), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((LANE, REF_TILE), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, REF_TILE), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((QUERY_BLOCK, 1), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 1), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((QUERY_BLOCK, 1), jnp.float32),
            pltpu.VMEM((QUERY_BLOCK, 1), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * n * m * LANE,
            bytes_accessed=(n * LANE + m * LANE) * 4 + n * 4,
            transcendentals=0),
    )(src, refT, ref_sq)
    return out[:n0, 0]
