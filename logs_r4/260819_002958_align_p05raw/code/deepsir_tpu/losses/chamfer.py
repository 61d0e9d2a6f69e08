"""Chamfer-distance losses, tiled (never materializes N x M).

Equivalent surface to the reference's ChamferLoss family
(/root/reference/network/loss.py:350-480, 626-649), channel-last, with the
distance reductions going through the tiled kernels in ops/distance.py.
"""
from __future__ import annotations

import jax.numpy as jnp

from deepsir_tpu.ops.distance import min_square_distance, square_distance

_EPS = 1e-12


def single_side_chamfer(pc_src: jnp.ndarray, pc_dst: jnp.ndarray) -> jnp.ndarray:
    """mean_i min_j |src_i - dst_j| (reference ChamferLoss_Single).

    pc_src: (..., M, 3); pc_dst: (..., N, 3) -> scalar
    """
    d = jnp.sqrt(min_square_distance(pc_src, pc_dst) + _EPS)
    return jnp.mean(d)


def chamfer_loss(pc_src: jnp.ndarray, pc_dst: jnp.ndarray,
                 sigma_src: jnp.ndarray | None = None,
                 sigma_dst: jnp.ndarray | None = None) -> jnp.ndarray:
    """Symmetric chamfer distance, optionally score-weighted.

    pc_src/pc_dst: (..., M/N, 3); sigma_*: (..., M/N) keypoint scores.
    (reference ChamferLoss, loss.py:426-480)
    """
    if sigma_src is None or sigma_dst is None:
        fwd = jnp.mean(jnp.sqrt(min_square_distance(pc_src, pc_dst) + _EPS))
        bwd = jnp.mean(jnp.sqrt(min_square_distance(pc_dst, pc_src) + _EPS))
        return fwd + bwd

    # score-weighted variant needs the argmin partner's score — materialize
    # per-row argmin via the full matrix in moderate sizes only
    d = jnp.sqrt(square_distance(pc_src, pc_dst) + _EPS)       # (..., M, N)
    fwd_min = jnp.min(d, axis=-1)
    fwd_arg = jnp.argmin(d, axis=-1)
    sel_dst = jnp.take_along_axis(sigma_dst, fwd_arg, axis=-1)
    fwd = jnp.mean(fwd_min * (sigma_src + sel_dst) * 0.5)

    bwd_min = jnp.min(d, axis=-2)
    bwd_arg = jnp.argmin(d, axis=-2)
    sel_src = jnp.take_along_axis(sigma_src, bwd_arg, axis=-1)
    bwd = jnp.mean(bwd_min * (sigma_dst + sel_src) * 0.5)
    return fwd + bwd
