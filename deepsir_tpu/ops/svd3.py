"""Batched weighted Kabsch pose solve, fully in-graph.

The reference round-trips the 3x3 covariance to CPU float64 LAPACK every
registration iteration and falls back to the identity transform on SVD
failure (/root/reference/network/model.py:22-66 compute_rigid_transform_2).
On TPU the solve stays in-graph: the covariance is normalized for
conditioning, decomposed with a batched 3x3 SVD, the reflection case is fixed
via the det sign, and non-finite results select the identity transform with an
`invalid` flag (so the train step can skip the update, matching the
reference's failure semantics train.py:436-446).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-16


def svd3x3(mats: jnp.ndarray):
    """SVD of batched 3x3 matrices (..., 3, 3) -> (u, s, vt)."""
    return jnp.linalg.svd(mats, full_matrices=True)


def weighted_kabsch(src: jnp.ndarray, tgt: jnp.ndarray, weights: jnp.ndarray):
    """Weighted rigid alignment T with T*src ~= tgt.

    src, tgt: (..., M, 3) matched point pairs
    weights:  (..., M) per-pair weights (need not be normalized)

    Returns:
      transform: (..., 3, 4)
      invalid:   (...) bool — True where the solve produced non-finite values;
                 the returned transform is the identity there.
    """
    w = weights[..., None]                                          # (..., M, 1)
    w_norm = w / (jnp.sum(jnp.abs(w), axis=-2, keepdims=True) + _EPS)

    centroid_src = jnp.sum(src * w_norm, axis=-2)                   # (..., 3)
    centroid_tgt = jnp.sum(tgt * w_norm, axis=-2)
    src_c = src - centroid_src[..., None, :]
    tgt_c = tgt - centroid_tgt[..., None, :]
    cov = jnp.einsum("...mi,...mj->...ij", src_c, tgt_c * w_norm)   # (..., 3, 3)

    # Normalize for conditioning (scale-invariant for rotations) and sanitize
    # non-finite covariances so the SVD itself cannot poison gradients.
    scale = jnp.linalg.norm(cov, axis=(-2, -1), keepdims=True)
    cov_n = cov / (scale + _EPS)
    bad_cov = ~jnp.all(jnp.isfinite(cov_n), axis=(-1, -2))
    eye = jnp.broadcast_to(jnp.eye(3), cov.shape)
    cov_n = jnp.where(bad_cov[..., None, None], eye, cov_n)

    u, s, vt = svd3x3(cov_n)
    v = jnp.swapaxes(vt, -1, -2)
    ut = jnp.swapaxes(u, -1, -2)
    rot_pos = v @ ut
    # flip the last column of v where det < 0 (reflection fix, model.py:49-53)
    det = jnp.linalg.det(rot_pos)
    flip = jnp.where(det[..., None] > 0,
                     jnp.ones_like(det)[..., None],
                     jnp.concatenate([jnp.ones(det.shape + (2,)),
                                      -jnp.ones(det.shape + (1,))], axis=-1))
    rot = (v * flip[..., None, :]) @ ut                              # (..., 3, 3)

    trans = centroid_tgt - jnp.einsum("...ij,...j->...i", rot, centroid_src)
    transform = jnp.concatenate([rot, trans[..., None]], axis=-1)    # (..., 3, 4)

    invalid = bad_cov | ~jnp.all(jnp.isfinite(transform), axis=(-1, -2))
    ident = jnp.broadcast_to(jnp.eye(3, 4), transform.shape)
    transform = jnp.where(invalid[..., None, None], ident, transform)
    return transform, invalid


def weighted_kabsch_soft(src: jnp.ndarray, tgt: jnp.ndarray,
                         weights: jnp.ndarray):
    """Kabsch over a soft-assignment matrix (RPM-style).

    src: (..., M, 3); tgt: (..., N, 3); weights: (..., M, N)
    Computes weighted virtual target points then solves as in
    `weighted_kabsch` (reference compute_rigid_transform, model.py:68-116).
    """
    w_sum = jnp.sum(weights, axis=-1, keepdims=True)                 # (..., M, 1)
    virtual_tgt = jnp.einsum("...mn,...nc->...mc", weights, tgt) / (w_sum + _EPS)
    return weighted_kabsch(src, virtual_tgt, w_sum[..., 0])
