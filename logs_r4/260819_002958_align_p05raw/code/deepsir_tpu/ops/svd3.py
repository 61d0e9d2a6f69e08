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


_JACOBI_SWEEPS = 8


def _jacobi_eigh3(a: jnp.ndarray):
    """Eigendecomposition of batched symmetric 3x3 matrices by cyclic Jacobi
    rotations (fixed sweep count — a tiny static graph, unlike jnp.linalg's
    QDWH lowering on TPU whose compile time dominates whole-model builds).

    a: (..., 3, 3) symmetric. Returns (w (..., 3), v (..., 3, 3)) with
    a ~= v @ diag(w) @ v^T. Not sorted.
    """
    v = jnp.broadcast_to(jnp.eye(3, dtype=a.dtype), a.shape)
    for _ in range(_JACOBI_SWEEPS):
        for p, q in ((0, 1), (0, 2), (1, 2)):
            apq = a[..., p, q]
            app = a[..., p, p]
            aqq = a[..., q, q]
            # rotation angle zeroing a[p, q]
            theta = (aqq - app) / (2.0 * jnp.where(jnp.abs(apq) < 1e-30,
                                                   1.0, apq))
            t = jnp.sign(theta) / (jnp.abs(theta)
                                   + jnp.sqrt(theta * theta + 1.0))
            t = jnp.where(jnp.abs(apq) < 1e-30, 0.0, t)
            c = 1.0 / jnp.sqrt(t * t + 1.0)
            s = t * c
            j = jnp.broadcast_to(jnp.eye(3, dtype=a.dtype), a.shape)
            j = j.at[..., p, p].set(c).at[..., q, q].set(c)
            j = j.at[..., p, q].set(s).at[..., q, p].set(-s)
            a = jnp.swapaxes(j, -1, -2) @ a @ j
            v = v @ j
    return jnp.stack([a[..., 0, 0], a[..., 1, 1], a[..., 2, 2]], axis=-1), v


def _orthogonal_to(u: jnp.ndarray) -> jnp.ndarray:
    """Any unit vector orthogonal to u (..., 3), branchless."""
    # cross with the basis vector least aligned with u
    e = jnp.broadcast_to(jnp.eye(3, dtype=u.dtype), u.shape[:-1] + (3, 3))
    align = jnp.abs(u)
    pick = jnp.argmin(align, axis=-1)
    basis = jnp.take_along_axis(e, pick[..., None, None].repeat(3, -1),
                                axis=-2)[..., 0, :]
    c = jnp.cross(u, basis)
    return c / (jnp.linalg.norm(c, axis=-1, keepdims=True) + _EPS)


@jax.custom_vjp
def svd3x3(mats: jnp.ndarray):
    """SVD of batched 3x3 matrices (..., 3, 3) -> (u, s, vt), s descending.

    Closed-form route: Jacobi eigendecomposition of A^T A gives V and s^2;
    U columns are A v_i / s_i with orthonormal completion for (near-)zero
    singular values. Compiles to a small static graph — jnp.linalg.svd's TPU
    lowering (QDWH while-loops) takes minutes to compile inside large
    programs and is the reason the reference-style CPU round-trip was never
    an option here.

    Backward is a custom VJP with the standard square-SVD adjoint (the same
    formula torch.svd's backward uses, which is what the reference
    differentiates through at /root/reference/network/model.py:47), so the
    gradient does not unroll through the Jacobi sweeps. Near-degenerate
    singular-value gaps are Tikhonov-clamped.
    """
    return _svd3x3_impl(mats)


def _svd3x3_impl(mats: jnp.ndarray):
    ata = jnp.swapaxes(mats, -1, -2) @ mats
    w, v = _jacobi_eigh3(ata)
    order = jnp.flip(jnp.argsort(w, axis=-1), axis=-1)               # desc
    w = jnp.take_along_axis(w, order, axis=-1)
    v = jnp.take_along_axis(v, order[..., None, :], axis=-1)
    s = jnp.sqrt(jnp.clip(w, 0.0, None))                             # (..., 3)

    av = mats @ v                                                    # (..., 3, 3)
    # u columns with degenerate fallback
    u0 = av[..., :, 0] / jnp.where(s[..., 0:1] > 1e-12, s[..., 0:1], 1.0)
    u0 = jnp.where(s[..., 0:1] > 1e-12, u0,
                   jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0], mats.dtype),
                                    u0.shape))
    u0 = u0 / (jnp.linalg.norm(u0, axis=-1, keepdims=True) + _EPS)

    u1 = av[..., :, 1]
    u1 = u1 - jnp.sum(u1 * u0, axis=-1, keepdims=True) * u0          # re-orth
    n1 = jnp.linalg.norm(u1, axis=-1, keepdims=True)
    u1 = jnp.where(n1 > 1e-12, u1 / (n1 + _EPS), _orthogonal_to(u0))

    u2 = jnp.cross(u0, u1)

    u = jnp.stack([u0, u1, u2], axis=-1)                             # (..., 3, 3)
    # sign consistency for column 2: A v2 may point opposite u2
    sgn = jnp.sign(jnp.sum(av[..., :, 2] * u2, axis=-1))
    sgn = jnp.where(sgn == 0, 1.0, sgn)
    # fold the sign into v's column instead so A ~= U S V^T still holds
    v = v.at[..., :, 2].multiply(sgn[..., None])
    return u, s, jnp.swapaxes(v, -1, -2)


def _svd3x3_fwd(mats):
    out = _svd3x3_impl(mats)
    return out, out


def _svd3x3_bwd(res, cot):
    """Square-SVD adjoint (Townsend 2016): for A = U S V^T,
    dA = U [diag(ds) + (F o (U^T dU - dU^T U)) S + S (F o (V^T dV - dV^T V))] V^T
    with F_ij = 1 / (s_j^2 - s_i^2) off-diagonal, clamped near degeneracy.
    """
    u, s, vt = res
    du, ds, dvt = cot
    eps = 1e-10
    v = jnp.swapaxes(vt, -1, -2)
    dv = jnp.swapaxes(dvt, -1, -2)

    s2 = s * s
    diff = s2[..., None, :] - s2[..., :, None]            # diff[i, j] = s_j^2 - s_i^2
    f = diff / (diff * diff + eps)                        # Tikhonov-clamped 1/diff
    eye = jnp.eye(3, dtype=s.dtype)
    f = f * (1.0 - eye)

    sd = s[..., None, :] * eye                            # diag(s)
    dsd = ds[..., None, :] * eye                          # diag(ds)

    utdu = jnp.swapaxes(u, -1, -2) @ du
    vtdv = jnp.swapaxes(v, -1, -2) @ dv
    j_u = f * (utdu - jnp.swapaxes(utdu, -1, -2))
    j_v = f * (vtdv - jnp.swapaxes(vtdv, -1, -2))

    inner = dsd + j_u @ sd + sd @ j_v
    da = u @ inner @ vt
    return (da,)


svd3x3.defvjp(_svd3x3_fwd, _svd3x3_bwd)


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
