"""SE(3) rigid-transform operations on JAX arrays.

Functional equivalents of the reference's torch SE3 helpers
(/root/reference/common/math/se3_torch.py:6-118), written for jnp with full
broadcasting over leading batch dims so they vmap/scan cleanly. Transforms are
represented as (..., 3, 4) matrices [R | t].
"""
from __future__ import annotations

import jax.numpy as jnp


def identity(batch_shape=()) -> jnp.ndarray:
    """Identity transform of shape (*batch_shape, 3, 4)."""
    eye = jnp.eye(3, 4)
    return jnp.broadcast_to(eye, tuple(batch_shape) + (3, 4))


def inverse(g: jnp.ndarray) -> jnp.ndarray:
    """Inverse of an SE3 transform (..., 3/4, 4) -> (..., 3, 4)."""
    rot = g[..., :3, :3]
    trans = g[..., :3, 3]
    inv_rot = jnp.swapaxes(rot, -1, -2)
    inv_trans = -jnp.einsum("...ij,...j->...i", inv_rot, trans)
    return jnp.concatenate([inv_rot, inv_trans[..., None]], axis=-1)


def concatenate(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Compose two SE3 transforms: returns a @ b as a (..., 3, 4) matrix."""
    ra, ta = a[..., :3, :3], a[..., :3, 3]
    rb, tb = b[..., :3, :3], b[..., :3, 3]
    rot = ra @ rb
    trans = jnp.einsum("...ij,...j->...i", ra, tb) + ta
    return jnp.concatenate([rot, trans[..., None]], axis=-1)


def transform(g: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply SE3 transform g (..., 3/4, 4) to points (..., N, 3)."""
    rot = g[..., :3, :3]
    trans = g[..., :3, 3]
    return pts @ jnp.swapaxes(rot, -1, -2) + trans[..., None, :]


def transform_cf(g: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply SE3 transform to channel-first points (..., 3, N).

    Channel-first counterpart of `transform` (reference se3_torch.transform_V2).
    """
    rot = g[..., :3, :3]
    trans = g[..., :3, 3]
    return rot @ pts + trans[..., None]


def rotate(g: jnp.ndarray, vecs: jnp.ndarray) -> jnp.ndarray:
    """Apply only the rotation part to vectors (..., N, 3) (e.g. normals)."""
    rot = g[..., :3, :3]
    return vecs @ jnp.swapaxes(rot, -1, -2)


def to_4x4(g: jnp.ndarray) -> jnp.ndarray:
    """Pad a (..., 3, 4) transform to homogeneous (..., 4, 4)."""
    bottom = jnp.zeros(g.shape[:-2] + (1, 4)).at[..., 0, 3].set(1.0)
    return jnp.concatenate([g[..., :3, :], bottom], axis=-2)


def rotation_error_rad(r1: jnp.ndarray, r2: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """Geodesic rotation error arccos((tr(R1^T R2) - 1)/2) in radians.

    (reference network/loss.py:244-253)
    r1, r2: (..., 3, 3)

    eps must be resolvable in fp32 (1.0 - 1e-16 == 1.0 exactly, which put
    the clip bound AT the arccos singularity: perfectly-aligned rotations
    produced inf gradients and the NaN-guard skipped the training step).
    """
    trace = jnp.einsum("...ij,...ij->...", r1, r2)
    cos = jnp.clip((trace - 1.0) * 0.5, -1.0 + eps, 1.0 - eps)
    return jnp.arccos(cos)


def translation_error(t1: jnp.ndarray, t2: jnp.ndarray,
                      eps: float = 1e-12) -> jnp.ndarray:
    """L2 translation error (..., 3) -> (...).

    sqrt(sum^2 + eps) instead of jnp.linalg.norm: the norm's gradient is
    NaN at exactly-zero residuals (pred == gt), which the pose loss hits.
    """
    d = t1 - t2
    return jnp.sqrt(jnp.sum(d * d, axis=-1) + eps)


def pose_error(g_gt: jnp.ndarray, g_pred: jnp.ndarray, eps: float = 1e-16):
    """Residual rotation (degrees) and translation magnitude of inv(gt) @ pred.

    (reference network/loss.py:266-277, common/metrics_util.py:56-62)

    METRICS-ONLY — must not be differentiated: the default eps=1e-16 is
    unresolvable in fp32 (1.0 - 1e-16 == 1.0), putting the clip bound AT the
    arccos singularity, where the gradient is inf. It is kept at 1e-16 here
    so the forward metric value matches the reference bit-for-bit; any
    differentiated pose error must use rotation_error_rad (eps=1e-6).
    """
    residual = concatenate(inverse(g_gt), g_pred)
    rot_trace = residual[..., 0, 0] + residual[..., 1, 1] + residual[..., 2, 2]
    err_r_deg = jnp.arccos(jnp.clip(0.5 * (rot_trace - 1.0), -1.0 + eps, 1.0 - eps))
    err_r_deg = err_r_deg * (180.0 / jnp.pi)
    err_t = jnp.linalg.norm(residual[..., :, 3], axis=-1)
    return err_r_deg, err_t
