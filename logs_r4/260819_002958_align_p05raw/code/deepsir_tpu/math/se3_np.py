"""SE(3) helpers on numpy arrays for the host-side data pipeline.

Numpy counterparts of deepsir_tpu.math.se3 plus quaternion constructors
(reference /root/reference/common/math/se3.py). Kept separate from the jnp
module so the data loaders never pull in device code.
"""
from __future__ import annotations

import numpy as np
from scipy.spatial.transform import Rotation


def identity() -> np.ndarray:
    return np.eye(3, 4)


def transform(g: np.ndarray, pts: np.ndarray) -> np.ndarray:
    """Apply SE3 transform ([B,] 3/4, 4) to points ([B,] N, 3)."""
    rot = g[..., :3, :3]
    trans = g[..., :3, 3]
    return pts[..., :3] @ np.swapaxes(rot, -1, -2) + trans[..., None, :]


def inverse(g: np.ndarray) -> np.ndarray:
    rot = g[..., :3, :3]
    trans = g[..., :3, 3]
    inv_rot = np.swapaxes(rot, -1, -2)
    inv = np.concatenate([inv_rot, inv_rot @ -trans[..., None]], axis=-1)
    if g.shape[-2] == 4:
        bottom = np.broadcast_to(np.array([[0.0, 0.0, 0.0, 1.0]]), g.shape[:-2] + (1, 4))
        inv = np.concatenate([inv, bottom], axis=-2)
    return inv


def concatenate(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    ra, ta = a[..., :3, :3], a[..., :3, 3]
    rb, tb = b[..., :3, :3], b[..., :3, 3]
    rot = ra @ rb
    trans = ra @ tb[..., None] + ta[..., None]
    out = np.concatenate([rot, trans], axis=-1)
    if a.shape[-2] == 4:
        bottom = np.broadcast_to(np.array([[0.0, 0.0, 0.0, 1.0]]), a.shape[:-2] + (1, 4))
        out = np.concatenate([out, bottom], axis=-2)
    return out


def to_4x4(g: np.ndarray) -> np.ndarray:
    if g.shape[-2] == 4:
        return g
    bottom = np.broadcast_to(np.array([[0.0, 0.0, 0.0, 1.0]]), g.shape[:-2] + (1, 4))
    return np.concatenate([g, bottom], axis=-2)


def apply_to_cloud(trans_mat: np.ndarray, p0: np.ndarray) -> np.ndarray:
    """Transform a cloud with extra channels [x,y,z,(nx,ny,nz),(...)] (N, C).

    Rotates the normal channels when present (reference
    dataloader/data_base.py:410-433).
    """
    p1 = transform(trans_mat, p0[:, :3])
    if p0.shape[1] == 6:
        n1 = p0[:, 3:6] @ trans_mat[:3, :3].T
        p1 = np.concatenate((p1, n1), axis=-1)
    elif p0.shape[1] > 6:
        n1 = p0[:, 3:6] @ trans_mat[:3, :3].T
        p1 = np.concatenate((p1, n1, p0[:, 6:]), axis=-1)
    elif p0.shape[1] > 3:
        p1 = np.concatenate((p1, p0[:, 3:]), axis=-1)
    return p1


def quat2mat(q: np.ndarray) -> np.ndarray:
    """Rotation matrix from quaternion (w, x, y, z), non-unit allowed.

    Same contract as the reference's vendored nibabel routine
    (common/math/se3.py quat2mat): near-zero quaternions map to identity,
    anything else is normalized. Delegates to scipy (note scipy's quat
    order is (x, y, z, w)).
    """
    w, x, y, z = np.asarray(q, dtype=float)
    if w * w + x * x + y * y + z * z < 1e-8:
        return np.eye(3)
    return Rotation.from_quat([x, y, z, w]).as_matrix()


def xyzquat2mat(xyzquat: np.ndarray) -> np.ndarray:
    """SE3 4x4 from [x, y, z, qw, qx, qy, qz] (reference se3.xyzquat2mat)."""
    rot = quat2mat(xyzquat[3:])
    trans = np.asarray(xyzquat[:3], dtype=float)
    mat = np.concatenate([rot, trans[:, None]], axis=1)
    return np.concatenate([mat, [[0.0, 0.0, 0.0, 1.0]]], axis=0)


def from_xyzquat(xyzquat: np.ndarray) -> np.ndarray:
    """SE3 4x4 from [x, y, z, qx, qy, qz, qw] (scipy quaternion order)."""
    rot = Rotation.from_quat(xyzquat[3:])
    trans = rot.apply(-np.asarray(xyzquat[:3], dtype=float))
    mat = np.concatenate([rot.as_matrix(), trans[:, None]], axis=1)
    return np.concatenate([mat, [[0.0, 0.0, 0.0, 1.0]]], axis=0)
