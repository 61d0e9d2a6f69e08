"""Random geometric sampling for augmentation (host-side numpy).

Equivalent surface to the reference's common/math/random.py and the random
transform generators inside dataloader/transformation.py, but every function
takes an explicit np.random.Generator so the data pipeline is reproducible
(the reference relies on global numpy seeding, transformation.py:41-42).
"""
from __future__ import annotations

import numpy as np
from scipy.spatial.transform import Rotation


def uniform_2_sphere(rng: np.random.Generator, num: int | None = None) -> np.ndarray:
    """Uniform sampling on the unit 2-sphere (reference common/math/random.py:5-30)."""
    if num is not None:
        phi = rng.uniform(0.0, 2 * np.pi, num)
        cos_theta = rng.uniform(-1.0, 1.0, num)
    else:
        phi = rng.uniform(0.0, 2 * np.pi)
        cos_theta = rng.uniform(-1.0, 1.0)
    theta = np.arccos(cos_theta)
    x = np.sin(theta) * np.cos(phi)
    y = np.sin(theta) * np.sin(phi)
    z = np.cos(theta)
    return np.stack((x, y, z), axis=-1)


def random_rotation_z(rng: np.random.Generator, rot_mag_deg: float = 360.0) -> np.ndarray:
    """Random rotation about Z as a 4x4 SE3 (reference RandomRotatorZ)."""
    deg = rng.random() * rot_mag_deg
    mat = np.identity(4, dtype=np.float64)
    mat[:3, :3] = Rotation.from_euler("z", deg, degrees=True).as_matrix()
    return mat


def random_se3_euler(rng: np.random.Generator, rot_mag: float = 45.0,
                     trans_mag: float = 2.0, xy_rot_scale: float = 1.0) -> np.ndarray:
    """Random SE3 via per-axis Euler angles with XY discount, as a 4x4.

    Matches the sampling distribution of the reference's
    RandomTransformSE3_euler.generate_transform (transformation.py:245-279):
    angles in [0, pi*rot_mag/180] with xy axes scaled by xy_rot_scale,
    translation uniform in [-trans_mag, trans_mag].
    """
    anglex = rng.uniform() * np.pi * rot_mag / 180.0 * xy_rot_scale
    angley = rng.uniform() * np.pi * rot_mag / 180.0 * xy_rot_scale
    anglez = rng.uniform() * np.pi * rot_mag / 180.0
    cx, cy, cz = np.cos([anglex, angley, anglez])
    sx, sy, sz = np.sin([anglex, angley, anglez])
    rx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    rz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    mat = np.identity(4, dtype=np.float64)
    mat[:3, :3] = rx @ ry @ rz
    mat[:3, 3] = rng.uniform(-trans_mag, trans_mag, 3)
    return mat


def random_se3_uniform(rng: np.random.Generator, rot_mag: float = 180.0,
                       trans_mag: float = 1.0) -> np.ndarray:
    """Random SE3 with a uniformly distributed rotation axis, as a (3, 4).

    Matches the reference's RandomTransformSE3.generate_transform
    (transformation.py:182-200): draw a uniform rotation, rescale its
    axis-angle magnitude by rot_mag/180.
    """
    rand_rot = Rotation.random(random_state=np.random.RandomState(rng.integers(2**31)))
    axis_angle = rand_rot.as_rotvec() * (rot_mag / 180.0)
    rot = Rotation.from_rotvec(axis_angle).as_matrix()
    trans = rng.uniform(-trans_mag, trans_mag, 3)
    return np.concatenate((rot, trans[:, None]), axis=1).astype(np.float32)


def sample_random_trans(rng: np.random.Generator, pcd: np.ndarray,
                        rotation_range_deg: float = 0.0) -> np.ndarray:
    """Random rotation about a random axis, recentering the cloud (4x4).

    Matches the reference's sample_random_trans (data_base.py:397-407):
    rotation angle in [-range/2, range/2] about a random axis, translation
    set so the cloud centroid maps to the origin.
    """
    axis = rng.random(3) - 0.5
    axis = axis / np.linalg.norm(axis)
    theta = rotation_range_deg * np.pi / 180.0 * (rng.random() - 0.5)
    rot = Rotation.from_rotvec(axis * theta).as_matrix()
    mat = np.eye(4)
    mat[:3, :3] = rot
    mat[:3, 3] = rot @ (-np.mean(pcd[:, :3], axis=0))
    return mat
