"""SO(3) helpers (numpy host-side + jnp in-graph).

Covers the reference's common/math/so3.py (dcm2euler, SO3 transform) with a
vectorized Euler conversion instead of the reference's Python loop.
"""
from __future__ import annotations

import numpy as np
from scipy.spatial.transform import Rotation


def dcm2euler(mats: np.ndarray, seq: str = "zyx", degrees: bool = True) -> np.ndarray:
    """Rotation matrices (B, 3, 3) -> Euler angles (B, 3).

    (reference common/math/so3.py:10-27, vectorized)
    """
    mats = np.asarray(mats)
    return Rotation.from_matrix(mats).as_euler(seq, degrees=degrees)


def transform(g: np.ndarray, pts: np.ndarray) -> np.ndarray:
    """Apply the SO3 transform (3, 3) to points (N, 3)."""
    return pts @ g[:3, :3].T
