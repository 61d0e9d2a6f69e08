"""Ground-truth correspondence generation by radius search.

Replaces the Open3D KDTreeFlann radius search the reference runs per training
sample (/root/reference/dataloader/data_base.py:436-449 get_matching_indices,
kitti_loader.py:288-297 get_matches). Host-side (scipy cKDTree) since it runs
in the data pipeline; emits a fixed-capacity padded match array so the batch
has static shape for the in-graph inlier loss.
"""
from __future__ import annotations

import numpy as np
from scipy.spatial import cKDTree

from deepsir_tpu.math import se3_np


def radius_matches_np(source_xyz: np.ndarray, target_xyz: np.ndarray,
                      trans: np.ndarray, radius: float,
                      max_per_point: int | None = None) -> np.ndarray:
    """All (i, j) pairs with |T*src_i - tgt_j| < radius.

    Returns (P, 2) int32. Semantics match the reference's
    get_matching_indices: the source cloud is transformed by `trans`, then for
    every source point every target point within `radius` is emitted
    (optionally capped at max_per_point per source point).

    Dispatches to the C++ grid-hash implementation (deepsir_tpu/native) when
    built; scipy cKDTree otherwise.
    """
    if max_per_point is None:
        from deepsir_tpu import native
        if native.available():
            return native.radius_matches(source_xyz[:, :3], target_xyz[:, :3],
                                         trans, radius)
    src_t = se3_np.transform(trans, source_xyz[:, :3])
    tree = cKDTree(target_xyz[:, :3])
    neighbours = tree.query_ball_point(src_t, r=radius)
    pairs = []
    for i, idx in enumerate(neighbours):
        if max_per_point is not None:
            idx = idx[:max_per_point]
        for j in idx:
            pairs.append((i, j))
    if not pairs:
        return np.zeros((0, 2), dtype=np.int32)
    return np.asarray(pairs, dtype=np.int32)


def pad_matches(matches: np.ndarray, capacity: int) -> tuple[np.ndarray, int]:
    """Pad/truncate a (P, 2) match list to (capacity, 2) with (-1, -1) rows.

    Returns (padded, num_valid). -1 padding keys hash to a sentinel that can
    never equal a real (i, j) key in the in-graph membership test.
    """
    num = min(len(matches), capacity)
    out = np.full((capacity, 2), -1, dtype=np.int32)
    if num:
        out[:num] = matches[:num]
    return out, num
