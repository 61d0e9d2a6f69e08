"""Ground-truth correspondence generation by radius search.

Replaces the Open3D KDTreeFlann radius search the reference runs per training
sample (/root/reference/dataloader/data_base.py:436-449 get_matching_indices,
kitti_loader.py:288-297 get_matches). Two implementations:

  * `radius_matches_np` — host-side (C++ grid hash / scipy cKDTree) for the
    data pipeline; emits a variable-length list the caller pads.
  * `radius_matches`    — in-graph (jit) tiled kernel with static shapes:
    per-source-point capped neighbour search + compaction to a fixed-capacity
    padded pair list. Enables a fully on-device GT pipeline (SURVEY.md §2.4's
    "tiled radius-search kernel emitting fixed-capacity match lists").
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from scipy.spatial import cKDTree

from deepsir_tpu.math import se3, se3_np


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


@partial(jax.jit, static_argnames=("k_per_point", "capacity", "chunk"))
def radius_matches(source_xyz: jnp.ndarray, target_xyz: jnp.ndarray,
                   trans: jnp.ndarray, radius: float,
                   k_per_point: int = 32, capacity: int = 30000,
                   chunk: int = 1024) -> tuple[jnp.ndarray, jnp.ndarray]:
    """In-graph radius search: all (i, j) with |trans*src_i - tgt_j| < radius.

    source_xyz (N, 3), target_xyz (M, 3), trans (3/4, 4). Returns
    (pairs (capacity, 2) int32 padded with (-1, -1), num_valid scalar).

    Static-shape contract (pad + validity mask per SURVEY §2.4): each source
    point contributes its up-to-`k_per_point` NEAREST in-radius targets
    (exact KNN, recall_target=1.0), and the concatenated list is compacted
    valid-first and truncated to `capacity`. Exact when every point's
    in-radius degree <= k_per_point and the total fits the capacity; both
    caps mirror the host path's max_per_point / pad_matches truncation.
    """
    from deepsir_tpu.ops.knn import knn
    n = source_xyz.shape[0]
    src_t = se3.transform(trans, source_xyz[..., :3])
    idx, sq = knn(src_t, target_xyz[..., :3], k_per_point, chunk=chunk,
                  recall_target=1.0)                       # (N, K) ascending
    valid = sq < radius * radius                           # (N, K)
    src_ids = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[:, None],
                               idx.shape)
    pairs = jnp.stack([src_ids.reshape(-1),
                       idx.reshape(-1).astype(jnp.int32)], axis=-1)  # (N*K, 2)
    validf = valid.reshape(-1)
    # stable compaction: valid pairs first, preserving (i, ascending-dist) order
    order = jnp.argsort(~validf, stable=True)
    pairs = pairs[order[:capacity]]
    num = jnp.minimum(jnp.sum(validf), capacity).astype(jnp.int32)
    pairs = jnp.where(jnp.arange(capacity)[:, None] < num, pairs, -1)
    return pairs, num


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
