"""Voxel-grid downsampling.

Replaces Open3D's C++ voxel_down_sample, used by every reference dataset
sample (/root/reference/dataloader/kitti_loader.py:337-338,
oxford_loader.py:174-175, threeDMatch_loader.py:150-151). Two variants:

  * `voxel_downsample_np` — exact host-side numpy version for the data
    pipeline (variable output size, like Open3D: mean of points per voxel).
    A C++ implementation with the same contract lives in deepsir_tpu/native
    and is used automatically when built.
  * `voxel_downsample`   — jittable fixed-capacity version (sort + segment
    mean) for fully on-device pipelines; pads to `capacity` voxels with a
    validity mask.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def voxel_downsample_np(points: np.ndarray, voxel_size: float,
                        label_column: int | None = None) -> np.ndarray:
    """Average all channels of points falling in the same voxel.

    points: (N, C) with xyz in the first 3 channels. Returns (V, C) with one
    row per occupied voxel (ordered by voxel id — deterministic).

    label_column selects an integer class column aggregated by MAJORITY VOTE
    instead of the mean (the reference averages labels through Open3D's
    colors channel then truncates, kitti_loader.py:335-345 — the mean of
    class ids 1 and 18 is class 10, a class neither point had; the vote is
    the sane semantics). Ties resolve to the higher class id.
    """
    if len(points) == 0:
        return points
    from deepsir_tpu import native
    if label_column is None and native.available():
        return native.voxel_downsample(points, voxel_size).astype(points.dtype)
    coords = np.floor(points[:, :3].astype(np.float64) / voxel_size).astype(np.int64)
    # lexicographic voxel key
    coords -= coords.min(axis=0)
    dims = coords.max(axis=0) + 1
    keys = (coords[:, 0] * dims[1] + coords[:, 1]) * dims[2] + coords[:, 2]
    uniq, inv, counts = np.unique(keys, return_inverse=True, return_counts=True)
    out = np.zeros((len(uniq), points.shape[1]), dtype=np.float64)
    np.add.at(out, inv, points)
    out /= counts[:, None]
    if label_column is not None:
        lab = points[:, label_column].astype(np.int64)
        base = int(lab.max()) + 1
        comb, cnt = np.unique(inv * base + lab, return_counts=True)
        vox, cls = comb // base, comb % base
        # per voxel keep the most frequent class (ties -> higher class id,
        # since unique's ascending order makes it the later entry)
        order = np.lexsort((cls, cnt, vox))
        vox_o, cls_o = vox[order], cls[order]
        last = np.r_[vox_o[1:] != vox_o[:-1], True]
        out[vox_o[last], label_column] = cls_o[last]
    return out.astype(points.dtype)


@partial(jax.jit, static_argnames=("capacity",))
def voxel_downsample(points: jnp.ndarray, voxel_size: float, capacity: int,
                     valid_mask: jnp.ndarray | None = None):
    """Fixed-capacity on-device voxel downsample.

    points: (N, C); voxel_size: float; capacity: max output voxels (static).
    valid_mask: optional (N,) bool marking real (non-padding) input points.

    Returns (out (capacity, C), mask (capacity,) bool). Occupied voxels are
    mean-reduced; surplus voxels beyond `capacity` are dropped (log-free
    truncation — size the capacity generously).
    """
    n, c = points.shape
    if valid_mask is None:
        valid_mask = jnp.ones((n,), dtype=bool)
    coords = jnp.floor(points[:, :3] / voxel_size).astype(jnp.int32)
    coords = coords - jnp.min(jnp.where(valid_mask[:, None], coords, 2**31 - 1), axis=0)
    dims = jnp.max(jnp.where(valid_mask[:, None], coords, -1), axis=0) + 1
    # lexicographic order via two STABLE sorts (minor key first, then major);
    # a single flattened int32 key would overflow once dx*dy*dz > 2^31 (e.g.
    # a 100 m cloud at 0.05 m voxels) and silently merge far-apart points —
    # the split keys only require dy*dz < 2^31
    key_minor = coords[:, 1] * dims[2] + coords[:, 2]
    key_major = jnp.where(valid_mask, coords[:, 0], jnp.iinfo(jnp.int32).max)
    order = jnp.argsort(key_minor, stable=True)
    order = order[jnp.argsort(key_major[order], stable=True)]
    coords_s = coords[order]
    pts_s = points[order]
    valid_s = valid_mask[order]

    is_new = jnp.concatenate([
        jnp.array([True]),
        jnp.any(coords_s[1:] != coords_s[:-1], axis=1)])
    is_new = is_new & valid_s
    slot = jnp.cumsum(is_new) - 1                                   # (N,)
    # padding points and voxels beyond capacity go to the dump slot
    slot = jnp.where(valid_s & (slot < capacity), slot, capacity)

    sums = jnp.zeros((capacity + 1, c), points.dtype).at[slot].add(pts_s)
    cnts = jnp.zeros((capacity + 1,), jnp.int32).at[slot].add(valid_s.astype(jnp.int32))
    out = sums[:capacity] / jnp.maximum(cnts[:capacity, None], 1)
    mask = cnts[:capacity] > 0
    return out, mask
