"""Composable sample transforms for the host-side data pipeline.

Equivalent surface to the reference's transform library
(/root/reference/dataloader/transformation.py:12-352), with two deliberate
changes: every transform takes an explicit np.random.Generator (no global
numpy seeding), and samples are plain dicts of numpy arrays. Transforms used
in the live path: resamplers, jitter, crop, SE3 perturbations, shuffle.
"""
from __future__ import annotations

import math
from typing import Dict, List, Optional

import numpy as np

from deepsir_tpu.math import rand, se3_np


class SplitSourceRef:
    """Clone 'points' into independent source/reference clouds."""

    def __call__(self, sample: Dict, rng: np.random.Generator) -> Dict:
        sample["points_raw"] = sample.pop("points")
        sample["points_src"] = sample["points_raw"].copy()
        sample["points_ref"] = sample["points_raw"].copy()
        return sample


def resample(rng: np.random.Generator, points: np.ndarray, k: int) -> np.ndarray:
    """Exactly-k random resampling: no repeats when k <= N, all points appear
    at least once when k > N (reference Resampler._resample)."""
    n = points.shape[0]
    if n == k:
        return points
    if n > k:
        idx = rng.choice(n, k, replace=False)
        return points[idx]
    idx = np.concatenate([rng.permutation(n), rng.choice(n, k - n, replace=True)])
    return points[idx]


def fixed_resample(points: np.ndarray, k: int) -> np.ndarray:
    """Deterministic exactly-k resampling by tiling (reference FixedResampler).

    Relies on the caller having randomized point order upstream — the tiled
    prefix is then still a uniform sample.
    """
    n = points.shape[0]
    reps = k // n
    rem = k % n
    if reps == 0:
        return points[:k]
    return np.concatenate([np.tile(points, (reps, 1)), points[:rem]], axis=0)


class Resampler:
    def __init__(self, num: int):
        self.num = num

    def __call__(self, sample: Dict, rng: np.random.Generator) -> Dict:
        if "points" in sample:
            sample["points"] = resample(rng, sample["points"], self.num)
        else:
            src_size = ref_size = self.num
            prop = sample.get("crop_proportion")
            if prop:
                src_size = math.ceil(prop[0] * self.num)
                ref_size = math.ceil(prop[1] * self.num) if len(prop) > 1 else self.num
            sample["points_src"] = resample(rng, sample["points_src"], src_size)
            sample["points_ref"] = resample(rng, sample["points_ref"], ref_size)
        return sample


class RandomJitter:
    """Clipped gaussian xyz noise (reference RandomJitter)."""

    def __init__(self, scale: float = 0.01, clip: float = 0.05):
        self.scale = scale
        self.clip = clip

    def jitter(self, rng: np.random.Generator, pts: np.ndarray) -> np.ndarray:
        noise = np.clip(rng.normal(0.0, self.scale, size=(pts.shape[0], 3)),
                        -self.clip, self.clip)
        out = pts.copy()
        out[:, :3] = out[:, :3] + noise
        return out

    def __call__(self, sample, rng: np.random.Generator):
        if isinstance(sample, np.ndarray):
            return self.jitter(rng, sample)
        for k in (("points",) if "points" in sample else ("points_src", "points_ref")):
            sample[k] = self.jitter(rng, sample[k])
        return sample


def halfspace_crop(rng: np.random.Generator, points: np.ndarray,
                   p_keep: float) -> np.ndarray:
    """Keep ~p_keep of the points on one side of a random plane through the
    centroid (reference RandomCrop.crop)."""
    direction = rand.uniform_2_sphere(rng)
    centered = points[:, :3] - np.mean(points[:, :3], axis=0)
    dist = centered @ direction
    if p_keep == 0.5:
        mask = dist > 0
    else:
        mask = dist > np.percentile(dist, (1.0 - p_keep) * 100)
    return points[mask]


class RandomCrop:
    def __init__(self, p_keep: Optional[List[float]] = None):
        self.p_keep = np.array(p_keep if p_keep is not None else [0.7, 0.7],
                               dtype=np.float32)

    def __call__(self, sample: Dict, rng: np.random.Generator) -> Dict:
        if np.all(self.p_keep == 1.0):
            return sample
        sample["points_src"] = halfspace_crop(rng, sample["points_src"], self.p_keep[0])
        if len(self.p_keep) > 1:
            sample["points_ref"] = halfspace_crop(rng, sample["points_ref"], self.p_keep[1])
        return sample


class RandomTransformSE3:
    """Random rigid perturbation of the source cloud; records the GT
    transform that re-aligns source to reference (reference
    RandomTransformSE3, transformation.py:164-235)."""

    def __init__(self, rot_mag: float = 180.0, trans_mag: float = 1.0,
                 xy_rot_scale: float = 1.0):
        self.rot_mag = rot_mag
        self.trans_mag = trans_mag
        self.xy_rot_scale = xy_rot_scale

    def generate(self, rng: np.random.Generator) -> np.ndarray:
        return se3_np.to_4x4(rand.random_se3_uniform(rng, self.rot_mag, self.trans_mag))

    def transform(self, rng: np.random.Generator, pts: np.ndarray):
        """Returns (transformed pts, gt = inverse, igt = applied 4x4)."""
        igt = self.generate(rng)
        p1 = se3_np.apply_to_cloud(igt, pts)
        return p1, se3_np.inverse(igt), igt

    def __call__(self, sample, rng: np.random.Generator):
        if isinstance(sample, np.ndarray):
            return self.transform(rng, sample)
        if "points" in sample:
            sample["points"], _, _ = self.transform(rng, sample["points"])
        else:
            src_t, gt, _ = self.transform(rng, sample["points_src"])
            sample["points_src"] = src_t
            sample["transform_gt"] = gt[:3, :]
        return sample


class RandomTransformSE3Euler(RandomTransformSE3):
    """Euler-angle variant with XY rotation discount (reference
    RandomTransformSE3_euler)."""

    def generate(self, rng: np.random.Generator) -> np.ndarray:
        return rand.random_se3_euler(rng, self.rot_mag, self.trans_mag,
                                     self.xy_rot_scale)


class RandomRotatorZ(RandomTransformSE3):
    """Random rotation about the gravity axis (reference RandomRotatorZ)."""

    def __init__(self, rot_mag: float = 360.0):
        super().__init__(rot_mag=rot_mag)

    def generate(self, rng: np.random.Generator) -> np.ndarray:
        return rand.random_rotation_z(rng, self.rot_mag)


class ShufflePoints:
    def __call__(self, sample: Dict, rng: np.random.Generator) -> Dict:
        for k in (("points",) if "points" in sample else ("points_src", "points_ref")):
            sample[k] = sample[k][rng.permutation(len(sample[k]))]
        return sample


def process_point_cloud(cloud: np.ndarray, r_min: float = 0.0, r_max: float = 50.0,
                        z_min: float = -3.0, z_max: float = 10.0) -> np.ndarray:
    """Radius-annulus + height crop (reference data_base.process_point_cloud)."""
    r2 = np.sum(cloud[:, :3] ** 2, axis=1)
    mask = (r2 <= r_max ** 2) & (r2 > r_min ** 2) & \
        (cloud[:, 2] >= z_min) & (cloud[:, 2] <= z_max)
    return cloud[mask]
