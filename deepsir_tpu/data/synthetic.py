"""Synthetic rigid-pair dataset for tests and benchmarking.

No counterpart in the reference (it has no test suite, SURVEY.md §4).
Generates structured random clouds (Gaussian cluster mixtures, so local
geometry is informative), applies a random rigid transform + optional noise
and partial overlap crop, and serves them through the standard PairDataset
pipeline. End-to-end registration on these pairs is the framework's
minimum-slice correctness check.
"""
from __future__ import annotations

import numpy as np

from deepsir_tpu.config import Config
from deepsir_tpu.data.base import PairDataset
from deepsir_tpu.data.transforms import halfspace_crop
from deepsir_tpu.math import rand, se3_np


def make_structured_cloud(rng: np.random.Generator, num_points: int,
                          num_clusters: int = 40, extent: float = 10.0
                          ) -> np.ndarray:
    """Mixture-of-clusters cloud (N, 3) with distinctive local structure."""
    centers = rng.uniform(-extent, extent, size=(num_clusters, 3))
    scales = rng.uniform(0.1, 1.0, size=(num_clusters, 1))
    assign = rng.integers(0, num_clusters, size=num_points)
    pts = centers[assign] + rng.normal(size=(num_points, 3)) * scales[assign]
    return pts.astype(np.float32)


class SyntheticPairs(PairDataset):
    """Pairs of the same synthetic cloud related by a random rigid motion."""

    def __init__(self, cfg: Config, split: str = "train", size: int = 64,
                 noise: float = 0.01, p_keep: float = 1.0):
        super().__init__(cfg, split)
        self.size = size
        self.noise = noise
        self.p_keep = p_keep
        if split == "test":
            self.random_rotation = False
            self.random_jitter = False

    def __len__(self) -> int:
        return self.size

    def get_pair(self, idx: int):
        rng = np.random.default_rng((977, idx))
        n = max(self.num_points, 2048)
        cloud = make_structured_cloud(rng, n)
        gt = rand.random_se3_euler(rng, self.cfg.data.rot_mag,
                                   self.cfg.data.trans_mag,
                                   self.cfg.data.xy_rot_scale)
        ref = se3_np.transform(gt, cloud)
        src = cloud.copy()
        if self.p_keep < 1.0:
            src = halfspace_crop(rng, src, self.p_keep)
            ref = halfspace_crop(rng, ref, self.p_keep)
        if self.noise > 0:
            src = src + rng.normal(scale=self.noise, size=src.shape).astype(np.float32)
            ref = ref + rng.normal(scale=self.noise, size=ref.shape).astype(np.float32)
        src = src[rng.permutation(len(src))]
        ref = ref[rng.permutation(len(ref))]
        if self.feat_len > 3:
            src = np.concatenate([src, np.zeros((len(src), self.feat_len - 3),
                                                np.float32)], axis=1)
            ref = np.concatenate([ref, np.zeros((len(ref), self.feat_len - 3),
                                                np.float32)], axis=1)
        meta = {"seq": 0, "id_src": idx, "id_ref": idx}
        return src.astype(np.float32), ref.astype(np.float32), gt, meta
