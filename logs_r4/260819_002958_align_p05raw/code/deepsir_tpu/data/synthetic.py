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
    """Mixture-of-clusters cloud (N, 4): xyz + a pseudo-label in 1..19
    (SemanticKITTI learning-map id range), so the label/feat pipelines can
    be driven end-to-end without any dataset on disk.

    Labels are derived from the cluster's spatial scale — a rigid-motion-
    invariant property a point network can actually learn from local
    geometry (unlike an arbitrary cluster id)."""
    centers = rng.uniform(-extent, extent, size=(num_clusters, 3))
    scales = rng.uniform(0.1, 1.0, size=(num_clusters, 1))
    assign = rng.integers(0, num_clusters, size=num_points)
    pts = centers[assign] + rng.normal(size=(num_points, 3)) * scales[assign]
    labels = 1 + np.minimum((scales[assign, 0] - 0.1) / 0.9 * 19, 18).astype(int)
    return np.concatenate([pts, labels[:, None]], axis=1).astype(np.float32)


class SyntheticPairs(PairDataset):
    """Pairs of the same synthetic cloud related by a random rigid motion."""
    has_labels = True

    def __init__(self, cfg: Config, split: str = "train", size: int = None,
                 noise: float = 0.01, p_keep: float = 1.0, offset: int = 0):
        super().__init__(cfg, split)
        if size is None:
            size = {"train": 256, "val": 64, "test": 32}.get(split, 64)
        self.size = size
        # pair-index offset: shifts the deterministic (seed_base, idx)
        # stream so INDEPENDENT eval slices can be drawn from the same
        # split (e.g. offset=128 after a 128-pair eval); the default 0
        # keeps every recorded number's pair set unchanged
        self.offset = offset
        # disjoint sample streams per split
        self.seed_base = {"train": 977, "val": 1977, "test": 2977}.get(split, 977)
        self.noise = noise
        self.p_keep = p_keep
        self.label_column = self.feat_len
        if split == "test":
            self.random_rotation = False
            self.random_jitter = False

    def __len__(self) -> int:
        return self.size

    def get_pair(self, idx: int):
        idx = idx + self.offset
        rng = np.random.default_rng((self.seed_base, idx))
        n = max(self.num_points, 2048)
        cloud = make_structured_cloud(rng, n)          # (N, 4) xyz + label
        gt = rand.random_se3_euler(rng, self.cfg.data.rot_mag,
                                   self.cfg.data.trans_mag,
                                   self.cfg.data.xy_rot_scale)
        ref = np.concatenate([se3_np.transform(gt, cloud[:, :3]),
                              cloud[:, 3:]], axis=1)
        src = cloud.copy()
        if self.p_keep < 1.0:
            # train split: overlap CURRICULUM — keep fraction sampled per
            # pair in [p_keep, 1] so the model sees the full range from
            # untouched pairs down to the hardest crop (analogous to the
            # reference's probabilistic RandomCrop on Oxford,
            # /root/reference/dataloader/transformation.py:151-170 applied
            # with p<1). val/test use the FIXED scalar for comparable rungs.
            if self.split == "train":
                keep_src = rng.uniform(self.p_keep, 1.0)
                keep_ref = rng.uniform(self.p_keep, 1.0)
            else:
                keep_src = keep_ref = self.p_keep
            if keep_src < 1.0:
                src = halfspace_crop(rng, src, keep_src)
            if keep_ref < 1.0:
                ref = halfspace_crop(rng, ref, keep_ref)
        if self.noise > 0:
            src[:, :3] += rng.normal(scale=self.noise,
                                     size=(len(src), 3)).astype(np.float32)
            ref[:, :3] += rng.normal(scale=self.noise,
                                     size=(len(ref), 3)).astype(np.float32)
        src = src[rng.permutation(len(src))]
        ref = ref[rng.permutation(len(ref))]

        # columns: xyz, zero-padding up to feat_len, label last
        def layout(c):
            pad = np.zeros((len(c), max(self.feat_len - 3, 0)), np.float32)
            return np.concatenate([c[:, :3], pad, c[:, 3:]], axis=1)

        meta = {"seq": 0, "id_src": idx, "id_ref": idx}
        return (layout(src).astype(np.float32),
                layout(ref).astype(np.float32), gt, meta)
