"""Dataset base: pair augmentation, static-shape batching, host pipeline.

Re-design of the reference's DataBase (/root/reference/dataloader/
data_base.py:19-296). Key differences, all driven by the TPU's static-shape
contract:

  * clouds are always resampled to exactly cfg.model.num_points and shuffled,
    so every batch has one shape and the in-graph random-subsample pyramid
    stays valid (the reference resamples in train but keeps ragged sizes at
    test time; we use the same fixed size everywhere)
  * GT match lists are padded to a fixed capacity with a validity count
    (the reference ships ragged python lists to the loss)
  * the KNN index pyramid is NOT built here — it is built on-device inside
    the jitted step (ops/pyramid.py), removing the reference's per-batch C++
    KNN calls on the host (its main input-pipeline bottleneck)
  * randomness is explicit: every sample draw gets its own
    np.random.Generator, so the pipeline is reproducible and worker-safe
"""
from __future__ import annotations

import logging
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, List, Optional

import numpy as np

_logger = logging.getLogger(__name__)

from deepsir_tpu.config import Config
from deepsir_tpu.data import transforms as T
from deepsir_tpu.math import se3_np
from deepsir_tpu.ops.radius_match import pad_matches, radius_matches_np


class PairDataset:
    """Base class for pair datasets (KITTI / 3DMatch / Oxford / Synthetic).

    Subclasses implement __len__ and get_pair(idx) -> (cloud0 (N0, C),
    cloud1 (N1, C), gt_4x4, meta dict). Columns: xyz, then extra feature
    channels, then (optionally) an integer label column last.
    """

    # augmentation switches — subclasses override per split
    random_rotation = True
    random_jitter = True
    random_scale = False
    min_scale, max_scale = 0.8, 1.2
    has_labels = False
    label_column: Optional[int] = None

    def __init__(self, cfg: Config, split: str):
        self.cfg = cfg
        self.split = split
        self.num_points = cfg.model.num_points
        self.feat_len = cfg.model.feat_len
        self.pipeline = cfg.pipeline
        self.thres_radius = cfg.data.thres_radius
        self.max_matches = cfg.data.max_matches
        self.rot_z = T.RandomRotatorZ(60.0)
        self.perturb = T.RandomTransformSE3Euler(
            cfg.data.rot_mag, cfg.data.trans_mag, cfg.data.xy_rot_scale)
        self.jitter = T.RandomJitter(scale=0.01, clip=0.05)
        self._cache: Dict[int, tuple] = {}
        self._cache_lock = threading.Lock()
        self.cache_size = 500
        self._truncated = 0             # GT-match-list truncation telemetry
        self._truncated_frac = 0.0

    # ------------------------------------------------------------- subclass

    def __len__(self) -> int:
        raise NotImplementedError

    def get_pair(self, idx: int):
        raise NotImplementedError

    # ------------------------------------------------------------- pipeline

    def _cached_pair(self, idx: int):
        with self._cache_lock:
            if idx in self._cache:
                return self._cache[idx]
        pair = self.get_pair(idx)
        with self._cache_lock:
            if len(self._cache) < self.cache_size:
                self._cache[idx] = pair
        return pair

    def augment_pair(self, rng: np.random.Generator, xyz0: np.ndarray,
                     xyz1: np.ndarray, gt: np.ndarray):
        """Random Z-rotations on both clouds + an SE3 perturbation on the
        source, composing the GT pose accordingly; then exact-size resample
        and jitter (reference apply_augment_V2, data_base.py:258-296).

        new_src = T_perturb T0 src ; new_ref = T1 ref ; ref = gt src
        => new gt = T1 gt inv(T0) inv(T_perturb)
        """
        if self.random_rotation:
            xyz0, _, t0 = self.rot_z.transform(rng, xyz0)
            xyz1, _, t1 = self.rot_z.transform(rng, xyz1)
            xyz0, _, t00 = self.perturb.transform(rng, xyz0)
            gt = t1 @ gt @ np.linalg.inv(t0) @ np.linalg.inv(t00)

        if self.num_points > 0:
            if self.split == "train":
                # per-epoch permutation BEFORE the deterministic exact-size
                # resample: get_pair results are cached with a frozen
                # per-pair shuffle, so without this every epoch would see
                # the same point subset and the same random-subsample
                # pyramid levels. Val/test keep the frozen order so
                # evaluation is reproducible.
                xyz0 = xyz0[rng.permutation(len(xyz0))]
                xyz1 = xyz1[rng.permutation(len(xyz1))]
            xyz0 = T.fixed_resample(xyz0, self.num_points)
            xyz1 = T.fixed_resample(xyz1, self.num_points)

        if self.random_jitter:
            xyz0 = self.jitter.jitter(rng, xyz0)
            xyz1 = self.jitter.jitter(rng, xyz1)

        if self.random_scale:
            scale = rng.uniform(self.min_scale, self.max_scale)
            xyz0 = xyz0.copy(); xyz1 = xyz1.copy()
            xyz0[:, :3] *= scale
            xyz1[:, :3] *= scale

        return xyz0, xyz1, gt

    def get_sample(self, idx: int, rng: np.random.Generator) -> Dict:
        """One fully-augmented static-shape sample dict."""
        cloud0, cloud1, gt, meta = self._cached_pair(idx)
        n0_raw, n1_raw = len(cloud0), len(cloud1)
        cloud0, cloud1, gt = self.augment_pair(rng, cloud0, cloud1, gt)

        if self.cfg.model.pyramid_order == "morton":
            # curve-sort the clouds (all columns ride the permutation) so
            # the on-device pyramid can use strided sampling + windowed
            # per-level KNN (ops/pyramid.py, ops/window.py). Masked val/test
            # clouds sort only their valid prefix — the padding rows past
            # n_raw must stay where the mask expects them. Rebinds instead of
            # writing in place: fixed_resample can return a VIEW of the
            # cached raw pair for large clouds, and the cache must stay raw.
            from deepsir_tpu.ops.morton import morton_order_np

            def _curve_sort(c, n_raw):
                nv = len(c) if self.split == "train" else min(n_raw, len(c))
                head = c[:nv][morton_order_np(c[:nv, :3])]
                return head if nv == len(c) else np.concatenate(
                    [head, c[nv:]], axis=0)

            cloud0 = _curve_sort(cloud0, n0_raw)
            cloud1 = _curve_sort(cloud1, n1_raw)

        sample: Dict = {
            "points_src": cloud0[:, :self.feat_len].astype(np.float32),
            "points_ref": cloud1[:, :self.feat_len].astype(np.float32),
            "transform_gt": gt[:3, :].astype(np.float32),
            "meta": meta,
        }
        if self.split != "train" and self.num_points > 0:
            # the reference evaluates at NATURAL cloud sizes (its resample is
            # train-only, data_base.py:271-283). Static shapes force an
            # exact-size batch here, but fixed_resample pads small clouds by
            # tiling with the original cloud as the prefix — so a validity
            # mask (first n_raw rows) lets the matcher/Kabsch/loss/metrics
            # ignore the duplicates and reproduce natural-size statistics.
            n = self.num_points
            sample["mask_src"] = (np.arange(n) < min(n0_raw, n)).astype(np.float32)
            sample["mask_ref"] = (np.arange(n) < min(n1_raw, n)).astype(np.float32)
        if self.has_labels and self.label_column is not None:
            sample["labels_src"] = cloud0[:, self.label_column].astype(np.int32)
            sample["labels_ref"] = cloud1[:, self.label_column].astype(np.int32)

        if (self.pipeline == "align" and self.split in ("train", "val")
                and self.cfg.data.gt_match_lists):
            # list-based BCE labels only: by default the align loss labels
            # correspondences with the exact in-graph geometric test
            # (losses/align.py), so computing + shipping the host KDTree
            # match list here would be dead work (~240 KB/step through the
            # 27 MB/s relay for an array the loss never reads)
            matches = radius_matches_np(cloud0[:, :3], cloud1[:, :3], gt,
                                        self.thres_radius)
            padded, num = pad_matches(matches, self.max_matches)
            if len(matches) > self.max_matches:
                # truncated GT lists mislabel correct predictions whose
                # source points fell past the cap (losses/align.py list
                # path); surface it so max_matches can be raised
                self._truncated += 1
                self._truncated_frac = max(
                    self._truncated_frac,
                    1.0 - self.max_matches / len(matches))
                if self._truncated in (1, 100, 10000):
                    _logger.warning(
                        "GT match list truncated on %d sample(s) so far "
                        "(worst loss: %.1f%% of matches dropped); raise "
                        "data.max_matches (%d) to avoid BCE mislabeling",
                        self._truncated, 100 * self._truncated_frac,
                        self.max_matches)
            sample["matches"] = padded
            sample["num_matches"] = num
        return sample


def make_pair_arrays(samples: List[Dict]) -> Dict[str, np.ndarray]:
    """Stack sample dicts into a batch of numpy arrays (static shapes).

    Replaces the reference's collate_fn (data_base.py:196-219) minus the
    pyramid build, which happens on-device.
    """
    batch: Dict[str, np.ndarray] = {
        "points_src": np.stack([s["points_src"] for s in samples]),
        "points_ref": np.stack([s["points_ref"] for s in samples]),
        "transform_gt": np.stack([s["transform_gt"] for s in samples]),
    }
    if "labels_src" in samples[0]:
        batch["labels_src"] = np.stack([s["labels_src"] for s in samples])
        batch["labels_ref"] = np.stack([s["labels_ref"] for s in samples])
    if "mask_src" in samples[0]:
        batch["mask_src"] = np.stack([s["mask_src"] for s in samples])
        batch["mask_ref"] = np.stack([s["mask_ref"] for s in samples])
    if "matches" in samples[0]:
        batch["matches"] = np.stack([s["matches"] for s in samples])
        batch["num_matches"] = np.asarray([s["num_matches"] for s in samples],
                                          dtype=np.int32)
    batch["meta"] = [s["meta"] for s in samples]
    return batch


class Loader:
    """Minimal threaded batch loader.

    Replaces torch DataLoader (reference train.py:307-316): shuffling,
    batching, and thread-pool prefetch. Per-sample rngs are derived from
    (seed, epoch, index) so runs are reproducible regardless of worker
    scheduling.
    """

    def __init__(self, dataset: PairDataset, batch_size: int, shuffle: bool,
                 seed: int = 0, num_workers: int = 4, drop_last: bool = False):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.num_workers = max(1, num_workers)
        self.drop_last = drop_last
        self.epoch = 0

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            order = np.random.default_rng(self.seed + self.epoch).permutation(n)
        # bind the epoch locally so in-flight prefetch futures keep their own
        # epoch even if the generator is abandoned or a second iterator is
        # opened concurrently (both would otherwise read the mutated
        # self.epoch at thread execution time and cross rng streams)
        epoch = self.epoch = self.epoch + 1

        def fetch(i):
            # unshuffled (val/test) loaders derive sample rngs from
            # (seed, idx) only, so every sweep sees identical augmentations
            # and validation scores are comparable across sweeps; shuffled
            # (train) loaders get a fresh stream per epoch
            rng = np.random.default_rng(
                (self.seed, epoch if self.shuffle else 0, int(i)))
            return self.dataset.get_sample(int(i), rng)

        ends = range(self.batch_size, n + 1, self.batch_size) if self.drop_last \
            else range(self.batch_size, n + self.batch_size, self.batch_size)
        # bounded sliding prefetch window: a few batches ahead, so epoch
        # memory stays O(window) rather than O(epoch) (a full KITTI epoch of
        # decoded samples would be gigabytes)
        window = self.batch_size * max(2, 2 * self.num_workers)
        with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
            futures = {}
            submitted = 0

            def top_up(upto):
                nonlocal submitted
                while submitted < min(upto, n):
                    futures[submitted] = pool.submit(fetch, order[submitted])
                    submitted += 1

            start = 0
            for end in ends:
                end = min(end, n)
                if end <= start:
                    break
                top_up(end + window)
                batch = [futures.pop(i).result() for i in range(start, end)]
                yield make_pair_arrays(batch)
                start = end
