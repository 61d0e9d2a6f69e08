"""KITTI odometry pair dataset (+ SemanticKITTI labels).

Re-design of the reference's KITTIPair / SemanticKITTIPair
(/root/reference/dataloader/kitti_loader.py:16-406) on top of PairDataset:

  * train pairs: frames range(MIN,MAX)=only 2 apart with the defaults —
    replicating the reference's actual behavior, whose drive-1 speed cap is
    likewise unreachable at the default MIN/MAX (kitti_loader.py:87-96);
    test pairs: first frame >= 10 m
    away, following the 3DFeatNet protocol; bad test pair (8, 15, 58) removed
  * GT pose: odometry poses conjugated through the velo->cam calibration,
    refined by point-to-point ICP on 0.05-voxelized clouds and cached to
    `icp_opti_pose/<drive>_<t0>_<t1>.npy` (compatible with caches produced
    by the reference)
  * per sample: radius/height crop, random permutation, voxel downsample
    (our C++/numpy voxel kernel instead of Open3D), label carry-through
"""
from __future__ import annotations

import glob
import os
from typing import List, Tuple

import numpy as np

from deepsir_tpu.config import Config
from deepsir_tpu.data import semantic_kitti
from deepsir_tpu.data.base import PairDataset
from deepsir_tpu.data.transforms import process_point_cloud
from deepsir_tpu.ops.icp import icp_np
from deepsir_tpu.ops.voxel import voxel_downsample_np

TRAIN_SEQS = (0, 1, 2, 3, 4, 5)
VAL_SEQS = (6, 7)
TEST_SEQS = (8, 9, 10)

MIN_TIME_DIFF = 2
MAX_TIME_DIFF = 3
MIN_DIST = 10.0          # metres between test-pair poses
BAD_TEST_PAIRS = {(8, 15, 58)}

# velodyne -> cam0 calibration for the odometry benchmark (public KITTI
# calib values; reference kitti_loader.py:148-159)
_VELO2CAM_R = np.array([
    [7.533745e-03, -9.999714e-01, -6.166020e-04],
    [1.480249e-02, 7.280733e-04, -9.998902e-01],
    [9.998621e-01, 7.523790e-03, 1.480755e-02]])
_VELO2CAM_T = np.array([-4.069766e-03, -7.631618e-02, -2.717806e-01])


def velo2cam_4x4() -> np.ndarray:
    out = np.eye(4)
    out[:3, :3] = _VELO2CAM_R
    out[:3, 3] = _VELO2CAM_T
    return out


class KITTIPair(PairDataset):
    has_labels = False

    def __init__(self, cfg: Config, split: str = "train"):
        super().__init__(cfg, split)
        assert split in ("train", "val", "test")
        self.voxel_size = cfg.data.voxel_size
        self.root_path = os.path.join(cfg.data.dataset_path, "dataset")
        self.icp_path = os.path.join(cfg.data.dataset_path, "icp_opti_pose")
        os.makedirs(self.icp_path, exist_ok=True)
        self.permutation = split != "test"
        if split != "train":
            self.random_rotation = False
            self.random_jitter = False
            self.random_scale = False

        self._pose_cache: dict = {}
        self.files: List[Tuple[int, int, int]] = []
        seqs = self._split_seqs(split)
        if split == "test":
            self._prepare_distance_pairs(seqs)
        else:
            self._prepare_time_pairs(seqs)
        if cfg.data.num_val > 0 and split == "val":
            self.files = self.files[:cfg.data.num_val]

    # ------------------------------------------------------------- indexing

    def _split_seqs(self, split: str) -> Tuple[int, ...]:
        """Sequence ids for a split: read `<dataset_path>/split/<split>_kitti
        .txt` when present (the reference's user-editable split files,
        kitti_loader.py:21-24), else the published defaults."""
        path = os.path.join(self.cfg.data.dataset_path, "split",
                            f"{split}_kitti.txt")
        if os.path.exists(path):
            with open(path) as f:
                return tuple(int(v) for v in f.read().split())
        return {"train": TRAIN_SEQS, "val": VAL_SEQS, "test": TEST_SEQS}[split]

    def _scan_ids(self, drive: int) -> List[int]:
        pattern = os.path.join(self.root_path, "sequences", f"{drive:02d}",
                               "velodyne", "*.bin")
        names = glob.glob(pattern)
        assert names, f"no velodyne scans under {pattern}"
        return sorted(int(os.path.basename(f)[:-4]) for f in names)

    def _prepare_time_pairs(self, seqs) -> None:
        """Train/val pairs: frames MIN..MAX-1 apart — with the default
        MIN=2, MAX=3 that is exactly diff==2, matching the reference's
        actual behavior (prepare_kitti, kitti_loader.py:87-96, including
        its never-taken drive-1 cap)."""
        for drive in seqs:
            ids = set(self._scan_ids(drive))
            max_diff = MAX_TIME_DIFF - 1 if (drive == 1 and MAX_TIME_DIFF - 1 > MIN_TIME_DIFF) \
                else MAX_TIME_DIFF
            for t0 in sorted(ids):
                for diff in range(MIN_TIME_DIFF, max_diff):
                    if t0 + diff in ids:
                        self.files.append((drive, t0, t0 + diff))

    def _prepare_distance_pairs(self, seqs) -> None:
        """Test pairs: successive frames >= MIN_DIST apart (reference
        prepare_kitti_test, following 3DFeatNet)."""
        for drive in seqs:
            ids = self._scan_ids(drive)
            id_set = set(ids)
            poses = np.stack([self._odometry_pose(drive, t) for t in ids])
            translations = poses[:, :3, 3]
            t_by_id = {t: i for i, t in enumerate(ids)}

            curr = ids[0]
            while curr in id_set:
                row = t_by_id[curr]
                ahead = translations[row:row + 100]
                far = np.where(np.sum((ahead - translations[row]) ** 2, axis=-1)
                               > MIN_DIST ** 2)[0]
                if len(far) == 0:
                    curr += 1
                    continue
                nxt = curr + int(far[0]) - 1
                if nxt in id_set:
                    if (drive, curr, nxt) not in BAD_TEST_PAIRS:
                        self.files.append((drive, curr, nxt))
                    curr = nxt + 1
                else:
                    curr += 1

    def __len__(self) -> int:
        return len(self.files)

    # ------------------------------------------------------------- io

    def _velodyne_path(self, drive: int, t: int) -> str:
        return os.path.join(self.root_path, "sequences", f"{drive:02d}",
                            "velodyne", f"{t:06d}.bin")

    def _odometry_pose(self, drive: int, t: int) -> np.ndarray:
        path = os.path.join(self.root_path, "poses", f"{drive:02d}.txt")
        if path not in self._pose_cache:
            self._pose_cache[path] = np.genfromtxt(path)
        row = self._pose_cache[path][t].reshape(3, 4)
        return np.vstack([row, [0, 0, 0, 1]])

    def load_labels(self, drive: int, t: int, n: int) -> np.ndarray:
        return np.zeros(n, dtype=np.uint8)

    # ------------------------------------------------------------- GT pose

    def refined_pose(self, drive: int, t0: int, t1: int,
                     xyz0: np.ndarray, xyz1: np.ndarray,
                     icp_voxel: float = 0.05) -> np.ndarray:
        """Odometry pose conjugated into the velodyne frame, refined by ICP
        and cached (reference pose_refine, kitti_loader.py:241-286)."""
        cache_file = os.path.join(self.icp_path, f"{drive}_{t0}_{t1}.npy")
        if os.path.exists(cache_file):
            return np.load(cache_file)

        p0 = self._odometry_pose(drive, t0)
        p1 = self._odometry_pose(drive, t1)
        v2c_t = velo2cam_4x4().T
        # the reference composes transposed poses; equivalently:
        # M = (v2c^T @ p0^T @ inv(p1^T) @ inv(v2c^T))^T
        m = (v2c_t @ p0.T @ np.linalg.inv(p1.T) @ np.linalg.inv(v2c_t)).T

        sub0 = voxel_downsample_np(xyz0[:, :3], icp_voxel)
        sub1 = voxel_downsample_np(xyz1[:, :3], icp_voxel)
        refined = icp_np(sub0, sub1, max_corr_dist=0.2, init=m, max_iter=200)
        np.save(cache_file, refined)
        return refined

    # ------------------------------------------------------------- pair

    def get_pair(self, idx: int):
        drive, t0, t1 = self.files[idx]
        raw0 = np.fromfile(self._velodyne_path(drive, t0),
                           dtype=np.float32).reshape(-1, 4)
        raw1 = np.fromfile(self._velodyne_path(drive, t1),
                           dtype=np.float32).reshape(-1, 4)

        # columns: x y z reflectance label
        cloud0 = np.concatenate(
            [raw0, self.load_labels(drive, t0, len(raw0))[:, None]], axis=1)
        cloud1 = np.concatenate(
            [raw1, self.load_labels(drive, t1, len(raw1))[:, None]], axis=1)

        cloud0 = process_point_cloud(cloud0, r_min=3.0, r_max=60.0,
                                     z_min=-3.0, z_max=10.0)
        cloud1 = process_point_cloud(cloud1, r_min=3.0, r_max=60.0,
                                     z_min=-3.0, z_max=10.0)

        rng = np.random.default_rng((drive, t0, t1))
        if self.permutation:
            cloud0 = cloud0[rng.permutation(len(cloud0))]
            cloud1 = cloud1[rng.permutation(len(cloud1))]

        gt = self.refined_pose(drive, t0, t1, cloud0, cloud1)

        # voxel downsample keeping all channels: reflectance averaged, the
        # label column MAJORITY-VOTED per voxel (deliberate deviation from
        # the reference, which averages class ids through Open3D's colors
        # channel then truncates — kitti_loader.py:335-345 — inventing
        # classes neither point had at voxel boundaries)
        sub0 = voxel_downsample_np(cloud0, self.voxel_size, label_column=4)
        sub1 = voxel_downsample_np(cloud1, self.voxel_size, label_column=4)
        # randomize order after the deterministic voxel pass — the in-graph
        # random-subsample pyramid depends on shuffled input
        sub0 = sub0[rng.permutation(len(sub0))]
        sub1 = sub1[rng.permutation(len(sub1))]

        meta = {"seq": drive, "id_src": t0, "id_ref": t1}
        return sub0.astype(np.float32), sub1.astype(np.float32), gt, meta


class SemanticKITTIPair(KITTIPair):
    """KITTI pairs with SemanticKITTI per-point labels
    (reference SemanticKITTIPair, kitti_loader.py:352-406)."""
    has_labels = True
    label_column = 4

    def load_labels(self, drive: int, t: int, n: int) -> np.ndarray:
        if drive > 10:   # no labels published beyond sequence 10
            return np.zeros(n, dtype=np.uint8)
        path = os.path.join(self.root_path, "sequences", f"{drive:02d}",
                            "labels", f"{t:06d}.label")
        return semantic_kitti.read_label_file(path)
