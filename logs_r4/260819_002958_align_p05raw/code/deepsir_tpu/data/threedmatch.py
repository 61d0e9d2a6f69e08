"""3DMatch RGB-D fragment-pair dataset.

Re-design of the reference's ThreeDMatch loader
(/root/reference/dataloader/threeDMatch_loader.py:15-197): train/val pairs
from the preprocessed pickle (points + pairwise overlap ratios, keeping pairs
with overlap > 0.3); test pairs from each scene's gt.log trajectory. Voxel
size is fixed at 0.03 m. PLY reading is a minimal built-in parser (ascii +
binary_little_endian) instead of Open3D.
"""
from __future__ import annotations

import os
import pickle
import struct
from typing import List

import numpy as np

from deepsir_tpu.config import Config
from deepsir_tpu.data.base import PairDataset
from deepsir_tpu.ops.voxel import voxel_downsample_np

TEST_SCENES = (
    "7-scenes-redkitchen",
    "sun3d-home_at-home_at_scan1_2013_jan_1",
    "sun3d-home_md-home_md_scan9_2012_sep_30",
    "sun3d-hotel_uc-scan3",
    "sun3d-hotel_umd-maryland_hotel1",
    "sun3d-hotel_umd-maryland_hotel3",
    "sun3d-mit_76_studyroom-76-1studyroom2",
    "sun3d-mit_lab_hj-lab_hj_tea_nov_2_2012_scan1_erika",
)

OVERLAP_THRESH = 0.3
VOXEL_SIZE = 0.03


def read_ply_xyz(path: str) -> np.ndarray:
    """Minimal PLY vertex reader (xyz float32/float64; ascii or binary LE)."""
    with open(path, "rb") as f:
        header = []
        while True:
            line = f.readline().decode("ascii", errors="replace").strip()
            header.append(line)
            if line == "end_header":
                break
        fmt = next(l.split()[1] for l in header if l.startswith("format"))
        n_vertex = 0
        props: List[tuple] = []
        in_vertex = False
        for line in header:
            if line.startswith("element"):
                _, name, cnt = line.split()
                in_vertex = name == "vertex"
                if in_vertex:
                    n_vertex = int(cnt)
            elif line.startswith("property") and in_vertex:
                parts = line.split()
                if parts[1] == "list":
                    raise ValueError("list property in vertex element")
                props.append((parts[2], parts[1]))

        type_map = {"float": ("f", 4), "float32": ("f", 4),
                    "double": ("d", 8), "float64": ("d", 8),
                    "uchar": ("B", 1), "uint8": ("B", 1),
                    "char": ("b", 1), "int": ("i", 4), "uint": ("I", 4),
                    "short": ("h", 2), "ushort": ("H", 2)}
        if fmt == "ascii":
            data = np.loadtxt(f, max_rows=n_vertex, dtype=np.float64)
            data = np.atleast_2d(data)
        else:
            assert fmt == "binary_little_endian", fmt
            rec = "<" + "".join(type_map[t][0] for _, t in props)
            size = struct.calcsize(rec)
            buf = f.read(size * n_vertex)
            rows = struct.iter_unpack(rec, buf)
            data = np.array([r for r in rows], dtype=np.float64)
        names = [n for n, _ in props]
        ix, iy, iz = names.index("x"), names.index("y"), names.index("z")
        return data[:, [ix, iy, iz]].astype(np.float32)


def read_gt_log(path: str):
    """Parse a 3DMatch gt.log trajectory: [(i, j, 4x4 pose), ...]
    (reference read_trajectory, threeDMatch_loader.py:15-36)."""
    out = []
    with open(path) as f:
        lines = f.readlines()
    k = 0
    while k < len(lines):
        meta = lines[k].split()
        if len(meta) < 2:
            break
        i, j = int(meta[0]), int(meta[1])
        mat = np.array([[float(v) for v in lines[k + 1 + r].split()]
                        for r in range(4)])
        out.append((i, j, mat))
        k += 5
    return out


class ThreeDMatch(PairDataset):
    def __init__(self, cfg: Config, split: str = "train"):
        super().__init__(cfg, split)
        assert split in ("train", "val", "test")
        self.root_path = os.path.join(cfg.data.dataset_path, "3dmatch_train_val")
        self.test_path = os.path.join(cfg.data.dataset_path, "test")
        self.voxel_size = VOXEL_SIZE
        # 3DMatch augmentation profile (threeDMatch_loader.py:54-69):
        # uniform-axis rotations (not the Z-rot/Euler LiDAR profile), small
        # jitter, random scale in train
        self.random_scale = split == "train"
        self.random_jitter = split == "train"
        self.random_rotation = split != "test"
        self.jitter.scale = 0.005
        from deepsir_tpu.data.transforms import RandomTransformSE3
        self.rotation_90 = RandomTransformSE3(rot_mag=90.0, trans_mag=0.0)

        self.files: list = []
        if split in ("train", "val"):
            self._load_train_index()
        else:
            self._load_test_index()
        if cfg.data.num_val > 0 and split == "val":
            self.files = self.files[:cfg.data.num_val]

    # ---------------------------------------------------------------- index

    def _load_train_index(self):
        pts_file = os.path.join(self.root_path,
                                f"3DMatch_{self.split}_0.030_points.pkl")
        ovl_file = os.path.join(self.root_path,
                                f"3DMatch_{self.split}_0.030_overlap.pkl")
        with open(pts_file, "rb") as f:
            data = pickle.load(f)
            self.points = list(data.values())
            self.ids_list = list(data.keys())
        self.id_to_row = {k: i for i, k in enumerate(self.ids_list)}
        with open(ovl_file, "rb") as f:
            overlaps = pickle.load(f)
        for pair_id, ratio in overlaps.items():
            if ratio > OVERLAP_THRESH:
                src_id, ref_id = pair_id.split("@")
                self.files.append((src_id, ref_id))

    def _load_test_index(self):
        for scene in TEST_SCENES:
            traj = read_gt_log(os.path.join(self.test_path,
                                            scene + "-evaluation", "gt.log"))
            for i, j, pose in traj:
                self.files.append((scene, i, j, pose))

    def __len__(self):
        return len(self.files)

    # ---------------------------------------------------------------- aug

    def augment_pair(self, rng, xyz0, xyz1, gt):
        """3DMatch uses full random rotations with recentring rather than the
        LiDAR Z-rot profile (reference apply_augment + sample_random_trans,
        data_base.py:221-256, threeDMatch_loader.py:191)."""
        from deepsir_tpu.data.transforms import fixed_resample
        from deepsir_tpu.math import rand as rnd
        if self.random_rotation:
            t0 = rnd.sample_random_trans(rng, xyz0, 90.0)
            t1 = rnd.sample_random_trans(rng, xyz1, 90.0)
            from deepsir_tpu.math import se3_np
            xyz0 = se3_np.apply_to_cloud(t0, xyz0)
            xyz1 = se3_np.apply_to_cloud(t1, xyz1)
            gt = t1 @ gt @ np.linalg.inv(t0)
        if self.num_points > 0:
            xyz0 = fixed_resample(xyz0, self.num_points)
            xyz1 = fixed_resample(xyz1, self.num_points)
        if self.random_jitter:
            xyz0 = self.jitter.jitter(rng, xyz0)
            xyz1 = self.jitter.jitter(rng, xyz1)
        if self.random_scale:
            s = rng.uniform(self.min_scale, self.max_scale)
            xyz0 = xyz0.copy(); xyz1 = xyz1.copy()
            xyz0[:, :3] *= s
            xyz1[:, :3] *= s
        return xyz0, xyz1, gt

    # ---------------------------------------------------------------- pair

    def get_pair(self, idx: int):
        rng = np.random.default_rng(idx)
        if self.split in ("train", "val"):
            src_id, ref_id = self.files[idx]
            src = self.points[self.id_to_row[src_id]].astype(np.float32)
            ref = self.points[self.id_to_row[ref_id]].astype(np.float32)
            gt = np.identity(4)
            meta = {"seq": src_id.split("/")[0],
                    "id_src": int(src_id.split("_")[-1]),
                    "id_ref": int(ref_id.split("_")[-1])}
        else:
            scene, i, j, gt = self.files[idx]
            ref = read_ply_xyz(os.path.join(self.test_path, scene,
                                            f"cloud_bin_{i}.ply"))
            src = read_ply_xyz(os.path.join(self.test_path, scene,
                                            f"cloud_bin_{j}.ply"))
            meta = {"seq": scene, "id_src": j, "id_ref": i}

        src = voxel_downsample_np(src, self.voxel_size)
        ref = voxel_downsample_np(ref, self.voxel_size)
        src = src[rng.permutation(len(src))]
        ref = ref[rng.permutation(len(ref))]
        return src.astype(np.float32), ref.astype(np.float32), gt, meta
