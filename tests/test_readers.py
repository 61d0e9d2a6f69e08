"""Dataset-reader tests against synthetic on-disk fixtures.

Builds miniature KITTI / SemanticKITTI / Oxford trees (velodyne .bin,
.label, poses, npy frames) and drives the real readers end-to-end —
indexing, GT pose conjugation + ICP refinement + caching, cropping,
voxelization, label remapping, match generation.
"""
import os
import pickle

import numpy as np
import pytest

from deepsir_tpu.config import Config, ModelConfig, replace
from deepsir_tpu.math import se3_np


def tiny_cfg(dataset_path, dataset_type, pipeline="align", num_points=512):
    model = ModelConfig(feat_len=4 if dataset_type == "KITTI" else 3,
                        num_points=num_points, num_knn=8,
                        sub_sampling_ratio=(4, 4), d_out=(8, 16),
                        out_feat_dim=16)
    cfg = Config(pipeline=pipeline, model=model)
    cfg = replace(cfg, data=replace(cfg.data, dataset_path=str(dataset_path),
                                    dataset_type=dataset_type,
                                    max_matches=4096, gt_match_lists=True))
    return cfg.resolved()


def make_world(rng, n=6000):
    """Annulus cloud inside the KITTI crop window (r in 3..60, z in -3..10)."""
    r = rng.uniform(6, 45, n)
    th = rng.uniform(0, 2 * np.pi, n)
    z = rng.uniform(-1.0, 6.0, n)
    return np.stack([r * np.cos(th), r * np.sin(th), z], 1).astype(np.float32)


@pytest.fixture(scope="module")
def kitti_tree(tmp_path_factory):
    """Two-frame sequences for every split's seq ids, consistent with the
    odometry-pose conjugation the reader applies."""
    from deepsir_tpu.data.kitti import velo2cam_4x4
    root = tmp_path_factory.mktemp("kitti")
    rng = np.random.default_rng(7)
    v2c_t = velo2cam_4x4().T

    for drive in (0, 1, 2, 3, 4, 5, 6, 7):
        seq_dir = root / "dataset" / "sequences" / f"{drive:02d}"
        (seq_dir / "velodyne").mkdir(parents=True)
        (seq_dir / "labels").mkdir()
        poses = []
        world = make_world(rng)
        # velo-frame motion between consecutive frames
        ang, shift = 0.03, np.array([0.8, 0.2, 0.0])
        m_step = np.eye(4)
        m_step[:3, :3] = [[np.cos(ang), -np.sin(ang), 0],
                          [np.sin(ang), np.cos(ang), 0], [0, 0, 1]]
        m_step[:3, 3] = shift
        n_frames = 6
        for t in range(n_frames):
            # scan_t = m_step^-t (world): consistent rigid motion
            m_t = np.linalg.inv(np.linalg.matrix_power(m_step, t))
            scan = se3_np.transform(m_t, world).astype(np.float32)
            pts = np.concatenate(
                [scan, rng.uniform(size=(len(scan), 1)).astype(np.float32)], 1)
            pts.astype(np.float32).tofile(
                str(seq_dir / "velodyne" / f"{t:06d}.bin"))
            raw = rng.choice([0, 10, 30, 40, 48, 50, 70, 80], size=len(scan))
            (raw.astype(np.int32) | (3 << 16)).astype(np.int32).tofile(
                str(seq_dir / "labels" / f"{t:06d}.label"))
            # odometry pose consistent with the reader's transposed-pose
            # composition M = (v2c^T p0^T inv(p1^T) inv(v2c^T))^T: choosing
            # p_t^T = inv(v2c^T) inv(m_t)^T makes M = m_t1 inv(m_t0), the
            # true velo-frame relative motion with scan1 = M scan0
            p_t = (np.linalg.inv(v2c_t) @ np.linalg.inv(m_t).T).T
            poses.append(p_t[:3].reshape(-1))
        (root / "dataset" / "poses").mkdir(exist_ok=True)
        np.savetxt(str(root / "dataset" / "poses" / f"{drive:02d}.txt"),
                   np.stack(poses))
    return root


def test_kitti_pairs_and_gt(kitti_tree):
    from deepsir_tpu.data.kitti import KITTIPair
    cfg = tiny_cfg(kitti_tree, "KITTI")
    ds = KITTIPair(cfg, split="val")     # val: no augmentation rotations
    assert len(ds) > 0
    c0, c1, gt, meta = ds.get_pair(0)
    assert c0.shape[1] == 5 and c1.shape[1] == 5   # xyz + reflectance + label
    # the refined GT must map src onto ref
    moved = se3_np.transform(gt, c0[:, :3])
    from scipy.spatial import cKDTree
    d, _ = cKDTree(c1[:, :3]).query(moved, k=1)
    assert np.median(d) < 0.3, np.median(d)
    # icp cache file written
    assert os.listdir(str(kitti_tree / "icp_opti_pose"))


def test_kitti_sample_contract(kitti_tree):
    from deepsir_tpu.data.kitti import SemanticKITTIPair
    cfg = tiny_cfg(kitti_tree, "KITTI")
    ds = SemanticKITTIPair(cfg, split="train")
    s = ds.get_sample(0, np.random.default_rng(0))
    assert s["points_src"].shape == (512, 4)
    assert s["labels_src"].shape == (512,)
    assert s["labels_src"].max() <= 19
    assert s["matches"].shape == (4096, 2)
    assert s["num_matches"] > 0
    m = s["matches"][: s["num_matches"]]
    src_t = se3_np.transform(
        np.vstack([s["transform_gt"], [0, 0, 0, 1]]),
        s["points_src"][m[:, 0], :3])
    dist = np.linalg.norm(src_t - s["points_ref"][m[:, 1], :3], axis=1)
    assert dist.max() < cfg.data.thres_radius + 1e-5


def test_kitti_test_split_distance_pairs(kitti_tree):
    from deepsir_tpu.data.kitti import KITTIPair, MIN_DIST
    # frames are ~0.82 m apart; 6 frames never reach 10 m, so the test split
    # yields no pairs for this fixture — exercise the indexing path only
    cfg = tiny_cfg(kitti_tree, "KITTI")
    import deepsir_tpu.data.kitti as K
    ds = KITTIPair.__new__(KITTIPair)
    # only check _prepare_distance_pairs runs on the fixture poses
    super(KITTIPair, ds).__init__(cfg, "test")
    ds.voxel_size = 0.3
    ds.root_path = os.path.join(str(kitti_tree), "dataset")
    ds._pose_cache = {}
    ds.files = []
    ds._prepare_distance_pairs((6,))
    assert ds.files == []        # all frames closer than MIN_DIST


@pytest.fixture(scope="module")
def oxford_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("oxford")
    rng = np.random.default_rng(3)
    train_dir = root / "train_np_nofilter"
    test_dir = root / "test_models_20k_np_nofilter"
    train_dir.mkdir()
    test_dir.mkdir()

    cloud = make_world(rng, 5000)
    np.save(str(train_dir / "frame0.npy"), cloud)
    with open(str(train_dir / "train_relative.txt"), "w") as f:
        f.write("frame0.npy | 1 2 | 1 2 3\n")

    ang = 0.1
    gt = np.eye(4)
    gt[:3, :3] = [[np.cos(ang), -np.sin(ang), 0],
                  [np.sin(ang), np.cos(ang), 0], [0, 0, 1]]
    gt[:3, 3] = [1.0, 0.5, 0.1]
    pos = cloud
    anc = se3_np.transform(gt, cloud).astype(np.float32)
    np.save(str(test_dir / "0.npy"), pos)
    np.save(str(test_dir / "1.npy"), anc)
    from scipy.spatial.transform import Rotation
    q = Rotation.from_matrix(gt[:3, :3]).as_quat()      # xyzw
    entry = {"pos_idx": 0, "anc_idx": 1, "t": gt[:3, 3],
             "q": np.array([q[3], q[0], q[1], q[2]])}    # wxyz
    with open(str(test_dir / "groundtruths.pkl"), "wb") as f:
        pickle.dump([entry], f)
    return root


def test_oxford_train_self_pair(oxford_tree):
    from deepsir_tpu.data.oxford import Oxford
    cfg = tiny_cfg(oxford_tree, "Oxford")
    ds = Oxford(cfg, split="train")
    c0, c1, gt, _ = ds.get_pair(0)
    np.testing.assert_array_equal(gt, np.eye(4))
    assert len(c0) > 100 and len(c1) > 100


def test_oxford_test_gt_quaternion(oxford_tree):
    from deepsir_tpu.data.oxford import Oxford
    from scipy.spatial import cKDTree
    cfg = tiny_cfg(oxford_tree, "Oxford")
    ds = Oxford(cfg, split="test")
    c0, c1, gt, _ = ds.get_pair(0)
    moved = se3_np.transform(gt, c0[:, :3])
    d, _ = cKDTree(c1[:, :3]).query(moved, k=1)
    assert np.median(d) < 0.5, np.median(d)


def test_oxford_pose_refine(tmp_path):
    """Flag-gated ICP GT refinement (reference oxford_loader.py:101-135):
    a perturbed catalogue pose must be pulled back onto the true pose and
    the result cached to <root>/icp_refined_pose/."""
    from scipy.spatial.transform import Rotation
    from deepsir_tpu.data.oxford import Oxford, TEST_DIR

    rng = np.random.default_rng(11)
    root = tmp_path / "Oxford"
    test_dir = root / TEST_DIR
    test_dir.mkdir(parents=True)

    cloud = make_world(rng, 5000)
    ang = 0.1
    gt = np.eye(4)
    gt[:3, :3] = [[np.cos(ang), -np.sin(ang), 0],
                  [np.sin(ang), np.cos(ang), 0], [0, 0, 1]]
    gt[:3, 3] = [1.0, 0.5, 0.1]
    np.save(str(test_dir / "0.npy"), cloud)
    np.save(str(test_dir / "1.npy"),
            se3_np.transform(gt, cloud).astype(np.float32))
    # catalogue pose = true pose perturbed by ~0.1 deg / 3 cm — inside the
    # 0.2 m ICP correspondence gate at the fixture's 45 m radius
    perturbed = gt.copy()
    perturbed[:3, :3] = Rotation.from_euler("z", 0.1, degrees=True
                                            ).as_matrix() @ gt[:3, :3]
    perturbed[:3, 3] += [0.03, -0.02, 0.01]
    q = Rotation.from_matrix(perturbed[:3, :3]).as_quat()   # xyzw
    entry = {"pos_idx": 0, "anc_idx": 1, "t": perturbed[:3, 3],
             "q": np.array([q[3], q[0], q[1], q[2]])}       # wxyz
    with open(str(test_dir / "groundtruths.pkl"), "wb") as f:
        pickle.dump([entry], f)

    cfg = tiny_cfg(root, "Oxford")
    cfg = replace(cfg, data=replace(cfg.data, oxford_pose_refine=True))
    ds = Oxford(cfg, split="test")
    _, _, refined, _ = ds.get_pair(0)

    def rot_err_deg(a, b):
        c = (np.trace(a[:3, :3].T @ b[:3, :3]) - 1) / 2
        return np.degrees(np.arccos(np.clip(c, -1, 1)))

    assert rot_err_deg(refined, gt) < 0.02 < rot_err_deg(perturbed, gt)
    assert np.linalg.norm(refined[:3, 3] - gt[:3, 3]) < 0.01

    # cached on disk; a fresh reader must serve the cache, not re-run ICP
    cache = os.path.join(str(root), "icp_refined_pose", "0_1.npy")
    assert os.path.exists(cache)
    sentinel = np.full((4, 4), 7.0)
    np.save(cache, sentinel)
    ds2 = Oxford(cfg, split="test")
    _, _, again, _ = ds2.get_pair(0)
    np.testing.assert_array_equal(again, sentinel)


def test_semantic_kitti_remap():
    from deepsir_tpu.data.semantic_kitti import remap_labels
    raw = np.array([0, 10, 252, 259, 30, 81])
    np.testing.assert_array_equal(remap_labels(raw), [0, 1, 1, 5, 6, 19])


def test_kitti_split_file_override(kitti_tree):
    """Custom split files (reference kitti_loader.py:21-24) override the
    default sequence lists."""
    from deepsir_tpu.data.kitti import KITTIPair
    split_dir = kitti_tree / "split"
    split_dir.mkdir(exist_ok=True)
    (split_dir / "val_kitti.txt").write_text("3\n")
    cfg = tiny_cfg(kitti_tree, "KITTI")
    ds = KITTIPair(cfg, split="val")
    assert {f[0] for f in ds.files} == {3}
