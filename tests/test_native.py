"""C++ host-runtime kernels vs python oracles.

The native library replaces the reference's compiled data-path deps
(Open3D, torch_points_kernels — SURVEY.md §2.4); these tests pin its
behavior to the scipy/numpy fallback implementations.
"""
import numpy as np
import pytest
from scipy.spatial import cKDTree

from deepsir_tpu import native
from deepsir_tpu.math import se3_np

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native lib not built")


def test_voxel_matches_numpy_fallback(rng):
    from deepsir_tpu.ops import voxel
    pts = rng.normal(size=(5000, 4)).astype(np.float32) * 5

    # pure-numpy reference path (bypass the native dispatch)
    coords = np.floor(pts[:, :3] / 0.5).astype(np.int64)
    coords -= coords.min(axis=0)
    dims = coords.max(axis=0) + 1
    keys = (coords[:, 0] * dims[1] + coords[:, 1]) * dims[2] + coords[:, 2]
    uniq, inv, counts = np.unique(keys, return_inverse=True,
                                  return_counts=True)
    want = np.zeros((len(uniq), 4))
    np.add.at(want, inv, pts)
    want /= counts[:, None]

    got = native.voxel_downsample(pts, 0.5)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want.astype(np.float32), atol=1e-4)


def test_knn_matches_scipy(rng):
    q = rng.normal(size=(500, 3)).astype(np.float32)
    r = rng.normal(size=(800, 3)).astype(np.float32)
    idx, dist = native.knn_search(q, r, 8)
    d2, i2 = cKDTree(r).query(q, k=8)
    np.testing.assert_array_equal(idx, i2)
    np.testing.assert_allclose(np.sqrt(dist), d2, atol=1e-4)


def test_radius_matches_scipy(rng):
    q = rng.normal(size=(400, 3)).astype(np.float32)
    r = rng.normal(size=(600, 3)).astype(np.float32)
    gt = np.eye(4)
    gt[:3, 3] = [0.1, 0.2, 0.0]
    got = set(map(tuple, native.radius_matches(q, r, gt, 0.3)))

    src_t = se3_np.transform(gt, q)
    want = set()
    for i, nbrs in enumerate(cKDTree(r).query_ball_point(src_t, r=0.3)):
        for j in nbrs:
            want.add((i, j))
    assert got == want


def test_radius_matches_overflow_retries(rng):
    # more matches than the initial buffer: the wrapper must detect the
    # true count and retry instead of silently truncating
    q = rng.normal(size=(100, 3)).astype(np.float32)
    r = rng.normal(size=(150, 3)).astype(np.float32)
    gt = np.eye(4)
    full = native.radius_matches(q, r, gt, 1.0)
    assert len(full) > 32
    small = native.radius_matches(q, r, gt, 1.0, max_pairs=32)
    assert set(map(tuple, small)) == set(map(tuple, full))


def test_icp_recovers_pose(rng):
    cloud = rng.normal(size=(2000, 3)).astype(np.float32) * 3
    ang = 0.05
    gt = np.eye(4)
    gt[:3, :3] = [[np.cos(ang), -np.sin(ang), 0],
                  [np.sin(ang), np.cos(ang), 0], [0, 0, 1]]
    gt[:3, 3] = [0.1, -0.05, 0.02]
    tgt = se3_np.transform(gt, cloud)
    est = native.icp_point2point(cloud, tgt, 1.0)
    assert np.abs(est - gt).max() < 1e-3
