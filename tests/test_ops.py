import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation

from deepsir_tpu import ops
from deepsir_tpu.math import se3_np
from deepsir_tpu.ops import radius_match


# ---------------------------------------------------------------- distances

def test_square_distance_oracle(rng):
    a = rng.normal(size=(2, 17, 5)).astype(np.float32)
    b = rng.normal(size=(2, 23, 5)).astype(np.float32)
    got = np.asarray(ops.square_distance(jnp.asarray(a), jnp.asarray(b)))
    want = np.sum((a[:, :, None] - b[:, None]) ** 2, axis=-1)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_nearest_neighbour_index_oracle(rng):
    a = rng.normal(size=(2, 300, 8)).astype(np.float32)
    b = rng.normal(size=(2, 211, 8)).astype(np.float32)
    got = np.asarray(ops.nearest_neighbour_index(jnp.asarray(a), jnp.asarray(b), chunk=64))
    want = np.argmin(np.sum((a[:, :, None] - b[:, None]) ** 2, axis=-1), axis=-1)
    np.testing.assert_array_equal(got, want)


def test_mutual_gate(rng):
    from deepsir_tpu.ops.distance import mutual_gate
    # src rows 0..3 match ref rows [2, 0, 1, 2]; ref rows 0..2 match back
    # to src rows [1, 2, 0] -> mutual: src0<->ref2 (ridx[2]==0? no, ==0 yes),
    # src1<->ref0 (ridx[0]==1 yes), src2<->ref1 (ridx[1]==2 yes),
    # src3->ref2 (ridx[2]==0 != 3, not mutual).
    idx = jnp.asarray([[2, 0, 1, 2]], dtype=jnp.int32)
    ridx = jnp.asarray([[1, 2, 0]], dtype=jnp.int32)
    got = np.asarray(mutual_gate(idx, ridx, min_keep=3))
    np.testing.assert_array_equal(got, [[1.0, 1.0, 1.0, 0.0]])
    # degenerate fallback: with min_keep above the mutual count, the gate
    # opens fully so the Kabsch solve never sees an empty set
    got = np.asarray(mutual_gate(idx, ridx, min_keep=4))
    np.testing.assert_array_equal(got, [[1.0, 1.0, 1.0, 1.0]])


def test_mutual_gate_relaxed(rng):
    from deepsir_tpu.ops.distance import mutual_gate
    idx = jnp.asarray([[2, 0, 1, 2]], dtype=jnp.int32)
    ridx = jnp.asarray([[1, 2, 0]], dtype=jnp.int32)
    # src3 -> ref2 -> back to src0, which sits 0.4 from src3: accepted at
    # tol 0.5, rejected at tol 0.3 (exact-reciprocal rows are at distance 0)
    xyz = jnp.asarray([[[0.0, 0, 0], [5, 0, 0], [10, 0, 0], [0.4, 0, 0]]])
    got = np.asarray(mutual_gate(idx, ridx, src_xyz=xyz, tol=0.5))
    np.testing.assert_array_equal(got, [[1.0, 1.0, 1.0, 1.0]])
    got = np.asarray(mutual_gate(idx, ridx, src_xyz=xyz, tol=0.3))
    np.testing.assert_array_equal(got, [[1.0, 1.0, 1.0, 0.0]])


def test_mutual_gate_from_searches(rng):
    """End-to-end against the real NN search: mutual pairs survive, a source
    point far outside the overlap is gated (its nearest ref matches back to
    a different, closer src point)."""
    from deepsir_tpu.ops.distance import mutual_gate, nearest_neighbour_index
    ref = rng.normal(size=(1, 40, 3)).astype(np.float32)
    src = ref.copy()
    src[0, -1] += 100.0          # outlier: nearest ref is arbitrary,
                                 # but that ref's nearest src is its twin
    idx = nearest_neighbour_index(jnp.asarray(src), jnp.asarray(ref))
    ridx = nearest_neighbour_index(jnp.asarray(ref), jnp.asarray(src))
    gate = np.asarray(mutual_gate(idx, ridx))
    assert gate.shape == (1, 40)
    np.testing.assert_array_equal(gate[0, :-1], 1.0)
    assert gate[0, -1] == 0.0


def test_min_square_distance_oracle(rng):
    from deepsir_tpu.ops.distance import min_square_distance
    a = rng.normal(size=(150, 3)).astype(np.float32)
    b = rng.normal(size=(90, 3)).astype(np.float32)
    got = np.asarray(min_square_distance(jnp.asarray(a), jnp.asarray(b), chunk=64))
    want = np.min(np.sum((a[:, None] - b[None]) ** 2, axis=-1), axis=-1)
    np.testing.assert_allclose(got, want, atol=1e-4)


# ---------------------------------------------------------------- knn

def test_knn_oracle(rng):
    q = rng.normal(size=(100, 3)).astype(np.float32)
    r = rng.normal(size=(80, 3)).astype(np.float32)
    idx, dist = ops.knn(jnp.asarray(q), jnp.asarray(r), k=5, chunk=32)
    d_full = np.sum((q[:, None] - r[None]) ** 2, axis=-1)
    want_idx = np.argsort(d_full, axis=-1, kind="stable")[:, :5]
    np.testing.assert_array_equal(np.asarray(idx), want_idx)
    np.testing.assert_allclose(np.asarray(dist),
                               np.take_along_axis(d_full, want_idx, axis=-1), atol=1e-4)


def test_knn_k_exceeds_ref_size(rng):
    # tiny deepest pyramid levels (e.g. 256-pt clouds with 4x4x4x4 ratios
    # leave 4 points) must pad by duplicating the farthest neighbour
    q = rng.normal(size=(10, 3)).astype(np.float32)
    r = rng.normal(size=(4, 3)).astype(np.float32)
    idx, dist = ops.knn(jnp.asarray(q), jnp.asarray(r), k=16)
    idx, dist = np.asarray(idx), np.asarray(dist)
    assert idx.shape == (10, 16) and idx.max() < 4
    np.testing.assert_array_equal(idx[:, 3:], np.tile(idx[:, 3:4], (1, 13)))
    d_full = np.sum((q[:, None] - r[None]) ** 2, axis=-1)
    np.testing.assert_array_equal(idx[:, :4],
                                  np.argsort(d_full, axis=-1, kind="stable"))


def test_knn_self_includes_self(rng):
    pc = rng.normal(size=(64, 3)).astype(np.float32)
    idx, dist = ops.knn(jnp.asarray(pc), jnp.asarray(pc), k=4)
    np.testing.assert_array_equal(np.asarray(idx)[:, 0], np.arange(64))
    np.testing.assert_allclose(np.asarray(dist)[:, 0], 0.0, atol=1e-5)


# ---------------------------------------------------------------- gather

def test_gather_neighbour(rng):
    vals = rng.normal(size=(3, 20, 6)).astype(np.float32)
    idx = rng.integers(0, 20, size=(3, 10, 4)).astype(np.int32)
    got = np.asarray(ops.gather_neighbour(jnp.asarray(vals), jnp.asarray(idx)))
    for b in range(3):
        for m in range(10):
            for k in range(4):
                np.testing.assert_array_equal(got[b, m, k], vals[b, idx[b, m, k]])


def test_max_pool_and_interp(rng):
    feats = rng.normal(size=(30, 5)).astype(np.float32)
    pool_idx = rng.integers(0, 30, size=(7, 3)).astype(np.int32)
    pooled = np.asarray(ops.max_pool_neighbours(jnp.asarray(feats), jnp.asarray(pool_idx)))
    want = feats[pool_idx].max(axis=1)
    np.testing.assert_allclose(pooled, want, atol=1e-6)

    interp_idx = rng.integers(0, 7, size=(30,)).astype(np.int32)
    up = np.asarray(ops.nearest_interpolate(jnp.asarray(pooled), jnp.asarray(interp_idx)))
    np.testing.assert_allclose(up, pooled[interp_idx], atol=1e-6)


# ---------------------------------------------------------------- pyramid

def test_pyramid_shapes_and_semantics(rng):
    n, k = 256, 8
    pc = rng.normal(size=(n, 3)).astype(np.float32)
    pyr = ops.build_pyramid(jnp.asarray(pc), num_knn=k, ratios=(4, 4), chunk=64)
    assert pyr.xyz[0].shape == (256, 3) and pyr.xyz[1].shape == (64, 3)
    assert pyr.neigh_idx[0].shape == (256, k) and pyr.neigh_idx[1].shape == (64, k)
    assert pyr.pool_idx[0].shape == (64, k) and pyr.pool_idx[1].shape == (16, k)
    assert pyr.interp_idx[0].shape == (256,) and pyr.interp_idx[1].shape == (64,)
    # level-1 points are the first 64 of level 0 (pre-shuffled random sample)
    np.testing.assert_array_equal(np.asarray(pyr.xyz[1]), pc[:64])
    # pool idx is the first rows of neigh idx (reference data_base.py:167-169)
    np.testing.assert_array_equal(np.asarray(pyr.pool_idx[0]),
                                  np.asarray(pyr.neigh_idx[0])[:64])
    # interp idx points to the true nearest sub-point
    d = np.sum((pc[:, None] - pc[None, :64]) ** 2, axis=-1)
    np.testing.assert_array_equal(np.asarray(pyr.interp_idx[0]), d.argmin(axis=-1))


def test_pyramid_batched(rng):
    pc = rng.normal(size=(2, 64, 3)).astype(np.float32)
    pyr = ops.build_pyramid(jnp.asarray(pc), num_knn=4, ratios=(4,), chunk=32)
    assert pyr.xyz[0].shape == (2, 64, 3)
    assert pyr.pool_idx[0].shape == (2, 16, 4)


# ---------------------------------------------------------------- kabsch

def test_weighted_kabsch_recovers_pose(rng):
    rot = Rotation.random(random_state=np.random.RandomState(7)).as_matrix()
    t = np.array([0.5, -1.0, 2.0])
    src = rng.normal(size=(1, 200, 3)).astype(np.float64)
    tgt = src @ rot.T + t
    w = rng.uniform(0.1, 1.0, size=(1, 200))
    T, invalid = ops.weighted_kabsch(jnp.asarray(src), jnp.asarray(tgt), jnp.asarray(w))
    T = np.asarray(T)
    assert not np.asarray(invalid)[0]
    np.testing.assert_allclose(T[0, :, :3], rot, atol=1e-5)
    np.testing.assert_allclose(T[0, :, 3], t, atol=1e-5)


def test_weighted_kabsch_weights_matter(rng):
    """Outliers with ~zero weight must not perturb the solve."""
    rot = Rotation.from_euler("z", 40, degrees=True).as_matrix()
    src = rng.normal(size=(100, 3))
    tgt = src @ rot.T
    src_full = np.concatenate([src, rng.normal(size=(20, 3)) * 10], axis=0)
    tgt_full = np.concatenate([tgt, rng.normal(size=(20, 3)) * 10], axis=0)
    w = np.concatenate([np.ones(100), np.full(20, 1e-9)])
    T, invalid = ops.weighted_kabsch(jnp.asarray(src_full[None]),
                                     jnp.asarray(tgt_full[None]),
                                     jnp.asarray(w[None]))
    np.testing.assert_allclose(np.asarray(T)[0, :, :3], rot, atol=1e-4)


def test_weighted_kabsch_invalid_fallback():
    src = jnp.full((1, 10, 3), jnp.nan)
    tgt = jnp.zeros((1, 10, 3))
    w = jnp.ones((1, 10))
    T, invalid = ops.weighted_kabsch(src, tgt, w)
    assert bool(np.asarray(invalid)[0])
    np.testing.assert_allclose(np.asarray(T)[0], np.eye(3, 4))


def test_weighted_kabsch_det_positive(rng):
    """Reflection-heavy configurations must still return a proper rotation."""
    src = rng.normal(size=(5, 50, 3))
    refl = np.diag([1.0, 1.0, -1.0])
    tgt = src @ refl.T  # a reflection, not a rotation
    T, _ = ops.weighted_kabsch(jnp.asarray(src), jnp.asarray(tgt),
                               jnp.ones((5, 50)))
    dets = np.linalg.det(np.asarray(T)[:, :, :3])
    assert np.all(dets > 0.99)


# ---------------------------------------------------------------- voxel

def test_voxel_downsample_np_means(rng):
    pts = np.array([[0.1, 0.1, 0.1, 5.0],
                    [0.2, 0.2, 0.2, 7.0],
                    [1.5, 0.1, 0.1, 1.0]], dtype=np.float32)
    out = ops.voxel_downsample_np(pts, voxel_size=1.0)
    assert out.shape == (2, 4)
    row0 = out[np.argmin(out[:, 0])]
    np.testing.assert_allclose(row0, [0.15, 0.15, 0.15, 6.0], atol=1e-6)


def test_voxel_downsample_jit_matches_np(rng):
    pts = rng.uniform(-5, 5, size=(500, 4)).astype(np.float32)
    want = ops.voxel_downsample_np(pts, 1.0)
    got, mask = ops.voxel_downsample(jnp.asarray(pts), 1.0, capacity=600)
    got = np.asarray(got)[np.asarray(mask)]
    # same multiset of voxel means (order may differ)
    want_sorted = want[np.lexsort(want.T)]
    got_sorted = got[np.lexsort(got.T)]
    assert got.shape == want.shape
    np.testing.assert_allclose(got_sorted, want_sorted, atol=1e-4)


def test_voxel_downsample_jit_respects_mask(rng):
    pts = rng.uniform(-2, 2, size=(100, 3)).astype(np.float32)
    valid = np.zeros(100, dtype=bool)
    valid[:40] = True
    got, mask = ops.voxel_downsample(jnp.asarray(pts), 0.5, capacity=128,
                                     valid_mask=jnp.asarray(valid))
    want = ops.voxel_downsample_np(pts[:40], 0.5)
    assert int(np.asarray(mask).sum()) == len(want)


# ---------------------------------------------------------------- sinkhorn

def test_sinkhorn_rows_cols_normalized(rng):
    log_a = jnp.asarray(rng.normal(size=(2, 12, 12)).astype(np.float32))
    out = np.exp(np.asarray(ops.sinkhorn(log_a, n_iters=50, slack=False)))
    np.testing.assert_allclose(out.sum(axis=2), 1.0, atol=1e-3)
    np.testing.assert_allclose(out.sum(axis=1), 1.0, atol=1e-3)


def test_sinkhorn_slack_bounded(rng):
    log_a = jnp.asarray(rng.normal(size=(1, 10, 14)).astype(np.float32))
    out = np.exp(np.asarray(ops.sinkhorn(log_a, n_iters=30, slack=True)))
    assert np.all(out.sum(axis=2) <= 1.0 + 1e-4)
    assert np.all(out.sum(axis=1) <= 1.0 + 1e-4)


def test_compute_affinity():
    beta = jnp.asarray([2.0])
    d = jnp.ones((1, 3, 3)) * 1.5
    out = np.asarray(ops.compute_affinity(beta, d, alpha=0.5))
    np.testing.assert_allclose(out, -2.0, atol=1e-6)


# ---------------------------------------------------------------- radius match

def test_radius_matches_oracle(rng):
    src = rng.uniform(-1, 1, size=(50, 3))
    rot = Rotation.from_euler("z", 25, degrees=True).as_matrix()
    g = np.concatenate([rot, np.array([[0.3], [0.1], [0.0]])], axis=1)
    tgt = se3_np.transform(g, src) + rng.normal(scale=0.01, size=(50, 3))
    matches = radius_match.radius_matches_np(src, tgt, g, radius=0.05)
    # every point should match at least itself
    assert len(matches) >= 50
    d = np.linalg.norm(se3_np.transform(g, src)[matches[:, 0]] - tgt[matches[:, 1]], axis=1)
    assert np.all(d < 0.05)


def test_voxel_label_majority_vote(rng):
    """label_column aggregates by per-voxel majority vote (NOT the mean of
    class ids, which invents classes neither point had)."""
    from deepsir_tpu.ops.voxel import voxel_downsample_np
    pts = rng.uniform(0, 1, size=(2000, 3)).astype(np.float32)
    lab = rng.integers(1, 20, size=2000).astype(np.float32)
    cloud = np.concatenate([pts, lab[:, None]], 1)
    out = voxel_downsample_np(cloud, 0.25, label_column=3)
    coords = np.floor(pts.astype(np.float64) / 0.25).astype(np.int64)
    coords -= coords.min(0)
    dims = coords.max(0) + 1
    keys = (coords[:, 0] * dims[1] + coords[:, 1]) * dims[2] + coords[:, 2]
    for i, k in enumerate(np.unique(keys)):
        labs = lab[keys == k].astype(int)
        vals, cnts = np.unique(labs, return_counts=True)
        assert int(out[i, 3]) == vals[cnts == cnts.max()].max()
        # non-label channels still mean-aggregated
        np.testing.assert_allclose(out[i, :3], pts[keys == k].mean(0),
                                   rtol=1e-5)


def test_radius_matches_jit_matches_scipy_oracle(rng):
    """The in-graph tiled kernel must find the exact same (i, j) pair SET as
    the host scipy path when degree and capacity caps are not binding."""
    src = rng.uniform(-1, 1, size=(200, 3))
    rot = Rotation.from_euler("xz", [40, 25], degrees=True).as_matrix()
    g = np.concatenate([rot, np.array([[0.3], [0.1], [-0.2]])], axis=1)
    tgt = se3_np.transform(g, src) + rng.normal(scale=0.05, size=(200, 3))
    radius = 0.15
    oracle = set(map(tuple, radius_match.radius_matches_np(
        src, tgt, g, radius)))
    pairs, num = radius_match.radius_matches(src, tgt, g, radius,
                                             k_per_point=32, capacity=4096)
    pairs, num = np.asarray(pairs), int(num)
    assert num == len(oracle)
    assert set(map(tuple, pairs[:num])) == oracle
    np.testing.assert_array_equal(pairs[num:], -1)
    # compaction keeps per-source ascending-distance order for capped use
    d = np.linalg.norm(se3_np.transform(g, src)[pairs[:num, 0]]
                       - tgt[pairs[:num, 1]], axis=1)
    assert np.all(d < radius)


def test_radius_matches_jit_capacity_truncation(rng):
    src = rng.uniform(-0.1, 0.1, size=(64, 3))      # dense: everything matches
    g = np.eye(3, 4)
    pairs, num = radius_match.radius_matches(src, src, g, 1.0,
                                             k_per_point=64, capacity=100)
    assert int(num) == 100 and np.asarray(pairs).shape == (100, 2)
    assert np.all(np.asarray(pairs) >= 0)


def test_pad_matches():
    m = np.array([[1, 2], [3, 4]], dtype=np.int32)
    padded, n = radius_match.pad_matches(m, 5)
    assert padded.shape == (5, 2) and n == 2
    np.testing.assert_array_equal(padded[2:], -1)
    truncated, n2 = radius_match.pad_matches(m, 1)
    assert truncated.shape == (1, 2) and n2 == 1


def test_ransac_recovers_pose_with_outliers(rng):
    """Vmapped RANSAC (ops/ransac.py) must recover a rigid pose from
    correspondences with 40% gross outliers."""
    import jax
    import jax.numpy as jnp
    from deepsir_tpu.ops.ransac import ransac_correspondence

    n = 400
    src = rng.normal(size=(n, 3)).astype(np.float32) * 5
    ang = 0.5
    rot = np.array([[np.cos(ang), -np.sin(ang), 0],
                    [np.sin(ang), np.cos(ang), 0], [0, 0, 1]], np.float32)
    t = np.array([1.0, -2.0, 0.5], np.float32)
    ref = src @ rot.T + t

    corres = np.stack([np.arange(n), np.arange(n)], 1).astype(np.int32)
    # corrupt 40% of the correspondences
    bad = rng.choice(n, size=int(0.4 * n), replace=False)
    corres[bad, 1] = rng.integers(0, n, size=len(bad))

    tr, frac = ransac_correspondence(
        jax.random.PRNGKey(0), jnp.asarray(src), jnp.asarray(ref),
        jnp.asarray(corres), threshold=0.1, num_hypotheses=512)
    tr = np.asarray(tr)
    assert np.abs(tr[:, :3] - rot).max() < 1e-3
    assert np.abs(tr[:, 3] - t).max() < 1e-3
    assert float(frac) > 0.55


def test_farthest_point_sample_spreads(rng):
    from deepsir_tpu.ops.pointnet import farthest_point_sample
    import jax.numpy as jnp
    # two tight clusters far apart: FPS with S=2 must pick one from each
    a = rng.normal(size=(50, 3)).astype(np.float32) * 0.1
    b = a + np.array([100.0, 0, 0], np.float32)
    pts = np.concatenate([a, b])
    idx = np.asarray(farthest_point_sample(jnp.asarray(pts), 2))
    assert (idx[0] < 50) != (idx[1] < 50)


def test_query_ball_point_fill(rng):
    from deepsir_tpu.ops.pointnet import query_ball_point
    import jax.numpy as jnp
    xyz = rng.normal(size=(1, 100, 3)).astype(np.float32)
    centers = xyz[:, :4]
    idx = np.asarray(query_ball_point(0.5, 8, jnp.asarray(xyz),
                                      jnp.asarray(centers)))
    assert idx.shape == (1, 4, 8)
    d = np.linalg.norm(xyz[0][idx[0]] - centers[0][:, None], axis=-1)
    assert (d < 0.5 + 1e-5).all()      # fill slots repeat an in-ball point


def test_sample_and_group_shapes(rng):
    from deepsir_tpu.ops.pointnet import sample_and_group
    import jax.numpy as jnp
    xyz = jnp.asarray(rng.normal(size=(2, 128, 3)).astype(np.float32))
    feat = jnp.asarray(rng.normal(size=(2, 128, 7)).astype(np.float32))
    new_xyz, grouped = sample_and_group(16, 1.0, 8, xyz, feat)
    assert new_xyz.shape == (2, 16, 3)
    assert grouped.shape == (2, 16, 8, 10)


def test_jitted_icp_converges(rng):
    """On-device ICP (ops/icp.icp) recovers a small rigid motion."""
    import jax.numpy as jnp
    from deepsir_tpu.math import se3_np
    from deepsir_tpu.ops.icp import icp

    cloud = rng.normal(size=(800, 3)).astype(np.float32) * 3
    ang = 0.06
    gt = np.eye(4)
    gt[:3, :3] = [[np.cos(ang), -np.sin(ang), 0],
                  [np.sin(ang), np.cos(ang), 0], [0, 0, 1]]
    gt[:3, 3] = [0.15, -0.1, 0.05]
    tgt = se3_np.transform(gt, cloud).astype(np.float32)
    est = np.asarray(icp(jnp.asarray(cloud), jnp.asarray(tgt),
                         max_corr_dist=1.0, num_iter=30, chunk=256))
    assert np.abs(est - gt[:3]).max() < 1e-3
