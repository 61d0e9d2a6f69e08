"""Curve-rank windowing: geometry lemma, windowed KNN exactness, recall
floor, and strided pyramid semantics (ops/window.py, ops/morton.py,
ops/knn.py windowed path, ops/pyramid.py sample="strided")."""
import numpy as np
import jax.numpy as jnp
import pytest

from deepsir_tpu.ops.morton import morton_code_np, morton_order_np
from deepsir_tpu.ops.window import TQ, VB, num_blocks, window_geometry


def _tile_windows(nq, nv, halo):
    width, start = window_geometry(nq, nv, halo)
    n_tiles = -(-nq // TQ)
    return [(int(start(i)), int(start(i)) + width) for i in range(n_tiles)]


def test_window_coverage_lemma():
    """Every gather tile's window must contain the KNN windows of all query
    rows it serves — the exactness precondition of the windowed gather.

    Cases: the self neigh gather (nq=nv=N, indices from self-KNN at level
    l), the pool gather one level down (nq=N/r, nv=N, indices = strided
    rows of the same self-KNN), and the interp gather (nq=N, nv=N/r,
    indices from the cross-level k=1 search at identical (nq, nv))."""
    halo = 4
    for n in (18000, 4500, 1125, 2048, 1000):
        for r in (4,):
            knn_self = _tile_windows(n, n, halo)
            # self gather: identical geometry by construction
            assert _tile_windows(n, n, halo) == knn_self
            # pool gather: query tile i serves strided rows r*(i*TQ..i*TQ+TQ)
            # = original KNN tiles r*i .. r*i+r-1
            for i, (g0, g1) in enumerate(_tile_windows(n // r, n, halo)):
                n_tiles_src = len(knn_self)
                for t in range(r * i, min(r * i + r, n_tiles_src)):
                    k0, k1 = knn_self[t]
                    assert g0 <= k0 and k1 <= g1, (n, i, t)
            # interp gather: same (nq, nv) as the cross-level search
            assert (_tile_windows(n, n // r, halo)
                    == _tile_windows(n, n // r, halo))


def test_windowed_knn_exact_within_window():
    """The windowed XLA KNN equals a brute-force search restricted to the
    same window (and indices never leave the window)."""
    from deepsir_tpu.ops.knn import _knn_single_windowed
    rng = np.random.default_rng(0)
    n, m, d, k, halo = 1500, 1500, 3, 8, 2
    pts = rng.standard_normal((n, d)).astype(np.float32)
    pts = pts[morton_order_np(pts)]
    idx, dist = _knn_single_windowed(jnp.asarray(pts), jnp.asarray(pts),
                                     k, halo)
    idx, dist = np.asarray(idx), np.asarray(dist)
    width, start = window_geometry(n, m, halo)
    for i in range(-(-n // TQ)):
        lo, hi = int(start(i)) * VB, int(start(i)) * VB + width * VB
        q = pts[i * TQ:(i + 1) * TQ]
        win = pts[lo:min(hi, m)]
        d2 = ((q[:, None, :] - win[None, :, :]) ** 2).sum(-1)
        want = np.sort(d2, axis=1)[:, :k]
        got = dist[i * TQ:(i + 1) * TQ]
        assert (idx[i * TQ:(i + 1) * TQ] >= lo).all()
        assert (idx[i * TQ:(i + 1) * TQ] < hi).all()
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_windowed_knn_recall_floor_protocol():
    """Window coverage on a protocol cloud (the quantity measured in
    scripts/morton_recall.py, here with the kernel's integer geometry)."""
    from scipy.spatial import cKDTree
    from deepsir_tpu.data.synthetic import make_structured_cloud
    cloud = make_structured_cloud(np.random.default_rng(3), 9000)[:, :3]
    cloud = cloud[morton_order_np(cloud)]
    true_idx = cKDTree(cloud).query(cloud, k=16)[1]
    halo = 8
    width, start = window_geometry(len(cloud), len(cloud), halo)
    hits = 0
    for i in range(-(-len(cloud) // TQ)):
        lo = int(start(i)) * VB
        t = true_idx[i * TQ:(i + 1) * TQ]
        hits += ((t >= lo) & (t < lo + width * VB)).sum()
    assert hits / true_idx.size > 0.93


def test_strided_pyramid_keeps_curve_order_and_uniformity():
    from deepsir_tpu.ops.pyramid import build_pyramid
    rng = np.random.default_rng(1)
    pts = rng.standard_normal((2048, 3)).astype(np.float32)
    pts = pts[morton_order_np(pts)]
    pyr = build_pyramid(jnp.asarray(pts), num_knn=8, ratios=(4, 4),
                        sample="strided", window_halo=2)
    lvl0, lvl1 = np.asarray(pyr.xyz[0]), np.asarray(pyr.xyz[1])
    np.testing.assert_array_equal(lvl1, lvl0[::4])
    # curve order survives the subsample: a strided slice of a sorted
    # sequence is sorted under the SAME key (the input cloud's codes;
    # re-coding lvl1 with its own bbox would change the quantization)
    codes = morton_code_np(pts)
    assert (np.diff(codes) >= 0).all()
    assert (np.diff(codes[::4][:len(lvl1)]) >= 0).all()
    # pool neighbourhoods are the kept points' own level-0 neighbourhoods
    np.testing.assert_array_equal(np.asarray(pyr.pool_idx[0]),
                                  np.asarray(pyr.neigh_idx[0])[::4])


def test_windowed_knn_batch_and_jit():
    from deepsir_tpu.ops.knn import knn
    rng = np.random.default_rng(2)
    pts = rng.standard_normal((2, 1024, 3)).astype(np.float32)
    for b in range(2):
        pts[b] = pts[b][morton_order_np(pts[b])]
    idx, dist = knn(jnp.asarray(pts), jnp.asarray(pts), 4, window_halo=2)
    assert idx.shape == (2, 1024, 4)
    # self-KNN must find the point itself first (distance 0)
    np.testing.assert_array_equal(np.asarray(idx)[..., 0],
                                  np.arange(1024)[None, :].repeat(2, 0))
