"""Windowed Pallas KNN kernel (ops/pallas_knn.py windowed mode) against
its XLA oracle, in interpreter mode on the
CPU mesh (the real-TPU path is exercised by scripts/ablate_align.py and the
bench on hardware)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from deepsir_tpu.ops.morton import morton_order_np
from deepsir_tpu.ops.window import TQ, VB, window_geometry

N, D, K, HALO = 2048, 3, 8, 1


@pytest.fixture(scope="module")
def sorted_cloud():
    rng = np.random.default_rng(7)
    pts = rng.standard_normal((N, D)).astype(np.float32)
    return pts[morton_order_np(pts)]


def test_windowed_knn_kernel_matches_xla_window(sorted_cloud):
    from deepsir_tpu.ops.knn import _knn_single_windowed
    from deepsir_tpu.ops.pallas_knn import knn_topk_windowed

    want_idx, want_dist = _knn_single_windowed(
        jnp.asarray(sorted_cloud), jnp.asarray(sorted_cloud), K, HALO)
    with pltpu.force_tpu_interpret_mode():
        idx, dist = knn_topk_windowed(jnp.asarray(sorted_cloud),
                                      jnp.asarray(sorted_cloud), K, HALO)
    idx, dist = np.asarray(idx), np.asarray(dist)
    want_idx = np.asarray(want_idx)
    # distance keys are quantized to 8 mantissa bits -> allow near-tie index
    # swaps; the neighbour SETS must agree almost everywhere
    agree = np.mean([len(np.intersect1d(a, b)) / K
                     for a, b in zip(idx, want_idx)])
    assert agree > 0.99, agree
    np.testing.assert_allclose(dist, np.asarray(want_dist),
                               rtol=4e-3, atol=1e-5)
    # self-match first (distance 0 packs to the lowest key for its index)
    np.testing.assert_array_equal(idx[:, 0], np.arange(N))
    # every index inside its tile's window (the gather precondition)
    width, start = window_geometry(N, N, HALO)
    for i in range(N // TQ):
        lo = int(start(i)) * VB
        tile = idx[i * TQ:(i + 1) * TQ]
        assert (tile >= lo).all() and (tile < lo + width * VB).all()
