"""Pallas fused distance+argmin kernel vs the exact XLA path.

Runs in Pallas interpreter mode on the CPU test mesh (the real-TPU path is
exercised by bench/profiling runs on hardware; measured there: 2.1 ms vs
4.5 ms XLA at 18000^2 x 64, bit-exact at HIGHEST precision)."""
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from deepsir_tpu.ops.distance import nearest_neighbour_index
from deepsir_tpu.ops.pallas_match import match_argmin_single, supported


@pytest.mark.parametrize("n,m,c", [(512, 2048, 64), (1000, 3000, 64),
                                   (700, 5000, 128), (100, 257, 16)])
def test_matches_exact_oracle(rng, n, m, c):
    src = rng.normal(size=(n, c)).astype(np.float32)
    ref = rng.normal(size=(m, c)).astype(np.float32)
    assert supported(n, m, c)
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(match_argmin_single(src, ref))
    want = np.asarray(nearest_neighbour_index(src, ref, method="xla"))
    np.testing.assert_array_equal(got, want)


def test_low_precision_matches_are_near_ties(rng):
    # bf16-operand matching may only deviate on descriptors whose distances
    # agree within bf16 rounding; on unit-norm features that means the
    # matched distance is within ~1% of the true minimum
    src = rng.normal(size=(256, 64)).astype(np.float32)
    ref = rng.normal(size=(2048, 64)).astype(np.float32)
    src /= np.linalg.norm(src, axis=1, keepdims=True)
    ref /= np.linalg.norm(ref, axis=1, keepdims=True)
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(match_argmin_single(src, ref, low_precision=True))
    d = ((src[:, None] - ref[None]) ** 2).sum(-1)
    matched = np.take_along_axis(d, got[:, None], 1)[:, 0]
    np.testing.assert_allclose(matched, d.min(1), atol=0.02)


def test_padded_ref_columns_never_win(rng):
    # m not a multiple of the ref tile: the padded tail must be masked
    src = rng.normal(size=(64, 32)).astype(np.float32) + 100.0
    ref = rng.normal(size=(10, 32)).astype(np.float32) + 100.0
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(match_argmin_single(src, ref))
    assert got.max() < 10


@pytest.mark.parametrize("n,m,c", [(512, 2048, 64), (700, 2500, 64),
                                   (1030, 513, 16)])
def test_bidirectional_matches_both_oracles(rng, n, m, c):
    from deepsir_tpu.ops.pallas_match import match_argmin_bidirectional
    src = rng.normal(size=(n, c)).astype(np.float32)
    ref = rng.normal(size=(m, c)).astype(np.float32)
    with pltpu.force_tpu_interpret_mode():
        idx, ridx = match_argmin_bidirectional(src, ref)
    d = ((src[:, None] - ref[None]) ** 2).sum(-1)
    np.testing.assert_array_equal(np.asarray(idx), np.argmin(d, axis=1))
    np.testing.assert_array_equal(np.asarray(ridx), np.argmin(d, axis=0))


def test_bidirectional_vmapped_batch(rng):
    # the model path vmaps the kernel over the pair batch
    # (ops/distance.py::nearest_neighbour_bidirectional)
    import jax
    from deepsir_tpu.ops.pallas_match import match_argmin_bidirectional
    src = rng.normal(size=(2, 300, 32)).astype(np.float32)
    ref = rng.normal(size=(2, 500, 32)).astype(np.float32)
    with pltpu.force_tpu_interpret_mode():
        idx, ridx = jax.vmap(match_argmin_bidirectional)(src, ref)
    d = ((src[:, :, None] - ref[:, None]) ** 2).sum(-1)
    np.testing.assert_array_equal(np.asarray(idx), np.argmin(d, axis=2))
    np.testing.assert_array_equal(np.asarray(ridx), np.argmin(d, axis=1))


def test_bidirectional_padded_rows_and_cols_never_win(rng):
    from deepsir_tpu.ops.pallas_match import match_argmin_bidirectional
    # neither padded query rows (zeros, closer to everything than the +100
    # offset clouds) nor padded ref columns may win either direction
    src = rng.normal(size=(70, 32)).astype(np.float32) + 100.0
    ref = rng.normal(size=(10, 32)).astype(np.float32) + 100.0
    with pltpu.force_tpu_interpret_mode():
        idx, ridx = match_argmin_bidirectional(src, ref)
    assert np.asarray(idx).max() < 10
    assert np.asarray(ridx).max() < 70
