"""Masked ragged test-time clouds.

The reference evaluates at NATURAL cloud sizes (its exact-size resample is
train-only, /root/reference/dataloader/data_base.py:271-283). The TPU build
keeps static shapes by tile-padding small clouds to num_points and threading
a validity mask through Kabsch weights, the align loss, and the metrics.
These tests pin the invariant that padding + mask reproduces natural-size
statistics exactly.
"""
import jax.numpy as jnp
import numpy as np

from deepsir_tpu.config import Config, LossConfig, ModelConfig, replace
from deepsir_tpu.data.base import Loader, PairDataset, make_pair_arrays
from deepsir_tpu.losses.align import scan_alignment_loss
from deepsir_tpu.utils.metrics import compute_metrics


def _pad_tile(x, k):
    """fixed_resample semantics: tile the cloud, original rows first."""
    reps = -(-k // len(x))
    return np.concatenate([x] * reps, axis=0)[:k]


def _random_pose(rng):
    from scipy.spatial.transform import Rotation
    r = Rotation.from_rotvec(rng.normal(size=3) * 0.2).as_matrix()
    return np.concatenate([r, rng.normal(size=(3, 1))],
                          axis=1).astype(np.float32)


def test_masked_metrics_equal_natural_size(rng):
    """compute_metrics on a padded cloud + mask == natural-size metrics."""
    b, n_nat, n_pad = 2, 600, 1024
    src = rng.normal(size=(b, n_nat, 3)).astype(np.float32)
    ref = rng.normal(size=(b, n_nat, 3)).astype(np.float32)
    gt = np.stack([_random_pose(rng) for _ in range(b)])
    pred = np.stack([_random_pose(rng) for _ in range(b)])

    want = compute_metrics(gt, pred, src, ref, 0.6, 5.0, max_points=n_pad)

    src_p = np.stack([_pad_tile(s, n_pad) for s in src])
    ref_p = np.stack([_pad_tile(r, n_pad) for r in ref])
    mask = (np.arange(n_pad) < n_nat).astype(np.float32)[None].repeat(b, 0)
    got = compute_metrics(gt, pred, src_p, ref_p, 0.6, 5.0, max_points=n_pad,
                          mask_src=mask, mask_ref=mask)

    for k in want:
        np.testing.assert_allclose(got[k], want[k], rtol=1e-5, atol=1e-7,
                                   err_msg=f"metric {k} changed under padding")


def test_masked_align_loss_equal_natural_size(rng):
    """scan_alignment_loss on tiled-padded inputs + mask == natural size."""
    b, n_nat, n_pad, iters = 2, 50, 128, 2
    pt_src = rng.normal(size=(b, n_nat, 3)).astype(np.float32)
    pt_ref = rng.normal(size=(b, n_nat, 3)).astype(np.float32)
    gt = np.stack([_random_pose(rng) for _ in range(b)])
    preds = np.stack([np.stack([_random_pose(rng) for _ in range(b)])
                      for _ in range(iters)])
    logits = rng.normal(size=(iters, b, n_nat)).astype(np.float32)
    idx = rng.integers(0, n_nat, size=(iters, b, n_nat)).astype(np.int32)
    cfg = LossConfig(thres_radius=0.9)

    want = scan_alignment_loss(jnp.asarray(preds), jnp.asarray(logits),
                               jnp.asarray(idx), jnp.asarray(pt_src),
                               jnp.asarray(gt), None, cfg,
                               pt_ref=jnp.asarray(pt_ref))

    # tile-pad every per-point tensor the way fixed_resample does; padded
    # pred_idx entries point at duplicate ref rows (same coordinates)
    def pad2(x):
        return np.stack([_pad_tile(s, n_pad) for s in x])
    idx_p = np.stack([pad2(idx[i]) for i in range(iters)])
    logits_p = np.stack([pad2(logits[i][..., None])[..., 0]
                         for i in range(iters)])
    mask = (np.arange(n_pad) < n_nat).astype(np.float32)[None].repeat(b, 0)

    got = scan_alignment_loss(jnp.asarray(preds), jnp.asarray(logits_p),
                              jnp.asarray(idx_p), jnp.asarray(pad2(pt_src)),
                              jnp.asarray(gt), None, cfg,
                              pt_ref=jnp.asarray(pad2(pt_ref)),
                              mask_src=jnp.asarray(mask))
    for k in want:
        np.testing.assert_allclose(float(got[k]), float(want[k]),
                                   rtol=1e-5, atol=1e-6,
                                   err_msg=f"loss term {k} changed under padding")


class RaggedPairs(PairDataset):
    """Pairs whose natural sizes are below num_points (forces padding)."""
    random_rotation = False
    random_jitter = False

    def __len__(self):
        return 4

    def get_pair(self, idx):
        rng = np.random.default_rng(idx)
        n0, n1 = 100 + 10 * idx, 140 + 5 * idx
        c0 = rng.normal(size=(n0, 3)).astype(np.float32)
        c1 = rng.normal(size=(n1, 3)).astype(np.float32)
        return c0, c1, np.eye(4, dtype=np.float32), {"seq": 0}


def _tiny_cfg():
    model = ModelConfig(feat_len=3, num_points=256, num_knn=8,
                        sub_sampling_ratio=(4, 4), d_out=(8, 16),
                        out_feat_dim=16, num_classes=5, num_train_reg_iter=1,
                        num_reg_iter=2)
    cfg = Config(pipeline="align", model=model)
    return replace(cfg, data=replace(cfg.data, max_matches=64)).resolved()


def test_loader_emits_masks_for_ragged_test_clouds():
    cfg = _tiny_cfg()
    ds = RaggedPairs(cfg, "test")
    batch = next(iter(Loader(ds, batch_size=2, shuffle=False)))
    assert batch["points_src"].shape == (2, 256, 3)     # static shape
    assert batch["mask_src"].shape == (2, 256)
    # first n_raw rows valid, rest padding
    np.testing.assert_array_equal(batch["mask_src"][0],
                                  (np.arange(256) < 100).astype(np.float32))
    np.testing.assert_array_equal(batch["mask_ref"][1],
                                  (np.arange(256) < 145).astype(np.float32))
    # padded rows are tile-duplicates of the real prefix
    np.testing.assert_array_equal(batch["points_src"][0, 100:200],
                                  batch["points_src"][0, :100])

    # train split: exact resample, no masks (reference train-time semantics)
    ds_train = RaggedPairs(cfg, "train")
    batch_t = next(iter(Loader(ds_train, batch_size=2, shuffle=True)))
    assert "mask_src" not in batch_t


def test_masked_forward_align_runs_and_mask_gates_kabsch():
    """The mask reaches the Kabsch solve: poses differ with/without it."""
    import jax
    from deepsir_tpu.training import create_train_state, make_eval_step

    cfg = _tiny_cfg()
    ds = RaggedPairs(cfg, "test")
    batch = next(iter(Loader(ds, batch_size=2, shuffle=False)))
    arrays = {k: v for k, v in batch.items() if isinstance(v, np.ndarray)}
    model, state = create_train_state(cfg, arrays, steps_per_epoch=1)
    step = make_eval_step(cfg, model)

    tf_masked, out = step(state.params, arrays)
    assert np.all(np.isfinite(np.asarray(tf_masked)))
    assert not np.any(np.asarray(out.invalid))

    no_mask = {k: v for k, v in arrays.items()
               if k not in ("mask_src", "mask_ref")}
    tf_plain, _ = step(state.params, no_mask)
    assert not np.allclose(np.asarray(tf_masked), np.asarray(tf_plain))
