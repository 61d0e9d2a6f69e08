import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepsir_tpu.config import (Config, DataConfig, LossConfig, ModelConfig,
                                TrainConfig, replace)
from deepsir_tpu.data.base import Loader
from deepsir_tpu.data.synthetic import SyntheticPairs
from deepsir_tpu.training import (TRAINABLE_GROUPS, batch_arrays_only,
                                  create_train_state, make_eval_step,
                                  make_forward_step, make_optimizer,
                                  make_train_step)
from deepsir_tpu.utils.checkpoint import CheckPointManager, partial_restore


def tiny_cfg(pipeline="align", **model_kw):
    model = ModelConfig(feat_len=3, num_points=256, num_knn=8,
                        sub_sampling_ratio=(4, 4), d_out=(8, 16),
                        out_feat_dim=16, num_train_reg_iter=1,
                        num_reg_iter=2, **model_kw)
    return Config(pipeline=pipeline, model=model,
                  data=DataConfig(dataset_type="Synthetic", max_matches=2000),
                  loss=LossConfig(), train=TrainConfig(lr=1e-3)).resolved()


def get_batch(cfg, split="train", n=2):
    ds = SyntheticPairs(cfg, split, size=n)
    loader = Loader(ds, batch_size=n, shuffle=False, num_workers=1)
    return batch_arrays_only(next(iter(loader)))


def changed(a, b):
    return any(not np.allclose(np.asarray(x), np.asarray(y))
               for x, y in zip(jax.tree_util.tree_leaves(a),
                               jax.tree_util.tree_leaves(b)))


def test_align_train_step_updates_only_inlier():
    cfg = tiny_cfg("align")
    arrays = get_batch(cfg)
    model, state = create_train_state(cfg, arrays, steps_per_epoch=10)
    tx = make_optimizer(cfg, 10)
    step_fn = make_train_step(cfg, model, tx)
    new_state, aux = step_fn(state, arrays, jax.random.PRNGKey(0))
    assert np.isfinite(float(aux["loss"]))
    assert not bool(aux["skipped"])
    p0, p1 = state.params["params"], new_state.params["params"]
    assert changed(p1["inlier_model"], p0["inlier_model"])
    assert not changed(p1["feat_extractor"], p0["feat_extractor"])
    assert not changed(p1["mlp_feat"], p0["mlp_feat"])


def test_align_train_step_decreases_loss():
    """Learned-align smoke: 12 steps on a fixed batch must reduce the
    alignment loss (regression gate for the learned end-to-end path; the
    full staged-quality floor runs on TPU via scripts/staged_synthetic.sh)."""
    cfg = tiny_cfg("align")
    arrays = get_batch(cfg, n=2)
    model, state = create_train_state(cfg, arrays, steps_per_epoch=10)
    tx = make_optimizer(cfg, 10)
    step_fn = make_train_step(cfg, model, tx)
    rng = jax.random.PRNGKey(0)
    losses = []
    for i in range(12):
        rng, sub = jax.random.split(rng)
        state, aux = step_fn(state, arrays, sub)
        losses.append(float(aux["loss"]))
    assert min(losses[-3:]) < losses[0], losses


def test_label_train_step_decreases_loss():
    cfg = tiny_cfg("label")
    ds = SyntheticPairs(cfg, "train", size=1)
    loader = Loader(ds, batch_size=1, shuffle=False)
    arrays = batch_arrays_only(next(iter(loader)))
    # fabricate consistent labels from height so the task is learnable
    z = arrays["points_src"][..., 2]
    arrays["labels_src"] = (1 + (z > np.median(z)).astype(np.int32) * 8)
    z = arrays["points_ref"][..., 2]
    arrays["labels_ref"] = (1 + (z > np.median(z)).astype(np.int32) * 8)

    model, state = create_train_state(cfg, arrays, steps_per_epoch=100)
    tx = make_optimizer(cfg, 100)
    step_fn = make_train_step(cfg, model, tx)
    losses = []
    for i in range(15):
        state, aux = step_fn(state, arrays, jax.random.PRNGKey(i))
        losses.append(float(aux["loss"]))
    assert losses[-1] < losses[0] * 0.9, losses


def test_feat_train_step_runs():
    cfg = tiny_cfg("feat")
    arrays = get_batch(cfg)
    model, state = create_train_state(cfg, arrays, steps_per_epoch=10)
    tx = make_optimizer(cfg, 10)
    step_fn = make_train_step(cfg, model, tx)
    new_state, aux = step_fn(state, arrays, jax.random.PRNGKey(0))
    assert np.isfinite(float(aux["loss"]))
    p0, p1 = state.params["params"], new_state.params["params"]
    assert changed(p1["mlp_feat"], p0["mlp_feat"])
    assert not changed(p1["feat_extractor"], p0["feat_extractor"])


def _grads(cfg, model, params, arrays, rng):
    from deepsir_tpu.training import compute_loss, device_batch
    from deepsir_tpu.models import ForwardOptions

    batch = device_batch(cfg, arrays)
    opts = ForwardOptions(num_iter=cfg.model.num_train_reg_iter)

    def loss_fn(p):
        return compute_loss(cfg, model, p, batch, opts, True, rng)[0]

    return jax.jit(jax.grad(loss_fn))(params)


@pytest.mark.parametrize("pipeline", ["align", "feat"])
def test_stop_frozen_gradients_preserves_trainable_grads(pipeline):
    """stop_gradient at the staged-freeze boundary must not change the
    gradients of the TRAINABLE groups (it only removes backward compute the
    freeze mask would zero anyway)."""
    from deepsir_tpu.models import Network

    cfg = tiny_cfg(pipeline)
    arrays = get_batch(cfg)
    model, state = create_train_state(cfg, arrays, steps_per_epoch=10)
    model_nostop = Network(cfg.model, pipeline=pipeline,
                           stop_frozen_gradients=False)
    rng = jax.random.PRNGKey(0)
    g_stop = _grads(cfg, model, state.params, arrays, rng)
    g_full = _grads(cfg, model_nostop, state.params, arrays, rng)
    for group in TRAINABLE_GROUPS[pipeline]:
        a = jax.tree_util.tree_leaves(g_stop["params"][group])
        b = jax.tree_util.tree_leaves(g_full["params"][group])
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    # and the frozen groups' grads really are dead now
    frozen = set(g_stop["params"]) - TRAINABLE_GROUPS[pipeline]
    for group in frozen:
        for leaf in jax.tree_util.tree_leaves(g_stop["params"][group]):
            assert not np.any(np.asarray(leaf)), group


def test_align_train_batch_ships_no_matches_by_default():
    """The geometric BCE label path (default) must not pay host KDTree time
    or relay transfer for a match list the loss never reads."""
    cfg = tiny_cfg("align")
    assert not cfg.data.gt_match_lists
    arrays = get_batch(cfg)
    assert "matches" not in arrays and "num_matches" not in arrays
    # and the list mode still ships them
    cfg_l = replace(cfg, data=replace(cfg.data, gt_match_lists=True))
    arrays_l = get_batch(cfg_l)
    assert arrays_l["matches"].shape[-1] == 2


def test_geometric_and_list_bce_agree():
    """The in-graph geometric labels equal the reference-style match-list
    lookup on exact-resampled batches (the cross-check that keeps the list
    path honest while the geometric path is the default)."""
    from deepsir_tpu.losses import scan_alignment_loss
    from deepsir_tpu.models import ForwardOptions
    from deepsir_tpu.training import device_batch

    cfg = tiny_cfg("align")
    cfg_l = replace(cfg, data=replace(cfg.data, gt_match_lists=True))
    arrays = get_batch(cfg_l)
    model, state = create_train_state(cfg, arrays, steps_per_epoch=10)
    batch = device_batch(cfg, arrays)
    opts = ForwardOptions(num_iter=cfg.model.num_train_reg_iter)
    transforms, out = model.apply(state.params, batch, opts, train=False)

    args = (transforms, out.inlier_logits, out.pred_idx, out.pt_src,
            batch.transform_gt, batch.matches, cfg.loss)
    geo = scan_alignment_loss(*args, pt_ref=out.pt_ref)
    lst = scan_alignment_loss(*args, pt_ref=None)
    for k in geo:
        np.testing.assert_allclose(np.asarray(geo[k]), np.asarray(lst[k]),
                                   rtol=1e-5, atol=1e-6, err_msg=k)


def test_absolute_pose_solve_first_iter_identical():
    """The drift-fix solve (absolute re-anchoring) is mathematically the
    reference scheme at iteration 1 (the first increment composes with the
    identity) — and it must diverge only at later iterations."""
    from deepsir_tpu.models import ForwardOptions, Network
    from deepsir_tpu.training import device_batch

    cfg = tiny_cfg("align")
    cfg_abs = replace(cfg, model=replace(cfg.model, absolute_pose_solve=True))
    arrays = get_batch(cfg)
    model, state = create_train_state(cfg, arrays, steps_per_epoch=10)
    model_abs = Network(cfg_abs.model, pipeline="align")
    batch = device_batch(cfg, arrays)

    opts1 = ForwardOptions(num_iter=1)
    t_ref, _ = model.apply(state.params, batch, opts1, train=False)
    t_abs, _ = model_abs.apply(state.params, batch, opts1, train=False)
    np.testing.assert_allclose(np.asarray(t_ref), np.asarray(t_abs),
                               rtol=1e-5, atol=1e-6)

    opts3 = ForwardOptions(num_iter=3)
    t3, out3 = model_abs.apply(state.params, batch, opts3, train=False)
    assert t3.shape == (3, 2, 3, 4)
    assert np.all(np.isfinite(np.asarray(t3)))


def test_eval_step_runs():
    cfg = tiny_cfg("align")
    arrays = get_batch(cfg, "test")
    model, state = create_train_state(cfg, arrays, steps_per_epoch=10)
    eval_fn = make_eval_step(cfg, model)
    transforms, out = eval_fn(state.params, arrays)
    assert transforms.shape == (cfg.model.num_reg_iter, 2, 3, 4)
    assert np.all(np.isfinite(np.asarray(transforms)))


def test_forward_step_label():
    cfg = tiny_cfg("label")
    arrays = get_batch(cfg)
    model, state = create_train_state(cfg, arrays, steps_per_epoch=10)
    fwd = make_forward_step(cfg, model)
    out = fwd(state.params, arrays)
    assert out.logits_src.shape == (2, 256, 19)


def test_nan_guard_skips_update():
    cfg = tiny_cfg("align")
    arrays = get_batch(cfg)
    model, state = create_train_state(cfg, arrays, steps_per_epoch=10)
    tx = make_optimizer(cfg, 10)
    step_fn = make_train_step(cfg, model, tx)
    bad = dict(arrays)
    bad["points_src"] = np.full_like(arrays["points_src"], np.nan)
    new_state, aux = step_fn(state, bad, jax.random.PRNGKey(0))
    assert bool(aux["skipped"])
    assert not changed(new_state.params, state.params)
    assert int(new_state.step) == 1    # step counter still advances


def test_checkpoint_roundtrip_and_partial(tmp_path):
    cfg = tiny_cfg("align")
    arrays = get_batch(cfg)
    model, state = create_train_state(cfg, arrays, steps_per_epoch=10)
    mgr = CheckPointManager(str(tmp_path), max_to_keep=2)
    mgr.save(state, 1, score=0.5)
    mgr.save(state, 2, score=0.9)
    mgr.save(state, 3, score=0.1)   # model_1 rotated out -> time-pinned keep
    mgr.save(state, 4, score=0.2)   # model_2 rotated out -> deleted
    import os
    files = sorted(os.listdir(tmp_path))
    assert "model_1.msgpack" in files      # pinned permanent
    assert "model_2.msgpack" not in files  # ring-buffer delete
    assert "model_best.msgpack" in files and "model_4.msgpack" in files
    restored, step = mgr.load(str(tmp_path / "model_3.msgpack"), state)
    assert step == 3
    assert not changed(restored.params, state.params)

    # staged partial restore: a label-pipeline checkpoint provides the
    # feat_extractor for an align model
    cfg_l = tiny_cfg("label")
    model_l, state_l = create_train_state(cfg_l, {k: v for k, v in arrays.items()
                                                  if not k.startswith("match") and k != "num_matches"},
                                          steps_per_epoch=10)
    mgr2 = CheckPointManager(str(tmp_path / "l"))
    path = mgr2.save(state_l.params, 7)
    merged, loaded = partial_restore(path, state.params)
    assert loaded > 0
    fe_new = jax.tree_util.tree_leaves(merged["params"]["feat_extractor"])
    fe_l = jax.tree_util.tree_leaves(state_l.params["params"]["feat_extractor"])
    for a, b in zip(fe_new, fe_l):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_checkpoint_same_step_resave_no_duplicate(tmp_path):
    # train.py ends with an unconditional save that can land on the step the
    # periodic save just wrote; the re-save must overwrite the ring entry,
    # not duplicate it (a duplicate consumes a keep slot and, once rotation
    # evicts the first copy, deletes a file the manifest still lists)
    cfg = tiny_cfg("align")
    arrays = get_batch(cfg)
    _, state = create_train_state(cfg, arrays, steps_per_epoch=10)
    mgr = CheckPointManager(str(tmp_path), max_to_keep=2,
                            keep_checkpoint_every_n_hours=1e9)
    mgr._next_keep_time = float("inf")   # disable time pinning for the test
    mgr.save(state, 1, score=0.5)
    mgr.save(state, 1, score=-np.inf)    # end-of-training re-save, same step
    assert [p for p, _ in mgr._buffer] == [mgr._path(1)]
    mgr.save(state, 2)
    mgr.save(state, 3)                   # rotates step 1 out exactly once
    import os
    files = sorted(os.listdir(tmp_path))
    assert "model_1.msgpack" not in files
    assert "model_2.msgpack" in files and "model_3.msgpack" in files
    manifest = (tmp_path / "checkpoints.txt").read_text().splitlines()
    assert manifest.count("model_2.msgpack") == 1
    assert os.path.exists(tmp_path / "model_best.msgpack")  # -inf never displaces best


def test_checkpoint_resave_of_permanent_step_stays_permanent(tmp_path):
    # re-saving a step already promoted to the permanent list must refresh
    # the pinned file WITHOUT re-entering it in the ring: a later rotation
    # would os.remove a file _permanent still guarantees, and the manifest
    # would list the name twice
    cfg = tiny_cfg("align")
    arrays = get_batch(cfg)
    _, state = create_train_state(cfg, arrays, steps_per_epoch=10)
    mgr = CheckPointManager(str(tmp_path), max_to_keep=1,
                            keep_checkpoint_every_n_hours=1e9)
    mgr.save(state, 1)
    mgr.save(state, 2)                   # rotates step 1 -> time-pinned keep
    assert [p for p, _ in mgr._permanent] == [mgr._path(1)]
    mgr.save(state, 1)                   # re-save of the PERMANENT step
    assert [p for p, _ in mgr._permanent] == [mgr._path(1)]
    assert mgr._path(1) not in [p for p, _ in mgr._buffer]
    mgr._next_keep_time = float("inf")   # no further pinning
    mgr.save(state, 3)
    mgr.save(state, 4)                   # rotation churns the ring
    import os
    files = sorted(os.listdir(tmp_path))
    assert "model_1.msgpack" in files    # the permanent guarantee held
    manifest = (tmp_path / "checkpoints.txt").read_text().splitlines()
    assert manifest.count("model_1.msgpack") == 1


def test_dev_mode_shrinks_config():
    # --dev must produce a minutes-scale smoke run: tiny clouds, a tiny
    # synthetic split, and a couple of epochs (it was once parsed but never
    # consumed, so `train.py --dev` silently ran the FULL training)
    cfg = Config(pipeline="align", dev=True).resolved()
    assert cfg.model.num_points <= 1024
    assert cfg.data.synthetic_train_size <= 16
    assert cfg.data.synthetic_eval_size <= 4
    assert cfg.train.max_epochs <= 2
    # dev must never ENLARGE an explicitly smaller request — for the data
    # fields too (they were once hard-set, so an explicit
    # --synthetic_eval_size 2 was silently enlarged to 4)
    small = Config(pipeline="align", dev=True,
                   model=ModelConfig(num_points=256),
                   data=DataConfig(synthetic_train_size=8,
                                   synthetic_eval_size=2,
                                   num_workers=1)).resolved()
    assert small.model.num_points == 256
    assert small.data.synthetic_train_size == 8
    assert small.data.synthetic_eval_size == 2
    assert small.data.num_workers == 1
