import logging

import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation

from deepsir_tpu.config import LossConfig
from deepsir_tpu.losses import (chamfer_loss, correspondence_correct,
                                det_des_loss, scan_alignment_loss,
                                semantic_loss, confusion_matrix, SemanticMetric)
from deepsir_tpu.losses.chamfer import single_side_chamfer
from deepsir_tpu.utils import compute_metrics, summarize_metrics, rte_rre, print_metrics


def make_pose(deg, t):
    rot = Rotation.from_euler("z", deg, degrees=True).as_matrix()
    return np.concatenate([rot, np.asarray(t, dtype=float)[:, None]], axis=1)


# ------------------------------------------------------------ alignment loss

def test_correspondence_correct():
    n = 10
    gt = np.full((1, 6, 2), -1, dtype=np.int32)
    gt[0, :3] = [[0, 5], [1, 1], [2, 7]]
    pred = np.array([[5, 1, 7, 0, 0, 0, 0, 0, 0, 0]], dtype=np.int32)
    out = np.asarray(correspondence_correct(jnp.asarray(pred), jnp.asarray(gt), n))
    assert out[0, 0] and out[0, 1] and out[0, 2]
    assert not out[0, 3]  # (3, 0) not a GT pair
    # padding must not create false membership for index 0
    pred0 = np.zeros((1, 10), dtype=np.int32)
    out0 = np.asarray(correspondence_correct(jnp.asarray(pred0), jnp.asarray(gt), n))
    assert not out0[0, 0]


def test_scan_alignment_loss_zero_at_gt(rng):
    cfg = LossConfig(wt_inlier_loss=0.0)
    g = make_pose(30, [1, 0, 0])[None]
    src = rng.normal(size=(1, 50, 3)).astype(np.float32)
    transforms = jnp.asarray(np.stack([g, g]))          # both iters exact
    dic = scan_alignment_loss(transforms, jnp.zeros((2, 1, 50)),
                              jnp.zeros((2, 1, 50), dtype=jnp.int32),
                              jnp.asarray(src), jnp.asarray(g), None, cfg)
    assert float(dic["total"]) < 1e-5


def test_scan_alignment_loss_discount(rng):
    """Iteration-0 error must be discounted vs final-iteration error."""
    cfg = LossConfig(wt_inlier_loss=0.0, loss_discount_factor=0.5)
    g = make_pose(0, [0, 0, 0])[None]
    bad = make_pose(20, [1, 1, 1])[None]
    src = rng.normal(size=(1, 50, 3)).astype(np.float32)
    # bad first iter, perfect final
    t1 = jnp.asarray(np.stack([bad, g]))
    # perfect first iter, bad final
    t2 = jnp.asarray(np.stack([g, bad]))
    zeros_l = jnp.zeros((2, 1, 50))
    zeros_i = jnp.zeros((2, 1, 50), dtype=jnp.int32)
    l1 = scan_alignment_loss(t1, zeros_l, zeros_i, jnp.asarray(src),
                             jnp.asarray(g), None, cfg)["total"]
    l2 = scan_alignment_loss(t2, zeros_l, zeros_i, jnp.asarray(src),
                             jnp.asarray(g), None, cfg)["total"]
    assert float(l1) < float(l2)


def test_scan_alignment_inlier_term(rng):
    cfg = LossConfig(wt_ptDist_loss=0.0, wt_inlier_loss=1.0)
    n = 20
    g = np.eye(3, 4)[None]
    src = rng.normal(size=(1, n, 3)).astype(np.float32)
    gt = np.stack([np.arange(n), np.arange(n)], axis=1)[None].astype(np.int32)
    pred_idx = jnp.asarray(np.arange(n)[None][None])            # all correct
    # confident-correct logits -> small loss; confident-wrong -> large
    good = scan_alignment_loss(jnp.asarray(g[None]), jnp.full((1, 1, n), 10.0),
                               pred_idx, jnp.asarray(src), jnp.asarray(g),
                               jnp.asarray(gt), cfg)["total"]
    bad = scan_alignment_loss(jnp.asarray(g[None]), jnp.full((1, 1, n), -10.0),
                              pred_idx, jnp.asarray(src), jnp.asarray(g),
                              jnp.asarray(gt), cfg)["total"]
    assert float(good) < 0.01 < float(bad)


def test_scan_alignment_reduction_none(rng):
    cfg = LossConfig(wt_inlier_loss=0.0)
    g = np.stack([make_pose(0, [0, 0, 0]), make_pose(10, [1, 0, 0])])
    pred = np.broadcast_to(np.eye(3, 4), (2, 3, 4)).copy()
    src = rng.normal(size=(2, 30, 3)).astype(np.float32)
    dic = scan_alignment_loss(jnp.asarray(pred[None]), jnp.zeros((1, 2, 30)),
                              jnp.zeros((1, 2, 30), dtype=jnp.int32),
                              jnp.asarray(src), jnp.asarray(g), None, cfg,
                              reduction="none")
    per = np.asarray(dic["total"])
    assert per.shape == (2,)
    assert per[0] < 1e-6 < per[1]


# ------------------------------------------------------------ chamfer

def test_chamfer_zero_for_same_cloud(rng):
    pc = jnp.asarray(rng.normal(size=(1, 40, 3)).astype(np.float32))
    assert float(chamfer_loss(pc, pc)) < 1e-3
    assert float(single_side_chamfer(pc, pc)) < 1e-3


def test_chamfer_increases_with_offset(rng):
    pc = jnp.asarray(rng.normal(size=(1, 40, 3)).astype(np.float32))
    shifted = pc + 5.0
    assert float(chamfer_loss(pc, shifted)) > 1.0


# ------------------------------------------------------------ detdes

def test_detdes_loss_separates_good_bad_features(rng):
    """Perfectly matching descriptors must score lower than random ones."""
    cfg = LossConfig(thres_radius=0.3)
    n, c = 64, 16
    pts = rng.uniform(-5, 5, size=(1, n, 3)).astype(np.float32)
    g = jnp.asarray(np.eye(3, 4)[None])
    feats = rng.normal(size=(1, n, c)).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=-1, keepdims=True)
    score = np.abs(rng.normal(size=(1, n))).astype(np.float32)

    good, acc_good = det_des_loss(jnp.asarray(feats), jnp.asarray(feats),
                                  jnp.asarray(pts), jnp.asarray(pts),
                                  jnp.asarray(score), jnp.asarray(score), g, cfg)
    other = rng.normal(size=(1, n, c)).astype(np.float32)
    other /= np.linalg.norm(other, axis=-1, keepdims=True)
    bad, acc_bad = det_des_loss(jnp.asarray(feats), jnp.asarray(other),
                                jnp.asarray(pts), jnp.asarray(pts),
                                jnp.asarray(score), jnp.asarray(score), g, cfg)
    assert float(good) < float(bad)
    assert float(acc_good) > float(acc_bad)


def test_circle_loss_tiled_matches_materialized(rng):
    """The streamed circle loss (protocol-scale feat training) must agree
    with the materialized reference form — values AND gradients — including
    a tile width that does not divide N (clamped to a divisor)."""
    import jax
    import jax.numpy as jnp
    from deepsir_tpu.losses.detdes import circle_loss, circle_loss_tiled
    b, n, c, radius = 2, 48, 8, 0.4
    anc = rng.uniform(-2, 2, size=(b, n, 3)).astype(np.float32)
    pos = anc + rng.normal(scale=0.1, size=(b, n, 3)).astype(np.float32)
    # push some anchors out of overlap
    anc[:, 40:] += 50.0
    feats_a = rng.normal(size=(b, n, c)).astype(np.float32)
    feats_p = rng.normal(size=(b, n, c)).astype(np.float32)
    score = np.abs(rng.normal(size=(b, n))).astype(np.float32) + 0.1

    for mask in (False, True):
        for tile in (48, 16, 13):     # full, divisor, non-divisor (clamps)
            ref = circle_loss(jnp.asarray(feats_a), jnp.asarray(feats_p),
                              jnp.asarray(anc), jnp.asarray(pos),
                              jnp.asarray(score), radius,
                              overlap_det_mask=mask)
            got = circle_loss_tiled(jnp.asarray(feats_a), jnp.asarray(feats_p),
                                    jnp.asarray(anc), jnp.asarray(pos),
                                    jnp.asarray(score), radius,
                                    overlap_det_mask=mask, tile=tile)
            for r, g in zip(ref[:2], got[:2]):
                np.testing.assert_allclose(float(g), float(r), rtol=2e-4,
                                           atol=1e-5)
            if not mask:
                np.testing.assert_allclose(float(got[2]), float(ref[2]),
                                           rtol=1e-5)

    # gradient equivalence through the anchor features
    def total(fn, fa, **kw):
        lf, ld, _ = fn(fa, jnp.asarray(feats_p), jnp.asarray(anc),
                       jnp.asarray(pos), jnp.asarray(score), radius, **kw)
        return lf + ld

    g_ref = jax.grad(lambda fa: total(circle_loss, fa))(jnp.asarray(feats_a))
    g_t = jax.grad(lambda fa: total(circle_loss_tiled, fa, tile=16))(
        jnp.asarray(feats_a))
    np.testing.assert_allclose(np.asarray(g_t), np.asarray(g_ref),
                               rtol=5e-3, atol=1e-5)


def test_circle_loss_overlap_det_mask(rng):
    """overlap_det_mask must drop no-correspondent anchors from the detector
    term and the accuracy, and leave the circle (feature) term unchanged."""
    from deepsir_tpu.losses.detdes import circle_loss
    n, c, radius = 32, 8, 0.3
    # anchors 0..15 overlap the positive cloud exactly; anchors 16..31 have
    # no in-radius correspondent (the two clouds' non-overlap halves are
    # displaced differently). N1 == N2 is the loss's shape contract (the
    # reference adds the row-wise positive lse to the column-wise negative
    # lse, loss.py:556-557 — only defined for equal sizes).
    anc = rng.uniform(-2, 2, size=(1, n, 3)).astype(np.float32)
    anc[0, 16:] += 100.0
    pos = anc.copy()
    pos[0, 16:] += 500.0
    feats = rng.normal(size=(1, n, c)).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=-1, keepdims=True)
    score = np.abs(rng.normal(size=(1, n))).astype(np.float32) + 0.1

    args = (jnp.asarray(feats), jnp.asarray(feats),
            jnp.asarray(anc), jnp.asarray(pos), jnp.asarray(score))
    lf_ref, ld_ref, acc_ref = circle_loss(*args, thres_radius=radius)
    lf_m, ld_m, acc_m = circle_loss(*args, thres_radius=radius,
                                    overlap_det_mask=True)
    np.testing.assert_allclose(float(lf_ref), float(lf_m), rtol=1e-6)
    assert float(ld_ref) != float(ld_m)
    # reference form: every non-overlap anchor counts diff<0 "correct";
    # the masked accuracy counts overlap anchors only (identical feats on
    # exact duplicates -> all correct there)
    assert float(acc_m) == 100.0
    # masked detector term == manual: zero diff outside the overlap half
    dist_feat = np.sqrt(np.maximum(
        np.sum((feats[:, :, None, :] - feats[:, None, :, :]) ** 2, -1), 0)
        + 1e-12)
    dist_pc = np.linalg.norm(anc[:, :, None] - pos[:, None], axis=-1)
    false_neg = dist_pc < radius
    dmin = np.min(dist_pc * false_neg, axis=-1, keepdims=True)
    pos_mask = dist_pc == dmin
    furthest = np.max(dist_feat * pos_mask, axis=-1)
    closest = np.min(dist_feat + 1e5 * pos_mask, axis=-1)
    diff = furthest - closest
    has_pos = false_neg.any(-1)
    sc = score / score.sum(axis=1, keepdims=True)
    manual = np.mean(np.where(has_pos, diff, 0.0) * sc)
    np.testing.assert_allclose(float(ld_m), manual, rtol=1e-3)


# ------------------------------------------------------------ semantic

def test_semantic_loss_and_ignore(rng):
    n = 100
    labels = rng.integers(1, 20, size=(1, n)).astype(np.int32)
    # perfect logits
    logits = np.full((1, n, 19), -10.0, dtype=np.float32)
    logits[0, np.arange(n), labels[0] - 1] = 10.0
    loss, acc = semantic_loss(jnp.asarray(logits), jnp.asarray(labels))
    assert float(acc) == 1.0 and float(loss) < 1e-3

    # ignored points must not affect the result
    labels2 = labels.copy()
    labels2[0, :50] = 0
    logits2 = logits.copy()
    logits2[0, :50] = rng.normal(size=(50, 19))
    loss2, acc2 = semantic_loss(jnp.asarray(logits2), jnp.asarray(labels2))
    assert float(acc2) == 1.0 and float(loss2) < 1e-3


def test_confusion_matrix_and_miou(rng):
    labels = np.array([[1, 2, 3, 0, 1]], dtype=np.int32)
    logits = np.full((1, 5, 19), -10.0, dtype=np.float32)
    for i, cls in enumerate([0, 1, 2, 5, 1]):  # pred classes (0-based)
        logits[0, i, cls] = 10.0
    cm = np.asarray(confusion_matrix(jnp.asarray(logits), jnp.asarray(labels)))
    assert cm.sum() == 4             # the ignored point is excluded
    assert cm[0, 0] == 1 and cm[1, 1] == 1 and cm[2, 2] == 1 and cm[0, 1] == 1
    metric = SemanticMetric()
    metric.update(cm)
    miou, ious, acc = metric.compute()
    assert 0 < miou < 1 and abs(acc - 0.75) < 1e-9


# ------------------------------------------------------------ metrics

def test_rte_rre():
    g = make_pose(10, [0.3, 0, 0])
    out = rte_rre(g, make_pose(0, [0, 0, 0]), rte_thresh=0.6, rre_thresh=15)
    assert out[0] == 1.0
    np.testing.assert_allclose(out[1], 0.3, atol=1e-6)
    np.testing.assert_allclose(out[2], 10.0, atol=1e-4)
    out2 = rte_rre(g, make_pose(0, [0, 0, 0]), rte_thresh=0.2, rre_thresh=15)
    assert out2[0] == 0.0


def test_compute_and_summarize_metrics(rng):
    g_gt = np.stack([make_pose(15, [1, 0, 0]), make_pose(-5, [0, 1, 0])])
    src = rng.normal(size=(2, 100, 3)).astype(np.float32)
    from deepsir_tpu.math import se3_np
    ref = np.stack([se3_np.transform(g_gt[i], src[i]) for i in range(2)])
    m = compute_metrics(g_gt, g_gt, src, ref, rte_thresh=0.6, rre_thresh=5)
    assert np.all(m["succ"] == 1.0)
    assert np.all(m["err_r_deg"] < 1e-3)
    assert np.all(m["chamfer_dist"] < 1e-6)
    s = summarize_metrics(m)
    assert s["succ"] == 1.0
    assert "r_rmse" in s and "err_t_mean" in s
    print_metrics(logging.getLogger("test"), s)
