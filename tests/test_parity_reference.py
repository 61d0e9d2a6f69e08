"""Golden-value parity tests against the torch reference implementation.

Identical random inputs are pushed through the reference's parameter-free
math (/root/reference) and the repo counterparts; outputs must agree to
float tolerance. This pins "matching capability" numerically rather than by
code reading (SURVEY.md §4(b)):

  * score_fun                 /root/reference/network/model.py:701-757
  * CircleLoss                /root/reference/network/loss.py:483-624
  * ScanAlignmentLoss terms   /root/reference/network/loss.py:751-851
  * compute_metrics/rte_rre   /root/reference/common/metrics_util.py:13-85
  * matching indices          /root/reference/network/matchnet.py:96-144
                              + the stride-6000 argmin loop, model.py:558-569
  * weighted Kabsch solve     /root/reference/network/model.py:22-66
  * SE(3) numpy ops           /root/reference/common/math/se3.py

The reference runs on CPU torch. Where its code hard-requires CUDA or a
removed scipy API (`.cuda()` on a CPU build, `Rotation.from_dcm`), the test
shims those host-environment details without touching any numerics.
"""
import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference checkout not present")
torch = pytest.importorskip("torch")

if REF not in sys.path:
    sys.path.insert(0, REF)

# environment shims (no numerical effect): CPU-only torch lacks .cuda();
# modern scipy renamed from_dcm -> from_matrix
torch.Tensor.cuda = lambda self, *a, **k: self
from scipy.spatial.transform import Rotation  # noqa: E402
if not hasattr(Rotation, "from_dcm"):
    Rotation.from_dcm = Rotation.from_matrix

import jax.numpy as jnp  # noqa: E402

from deepsir_tpu.config import LossConfig  # noqa: E402
from deepsir_tpu.losses.align import scan_alignment_loss  # noqa: E402
from deepsir_tpu.losses.detdes import circle_loss  # noqa: E402
from deepsir_tpu.math import se3_np  # noqa: E402
from deepsir_tpu.models.scoring import LABEL_WEIGHTS, score_points  # noqa: E402
from deepsir_tpu.ops.distance import nearest_neighbour_index  # noqa: E402
from deepsir_tpu.ops.svd3 import weighted_kabsch  # noqa: E402
from deepsir_tpu.utils import metrics as repo_metrics  # noqa: E402


def t(x):
    return torch.from_numpy(np.asarray(x))


# ---------------------------------------------------------------- score_fun

def test_score_fun_parity(rng):
    from network.model import Network as RefNetwork
    from scipy.spatial import cKDTree

    b, c, n, ncls, k = 2, 8, 96, 19, 16
    feat = rng.normal(size=(b, n, c)).astype(np.float32)
    xyz = rng.normal(size=(b, n, 3)).astype(np.float32)
    logits = rng.normal(size=(b, n, ncls)).astype(np.float32)
    neigh = np.stack([cKDTree(x).query(x, k=k)[1] for x in xyz]).astype(np.int64)

    dummy = types.SimpleNamespace(
        num_knn=k, label_weights=t(np.asarray(LABEL_WEIGHTS)))
    # channel-first inputs; prob/label derived exactly as the reference
    # forward does before calling feat_score (model.py:637-638)
    logits_t = t(logits).permute(0, 2, 1).contiguous()
    prob_t, label_t = torch.max(logits_t, dim=1, keepdim=True)
    want = RefNetwork.score_fun(
        dummy, t(feat).permute(0, 2, 1).contiguous(),
        t(xyz).permute(0, 2, 1).contiguous(),
        prob_t, label_t, t(neigh)).numpy()

    got = np.asarray(score_points(jnp.asarray(feat), jnp.asarray(xyz),
                                  jnp.asarray(logits), jnp.asarray(neigh)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


# --------------------------------------------------------------- CircleLoss

def test_circle_loss_parity(rng):
    from network.loss import CircleLoss

    # the reference requires N1 == N2 (its loss_row sums [B,N1]+[B,N2]
    # shapes; live calls always pass same-size clouds)
    b, c, n1, n2 = 1, 16, 80, 80
    anc_feat = rng.normal(size=(b, n1, c)).astype(np.float32)
    pos_feat = rng.normal(size=(b, n2, c)).astype(np.float32)
    anc_pc = rng.uniform(-3, 3, size=(b, n1, 3)).astype(np.float32)
    pos_pc = rng.uniform(-3, 3, size=(b, n2, 3)).astype(np.float32)
    # duplicate a few points exactly (the Oxford self-pair case where the
    # reference's pos_mask is non-degenerate)
    pos_pc[0, :5] = anc_pc[0, :5]
    anc_score = np.abs(rng.normal(size=(b, n1))).astype(np.float32)
    radius = 0.9

    ref = CircleLoss(m=0.1, log_scale=10, thres_radius=radius)
    with torch.no_grad():
        w_feat, w_det, _, w_acc = ref(
            t(anc_feat).permute(0, 2, 1).contiguous(),
            t(pos_feat).permute(0, 2, 1).contiguous(),
            t(anc_pc).permute(0, 2, 1).contiguous(),
            t(pos_pc).permute(0, 2, 1).contiguous(),
            t(anc_score), None)

    g_feat, g_det, g_acc = circle_loss(
        jnp.asarray(anc_feat), jnp.asarray(pos_feat),
        jnp.asarray(anc_pc), jnp.asarray(pos_pc),
        jnp.asarray(anc_score), thres_radius=radius)

    np.testing.assert_allclose(float(g_feat), float(w_feat), rtol=1e-4)
    np.testing.assert_allclose(float(g_det), float(w_det),
                               rtol=1e-3, atol=1e-6)
    # accuracy denominators agree at B=1 (the repo corrects the reference's
    # batch-summed-count / N1 to a true mean, identical when B == 1)
    np.testing.assert_allclose(float(g_acc), float(w_acc), atol=1e-4)


# -------------------------------------------------------- ScanAlignmentLoss

def test_scan_alignment_loss_parity(rng):
    from network.loss import ScanAlignmentLoss

    b, n, iters, m_cap = 2, 64, 2, 48
    pt_src = rng.normal(size=(b, n, 3)).astype(np.float32)
    gt = np.stack([_random_pose(rng) for _ in range(b)]).astype(np.float32)
    preds = np.stack([np.stack([_random_pose(rng) for _ in range(b)])
                      for _ in range(iters)]).astype(np.float32)
    logits = rng.normal(size=(iters, b, n)).astype(np.float32)
    pred_idx = rng.integers(0, n, size=(iters, b, n)).astype(np.int32)
    # ragged GT match lists -> reference; padded fixed-capacity -> repo
    matches_ragged = []
    matches_padded = np.full((b, m_cap, 2), -1, np.int32)
    for i in range(b):
        m = int(rng.integers(10, m_cap))
        pairs = np.stack([rng.integers(0, n, size=m),
                          rng.integers(0, n, size=m)], axis=1).astype(np.int32)
        matches_ragged.append(pairs)
        matches_padded[i, :m] = pairs

    args = types.SimpleNamespace(loss_type="mae", wt_ptDist_loss=1.0,
                                 wt_inlier_loss=1.0, wt_pose_loss=0.5,
                                 loss_discount_factor=0.5)
    ref = ScanAlignmentLoss(args)
    pred_pairs = [
        torch.cat([torch.arange(n)[None, :, None].expand(b, n, 1).int(),
                   t(pred_idx[i]).int()[:, :, None]], dim=2)
        for i in range(iters)]
    data = {
        "pt_src": t(pt_src),
        "perm_matrices": [t(logits[i]) for i in range(iters)],
        "transform_pred": [t(preds[i]) for i in range(iters)],
        "transform_gt": t(gt),
        "pred_pairs": pred_pairs,
        "matches": [t(m) for m in matches_ragged],
    }
    with torch.no_grad():
        want = ref(data, reduction="mean")

    cfg = LossConfig(loss_type="mae", wt_ptDist_loss=1.0, wt_inlier_loss=1.0,
                     wt_pose_loss=0.5, loss_discount_factor=0.5,
                     thres_radius=0.9)
    got = scan_alignment_loss(jnp.asarray(preds), jnp.asarray(logits),
                              jnp.asarray(pred_idx), jnp.asarray(pt_src),
                              jnp.asarray(gt), jnp.asarray(matches_padded),
                              cfg, reduction="mean", pt_ref=None)

    for key in ["mae_0", "mae_1", "outlier_0", "outlier_1",
                "poseError_0", "poseError_1", "total"]:
        np.testing.assert_allclose(
            float(got[key]), float(want[key]), rtol=1e-4, atol=1e-6,
            err_msg=f"loss term {key} diverges from the reference")


# ------------------------------------------------------------------ metrics

def _random_pose(rng, rot_mag=0.5, trans_mag=1.0):
    ax = rng.normal(size=3)
    ax *= rot_mag * rng.uniform() / np.linalg.norm(ax)
    r = Rotation.from_rotvec(ax).as_matrix()
    return np.concatenate([r, rng.uniform(-trans_mag, trans_mag,
                                          size=(3, 1))], axis=1)


def test_compute_metrics_parity(rng):
    from common.metrics_util import compute_metrics as ref_compute

    b, n = 4, 300
    gt = np.stack([_random_pose(rng) for _ in range(b)]).astype(np.float32)
    pred = np.stack([_random_pose(rng) for _ in range(b)]).astype(np.float32)
    src = rng.normal(size=(b, n, 3)).astype(np.float32)
    ref_pts = rng.normal(size=(b, n, 3)).astype(np.float32)

    data = {"transform_gt": t(gt), "points_src": t(src),
            "points_ref": t(ref_pts)}
    want = ref_compute(data, t(pred), rte_thresh=0.6, rre_thresh=5.0)

    got = repo_metrics.compute_metrics(gt, pred, src, ref_pts,
                                       rte_thresh=0.6, rre_thresh=5.0)
    assert set(got) == set(want)
    for key in want:
        np.testing.assert_allclose(
            np.asarray(got[key], np.float64),
            np.asarray(want[key], np.float64), rtol=1e-4, atol=1e-5,
            err_msg=f"metric {key} diverges from the reference")


def test_rte_rre_parity(rng):
    from common.metrics_util import rte_rre as ref_rte_rre
    for _ in range(5):
        pred = _random_pose(rng)
        gt = _random_pose(rng)
        want = ref_rte_rre(pred, gt, 0.6, 5.0)
        got = repo_metrics.rte_rre(pred, gt, 0.6, 5.0)
        np.testing.assert_allclose(got, want, rtol=1e-6)


# ------------------------------------------------------- matching indices

def test_matching_indices_parity(rng):
    """Tiled argmin matching == the reference's stride-6000 chunk loop
    (model.py:558-569) over match_features_V2."""
    from network.matchnet import match_features_V2

    b, c, n, m = 2, 16, 500, 600
    fs = rng.normal(size=(b, n, c)).astype(np.float32)
    fr = rng.normal(size=(b, m, c)).astype(np.float32)

    stride = 128
    fs_t = t(fs).permute(0, 2, 1)
    fr_t = t(fr).permute(0, 2, 1)
    chunks = []
    with torch.no_grad():
        for s in range(0, n, stride):
            d = match_features_V2(fs_t[:, :, s:s + stride], fr_t)
            chunks.append(d.min(dim=2)[1])
    want = torch.cat(chunks, dim=1).numpy()

    got = np.asarray(nearest_neighbour_index(jnp.asarray(fs), jnp.asarray(fr),
                                             chunk=256, method="xla"))
    np.testing.assert_array_equal(got, want)


# ------------------------------------------------------- weighted Kabsch

def test_weighted_kabsch_parity(rng):
    from network.model import compute_rigid_transform_2

    b, m = 4, 128
    src = rng.normal(size=(b, m, 3)).astype(np.float32)
    pose = np.stack([_random_pose(rng) for _ in range(b)]).astype(np.float32)
    tgt = se3_np.transform(pose, src) + \
        0.05 * rng.normal(size=(b, m, 3)).astype(np.float32)
    weights = rng.uniform(0.1, 1.0, size=(b, m, 1)).astype(np.float32)

    with torch.no_grad():
        want, invalid = compute_rigid_transform_2(t(src), t(tgt), t(weights))
    assert not invalid

    got, bad = weighted_kabsch(jnp.asarray(src), jnp.asarray(tgt),
                               jnp.asarray(weights[..., 0]))
    assert not np.any(np.asarray(bad))
    # reference solves in CPU float64 LAPACK, repo in-graph Jacobi float32
    np.testing.assert_allclose(np.asarray(got), want.numpy(),
                               rtol=1e-3, atol=2e-4)


# ------------------------------------------------------------- SE(3) numpy

def test_se3_np_parity(rng):
    import common.math.se3 as ref_se3

    g1 = _random_pose(rng)
    g2 = _random_pose(rng)
    pts = rng.normal(size=(50, 3))

    np.testing.assert_allclose(se3_np.transform(g1, pts),
                               ref_se3.transform(g1, pts), rtol=1e-6)
    np.testing.assert_allclose(se3_np.inverse(g1)[:3],
                               ref_se3.inverse(g1), rtol=1e-6, atol=1e-12)
    np.testing.assert_allclose(se3_np.concatenate(g1, g2)[:3],
                               ref_se3.concatenate(g1, g2),
                               rtol=1e-6, atol=1e-12)

    q = rng.normal(size=4)
    np.testing.assert_allclose(se3_np.quat2mat(q), ref_se3.quat2mat(q),
                               rtol=1e-6, atol=1e-12)
    xyzq = rng.normal(size=7)
    np.testing.assert_allclose(se3_np.xyzquat2mat(xyzq),
                               ref_se3.xyzquat2mat(xyzq),
                               rtol=1e-6, atol=1e-12)
