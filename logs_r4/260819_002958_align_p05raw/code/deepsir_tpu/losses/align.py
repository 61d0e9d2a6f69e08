"""Scan-alignment loss: discounted per-iteration point distance + inlier BCE.

TPU-native re-design of the reference's ScanAlignmentLoss
(/root/reference/network/loss.py:705-851). The reference verifies predicted
correspondences against GT match lists on the CPU with numpy hashing + isin
(loss.py:723-749); here the membership test is in-graph: both sides are
hashed to integer keys (key = src_idx + ref_idx * N, the same scheme as the
reference's _hash with seed N), the GT keys are sorted once, and each
predicted key is located with a batched searchsorted. Static shapes via the
fixed-capacity padded match array from the data layer.
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from deepsir_tpu.config import LossConfig
from deepsir_tpu.math import se3


def correspondence_correct(pred_idx: jnp.ndarray, gt_matches: jnp.ndarray,
                           num_points: int) -> jnp.ndarray:
    """For each predicted pair (i, pred_idx[i]), is it in the GT match set?

    pred_idx:   (B, N) predicted ref index for each src point
    gt_matches: (B, M_cap, 2) int32 GT (src, ref) pairs, padded with -1
    Returns (B, N) bool.
    """
    b, n = pred_idx.shape
    # int32 keys: valid while N*(N+1) < 2^31 (N up to ~46000)
    assert num_points * (num_points + 1) < 2**31, "match keys overflow int32"
    src_ids = jnp.arange(n, dtype=jnp.int32)[None, :]
    pred_keys = src_ids + pred_idx.astype(jnp.int32) * num_points       # (B, N)

    gm = gt_matches.astype(jnp.int32)
    gt_keys = gm[..., 0] + gm[..., 1] * num_points                       # (B, M)
    # padding rows (-1, -1) hash to a negative key that can never match
    gt_sorted = jnp.sort(gt_keys, axis=-1)

    def member(sorted_keys, queries):
        pos = jnp.searchsorted(sorted_keys, queries)
        pos = jnp.clip(pos, 0, sorted_keys.shape[0] - 1)
        return sorted_keys[pos] == queries

    return jax.vmap(member)(gt_sorted, pred_keys)


def scan_alignment_loss(transforms: jnp.ndarray,
                        inlier_logits: jnp.ndarray,
                        pred_idx: jnp.ndarray,
                        pt_src: jnp.ndarray,
                        transform_gt: jnp.ndarray,
                        gt_matches: Optional[jnp.ndarray],
                        cfg: LossConfig,
                        reduction: str = "mean",
                        pt_ref: Optional[jnp.ndarray] = None,
                        mask_src: Optional[jnp.ndarray] = None
                        ) -> Dict[str, jnp.ndarray]:
    """Total alignment loss over the registration iterations.

    transforms:    (iters, B, 3, 4) cumulative predicted transforms
    inlier_logits: (iters, B, N)
    pred_idx:      (iters, B, N)
    pt_src:        (B, N, 3) untransformed source points
    transform_gt:  (B, 3, 4)
    gt_matches:    (B, M_cap, 2) padded GT correspondences (or None)
    pt_ref:        (B, N, 3) reference points — when given, the BCE labels
                   come from a direct in-graph geometric test instead of the
                   match-list lookup (see below)
    mask_src:      optional (B, N) validity mask for ragged clouds padded to
                   the static size; per-point terms average over valid rows
                   only (train batches are exactly resampled and pass None)

    BCE supervision: a predicted pair (i, pred_idx[i]) is "correct" iff
    |T_gt src_i - ref_{pred}| < thres_radius — the definition of a GT match
    (reference get_matching_indices, data_base.py:436-449). With pt_ref
    available this is evaluated directly on-device, which is exact for every
    point; the match-LIST path (used when pt_ref is None) inherits the
    list's fixed capacity, and a truncated list mislabels correct
    predictions whose source points fell past the cap.

    Returns a dict with one entry per loss term per iteration and 'total'
    (summed with discount factor^(iters - i - 1), reference loss.py:844-849).
    With reduction='none' every entry is per-sample (B,).
    """
    assert reduction in ("mean", "none")
    num_iter = transforms.shape[0]
    num_points = pt_src.shape[-2]
    loss_dic: Dict[str, jnp.ndarray] = {}

    def red(x_per_sample):
        return jnp.mean(x_per_sample) if reduction == "mean" else x_per_sample

    def point_mean(x):                                       # (B, N[, 3]) -> (B,)
        axes = tuple(range(1, x.ndim))
        if mask_src is None:
            return jnp.mean(x, axis=axes)
        m = jnp.broadcast_to(
            mask_src if x.ndim == 2 else mask_src[..., None], x.shape)
        return jnp.sum(x * m, axis=axes) / (jnp.sum(m, axis=axes) + 1e-12)

    # ---- point-distance term (loss.py:767-798)
    if cfg.wt_ptDist_loss > 0:
        gt_src = se3.transform(transform_gt, pt_src)                 # (B, N, 3)
        for i in range(num_iter):
            pred_src = se3.transform(transforms[i], pt_src)
            if cfg.loss_type == "mse":
                per = point_mean((pred_src - gt_src) ** 2)
            else:
                per = point_mean(jnp.abs(pred_src - gt_src))
            loss_dic[f"{cfg.loss_type}_{i}"] = red(per * cfg.wt_ptDist_loss)
    else:
        zeros = jnp.zeros(pt_src.shape[0])
        for i in range(num_iter):
            loss_dic[f"{cfg.loss_type}_{i}"] = red(zeros)

    # ---- correspondence-confidence BCE term (loss.py:812-828)
    use_geometric = pt_ref is not None and cfg.thres_radius > 0
    if cfg.wt_inlier_loss > 0 and (use_geometric or gt_matches is not None):
        gt_src = se3.transform(transform_gt, pt_src) if use_geometric else None
        for i in range(num_iter):
            if use_geometric:
                matched = jnp.take_along_axis(
                    pt_ref, pred_idx[i][..., None], axis=-2)     # (B, N, 3)
                d = jnp.linalg.norm(gt_src - matched, axis=-1)
                correct = d < cfg.thres_radius
            else:
                correct = correspondence_correct(pred_idx[i], gt_matches,
                                                 num_points)
            labels = correct.astype(inlier_logits.dtype)
            logits = inlier_logits[i]
            bce = jnp.maximum(logits, 0) - logits * labels + \
                jnp.log1p(jnp.exp(-jnp.abs(logits)))                 # (B, N)
            loss_dic[f"outlier_{i}"] = red(point_mean(bce) * cfg.wt_inlier_loss)

    # ---- pose-error term (loss.py:830-842)
    if cfg.wt_pose_loss > 0:
        for i in range(num_iter):
            err_r = se3.rotation_error_rad(transform_gt[..., :3, :3],
                                           transforms[i][..., :3, :3])
            err_t = se3.translation_error(transform_gt[..., :3, 3],
                                          transforms[i][..., :3, 3])
            loss_dic[f"poseError_{i}"] = red((err_r + err_t) * cfg.wt_pose_loss)

    # ---- discounted total (loss.py:844-849)
    total = 0.0
    for key, val in loss_dic.items():
        it = int(key[key.rfind("_") + 1:])
        total = total + val * (cfg.loss_discount_factor ** (num_iter - it - 1))
    loss_dic["total"] = total
    return loss_dic
