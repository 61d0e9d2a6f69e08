"""Detection + description loss: circle loss over feature distances plus a
score-weighted detector term.

TPU-native equivalent of the reference's CircleLoss / DetDesLoss
(/root/reference/network/loss.py:483-702). The positive/negative masks are
built from the GT-aligned point-distance matrix exactly as the reference
does: every pair inside thres_radius is excluded from the negative set and
enters the positive logsumexp; the detector term's pos_mask replicates the
reference's zero-before-min quirk (see circle_loss body).

Memory note: this loss materializes the (N1, N2) point- and feature-distance
matrices, as the reference does; it is intended for the `feat` pipeline where
N is the (sub-selected) keypoint count.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from deepsir_tpu.config import LossConfig
from deepsir_tpu.math import se3
from deepsir_tpu.ops.distance import square_distance

_BIG = 1e5
_EPS = 1e-12


def circle_loss(anc_feat: jnp.ndarray, pos_feat: jnp.ndarray,
                anc_pc: jnp.ndarray, pos_pc: jnp.ndarray,
                anc_score: jnp.ndarray, thres_radius: float,
                log_scale: float = 10.0, pos_margin: float = 0.1,
                neg_margin: float = 1.4,
                overlap_det_mask: bool = False
                ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Circle loss (feature) + detector loss + matching accuracy.

    anc_feat/pos_feat: (B, N1/N2, C) descriptors
    anc_pc/pos_pc:     (B, N1/N2, 3), pos_pc already in anchor coordinates
    anc_score:         (B, N1) detector scores
    Returns (loss_feat scalar, loss_det scalar, accuracy scalar %).
    (reference CircleLoss.forward, loss.py:500-624; optimal == margin)
    """
    anc_score = anc_score / (jnp.sum(anc_score, axis=1, keepdims=True) + _EPS)

    # point distances use the direct difference norm (reference
    # loss.py:518-520), NOT the |a|^2+|b|^2-2ab expansion: the pos_mask below
    # tests dist == 0 exactly, and the expansion form's rounding turns exact
    # duplicates into ~1e-6 — flipping the mask. Feature distances keep the
    # expansion (the reference's square_distance_V2 + sqrt(+eps), loss.py:527)
    dist_pc = jnp.linalg.norm(
        anc_pc[..., :, None, :] - pos_pc[..., None, :, :], axis=-1)
    dist_feat = jnp.sqrt(jnp.maximum(square_distance(anc_feat, pos_feat), 0.0) + _EPS)

    false_neg = dist_pc < thres_radius                                # (B, N1, N2)
    # the reference's positive mask (loss.py:533-535) zeroes out-of-radius
    # entries BEFORE the min, so dist_min collapses to 0 whenever any pair is
    # out of radius and pos_mask keeps only EXACT-duplicate points
    # (dist == 0). That is generically empty on KITTI/3DMatch feat pairs but
    # is the true correspondence on Oxford self-pairs (identical points,
    # identity GT). Replicated bit-for-bit: it only affects the detector
    # term and accuracy — lse_positive already treats every in-radius pair
    # as a positive either way (verified by tests/test_parity_reference.py).
    dist_min = jnp.min(dist_pc * false_neg, axis=-1, keepdims=True)
    pos_mask = dist_pc == dist_min
    neg_mask = ~(pos_mask | false_neg)

    # negatives are pushed far negative so they vanish from the positive
    # logsumexp; all pairs within the radius (pos + false-neg) count as
    # positives (reference loss.py:537-541)
    pos = dist_feat - _BIG * neg_mask
    pos_weight = jax.lax.stop_gradient(jnp.maximum(pos - pos_margin, 0.0))
    lse_pos = jax.nn.logsumexp(log_scale * (pos - pos_margin) * pos_weight, axis=-1)

    neg = dist_feat + _BIG * (~neg_mask)
    neg_weight = jax.lax.stop_gradient(jnp.maximum(neg_margin - neg, 0.0))
    neg_weighted = log_scale * (neg_margin - neg) * neg_weight
    lse_neg_row = jax.nn.logsumexp(neg_weighted, axis=-1)             # (B, N1)
    lse_neg_col = jax.nn.logsumexp(neg_weighted, axis=-2)             # (B, N2)

    loss_col = jax.nn.softplus(lse_pos + lse_neg_row) / log_scale
    loss_row = jax.nn.softplus(lse_pos + lse_neg_col) / log_scale
    loss_feat = jnp.mean(loss_col + loss_row)

    # matching accuracy + detector loss: score should be high where the
    # nearest-feature match is correct (diff < 0). With the reference's
    # degenerate pos_mask (above), anchors without an exact-duplicate
    # correspondent have furthest_pos = 0 and always count diff < 0 — kept
    # verbatim for parity (loss.py:565-578); the accuracy denominator,
    # however, is corrected to mean over B*N1 (the reference divides a
    # batch-summed count by N1 only, loss.py:570).
    furthest_pos = jnp.max(dist_feat * pos_mask, axis=-1)
    closest_neg = jnp.min(dist_feat + _BIG * pos_mask, axis=-1)
    diff = furthest_pos - closest_neg                                 # (B, N1)
    if overlap_det_mask:
        # Partial-overlap fix (opt-in, beyond the reference): an anchor with
        # NO in-radius correspondent has furthest_pos = 0, so its diff is
        # strongly negative and the detector term REWARDS scoring non-overlap
        # points high — exactly backwards for partial-overlap pairs. Restrict
        # the detector term and the accuracy to anchors that actually have a
        # correspondent; non-overlap anchors are still pushed DOWN through
        # the score normalization (their score dilutes the weight of the
        # overlap anchors' negative diffs).
        has_pos = jnp.any(false_neg, axis=-1)                         # (B, N1)
        accuracy = (jnp.sum((diff < 0) * has_pos)
                    / (jnp.sum(has_pos) + _EPS) * 100.0)
        loss_det = jnp.mean(jnp.where(has_pos, diff, 0.0) * anc_score)
    else:
        accuracy = jnp.mean((diff < 0) * 100.0)
        loss_det = jnp.mean(diff * anc_score)
    return loss_feat, loss_det, accuracy


def circle_loss_tiled(anc_feat: jnp.ndarray, pos_feat: jnp.ndarray,
                      anc_pc: jnp.ndarray, pos_pc: jnp.ndarray,
                      anc_score: jnp.ndarray, thres_radius: float,
                      log_scale: float = 10.0, pos_margin: float = 0.1,
                      neg_margin: float = 1.4,
                      overlap_det_mask: bool = False,
                      tile: int = 1500
                      ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """`circle_loss` without ever materializing the (N1, N2) matrices.

    At the 18000-point protocol the materialized point- and feature-distance
    matrices are ~1.3 GB each per batch element (the reference pays this,
    network/loss.py:518-527, with its own 'low memory footprint' note); here
    the positive axis is processed in tiles of `tile` columns inside a
    lax.scan: per-row logsumexps accumulate via logaddexp (exact), per-row
    min/max reductions accumulate directly, and the column logsumexp is
    emitted per tile. Two passes over the tiles: the reference's pos_mask
    tests dist_pc == row_min (the zero-before-min quirk, loss.py:533-535),
    which needs the full-row min before any mask can be formed.

    `tile` is clamped to the largest divisor of N2 (no padding — padded
    columns cannot be made invisible to the reference's excluded-entry
    semantics, where every non-negative entry still contributes exp(0)).
    Gradients flow identically (scan transposes to the accumulation).
    """
    n2 = pos_feat.shape[-2]
    t = max(1, min(tile, n2))
    while n2 % t:
        t -= 1
    steps = n2 // t

    def single(anc_feat, pos_feat, anc_pc, pos_pc, anc_score):
        score = anc_score / (jnp.sum(anc_score) + _EPS)
        pos_tiles = pos_feat.reshape(steps, t, -1)
        pc_tiles = pos_pc.reshape(steps, t, 3)

        def dists(pf_tile, pc_tile):
            dist_pc = jnp.linalg.norm(
                anc_pc[:, None, :] - pc_tile[None, :, :], axis=-1)
            dist_feat = jnp.sqrt(jnp.maximum(
                square_distance(anc_feat, pf_tile), 0.0) + _EPS)
            return dist_pc, dist_feat

        # pass 1: the row min of dist_pc * false_neg (the reference quirk:
        # any out-of-radius column zeroes the min)
        def min_body(m, args):
            dist_pc, _ = dists(*args)
            fn = dist_pc < thres_radius
            return jnp.minimum(m, jnp.min(dist_pc * fn, axis=-1)), None

        dist_min, _ = jax.lax.scan(
            min_body, jnp.full(anc_feat.shape[0], jnp.inf),
            (pos_tiles, pc_tiles))

        # pass 2: masked logsumexps + detector reductions
        def body(carry, args):
            lse_p, lse_n, furthest, closest, has_pos = carry
            dist_pc, dist_feat = dists(*args)
            false_neg = dist_pc < thres_radius
            pos_mask = dist_pc == dist_min[:, None]
            neg_mask = ~(pos_mask | false_neg)

            pos = dist_feat - _BIG * neg_mask
            pos_w = jax.lax.stop_gradient(jnp.maximum(pos - pos_margin, 0.0))
            lse_p = jnp.logaddexp(lse_p, jax.nn.logsumexp(
                log_scale * (pos - pos_margin) * pos_w, axis=-1))

            neg = dist_feat + _BIG * (~neg_mask)
            neg_w = jax.lax.stop_gradient(jnp.maximum(neg_margin - neg, 0.0))
            neg_weighted = log_scale * (neg_margin - neg) * neg_w
            lse_n = jnp.logaddexp(lse_n, jax.nn.logsumexp(neg_weighted,
                                                          axis=-1))
            lse_col_tile = jax.nn.logsumexp(neg_weighted, axis=-2)  # (t,)

            furthest = jnp.maximum(furthest,
                                   jnp.max(dist_feat * pos_mask, axis=-1))
            closest = jnp.minimum(closest,
                                  jnp.min(dist_feat + _BIG * pos_mask,
                                          axis=-1))
            has_pos = has_pos | jnp.any(false_neg, axis=-1)
            return (lse_p, lse_n, furthest, closest, has_pos), lse_col_tile

        n1 = anc_feat.shape[0]
        init = (jnp.full(n1, -jnp.inf), jnp.full(n1, -jnp.inf),
                jnp.full(n1, -jnp.inf), jnp.full(n1, jnp.inf),
                jnp.zeros(n1, bool))
        (lse_pos, lse_neg_row, furthest, closest, has_pos), cols = \
            jax.lax.scan(body, init, (pos_tiles, pc_tiles))
        lse_neg_col = cols.reshape(n2)

        loss_col = jax.nn.softplus(lse_pos + lse_neg_row) / log_scale
        loss_row = jax.nn.softplus(lse_pos + lse_neg_col) / log_scale
        loss_feat = jnp.mean(loss_col + loss_row)

        diff = furthest - closest
        if overlap_det_mask:
            acc = (jnp.sum((diff < 0) * has_pos)
                   / (jnp.sum(has_pos) + _EPS) * 100.0)
            loss_det = jnp.mean(jnp.where(has_pos, diff, 0.0) * score)
        else:
            acc = jnp.mean((diff < 0) * 100.0)
            loss_det = jnp.mean(diff * score)
        return loss_feat, loss_det, acc

    fn = single
    for _ in range(anc_feat.ndim - 2):
        fn = jax.vmap(fn)
    lf, ld, acc = fn(anc_feat, pos_feat, anc_pc, pos_pc, anc_score)
    return jnp.mean(lf), jnp.mean(ld), jnp.mean(acc)


def det_des_loss(feat_src: jnp.ndarray, feat_ref: jnp.ndarray,
                 pt_src: jnp.ndarray, pt_ref: jnp.ndarray,
                 score_src: jnp.ndarray, score_ref: jnp.ndarray,
                 transform_gt: jnp.ndarray,
                 cfg: LossConfig) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Combined detection/description objective (reference DetDesLoss.forward,
    loss.py:667-702): src is moved into ref coordinates with the GT pose, then
    circle loss anchors on the ref cloud.

    Returns (total loss, accuracy).
    """
    assert cfg.thres_radius > 0, "thres_radius must come from the data config"
    pt_src_gt = se3.transform(transform_gt, pt_src)
    if cfg.circle_loss_tile > 0:
        # protocol-scale feat training: stream the positive axis in tiles
        # (one full 18000-pt feat step fits on-chip; equivalence vs the
        # materialized form is tested at small N)
        loss_feat, loss_det, acc = circle_loss_tiled(
            feat_ref, feat_src, pt_ref, pt_src_gt, score_ref,
            thres_radius=cfg.thres_radius,
            overlap_det_mask=cfg.overlap_det_mask,
            tile=cfg.circle_loss_tile)
    else:
        loss_feat, loss_det, acc = circle_loss(
            feat_ref, feat_src, pt_ref, pt_src_gt, score_ref,
            thres_radius=cfg.thres_radius,
            overlap_det_mask=cfg.overlap_det_mask)
    return loss_feat + loss_det * cfg.det_loss_weight, acc
