"""Keypoint scoring — saliency x isolation x channel-max x semantic weight.

Functional re-design of the reference's score_fun / feat_score
(/root/reference/network/model.py:668-757) in channel-last layout. Pure
function of (features, xyz, logits, neighbour graph) — no parameters.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from deepsir_tpu.ops.gather import gather_neighbour, gather_points

_EPS = 1e-16

# Per-class score weights, indexed by SemanticKITTI learning-map class - 1
# (class 0 'unlabeled' is excluded from logits). Static planar classes (road,
# building, pole, traffic-sign...) score high; dynamic classes (person,
# cyclists) are zeroed. (reference network/model.py:141-150)
# numpy (not jnp): a module-level device array would initialize the XLA
# backend at import time, which breaks jax.distributed.initialize ordering
# (parallel/distributed.py); jnp ops coerce it on first use inside jit
LABEL_WEIGHTS = np.asarray(
    [3, 1, 1, 3, 2,
     0, 0, 0, 6, 5,
     6, 4, 7, 7, 6,
     8, 4, 9, 9], dtype=np.float32)

AGGREGATION_BALL_R = 2.0       # isolation radius (model.py:729)
PROB_GATE = 0.2                # semantic confidence gate (model.py:749)


def score_points(feat: jnp.ndarray, xyz: jnp.ndarray, logits: jnp.ndarray,
                 neigh_idx: jnp.ndarray, k_neighbours: int = 16) -> jnp.ndarray:
    """Per-point keypoint score.

    feat:   (..., N, C) backbone features
    xyz:    (..., N, 3)
    logits: (..., N, num_classes) semantic logits
    neigh_idx: (..., N, K) level-0 KNN graph
    Returns scores (..., N) in [0, inf).
    """
    neigh_idx = neigh_idx[..., :k_neighbours]

    # normalize features by the per-sample max to avoid overflow
    max_per_sample = jnp.max(feat, axis=(-2, -1), keepdims=True)
    feat_n = feat / (max_per_sample + _EPS)

    # one fused gather for features + xyz (same indices; row-gathers are
    # latency-bound per row, so two gathers cost twice one)
    both = gather_neighbour(jnp.concatenate([feat_n, xyz], axis=-1),
                            neigh_idx)                               # (..., N, K, C+3)

    # 1. local-max saliency: softplus(f - mean of neighbour features)
    neigh_feat = jnp.mean(both[..., :-3], axis=-2)
    local_max = jax.nn.softplus(feat_n - neigh_feat)                 # (..., N, C)

    # 2. isolation mask: mean neighbour distance below a ball radius
    neigh_xyz = both[..., -3:]                                       # (..., N, K, 3)
    rel = neigh_xyz - xyz[..., :, None, :]
    mean_dist = jnp.mean(jnp.linalg.norm(rel, axis=-1), axis=-1)     # (..., N)
    isolation = (mean_dist < AGGREGATION_BALL_R).astype(feat.dtype)[..., None]

    # 3. channel-wise max ratio
    depth_max = jnp.max(feat_n, axis=-1, keepdims=True)              # (..., N, 1)
    channel_ratio = feat_n / (depth_max + _EPS)                      # (..., N, C)

    # 4. semantic weight gated by prediction confidence.
    # NOTE: like the reference (model.py:638,747-749), `prob` is the max RAW
    # logit normalized by the per-sample max — not a softmax probability — so
    # the 0.2 gate degenerates when all logits share a sign. Replicated
    # verbatim for parity.
    prob = jnp.max(logits, axis=-1)                                  # (..., N)
    label = jnp.argmax(logits, axis=-1)                              # (..., N)
    label_score = jnp.asarray(LABEL_WEIGHTS)[label]
    label_score = label_score / (jnp.max(label_score, axis=-1, keepdims=True) + _EPS)
    prob_n = prob / (jnp.max(prob, axis=-1, keepdims=True) + _EPS)
    label_score = label_score * (prob_n > PROB_GATE)                 # (..., N)

    score = local_max * isolation * channel_ratio * label_score[..., None]
    return jnp.max(score, axis=-1)                                   # (..., N)


def top_k_select(score: jnp.ndarray, k: int, *arrays: jnp.ndarray
                 ) -> Tuple[jnp.ndarray, ...]:
    """Keep the k highest-scoring points; gather companion arrays by the same
    index (reference feat_score sub-selection, model.py:681-698).

    score: (..., N); arrays: (..., N, C_i)
    Returns (top_scores (..., k), gathered arrays (..., k, C_i)...).
    """
    top_scores, idx = jax.lax.top_k(score, k)
    gathered = tuple(gather_points(a, idx) for a in arrays)
    return (top_scores,) + gathered
