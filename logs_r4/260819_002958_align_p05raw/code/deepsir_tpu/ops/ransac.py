"""Vmapped correspondence RANSAC registration, fully in-graph.

TPU-native replacement for Open3D's registration_ransac_* used by the
reference's optional test-time refinement path
(/root/reference/network/DGR.py:7-36, test.py:259-263 — off by default).
Instead of a sequential hypothesise-and-test loop, all hypotheses are drawn
at once and evaluated with one vmapped batch of 3-point Kabsch solves and
one batched inlier count — the kind of embarrassing parallelism the MXU/VPU
eat for free.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from deepsir_tpu.math import se3
from deepsir_tpu.ops.svd3 import weighted_kabsch


@partial(jax.jit, static_argnames=("num_hypotheses", "min_sample"))
def ransac_correspondence(rng: jax.Array, src: jnp.ndarray, ref: jnp.ndarray,
                          corres: jnp.ndarray, threshold: float,
                          num_hypotheses: int = 4096,
                          valid: Optional[jnp.ndarray] = None,
                          min_sample: int = 3
                          ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """RANSAC over putative correspondences.

    src (N, 3), ref (M, 3); corres (P, 2) int32 src/ref index pairs (may be
    padded — mask with `valid` (P,) bool). Returns (transform (3, 4),
    inlier_fraction scalar). The winning hypothesis is re-fit on all its
    inliers (the usual final polish).
    """
    p = corres.shape[0]
    if valid is None:
        valid = jnp.ones((p,), bool)
    a = src[corres[:, 0]]                                   # (P, 3)
    b = ref[corres[:, 1]]                                   # (P, 3)
    w_valid = valid.astype(src.dtype)

    # draw all hypothesis minimal samples at once: (H, min_sample) indices
    picks = jax.random.randint(rng, (num_hypotheses, min_sample), 0, p)

    def fit(sample_idx):
        sa = a[sample_idx]                                  # (m, 3)
        sb = b[sample_idx]
        w = valid[sample_idx].astype(src.dtype)
        t, bad = weighted_kabsch(sa[None], sb[None], w[None])
        return t[0], bad[0]

    transforms, bad = jax.vmap(fit)(picks)                  # (H, 3, 4)

    # inlier count per hypothesis against ALL correspondences
    moved = jnp.einsum("hij,pj->hpi", transforms[:, :, :3], a) \
        + transforms[:, None, :, 3]                         # (H, P, 3)
    dist = jnp.linalg.norm(moved - b[None], axis=-1)        # (H, P)
    inlier = (dist < threshold) & valid[None, :]
    score = jnp.sum(inlier, axis=1) - jnp.where(bad, p + 1, 0)
    best = jnp.argmax(score)

    # final polish: weighted Kabsch over the winner's inliers
    w = inlier[best].astype(src.dtype) * w_valid
    t, _ = weighted_kabsch(a[None], b[None], w[None])
    frac = jnp.sum(inlier[best]) / jnp.maximum(jnp.sum(valid), 1)
    return t[0], frac


@partial(jax.jit, static_argnames=("num_hypotheses",))
def ransac_feature_matching(rng: jax.Array, src: jnp.ndarray,
                            ref: jnp.ndarray, feat_src: jnp.ndarray,
                            feat_ref: jnp.ndarray, threshold: float,
                            num_hypotheses: int = 4096):
    """Feature-matching RANSAC (reference
    registration_ransac_based_on_feature_matching, DGR.py:20-36): putative
    pairs are one-way src->ref nearest descriptors (as in the reference's
    Open3D call), then correspondence RANSAC over them."""
    from deepsir_tpu.ops.distance import nearest_neighbour_index
    idx = nearest_neighbour_index(feat_src, feat_ref)       # (N,)
    corres = jnp.stack([jnp.arange(src.shape[0], dtype=jnp.int32), idx], 1)
    return ransac_correspondence(rng, src, ref, corres, threshold,
                                 num_hypotheses)
