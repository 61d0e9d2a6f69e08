"""Registration evaluation metrics.

Bit-compatible with the reference's metric suite
(/root/reference/common/metrics_util.py:13-127): RTE/RRE success criterion,
DCP-convention Euler MSE/MAE, isotropic rotation/translation error, and the
modified chamfer distance. Heavy reductions run in-graph (jnp); Euler
conversion is host-side scipy like the reference.
"""
from __future__ import annotations

from typing import Dict, List, Optional

import jax.numpy as jnp
import numpy as np

from deepsir_tpu.math import se3, so3
from deepsir_tpu.ops.distance import min_square_distance

_EPS = 1e-16


def rte_rre(t_pred: np.ndarray, t_gt: np.ndarray,
            rte_thresh: float, rre_thresh: float) -> np.ndarray:
    """[success, RTE (m), RRE (deg)] for one pose pair (3/4, 4).

    (reference metrics_util.rte_rre)
    """
    if t_pred is None:
        return np.array([0.0, np.inf, np.inf])
    rte = np.linalg.norm(t_pred[:3, 3] - t_gt[:3, 3])
    cos = (np.trace(t_pred[:3, :3].T @ t_gt[:3, :3]) - 1) / 2
    rre = np.arccos(np.clip(cos, -1 + _EPS, 1 - _EPS)) * 180 / np.pi
    return np.array([float(rte < rte_thresh and rre < rre_thresh), rte, rre])


def compute_metrics(transform_gt, pred_transforms, points_src, points_ref,
                    rte_thresh: float, rre_thresh: float,
                    points_raw=None, max_points: int = 2048,
                    mask_src=None, mask_ref=None) -> Dict[str, np.ndarray]:
    """Per-sample metric dict (reference metrics_util.compute_metrics).

    transform_gt/pred_transforms: (B, 3, 4)
    points_src/points_ref: (B, N, >=3); only the first max_points are used
    for the chamfer term (reference slices to 2048, metrics_util.py:36-37).
    mask_src/mask_ref: optional (B, N) validity masks for clouds padded to
    the static size by tile duplication (data layer). Duplicate points never
    change the chamfer MINIMA (min over a multiset), so masking the outer
    means reproduces the reference's natural-size statistics exactly.
    """
    g_gt = jnp.asarray(transform_gt)
    g_pr = jnp.asarray(pred_transforms)
    src = jnp.asarray(points_src)[:, :max_points, :3]
    ref = jnp.asarray(points_ref)[:, :max_points, :3]
    m_src = None if mask_src is None else jnp.asarray(mask_src)[:, :max_points]
    m_ref = None if mask_ref is None else jnp.asarray(mask_ref)[:, :max_points]

    # DCP-convention Euler / translation errors
    r_gt_euler = so3.dcm2euler(np.asarray(g_gt[:, :3, :3]), seq="xyz")
    r_pred_euler = so3.dcm2euler(np.asarray(g_pr[:, :3, :3]), seq="xyz")
    t_gt = np.asarray(g_gt[:, :3, 3])
    t_pred = np.asarray(g_pr[:, :3, 3])
    r_mse = np.mean((r_gt_euler - r_pred_euler) ** 2, axis=1)
    r_mae = np.mean(np.abs(r_gt_euler - r_pred_euler), axis=1)
    t_mse = np.mean((t_gt - t_pred) ** 2, axis=1)
    t_mae = np.mean(np.abs(t_gt - t_pred), axis=1)

    # isotropic errors + success
    err_r_deg, err_t = se3.pose_error(g_gt, g_pr)
    success = (np.asarray(err_t) < rte_thresh) * (np.asarray(err_r_deg) < rre_thresh)

    # modified chamfer distance (metrics_util.py:66-74)
    if points_raw is not None:
        raw = jnp.asarray(points_raw)[..., :3]
    else:
        raw = jnp.concatenate([se3.transform(g_gt, src), ref], axis=1)
    src_transformed = se3.transform(g_pr, src)
    inter = se3.concatenate(g_pr, se3.inverse(g_gt))
    src_clean = se3.transform(inter, raw)
    dist_src = min_square_distance(src_transformed, raw)
    dist_ref = min_square_distance(ref, src_clean)
    if m_src is None:
        chamfer = jnp.mean(dist_src, axis=1) + jnp.mean(dist_ref, axis=1)
    else:
        chamfer = (jnp.sum(dist_src * m_src, axis=1) / jnp.sum(m_src, axis=1)
                   + jnp.sum(dist_ref * m_ref, axis=1) / jnp.sum(m_ref, axis=1))

    return {
        "r_mse": r_mse, "r_mae": r_mae,
        "t_mse": t_mse, "t_mae": t_mae,
        "err_r_deg": np.asarray(err_r_deg), "err_t": np.asarray(err_t),
        "succ": np.asarray(success).astype(np.float64),
        "chamfer_dist": np.asarray(chamfer),
    }


def summarize_metrics(metrics: Dict[str, np.ndarray]) -> Dict[str, float]:
    """Mean over instances; mse -> rmse (reference summarize_metrics)."""
    out: Dict[str, float] = {}
    for k, v in metrics.items():
        if k.endswith("mse"):
            out[k[:-3] + "rmse"] = float(np.sqrt(np.mean(v)))
        elif k.startswith("err"):
            out[k + "_mean"] = float(np.mean(v))
            out[k + "_rmse"] = float(np.sqrt(np.mean(v ** 2)))
        else:
            out[k] = float(np.mean(v))
    return out


def print_metrics(logger, summary: Dict[str, float],
                  losses_by_iteration: Optional[List[float]] = None,
                  title: str = "Metrics") -> None:
    """Formatted metric report (reference print_metrics)."""
    logger.info("-" * (len(title) + 3))
    logger.info("%s:", title)
    if losses_by_iteration is not None:
        logger.info("Losses by iteration: %s",
                    " | ".join(f"{c:.5f}" for c in losses_by_iteration))
    logger.info("DCP metrics: %.4f (rot-rmse) | %.4f (rot-mae) | "
                "%.4g (trans-rmse) | %.4g (trans-mae)",
                summary["r_rmse"], summary["r_mae"],
                summary["t_rmse"], summary["t_mae"])
    logger.info("Rotation error: %.4f deg (mean) | %.4f deg (rmse)",
                summary["err_r_deg_mean"], summary["err_r_deg_rmse"])
    logger.info("Translation error: %.4g (mean) | %.4g (rmse)",
                summary["err_t_mean"], summary["err_t_rmse"])
    logger.info("Chamfer error: %.7f (mean-sq)", summary["chamfer_dist"])
    logger.info("Success rate: %.3f", summary["succ"])
