"""Evaluation harness — the test.py-equivalent driver internals.

Re-design of the reference's evaluation driver (/root/reference/test.py):
per-pair timed inference with success stats (inference_align, test.py:358-457),
optional pose refinement (Adam-on-SE3 finetune and ICP, test.py:159-266 —
both OFF by default, matching test.py:215-216), per-iteration metric sweeps
(evaluate_align, test.py:308-355), artifact persistence (save_eval_align,
test.py:269-305), and the feat/label inference dumps (test.py:460-567).

TPU-native differences: the model step is one jitted XLA program (pyramid
build included); the optional finetune is a jitted optax loop instead of a
host Adam loop; ICP refinement is the jitted ICP kernel (ops/icp.py) instead
of Open3D.
"""
from __future__ import annotations

import json
import logging
import os
import pickle
import time
from collections import defaultdict
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from deepsir_tpu.config import Config
from deepsir_tpu.losses.semantic import (LABEL_NAMES, SemanticMetric,
                                         confusion_matrix, semantic_loss)
from deepsir_tpu.math import se3, se3_np
from deepsir_tpu.ops.gather import gather_points
from deepsir_tpu.ops.icp import icp
from deepsir_tpu.utils.xlsx import write_xlsx
from deepsir_tpu.utils.metrics import (compute_metrics, print_metrics, rte_rre,
                                       summarize_metrics)
from deepsir_tpu.utils.prefetch import device_prefetch

_logger = logging.getLogger("eval")
_EPS = 1e-16


# --------------------------------------------------------------------------
# Optional pose refinement (reference test.py:159-266; off by default)
# --------------------------------------------------------------------------

def _rot6d_to_matrix(rot6d: jnp.ndarray) -> jnp.ndarray:
    """Gram-Schmidt 6D -> rotation matrix (reference DGR.ortho2rotation,
    network/DGR.py:60-108)."""
    a1, a2 = rot6d[:3], rot6d[3:]
    b1 = a1 / (jnp.linalg.norm(a1) + 1e-12)
    b2 = a2 - jnp.dot(b1, a2) * b1
    b2 = b2 / (jnp.linalg.norm(b2) + 1e-12)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=1)


def _smooth_l1(x: jnp.ndarray, y: jnp.ndarray, weights: jnp.ndarray,
               quantization_size: float, delta: float = 1.0) -> jnp.ndarray:
    """Weighted high-dim smooth-L1 (reference HighDimSmoothL1Loss,
    test.py:102-130)."""
    sq = jnp.sum(((x - y) / quantization_size) ** 2, axis=-1)
    use_sq = 0.5 * (sq < delta).astype(x.dtype)
    loss = (0.5 - use_sq) * (jnp.sqrt(sq + 1e-7) - 0.5 * delta ** 2) \
        + use_sq * sq
    return jnp.sum(loss * weights) / (jnp.sum(weights) + 1e-12)


def finetune_pose(xyz_src: jnp.ndarray, xyz_ref: jnp.ndarray,
                  pose: jnp.ndarray, weights: jnp.ndarray,
                  quantization_size: float, max_iter: int = 200,
                  lr: float = 1e-1) -> jnp.ndarray:
    """Jitted Adam-on-SE3 refinement (reference transformation_finetune,
    test.py:159-207). xyz_*: (N, 3) matched pairs; pose (3, 4); weights (N,).
    """
    rot6d0 = jnp.concatenate([pose[:3, 0], pose[:3, 1]])
    params0 = {"rot6d": rot6d0, "trans": pose[:3, 3]}
    tx = optax.chain(optax.scale_by_adam(),
                     optax.scale_by_schedule(
                         optax.exponential_decay(lr, 1, 0.999)),
                     optax.scale(-1.0))

    def loss_fn(p):
        rot = _rot6d_to_matrix(p["rot6d"])
        moved = xyz_src @ rot.T + p["trans"]
        return _smooth_l1(moved, xyz_ref, weights, quantization_size)

    def step(carry, _):
        p, opt_state = carry
        g = jax.grad(loss_fn)(p)
        updates, opt_state = tx.update(g, opt_state)
        return (optax.apply_updates(p, updates), opt_state), None

    (p, _), _ = jax.lax.scan(step, (params0, tx.init(params0)),
                             None, length=max_iter)
    rot = _rot6d_to_matrix(p["rot6d"])
    return jnp.concatenate([rot, p["trans"][:, None]], axis=1)


def average_poses(transforms: np.ndarray) -> np.ndarray:
    """Chordal-L2 mean of SE(3) estimates: project mean(R_i) back to SO(3)
    via SVD, average translations. transforms: (k, B, 3, 4) -> (B, 3, 4).

    All-new capability (no reference counterpart): the registration
    iterations produce near-independent pose estimates jittering around the
    fixed point once roughly aligned (BASELINE.md round-3 analysis), so
    averaging the last k estimates shrinks the estimator variance ~sqrt(k).
    """
    r_mean = np.mean(transforms[..., :3, :3], axis=0)        # (B, 3, 3)
    t_mean = np.mean(transforms[..., :3, 3], axis=0)         # (B, 3)
    out = np.empty(transforms.shape[1:], dtype=transforms.dtype)
    for b in range(r_mean.shape[0]):
        u, _, vt = np.linalg.svd(r_mean[b])
        d = np.sign(np.linalg.det(u @ vt))
        out[b, :3, :3] = u @ np.diag([1.0, 1.0, d]) @ vt
        out[b, :3, 3] = t_mean[b]
    return out


def pose_optimization(cfg: Config, arrays: Dict[str, np.ndarray], out,
                      pose_in: jnp.ndarray, transforms=None) -> jnp.ndarray:
    """Optional refinement pass (reference pose_optimization, test.py:209-266).

    Both switches default off, so by default this returns pose_in unchanged —
    exactly the reference's shipped behavior (test.py:215-216).
    """
    use_tune = getattr(cfg.eval, "use_finetune", False)
    use_icp = getattr(cfg.eval, "use_icp", False)
    use_ransac = getattr(cfg.eval, "use_ransac", False)
    avg_last = getattr(cfg.eval, "pose_average_last", 0)
    pose = pose_in                                      # (B, 3, 4)
    corres_dist = cfg.data.voxel_size * 2

    if avg_last > 1 and transforms is not None:
        k = min(avg_last, transforms.shape[0])
        pose = jnp.asarray(average_poses(np.asarray(transforms[-k:])))

    if use_ransac:
        # vmapped hypothesis-sampling RANSAC over the final correspondences
        # (replaces the reference's commented Open3D RANSAC, test.py:259-263)
        from deepsir_tpu.ops.ransac import ransac_correspondence
        idx = out.pred_idx[-1]                           # (B, N)
        n = idx.shape[-1]
        corres = jnp.concatenate(
            [jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), idx.shape)[..., None],
             idx[..., None]], axis=-1)
        pose = jax.vmap(
            lambda s, r, c: ransac_correspondence(
                jax.random.PRNGKey(0), s, r, c, corres_dist)[0]
        )(out.pt_src, out.pt_ref, corres)

    if use_tune:
        weights = jax.nn.sigmoid(out.inlier_logits[-1])  # (B, N)
        matched = gather_points(out.pt_ref, out.pred_idx[-1])
        pose = jax.vmap(
            lambda s, r, p, w: finetune_pose(s, r, p, w, corres_dist)
        )(out.pt_src, matched, pose, weights)

    if use_icp:
        pose = jax.vmap(
            lambda s, t, p: icp(s, t, corres_dist, init=p, num_iter=30)
        )(jnp.asarray(arrays["points_src"][..., :3]),
          jnp.asarray(arrays["points_ref"][..., :3]), pose)

    return pose


# --------------------------------------------------------------------------
# Stats (reference print_stats, test.py:90-99)
# --------------------------------------------------------------------------

def print_stats(stats: np.ndarray) -> None:
    succ_rate, rte, rre, avg_time, _ = stats.mean(axis=0)
    _logger.info("All result mean:")
    _logger.info("Time: %.3f, RTE all: %.3f, RRE all: %.3f, Success: %.3f %%",
                 avg_time, rte, rre, succ_rate * 100)
    sel = stats[stats[:, 0] > 0]
    if len(sel) > 0:
        succ_rate, rte, rre, avg_time, _ = sel.mean(axis=0)
        _logger.info("Success result mean:")
        _logger.info("Time: %.3f, RTE all: %.3f, RRE all: %.3f",
                     avg_time, rte, rre)


# --------------------------------------------------------------------------
# Align inference + evaluation (reference test.py:308-457)
# --------------------------------------------------------------------------

def inference_align(loader, eval_step, params, cfg: Config,
                    stats_path: Optional[str] = None
                    ) -> Tuple[np.ndarray, Dict[str, list]]:
    """Timed inference sweep. Returns (pred_transforms (B_total, iters+1, 3, 4),
    endpoints lists). The +1 slot is the (optionally refined) final pose,
    mirroring the reference appending pose_optimized (test.py:404-415)."""
    total_time = 0.0
    total_rotation = []
    pred_all: List[np.ndarray] = []
    stats_rows = []
    endpoints_out: Dict[str, list] = defaultdict(list)

    warmed = False

    transfer_dtype = np.dtype(getattr(cfg.eval, "transfer_dtype", "float32"))

    def transfer(batch):
        # keep the host batch for numpy-side stats; stage the array leaves
        # on device ahead of the step (utils/prefetch.py) so the transfer
        # of pair i+1 overlaps the device compute of pair i. Point payloads
        # optionally cross the link half-width (cfg.eval.transfer_dtype;
        # device_batch upcasts to fp32 before any math)
        arrays = {k: v for k, v in batch.items() if isinstance(v, np.ndarray)}
        if transfer_dtype != np.float32:
            arrays = {k: (v.astype(transfer_dtype)
                          if k in ("points_src", "points_ref") else v)
                      for k, v in arrays.items()}
        return batch, {k: jax.device_put(v) for k, v in arrays.items()}

    for batch, dev_arrays in device_prefetch(loader, transfer=transfer):
        arrays = {k: v for k, v in batch.items() if isinstance(v, np.ndarray)}
        gt = arrays["transform_gt"]
        rot_trace = gt[:, 0, 0] + gt[:, 1, 1] + gt[:, 2, 2]
        total_rotation.append(np.degrees(np.arccos(
            np.clip(0.5 * (rot_trace - 1), -1 + _EPS, 1 - _EPS))))

        if not warmed:
            # untimed warm-up: the first call pays the XLA compile (minutes
            # via the remote compile service), which would skew the first
            # stats row and every aggregate; the reference times a pure
            # torch forward (test.py:399-402) and the baseline script
            # discards its warm-up pair for the same reason
            jax.block_until_ready(eval_step(params, dev_arrays)[0])
            warmed = True

        t0 = time.perf_counter()
        transforms, out = eval_step(params, dev_arrays)
        # forced one-element readback barrier: block_until_ready on a small
        # output returns early through the relay (async completion illusion,
        # CLAUDE.md) and would undercount per-pair device compute; pulling
        # ONE element through the host is the only reliable fence
        jax.device_get(transforms[-1].ravel()[0])
        dt = time.perf_counter() - t0
        total_time += dt

        pose = pose_optimization(cfg, arrays, out, transforms[-1],
                                 transforms=transforms)
        # (iters, B, 3, 4) + final -> (B, iters+1, 3, 4)
        stacked = np.concatenate(
            [np.asarray(transforms), np.asarray(pose)[None]], axis=0)
        pred_all.append(np.transpose(stacked, (1, 0, 2, 3)))

        pose_np = np.asarray(pose)
        for i in range(len(gt)):
            meta = batch.get("meta", [{}] * len(gt))[i]
            stats_rows.append(np.concatenate([
                rte_rre(pose_np[i], gt[i], cfg.eval.rte_thresh,
                        cfg.eval.rre_thresh),
                [dt, float(meta.get("seq", 0))]]))
        endpoints_out["scores_src"].append(np.asarray(out.score_src))
        endpoints_out["scores_ref"].append(np.asarray(out.score_ref))

    stats = np.stack(stats_rows)                      # (B_total, 5)
    _logger.info("Total inference time: %.3fs", total_time)
    rot = np.concatenate(total_rotation)
    _logger.info("Rotation range in test data: %.3f(avg), %.3f(max)",
                 rot.mean(), rot.max())
    if stats_path is not None:
        np.savez(stats_path, stats=stats[None], names=["Ours"])
        _logger.info("Saved stats to %s", stats_path)
    print_stats(stats)
    return np.concatenate(pred_all, axis=0), dict(endpoints_out)


def evaluate_align(pred_transforms: np.ndarray, loader, cfg: Config
                   ) -> Tuple[List[Dict[str, np.ndarray]], Dict[str, float]]:
    """Metric sweep per registration iteration (reference evaluate_align,
    test.py:308-355). pred_transforms: (B_total, iters, 3, 4) or (B, 3, 4)."""
    if pred_transforms.ndim == 3:
        pred_transforms = pred_transforms[:, None]
    n_iter = pred_transforms.shape[1]
    per_iter = [defaultdict(list) for _ in range(n_iter)]

    done = 0
    for batch in loader:
        src = batch["points_src"][:, :1024]
        ref = batch["points_ref"][:, :1024]
        bs = len(src)
        for i in range(n_iter):
            m = compute_metrics(batch["transform_gt"],
                                pred_transforms[done:done + bs, i],
                                src, ref, cfg.eval.rte_thresh,
                                cfg.eval.rre_thresh, max_points=1024,
                                mask_src=batch.get("mask_src"),
                                mask_ref=batch.get("mask_ref"))
            for k, v in m.items():
                per_iter[i][k].append(v)
        done += bs

    summary = {}
    metrics_list = []
    for i in range(n_iter):
        merged = {k: np.concatenate(v) for k, v in per_iter[i].items()}
        metrics_list.append(merged)
        summary = summarize_metrics(merged)
        print_metrics(_logger, summary,
                      title=f"Evaluation result (iter {i})")
    return metrics_list, summary


def save_eval_align(pred_transforms: np.ndarray, endpoints: Dict,
                    metrics: List[Dict[str, np.ndarray]],
                    summary: Dict[str, float], save_path: str) -> None:
    """Persist eval artifacts (reference save_eval_align, test.py:269-305):
    pred_transforms.npy, endpoint arrays, per-iteration metric tables —
    both metrics.xlsx (one 'Iter_{n}' worksheet per iteration, matching the
    reference's ExcelWriter sheet naming, written by the dependency-free
    utils/xlsx writer — cells only, no leading index column) and
    per-iteration CSVs with identical content — plus summary_metrics.json."""
    os.makedirs(save_path, exist_ok=True)
    np.save(os.path.join(save_path, "pred_transforms.npy"), pred_transforms)
    for k, v in endpoints.items():
        if isinstance(v, np.ndarray):
            np.save(os.path.join(save_path, f"{k}.npy"), v)
        else:
            with open(os.path.join(save_path, f"{k}.pickle"), "wb") as fid:
                pickle.dump(v, fid)

    sheets = {}
    for i, m in enumerate(metrics):
        m = dict(m)
        m["r_rmse"] = np.sqrt(m.pop("r_mse"))
        m["t_rmse"] = np.sqrt(m.pop("t_mse"))
        keys = list(m)
        rows = np.stack([np.asarray(m[k], dtype=np.float64) for k in keys], 1)
        sheets[f"Iter_{i + 1}"] = (keys, rows)
        with open(os.path.join(save_path, f"metrics_iter_{i + 1}.csv"), "w") as f:
            f.write(",".join(keys) + "\n")
            for row in rows:
                f.write(",".join(f"{x:.8g}" for x in row) + "\n")
    write_xlsx(os.path.join(save_path, "metrics.xlsx"), sheets)

    with open(os.path.join(save_path, "summary_metrics.json"), "w") as f:
        json.dump({k: float(v) for k, v in summary.items()}, f, indent=2)
    _logger.info("Saved evaluation results to %s", save_path)


# --------------------------------------------------------------------------
# Feat / label inference (reference test.py:460-567)
# --------------------------------------------------------------------------

def _save_txt(path: str, arr: np.ndarray) -> None:
    np.savetxt(path, arr, fmt="%.6f")


def inference_feat(loader, fwd_step, params, cfg: Config, save_path: str,
                   dump_every: int = 10) -> None:
    """Scored-keypoint dump sweep (reference inference_feat, test.py:460-504)."""
    os.makedirs(save_path, exist_ok=True)
    total_time = 0.0
    count = 0
    for batch in loader:
        arrays = {k: v for k, v in batch.items() if isinstance(v, np.ndarray)}
        if count == 0:           # untimed warm-up: exclude the XLA compile
            jax.block_until_ready(fwd_step(params, arrays))
        t0 = time.perf_counter()
        out = jax.block_until_ready(fwd_step(params, arrays))
        total_time += time.perf_counter() - t0

        if count % dump_every == 0:
            gt = arrays["transform_gt"]
            xyz_src = se3_np.transform(gt[0], np.asarray(out.xyz_src)[0])
            xyz_ref = np.asarray(out.xyz_ref)[0]
            raw_src = se3_np.transform(gt[0], arrays["points_src"][0, :, :3])
            raw_ref = arrays["points_ref"][0, :, :3]
            for name, xyz, score, raw in (
                    ("src", xyz_src, out.score_src, raw_src),
                    ("ref", xyz_ref, out.score_ref, raw_ref)):
                pt = np.concatenate([xyz, np.asarray(score)[0][:, None]], 1)
                _save_txt(os.path.join(save_path, f"{count:06d}_{name}_pt.txt"),
                          pt)
                # full input cloud alongside the scored keypoints
                # (reference inference_feat raw dump, test.py:487-490)
                _save_txt(os.path.join(save_path,
                                       f"{count:06d}_{name}_raw.txt"), raw)
        count += len(arrays["points_src"])
    _logger.info("Total inference time: %.3fs", total_time)


def inference_label(loader, fwd_step, params, cfg: Config, save_path: str,
                    dump_every: int = 10) -> Tuple[float, list, float]:
    """Semantic inference + mIoU (reference inference_label, test.py:507-567)."""
    os.makedirs(save_path, exist_ok=True)
    metric = SemanticMetric()
    total_time = 0.0
    count = 0
    for batch in loader:
        arrays = {k: v for k, v in batch.items() if isinstance(v, np.ndarray)}
        if count == 0:           # untimed warm-up: exclude the XLA compile
            jax.block_until_ready(fwd_step(params, arrays))
        t0 = time.perf_counter()
        out = jax.block_until_ready(fwd_step(params, arrays))
        total_time += time.perf_counter() - t0

        for logits, labels in ((out.logits_src, arrays["labels_src"]),
                               (out.logits_ref, arrays["labels_ref"])):
            metric.update(confusion_matrix(jnp.asarray(logits),
                                           jnp.asarray(labels)))

        if count % dump_every == 0:
            for name, xyz, logits in (("src", out.xyz_src, out.logits_src),
                                      ("ref", out.xyz_ref, out.logits_ref)):
                pred = np.argmax(np.asarray(logits)[0], axis=-1) + 1
                pt = np.concatenate([np.asarray(xyz)[0],
                                     pred[:, None].astype(np.float32)], 1)
                _save_txt(os.path.join(save_path, f"{count:06d}_{name}.txt"), pt)
        count += len(arrays["points_src"])

    _logger.info("Total inference time: %.3fs", total_time)
    mean_iou, iou_list, mean_acc = metric.compute()
    _logger.info("Validation accuracy: %.3f", mean_acc)
    _logger.info("Mean IoU: %.1f", mean_iou * 100)
    _logger.info("IoU: %s", "|".join(
        f"{name}:{100 * v:5.2f}" for name, v in zip(LABEL_NAMES, iou_list)))
    return mean_iou, iou_list, mean_acc
