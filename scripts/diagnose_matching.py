"""Per-iteration matching diagnostic: localize the quality gap.

For N held-out synthetic pairs, run the align forward and report per
registration iteration:
  * correct-match fraction (predicted pair within thres_radius under GT)
  * inlier-weight mass on correct vs wrong matches (is the learned filter
    doing its job?)
  * rotation/translation error of the solved pose

Runs the deepsir_tpu model (a checkpoint via --resume) and, with --torch_ref
CKPT, the torch reference through the train_reference_synthetic harness's
batcher — same pairs, same metrics — so the two frameworks' matching can be
compared stage by stage.

Usage:
  python scripts/diagnose_matching.py --resume <ckpt.msgpack> [--pairs 16]
  python scripts/diagnose_matching.py --torch_ref logs_ref_synthetic/align_final.pth
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

THRES = 0.9
NUM_POINTS = 1024


def summarize(name, rows):
    """rows: list over pairs of per-iteration dicts."""
    iters = len(rows[0])
    print(f"\n== {name} ({len(rows)} pairs) ==")
    print("iter | correct-match | w_mass correct | w_mass wrong | err_r deg | err_t | succ")
    for i in range(iters):
        cm = np.mean([r[i]["correct"] for r in rows])
        wc = np.mean([r[i]["w_correct"] for r in rows])
        ww = np.mean([r[i]["w_wrong"] for r in rows])
        er = np.mean([r[i]["err_r"] for r in rows])
        et = np.mean([r[i]["err_t"] for r in rows])
        sc = np.mean([(r[i]["err_r"] < 5.0) and (r[i]["err_t"] < 0.6)
                      for r in rows])
        print(f"{i + 1:4d} | {cm:13.4f} | {wc:14.4f} | {ww:12.4f} | "
              f"{er:9.3f} | {et:6.3f} | {sc:.3f}")
    # per-pair tail: the pairs that fail at the final iteration, with their
    # iteration-1 matching stats — localizes whether a failing pair had bad
    # matches from the start (descriptors) or lost them later (stability)
    print("failing pairs (final iter):")
    for pid, r in enumerate(rows):
        last = r[-1]
        if last["err_r"] >= 5.0 or last["err_t"] >= 0.6:
            print(f"  pair {pid}: it1 correct={r[0]['correct']:.3f} "
                  f"w_corr={r[0]['w_correct']:.3f} err_r1={r[0]['err_r']:.2f} "
                  f"-> final err_r={last['err_r']:.2f} err_t={last['err_t']:.3f}")


def pose_err(pred, gt):
    r = pred[:3, :3].T @ gt[:3, :3]
    er = np.degrees(np.arccos(np.clip((np.trace(r) - 1) / 2, -1 + 1e-9, 1 - 1e-9)))
    et = float(np.linalg.norm(pred[:3, 3] - gt[:3, 3]))
    return float(er), et


def iter_stats(src, ref, gt, pred_idx, weights, transform):
    """One iteration's stats from raw arrays (src/ref (N,3), gt (3,4))."""
    gt_src = src @ gt[:3, :3].T + gt[:3, 3]
    matched = ref[pred_idx]
    d = np.linalg.norm(gt_src - matched, axis=-1)
    correct = d < THRES
    w = weights / (weights.sum() + 1e-12)
    err_r, err_t = pose_err(transform, gt)
    return {"correct": float(correct.mean()),
            "w_correct": float(w[correct].sum()),
            "w_wrong": float(w[~correct].sum()),
            "err_r": err_r, "err_t": err_t}


def run_ours(args):
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    from deepsir_tpu.config import Config, DataConfig, LossConfig, ModelConfig, replace
    from deepsir_tpu.data.synthetic import SyntheticPairs
    from deepsir_tpu.models import ForwardOptions, Network
    from deepsir_tpu.training import create_train_state, device_batch
    from deepsir_tpu.utils.checkpoint import CheckPointManager

    model_cfg = ModelConfig(feat_len=3, num_points=NUM_POINTS,
                            num_reg_iter=args.iters,
                            clip_weight_thresh=args.clip,
                            absolute_pose_solve=args.absolute,
                            knn_recall_target=1.0 if args.exact else 0.95,
                            matcher_method="xla" if args.exact else "auto")
    cfg = Config(pipeline="align", model=model_cfg,
                 data=DataConfig(dataset_type="Synthetic", rot_mag=30.0,
                                 trans_mag=1.0),
                 loss=LossConfig()).resolved()
    ds = SyntheticPairs(cfg, "test", size=args.pairs)

    rng0 = np.random.default_rng((0, 0, 0))
    sample = ds.get_sample(0, rng0)
    arrays1 = {k: v[None] for k, v in sample.items()
               if isinstance(v, np.ndarray)}
    model, state = create_train_state(cfg, arrays1, seed=0)
    if args.resume:
        saver = CheckPointManager(os.path.dirname(args.resume))
        state, _ = saver.load(args.resume, state)

    opts = ForwardOptions(num_iter=args.iters, clip_weight=args.clip > 0)

    @jax.jit
    def fwd(params, arrays):
        batch = device_batch(cfg, arrays)
        return model.apply(params, batch, opts, train=False)

    rows = []
    for i in range(args.pairs):
        rng = np.random.default_rng((0, 0, int(i)))
        s = ds.get_sample(i, rng)
        arrays = {k: v[None] for k, v in s.items() if isinstance(v, np.ndarray)}
        transforms, out = fwd(state.params, arrays)
        transforms = np.asarray(transforms)
        pred_idx = np.asarray(out.pred_idx)
        logits = np.asarray(out.inlier_logits)
        src = arrays["points_src"][0, :, :3]
        ref = arrays["points_ref"][0, :, :3]
        gt = arrays["transform_gt"][0]
        per_iter = []
        for it in range(args.iters):
            w = 1.0 / (1.0 + np.exp(-logits[it, 0]))
            if args.clip > 0:
                w = np.where(w < args.clip, 0.0, w)
            per_iter.append(iter_stats(src, ref, gt, pred_idx[it, 0], w,
                                       transforms[it, 0]))
        rows.append(per_iter)
    summarize(f"deepsir_tpu (clip={args.clip}, absolute={args.absolute})",
              rows)


def run_reference(args):
    import torch
    sys.path.insert(0, "/root/reference")
    torch.Tensor.cuda = lambda self, *a, **k: self
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from train_reference_synthetic import (iter_batches, partial_load,
                                           reference_args, repo_cfg)
    from network.model import Network
    from deepsir_tpu.data.synthetic import SyntheticPairs

    ref_args = reference_args("align")
    model = Network(ref_args)
    state = torch.load(args.torch_ref, map_location="cpu")["state_dict"]
    partial_load(model, state)
    model.eval()

    cfg = repo_cfg("align", 256)
    ds = SyntheticPairs(cfg, "test", size=args.pairs)
    rows = []
    with torch.no_grad():
        for k, batch in enumerate(iter_batches(ds, "align", 1, False, 0, 0)):
            transforms, endpoints = model(batch, (args.iters, True))
            src = batch["points_src"][0, :, :3].numpy()
            ref = batch["points_ref"][0, :, :3].numpy()
            gt = batch["transform_gt"][0].numpy()
            per_iter = []
            for it in range(args.iters):
                idx = endpoints["pred_pairs"][it][0, :, 1].numpy()
                w = torch.sigmoid(endpoints["perm_matrices"][it][0]).numpy()
                per_iter.append(iter_stats(
                    src, ref, gt, idx, w, transforms[it][0].numpy()))
            rows.append(per_iter)
    summarize("torch reference", rows)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--resume", type=str, default=None)
    ap.add_argument("--torch_ref", type=str, default=None)
    ap.add_argument("--pairs", type=int, default=16)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--clip", type=float, default=0.05)
    ap.add_argument("--absolute", action="store_true")
    ap.add_argument("--exact", action="store_true",
                    help="exact KNN (recall 1.0) + exact XLA matcher")
    args = ap.parse_args()
    if args.torch_ref:
        run_reference(args)
    else:
        run_ours(args)
