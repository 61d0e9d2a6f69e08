"""Train + evaluate the TORCH REFERENCE on the repo's Synthetic staged regimen.

Closes the round-2 verdict's top gap: the repo's quality numbers (BASELINE.md
0.906 deployed / 0.742 protocol) had no reference-side number next to them,
because checkpoint import was rejected (PARITY.md) and the reference ships no
checkpoint (/root/reference/.MISSING_LARGE_BLOBS:1). This harness runs the
reference's OWN staged training (label -> feat -> align, the regimen its
freeze_model/freeze_model_2 implement, /root/reference/network/model.py:197-207,
/root/reference/train.py:303-488) and its own eval protocol
(/root/reference/test.py:358-457) on the IDENTICAL synthetic pairs the repo
trains on — same generator, same seeds, same augmentation stream, same
held-out 128-pair test split — and records succ/RTE/RRE per iteration.

The reference code is DRIVEN, not copied: its Network / losses / metrics are
imported from /root/reference and called the way its train.py calls them.
Environment shims (documented below) stand in for the absent compiled deps:

  * torch_points_kernels.knn  -> scipy cKDTree pyramid build with the exact
    nn_search semantics (data_base.py:153-183: per level knn(pc,pc,16),
    pool idx = first N/r rows, sub = first N/r points, knn(sub,pc,1) interp)
  * .cuda() tensor pins       -> no-op (this host is CPU-only; the reference
    hard-codes .cuda() in its loss paths, loss.py:824,921,949)

Usage:
  python scripts/train_reference_synthetic.py --probe        # step-time probe
  python scripts/train_reference_synthetic.py                # full regimen
  ... --label_epochs 30 --feat_epochs 15 --align_epochs 80   # (defaults)

Writes REFERENCE_QUALITY.json at the repo root + stage checkpoints under
logs_ref_synthetic/.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time
import types

import numpy as np
from scipy.spatial import cKDTree

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"
sys.path.insert(0, REPO)
sys.path.insert(0, REF)

import torch

# ---- environment shims (CPU-only host; see module docstring) --------------
torch.Tensor.cuda = lambda self, *a, **k: self          # noqa: E731
torch.set_num_threads(os.cpu_count() or 1)

from network.model import Network                        # noqa: E402  (reference)
from common.metrics_util import rte_rre                  # noqa: E402  (reference)

# sklearn >= 1.x made confusion_matrix's `labels` keyword-only; the reference
# passes it positionally (loss.py:971) — adapt in the reference's namespace
import sklearn.metrics                                   # noqa: E402
import network.loss as _ref_loss                         # noqa: E402
_ref_loss.confusion_matrix = (
    lambda y_true, y_pred, labels: sklearn.metrics.confusion_matrix(
        y_true, y_pred, labels=labels))

from deepsir_tpu.config import (Config, DataConfig, LossConfig, ModelConfig,  # noqa: E402
                                TrainConfig, replace)
from deepsir_tpu.data.synthetic import SyntheticPairs    # noqa: E402


# ---------------------------------------------------------------------------
# The staged recipe — EXACTLY scripts/staged_synthetic.sh's configuration
# ---------------------------------------------------------------------------

NUM_POINTS = 1024
FEAT_LEN = 3
ROT_MAG, TRANS_MAG = 30.0, 1.0
THRES_RADIUS = 0.9
BATCH = 8
RTE_THRESH, RRE_THRESH = 0.6, 5.0


def reference_args(pipeline: str) -> types.SimpleNamespace:
    """The reference's flag namespace (arguments.py defaults) at the repo's
    staged-synthetic configuration."""
    return types.SimpleNamespace(
        pipeline=pipeline, feat_len=FEAT_LEN, use_ppf=False,
        num_points=NUM_POINTS, num_sub=-1, num_knn=16,
        sub_sampling_ratio=[4, 4, 4, 4], d_out=[16, 64, 128, 256],
        out_feat_dim=64, clip_weight_thresh=0.05,
        loss_type="mae", wt_ptDist_loss=1.0, wt_inlier_loss=1.0,
        wt_pose_loss=0.0, loss_discount_factor=0.5,
        thres_radius=THRES_RADIUS,
        det_loss_weight=1.0, chamfer_loss_weight=0.0, feat_loss_weight=0.0,
        no_slack=False, num_sk_iter=5,
        num_train_reg_iter=2, num_reg_iter=5)


def repo_cfg(pipeline: str, train_size: int) -> Config:
    """The deepsir_tpu config whose SyntheticPairs stream this harness
    replays — must match staged_synthetic.sh's flags so both frameworks see
    byte-identical samples."""
    model = ModelConfig(feat_len=FEAT_LEN, num_points=NUM_POINTS)
    data = DataConfig(dataset_type="Synthetic", rot_mag=ROT_MAG,
                      trans_mag=TRANS_MAG, gt_match_lists=True,
                      synthetic_train_size=train_size)
    return Config(pipeline=pipeline, model=model, data=data,
                  loss=LossConfig(), train=TrainConfig()).resolved()


# ---------------------------------------------------------------------------
# Pyramid build — the reference's nn_search (data_base.py:153-183) via scipy
# ---------------------------------------------------------------------------

def build_pyramid_np(xyz: np.ndarray, num_knn: int, ratios):
    pts, neighs, pools, ups = [], [], [], []
    pc = xyz
    for r in ratios:
        tree = cKDTree(pc)
        _, ni = tree.query(pc, k=num_knn)               # (N, K)
        num = pc.shape[0] // r
        sub = pc[:num]
        _, ui = cKDTree(sub).query(pc, k=1)             # (N,)
        pts.append(pc)
        neighs.append(ni.astype(np.int64))
        pools.append(ni[:num].astype(np.int64))
        ups.append(ui[:, None].astype(np.int64))
        pc = sub
    cat = lambda xs: np.concatenate(xs, axis=0)         # noqa: E731
    return cat(pts), cat(neighs), cat(pools), cat(ups)


def to_reference_batch(samples, pipeline: str):
    """Stack deepsir_tpu sample dicts into the reference's batch contract
    (data_base.py collate_fn + nn_search: stacked tensors, matches as a
    ragged list on CPU)."""
    out = {}
    for side in ("src", "ref"):
        feats = np.stack([s[f"points_{side}"] for s in samples])  # (B, N, C)
        pyr = [build_pyramid_np(f[:, :3], 16, [4, 4, 4, 4]) for f in feats]
        out[f"points_{side}"] = torch.from_numpy(feats)
        out[f"points_{side}_xyz"] = torch.from_numpy(
            np.stack([p[0] for p in pyr]))
        out[f"points_{side}_neigh_idx"] = torch.from_numpy(
            np.stack([p[1] for p in pyr]))
        out[f"points_{side}_sub_idx"] = torch.from_numpy(
            np.stack([p[2] for p in pyr]))
        out[f"points_{side}_interp_idx"] = torch.from_numpy(
            np.stack([p[3] for p in pyr]))
    out["transform_gt"] = torch.from_numpy(
        np.stack([s["transform_gt"] for s in samples]))
    if pipeline == "label":
        out["labels_src"] = torch.from_numpy(
            np.stack([s["labels_src"] for s in samples])).long()
        out["labels_ref"] = torch.from_numpy(
            np.stack([s["labels_ref"] for s in samples])).long()
    if "matches" in samples[0]:
        out["matches"] = [s["matches"][:s["num_matches"]].astype(np.int64)
                          for s in samples]
    return out


def iter_batches(dataset, pipeline, batch_size, shuffle, seed, epoch):
    """Replays deepsir_tpu's Loader rng discipline (data/base.py:230-248):
    order = rng(seed+epoch).permutation, sample rng = (seed, epoch|0, idx) —
    so the reference consumes the SAME augmented sample stream the repo's
    training consumed."""
    n = len(dataset)
    order = np.arange(n)
    if shuffle:
        order = np.random.default_rng(seed + epoch).permutation(n)
    for start in range(0, n, batch_size):
        idxs = order[start:start + batch_size]
        samples = []
        for i in idxs:
            rng = np.random.default_rng(
                (seed, epoch if shuffle else 0, int(i)))
            samples.append(dataset.get_sample(int(i), rng))
        yield to_reference_batch(samples, pipeline)


# ---------------------------------------------------------------------------
# Stage runner — the reference train loop (train.py:390-488) in driver form
# ---------------------------------------------------------------------------

def partial_load(model: torch.nn.Module, state_dict: dict) -> int:
    """Key+shape-filtered restore (reference train.py:347-360)."""
    model_dict = model.state_dict()
    load = {k: v for k, v in state_dict.items()
            if k in model_dict and v.size() == model_dict[k].size()}
    model_dict.update(load)
    model.load_state_dict(model_dict)
    return len(load)


def compute_stage_loss(model, args, data, pred_transforms, endpoints):
    """The per-pipeline loss dispatch (reference train.py:403-426)."""
    endpoints["transform_gt"] = data["transform_gt"]
    endpoints["transform_pred"] = pred_transforms
    if args.pipeline == "align":
        endpoints["matches"] = data["matches"]
        return model.loss_align_fun(endpoints, reduction="mean")["total"]
    if args.pipeline == "feat":
        loss, _ = model.loss_feat_fun(endpoints)
        return loss
    endpoints["labels_src"] = data["labels_src"]
    endpoints["labels_ref"] = data["labels_ref"]
    loss, _ = model.loss_label_fun(endpoints)
    return loss


@torch.no_grad()
def eval_align(model, dataset, args, num_iter=5, log_every=16):
    """The reference eval protocol (test.py:358-457): per pair, 5 iterations,
    rte_rre per iteration slice. Returns (num_iter, n_pairs, 3) stats."""
    model.eval()
    rows = []
    for k, batch in enumerate(iter_batches(dataset, "align", 1, False, 0, 0)):
        pred_transforms, _ = model(batch, (num_iter, True))
        gt = batch["transform_gt"]
        per_iter = []
        for i in range(num_iter):
            t = pred_transforms[i][0].detach().numpy()
            per_iter.append(rte_rre(t, gt[0].numpy(),
                                    RTE_THRESH, RRE_THRESH))
        rows.append(per_iter)
        if (k + 1) % log_every == 0:
            arr = np.asarray(rows)          # (n, iters, 3)
            print(f"  eval {k + 1}/{len(dataset)}: succ/iter "
                  f"{arr[:, :, 0].mean(axis=0).round(3).tolist()}", flush=True)
    model.train()
    return np.asarray(rows).transpose(1, 0, 2)      # (iters, n, 3)


def run_stage(pipeline, epochs, train_size, init_state=None, seed=0,
              validate_every_epochs=0, val_dataset=None, out_dir=None,
              max_steps=None):
    args = reference_args(pipeline)
    model = Network(args)
    if pipeline == "label":
        # torch >= 2 requires cross_entropy weights of shape [C]; the
        # reference keeps them expand_dims'd to [1, C] (loss.py:911)
        model.loss_label_fun.class_weights = \
            model.loss_label_fun.class_weights.reshape(-1)
    loaded = 0
    if init_state is not None:
        loaded = partial_load(model, init_state)
    print(f"[{pipeline}] params="
          f"{sum(p.numel() for p in model.parameters())}, "
          f"loaded={loaded} tensors from previous stage", flush=True)

    cfg = repo_cfg(pipeline, train_size)
    dataset = SyntheticPairs(cfg, "train",
                             size=train_size if pipeline == "align" else 256)
    optimizer = torch.optim.Adam(
        (p for p in model.parameters() if p.requires_grad), lr=1e-3)
    model.train()

    best = {"score": -1.0, "state": None, "epoch": -1}
    step = 0
    t_start = time.time()
    for epoch in range(epochs):
        epoch_losses = []
        for data in iter_batches(dataset, pipeline, BATCH, True, seed, epoch):
            optimizer.zero_grad()
            pred_transforms, endpoints = model(data, (args.num_train_reg_iter,
                                                      False))
            loss = compute_stage_loss(model, args, data, pred_transforms,
                                      endpoints)
            if not np.isfinite(loss.item()):
                print(f"[{pipeline}] non-finite loss at step {step}; skipped",
                      flush=True)
                continue
            loss.backward()
            # NaN-grad guard + invalid-SVD skip (reference train.py:436-446)
            bad = any(p.grad is not None and torch.any(torch.isnan(p.grad))
                      for p in model.parameters())
            if not (bad or (pipeline == "align"
                            and endpoints["invalid_gradient"])):
                optimizer.step()
            epoch_losses.append(loss.item())
            step += 1
            if max_steps is not None and step >= max_steps:
                return model, {"steps": step,
                               "sec_per_step": (time.time() - t_start) / step}
        # staircase lr decay (reference train.py:38-48, update at epoch % 4)
        if (epoch + 1) % 4 == 0:
            for g in optimizer.param_groups:
                g["lr"] = max(g["lr"] * 0.98, 1e-4)
        print(f"[{pipeline}] epoch {epoch + 1}/{epochs} "
              f"loss={np.mean(epoch_losses):.4f} "
              f"({(time.time() - t_start) / 60:.1f} min)", flush=True)

        if (validate_every_epochs and val_dataset is not None
                and (epoch + 1) % validate_every_epochs == 0):
            stats = eval_align(model, val_dataset, args,
                               num_iter=args.num_reg_iter)
            succ = float(stats[-1, :, 0].mean())
            print(f"[{pipeline}] val succ (protocol slot) {succ:.3f}",
                  flush=True)
            if succ > best["score"]:
                best = {"score": succ, "epoch": epoch + 1,
                        "state": {k: v.clone() for k, v
                                  in model.state_dict().items()}}
            if out_dir:
                torch.save({"state_dict": model.state_dict(),
                            "epoch": epoch + 1},
                           os.path.join(out_dir, f"{pipeline}_last.pth"))

    if best["state"] is not None:
        print(f"[{pipeline}] restoring best val ckpt (epoch {best['epoch']}, "
              f"succ {best['score']:.3f})", flush=True)
        model.load_state_dict(best["state"])
    if out_dir:
        torch.save({"state_dict": model.state_dict()},
                   os.path.join(out_dir, f"{pipeline}_final.pth"))
    return model, {"epochs": epochs, "steps": step,
                   "minutes": (time.time() - t_start) / 60,
                   "best_val_succ": best["score"]}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--label_epochs", type=int, default=30)
    ap.add_argument("--feat_epochs", type=int, default=15)
    ap.add_argument("--align_epochs", type=int, default=80)
    ap.add_argument("--train_size", type=int, default=256)
    ap.add_argument("--eval_size", type=int, default=128)
    ap.add_argument("--out", type=str,
                    default=os.path.join(REPO, "logs_ref_synthetic"))
    ap.add_argument("--probe", action="store_true",
                    help="time a few steps of each stage and exit")
    ap.add_argument("--resume_stage", type=str, default=None,
                    choices=[None, "feat", "align", "eval"],
                    help="skip earlier stages, loading their _final.pth")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    if args.probe:
        for pipeline in ("label", "feat", "align"):
            _, info = run_stage(pipeline, 1, args.train_size, max_steps=3)
            print(f"[probe] {pipeline}: {info['sec_per_step']:.2f} s/step",
                  flush=True)
        return

    report = {"recipe": {
        "points": NUM_POINTS, "batch": BATCH, "thres_radius": THRES_RADIUS,
        "rot_mag": ROT_MAG, "trans_mag": TRANS_MAG,
        "label_epochs": args.label_epochs, "feat_epochs": args.feat_epochs,
        "align_epochs": args.align_epochs, "train_size": args.train_size,
        "eval_size": args.eval_size}}
    t0 = time.time()

    stages = ["label", "feat", "align", "eval"]
    start = stages.index(args.resume_stage) if args.resume_stage else 0
    state = None
    if start > 0:
        prev = {1: "label", 2: "feat", 3: "align"}[start]
        state = torch.load(os.path.join(args.out, f"{prev}_final.pth"),
                           map_location="cpu")["state_dict"]
        print(f"resuming after stage '{prev}'", flush=True)

    if start <= 0:
        model, info = run_stage("label", args.label_epochs, args.train_size)
        report["label"] = info
        state = model.state_dict()
        torch.save({"state_dict": state},
                   os.path.join(args.out, "label_final.pth"))
    if start <= 1:
        model, info = run_stage("feat", args.feat_epochs, args.train_size,
                                init_state=state)
        report["feat"] = info
        state = model.state_dict()
        torch.save({"state_dict": state},
                   os.path.join(args.out, "feat_final.pth"))
    if start <= 2:
        val_cfg = repo_cfg("align", args.train_size)
        val_set = SyntheticPairs(val_cfg, "val", size=64)
        model, info = run_stage("align", args.align_epochs, args.train_size,
                                init_state=state, validate_every_epochs=5,
                                val_dataset=val_set, out_dir=args.out)
        report["align"] = info
        state = model.state_dict()
        torch.save({"state_dict": state},
                   os.path.join(args.out, "align_final.pth"))

    # held-out eval: the same 128 test pairs the repo's numbers use
    eval_args = reference_args("align")
    model = Network(eval_args)
    partial_load(model, state)
    test_cfg = repo_cfg("align", args.train_size)
    test_set = SyntheticPairs(test_cfg, "test", size=args.eval_size)
    stats = eval_align(model, test_set, eval_args, num_iter=5)   # (5, n, 3)
    report["eval"] = {
        "n_pairs": int(stats.shape[1]),
        "succ_per_iter": stats[:, :, 0].mean(axis=1).round(4).tolist(),
        "rte_per_iter": stats[:, :, 1].mean(axis=1).round(4).tolist(),
        "rre_per_iter": stats[:, :, 2].mean(axis=1).round(4).tolist(),
        "protocol_succ": float(stats[-1, :, 0].mean()),
        "deployed_succ_depth2": float(stats[1, :, 0].mean()),
    }
    report["total_hours"] = (time.time() - t0) / 3600
    with open(os.path.join(REPO, "REFERENCE_QUALITY.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2), flush=True)


if __name__ == "__main__":
    main()
