"""Measure the reference's align-forward throughput to fill BASELINE.md.

The reference (LeoQLi/DeepSIR) publishes no numbers (BASELINE.md), so the
baseline is established by running its model. Its compiled data-layer deps
(torch_points_kernels, open3d) are absent here, so the RandLA index pyramid
is built with scipy exactly as its nn_search does
(/root/reference/dataloader/data_base.py:153-183): per level, knn(pc, pc, K),
pool idx = first N/r rows, sub = first N/r points, upsample = knn(sub, pc, 1),
all concatenated along the point axis.

Protocol matches the reference eval driver: batch 1, 18000 points, 5
registration iterations, no_grad (test.py:56,384,399-402). Results are
written to BASELINE_measured.json at the repo root.

Usage: python scripts/measure_reference_baseline.py [--pairs 3] [--points 18000]
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

REF = "/root/reference"
sys.path.insert(0, REF)


def reference_args(num_points: int):
    """Namespace with the reference's default flags (arguments.py:7-95)."""
    return types.SimpleNamespace(
        pipeline="align", feat_len=4, use_ppf=False,
        num_points=num_points, num_sub=-1, num_knn=16,
        sub_sampling_ratio=[4, 4, 4, 4], d_out=[16, 64, 128, 256],
        out_feat_dim=64, clip_weight_thresh=0.0,
        loss_type="mae", wt_ptDist_loss=1.0, wt_inlier_loss=1.0,
        wt_pose_loss=0.0, loss_discount_factor=0.5, thres_radius=0.9,
        det_loss_weight=1.0, chamfer_loss_weight=0.0, feat_loss_weight=0.0,
        no_slack=False, num_sk_iter=5,
        num_train_reg_iter=2, num_reg_iter=5)


def build_pyramid_np(xyz: np.ndarray, num_knn: int, ratios):
    """nn_search equivalent (data_base.py:153-183) with scipy KDTree."""
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
    cat = lambda xs: np.concatenate(xs, axis=0)
    return cat(pts), cat(neighs), cat(pools), cat(ups)


def make_batch(torch, num_points: int, num_knn: int, ratios, seed: int):
    rng = np.random.default_rng(seed)
    out = {}
    for side in ("src", "ref"):
        xyz = rng.normal(size=(num_points, 3)).astype(np.float32) * 10.0
        feats = np.concatenate(
            [xyz, rng.uniform(size=(num_points, 1)).astype(np.float32)], 1)
        pts, ni, pi, ui = build_pyramid_np(xyz, num_knn, ratios)
        out[f"points_{side}"] = torch.from_numpy(feats)[None]
        out[f"points_{side}_xyz"] = torch.from_numpy(pts)[None]
        out[f"points_{side}_neigh_idx"] = torch.from_numpy(ni)[None]
        out[f"points_{side}_sub_idx"] = torch.from_numpy(pi)[None]
        out[f"points_{side}_interp_idx"] = torch.from_numpy(ui)[None]
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=3)
    ap.add_argument("--points", type=int, default=18000)
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    import torch
    torch.set_num_threads(os.cpu_count() or 1)   # give the baseline all cores
    from network.model import Network

    ref_args = reference_args(args.points)
    model = Network(ref_args)
    model.eval()
    n_params = sum(p.numel() for p in model.parameters())

    times = []
    with torch.no_grad():
        for i in range(args.pairs + 1):
            data = make_batch(torch, args.points, ref_args.num_knn,
                              ref_args.sub_sampling_ratio, seed=i)
            t0 = time.perf_counter()
            transforms, endpoints = model(data, (args.iters, True))
            dt = time.perf_counter() - t0
            if i > 0:                     # skip warm-up
                times.append(dt)
            print(f"pair {i}: {dt:.2f}s  (warmup={i == 0})")

    sec_per_pair = float(np.mean(times))
    result = {
        "what": "reference align forward, torch CPU, batch 1, "
                f"{args.points} pts, {args.iters} reg iters, no_grad",
        "sec_per_pair": sec_per_pair,
        "pairs_per_sec": 1.0 / sec_per_pair,
        "num_params": n_params,
        "torch_threads": torch.get_num_threads(),
        "pairs_measured": len(times),
    }
    out_path = os.path.join(os.path.dirname(__file__), "..",
                            "BASELINE_measured.json")
    with open(out_path, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
