"""Robust-rung eval of the TRAINED torch reference, with an ICP polish.

The repo's best robustness configuration (BASELINE.md round 3) combines the
relaxed mutual gate with the opt-in ICP post-refinement. The reference has
the SAME off-by-default ICP knob (/root/reference/test.py:247-264), but its
Open3D backend is absent on this machine — so for a fair table we grant the
reference the repo's own ICP (ops/icp.py::icp_np, C++ kd-tree path) at the
identical settings the repo's eval uses (max_corr_dist = voxel_size * 2,
evaluation.py::pose_optimization). Reports both raw and ICP-polished
protocol numbers on the identical held-out rung.

Usage (CPU, ~10 min at 64 pairs):
    python scripts/eval_reference_robust.py --eval_size 64 \
        --noise 0.02 --p_keep 0.7
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from train_reference_synthetic import (  # noqa: E402
    Network, iter_batches, partial_load, reference_args, repo_cfg, rte_rre,
    REPO, RTE_THRESH, RRE_THRESH)

import torch  # noqa: E402

sys.path.insert(0, REPO)
from deepsir_tpu.data.synthetic import SyntheticPairs  # noqa: E402
from deepsir_tpu.ops.icp import icp_np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--eval_size", type=int, default=64)
    ap.add_argument("--noise", type=float, default=0.02)
    ap.add_argument("--p_keep", type=float, default=0.7)
    ap.add_argument("--rot_mag", type=float, default=None,
                    help="override the GT rotation magnitude (deg) — the "
                         "extrapolation-rung knob; default keeps the trained "
                         "30 deg so recorded rungs are unchanged")
    ap.add_argument("--ckpt", type=str, default=os.path.join(
        REPO, "logs_ref_synthetic", "align_final.pth"))
    ap.add_argument("--num_iter", type=int, default=5)
    ap.add_argument("--out", type=str, default=os.path.join(
        REPO, "REFERENCE_ROBUST.json"))
    args = ap.parse_args()

    state = torch.load(args.ckpt, map_location="cpu")["state_dict"]
    model = Network(reference_args("align"))
    partial_load(model, state)
    model.eval()

    cfg = repo_cfg("align", 256)
    if args.rot_mag is not None:
        # rot_mag IS read off cfg.data inside get_pair (unlike noise/p_keep),
        # so a replace() before constructing the dataset takes effect
        from deepsir_tpu.config import replace
        cfg = replace(cfg, data=replace(cfg.data, rot_mag=args.rot_mag))
    # noise/p_keep are constructor kwargs — SyntheticPairs does NOT read
    # them off cfg.data (the CLI dataset factory forwards them; a cfg
    # replace() here would be silently ignored)
    test_set = SyntheticPairs(cfg, "test", size=args.eval_size,
                              noise=args.noise, p_keep=args.p_keep)
    corres_dist = cfg.data.voxel_size * 2          # = the repo eval's setting

    raw_rows, icp_rows = [], []
    for k, batch in enumerate(iter_batches(test_set, "align", 1, False, 0, 0)):
        with torch.no_grad():
            pred_transforms, _ = model(batch, (args.num_iter, True))
        gt = batch["transform_gt"][0].numpy()
        raw_rows.append([
            rte_rre(pred_transforms[i][0].detach().numpy(), gt,
                    RTE_THRESH, RRE_THRESH)
            for i in range(args.num_iter)])
        src = batch["points_src"][0, :, :3].numpy().astype(np.float64)
        ref = batch["points_ref"][0, :, :3].numpy().astype(np.float64)
        final = pred_transforms[-1][0].detach().numpy()
        polished = icp_np(src, ref, corres_dist, init=final, max_iter=30)
        icp_rows.append(rte_rre(polished[:3].astype(np.float32), gt,
                                RTE_THRESH, RRE_THRESH))
        if (k + 1) % 16 == 0:
            a = np.asarray(raw_rows)
            print(f"  {k + 1}/{len(test_set)}: raw protocol succ "
                  f"{a[:, -1, 0].mean():.3f}  icp "
                  f"{np.asarray(icp_rows)[:, 0].mean():.3f}", flush=True)

    raw = np.asarray(raw_rows)            # (n, iters, 3)
    icp = np.asarray(icp_rows)            # (n, 3)
    report = {
        "config": {"eval_size": args.eval_size, "noise": args.noise,
                   "p_keep": args.p_keep, "rot_mag": args.rot_mag,
                   "ckpt": args.ckpt,
                   "icp_max_corr_dist": corres_dist, "icp_iters": 30},
        "raw": {
            "succ_per_iter": raw[:, :, 0].mean(axis=0).round(4).tolist(),
            "protocol_succ": float(raw[:, -1, 0].mean()),
            "protocol_rte": float(raw[:, -1, 1].mean()),
            "protocol_rre": float(raw[:, -1, 2].mean()),
        },
        "icp_polished": {
            "succ": float(icp[:, 0].mean()),
            "rte": float(icp[:, 1].mean()),
            "rre": float(icp[:, 2].mean()),
        },
    }
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2), flush=True)


if __name__ == "__main__":
    main()
