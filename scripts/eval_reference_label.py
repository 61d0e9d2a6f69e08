"""Label-pipeline (semantic mIoU) eval of the TRAINED torch reference.

Extends the quality anchor (scripts/train_reference_synthetic.py,
REFERENCE_QUALITY.json) beyond the align pipeline: runs the reference's own
label inference + mIoU accumulation (/root/reference/test.py:507-567 via
SemanticLoss.add_data/semantic_metric, /root/reference/network/loss.py:962-989)
with its staged label checkpoint on the IDENTICAL held-out synthetic pairs the
repo's `test.py --pipeline label` evaluates, so both frameworks' semantic
numbers sit side by side in BASELINE.md.

Usage (CPU, ~10 min at 128 pairs):
    python scripts/eval_reference_label.py --eval_size 128
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from train_reference_synthetic import (  # noqa: E402
    Network, iter_batches, partial_load, reference_args, repo_cfg, REPO)

import torch  # noqa: E402

sys.path.insert(0, REPO)
from deepsir_tpu.data.synthetic import SyntheticPairs  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--eval_size", type=int, default=128)
    ap.add_argument("--ckpt", type=str, default=os.path.join(
        REPO, "logs_ref_synthetic", "label_final.pth"))
    ap.add_argument("--out", type=str, default=os.path.join(
        REPO, "REFERENCE_LABEL.json"))
    args = ap.parse_args()

    state = torch.load(args.ckpt, map_location="cpu")["state_dict"]
    model = Network(reference_args("label"))
    # torch >= 2 requires CE weights of shape [C]; the reference keeps them
    # expand_dims'd to [1, C] (loss.py:911) — same fix as the train harness
    model.loss_label_fun.class_weights = \
        model.loss_label_fun.class_weights.reshape(-1)
    partial_load(model, state)
    model.eval()

    cfg = repo_cfg("label", 256)
    test_set = SyntheticPairs(cfg, "test", size=args.eval_size)

    with torch.no_grad():
        for k, batch in enumerate(iter_batches(test_set, "label", 1,
                                               False, 0, 0)):
            _, endpoints = model(batch, (2, False))
            endpoints["labels_src"] = batch["labels_src"]
            endpoints["labels_ref"] = batch["labels_ref"]
            # accumulates the confusion matrix exactly like the reference's
            # inference_label (test.py:528-531)
            model.loss_label_fun(endpoints)
            if (k + 1) % 16 == 0:
                print(f"  {k + 1}/{len(test_set)}", flush=True)

    mean_iou, iou_list, mean_acc = model.loss_label_fun.semantic_metric()
    report = {
        "config": {"eval_size": args.eval_size, "ckpt": args.ckpt},
        "mean_iou": float(mean_iou),
        "mean_acc": float(mean_acc),
        "iou_per_class": np.asarray(iou_list).round(4).tolist(),
    }
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2), flush=True)


if __name__ == "__main__":
    main()
