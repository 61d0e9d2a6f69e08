"""Import a TRAINED reference .pth into a test.py-resumable checkpoint.

VERDICT r4 item 4: the weight-level parity tests (tests/test_torch_import.py)
validate the mapping module-by-module; this script produces the artifact for
the END-TO-END check — the reference's own trained align checkpoint
(logs_ref_label60/align_final.pth, reference load path
/root/reference/common/torch_utils.py:104-139) run through OUR eval driver
on the 128-pair protocol, to be compared against the torch reference's own
eval of the same checkpoint (REFERENCE_QUALITY_LABEL60_RUN.json /
scripts/eval_reference_robust.py).

The imported tree requires fc_norm='none' (BatchNorm folded into Dense) and
randla_skips='post' (the reference's pooled decoder skips); pass the same
flags to test.py when evaluating the artifact.

Runs on CPU in a few seconds:
    python scripts/import_reference_ckpt.py \
        --ckpt logs_ref_label60/align_final.pth \
        --outdir logs_r5/ref_import_ckpt
    python test.py --pipeline align --resume logs_r5/ref_import_ckpt/model_best.msgpack \
        --fc_norm none --randla_skips post --dataset_type Synthetic \
        --num_points 1024 --feat_len 3 --rot_mag 30 --trans_mag 1.0 \
        --thres_radius 0.9 --synthetic_eval_size 128 --clip_weight_thresh 0.05
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="logs_ref_label60/align_final.pth")
    ap.add_argument("--outdir", default="logs_r5/ref_import_ckpt")
    ap.add_argument("--num_points", type=int, default=1024)
    ap.add_argument("--feat_len", type=int, default=3)
    args = ap.parse_args()

    from deepsir_tpu.config import Config, ModelConfig
    from deepsir_tpu.data.base import Loader
    from deepsir_tpu.data.synthetic import SyntheticPairs
    from deepsir_tpu.training import (TrainState, batch_arrays_only,
                                      create_train_state)
    from deepsir_tpu.utils.checkpoint import CheckPointManager
    from deepsir_tpu.utils.torch_import import import_reference_checkpoint

    model_cfg = ModelConfig(feat_len=args.feat_len,
                            num_points=args.num_points,
                            fc_norm="none", randla_skips="post")
    cfg = Config(pipeline="align", model=model_cfg)
    ds = SyntheticPairs(cfg, split="test", size=1)
    example = batch_arrays_only(next(iter(Loader(ds, 1, shuffle=False,
                                                 num_workers=1))))
    _, state = create_train_state(cfg, example, seed=0)
    params = import_reference_checkpoint(args.ckpt, "align",
                                         params_template=state.params)
    state = TrainState(params, state.opt_state, state.step)

    os.makedirs(args.outdir, exist_ok=True)
    saver = CheckPointManager(args.outdir)
    path = saver.save(state, step=0, score=1.0)
    n_leaves = len(jax.tree_util.tree_leaves(params))
    print(f"imported {args.ckpt} -> {path} ({n_leaves} arrays); "
          f"evaluate with --fc_norm none --randla_skips post")


if __name__ == "__main__":
    main()
