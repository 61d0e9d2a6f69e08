#!/usr/bin/env python
"""Evaluation driver — same CLI surface as the reference's test.py
(/root/reference/test.py): loads a checkpoint (or a precomputed transform
file), runs the selected pipeline over the test set, computes per-iteration
metrics and persists artifacts (stats npz, pred_transforms.npy, metric
tables, summary json).

NOTE: this is the *evaluation harness* (as in the reference); unit tests
live in tests/.

Usage mirrors the reference, e.g.:
  python test.py --pipeline align --dataset_type KITTI --resume ckpt.msgpack
  python test.py --pipeline align --transform_file pred_transforms.npy
  python test.py --pipeline align --dataset_type Synthetic   # random init
"""
from __future__ import annotations

import os
import re
import sys

import numpy as np

from deepsir_tpu.config import config_from_args, eval_argument_parser
from deepsir_tpu.data.base import Loader
from deepsir_tpu.data.datasets import get_test_dataset
from deepsir_tpu.evaluation import (evaluate_align, inference_align,
                                    inference_feat, inference_label,
                                    save_eval_align)
from deepsir_tpu.training import (batch_arrays_only, create_train_state,
                                  make_eval_step, make_forward_step)
from deepsir_tpu.utils.checkpoint import CheckPointManager
from deepsir_tpu.utils.logging import prepare_logger

BATCH_SIZE = 1       # inference protocol (reference test.py:56)
NUM_WORKERS = 4


def derive_save_path(cfg) -> str:
    """Save dir from the checkpoint name (reference test.py:572-593)."""
    if cfg.train.resume:
        m = re.search(r"(\d{6}_\d{6}).*model[_-]?(\w*)", cfg.train.resume)
        if m:
            return os.path.join(cfg.eval.eval_save_path,
                                f"{m.group(1)}_{m.group(2)}")
        base = os.path.splitext(os.path.basename(cfg.train.resume))[0]
        return os.path.join(cfg.eval.eval_save_path, base)
    return os.path.join(cfg.eval.eval_save_path, "random_init")


def main():
    args = eval_argument_parser().parse_args()
    cfg = config_from_args(args)
    from deepsir_tpu.config import apply_matmul_precision
    apply_matmul_precision(cfg)
    save_path = derive_save_path(cfg)
    os.makedirs(save_path, exist_ok=True)
    logger, _ = prepare_logger(cfg, log_path=save_path)

    test_set = get_test_dataset(cfg)
    loader = Loader(test_set, BATCH_SIZE, shuffle=False,
                    num_workers=NUM_WORKERS)
    logger.info("Test set: %d pairs", len(test_set))

    if cfg.eval.transform_file:
        # precomputed-transform mode: no model at all (reference test.py:602-605)
        pred = np.load(cfg.eval.transform_file)
        metrics, summary = evaluate_align(pred, loader, cfg)
        save_eval_align(pred, {}, metrics, summary, save_path)
        return

    example = batch_arrays_only(next(iter(loader)))
    model, state = create_train_state(cfg, example, seed=0)
    if cfg.train.resume:
        saver = CheckPointManager(os.path.dirname(cfg.train.resume) or ".")
        state, step = saver.load(cfg.train.resume, state)
        logger.info("Restored checkpoint at step %d", step)
    else:
        logger.warning("No --resume given: evaluating RANDOM weights")

    if cfg.pipeline == "align":
        eval_step = make_eval_step(
            cfg, model, refine_stride=cfg.model.refine_stride)
        pred, endpoints = inference_align(
            loader, eval_step, state.params, cfg,
            stats_path=os.path.join(save_path, "stats.npz"))
        metrics, summary = evaluate_align(pred, loader, cfg)
        save_eval_align(pred, endpoints, metrics, summary, save_path)
    elif cfg.pipeline == "feat":
        fwd = make_forward_step(cfg, model)
        inference_feat(loader, fwd, state.params, cfg, save_path)
    else:
        fwd = make_forward_step(cfg, model)
        inference_label(loader, fwd, state.params, cfg, save_path)


if __name__ == "__main__":
    main()
