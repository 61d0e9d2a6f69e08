"""End-to-end eval-driver parity on the imported reference checkpoint.

tests/test_torch_import.py proves the weight mapping module-by-module; this
test closes the remaining validation layer (round-4 VERDICT item 4): the
reference's TRAINED align checkpoint imported into our tree and run through
OUR eval path (inference_align -> evaluate_align — scoring, aggregation,
matching, iterative solve, metrics) must reproduce the torch reference
driver's own numbers on the identical synthetic pairs.

Anchor: scripts/eval_reference_robust.py --eval_size 2 --noise 0.01
--p_keep 1.0 --ckpt logs_ref_label60/align_final.pth (the reference's
model(batch, (5, True)) eval loop, reference test.py:358-457 semantics),
recorded in logs_r5/REFERENCE_IMPORT_2PAIR.json. The 8-pair run agreed to
4 decimals (succ 0.750 both, RRE 3.5040 vs 3.5044 deg, RTE 0.2593 both);
this 2-pair slice keeps suite cost down while exercising every stage under
real trained weights — exactly where an arithmetic-class bug (round 3's
matmul precision) would hide.
"""
from __future__ import annotations

import os

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CKPT = os.path.join(REPO, "logs_ref_label60", "align_final.pth")

pytestmark = pytest.mark.skipif(
    not os.path.exists(CKPT),
    reason="reference-trained align checkpoint not on disk")

# torch anchor (logs_r5/REFERENCE_IMPORT_2PAIR.json): final-iter means over
# the 2 pairs; per-iter succ [0, 1, 1, 1, 1]
TORCH_SUCC = 1.0
TORCH_RRE = 2.655869483947754
TORCH_RTE = 0.1458369940519333


def test_imported_reference_ckpt_matches_torch_eval():
    from deepsir_tpu.config import config_from_args, eval_argument_parser
    from deepsir_tpu.data.base import Loader
    from deepsir_tpu.data.datasets import get_test_dataset
    from deepsir_tpu.evaluation import evaluate_align, inference_align
    from deepsir_tpu.training import (batch_arrays_only, create_train_state,
                                      make_eval_step)
    from deepsir_tpu.utils.torch_import import import_reference_checkpoint

    args = eval_argument_parser().parse_args([
        "--pipeline", "align", "--dataset_type", "Synthetic",
        "--num_points", "1024", "--feat_len", "3", "--rot_mag", "30",
        "--trans_mag", "1.0", "--thres_radius", "0.9",
        "--synthetic_eval_size", "2", "--clip_weight_thresh", "0.05",
        "--fc_norm", "none", "--randla_skips", "post"])
    cfg = config_from_args(args)

    loader = Loader(get_test_dataset(cfg), 1, shuffle=False, num_workers=1)
    example = batch_arrays_only(next(iter(loader)))
    model, state = create_train_state(cfg, example, seed=0)
    params = import_reference_checkpoint(CKPT, "align",
                                         params_template=state.params)

    step = make_eval_step(cfg, model)
    pred, _ = inference_align(loader, step, params, cfg)
    _, summary = evaluate_align(pred, loader, cfg)

    assert summary["succ"] == TORCH_SUCC
    np.testing.assert_allclose(summary["err_r_deg_mean"], TORCH_RRE,
                               atol=0.02)
    np.testing.assert_allclose(summary["err_t_mean"], TORCH_RTE, atol=0.002)
