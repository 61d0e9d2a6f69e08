"""MFU / roofline estimate for the flagship align forward on one TPU chip.

FLOP and byte counts come from XLA's own compiled-program cost analysis
(compile().cost_analysis() — the compiler's model of the program it actually
emitted), wall time from the bench protocol (host inputs, block_until_ready).
MFU = achieved FLOP/s over the chip's peak; the bytes/FLOP ratio against the
chip's HBM bandwidth says which roofline regime the program sits in.

v5e peak (public spec): 197 TFLOP/s bf16, ~98.5 TFLOP/s fp32-via-MXU,
819 GB/s HBM.

Writes the numbers to stdout; BASELINE.md records the result.

Usage: python scripts/mfu_estimate.py [--points 18000] [--batch 1] [--reps 3]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PEAK_BF16 = 197e12
PEAK_FP32 = 98.5e12
HBM_BW = 819e9


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=18000)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--compute_dtype", default="float32")
    args = ap.parse_args()

    import jax
    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from deepsir_tpu.config import Config, ModelConfig, apply_matmul_precision
    from deepsir_tpu.models import ForwardOptions, Network
    from deepsir_tpu.training import device_batch

    model_cfg = ModelConfig(feat_len=4, num_points=args.points,
                            num_reg_iter=args.iters,
                            compute_dtype=args.compute_dtype)
    cfg = Config(pipeline="align", model=model_cfg)
    apply_matmul_precision(cfg)
    model = Network(cfg.model, pipeline="align")
    opts = ForwardOptions(num_iter=args.iters, clip_weight=True)

    rng = np.random.default_rng(0)
    b, n = args.batch, args.points
    arrays = {
        "points_src": np.concatenate(
            [rng.normal(size=(b, n, 3)).astype(np.float32) * 10,
             rng.uniform(size=(b, n, 1)).astype(np.float32)], -1),
        "points_ref": np.concatenate(
            [rng.normal(size=(b, n, 3)).astype(np.float32) * 10,
             rng.uniform(size=(b, n, 1)).astype(np.float32)], -1),
        "transform_gt": np.tile(np.eye(3, 4, dtype=np.float32), (b, 1, 1)),
    }
    params = jax.jit(lambda r, a: model.init(r, device_batch(cfg, a), opts))(
        jax.random.PRNGKey(0), arrays)

    def fwd(params, arrays):
        batch = device_batch(cfg, arrays)
        transforms, out = model.apply(params, batch, opts, train=False)
        return transforms[-1], out.invalid

    compiled = jax.jit(fwd).lower(params, arrays).compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    flops = float(cost.get("flops", 0.0))
    bytes_acc = float(cost.get("bytes accessed", 0.0))

    out = compiled(params, arrays)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(args.reps):
        out = compiled(params, arrays)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / args.reps

    achieved = flops / dt
    peak = PEAK_BF16 if args.compute_dtype == "bfloat16" else PEAK_FP32
    print(json.dumps({
        "points": n, "batch": b, "iters": args.iters,
        "dtype": args.compute_dtype,
        "sec_per_call": round(dt, 4),
        "xla_flops": flops,
        "xla_bytes_accessed": bytes_acc,
        "achieved_tflops": round(achieved / 1e12, 3),
        "mfu_pct": round(100 * achieved / peak, 2),
        "hbm_bound_time_s": round(bytes_acc / HBM_BW, 4),
        "compute_bound_time_s": round(flops / peak, 4),
        "arithmetic_intensity_flop_per_byte": round(flops / max(bytes_acc, 1), 2),
    }, indent=2))


if __name__ == "__main__":
    main()
