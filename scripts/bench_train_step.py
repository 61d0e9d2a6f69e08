"""Train-step wall time at the full 18000-point protocol scale.

One jitted step = pyramid build + 3 RandLA passes x num_train_reg_iter +
matching + Kabsch + loss + grads + Adam update. Measured with streamed host
batches through the drivers' device prefetcher (utils/prefetch.py), final
block_until_ready fence — the same recipe as bench.py.

Usage: python scripts/bench_train_step.py [--points 18000] [--reps 8]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=18000)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--compute_dtype", default="float32")
    ap.add_argument("--pipeline", default="align",
                    choices=["align", "feat", "label"])
    ap.add_argument("--circle_loss_tile", type=int, default=0,
                    help="feat pipeline: stream the circle loss in tiles of "
                         "this many positive columns (0 = materialize; at "
                         "18000 pts the materialized matrices are ~1.3 GB "
                         "each per batch element)")
    ap.add_argument("--num_sub", type=int, default=-1,
                    help="feat pipeline: top-k keypoint sub-selection")
    args = ap.parse_args()

    import jax
    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from deepsir_tpu.config import Config, ModelConfig, apply_matmul_precision
    from deepsir_tpu.training import (create_train_state, make_optimizer,
                                      make_train_step)
    from deepsir_tpu.utils.prefetch import device_prefetch

    from deepsir_tpu.config import replace
    cfg = Config(pipeline=args.pipeline, model=ModelConfig(
        feat_len=4, num_points=args.points, num_sub=args.num_sub,
        compute_dtype=args.compute_dtype)).resolved()
    if args.circle_loss_tile:
        cfg = replace(cfg, loss=replace(
            cfg.loss, circle_loss_tile=args.circle_loss_tile))
    apply_matmul_precision(cfg)

    rng = np.random.default_rng(0)
    b, n = args.batch, args.points

    def make_arrays():
        arrays = {
            "points_src": np.concatenate(
                [rng.normal(size=(b, n, 3)).astype(np.float32) * 10,
                 rng.uniform(size=(b, n, 1)).astype(np.float32)], -1),
            "points_ref": np.concatenate(
                [rng.normal(size=(b, n, 3)).astype(np.float32) * 10,
                 rng.uniform(size=(b, n, 1)).astype(np.float32)], -1),
            "transform_gt": np.tile(np.eye(3, 4, dtype=np.float32),
                                    (b, 1, 1)),
        }
        if args.pipeline == "label":
            arrays["labels_src"] = rng.integers(
                0, 19, size=(b, n)).astype(np.int32)
            arrays["labels_ref"] = rng.integers(
                0, 19, size=(b, n)).astype(np.int32)
        return arrays

    model, state = create_train_state(cfg, make_arrays(), steps_per_epoch=100)
    tx = make_optimizer(cfg, 100)
    step = make_train_step(cfg, model, tx)

    key = jax.random.PRNGKey(0)
    state, aux = step(state, make_arrays(), key)            # compile + warm
    jax.block_until_ready(aux["loss"])

    feed = [make_arrays() for _ in range(args.reps)]
    t0 = time.perf_counter()
    for dev in device_prefetch(feed):
        key, sub = jax.random.split(key)
        state, aux = step(state, dev, sub)
    jax.block_until_ready(aux["loss"])
    dt = (time.perf_counter() - t0) / args.reps
    print(f"train step {args.points} pts bs{b} {args.compute_dtype}: "
          f"{dt:.4f} s/step ({b / dt:.2f} pairs/sec)")


if __name__ == "__main__":
    main()
