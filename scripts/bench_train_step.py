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

    cfg = Config(pipeline="align", model=ModelConfig(
        feat_len=4, num_points=args.points,
        compute_dtype=args.compute_dtype)).resolved()
    apply_matmul_precision(cfg)

    rng = np.random.default_rng(0)
    b, n = args.batch, args.points

    def make_arrays():
        return {
            "points_src": np.concatenate(
                [rng.normal(size=(b, n, 3)).astype(np.float32) * 10,
                 rng.uniform(size=(b, n, 1)).astype(np.float32)], -1),
            "points_ref": np.concatenate(
                [rng.normal(size=(b, n, 3)).astype(np.float32) * 10,
                 rng.uniform(size=(b, n, 1)).astype(np.float32)], -1),
            "transform_gt": np.tile(np.eye(3, 4, dtype=np.float32),
                                    (b, 1, 1)),
        }

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
