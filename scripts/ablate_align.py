"""Wall-clock ablation of the align forward's stages on the real chip.

Times (with host inputs + block_until_ready, the only trustworthy recipe
here — see CLAUDE.md) separately-jitted subgraphs:
  pyramid      on-device KNN index pyramid for both clouds
  backbone     fused src+ref RandLA pass + scoring
  match_x5     aggregation + correspondence search x num_iter
  inlier_x5    inlier RandLA + Kabsch x num_iter
  full         the whole align forward
Stage sums exceed `full` where XLA overlaps/fuses across stages; the deltas
still rank where optimization effort pays.

Usage: python scripts/ablate_align.py [--points 18000]
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
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--compute_dtype", default="float32")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from deepsir_tpu.config import Config, ModelConfig, apply_matmul_precision
    from deepsir_tpu.models import ForwardOptions, Network
    from deepsir_tpu.ops.distance import nearest_neighbour_index
    from deepsir_tpu.ops.gather import gather_points
    from deepsir_tpu.ops.pyramid import build_pyramid
    from deepsir_tpu.ops.svd3 import weighted_kabsch
    from deepsir_tpu.training import device_batch

    m = ModelConfig(feat_len=4, num_points=args.points,
                    num_reg_iter=args.iters, compute_dtype=args.compute_dtype)
    cfg = Config(pipeline="align", model=m)
    apply_matmul_precision(cfg)
    model = Network(cfg.model, pipeline="align")
    opts = ForwardOptions(num_iter=args.iters, clip_weight=True)

    rng = np.random.default_rng(0)
    n = args.points
    arrays = {
        "points_src": np.concatenate(
            [rng.normal(size=(1, n, 3)).astype(np.float32) * 10,
             rng.uniform(size=(1, n, 1)).astype(np.float32)], -1),
        "points_ref": np.concatenate(
            [rng.normal(size=(1, n, 3)).astype(np.float32) * 10,
             rng.uniform(size=(1, n, 1)).astype(np.float32)], -1),
        "transform_gt": np.tile(np.eye(3, 4, dtype=np.float32), (1, 1, 1)),
    }
    params = jax.jit(lambda r, a: model.init(r, device_batch(cfg, a), opts))(
        jax.random.PRNGKey(0), arrays)

    def readback(out):
        # forced one-element readback barrier: block_until_ready returns
        # early through the relay (async completion illusion, CLAUDE.md);
        # pulling ONE element through the host is the only reliable fence
        leaf = jax.tree_util.tree_leaves(out)[0]
        jax.device_get(leaf.ravel()[0])

    def timed(name, fn, *a):
        readback(fn(*a))                      # compile + warm
        t0 = time.perf_counter()
        for _ in range(args.reps):
            readback(fn(*a))
        dt = (time.perf_counter() - t0) / args.reps
        print(f"{name:12s} {dt * 1e3:8.2f} ms")
        return dt

    @jax.jit
    def pyramid_only(arrays):
        src = jnp.asarray(arrays["points_src"])[..., :3]
        ref = jnp.asarray(arrays["points_ref"])[..., :3]
        p1 = build_pyramid(src, m.num_knn, m.sub_sampling_ratio,
                           recall_target=m.knn_recall_target)
        p2 = build_pyramid(ref, m.num_knn, m.sub_sampling_ratio,
                           recall_target=m.knn_recall_target)
        return p1.neigh_idx[0], p2.neigh_idx[0]

    @jax.jit
    def backbone_only(params, arrays):
        batch = device_batch(cfg, arrays)
        fs, ls, fr, lr, _, _ = model.apply(
            params, batch, False, method=Network.backbone_pair)
        return fs, fr

    @jax.jit
    def match_only(params, arrays):
        batch = device_batch(cfg, arrays)
        fs, ls, fr, lr, _, _ = model.apply(
            params, batch, False, method=Network.backbone_pair)
        idx = None
        for _ in range(args.iters):
            idx = nearest_neighbour_index(fs, fr)
            fs = fs + 1e-6                      # defeat CSE across iterations
        return idx

    @jax.jit
    def kabsch_only(arrays):
        src = jnp.asarray(arrays["points_src"])[..., :3]
        ref = jnp.asarray(arrays["points_ref"])[..., :3]
        tf = None
        for i in range(args.iters):
            tf, bad = weighted_kabsch(src, ref, jnp.abs(src[..., 0]) + i)
        return tf

    @jax.jit
    def full(params, arrays):
        batch = device_batch(cfg, arrays)
        transforms, out = model.apply(params, batch, opts, train=False)
        return transforms[-1], out.invalid

    @jax.jit
    def transfer_only(arrays):
        return (jnp.sum(jnp.asarray(arrays["points_src"])) +
                jnp.sum(jnp.asarray(arrays["points_ref"])))

    timed("transfer", transfer_only, arrays)
    timed("pyramid", pyramid_only, arrays)
    timed("backbone+py", backbone_only, params, arrays)
    timed("match_x5+bb", match_only, params, arrays)
    timed("kabsch_x5", kabsch_only, arrays)
    timed("full", full, params, arrays)


if __name__ == "__main__":
    main()
