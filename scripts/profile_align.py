"""Profile the flagship align forward on the real chip and print the op-level
time breakdown.

Captures a jax.profiler trace around warmed-up forward calls, then parses the
.xplane.pb directly (tensorboard is not available in this environment; the
protobuf schema ships with tensorflow.tsl) and aggregates device self-time by
HLO op category. This is the ONLY trustworthy per-op timing source here —
wall-clocking individual jitted ops through the relay reports bogus sub-ms
times (see CLAUDE.md).

Usage: python scripts/profile_align.py [--points 18000] [--batch 1]
       [--compute_dtype float32]
"""
from __future__ import annotations

import argparse
import glob
import os
import sys
from collections import defaultdict

import numpy as np

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def capture(args, trace_dir):
    import jax
    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from deepsir_tpu.config import Config, ModelConfig, apply_matmul_precision
    from deepsir_tpu.models import ForwardOptions, Network
    from deepsir_tpu.training import device_batch

    cfg = Config(pipeline="align", model=ModelConfig(
        feat_len=4, num_points=args.points, num_reg_iter=args.iters,
        compute_dtype=args.compute_dtype))
    from deepsir_tpu.config import replace
    if args.matmul_precision:
        cfg = replace(cfg, model=replace(cfg.model,
                                         matmul_precision=args.matmul_precision))
    if args.pyramid_order != "shuffled":
        cfg = replace(cfg, model=replace(cfg.model,
                                         pyramid_order=args.pyramid_order,
                                         knn_window_halo=args.halo))
    if args.inlier_compute_dtype != "float32":
        cfg = replace(cfg, model=replace(
            cfg.model, inlier_compute_dtype=args.inlier_compute_dtype))
    if args.mutual_check:
        cfg = replace(cfg, model=replace(cfg.model, mutual_check=True))
    if args.inlier_num_knn:
        cfg = replace(cfg, model=replace(
            cfg.model, inlier_num_knn=args.inlier_num_knn))
    if args.inlier_num_layers:
        # perf probe for the truncated inlier pyramid: device time is
        # weight-independent, so a random-init profile predicts the gain
        # before any retrain
        cfg = replace(cfg, model=replace(
            cfg.model, inlier_num_layers=args.inlier_num_layers))
    if args.backbone_num_knn:
        cfg = replace(cfg, model=replace(
            cfg.model, backbone_num_knn=args.backbone_num_knn))
    apply_matmul_precision(cfg)
    model = Network(cfg.model, pipeline="align")
    opts = ForwardOptions(num_iter=args.iters, clip_weight=True,
                          refine_stride=args.refine_stride)
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
    if cfg.model.pyramid_order == "morton":
        from deepsir_tpu.ops.morton import morton_order_np
        for key in ("points_src", "points_ref"):
            for bb in range(b):
                arrays[key][bb] = arrays[key][bb][
                    morton_order_np(arrays[key][bb, :, :3])]
    params = jax.jit(lambda r, a: model.init(r, device_batch(cfg, a), opts))(
        jax.random.PRNGKey(0), arrays)

    @jax.jit
    def fwd(params, arrays):
        batch = device_batch(cfg, arrays)
        transforms, out = model.apply(params, batch, opts, train=False)
        return transforms[-1], out.invalid

    # stage inputs on device BEFORE tracing: the trace then contains pure
    # device compute, with no host-relay copy-start spans inflating totals
    arrays = jax.device_put(arrays)
    jax.block_until_ready(fwd(params, arrays))          # compile + warm
    jax.profiler.start_trace(trace_dir)
    for _ in range(args.reps):
        out = fwd(params, arrays)
    jax.block_until_ready(out)
    jax.profiler.stop_trace()


def summarize(trace_dir, reps):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                      recursive=True)
    assert paths, f"no xplane under {trace_dir}"
    by_name = defaultdict(float)
    total = 0.0
    # (start, end) intervals per trace line, for the union-based busy figure
    sync_iv, async_iv = [], []
    for path in paths:
        xs = xplane_pb2.XSpace()
        with open(path, "rb") as f:
            xs.ParseFromString(f.read())
        for plane in xs.planes:
            if "TPU" not in plane.name and "tpu" not in plane.name:
                continue
            ev_meta = plane.event_metadata
            for line in plane.lines:
                if "XLA Ops" not in line.name:
                    continue
                # event offsets are relative to the LINE's base timestamp —
                # rebase to absolute picoseconds so the union over multiple
                # lines/planes/files (multi-core traces) merges intervals on
                # one time axis instead of silently overlapping different
                # bases
                base_ps = line.timestamp_ns * 1000
                for ev in line.events:
                    name = ev_meta[ev.metadata_id].name
                    dur = ev.duration_ps / 1e12
                    by_name[name] += dur
                    total += dur
                    iv = (base_ps + ev.offset_ps,
                          base_ps + ev.offset_ps + ev.duration_ps)
                    if "-start" in name or "-done" in name:
                        async_iv.append(iv)
                    else:
                        sync_iv.append(iv)

    def union_len(iv):
        iv.sort()
        tot = 0
        cur_s = cur_e = None
        for s, e in iv:
            if cur_s is None:
                cur_s, cur_e = s, e
            elif s <= cur_e:
                cur_e = max(cur_e, e)
            else:
                tot += cur_e - cur_s
                cur_s, cur_e = s, e
        if cur_s is not None:
            tot += cur_e - cur_s
        return tot / 1e12

    # The per-op duration SUM double-counts twice over: (a) wrapper events
    # (%while scan spans cover their own body ops on the same line — observed
    # +42 ms/call phantom busy from the registration scan wrapper alone), and
    # (b) async copy/slice -start events that span their whole in-flight
    # window, overlapping the compute they hide behind. The headline busy is
    # therefore the INTERVAL UNION of non-async events; async DMA span union
    # is reported separately (it mostly overlaps compute).
    busy = union_len(sync_iv)
    async_spans = union_len(async_iv)
    print(f"\ndevice busy (interval union, excl. async DMA): "
          f"{busy / reps * 1e3:.2f} ms/call ({reps} calls); "
          f"async DMA span union {async_spans / reps * 1e3:.2f} ms/call; "
          f"naive duration sum {total / reps * 1e3:.2f} ms/call "
          f"(double-counts wrapper + async spans — do not quote)")

    def bucket(name):
        for key in ("fusion", "dynamic-slice", "gather", "scatter", "dot",
                    "convolution", "all-reduce", "copy", "transpose", "sort",
                    "reduce", "custom-call", "select", "iota", "broadcast"):
            if key in name:
                return key
        return name.split(".")[0]

    by_bucket = defaultdict(float)
    for name, dur in by_name.items():
        by_bucket[bucket(name)] += dur
    print("\n-- by op category --")
    for name, dur in sorted(by_bucket.items(), key=lambda kv: -kv[1])[:12]:
        print(f"{dur / total * 100:6.2f}%  {dur / reps * 1e3:9.3f} ms  {name}")
    print("\n-- top individual ops --")
    for name, dur in sorted(by_name.items(), key=lambda kv: -kv[1])[:25]:
        print(f"{dur / total * 100:6.2f}%  {dur / reps * 1e3:9.3f} ms  {name[:90]}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=18000)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--compute_dtype", default="float32")
    ap.add_argument("--matmul_precision", default=None,
                    choices=["default", "high", "highest"],
                    help="override the config default for A/B profiling")
    ap.add_argument("--pyramid_order", default="shuffled",
                    choices=["shuffled", "morton"])
    ap.add_argument("--halo", type=int, default=1)
    ap.add_argument("--inlier_compute_dtype", default="float32",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--refine_stride", type=int, default=1)
    ap.add_argument("--inlier_num_layers", type=int, default=0)
    ap.add_argument("--inlier_num_knn", type=int, default=0)
    ap.add_argument("--backbone_num_knn", type=int, default=0)
    ap.add_argument("--mutual_check", action="store_true")
    ap.add_argument("--trace_dir", default="/tmp/deepsir_trace")
    args = ap.parse_args()
    # ALWAYS start from an empty dir: summarize() sums every xplane file it
    # finds recursively, so stale traces from previous runs would silently
    # inflate and pollute the breakdown (observed: a round-2 bf16 ablation
    # trace doubling every scan and adding bf16 ops to an fp32 profile)
    import shutil
    shutil.rmtree(args.trace_dir, ignore_errors=True)
    os.makedirs(args.trace_dir, exist_ok=True)
    capture(args, args.trace_dir)
    summarize(args.trace_dir, args.reps)
