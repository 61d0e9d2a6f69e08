"""Benchmark: registration pairs/sec on the flagship align pipeline.

Protocol mirrors the reference eval driver (/root/reference/test.py:56,384:
batch 1, 18000 points, 5 registration iterations, inference mode), measured
end-to-end INCLUDING the on-device KNN index-pyramid build (which the
reference does on the host, untimed, in its collate_fn) and the host->device
transfer of every batch (the reference's torch-CPU baseline pays no transfer
at all, so counting ours keeps the comparison honest).

Measurement protocol (round 3 — replaces the threaded-prefetch stream):
DISTINCT host numpy batches are dispatched back-to-back with a scalar token
chained through `lax.optimization_barrier` from each call's output into the
next call's input, so call i+1 cannot complete before call i. One final
`jax.device_get` of the last token then provably fences the WHOLE stream
with a single host round-trip. This matters here because every weaker fence
is unsound on this relay-attached TPU (measured, CLAUDE.md):
  - `block_until_ready` returns at dispatch, not completion (509 "pairs/sec");
  - fetching only the last of N INDEPENDENT outputs leaves earlier calls
    in flight (completion is out-of-order through the relay);
  - fetching every output adds one ~30 ms relay RTT per pair of pure
    measurement overhead (11.6 "pairs/sec" where the chain reads 20).
Transfers still overlap compute: dispatch is async, so the relay copy of
batch i+1 rides along the device compute of batch i without any host
threads (the threaded device_prefetch was measured to STALL multi-second
against a flaky relay — pairs/sec collapsed 20 -> 0.25-3 with run-to-run
variance of 10x; see utils/prefetch.py docstring).

Matmul precision is the config default ("highest" — full fp32 fidelity).
Measured cost on this gather/HBM-bound forward: none (19.6-20.6 pairs/sec
at either precision); measured benefit: the entire round-2 "iteration
drift" (BASELINE.md — held-out success 0.69 -> 1.00 at the 5-iteration
protocol slot).

Baseline: the reference's pure-model forward measured on this machine by
scripts/measure_reference_baseline.py -> BASELINE_measured.json.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "sweep"}.
"""
from __future__ import annotations

import json
import os
import time

import numpy as np

N_POINTS = int(os.environ.get("DEEPSIR_BENCH_POINTS", 18000))
N_ITERS = 5
BATCHES = (1, 2, 4) if N_POINTS <= 18000 else (1,)
if os.environ.get("DEEPSIR_BENCH_BATCHES"):          # e.g. "1" or "1,2"
    BATCHES = tuple(int(b) for b in
                    os.environ["DEEPSIR_BENCH_BATCHES"].split(","))
TIMED_REPS = 16          # per trial; relay RTT spikes amortize over the chain
TRIALS = 3               # median-of-trials guards against one-off stalls


def main():
    import jax
    import jax.numpy as jnp
    # persistent cache: the first driver run pays the ~30s-per-config remote
    # compile; later runs start hot
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from deepsir_tpu.config import Config, ModelConfig, apply_matmul_precision
    from deepsir_tpu.models import ForwardOptions, Network
    from deepsir_tpu.training import device_batch

    # compute dtype knob for A/B runs (BASELINE.md fp32-vs-bf16 table);
    # default fp32 = the validated flagship configuration
    dtype = os.environ.get("DEEPSIR_BENCH_DTYPE", "float32")
    # two quality-gated opt-in perf knobs for A/B runs (BASELINE.md):
    # bf16 activations scoped to the inlier RandLA, and the coarse-refine
    # iteration split (iterations >=2 on every stride-th source point)
    model_cfg = ModelConfig(
        feat_len=4, num_points=N_POINTS,
        num_reg_iter=N_ITERS, compute_dtype=dtype,
        inlier_compute_dtype=os.environ.get("DEEPSIR_BENCH_INLIER_DTYPE",
                                            "float32"),
        refine_stride=int(os.environ.get("DEEPSIR_BENCH_REFINE_STRIDE", "1")),
        # neighbour truncation for the inlier RandLA (0 = full num_knn);
        # the registration scan's feature-gather rows scale with this
        inlier_num_knn=int(os.environ.get("DEEPSIR_BENCH_INLIER_KNN", "0")),
        # neighbour truncation for the backbone+scoring path (0 = full
        # num_knn) — perf probe for the ~20 ms backbone gather+conv chunk;
        # quality-sensitive (descriptor path), gate before any default use
        backbone_num_knn=int(
            os.environ.get("DEEPSIR_BENCH_BACKBONE_KNN", "0")),
        # truncated inlier pyramid depth (0 = full num_layers)
        inlier_num_layers=int(
            os.environ.get("DEEPSIR_BENCH_INLIER_LAYERS", "0")),
        # opt-in outlier-signal inlier channels, e.g. "dist" or "dist,recip"
        # (the round-4 robust-rung winner; 'recip' switches the matcher to
        # the fused bidirectional pass)
        inlier_extra_feats=os.environ.get("DEEPSIR_BENCH_EXTRA_FEATS", ""),
        # morton: host-side curve sort below + strided pyramid subsample +
        # windowed per-level KNN, exactly the data-layer contract
        pyramid_order=os.environ.get("DEEPSIR_BENCH_ORDER", "shuffled"))
    cfg = Config(pipeline="align", model=model_cfg)
    apply_matmul_precision(cfg)   # fp32-fidelity matmuls (the quality gap)

    model = Network(cfg.model, pipeline="align")
    opts = ForwardOptions(num_iter=N_ITERS, clip_weight=True,
                          refine_stride=model_cfg.refine_stride)

    rng = np.random.default_rng(0)

    # DEEPSIR_BENCH_TRANSFER=float16 halves the host->device relay bytes
    # but was MEASURED to cost registration quality (128-pair held-out
    # success 0.547 vs 0.688 at the 5-iter protocol — the correspondence
    # search is precision-sensitive, BASELINE.md), so fp32 stays default
    transfer = np.dtype(os.environ.get("DEEPSIR_BENCH_TRANSFER", "float32"))

    def make_arrays(batch):
        xyz = rng.normal(size=(batch, N_POINTS, 3)).astype(np.float32) * 10.0
        extra = rng.uniform(size=(batch, N_POINTS, 1)).astype(np.float32)
        pts = np.concatenate([xyz, extra], axis=-1)
        xyz2 = rng.normal(size=(batch, N_POINTS, 3)).astype(np.float32) * 10.0
        pts2 = np.concatenate(
            [xyz2, rng.uniform(size=(batch, N_POINTS, 1)).astype(np.float32)],
            axis=-1)
        if cfg.model.pyramid_order == "morton":
            # the data layer serves curve-sorted clouds in morton mode
            # (data/base.py); mirror it so the windowed KNN sees the same
            # locality structure it would in production
            from deepsir_tpu.ops.morton import morton_order_np
            pts = np.stack([c[morton_order_np(c[:, :3])] for c in pts])
            pts2 = np.stack([c[morton_order_np(c[:, :3])] for c in pts2])
        return {"points_src": pts.astype(transfer),
                "points_ref": pts2.astype(transfer),
                "transform_gt": np.tile(np.eye(3, 4, dtype=np.float32),
                                        (batch, 1, 1))}

    arrays1 = make_arrays(1)
    # jitted init: one compiled program instead of per-op remote dispatch
    params = jax.jit(lambda r, a: model.init(r, device_batch(cfg, a), opts))(
        jax.random.PRNGKey(0), arrays1)

    @jax.jit
    def fwd(params, arrays, token):
        # the barrier ties this call's inputs to the previous call's output
        # token: the chain makes the single final fence sound (see module
        # docstring) while leaving the h2d transfers free to overlap
        pts, tok = jax.lax.optimization_barrier(
            (jnp.asarray(arrays["points_src"]), token))
        batch = device_batch(cfg, dict(arrays, points_src=pts))
        transforms, out = model.apply(params, batch, opts, train=False)
        return transforms[-1], transforms[-1][0, 0, 0] + 0.0 * tok

    best = 0.0
    best_batch = 1
    sweep = {}

    for i, batch in enumerate(BATCHES):
        try:
            tok = jnp.float32(0.0)
            out, tok = fwd(params, make_arrays(batch), tok)  # compile + warm
            jax.device_get(tok)
            jax.device_get(out)        # warm the non-scalar d2h fetch path
            times = []
            for _ in range(TRIALS):
                feed = [make_arrays(batch) for _ in range(TIMED_REPS)]
                t0 = time.perf_counter()
                for arrays in feed:
                    out, tok = fwd(params, arrays, tok)
                jax.device_get(tok)    # fences the whole chained stream
                times.append((time.perf_counter() - t0) / TIMED_REPS)
            dt = sorted(times)[len(times) // 2]
        except Exception:
            if i == 0:
                raise                           # no silent zero-result bench
            break                               # e.g. HBM OOM at larger batch
        pps = batch / dt
        sweep[f"bs{batch}"] = round(pps, 4)
        if pps > best:
            best, best_batch = pps, batch

    baseline_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 "BASELINE_measured.json")
    ref_pps = 0.0479                            # measured 2026-08-16, torch CPU
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            ref_pps = json.load(f)["pairs_per_sec"]

    print(json.dumps({
        "metric": f"align_pairs_per_sec_{N_POINTS}pts_{N_ITERS}iters"
                  f"_bs{best_batch}",
        "value": round(best, 4),
        "unit": "pairs/sec/chip",
        "vs_baseline": round(best / ref_pps, 2),
        # the reference runs nowhere but CPU in this environment, so the
        # ratio is TPU-v5e vs torch-CPU — self-describing so the artifact
        # is not over-credited as a GPU comparison (BASELINE.md)
        "baseline": {"impl": "reference torch forward, CPU (only hardware "
                             "it runs on here)",
                     "pairs_per_sec": ref_pps},
        "sweep": sweep,
    }))


if __name__ == "__main__":
    main()
