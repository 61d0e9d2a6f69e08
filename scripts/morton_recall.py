"""Derisk windowed KNN: recall of a curve-rank-windowed exact KNN vs full
exact KNN, on Morton-ordered synthetic clouds at the protocol shapes.

The planned kernel geometry (ops/pallas_knn.py windowed mode): query tile i
(TQ rows) searches only value blocks [i*s - h, i*s + h] of VB rows each,
where s = VB-blocks per query tile after level-ratio scaling. This script
measures, per pyramid level and for the cross-level k=1 interp search, the
fraction of true neighbours that fall inside that window — the recall
ceiling of the windowed kernel — for a range of halos h.

Run on CPU (numpy only). Informs the default `gather_window_halo`.
"""
from __future__ import annotations

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")
from deepsir_tpu.ops.morton import hilbert_order_np, morton_order_np  # noqa: E402

TQ = 128
VB = 128   # overridden by --vb


def synthetic_cloud(rng, n):
    """Rough stand-in for the protocol clouds: multi-scale blobs + planes
    (spatially non-uniform, like voxelized LiDAR)."""
    parts = []
    n_blob = n // 2
    centers = rng.uniform(-20, 20, size=(24, 3))
    for c in np.array_split(np.arange(n_blob), 24):
        parts.append(rng.normal(0, 1.5, size=(len(c), 3))
                     + centers[rng.integers(24)])
    ground = rng.uniform(-30, 30, size=(n - n_blob, 3))
    ground[:, 2] = rng.normal(0, 0.2, size=n - n_blob)
    parts.append(ground)
    return np.concatenate(parts).astype(np.float32)


def exact_knn(query, ref, k):
    from scipy.spatial import cKDTree
    t = cKDTree(ref)
    _, idx = t.query(query, k=k)
    return idx.reshape(len(query), k)


def windowed_recall(true_idx, nq, nr, halo):
    """Recall of exact-KNN-restricted-to-window vs full exact KNN.

    Window geometry shared with the planned kernels: query tile i reads
    2*halo+1 value blocks of VB rows centred (in value-row space) on the
    tile's scaled midpoint, clamped to the array."""
    n_tiles = (nq + TQ - 1) // TQ
    nr_blocks = (nr + VB - 1) // VB
    width = 2 * halo + 1
    hits = 0
    for i in range(n_tiles):
        qs, qe = i * TQ, min((i + 1) * TQ, nq)
        c = ((i + 0.5) * TQ * nr / nq) / VB          # float centre block
        b0 = int(np.clip(np.floor(c - width / 2 + 0.5), 0,
                         max(nr_blocks - width, 0)))
        lo, hi = b0 * VB, min((b0 + width) * VB, nr)
        t = true_idx[qs:qe]
        hits += int(((t >= lo) & (t < hi)).sum())
    return hits / true_idx.size


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=18000)
    ap.add_argument("--k", type=int, default=16)
    ap.add_argument("--clouds", type=int, default=4)
    ap.add_argument("--halos", type=int, nargs="+", default=[1, 2, 4, 8, 16])
    ap.add_argument("--vb", type=int, default=128)
    ap.add_argument("--order", default="morton",
                    choices=["morton", "hilbert"])
    ap.add_argument("--generator", default="lidar",
                    choices=["lidar", "protocol"])
    args = ap.parse_args()
    global VB
    VB = args.vb

    rng = np.random.default_rng(0)
    ratios = (4, 4, 4, 4)
    order_fn = {"morton": morton_order_np,
                "hilbert": hilbert_order_np}[args.order]
    stats = {}   # (level, kind, halo) -> list of recalls
    for ci in range(args.clouds):
        if args.generator == "protocol":
            from deepsir_tpu.data.synthetic import make_structured_cloud
            cloud = make_structured_cloud(
                np.random.default_rng(ci), args.points)[:, :3]
        else:
            cloud = synthetic_cloud(rng, args.points)
        cloud = cloud[rng.permutation(len(cloud))]
        cloud = cloud[order_fn(cloud)]
        pc = cloud
        for lvl, r in enumerate(ratios):
            n_next = len(pc) // r
            # strided subsample keeps Morton order
            sub = pc[::r][:n_next]
            t_self = exact_knn(pc, pc, args.k)
            t_interp = exact_knn(pc, sub, 1)
            for halo in args.halos:
                stats.setdefault((lvl, "self", halo), []).append(
                    windowed_recall(t_self, len(pc), len(pc), halo))
                stats.setdefault((lvl, "interp", halo), []).append(
                    windowed_recall(t_interp, len(pc), len(sub), halo))
            pc = sub

    print(f"{'lvl':>3} {'kind':>7} " +
          " ".join(f"h={h:>2}" for h in args.halos))
    for lvl in range(len(ratios)):
        for kind in ("self", "interp"):
            row = [np.mean(stats[(lvl, kind, h)]) for h in args.halos]
            print(f"{lvl:>3} {kind:>7} " +
                  " ".join(f"{v:.3f}" for v in row))


if __name__ == "__main__":
    main()
