"""Curve-rank window geometry shared by the windowed KNN / gather kernels.

With clouds sorted along a space-filling curve (ops/morton.py), a point's
spatial neighbours are (mostly) index neighbours, so per-level KNN can
search only a window of curve ranks and the neighbour gathers can read a
contiguous value window into VMEM (ops/pallas_knn.py windowed mode,
ops/pallas_gather.py). This module is the ONE definition of that window so
producers (KNN) and consumers (gathers) agree bit-for-bit: the windowed KNN
only returns indices inside `window(i)` of its query tile, and the gather
coverage lemma (tests/test_window.py) guarantees every gather tile's window
contains the KNN windows of all query rows it serves.

Geometry: query tile i (TQ rows of an nq-row query array) gets value blocks
[start_block(i), start_block(i) + width) of VB rows each from the nv-row
value array, where width = 2*halo + s and s is the number of value blocks a
query tile sweeps after level-ratio scaling (s=1 for same-level, r for the
pool gather one level down). Everything is static per grid step — the
formula runs on grid indices inside BlockSpec index_maps.

Recall ceiling measured on protocol clouds (scripts/morton_recall.py,
Morton order, 18000 pts, k=16, VB=512): level-0 self-KNN 0.951 / interp
0.991 at halo 1, 0.964 / 0.995 at halo 2; exact at depth (windows cover
the small deep levels entirely).
"""
from __future__ import annotations

from typing import Callable, Tuple

import jax.numpy as jnp

TQ = 128      # query rows per tile — shared by every windowed kernel
VB = 512      # value rows per window block: at equal window size, larger
              # blocks lose less recall to centring (0.951 vs 0.875 for a
              # ~1536-row window, scripts/morton_recall.py --vb) and cost
              # fewer grid steps; 512 keeps gather value blocks VMEM-sized


def num_blocks(n: int, vb: int = VB) -> int:
    return -(-n // vb)


def window_geometry(nq: int, nv: int, halo: int, tq: int = TQ,
                    vb: int = VB) -> Tuple[int, Callable]:
    """Static window shape + per-tile start for (nq queries, nv values).

    Returns (width_blocks, start_block) where start_block(i) maps a query
    tile index (python int or traced scalar) to the first value block of
    its window. If the window covers the whole value array, width_blocks
    equals num_blocks(nv) and start_block is constant 0 — callers can use
    that to fall back to unwindowed paths.
    """
    nvb = num_blocks(nv, vb)
    s = max(1, (tq * nv) // (nq * vb))     # value blocks swept per tile
    width = 2 * halo + s
    if width >= nvb:
        return nvb, lambda i: i * 0
    hi = nvb - width

    def start_block(i):
        center = ((i * tq + tq // 2) * nv // nq) // vb
        lo = center - width // 2
        if isinstance(i, int):          # python int stays python (callers
            return max(0, min(lo, hi))  # build static start tables)
        return jnp.clip(lo, 0, hi)      # traced grid index (index_maps)

    return width, start_block


def windowed(nq: int, nv: int, halo: int, tq: int = TQ, vb: int = VB) -> bool:
    """True when the window is a strict subset (the kernels will restrict)."""
    width, _ = window_geometry(nq, nv, halo, tq, vb)
    return width < num_blocks(nv, vb)
