"""Morton (Z-order) codes for spatial locality ordering of point clouds.

Why: TPU row-gathers are latency-bound per ROW (~6 ns/row, xplane-profiled
— CLAUDE.md round-2/3), which makes the RandLA neighbour gathers and the
KNN searches the dominant device cost of the forward. Sorting each cloud
along a space-filling curve makes a point's spatial neighbours *index*
neighbours, which legalizes windowed kernels: KNN that searches only a
curve-rank window, and neighbour gathers that read a contiguous value
window into VMEM and select with a one-hot MXU matmul instead of per-row
DMA (ops/pallas_gather.py, ops/pallas_knn.py windowed mode).

The reference has no counterpart — its per-row torch.gather idioms
(/root/reference/network/tools.py:183-233) are cheap on GPU; this module
exists because the TPU cost model is different (SURVEY.md §2.4 "gather
strategy"). Ordering is a pure permutation of the input cloud: callers
permute points and any per-point companions (labels, normals) with the
returned order; the model is order-equivariant apart from the pyramid's
subsample rule, which switches from first-N to strided-N under Morton
order (ops/pyramid.py `sample="strided"`) to stay a spatially uniform
sample.

Both a numpy host path (data layer, data/base.py) and a jittable path
(tests, in-graph re-sorting after augmentation) are provided.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# 21 bits per axis fills the 63-bit interleave of an int64 code.
_BITS = 21


def _spread3_np(x: np.ndarray) -> np.ndarray:
    """Interleave zeros: bit i of x moves to bit 3i (x < 2^21), int64."""
    x = x.astype(np.int64) & ((1 << _BITS) - 1)
    x = (x | (x << 32)) & 0x1F00000000FFFF
    x = (x | (x << 16)) & 0x1F0000FF0000FF
    x = (x | (x << 8)) & 0x100F00F00F00F00F
    x = (x | (x << 4)) & 0x10C30C30C30C30C3
    x = (x | (x << 2)) & 0x1249249249249249
    return x


def morton_code_np(xyz: np.ndarray, valid: np.ndarray | None = None
                   ) -> np.ndarray:
    """Per-point Morton code (int64) from float coords.

    Coordinates are min-shifted and scaled into the 21-bit grid using the
    cloud's own bounding box (per-cloud normalization is fine: only the
    ORDER matters, not code comparability across clouds). Invalid rows
    (padding in fixed-capacity masked clouds) get the maximum code so a
    stable sort keeps them at the end.
    """
    pts = np.asarray(xyz, np.float64)[..., :3]
    if valid is not None:
        vm = np.asarray(valid, bool)
        ref = pts[vm] if vm.any() else pts
    else:
        ref = pts
    lo = ref.min(axis=0)
    span = ref.max(axis=0) - lo
    scale = (float(1 << _BITS) - 1.0) / np.maximum(span, 1e-12)
    q = np.clip((pts - lo) * scale, 0, (1 << _BITS) - 1).astype(np.int64)
    code = (_spread3_np(q[:, 0]) | (_spread3_np(q[:, 1]) << 1)
            | (_spread3_np(q[:, 2]) << 2))
    if valid is not None:
        code = np.where(np.asarray(valid, bool), code, np.int64(2**62))
    return code


def morton_order_np(xyz: np.ndarray, valid: np.ndarray | None = None
                    ) -> np.ndarray:
    """Stable permutation sorting points by Morton code (padding last)."""
    return np.argsort(morton_code_np(xyz, valid), kind="stable")


_HILBERT_BITS = 16


def hilbert_code_np(xyz: np.ndarray, valid: np.ndarray | None = None
                    ) -> np.ndarray:
    """Per-point Hilbert-curve index (int64, 16 bits/axis).

    Hilbert order has no large-jump discontinuities (adjacent curve ranks
    are always spatially adjacent cells), which measurably tightens the
    curve-rank window that covers a point's true k-NN vs Morton order —
    the property the windowed KNN/gather kernels depend on. Uses Skilling's
    transpose algorithm (public domain, 2004), vectorized over points.
    """
    bits = _HILBERT_BITS
    pts = np.asarray(xyz, np.float64)[..., :3]
    if valid is not None:
        vm = np.asarray(valid, bool)
        ref = pts[vm] if vm.any() else pts
    else:
        ref = pts
    lo = ref.min(axis=0)
    span = ref.max(axis=0) - lo
    scale = (float(1 << bits) - 1.0) / np.maximum(span, 1e-12)
    q = np.clip((pts - lo) * scale, 0, (1 << bits) - 1).astype(np.int64)
    X = [q[:, 0].copy(), q[:, 1].copy(), q[:, 2].copy()]

    # axes -> Hilbert transpose (Skilling): inverse-undo then Gray encode
    m = np.int64(1) << (bits - 1)
    qq = m
    while qq > 1:
        p = qq - 1
        for i in range(3):
            hit = (X[i] & qq) != 0
            X[0] = np.where(hit, X[0] ^ p, X[0])
            t = np.where(hit, 0, (X[0] ^ X[i]) & p)
            X[0] ^= t
            X[i] ^= t
        qq >>= 1
    X[1] ^= X[0]
    X[2] ^= X[1]
    t = np.zeros_like(X[0])
    qq = m
    while qq > 1:
        t = np.where((X[2] & qq) != 0, t ^ (qq - 1), t)
        qq >>= 1
    for i in range(3):
        X[i] ^= t

    # transpose -> index: interleave bit planes, axis 0 most significant
    code = ((_spread3_np(X[0]) << 2) | (_spread3_np(X[1]) << 1)
            | _spread3_np(X[2]))
    if valid is not None:
        code = np.where(np.asarray(valid, bool), code, np.int64(2**62))
    return code


def hilbert_order_np(xyz: np.ndarray, valid: np.ndarray | None = None
                     ) -> np.ndarray:
    """Stable permutation sorting points by Hilbert index (padding last)."""
    return np.argsort(hilbert_code_np(xyz, valid), kind="stable")


def _spread3_jnp(x: jnp.ndarray) -> jnp.ndarray:
    # int32 path: 2x 16-bit halves would need int64; TPUs handle int32 best,
    # so interleave 10 bits/axis into one int32 (1024^3 grid) — plenty to
    # order ~10^4-10^5 points — and break ties by original index outside.
    x = x.astype(jnp.int32) & 0x3FF
    x = (x | (x << 16)) & 0x30000FF
    x = (x | (x << 8)) & 0x300F00F
    x = (x | (x << 4)) & 0x30C30C3
    x = (x | (x << 2)) & 0x9249249
    return x


def morton_code(xyz: jnp.ndarray, valid: jnp.ndarray | None = None
                ) -> jnp.ndarray:
    """Jittable per-point Morton code (int32, 10 bits/axis).

    xyz (..., N, 3) -> (..., N). Padding rows (valid == False) get the
    maximum code. Bounding box is computed over valid rows per cloud.
    """
    pts = xyz[..., :3].astype(jnp.float32)
    if valid is not None:
        big = jnp.where(valid[..., None], pts, jnp.inf)
        small = jnp.where(valid[..., None], pts, -jnp.inf)
        lo = jnp.min(big, axis=-2, keepdims=True)
        hi = jnp.max(small, axis=-2, keepdims=True)
    else:
        lo = jnp.min(pts, axis=-2, keepdims=True)
        hi = jnp.max(pts, axis=-2, keepdims=True)
    scale = 1023.0 / jnp.maximum(hi - lo, 1e-12)
    q = jnp.clip((pts - lo) * scale, 0, 1023).astype(jnp.int32)
    code = (_spread3_jnp(q[..., 0]) | (_spread3_jnp(q[..., 1]) << 1)
            | (_spread3_jnp(q[..., 2]) << 2))
    if valid is not None:
        code = jnp.where(valid, code, jnp.int32(2**30))
    return code
