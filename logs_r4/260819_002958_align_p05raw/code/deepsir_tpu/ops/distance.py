"""Tiled pairwise-distance and correspondence-search kernels.

TPU-native replacement for the reference's chunked feature matching
(/root/reference/network/matchnet.py:96-144 square_distance_V2 /
match_features_V2 and the stride-6000 argmin loop in network/model.py:558-569).

Design: the N x M distance matrix is never materialized. Queries are processed
in fixed-size tiles; each tile's distances are one (tile, C) x (C, M) matmul
(MXU work) plus rank-1 corrections, reduced immediately to a running argmin.
Everything is static-shaped, scan-based, and vmaps over batch dims.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def square_distance(src: jnp.ndarray, dst: jnp.ndarray) -> jnp.ndarray:
    """Full pairwise squared L2 distance (..., N, C) x (..., M, C) -> (..., N, M).

    Uses the |a|^2 + |b|^2 - 2ab expansion so the inner product rides the MXU
    (reference matchnet.square_distance, matchnet.py:49-66). Only use for small
    N*M — for matching use `nearest_neighbour_index`.
    """
    d = -2.0 * jnp.einsum("...nc,...mc->...nm", src, dst, precision="highest")
    d = d + jnp.sum(src * src, axis=-1)[..., :, None]
    d = d + jnp.sum(dst * dst, axis=-1)[..., None, :]
    return d


def match_features(feat_src: jnp.ndarray, feat_ref: jnp.ndarray,
                   metric: str = "l2") -> jnp.ndarray:
    """Pairwise feature distance matrix (..., J, C) x (..., K, C) -> (..., J, K).

    (reference matchnet.match_features / match_features_V2)
    """
    if metric == "l2":
        return square_distance(feat_src, feat_ref)
    if metric == "euclidean":
        return jnp.sqrt(square_distance(feat_src, feat_ref) + 1e-12)
    if metric == "angle":
        src = feat_src / (jnp.linalg.norm(feat_src, axis=-1, keepdims=True) + 1e-12)
        ref = feat_ref / (jnp.linalg.norm(feat_ref, axis=-1, keepdims=True) + 1e-12)
        cos = jnp.einsum("...nc,...mc->...nm", src, ref)
        return jnp.arccos(jnp.clip(cos, -1.0, 1.0))
    raise NotImplementedError(metric)


def _pad_to_multiple(x: jnp.ndarray, axis: int, multiple: int, value=0.0):
    n = x.shape[axis]
    rem = (-n) % multiple
    if rem == 0:
        return x, n
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, rem)
    return jnp.pad(x, pad, constant_values=value), n


def _nn_index_single(src: jnp.ndarray, ref: jnp.ndarray, chunk: int) -> jnp.ndarray:
    """Argmin over ref for each src row. src (N, C), ref (M, C) -> (N,) int32."""
    n = src.shape[0]
    src_p, _ = _pad_to_multiple(src, 0, chunk)
    tiles = src_p.reshape(-1, chunk, src.shape[1])
    ref_sq = jnp.sum(ref * ref, axis=-1)          # (M,)

    def tile_body(tile):
        # (chunk, C) x (C, M) on the MXU; |src|^2 is constant per row -> skip.
        d = ref_sq[None, :] - 2.0 * jnp.matmul(tile, ref.T, precision='highest')   # (chunk, M)
        return jnp.argmin(d, axis=-1).astype(jnp.int32)

    idx = jax.lax.map(tile_body, tiles)           # (tiles, chunk)
    return idx.reshape(-1)[:n]


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


@partial(jax.jit, static_argnames=("chunk", "method", "low_precision"))
def nearest_neighbour_index(feat_src: jnp.ndarray, feat_ref: jnp.ndarray,
                            chunk: int = 2048, method: str = "auto",
                            low_precision: bool = False) -> jnp.ndarray:
    """Nearest ref index under squared-L2 for every src row.

    feat_src: (..., N, C); feat_ref: (..., M, C) -> (..., N) int32.

    Replaces the reference's no_grad stride-6000 matching loop
    (network/model.py:558-569) with a tiled sweep that never materializes
    the full N x M matrix. method: 'auto' uses the fused Pallas kernel on
    TPU (ops/pallas_match.py — 2.1x faster, near-tie rounding differences),
    'xla' forces the exact highest-precision path. low_precision feeds the
    Pallas kernel bf16 operands (fp32 accumulation) — the bf16
    compute_dtype path's matcher.

    Integer-output correspondence search carries no gradient (the reference
    matches under no_grad, model.py:558); stop_gradient also keeps autodiff
    from trying to differentiate through the Pallas kernel.
    """
    feat_src = jax.lax.stop_gradient(feat_src)
    feat_ref = jax.lax.stop_gradient(feat_ref)
    if method == "auto" and _on_tpu():
        from deepsir_tpu.ops import pallas_match
        if pallas_match.supported(feat_src.shape[-2], feat_ref.shape[-2],
                                  feat_src.shape[-1]):
            fn = partial(pallas_match.match_argmin_single,
                         low_precision=low_precision)
            for _ in range(feat_src.ndim - 2):
                fn = jax.vmap(fn, in_axes=(0, 0))
            return fn(feat_src, feat_ref)
    fn = _nn_index_single
    for _ in range(feat_src.ndim - 2):
        fn = jax.vmap(fn, in_axes=(0, 0, None))
    return fn(feat_src, feat_ref, chunk)


@partial(jax.jit, static_argnames=("chunk", "method", "low_precision"))
def nearest_neighbour_bidirectional(feat_src: jnp.ndarray,
                                    feat_ref: jnp.ndarray,
                                    chunk: int = 2048, method: str = "auto",
                                    low_precision: bool = False):
    """Both-direction NN search: (..., N, C) x (..., M, C) ->
    (idx (..., N), reverse_idx (..., M)) int32.

    The mutual-consistency gate needs src->ref AND ref->src; on TPU the
    fused Pallas kernel (ops/pallas_match.py::match_argmin_bidirectional)
    reduces each distance tile into both directions in ONE pass — the
    second direction costs an extra per-tile column reduction instead of a
    second full sweep. Elsewhere (or with method='xla') it is two tiled
    sweeps.
    """
    feat_src = jax.lax.stop_gradient(feat_src)
    feat_ref = jax.lax.stop_gradient(feat_ref)
    if method == "auto" and _on_tpu():
        from deepsir_tpu.ops import pallas_match
        if (pallas_match.supported(feat_src.shape[-2], feat_ref.shape[-2],
                                   feat_src.shape[-1])
                and feat_src.shape[-1] == feat_ref.shape[-1]):
            fn = partial(pallas_match.match_argmin_bidirectional,
                         low_precision=low_precision)
            for _ in range(feat_src.ndim - 2):
                fn = jax.vmap(fn, in_axes=(0, 0))
            return fn(feat_src, feat_ref)
    return (nearest_neighbour_index(feat_src, feat_ref, chunk=chunk,
                                    method=method,
                                    low_precision=low_precision),
            nearest_neighbour_index(feat_ref, feat_src, chunk=chunk,
                                    method=method,
                                    low_precision=low_precision))


def mutual_gate(idx: jnp.ndarray, reverse_idx: jnp.ndarray,
                min_keep: int = 3, src_xyz: jnp.ndarray = None,
                tol: float = 0.0) -> jnp.ndarray:
    """Mutual nearest-neighbour consistency mask over a correspondence set.

    idx: (..., N) int — forward search, src row i matched to ref row idx[i].
    reverse_idx: (..., M) int — reverse search, ref row j matched to src row
    reverse_idx[j]. Returns a float32 (..., N) mask: 1.0 where the match is
    reciprocal (reverse_idx[idx[i]] == i), else 0.0. Classical outlier prior
    for partial-overlap registration (no reference counterpart — the
    reference keeps every forward match, network/model.py:558-569): source
    points outside the overlap region must match SOMETHING, but the ref
    point they hit almost never matches them back.

    Relaxed form (`tol` > 0, requires `src_xyz` (..., N, 3)): accept when
    the reverse match lands within `tol` of the source point —
    |src_xyz[reverse_idx[idx[i]]] - src_xyz[i]| <= tol. Exact reciprocity
    is the tol=0 limit; the relaxation keeps valid-but-asymmetric matches
    in dense regions (measured: the hard gate rescues catastrophic
    partial-overlap failures but trims good solves' correspondence sets —
    see BASELINE.md round 3). Src-point distances are pose-invariant, so
    any rigid-motion copy of the source coordinates works.

    Safety fallback: if fewer than `min_keep` matches per cloud survive the
    check (degenerate descriptors, tiny overlap), the gate opens fully
    (all-ones) so the downstream weighted-Kabsch solve never sees an empty
    correspondence set.
    """
    from deepsir_tpu.ops.gather import gather_points
    n = idx.shape[-1]
    back = gather_points(reverse_idx[..., None], idx)[..., 0]   # (..., N)
    if tol > 0.0:
        assert src_xyz is not None, "relaxed mutual gate needs src_xyz"
        back_xyz = gather_points(src_xyz, back)                 # (..., N, 3)
        d2 = jnp.sum((back_xyz - src_xyz) ** 2, axis=-1)
        mutual = d2 <= tol * tol
    else:
        mutual = back == jnp.arange(n, dtype=idx.dtype)
    keep = jnp.sum(mutual, axis=-1, keepdims=True) >= min_keep
    return jnp.where(keep, mutual.astype(jnp.float32), 1.0)


def _min_dist_single(src: jnp.ndarray, ref: jnp.ndarray, chunk: int) -> jnp.ndarray:
    """Min squared distance to ref for each src row. (N, C), (M, C) -> (N,)."""
    n = src.shape[0]
    src_p, _ = _pad_to_multiple(src, 0, chunk)
    tiles = src_p.reshape(-1, chunk, src.shape[1])
    ref_sq = jnp.sum(ref * ref, axis=-1)

    def tile_body(tile):
        d = (jnp.sum(tile * tile, axis=-1)[:, None]
             + ref_sq[None, :] - 2.0 * jnp.matmul(tile, ref.T, precision='highest'))
        return jnp.min(d, axis=-1)

    out = jax.lax.map(tile_body, tiles)
    return out.reshape(-1)[:n]


@partial(jax.jit, static_argnames=("chunk",))
def min_square_distance(src: jnp.ndarray, ref: jnp.ndarray,
                        chunk: int = 2048) -> jnp.ndarray:
    """Per-src-point min squared distance to ref, tiled (for chamfer terms)."""
    fn = _min_dist_single
    for _ in range(src.ndim - 2):
        fn = jax.vmap(fn, in_axes=(0, 0, None))
    return fn(src, ref, chunk)


def pairwise_dist_chunked(src: jnp.ndarray, ref: jnp.ndarray, reduce_fn,
                          chunk: int = 2048):
    """Generic tiled reduction over the (N, M) distance matrix.

    reduce_fn maps a (chunk, M) distance tile to a (chunk, ...) result.
    Unbatched; vmap externally.
    """
    n = src.shape[0]
    src_p, _ = _pad_to_multiple(src, 0, chunk)
    tiles = src_p.reshape(-1, chunk, src.shape[1])
    ref_sq = jnp.sum(ref * ref, axis=-1)

    def tile_body(tile):
        d = (jnp.sum(tile * tile, axis=-1)[:, None]
             + ref_sq[None, :] - 2.0 * jnp.matmul(tile, ref.T, precision='highest'))
        return reduce_fn(d)

    out = jax.lax.map(tile_body, tiles)
    return out.reshape((-1,) + out.shape[2:])[:n]
