"""Index-gather primitives for point-cloud networks.

TPU-native replacements for the reference's torch.gather idioms
(/root/reference/network/tools.py:183-233 gather_neighbour*,
/root/reference/network/RandLANet.py:374-408 random_sample /
nearest_interpolation). All functions are channel-last ([..., N, C]) — the
natural layout for feeding the MXU with (points x channels) matmuls.

Batch dims are FLATTENED into the row dimension with offset indices before
the gather: a batched take_along_axis lowers to XLA's batched-gather, which
runs ~3.5x slower on TPU than the identical flat row gather (measured
in-graph at (2, 18000, 16) x C=67: 3.32 ms batched vs 0.94 ms flat — the
batch dims force a slower per-row emitter even at batch 1). The flat form
is bit-identical and differentiates to the same scatter-add.
"""
from __future__ import annotations

import jax.numpy as jnp


def _flat_rows(values: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Core row gather: values (..., N, C) x idx (..., M) -> (..., M, C),
    with leading batch dims folded into one flat row axis."""
    *batch, n, c = values.shape
    m = idx.shape[-1]
    if not batch:
        return jnp.take_along_axis(values, idx[:, None], axis=0)
    b = 1
    for d in batch:
        b *= d
    vf = values.reshape(b * n, c)
    off = jnp.arange(b, dtype=idx.dtype).reshape(*batch, 1) * n
    flat = (idx + off).reshape(b * m)
    out = jnp.take_along_axis(vf, flat[:, None], axis=0)
    return out.reshape(*batch, m, c)


def gather_points(values: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather rows of a point array by index.

    values: (..., N, C); idx: (..., M) int -> (..., M, C)
    (reference tools.gather_neighbour_V3, channel-last)
    """
    return _flat_rows(values, idx)


def gather_neighbour(values: jnp.ndarray, neigh_idx: jnp.ndarray) -> jnp.ndarray:
    """Gather neighbourhood features.

    values: (..., N, C); neigh_idx: (..., M, K) int -> (..., M, K, C)
    (reference tools.gather_neighbour / gather_neighbour_V2, channel-last)
    """
    *batch, m, k = neigh_idx.shape
    flat = neigh_idx.reshape(*batch, m * k)
    out = _flat_rows(values, flat)
    return out.reshape(*batch, m, k, values.shape[-1])


def max_pool_neighbours(features: jnp.ndarray, pool_idx: jnp.ndarray) -> jnp.ndarray:
    """Max-pool features over pooling neighbourhoods.

    features: (..., N, C); pool_idx: (..., M, K) with M < N -> (..., M, C)
    (reference RandLANet.random_sample, RandLANet.py:374-391)
    """
    neigh = gather_neighbour(features, pool_idx)       # (..., M, K, C)
    return jnp.max(neigh, axis=-2)


def nearest_interpolate(features: jnp.ndarray, interp_idx: jnp.ndarray) -> jnp.ndarray:
    """Upsample features by nearest-neighbour copy.

    features: (..., N, C); interp_idx: (..., M) or (..., M, 1) with M > N
    -> (..., M, C)
    (reference RandLANet.nearest_interpolation, RandLANet.py:393-408)
    """
    if interp_idx.shape[-1] == 1 and interp_idx.ndim == features.ndim:
        interp_idx = interp_idx[..., 0]
    return gather_points(features, interp_idx)
