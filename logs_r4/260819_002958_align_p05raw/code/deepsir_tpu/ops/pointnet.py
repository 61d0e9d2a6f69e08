"""PointNet++-style sampling/grouping utilities, static-shaped.

TPU-native equivalents of the reference's vendored PointNet++ helpers
(/root/reference/network/tools.py:10-178: index_points,
farthest_point_sample, query_ball_point, sample_and_group) and the loader's
farthest_point_sampler (/root/reference/dataloader/data_base.py:328-338).
None are on the reference's live path, but they are part of its public
utility surface; here they are jittable with fixed output capacities.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from deepsir_tpu.ops.distance import square_distance
from deepsir_tpu.ops.gather import gather_neighbour, gather_points

index_points = gather_points      # reference tools.index_points


@partial(jax.jit, static_argnames=("num_samples",))
def farthest_point_sample(xyz: jnp.ndarray, num_samples: int) -> jnp.ndarray:
    """Iterative farthest-point sampling. xyz (..., N, 3) -> (..., S) int32.

    (reference tools.farthest_point_sample, tools.py:36-62; deterministic
    start at index 0 like the loader's variant data_base.py:328-338)
    """
    def single(pts):
        n = pts.shape[0]

        def body(i, carry):
            dist, idx, last = carry
            d = jnp.sum((pts - pts[last]) ** 2, axis=-1)
            dist = jnp.minimum(dist, d)
            nxt = jnp.argmax(dist).astype(jnp.int32)
            idx = idx.at[i].set(nxt)
            return dist, idx, nxt

        dist0 = jnp.full((n,), jnp.inf, pts.dtype)
        idx0 = jnp.zeros((num_samples,), jnp.int32)
        _, idx, _ = jax.lax.fori_loop(1, num_samples, body,
                                      (dist0, idx0, jnp.int32(0)))
        return idx

    fn = single
    for _ in range(xyz.ndim - 2):
        fn = jax.vmap(fn)
    return fn(xyz)


@partial(jax.jit, static_argnames=("num_neighbours",))
def query_ball_point(radius: float, num_neighbours: int, xyz: jnp.ndarray,
                     centers: jnp.ndarray) -> jnp.ndarray:
    """Fixed-capacity ball query. xyz (..., N, 3), centers (..., S, 3)
    -> (..., S, K) int32: up to K points within radius of each center;
    slots past the count repeat the first in-ball point (the reference's
    group_first fill, tools.py:65-92).
    """
    d = square_distance(centers, xyz)                    # (..., S, N)
    in_ball = d < radius ** 2
    # rank in-ball points first (stable), take the first K indices
    order_key = jnp.where(in_ball, d, jnp.inf)
    idx = jnp.argsort(order_key, axis=-1)[..., :num_neighbours].astype(jnp.int32)
    kth = jnp.take_along_axis(order_key, idx, axis=-1)
    first = idx[..., :1]
    return jnp.where(jnp.isinf(kth), first, idx)


@partial(jax.jit, static_argnames=("num_samples", "num_neighbours"))
def sample_and_group(num_samples: int, radius: float, num_neighbours: int,
                     xyz: jnp.ndarray, features: jnp.ndarray | None = None):
    """FPS centers + ball-query grouping with recentred coordinates.

    Returns (new_xyz (..., S, 3), grouped (..., S, K, 3 [+C])).
    (reference tools.sample_and_group, tools.py:95-133)
    """
    fps_idx = farthest_point_sample(xyz, num_samples)     # (..., S)
    new_xyz = gather_points(xyz, fps_idx)                 # (..., S, 3)
    idx = query_ball_point(radius, num_neighbours, xyz, new_xyz)
    grouped_xyz = gather_neighbour(xyz, idx) - new_xyz[..., :, None, :]
    if features is not None:
        grouped_feat = gather_neighbour(features, idx)
        grouped = jnp.concatenate([grouped_xyz, grouped_feat], axis=-1)
    else:
        grouped = grouped_xyz
    return new_xyz, grouped
