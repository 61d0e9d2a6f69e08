"""In-graph construction of the RandLA-Net index pyramid.

The reference builds this on CPU per batch inside collate_fn with a C++ KNN
extension and ships concatenated index tensors to the device
(/root/reference/dataloader/data_base.py:153-219, consumed via slice offsets
in network/RandLANet.py:287-309). Here the pyramid is built on-device inside
the same XLA program as the model, and levels are kept as separate pytree
leaves — no concatenation, no runtime offset bookkeeping (level sizes are
compile-time constants).

Random subsampling: the reference takes the *first* N/r points of each level,
which is a uniform random sample because the loader pre-shuffles the cloud
(data_base.py:167-169 + kitti_loader.py:327-329). We preserve exactly that
contract: callers must feed clouds in randomized order (the data layer
shuffles after voxelization).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from deepsir_tpu.ops.knn import knn


class Pyramid(NamedTuple):
    """Per-level index structure for one cloud (or a batch, with leading dim).

    With L encoder layers and level sizes [N0, N1, ..., NL] (Nl = N0 / prod(r)):
      xyz[l]:        (Nl, 3)   points at level l,   l in 0..L-1
      neigh_idx[l]:  (Nl, K)   KNN within level l,  l in 0..L-1
      pool_idx[l]:   (N{l+1}, K) neighbourhoods used for pooling l -> l+1
      interp_idx[l]: (Nl,)     nearest level-(l+1) point for each level-l point
    """
    xyz: Tuple[jnp.ndarray, ...]
    neigh_idx: Tuple[jnp.ndarray, ...]
    pool_idx: Tuple[jnp.ndarray, ...]
    interp_idx: Tuple[jnp.ndarray, ...]


def _build_single(xyz: jnp.ndarray, num_knn: int,
                  ratios: Tuple[int, ...], chunk: int,
                  recall_target: float, sample: str,
                  window_halo: int) -> Pyramid:
    xyzs, neighs, pools, interps = [], [], [], []
    pc = xyz
    for r in ratios:
        n_next = pc.shape[0] // r
        neigh, _ = knn(pc, pc, num_knn, chunk=chunk,
                       recall_target=recall_target,
                       window_halo=window_halo)              # (Nl, K)
        if sample == "strided":
            # every r-th point of a curve-sorted cloud: a spatially uniform
            # sample that KEEPS the curve order, so windowed kernels stay
            # valid at every level (first-N of a sorted cloud would be a
            # spatial corner, not a uniform sample)
            sub = pc[::r][:n_next]
            pool = neigh[::r][:n_next]
        else:
            sub = pc[:n_next]                                # random sample
            pool = neigh[:n_next]
        up, _ = knn(pc, sub, 1, chunk=chunk,
                    recall_target=recall_target,
                    window_halo=window_halo)                 # (Nl, 1)
        xyzs.append(pc)
        neighs.append(neigh)
        pools.append(pool)                                   # (N{l+1}, K)
        interps.append(up[:, 0])
        pc = sub
    return Pyramid(tuple(xyzs), tuple(neighs), tuple(pools), tuple(interps))


@partial(jax.jit, static_argnames=("num_knn", "ratios", "chunk",
                                   "recall_target", "sample", "window_halo"))
def build_pyramid(xyz: jnp.ndarray, num_knn: int = 16,
                  ratios: Tuple[int, ...] = (4, 4, 4, 4),
                  chunk: int = 1024,
                  recall_target: float = 0.95,
                  sample: str = "first",
                  window_halo: int = 0) -> Pyramid:
    """Build the index pyramid for a cloud (N, 3) or batch (B, N, 3).

    sample="first" implements the reference's first-N-of-a-shuffled-cloud
    random subsample (module docstring). sample="strided" takes every r-th
    point instead — the correct uniform sample for CURVE-SORTED clouds
    (ops/morton.py), where it also preserves the sort at every level so
    `window_halo` > 0 can restrict the per-level KNN searches to curve-rank
    windows (ops/window.py).
    """
    fn = _build_single
    for _ in range(xyz.ndim - 2):
        fn = jax.vmap(fn, in_axes=(0, None, None, None, None, None, None))
    return fn(xyz, num_knn, tuple(ratios), chunk, recall_target, sample,
              window_halo)


def slice_neighbours(pyr: Pyramid, k: int) -> Pyramid:
    """Truncate every neighbour list of `pyr` to its k NEAREST entries.

    Valid because all KNN paths (ops/knn.py exact + ApproxTopK, ops/
    pallas_knn.py fused + windowed) return neighbours ascending by distance,
    so a first-k slice is the k-NN subgraph of the same pyramid. k <= 0 or
    k >= K returns `pyr` unchanged. Param-free consumers (AttPooling learns
    per-CHANNEL scores, max-pool is order-invariant) keep their parameter
    trees, so a checkpoint trained at K can be evaluated at any k < K —
    used by cfg.inlier_num_knn to halve the registration scan's dominant
    gather-row count (BASELINE.md round 4: the inlier net's level-0 feature
    gathers are ~16 ms of the 64.6 ms bs2 device budget at K=16).
    """
    if k <= 0 or k >= pyr.neigh_idx[0].shape[-1]:
        return pyr
    return pyr._replace(
        neigh_idx=tuple(n[..., :k] for n in pyr.neigh_idx),
        pool_idx=tuple(p[..., :k] for p in pyr.pool_idx))
