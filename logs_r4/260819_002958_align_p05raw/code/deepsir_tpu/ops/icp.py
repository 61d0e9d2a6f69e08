"""Point-to-point ICP.

Replaces Open3D's C++ registration_icp, used by the reference for GT-pose
refinement (cached to disk — /root/reference/dataloader/kitti_loader.py:241-286,
oxford_loader.py:101-135) and for optional test-time refinement
(test.py:247-257). Two variants:

  * `icp_np`  — host-side (scipy cKDTree) for the data pipeline; same
    contract as Open3D's: correspondences within max_corr_dist, SVD update,
    convergence by relative fitness/rmse change.
  * `icp`     — jitted fixed-iteration version (KNN kernel + weighted Kabsch
    inside lax.fori_loop) for on-device refinement at eval time.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from scipy.spatial import cKDTree

from deepsir_tpu.math import se3, se3_np
from deepsir_tpu.ops.knn import knn
from deepsir_tpu.ops.svd3 import weighted_kabsch


def _kabsch_np(src: np.ndarray, tgt: np.ndarray) -> np.ndarray:
    """Unweighted rigid alignment (4x4) of matched pairs, numpy/f64."""
    cs = src.mean(axis=0)
    ct = tgt.mean(axis=0)
    cov = (src - cs).T @ (tgt - ct)
    u, _, vt = np.linalg.svd(cov)
    d = np.sign(np.linalg.det(vt.T @ u.T))
    flip = np.diag([1.0, 1.0, d])
    rot = vt.T @ flip @ u.T
    out = np.eye(4)
    out[:3, :3] = rot
    out[:3, 3] = ct - rot @ cs
    return out


def icp_np(src: np.ndarray, tgt: np.ndarray, max_corr_dist: float,
           init: np.ndarray | None = None, max_iter: int = 200,
           tol: float = 1e-7) -> np.ndarray:
    """Point-to-point ICP on the host. Returns a 4x4 transform src -> tgt.

    Dispatches to the C++ kd-tree implementation (deepsir_tpu/native) when
    built; scipy otherwise.
    """
    from deepsir_tpu import native
    if native.available():
        return native.icp_point2point(src, tgt, max_corr_dist, init=init,
                                      max_iter=max_iter, tol=tol)
    transform = np.eye(4) if init is None else se3_np.to_4x4(np.asarray(init, dtype=np.float64))
    tree = cKDTree(tgt[:, :3])
    prev_rmse = np.inf
    for _ in range(max_iter):
        src_t = se3_np.transform(transform, src[:, :3])
        dist, idx = tree.query(src_t, distance_upper_bound=max_corr_dist)
        mask = np.isfinite(dist)
        if mask.sum() < 3:
            break
        delta = _kabsch_np(src_t[mask], tgt[idx[mask], :3])
        transform = delta @ transform
        rmse = float(np.sqrt(np.mean(dist[mask] ** 2)))
        if abs(prev_rmse - rmse) < tol:
            break
        prev_rmse = rmse
    return transform


@partial(jax.jit, static_argnames=("num_iter", "chunk"))
def icp(src: jnp.ndarray, tgt: jnp.ndarray, max_corr_dist: float,
        init: jnp.ndarray | None = None, num_iter: int = 30,
        chunk: int = 1024) -> jnp.ndarray:
    """Jitted fixed-iteration point-to-point ICP.

    src, tgt: (N, 3) / (M, 3). Returns (3, 4) transform src -> tgt.
    Out-of-range correspondences get zero weight instead of being dropped
    (static shapes).
    """
    if init is None:
        init = jnp.eye(3, 4)

    def body(_, transform):
        src_t = se3.transform(transform, src)
        # recall_target=1.0: the sq < max_corr_dist**2 inlier gate consumes
        # these distances directly, so the quantized (8-mantissa-bit,
        # truncated-down) Pallas k=1 path is not acceptable here
        idx, sq = knn(src_t, tgt, 1, chunk=chunk, recall_target=1.0)
        matched = tgt[idx[:, 0]]
        w = (sq[:, 0] < max_corr_dist ** 2).astype(src.dtype)
        delta, _ = weighted_kabsch(src_t[None], matched[None], w[None])
        return se3.concatenate(delta[0], transform)

    return jax.lax.fori_loop(0, num_iter, body, init)
