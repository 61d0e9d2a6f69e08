"""Log-domain Sinkhorn normalization with optional slack row/column.

Functional equivalent of the reference's RPM-style optimal transport
(/root/reference/network/matchnet.py:195-271 compute_affinity / sinkhorn),
as a lax.scan over a fixed iteration count (no data-dependent early exit —
the convergence check was only used by the reference's dead handcrafted-RPM
path).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def compute_affinity(beta: jnp.ndarray, feat_distance: jnp.ndarray,
                     alpha=0.5) -> jnp.ndarray:
    """log of initial match-matrix values: -beta * (dist - alpha).

    beta: (B,); feat_distance: (B, J, K); alpha: float or (B,)
    (reference matchnet.compute_affinity)
    """
    if jnp.ndim(alpha) == 0:
        return -beta[:, None, None] * (feat_distance - alpha)
    return -beta[:, None, None] * (feat_distance - alpha[:, None, None])


@partial(jax.jit, static_argnames=("n_iters", "slack"))
def sinkhorn(log_alpha: jnp.ndarray, n_iters: int = 5,
             slack: bool = True) -> jnp.ndarray:
    """Sinkhorn iterations producing a near doubly-stochastic matrix (log-dom).

    log_alpha: (B, J, K). With slack=True, a zero-padded slack row/column
    absorbs unmatched mass and is excluded from the returned matrix.
    """
    if slack:
        padded = jnp.pad(log_alpha, ((0, 0), (0, 1), (0, 1)))

        def body(la, _):
            row = jnp.concatenate([
                la[:, :-1, :] - jax.nn.logsumexp(la[:, :-1, :], axis=2, keepdims=True),
                la[:, -1:, :]], axis=1)
            col = jnp.concatenate([
                row[:, :, :-1] - jax.nn.logsumexp(row[:, :, :-1], axis=1, keepdims=True),
                row[:, :, -1:]], axis=2)
            return col, None

        padded, _ = jax.lax.scan(body, padded, None, length=n_iters)
        return padded[:, :-1, :-1]

    def body(la, _):
        la = la - jax.nn.logsumexp(la, axis=2, keepdims=True)
        la = la - jax.nn.logsumexp(la, axis=1, keepdims=True)
        return la, None

    out, _ = jax.lax.scan(body, log_alpha, None, length=n_iters)
    return out
