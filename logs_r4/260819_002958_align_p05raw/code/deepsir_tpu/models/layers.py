"""Building-block layers for the point networks (flax.linen).

Channel-last re-designs of the reference's MLP stacks
(/root/reference/network/RandLANet.py:12-157: FC/MLP/MLP2D/Att_pooling).
1x1 convolutions become Dense over the channel axis — on TPU these are
(points x channels) matmuls that tile straight onto the MXU.

Normalization: GroupNorm everywhere. The reference mixes BatchNorm1d (MLP/FC)
and GroupNorm (MLP2D); we use stateless GroupNorm uniformly so the whole model
is a pure function (no mutable batch stats — required for clean lax.scan
registration loops and shard_map). The reference trains at batch_size=1 where
BatchNorm statistics are degenerate, and its own code carries a commented-out
GroupNorm variant with this exact group scheme (RandLANet.py:23-27,46-50).
"""
from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

LEAKY_SLOPE = 0.2

# Mixed-precision policy: Dense matmuls run in the configured compute dtype
# (bfloat16 on TPU -> 2x MXU throughput); GroupNorm statistics and
# activations stay float32; parameters are always float32.


def _num_groups(channels: int) -> int:
    return 8 if channels >= 64 else 4


def leaky_relu(x: jnp.ndarray) -> jnp.ndarray:
    return nn.leaky_relu(x, negative_slope=LEAKY_SLOPE)


class ConvUnit(nn.Module):
    """Dense (+ norm + LeakyReLU) unit = the reference's MLP2D block
    (RandLANet.py:58-107) in channel-last layout.

    norm='group' (default) is the recorded-checkpoint behavior. norm='batch'
    is a STATELESS rendition of the reference's BatchNorm1d (which its FC/MLP
    stacks use, RandLANet.py:12-55): per-channel statistics over every
    non-channel axis of the call — identical to BN's train-mode statistics;
    at eval the batch's own statistics stand in for running averages (a
    point cloud supplies >=num_points samples per channel, so they are
    stable at batch 1). No mutable state, so scan/shard_map/vmap stay pure.
    norm='none' skips normalization entirely — the layout PyTorch-checkpoint
    IMPORT produces (utils/torch_import.py): BatchNorm1d in eval mode is a
    frozen per-channel affine, folded into the preceding Dense kernel/bias,
    so the imported tree carries no norm parameters at these spots.
    """
    features: int
    use_norm: bool = True
    use_act: bool = True
    use_bias: bool = True
    norm: str = "group"               # 'group' | 'batch' | 'none'
    dtype: Any = None                 # compute dtype for the matmul

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Dense(self.features, use_bias=self.use_bias, dtype=self.dtype,
                     kernel_init=nn.initializers.he_normal())(x)
        if self.use_norm and self.norm != "none":
            if self.norm == "batch":
                x = x.astype(jnp.float32)
                axes = tuple(range(x.ndim - 1))
                mean = jnp.mean(x, axis=axes, keepdims=True)
                var = jnp.var(x, axis=axes, keepdims=True)
                x = (x - mean) * jax.lax.rsqrt(var + 1e-5)
                scale = self.param("scale", nn.initializers.ones,
                                   (self.features,))
                bias = self.param("bias", nn.initializers.zeros,
                                  (self.features,))
                x = x * scale + bias
            else:
                # epsilon matches torch's GroupNorm default (1e-5; flax
                # defaults to 1e-6) so imported reference checkpoints
                # (utils/torch_import.py) reproduce the torch forward
                # exactly; for repo-trained checkpoints the difference is
                # far below activation noise (var >> eps)
                x = nn.GroupNorm(num_groups=_num_groups(self.features),
                                 epsilon=1e-5, dtype=jnp.float32)(x)
        elif self.dtype is not None:
            x = x.astype(jnp.float32)
        if self.use_act:
            x = leaky_relu(x)
        return x


class MLP(nn.Module):
    """Stack of ConvUnits = the reference's MLP/FC helper (RandLANet.py:12-55).

    Norm+activation after every layer except the last, unless `full`.
    """
    channels: Sequence[int]
    full: bool = False
    use_norm: bool = True
    norm: str = "group"
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        n = len(self.channels)
        for i, ch in enumerate(self.channels):
            last = (i == n - 1) and not self.full
            x = ConvUnit(ch, use_norm=self.use_norm and not last,
                         use_act=not last, norm=self.norm,
                         dtype=self.dtype)(x)
        return x


class AttPooling(nn.Module):
    """Attentive pooling over the neighbour axis (RandLANet.py:140-157).

    x: (..., N, K, C_in) -> (..., N, C_out)
    """
    d_out: int
    dtype: Any = None

    @nn.compact
    def __call__(self, feature_set: jnp.ndarray) -> jnp.ndarray:
        scores = nn.Dense(feature_set.shape[-1], use_bias=False,
                          dtype=self.dtype,
                          kernel_init=nn.initializers.he_normal())(feature_set)
        att = nn.softmax(scores.astype(jnp.float32), axis=-2)  # over neighbours
        agg = jnp.sum(feature_set * att, axis=-2)          # (..., N, C_in)
        return ConvUnit(self.d_out, dtype=self.dtype)(agg)
