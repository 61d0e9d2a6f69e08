"""RandLA-Net backbone, TPU-native.

Re-design of the reference's RandLA encoder-decoder
(/root/reference/network/RandLANet.py:160-408): pre-MLP, 4x dilated residual
blocks with local-spatial-encoding + attentive pooling and random-sample
max-pooling, mid MLP, 4x nearest-interpolation decoder with skip concat,
1x1 output head and a semantic-logit head.

Differences from the reference (deliberate, TPU-first):
  * channel-last layout; all 1x1 convs are Dense (MXU matmuls)
  * the index pyramid is a `Pyramid` pytree of per-level arrays built
    in-graph (ops/pyramid.py) instead of concatenated CPU tensors with
    runtime slice offsets (RandLANet.compute_index)
  * GroupNorm everywhere (see models/layers.py docstring)
  * dropout is explicit via an rng key; inference path is pure
  * the LocSE positional branch (xyz neighbour gather -> 10-ch encoding ->
    two ConvUnits per encoder level) is exposed as `pos_cache` so callers
    that run the SAME network over the SAME pyramid repeatedly — the
    registration scan runs the inlier RandLA once per iteration with only
    the input FEATURES changing (reference model.py:551-601) — compute it
    once outside the loop instead of per iteration. Exact: the cached
    tensors are pure functions of (pyramid.xyz, pyramid.neigh_idx, params).
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from deepsir_tpu.config import ModelConfig
from deepsir_tpu.models.layers import MLP, AttPooling, ConvUnit, leaky_relu
from deepsir_tpu.ops.gather import (gather_neighbour, max_pool_neighbours,
                                    nearest_interpolate)
from deepsir_tpu.ops.pyramid import Pyramid


def relative_pos_encoding(xyz: jnp.ndarray, neigh_idx: jnp.ndarray,
                          neigh_xyz: jnp.ndarray = None) -> jnp.ndarray:
    """Local spatial encoding: [dist, rel_xyz, xyz, neigh_xyz] = 10 channels.

    xyz: (..., N, 3); neigh_idx: (..., N, K) -> (..., N, K, 10)
    (reference Building_block.relative_pos_encoding, RandLANet.py:197-212)

    neigh_xyz may be passed pre-gathered: TPU row-gathers are latency-bound
    at ~6 ns/row regardless of row width (xplane profile), so callers fuse
    the xyz gather with a same-index feature gather into one wide gather.
    """
    if neigh_xyz is None:
        neigh_xyz = gather_neighbour(xyz, neigh_idx)           # (..., N, K, 3)
    center = xyz[..., :, None, :]
    rel = neigh_xyz - center
    dist = jnp.sqrt(jnp.sum(rel * rel, axis=-1, keepdims=True) + 1e-20)
    center_tiled = jnp.broadcast_to(center, neigh_xyz.shape)
    return jnp.concatenate([dist, rel, center_tiled, neigh_xyz], axis=-1)


def ppf_grouping(xyz: jnp.ndarray, normals: jnp.ndarray,
                 neigh_idx: jnp.ndarray) -> jnp.ndarray:
    """PPF input features [xyz, rel_xyz, ppf(4)] = 10 channels.

    (reference feat_grouping, RandLANet.py:110-137)
    """
    def angle(v1, v2):
        cross = jnp.cross(v1, v2)
        return jnp.arctan2(jnp.linalg.norm(cross, axis=-1),
                           jnp.sum(v1 * v2, axis=-1))

    grouped = gather_neighbour(xyz, neigh_idx)                 # (..., N, K, 3)
    di = grouped - xyz[..., :, None, :]
    ni = gather_neighbour(normals, neigh_idx)
    nr = normals[..., :, None, :]
    ppf = jnp.stack([angle(jnp.broadcast_to(nr, di.shape), di),
                     angle(ni, di),
                     angle(jnp.broadcast_to(nr, ni.shape), ni),
                     jnp.linalg.norm(di, axis=-1)], axis=-1)   # (..., N, K, 4)
    center = jnp.broadcast_to(xyz[..., :, None, :], grouped.shape)
    return jnp.concatenate([center, di, ppf], axis=-1)


# a per-level positional cache entry: the two ConvUnit projections of the
# 10-channel LocSE encoding consumed by the block's two attentive poolings
PosEnc = Tuple[jnp.ndarray, jnp.ndarray]


class BuildingBlock(nn.Module):
    """Local feature aggregation (LocSE + dual attentive pooling).

    (reference Building_block, RandLANet.py:160-195)
    """
    d_out: int
    dtype: Any = None

    def setup(self):
        half = self.d_out // 2
        self.mlp1 = ConvUnit(half, dtype=self.dtype)
        self.att_pooling_1 = AttPooling(half, dtype=self.dtype)
        self.mlp2 = ConvUnit(half, dtype=self.dtype)
        self.att_pooling_2 = AttPooling(self.d_out, dtype=self.dtype)

    def pos_encode(self, xyz, neigh_idx) -> PosEnc:
        """The positional branch: pure function of geometry + params.

        NOTE the chaining: mlp2 consumes mlp1's OUTPUT, not the raw 10-ch
        encoding (reference Building_block.forward, RandLANet.py:170-178).
        """
        f_xyz = relative_pos_encoding(xyz, neigh_idx)          # (..., N, K, 10)
        p1 = self.mlp1(f_xyz)
        return p1, self.mlp2(p1)

    def __call__(self, xyz, feature, neigh_idx, pos: Optional[PosEnc] = None):
        """xyz (..., N, 3); feature (..., N, C=d_out//2); neigh (..., N, K)."""
        if pos is not None:
            p1, p2 = pos
            f_neigh = gather_neighbour(feature, neigh_idx)     # (..., N, K, C)
        else:
            # ONE wide gather for xyz + features (row-gathers are
            # latency-bound per ROW, not per byte — two same-index gathers
            # cost twice one)
            both = gather_neighbour(
                jnp.concatenate([xyz, feature], axis=-1), neigh_idx)
            f_xyz = relative_pos_encoding(xyz, neigh_idx,
                                          neigh_xyz=both[..., :3])
            p1 = self.mlp1(f_xyz)
            p2 = self.mlp2(p1)          # chained (RandLANet.py:170-178)
            f_neigh = both[..., 3:]

        f_concat = jnp.concatenate([f_neigh, p1], axis=-1)     # (..., N, K, d_out)
        f_agg = self.att_pooling_1(f_concat)

        f_neigh = gather_neighbour(f_agg, neigh_idx)
        f_concat = jnp.concatenate([f_neigh, p2], axis=-1)
        return self.att_pooling_2(f_concat)


class DilatedResBlock(nn.Module):
    """Dilated residual block (reference Dilated_res_block, RandLANet.py:215-230)."""
    d_out: int
    dtype: Any = None

    def setup(self):
        self.mlp1 = ConvUnit(self.d_out // 2, dtype=self.dtype)
        self.lfa = BuildingBlock(self.d_out, dtype=self.dtype)
        self.mlp2 = ConvUnit(self.d_out * 2, use_act=False, dtype=self.dtype)
        self.mlp_skip = ConvUnit(self.d_out * 2, use_act=False,
                                 dtype=self.dtype)

    def pos_encode(self, xyz, neigh_idx) -> PosEnc:
        return self.lfa.pos_encode(xyz, neigh_idx)

    def __call__(self, feature, xyz, neigh_idx, pos: Optional[PosEnc] = None):
        f_pc = self.mlp1(feature)
        f_pc = self.lfa(xyz, f_pc, neigh_idx, pos=pos)
        f_pc = self.mlp2(f_pc)
        shortcut = self.mlp_skip(feature)
        return leaky_relu(f_pc + shortcut)


class RandLA(nn.Module):
    """RandLA-Net encoder-decoder over a precomputed index pyramid.

    __call__(features, pyramid) -> (feat (..., N, C_out), logits (..., N, classes))

    `pos_cache` (from `self.pos_cache(pyr)`) substitutes the per-level LocSE
    positional projections; pass it when calling the same network repeatedly
    over one pyramid (the registration scan) to hoist that work out of the
    loop.
    """
    cfg: ModelConfig
    num_classes: int = 19
    feat_len: Optional[int] = None    # override cfg.feat_len (inlier net uses 6)

    def setup(self):
        cfg = self.cfg
        dtype = jnp.dtype(cfg.compute_dtype)
        dtype = None if dtype == jnp.float32 else dtype       # fp32: no casts
        self.mlp_pre = ConvUnit(12 if cfg.use_ppf else 8, dtype=dtype)
        self.enc = [DilatedResBlock(d, dtype=dtype) for d in cfg.d_out]
        self.mlp_mid = ConvUnit(2 * cfg.d_out[-1], dtype=dtype)
        self.dec = [ConvUnit(2 * cfg.d_out[max(len(cfg.d_out) - j - 2, 0)],
                             dtype=dtype)
                    for j in range(len(cfg.d_out))]
        self.mlp_out = nn.Dense(cfg.out_feat_dim, use_bias=False, dtype=dtype,
                                kernel_init=nn.initializers.he_normal())
        self.dropout = nn.Dropout(rate=cfg.dropout_rate)
        # (out_feat_dim, 32, C) widths are all OUTPUT layers (input width is
        # inferred), so on 64-d features this is 64 -> 64 -> 32 -> C = the
        # reference's fc_label exactly (RandLANet.py:284); fc_norm='batch'
        # additionally mirrors its BatchNorm1d flavor (do_bn=True)
        self.fc_label = MLP((cfg.out_feat_dim, 32, self.num_classes),
                            norm=cfg.fc_norm, dtype=dtype)

    def pos_cache(self, pyr: Pyramid) -> Tuple[PosEnc, ...]:
        """Per-encoder-level LocSE projections — scan-invariant."""
        return tuple(self.enc[i].pos_encode(pyr.xyz[i], pyr.neigh_idx[i])
                     for i in range(len(self.enc)))

    def __call__(self, features: jnp.ndarray, pyr: Pyramid,
                 train: bool = False,
                 pos_cache: Optional[Tuple[PosEnc, ...]] = None
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        cfg = self.cfg
        num_layers = cfg.num_layers
        d_mid = cfg.d_out

        if cfg.use_ppf:
            # features must carry xyz + normals in the first 6 channels
            grouped = ppf_grouping(features[..., :3], features[..., 3:6],
                                   pyr.neigh_idx[0])           # (..., N, K, 10)
            x = self.mlp_pre(grouped)
            x = jnp.mean(x, axis=-2)                           # (..., N, 12)
        else:
            x = self.mlp_pre(features)                         # (..., N, 8)

        # ---------------- encoder ----------------
        # skip source (cfg.randla_skips docstring): 'pre' keeps each level's
        # full-width encoder output (default); 'post' keeps the POOLED
        # features entering the next level — the reference's scheme
        # (f_encoder_list[-j-2], RandLANet.py:339-359), required for
        # weight-level checkpoint import
        post_skips = cfg.randla_skips == "post"
        skips = []
        for i in range(num_layers):
            x = self.enc[i](x, pyr.xyz[i], pyr.neigh_idx[i],
                            pos=pos_cache[i] if pos_cache else None)
            if not post_skips or i == 0:
                skips.append(x)                                # (..., Nl, 2*d)
            x = max_pool_neighbours(x, pyr.pool_idx[i])        # (..., N{l+1}, 2*d)
            if post_skips and i < num_layers - 1:
                skips.append(x)                                # level i+1 skip

        x = self.mlp_mid(x)

        # ---------------- decoder ----------------
        for j in range(num_layers):
            lvl = num_layers - j - 1                           # level to restore
            up = nearest_interpolate(x, pyr.interp_idx[lvl])   # (..., Nl, C)
            cat = jnp.concatenate([skips[lvl], up], axis=-1)
            x = self.dec[j](cat)

        feat = self.mlp_out(x).astype(jnp.float32)             # (..., N, C_out)

        logits = self.dropout(feat, deterministic=not train)
        logits = self.fc_label(logits).astype(jnp.float32)     # (..., N, classes)
        return feat, logits
