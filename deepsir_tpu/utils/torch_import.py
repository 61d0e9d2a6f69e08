"""PyTorch-checkpoint import shim for weight-level parity validation.

Maps a reference-trained DeepSIR state_dict (the torch layout of
/root/reference/network/model.py:119-207 + RandLANet.py:12-310) onto this
repo's flax parameter tree, so a reference checkpoint runs through OUR
forward/eval drivers (SURVEY.md §5.4; reference load path
common/torch_utils.py:104-139, train.py:347-360).

Layout rules:
  * torch Conv1d/Conv2d 1x1 / Linear weights (out, in[, 1[, 1]]) become
    flax Dense kernels (in, out): squeeze + transpose.
  * the backbone's MLP2D norm is GroupNorm in BOTH frameworks
    (RandLANet.py:58-107): scale/bias map 1:1.
  * the FC/MLP stacks (fc_label, mlp_feat, mlp_att, mlp_proj;
    RandLANet.py:12-55) use BatchNorm1d in the reference. In eval mode BN
    is a frozen per-channel affine, so running_mean/var/gamma/beta are
    FOLDED into the preceding conv's kernel/bias. The imported tree
    therefore targets a Network built with ``fc_norm='none'`` (no norm
    parameters at those spots) and is exact for INFERENCE; it is not a
    training-resumable equivalent (BN statistics stop updating — the same
    contract as the reference's own model.eval()).

Reference Sequential indexing for MLP(channels, do_bn=True): layer k's conv
sits at index 3*k (conv, bn, act triplets for every non-final layer), with
its BatchNorm at 3*k + 1 for k < n_layers - 1.
"""
from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

_BN_EPS = 1e-5  # torch BatchNorm1d default


def load_torch_state(path: str) -> Dict[str, np.ndarray]:
    """Load a reference .pth into {key: np.ndarray} (CPU, no code objects)."""
    import torch
    payload = torch.load(path, map_location="cpu", weights_only=True)
    state = payload.get("state_dict", payload)
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
            for k, v in state.items()}


def _dense_kernel(w: np.ndarray) -> np.ndarray:
    w = np.asarray(w)
    while w.ndim > 2:
        assert w.shape[-1] == 1, f"not a 1x1 conv: {w.shape}"
        w = w[..., 0]
    return np.ascontiguousarray(w.T)


def _fold_bn(kernel: np.ndarray, bias: np.ndarray, sd, prefix: str
             ) -> Tuple[np.ndarray, np.ndarray]:
    """Fold an eval-mode BatchNorm (y = gamma*(x-mean)/sqrt(var+eps)+beta)
    into the preceding Dense: kernel' = kernel*s, bias' = (bias-mean)*s+beta,
    with s = gamma / sqrt(var + eps)."""
    gamma = sd[f"{prefix}.weight"]
    beta = sd[f"{prefix}.bias"]
    mean = sd[f"{prefix}.running_mean"]
    var = sd[f"{prefix}.running_var"]
    s = gamma / np.sqrt(var + _BN_EPS)
    return kernel * s[None, :], (bias - mean) * s + beta


class _Mapper:
    def __init__(self, sd: Dict[str, np.ndarray]):
        self.sd = sd
        self.out: Dict[Tuple[str, ...], np.ndarray] = {}
        self.used = set()

    def _get(self, key: str) -> np.ndarray:
        self.used.add(key)
        return self.sd[key]

    def conv_unit(self, dst: Tuple[str, ...], src: str) -> None:
        """MLP2D = conv + GroupNorm (+ act) -> ConvUnit (RandLANet.py:58-107)."""
        self.out[dst + ("Dense_0", "kernel")] = _dense_kernel(
            self._get(f"{src}.conv.weight"))
        self.out[dst + ("Dense_0", "bias")] = self._get(f"{src}.conv.bias")
        self.out[dst + ("GroupNorm_0", "scale")] = self._get(f"{src}.norm.weight")
        self.out[dst + ("GroupNorm_0", "bias")] = self._get(f"{src}.norm.bias")

    def att_pooling(self, dst: Tuple[str, ...], src: str) -> None:
        """Att_pooling = score conv (no bias) + MLP2D (RandLANet.py:140-157)."""
        self.out[dst + ("Dense_0", "kernel")] = _dense_kernel(
            self._get(f"{src}.fc.weight"))
        self.conv_unit(dst + ("ConvUnit_0",), f"{src}.mlp")

    def mlp_stack(self, dst: Tuple[str, ...], src: str, n_layers: int) -> None:
        """Reference MLP/FC helper (RandLANet.py:12-55): BN folded into the
        conv of every non-final layer; final layer has no BN/act."""
        for k in range(n_layers):
            kern = _dense_kernel(self._get(f"{src}.{3 * k}.weight"))
            bias = self._get(f"{src}.{3 * k}.bias")
            if k < n_layers - 1:
                self.used.update(
                    f"{src}.{3 * k + 1}.{p}" for p in
                    ("weight", "bias", "running_mean", "running_var",
                     "num_batches_tracked"))
                kern, bias = _fold_bn(kern, bias, self.sd, f"{src}.{3 * k + 1}")
            unit = dst + (f"ConvUnit_{k}",)
            self.out[unit + ("Dense_0", "kernel")] = kern
            self.out[unit + ("Dense_0", "bias")] = bias

    def randla(self, dst: Tuple[str, ...], src: str, num_layers: int,
               num_label_layers: int = 3) -> None:
        """One RandLA backbone (RandLANet.py:237-310)."""
        self.conv_unit(dst + ("mlp_pre",), f"{src}.mlp_pre")
        for i in range(num_layers):
            d, s = dst + (f"enc_{i}",), f"{src}.dilated_res_blocks.{i}"
            self.conv_unit(d + ("mlp1",), f"{s}.mlp1")
            self.conv_unit(d + ("mlp2",), f"{s}.mlp2")
            self.conv_unit(d + ("mlp_skip",), f"{s}.mlp_skip")
            self.conv_unit(d + ("lfa", "mlp1"), f"{s}.lfa.mlp1")
            self.conv_unit(d + ("lfa", "mlp2"), f"{s}.lfa.mlp2")
            self.att_pooling(d + ("lfa", "att_pooling_1"),
                             f"{s}.lfa.att_pooling_1")
            self.att_pooling(d + ("lfa", "att_pooling_2"),
                             f"{s}.lfa.att_pooling_2")
        self.conv_unit(dst + ("mlp_mid",), f"{src}.mlp_mid")
        for j in range(num_layers):
            self.conv_unit(dst + (f"dec_{j}",), f"{src}.decoder_blocks.{j}")
        self.out[dst + ("mlp_out", "kernel")] = _dense_kernel(
            self._get(f"{src}.mlp_out.weight"))
        self.mlp_stack(dst + ("fc_label",), f"{src}.fc_label", num_label_layers)


def import_reference_state(sd: Dict[str, np.ndarray], pipeline: str,
                           num_layers: int = 4) -> Dict:
    """Map a reference state_dict to this repo's `{'params': ...}` tree.

    The target Network must be built with ``fc_norm='none'`` (module
    docstring). Raises KeyError on any missing source key; leftover
    source keys (beyond num_batches_tracked and the frozen label_weights
    buffer) raise, so silent partial imports are impossible.
    """
    m = _Mapper(sd)
    m.randla(("feat_extractor",), "feat_extractor", num_layers)
    if pipeline != "label":
        m.mlp_stack(("mlp_feat",), "mlp_feat", 3)
        m.mlp_stack(("mlp_att",), "mlp_att", 5)
        m.mlp_stack(("mlp_proj",), "mlp_proj", 1)
    if pipeline == "align":
        m.randla(("inlier_model",), "inlier_model", num_layers)

    leftovers = [k for k in sd
                 if k not in m.used
                 and not k.endswith("num_batches_tracked")
                 and k != "label_weights"]
    assert not leftovers, f"unmapped reference keys: {leftovers[:8]}"

    from flax.traverse_util import unflatten_dict
    tree = unflatten_dict({k: np.asarray(v, dtype=np.float32)
                           for k, v in m.out.items()})
    return {"params": tree}


def import_reference_checkpoint(path: str, pipeline: str,
                                params_template=None, num_layers: int = 4
                                ) -> Dict:
    """Load + map a reference .pth. If `params_template` (an initialized
    fc_norm='none' Network tree) is given, the imported tree is validated
    leaf-by-leaf against it: identical key sets and shapes, or ValueError."""
    params = import_reference_state(load_torch_state(path), pipeline,
                                    num_layers)
    if params_template is not None:
        from flax import serialization
        from flax.traverse_util import flatten_dict
        got = flatten_dict(params["params"])
        want = flatten_dict(
            serialization.to_state_dict(params_template)["params"])
        missing = sorted(set(want) - set(got))
        extra = sorted(set(got) - set(want))
        if missing or extra:
            raise ValueError(f"tree mismatch: missing {missing[:5]} "
                             f"extra {extra[:5]}")
        for k in want:
            if np.shape(got[k]) != np.shape(want[k]):
                raise ValueError(f"shape mismatch at {k}: "
                                 f"{np.shape(got[k])} vs {np.shape(want[k])}")
        # rebuild through the template so the result carries the template's
        # exact pytree structure (FrozenDict vs dict etc.)
        params = serialization.from_state_dict(params_template, params)
    return params
