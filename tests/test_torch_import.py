"""Weight-level parity: reference-trained PyTorch checkpoints imported into
the flax tree must reproduce the torch forward on identical inputs.

This is the validation layer the golden-value tests (parameter-free math,
test_parity_reference.py) do not cover: it exercises the full parameter
mapping (conv transposes, GroupNorm 1:1, BatchNorm eval-mode folding —
utils/torch_import.py) through real trained weights. It would have caught
the round-3 matmul-precision bug in minutes (same checkpoint, divergent
descriptors).

Checkpoints: logs_ref_label60/*.pth — scripts/train_reference_synthetic.py
artifacts (label backbone trained 60 epochs on this machine; feat/align
heads at their torch init, which is irrelevant for parity: weights are
weights). Reference load path being replicated:
/root/reference/common/torch_utils.py:104-139.
"""
from __future__ import annotations

import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference"
CKPT_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "logs_ref_label60")

pytestmark = [
    pytest.mark.skipif(not os.path.isdir(REF),
                       reason="reference checkout not present"),
    pytest.mark.skipif(not os.path.exists(
        os.path.join(CKPT_DIR, "label_final.pth")),
        reason="reference-trained checkpoints not on disk"),
]

torch = pytest.importorskip("torch")
if REF not in sys.path:
    sys.path.insert(0, REF)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from deepsir_tpu.config import ModelConfig  # noqa: E402
from deepsir_tpu.models.network import Network  # noqa: E402
from deepsir_tpu.models.randla import RandLA  # noqa: E402
from deepsir_tpu.ops.pyramid import build_pyramid  # noqa: E402
from deepsir_tpu.utils.torch_import import (import_reference_state,  # noqa: E402
                                            load_torch_state)

N = 512
RATIOS = (4, 4, 4, 4)


def ref_args(feat_len=3):
    return types.SimpleNamespace(
        pipeline="align", feat_len=feat_len, use_ppf=False, num_points=N,
        num_sub=-1, num_knn=16, sub_sampling_ratio=list(RATIOS),
        d_out=[16, 64, 128, 256], out_feat_dim=64, clip_weight_thresh=0.05,
        loss_type="mae", wt_ptDist_loss=1.0, wt_inlier_loss=1.0,
        wt_pose_loss=0.0, loss_discount_factor=0.5, thres_radius=0.9,
        det_loss_weight=1.0, chamfer_loss_weight=0.0, feat_loss_weight=0.0,
        no_slack=False, num_sk_iter=5, num_train_reg_iter=2, num_reg_iter=5)


def our_cfg(feat_len=3):
    # the import layout: BN folded (fc_norm none) + the reference's
    # post-pool decoder skips
    return ModelConfig(feat_len=feat_len, num_points=N, fc_norm="none",
                       randla_skips="post", knn_recall_target=1.0)


def pyramid_pair(xyz):
    """Our per-level Pyramid + the reference's concatenated tensors built
    from the SAME indices (so KNN tie-breaks cannot differ)."""
    pyr = build_pyramid(jnp.asarray(xyz), 16, RATIOS, recall_target=1.0)
    cat = lambda leaves, ax=1: np.concatenate(
        [np.asarray(x) for x in leaves], axis=ax)
    xyz_cat = torch.from_numpy(cat(pyr.xyz)).float()
    neigh_cat = torch.from_numpy(cat(pyr.neigh_idx)).long()
    sub_cat = torch.from_numpy(cat(pyr.pool_idx)).long()
    interp_cat = torch.from_numpy(
        cat([np.asarray(i)[..., None] for i in pyr.interp_idx])).long()
    return pyr, (xyz_cat, neigh_cat, sub_cat, interp_cat)


def subset(sd, prefix):
    return {k[len(prefix):]: torch.from_numpy(np.asarray(v))
            for k, v in sd.items() if k.startswith(prefix)}


def assert_backbone_parity(sd_prefix_state, our_params, feat_len, rng):
    """One RandLA: torch forward vs our forward with imported weights."""
    num_classes = sd_prefix_state["fc_label.6.bias"].shape[0]
    from network.RandLANet import RandLA as TorchRandLA
    tm = TorchRandLA(ref_args(feat_len), num_classes=num_classes)
    missing, unexpected = tm.load_state_dict(
        {k: torch.as_tensor(v) for k, v in sd_prefix_state.items()})
    assert not missing and not unexpected
    tm.eval()

    feats = rng.normal(size=(1, N, feat_len)).astype(np.float32)
    pyr, (xyz_cat, neigh_cat, sub_cat, interp_cat) = pyramid_pair(
        feats[..., :3])
    with torch.no_grad():
        t_feat, _, t_logits = tm(torch.from_numpy(feats), xyz_cat,
                                 neigh_cat, sub_cat, interp_cat)

    om = RandLA(our_cfg(feat_len), num_classes=num_classes)
    j_feat, j_logits = om.apply(our_params, jnp.asarray(feats), pyr,
                                train=False)
    np.testing.assert_allclose(np.asarray(j_feat),
                               t_feat.permute(0, 2, 1).numpy(),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(j_logits),
                               t_logits.permute(0, 2, 1).numpy(),
                               rtol=1e-4, atol=1e-4)


def test_label_backbone_forward_parity(rng):
    sd = load_torch_state(os.path.join(CKPT_DIR, "label_final.pth"))
    imported = import_reference_state(sd, "label")
    assert_backbone_parity(subset(sd, "feat_extractor."),
                           {"params": imported["params"]["feat_extractor"]},
                           feat_len=3, rng=rng)


def test_align_inlier_backbone_forward_parity(rng):
    sd = load_torch_state(os.path.join(CKPT_DIR, "align_final.pth"))
    imported = import_reference_state(sd, "align")
    assert_backbone_parity(subset(sd, "inlier_model."),
                           {"params": imported["params"]["inlier_model"]},
                           feat_len=6, rng=rng)


def test_align_aggregation_forward_parity(rng):
    """The descriptor head (mlp_feat/att/proj + L2 norm): reference
    Network.aggregation (model.py:209-235) vs our aggregate_side, with the
    BatchNorm stacks folded to frozen affines."""
    sd = load_torch_state(os.path.join(CKPT_DIR, "align_final.pth"))
    imported = import_reference_state(sd, "align")

    from network.model import Network as TorchNetwork
    tm = TorchNetwork(ref_args(3))
    tm.load_state_dict({k: torch.as_tensor(v) for k, v in sd.items()})
    tm.eval()

    xyz = rng.normal(size=(1, N, 3)).astype(np.float32)
    feat = rng.normal(size=(1, N, 64)).astype(np.float32)
    score = rng.uniform(size=(1, N)).astype(np.float32)
    with torch.no_grad():
        t_src, _ = tm.aggregation(
            torch.from_numpy(xyz).permute(0, 2, 1),
            torch.from_numpy(xyz).permute(0, 2, 1),
            torch.from_numpy(feat).permute(0, 2, 1),
            torch.from_numpy(feat).permute(0, 2, 1),
            score_src=torch.from_numpy(score),
            score_ref=torch.from_numpy(score))

    om = Network(our_cfg(3), pipeline="align")
    j = om.apply(imported, jnp.asarray(xyz), jnp.asarray(feat),
                 jnp.asarray(score), method="aggregate_side")
    np.testing.assert_allclose(np.asarray(j),
                               t_src.permute(0, 2, 1).numpy(),
                               rtol=1e-4, atol=1e-4)


def test_import_validates_against_template(rng):
    """Template validation: the imported tree must match an fc_norm='none'
    Network init leaf-for-leaf (catches silent partial imports)."""
    from deepsir_tpu.utils.torch_import import import_reference_checkpoint
    from deepsir_tpu.models import ForwardOptions
    from deepsir_tpu.training import device_batch
    from deepsir_tpu.config import Config

    cfg = Config(pipeline="align", model=our_cfg(3))
    arrays = {"points_src": rng.normal(size=(1, N, 3)).astype(np.float32),
              "points_ref": rng.normal(size=(1, N, 3)).astype(np.float32),
              "transform_gt": np.eye(3, 4, dtype=np.float32)[None]}
    model = Network(cfg.model, pipeline="align")
    template = model.init(jax.random.PRNGKey(0), device_batch(cfg, arrays),
                          ForwardOptions(num_iter=1))
    params = import_reference_checkpoint(
        os.path.join(CKPT_DIR, "align_final.pth"), "align",
        params_template=template)
    assert jax.tree_util.tree_structure(params) == \
        jax.tree_util.tree_structure(template)
