"""Training state and the jitted train/eval steps.

Re-design of the reference's training loop internals
(/root/reference/train.py:38-48, 303-488) as pure jitted functions:

  * the WHOLE step — index-pyramid construction, three RandLA passes,
    tiled matching, inlier weighting, Kabsch solves, loss, grads, and the
    optimizer update — is one XLA program (the reference crosses the
    host/device boundary several times per step: CPU KNN, CPU fp64 SVD,
    CPU hash-based correspondence check)
  * staged freezing (label -> feat -> align, reference model.py:197-207)
    is an optax.multi_transform mask, not requires_grad mutation
  * the NaN-guard (reference train.py:414-446: skip the update on non-finite
    loss/grads or SVD failure) is an in-graph select on the update pytree
  * lr schedule: exponential decay per lr_decay_epoch epochs with a floor
    (reference update_learning_rate, train.py:38-48)
"""
from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from deepsir_tpu.config import Config
from deepsir_tpu.losses import (det_des_loss, scan_alignment_loss,
                                semantic_loss)
from deepsir_tpu.models import ForwardOptions, Network
from deepsir_tpu.models.network import PairBatch
from deepsir_tpu.ops.pyramid import build_pyramid

# parameter groups trainable per pipeline (reference freeze_model /
# freeze_model_2, model.py:197-207)
TRAINABLE_GROUPS = {
    "label": {"feat_extractor"},
    "feat": {"mlp_feat", "mlp_att", "mlp_proj"},
    "align": {"inlier_model"},
}


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def make_lr_schedule(cfg: Config, steps_per_epoch: int):
    """Staircase exponential decay with a floor (reference train.py:38-48)."""
    return optax.exponential_decay(
        init_value=cfg.train.lr,
        transition_steps=max(1, cfg.train.lr_decay_epoch * steps_per_epoch),
        decay_rate=cfg.train.lr_decay_ratio,
        staircase=True,
        end_value=cfg.train.lr_clip)


def make_optimizer(cfg: Config, steps_per_epoch: int):
    """Adam on the pipeline's trainable groups; frozen groups get zeroed
    updates via multi_transform.

    Pure function of (cfg, steps_per_epoch) — callers that rebuild it (e.g.
    the train driver after create_train_state) get a structurally identical
    transform, so opt_state remains compatible by construction."""
    trainable = TRAINABLE_GROUPS[cfg.pipeline]

    def label_fn(tree):
        def leaf_label(path, _):
            keys = {getattr(p, "key", None) for p in path}
            return "train" if keys & trainable else "freeze"
        return jax.tree_util.tree_map_with_path(leaf_label, tree)

    tx = optax.multi_transform(
        {"train": optax.adam(make_lr_schedule(cfg, steps_per_epoch)),
         "freeze": optax.set_to_zero()},
        label_fn)
    return tx


def create_train_state(cfg: Config, example_batch: Dict[str, np.ndarray],
                       steps_per_epoch: int = 1000, seed: int = 0
                       ) -> Tuple[Network, TrainState]:
    model = Network(cfg.model, pipeline=cfg.pipeline)
    batch = device_batch(cfg, example_batch)
    opts = ForwardOptions(num_iter=cfg.model.num_train_reg_iter)
    # jit with opts closed over (it carries static python bools); one compiled
    # init program instead of op-by-op dispatch
    init_fn = jax.jit(lambda rng, b: model.init(rng, b, opts))
    params = init_fn(jax.random.PRNGKey(seed), batch)
    tx = make_optimizer(cfg, steps_per_epoch)
    opt_state = tx.init(params)
    return model, TrainState(params, opt_state, jnp.zeros((), jnp.int32))


def device_batch(cfg: Config, arrays: Dict[str, np.ndarray]) -> PairBatch:
    """Host batch dict -> PairBatch with pyramids built on-device.

    This call is jit-compatible; in the jitted step it fuses into the same
    XLA program as the model.
    """
    m = cfg.model
    src = jnp.asarray(arrays["points_src"])
    ref = jnp.asarray(arrays["points_ref"])
    if src.dtype in (jnp.float16, jnp.bfloat16):
        # compact-transfer mode: the host ships half-width point payloads
        # (the 27 MB/s host->device relay is the sustained-throughput bound
        # here — see BASELINE.md); all math runs fp32 after this upcast
        src = src.astype(jnp.float32)
        ref = ref.astype(jnp.float32)
    sample = "strided" if m.pyramid_order == "morton" else "first"
    halo = m.knn_window_halo if m.pyramid_order == "morton" else 0
    pyr_src = build_pyramid(src[..., :3], m.num_knn, m.sub_sampling_ratio,
                            recall_target=m.knn_recall_target,
                            sample=sample, window_halo=halo)
    pyr_ref = build_pyramid(ref[..., :3], m.num_knn, m.sub_sampling_ratio,
                            recall_target=m.knn_recall_target,
                            sample=sample, window_halo=halo)
    return PairBatch(
        points_src=src, points_ref=ref,
        pyramid_src=pyr_src, pyramid_ref=pyr_ref,
        transform_gt=jnp.asarray(arrays["transform_gt"]),
        labels_src=jnp.asarray(arrays["labels_src"]) if "labels_src" in arrays else None,
        labels_ref=jnp.asarray(arrays["labels_ref"]) if "labels_ref" in arrays else None,
        matches=jnp.asarray(arrays["matches"]) if "matches" in arrays else None,
        num_matches=jnp.asarray(arrays["num_matches"]) if "num_matches" in arrays else None,
        mask_src=jnp.asarray(arrays["mask_src"]) if "mask_src" in arrays else None,
        mask_ref=jnp.asarray(arrays["mask_ref"]) if "mask_ref" in arrays else None)


def compute_loss(cfg: Config, model: Network, params, batch: PairBatch,
                 opts: ForwardOptions, train: bool, dropout_rng
                 ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Pipeline-dispatched loss (reference train.py:403-426)."""
    rngs = {"dropout": dropout_rng} if train else None
    if cfg.pipeline == "align":
        transforms, out = model.apply(params, batch, opts, train=train,
                                      rngs=rngs)
        # BCE label source: exact in-graph geometric test by default;
        # cfg.data.gt_match_lists selects the reference's list-based lookup
        # (the data layer ships `matches` only in that mode)
        use_lists = cfg.data.gt_match_lists and batch.matches is not None
        loss_dic = scan_alignment_loss(
            transforms, out.inlier_logits, out.pred_idx, out.pt_src,
            batch.transform_gt, batch.matches, cfg.loss,
            pt_ref=None if use_lists else out.pt_ref,
            mask_src=batch.mask_src)
        aux = {"loss": loss_dic["total"],
               "invalid": jnp.any(out.invalid),
               # per-iteration loss terms for train-time summaries
               # (reference save_summaries scalars, train.py:51-110)
               "losses": {k: v for k, v in loss_dic.items() if k != "total"}}
        return loss_dic["total"], aux

    _, out = model.apply(params, batch, train=train, rngs=rngs)
    if cfg.pipeline == "feat":
        loss, acc = det_des_loss(out.feat_src, out.feat_ref,
                                 out.xyz_src, out.xyz_ref,
                                 out.score_src, out.score_ref,
                                 batch.transform_gt, cfg.loss)
        return loss, {"loss": loss, "acc": acc,
                      "invalid": jnp.zeros((), bool)}
    # label
    loss_s, acc_s = semantic_loss(out.logits_src, batch.labels_src)
    loss_r, acc_r = semantic_loss(out.logits_ref, batch.labels_ref)
    loss = loss_s + loss_r
    return loss, {"loss": loss, "acc": (acc_s + acc_r) / 2,
                  "invalid": jnp.zeros((), bool)}


def make_train_step(cfg: Config, model: Network, tx):
    """Build the jitted train step: (state, arrays, rng) -> (state, aux)."""
    opts = ForwardOptions(num_iter=cfg.model.num_train_reg_iter)

    @jax.jit
    def train_step(state: TrainState, arrays: Dict[str, jnp.ndarray],
                   rng: jax.Array):
        batch = device_batch(cfg, arrays)

        def loss_fn(p):
            return compute_loss(cfg, model, p, batch, opts, True, rng)

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)

        # NaN-guard: skip the whole update on non-finite loss/grads or an
        # invalid SVD in the forward pass (reference train.py:414-446)
        grads_ok = jnp.all(jnp.asarray(
            [jnp.all(jnp.isfinite(g)) for g in jax.tree_util.tree_leaves(grads)]))
        ok = grads_ok & jnp.isfinite(loss) & ~aux["invalid"]

        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)

        def select(new, old):
            return jax.tree_util.tree_map(
                lambda a, b: jnp.where(ok, a, b), new, old)

        state = TrainState(
            params=select(new_params, state.params),
            opt_state=select(new_opt_state, state.opt_state),
            step=state.step + 1)
        aux = dict(aux, skipped=~ok)
        return state, aux

    return train_step


def make_eval_step(cfg: Config, model: Network, num_iter: Optional[int] = None,
                   refine_stride: int = 1):
    """Jitted eval step for the align pipeline: arrays -> (transforms, aux).

    refine_stride is plumbed ONLY by the test-time driver (test.py) — the
    train loop's validation keeps the reference's full-N iteration scheme so
    checkpoint scores stay comparable across configs (ForwardOptions
    docstring)."""
    opts = ForwardOptions(num_iter=num_iter or cfg.model.num_reg_iter,
                          clip_weight=True, refine_stride=refine_stride)

    @jax.jit
    def eval_step(params, arrays: Dict[str, jnp.ndarray]):
        batch = device_batch(cfg, arrays)
        transforms, out = model.apply(params, batch, opts, train=False)
        return transforms, out

    return eval_step


def make_forward_step(cfg: Config, model: Network):
    """Jitted forward for label/feat pipelines."""

    @jax.jit
    def fwd(params, arrays: Dict[str, jnp.ndarray]):
        batch = device_batch(cfg, arrays)
        _, out = model.apply(params, batch, train=False)
        return out

    return fwd


def batch_arrays_only(batch: Dict) -> Dict[str, np.ndarray]:
    """Strip non-array entries (meta) before feeding a jitted step."""
    return {k: v for k, v in batch.items()
            if isinstance(v, np.ndarray)}
