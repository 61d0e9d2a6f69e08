#!/usr/bin/env python
"""Training driver — same CLI surface as the reference's train.py
(/root/reference/train.py): flag parse, logger + run dir, dataset/loader
build, model/optimizer build, checkpoint resume (full or staged partial),
epoch loop with per-pipeline loss dispatch, NaN-step skipping, periodic
tensorboard summaries, periodic validation with best-checkpoint scoring.

TPU-native core: the whole step (pyramid build -> forwards -> loss -> grads
-> update) is one jitted XLA program (deepsir_tpu/training.py); this file is
only the host-side loop around it.

Usage mirrors the reference, e.g.:
  python train.py --pipeline label --dataset_type KITTI --dataset_path ...
  python train.py --pipeline align --dataset_type Synthetic --dev
"""
from __future__ import annotations

import os
import sys

import jax
import numpy as np

from deepsir_tpu.config import config_from_args, train_argument_parser
from deepsir_tpu.data.base import Loader
from deepsir_tpu.data.datasets import get_train_datasets
from deepsir_tpu.evaluation import evaluate_align
from deepsir_tpu.losses.semantic import SemanticMetric, confusion_matrix
from deepsir_tpu.training import (batch_arrays_only, create_train_state,
                                  make_eval_step, make_forward_step,
                                  make_lr_schedule, make_optimizer,
                                  make_train_step)
from deepsir_tpu.utils.checkpoint import CheckPointManager, partial_restore
from deepsir_tpu.utils.logging import prepare_logger
from deepsir_tpu.utils.metrics import compute_metrics, summarize_metrics
from deepsir_tpu.utils.prefetch import device_prefetch
from deepsir_tpu.utils.profiling import enable_debug_mode, maybe_trace
from deepsir_tpu.utils.timer import Timer


def mesh_summary(writer, step, arrays, pred_transform, tag="val_alignment"):
    """Dump aligned src (red) + ref (green) point meshes to tensorboard
    (reference save_summaries / validate_align mesh dumps,
    train.py:51-110,196-214)."""
    from deepsir_tpu.math import se3_np
    src = se3_np.transform(np.asarray(pred_transform)[0],
                           arrays["points_src"][0, :, :3])
    ref = arrays["points_ref"][0, :, :3]
    pts = np.concatenate([src, ref])[None]
    colors = np.concatenate([
        np.tile([[255, 0, 0]], (len(src), 1)),
        np.tile([[0, 255, 0]], (len(ref), 1))])[None]
    writer.add_mesh(tag, vertices=pts, colors=colors, global_step=step)


def make_validate_step(cfg, model):
    """Build the jitted validation step ONCE (a fresh jax.jit closure per
    validation would recompile the whole graph each time)."""
    if cfg.pipeline == "align":
        return make_eval_step(cfg, model)
    return make_forward_step(cfg, model)


def validate(cfg, model, state, val_loader, logger, val_step,
             writer=None, step=0):
    """Validation sweep -> checkpoint score (reference validate_align/feat/
    label, train.py:113-219; align score = success rate)."""
    if cfg.pipeline == "align":
        eval_step = val_step
        metrics = []
        worst = None                       # (err_t, arrays, transform)
        rand_pick = None                   # uniformly random val sample
        rng_pick = np.random.default_rng(step)
        seen = 0
        for batch in val_loader:
            arrays = batch_arrays_only(batch)
            transforms, _ = eval_step(state.params, arrays)
            m = compute_metrics(arrays["transform_gt"],
                                np.asarray(transforms[-1]),
                                arrays["points_src"], arrays["points_ref"],
                                cfg.train.rte_thresh, cfg.train.rre_thresh,
                                mask_src=arrays.get("mask_src"),
                                mask_ref=arrays.get("mask_ref"))
            metrics.append(m)
            # track the worst AND a uniformly-random sample for the mesh
            # dumps (the reference dumps a random + its worst validation
            # sample, train.py:196-214); reservoir step keeps the random
            # pick uniform without knowing the sweep length up front
            i_bad = int(np.argmax(m["err_t"]))
            if worst is None or m["err_t"][i_bad] > worst[0]:
                worst = (float(m["err_t"][i_bad]),
                         {k: v[i_bad:i_bad + 1] for k, v in arrays.items()},
                         np.asarray(transforms[-1])[i_bad:i_bad + 1])
            bs = len(arrays["transform_gt"])
            j = int(rng_pick.integers(seen + bs))
            if j >= seen:
                i_rand = j - seen
                rand_pick = (
                    {k: v[i_rand:i_rand + 1] for k, v in arrays.items()},
                    np.asarray(transforms[-1])[i_rand:i_rand + 1])
            seen += bs
        merged = {k: np.concatenate([m[k] for m in metrics])
                  for k in metrics[0]}
        summary = summarize_metrics(merged)
        logger.info("Validation: succ %.3f | err_r %.3f deg | err_t %.3g",
                    summary["succ"], summary["err_r_deg_mean"],
                    summary["err_t_mean"])
        if writer is not None and worst is not None:
            mesh_summary(writer, step, worst[1], worst[2],
                         tag="val_alignment_worst")
            mesh_summary(writer, step, rand_pick[0], rand_pick[1],
                         tag="val_alignment_random")
        return summary["succ"]

    fwd = val_step
    if cfg.pipeline == "label":
        metric = SemanticMetric()
        for batch in val_loader:
            arrays = batch_arrays_only(batch)
            out = fwd(state.params, arrays)
            metric.update(confusion_matrix(out.logits_src,
                                           arrays["labels_src"]))
            metric.update(confusion_matrix(out.logits_ref,
                                           arrays["labels_ref"]))
        miou, _, acc = metric.compute()
        logger.info("Validation: mIoU %.3f | acc %.3f", miou, acc)
        return miou

    # feat: negative mean loss as the score
    from deepsir_tpu.losses import det_des_loss
    losses = []
    for batch in val_loader:
        arrays = batch_arrays_only(batch)
        out = fwd(state.params, arrays)
        loss, _ = det_des_loss(out.feat_src, out.feat_ref, out.xyz_src,
                               out.xyz_ref, out.score_src, out.score_ref,
                               arrays["transform_gt"], cfg.loss)
        losses.append(float(loss))
    mean_loss = float(np.mean(losses))
    logger.info("Validation: feat loss %.5f", mean_loss)
    return -mean_loss


def main():
    args = train_argument_parser().parse_args()
    cfg = config_from_args(args)
    # multi-host: connect this process to the coordination service BEFORE
    # any device query, making jax.devices() global (parallel/distributed.py;
    # no-op without the DEEPSIR_COORDINATOR / DEEPSIR_DISTRIBUTED env)
    from deepsir_tpu.parallel.distributed import initialize_from_env
    initialize_from_env()
    from deepsir_tpu.config import apply_matmul_precision
    apply_matmul_precision(cfg)
    logger, log_path = prepare_logger(cfg)
    if cfg.debug:
        enable_debug_mode()
    from deepsir_tpu.utils.logging import snapshot_source
    snapshot_source(log_path)

    from tensorboardX import SummaryWriter
    train_writer = SummaryWriter(os.path.join(log_path, "train"))

    train_set, val_set = get_train_datasets(cfg)
    # drop_last on both loaders: a partial final batch would change the
    # static shapes (extra multi-minute XLA recompile) and break the DP
    # shard divisibility assert
    train_loader = Loader(train_set, cfg.train.batch_size, shuffle=True,
                          seed=cfg.train.seed,
                          num_workers=cfg.data.num_workers, drop_last=True)
    val_loader = Loader(val_set, cfg.train.batch_size, shuffle=False,
                        num_workers=cfg.data.num_workers, drop_last=True)
    logger.info("Train set: %d samples, val set: %d", len(train_set),
                len(val_set))

    steps_per_epoch = max(1, len(train_loader))
    example = batch_arrays_only(next(iter(train_loader)))
    model, state = create_train_state(cfg, example, steps_per_epoch,
                                      seed=cfg.train.seed)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(state.params))
    logger.info("Model built: %d parameters (pipeline=%s)", n_params,
                cfg.pipeline)

    saver = CheckPointManager(os.path.join(log_path, "ckpt"),
                              keep_checkpoint_every_n_hours=1.0)
    step0 = 0
    if cfg.train.resume:
        if cfg.train.load_model_all:
            state, step0 = saver.load(cfg.train.resume, state)
        else:
            # staged partial restore (reference train.py:347-360): load the
            # parameter leaves that match by path+shape, keep the rest fresh
            params, loaded = partial_restore(cfg.train.resume, state.params)
            state = state._replace(params=params)
            logger.info("Partial restore: %d parameter arrays loaded", loaded)

    tx = make_optimizer(cfg, steps_per_epoch)
    if cfg.train.data_parallel and jax.device_count() > 1:
        # DP over the pair batch across every visible device (parallel/):
        # params replicated, batch sharded, XLA inserts the gradient psum
        from deepsir_tpu.parallel import make_sharded_train_step, shard_batch
        from deepsir_tpu.parallel.mesh import make_mesh
        from deepsir_tpu.parallel.sharded import replicate_state
        mesh = make_mesh()
        assert cfg.train.batch_size % mesh.shape["data"] == 0, (
            f"batch_size {cfg.train.batch_size} not divisible by "
            f"{mesh.shape['data']} data-parallel devices")
        logger.info("Data parallel over mesh %s", dict(mesh.shape))
        state = replicate_state(mesh, state)
        train_step = make_sharded_train_step(cfg, model, tx, mesh)
        # prefetch transfer places each batch on the mesh ahead of time
        batch_transfer = lambda arrays: shard_batch(mesh, arrays)
    else:
        train_step = make_train_step(cfg, model, tx)
        batch_transfer = None
    val_step = make_validate_step(cfg, model)
    lr_sched = make_lr_schedule(cfg, steps_per_epoch)

    validate_every = cfg.train.validate_every
    if validate_every < 0:                       # negative = epochs
        validate_every = -validate_every * steps_per_epoch
    # 0 disables periodic validation entirely

    rng = jax.random.PRNGKey(cfg.train.seed)
    timer = Timer()
    step = step0
    skipped = 0
    for epoch in range(cfg.train.max_epochs):
        # device-input double buffering: batch i+1 transfers (or shards, on
        # a DP mesh) while batch i computes — see utils/prefetch.py
        host_batches = (batch_arrays_only(b) for b in train_loader)
        for arrays in device_prefetch(host_batches, transfer=batch_transfer):
            rng, sub = jax.random.split(rng)
            timer.tic()
            with maybe_trace(step):
                state, aux = train_step(state, arrays, sub)
                loss = float(aux["loss"])
            timer.toc()
            step += 1
            skipped += int(aux["skipped"])

            if step % 100 == 0:
                logger.info(
                    "epoch %d step %d | loss %.5f | %.2fs/step | lr %.2e"
                    " | skipped %d", epoch, step, loss, timer.avg,
                    float(lr_sched(step)), skipped)
            if step % cfg.train.summary_every == 0:
                train_writer.add_scalar("loss", loss, step)
                train_writer.add_scalar("lr", float(lr_sched(step)), step)
                # per-iteration loss scalars (reference save_summaries,
                # train.py:51-110: every loss term, per registration iter)
                for k, v in aux.get("losses", {}).items():
                    train_writer.add_scalar(f"losses/{k}", float(v), step)
                for k, v in aux.items():
                    if k not in ("loss", "losses") and np.ndim(v) == 0:
                        train_writer.add_scalar(k, float(v), step)
                if cfg.pipeline == "align" and jax.process_count() == 1:
                    # train-batch mesh dump (reference save_summaries 3D
                    # meshes, train.py:65-96) — one extra eval forward,
                    # amortized over summary_every steps so the steady-state
                    # step timing is unaffected
                    transforms, _ = val_step(state.params, arrays)
                    mesh_summary(train_writer, step,
                                 {k: np.asarray(v) for k, v in arrays.items()},
                                 np.asarray(transforms[-1]),
                                 tag="train_alignment")
            if validate_every > 0 and step % validate_every == 0:
                score = validate(cfg, model, state, val_loader, logger,
                                 val_step, writer=train_writer, step=step)
                train_writer.add_scalar("val_score", score, step)
                saver.save(state, step, score=score)
        logger.info("Epoch %d done (step %d)", epoch, step)

    # final checkpoint; if no validation ever ran, let it become the best
    # so `test.py --resume <ckpt dir>` always finds model_best.msgpack
    final_score = 0.0 if saver.best_step is None else -np.inf
    saver.save(state, step, score=final_score)
    logger.info("Training complete at step %d", step)


if __name__ == "__main__":
    main()
