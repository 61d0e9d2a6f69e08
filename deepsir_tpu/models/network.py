"""Top-level network: label / feat / align pipelines.

TPU-native re-design of the reference's Network
(/root/reference/network/model.py:119-757). One flax module owns the RandLA
feature extractor, the aggregation MLPs and (for align) a second RandLA
inlier network; pipeline dispatch selects which forward method runs. The
whole forward — pyramid-consuming backbone passes, keypoint scoring, tiled
correspondence search, inlier weighting and the weighted-Kabsch solve over
`num_iter` registration iterations — is one pure jittable function with
static shapes.

Input contract (`PairBatch`): clouds are pre-resampled to exactly
cfg.num_points in randomized order (the data layer guarantees this —
the random-subsample pyramid trick depends on it, see ops/pyramid.py).
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from deepsir_tpu.config import ModelConfig
from deepsir_tpu.math import se3
from deepsir_tpu.models.layers import MLP
from deepsir_tpu.models.randla import RandLA
from deepsir_tpu.models.scoring import score_points, top_k_select
from deepsir_tpu.ops.distance import (mutual_gate,
                                      nearest_neighbour_bidirectional,
                                      nearest_neighbour_index)
from deepsir_tpu.ops.gather import gather_points
from deepsir_tpu.ops.pyramid import Pyramid, slice_neighbours
from deepsir_tpu.ops.svd3 import weighted_kabsch


def _matmul_precision(name: str):
    """Trace-time scoped matmul precision (captured into the jaxpr).

    The global default is 'highest' (full fp32 fidelity — the descriptor
    path is precision-sensitive, BASELINE.md round 3); the inlier network
    and the matcher distance matmul are A/B-verified insensitive and run
    at cfg.{inlier,matcher}_matmul_precision (default: TPU-native bf16
    passes) — together ~25% of device time per pair at 'highest'.
    """
    return jax.default_matmul_precision(name)


class PairBatch(NamedTuple):
    """Static-shaped batch of cloud pairs (the device-side contract that
    replaces the reference's collate dict, data_base.py:196-219)."""
    points_src: jnp.ndarray            # (B, N, C) xyz + extra channels
    points_ref: jnp.ndarray            # (B, N, C)
    pyramid_src: Pyramid               # per-level indices, batch-leading
    pyramid_ref: Pyramid
    transform_gt: jnp.ndarray          # (B, 3, 4)
    labels_src: Optional[jnp.ndarray] = None   # (B, N) int32
    labels_ref: Optional[jnp.ndarray] = None
    matches: Optional[jnp.ndarray] = None      # (B, M_cap, 2) int32, -1 padded
    num_matches: Optional[jnp.ndarray] = None  # (B,)
    # validity masks for ragged test-time clouds padded to the static size
    # (1.0 = real point, 0.0 = tile-duplicate padding; None = all valid).
    # The reference keeps natural sizes at test (data_base.py:271-283);
    # masks recover its statistics under the TPU static-shape contract.
    mask_src: Optional[jnp.ndarray] = None     # (B, N) float32
    mask_ref: Optional[jnp.ndarray] = None


class PairOutput(NamedTuple):
    """forward_pair endpoints (reference model.py:609-666)."""
    feat_src: jnp.ndarray              # (B, N, C) L2-normalized descriptors
    feat_ref: jnp.ndarray
    xyz_src: jnp.ndarray               # (B, N, 3)
    xyz_ref: jnp.ndarray
    logits_src: jnp.ndarray            # (B, N, num_classes)
    logits_ref: jnp.ndarray
    score_src: Optional[jnp.ndarray] = None    # (B, N)
    score_ref: Optional[jnp.ndarray] = None


class AlignOutput(NamedTuple):
    """forward_align endpoints (reference model.py:520-607)."""
    transforms: jnp.ndarray            # (iters, B, 3, 4) cumulative src->ref
    inlier_logits: jnp.ndarray         # (iters, B, N)
    pred_idx: jnp.ndarray              # (iters, B, N) matched ref index
    invalid: jnp.ndarray               # (B,) bool — any SVD failure
    pt_src: jnp.ndarray                # (B, N, 3) untransformed source
    pt_ref: jnp.ndarray                # (B, N, 3)
    score_src: jnp.ndarray             # (B, N)
    score_ref: jnp.ndarray


class ForwardOptions(NamedTuple):
    """Static forward options (the reference's `opt` tuple, model.py:533)."""
    num_iter: int = 2
    clip_weight: bool = False
    # coarse-refine split (ModelConfig.refine_stride docstring): iterations
    # >=2 on every stride-th source point. Lives HERE rather than being read
    # off ModelConfig inside the model so that only eval drivers opt in —
    # the train-loop's validation forward (also train=False) must keep
    # scoring checkpoints on the reference's full-N iteration scheme
    refine_stride: int = 1


class Network(nn.Module):
    cfg: ModelConfig
    pipeline: str = "align"            # 'label' | 'feat' | 'align'
    # optional correspondence-search override, (B,N,C),(B,M,C) -> (B,N) int32.
    # Parameter-free, so params from a matcher-less Network load unchanged;
    # the multi-chip path injects the ring-sharded matcher here
    # (parallel.matching.make_ring_matcher) to split ref points over the
    # mesh's model axis.
    matcher: Optional[Callable] = None
    # stop_gradient at the staged-freeze boundary (reference requires_grad
    # freeze, model.py:197-207): the feat pipeline trains only the
    # aggregation MLPs and align only the inlier model, so backward through
    # the frozen RandLA backbone(s) is pure waste — the optax set_to_zero
    # mask (training.py) would discard those grads anyway. False only for
    # the equivalence test (tests/test_training.py).
    stop_frozen_gradients: bool = True

    def setup(self):
        cfg = self.cfg
        assert self.pipeline in ("label", "feat", "align")
        self.feat_extractor = RandLA(cfg, num_classes=cfg.num_classes)

        if self.pipeline != "label":
            c = cfg.out_feat_dim
            dtype = jnp.dtype(cfg.compute_dtype)
            dtype = None if dtype == jnp.float32 else dtype
            # aggregation MLPs (reference model.py:158-170)
            # cfg.fc_norm='batch' mirrors the reference's BatchNorm1d on
            # these stacks (its MLP helper, RandLANet.py:35-55)
            self.mlp_feat = MLP((c, 128, c), norm=cfg.fc_norm, dtype=dtype)
            self.mlp_att = MLP((32, 64, 128, 256, c), norm=cfg.fc_norm,
                               dtype=dtype)
            self.mlp_proj = MLP((c,), norm=cfg.fc_norm, dtype=dtype)

        if self.pipeline == "align":
            # second RandLA over [src_xyz ; matched_ref_xyz] -> 1 logit/point
            # (reference model.py:191-193)
            from deepsir_tpu.config import replace as cfg_replace
            # the inlier net optionally runs bf16 activations (params stay
            # fp32, so checkpoints are unaffected): it is the A/B-proven
            # precision-INSENSITIVE subgraph (see inlier_matmul_precision)
            # and the scan's largest per-iteration cost on an HBM-bound
            # forward — halving its activation bytes is pure wall-clock
            n_extra = len(self._inlier_extras())
            inlier_cfg = cfg_replace(cfg, feat_len=6 + n_extra,
                                     use_ppf=False,
                                     compute_dtype=cfg.inlier_compute_dtype)
            if 0 < cfg.inlier_num_layers < cfg.num_layers:
                # truncated inlier pyramid (cfg.inlier_num_layers docstring):
                # the shallower net consumes the first L levels of the same
                # source pyramid — no data-layer change
                L = cfg.inlier_num_layers
                inlier_cfg = cfg_replace(
                    inlier_cfg, d_out=cfg.d_out[:L],
                    sub_sampling_ratio=cfg.sub_sampling_ratio[:L])
            self.inlier_model = RandLA(inlier_cfg, num_classes=1)

    def _inlier_extras(self):
        """Parsed cfg.inlier_extra_feats (see its docstring), order-stable."""
        names = [s.strip() for s in self.cfg.inlier_extra_feats.split(",")
                 if s.strip()]
        assert all(n in ("dist", "recip") for n in names), names
        return names

    # ------------------------------------------------------------------ core

    def backbone(self, points: jnp.ndarray, pyr: Pyramid, train: bool):
        """One RandLA pass: features + semantic logits for one cloud batch."""
        return self.feat_extractor(points, pyr, train=train)

    def aggregate_side(self, xyz, feat, score):
        """One cloud's fused descriptor: proj(mlp_feat(f) + mlp_att([xyz;s])),
        L2-normalized (one side of reference Network.aggregation,
        model.py:209-235)."""
        return self.aggregate_moving(xyz, score, self.mlp_feat(feat))

    def aggregate_moving(self, xyz, score, ff):
        """Descriptor from a PRECOMPUTED feature stream `ff = mlp_feat(feat)`
        plus the positional stream at the current pose. The registration scan
        moves only xyz, so mlp_feat over the (iteration-invariant) backbone
        features is hoisted out of the loop."""
        g = self.mlp_att(jnp.concatenate([xyz, score[..., None]], axis=-1))
        f = self.mlp_proj(ff + g).astype(jnp.float32)
        return f / (jnp.linalg.norm(f, axis=-1, keepdims=True) + 1e-12)

    def aggregation(self, xyz_src, xyz_ref, feat_src, feat_ref,
                    score_src, score_ref):
        """Fuse descriptor features with geometric context and L2-normalize.

        (reference Network.aggregation, model.py:209-235)
        """
        return (self.aggregate_side(xyz_src, feat_src, score_src),
                self.aggregate_side(xyz_ref, feat_ref, score_ref))

    # --------------------------------------------------------------- pipelines

    def backbone_pair(self, batch: PairBatch, train: bool):
        """One backbone pass over src and ref stacked along the batch dim.

        Halves the compiled graph vs two separate passes and doubles the
        effective matmul batch on the MXU (all-new; the reference runs two
        sequential passes, model.py:632-635).
        """
        b = batch.points_src.shape[0]
        pts = jnp.concatenate([batch.points_src, batch.points_ref], axis=0)
        pyr = jax.tree_util.tree_map(
            lambda a, c: jnp.concatenate([a, c], axis=0),
            batch.pyramid_src, batch.pyramid_ref)
        # opt-in first-k truncation of the backbone's neighbourhoods (exact
        # k-NN subgraph — lists are distance-ascending; param tree
        # unchanged). cfg.backbone_num_knn docstring: perf probe, own
        # quality gate required — the descriptor path is context-sensitive.
        pyr = slice_neighbours(pyr, self.cfg.backbone_num_knn)
        feat, logits = self.backbone(pts, pyr, train)
        return (feat[:b], logits[:b], feat[b:], logits[b:],
                pts[..., :3], pyr)

    def score_pair(self, batch: PairBatch, feat_src, feat_ref,
                   logits_src, logits_ref):
        """Keypoint scoring for both clouds in one stacked call."""
        b = batch.points_src.shape[0]
        feat = jnp.concatenate([feat_src, feat_ref], axis=0)
        logits = jnp.concatenate([logits_src, logits_ref], axis=0)
        xyz = jnp.concatenate([batch.points_src[..., :3],
                               batch.points_ref[..., :3]], axis=0)
        neigh = jnp.concatenate([batch.pyramid_src.neigh_idx[0],
                                 batch.pyramid_ref.neigh_idx[0]], axis=0)
        if self.cfg.backbone_num_knn > 0:
            # consistent with the truncated backbone neighbourhoods
            # (backbone_pair): scoring's local-max/mean-distance terms see
            # the same k-NN subgraph
            neigh = neigh[..., :self.cfg.backbone_num_knn]
        score = score_points(feat, xyz, logits, neigh)
        return score[:b], score[b:]

    def forward_pair(self, batch: PairBatch, train: bool = False,
                     with_scores: bool = None) -> PairOutput:
        """Feature extraction over both clouds (+ scoring for feat/align).

        (reference Network.forward_pair, model.py:609-666)
        """
        cfg = self.cfg
        if with_scores is None:
            with_scores = self.pipeline != "label"

        feat_src, logits_src, feat_ref, logits_ref, _, _ = \
            self.backbone_pair(batch, train)
        if self.pipeline == "feat" and self.stop_frozen_gradients:
            # the feat stage trains only mlp_feat/att/proj over a FROZEN
            # backbone; without this the circle/detector loss backward
            # traverses both RandLA passes for gradients the freeze mask
            # then zeroes
            feat_src, logits_src, feat_ref, logits_ref = map(
                jax.lax.stop_gradient,
                (feat_src, logits_src, feat_ref, logits_ref))
        xyz_src = batch.points_src[..., :3]
        xyz_ref = batch.points_ref[..., :3]

        score_src = score_ref = None
        if with_scores:
            score_src, score_ref = self.score_pair(
                batch, feat_src, feat_ref, logits_src, logits_ref)

            if self.pipeline == "feat":
                # descriptor head: aggregate + normalize (model.py:650-654)
                feat_src, feat_ref = self.aggregation(
                    xyz_src, xyz_ref, feat_src, feat_ref, score_src, score_ref)
                if cfg.num_sub > 0:
                    # top-k keypoint sub-selection (model.py:681-698)
                    score_src, xyz_src, feat_src = top_k_select(
                        score_src, cfg.num_sub, xyz_src, feat_src)
                    score_ref, xyz_ref, feat_ref = top_k_select(
                        score_ref, cfg.num_sub, xyz_ref, feat_ref)
        if self.pipeline == "label" or self.pipeline == "align":
            feat_src = feat_src / (jnp.linalg.norm(feat_src, axis=-1, keepdims=True) + 1e-12)
            feat_ref = feat_ref / (jnp.linalg.norm(feat_ref, axis=-1, keepdims=True) + 1e-12)

        return PairOutput(feat_src, feat_ref, xyz_src, xyz_ref,
                          logits_src, logits_ref, score_src, score_ref)


    def forward_align(self, batch: PairBatch, opts: ForwardOptions,
                      train: bool = False) -> Tuple[jnp.ndarray, AlignOutput]:
        """Iterative registration (reference forward_align_4, model.py:520-607).

        Per iteration: re-aggregate descriptors against the current source
        pose, tiled nearest-neighbour correspondence search, inlier RandLA
        weighting over [src ; matched-ref] pairs, weighted-Kabsch solve,
        compose. Returns (transforms (iters, B, 3, 4), AlignOutput).
        """
        cfg = self.cfg
        feat_src0, logits_src, feat_ref0, logits_ref, _, _ = \
            self.backbone_pair(batch, train=False)
        xyz_src0 = batch.points_src[..., :3]
        xyz_ref = batch.points_ref[..., :3]

        score_src, score_ref = self.score_pair(
            batch, feat_src0, feat_ref0, logits_src, logits_ref)

        # the ref cloud never moves, so its aggregated descriptor is
        # iteration-invariant: compute it ONCE outside the loop (the
        # reference recomputes both sides per iteration, model.py:552, with
        # identical ref-side results every time)
        fr = self.aggregate_side(xyz_ref, feat_ref0, score_ref)
        stop_frozen = self.stop_frozen_gradients
        if stop_frozen:
            # align trains ONLY the inlier model; descriptors feed the
            # integer correspondence search (no gradient) so stopping here
            # kills the backward through backbone + aggregation MLPs that
            # the freeze mask would discard (reference freeze_model_2,
            # model.py:201-207)
            fr = jax.lax.stop_gradient(fr)

        # the inlier RandLA runs once per iteration over the SAME source
        # pyramid with only its input features changing, so its LocSE
        # positional branch (xyz neighbour gathers + 10-ch encoding + two
        # ConvUnits per level) is loop-invariant: compute it ONCE here —
        # XLA does not hoist these multi-MB fusions out of the scan itself.
        # cfg.inlier_num_knn > 0 truncates the neighbour lists to the k
        # nearest for the inlier net only (its config docstring) — the
        # scan's per-iteration feature-gather rows scale with k.
        pyr_inlier = slice_neighbours(batch.pyramid_src, cfg.inlier_num_knn)
        with _matmul_precision(cfg.inlier_matmul_precision):
            inlier_pos = self.inlier_model.pos_cache(pyr_inlier)
        # mlp_feat over the backbone features is likewise loop-invariant
        ff_src = self.mlp_feat(feat_src0)
        if stop_frozen:
            ff_src = jax.lax.stop_gradient(ff_src)

        # every registration iteration runs the same subgraph with the same
        # weights, so it compiles ONCE as an nn.scan body (the reference
        # unrolls a python loop, model.py:551-601). The body is built by a
        # factory over its per-cloud context so the refine_stride path below
        # can run the SAME weights over a strided subset of the source.
        def make_body(xyz0, score, ff, pyramid, pos_cache, mask):
            def iter_body(mdl, carry, _):
                xyz_src, cum, invalid = carry
                fs = mdl.aggregate_moving(xyz_src, score, ff)
                if stop_frozen:
                    fs = jax.lax.stop_gradient(fs)
                # correspondence search — integer output, no gradient flows;
                # under bf16 compute the fused matcher also runs bf16 operands
                lp = jnp.dtype(cfg.compute_dtype) == jnp.bfloat16

                def search(a, b):
                    if mdl.matcher is not None:
                        return mdl.matcher(a, b)
                    return nearest_neighbour_index(
                        a, b, low_precision=lp, method=cfg.matcher_method)

                extras = mdl._inlier_extras()
                need_ridx = cfg.mutual_check or "recip" in extras
                with _matmul_precision(cfg.matcher_matmul_precision):
                    if need_ridx and mdl.matcher is None:
                        # both directions for the reciprocity gate/feature
                        # below in ONE fused pass over the distance tiles on
                        # TPU (ops/pallas_match.py::match_argmin_bidirectional)
                        idx, ridx = nearest_neighbour_bidirectional(
                            fs, fr, low_precision=lp,
                            method=cfg.matcher_method)
                    else:
                        idx = search(fs, fr)                      # (B, N)
                        if need_ridx:
                            # injected (ring) matcher: reverse call shards
                            # the SOURCE cloud — the matcher is
                            # argument-generic
                            ridx = search(fr, fs)                 # (B, M)
                xyz_ref_new = gather_points(xyz_ref, idx)         # (B, N, 3)

                # learned inlier confidence over concatenated pair coords,
                # plus the opt-in outlier-signal channels the matcher
                # computes anyway (cfg.inlier_extra_feats docstring). Both
                # are inputs to the only trainable subnet, so gradients stop
                # at them like at the coordinates.
                feats = [xyz_src, xyz_ref_new]
                if "dist" in extras:
                    matched_desc = gather_points(fr, idx)         # (B, N, C)
                    feats.append(jax.lax.stop_gradient(jnp.linalg.norm(
                        fs - matched_desc, axis=-1, keepdims=True)))
                if "recip" in extras:
                    # |src_i - src[reverse(idx_i)]| in pose-invariant source
                    # coordinates — the mutual gate's criterion as a soft
                    # per-point feature
                    back = gather_points(xyz0, ridx)              # (B, M, 3)
                    feats.append(jnp.linalg.norm(
                        gather_points(back, idx) - xyz0, axis=-1,
                        keepdims=True))
                pair_feats = jnp.concatenate(feats, axis=-1)
                with _matmul_precision(cfg.inlier_matmul_precision):
                    _, inlier_logit = mdl.inlier_model(
                        pair_feats, pyramid, train=train,
                        pos_cache=pos_cache)
                # fp32 from here on: the sigmoid weights feed the Kabsch
                # solve and the training BCE (bf16 activations stop here)
                inlier_logit = inlier_logit[..., 0].astype(jnp.float32)
                weights = jax.nn.sigmoid(inlier_logit)
                if opts.clip_weight and cfg.clip_weight_thresh > 0:
                    weights = jnp.where(weights < cfg.clip_weight_thresh,
                                        0.0, weights)
                if mask is not None:
                    # padded src rows are tile-duplicates of real points;
                    # zeroing their weight removes the double vote from the
                    # Kabsch solve (padded REF rows need no handling: a
                    # duplicate match target has identical coordinates, so
                    # the solve is unaffected)
                    weights = weights * mask
                if cfg.mutual_check:
                    # zero the Kabsch vote of non-reciprocal matches (with a
                    # degenerate-overlap fallback inside the gate). Duplicate
                    # padded rows can only make the gate stricter — ties
                    # break to the lowest index on both sides. tol > 0
                    # relaxes reciprocity to a src-space radius (xyz0 is the
                    # untransformed source — src-point distances are
                    # pose-invariant).
                    weights = weights * mutual_gate(
                        idx, ridx, src_xyz=xyz0, tol=cfg.mutual_check_tol)

                if cfg.absolute_pose_solve:
                    # drift fix (opt-in): solve the ORIGINAL source onto the
                    # matched refs directly — per-iteration solve bias cannot
                    # compound across iterations (see ModelConfig docstring)
                    cum, bad = weighted_kabsch(xyz0, xyz_ref_new, weights)
                    xyz_src = se3.transform(jax.lax.stop_gradient(cum), xyz0)
                else:
                    # reference scheme: incremental delta composed onto the
                    # running pose (model.py:590-595)
                    r_t, bad = weighted_kabsch(xyz_src, xyz_ref_new, weights)
                    xyz_src = se3.transform(jax.lax.stop_gradient(r_t),
                                            xyz_src)
                    cum = se3.concatenate(r_t, cum)
                return ((xyz_src, cum, invalid | bad),
                        (cum, inlier_logit, idx))
            return iter_body

        full_body = make_body(xyz_src0, score_src, ff_src,
                              pyr_inlier, inlier_pos, batch.mask_src)
        b = xyz_src0.shape[:-2]
        identity = jnp.broadcast_to(jnp.eye(3, 4, dtype=xyz_src0.dtype),
                                    b + (3, 4))
        carry0 = (xyz_src0, identity, jnp.zeros(b, dtype=bool))
        scan_kw = dict(variable_broadcast="params",
                       split_rngs={"params": False, "dropout": True})

        stride = opts.refine_stride if not train else 1
        if stride > 1 and opts.num_iter > 1:
            # Coarse-refine split (opt-in, eval-only — perf knob beyond the
            # reference, which runs every iteration at full N,
            # model.py:551-601): iteration 1 runs on the full cloud to lock
            # a solid first pose; iterations 2..K refine it on every
            # stride-th source point. The data-layer contract makes the
            # strided rows a uniform random sample (shuffled order) or a
            # spatially uniform one (morton order), and a near-correct pose
            # needs far fewer correspondences to refine than to find, so
            # per-iteration cost drops ~stride-fold on this gather-bound
            # forward. Quality-gated like every perf knob (128-pair A/B).
            transforms, out = self._refine_after_full(
                batch, opts, train, make_body, full_body, carry0,
                score_src, ff_src, xyz_src0, xyz_ref, score_ref, stride,
                scan_kw)
            return transforms, out

        scan = nn.scan(full_body, length=opts.num_iter, **scan_kw)
        (_, _, invalid), (transforms, logits_iters, idx_iters) = scan(
            self, carry0, None)

        out = AlignOutput(
            transforms=transforms,                    # (iters, B, 3, 4)
            inlier_logits=logits_iters,
            pred_idx=idx_iters,
            invalid=invalid,
            pt_src=xyz_src0, pt_ref=xyz_ref,
            score_src=score_src, score_ref=score_ref)
        return transforms, out

    def _refine_after_full(self, batch, opts, train, make_body, full_body,
                           carry0, score_src, ff_src, xyz_src0, xyz_ref,
                           score_ref, stride, scan_kw):
        """refine_stride>1 tail of forward_align: one full-N iteration, then
        num_iter-1 iterations over the [::stride] source subset (its pyramid
        and LocSE cache are built in-graph, once — both are loop-invariant).

        AlignOutput contract in this mode: pt_src / inlier_logits / pred_idx
        describe the SUBSET cloud and the refinement iterations only (the
        eval-side consumers — RANSAC / finetune — use the last iteration);
        transforms still stacks all num_iter cumulative poses.
        """
        cfg = self.cfg
        from deepsir_tpu.ops.pyramid import build_pyramid

        (xyz_c, cum, invalid), (t1, _, _) = full_body(self, carry0, None)

        xyz0_sub = xyz_src0[..., ::stride, :]
        n_bottom = xyz0_sub.shape[-2]
        for r in cfg.sub_sampling_ratio:
            n_bottom //= r
        if n_bottom < 1:
            raise ValueError(
                f"refine_stride={stride} leaves too few points for the "
                f"inlier pyramid (ratios {cfg.sub_sampling_ratio})")
        score_sub = score_src[..., ::stride]
        ff_sub = ff_src[..., ::stride, :]
        mask_sub = (batch.mask_src[..., ::stride]
                    if batch.mask_src is not None else None)
        # subset pyramid: strided rows of a curve-sorted cloud stay sorted
        # (morton windows remain valid); of a shuffled cloud stay shuffled
        # (first-N remains a uniform sample) — same mapping as
        # training.make_device_batch
        sample = "strided" if cfg.pyramid_order == "morton" else "first"
        halo = cfg.knn_window_halo if cfg.pyramid_order == "morton" else 0
        pyr_sub = build_pyramid(xyz0_sub, cfg.num_knn,
                                cfg.sub_sampling_ratio,
                                recall_target=cfg.knn_recall_target,
                                sample=sample, window_halo=halo)
        pyr_sub = slice_neighbours(pyr_sub, cfg.inlier_num_knn)
        with _matmul_precision(cfg.inlier_matmul_precision):
            pos_sub = self.inlier_model.pos_cache(pyr_sub)

        refine_body = make_body(xyz0_sub, score_sub, ff_sub, pyr_sub,
                                pos_sub, mask_sub)
        # enter refinement at the pose the full iteration produced
        xyz_sub = se3.transform(jax.lax.stop_gradient(cum), xyz0_sub)
        scan = nn.scan(refine_body, length=opts.num_iter - 1, **scan_kw)
        (_, _, invalid), (t_rest, logits_r, idx_r) = scan(
            self, (xyz_sub, cum, invalid), None)

        transforms = jnp.concatenate([t1[None], t_rest], axis=0)
        out = AlignOutput(
            transforms=transforms,
            inlier_logits=logits_r,                  # (iters-1, B, N/stride)
            pred_idx=idx_r,
            invalid=invalid,
            pt_src=xyz0_sub, pt_ref=xyz_ref,
            score_src=score_src, score_ref=score_ref)
        return transforms, out

    def __call__(self, batch: PairBatch, opts: ForwardOptions = ForwardOptions(),
                 train: bool = False):
        """Pipeline dispatch (reference Network.forward, model.py:297-298)."""
        if self.pipeline == "align":
            return self.forward_align(batch, opts, train=train)
        return None, self.forward_pair(batch, train=train)
