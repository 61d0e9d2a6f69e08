"""Typed configuration tree for deepsir_tpu.

Replicates every live flag of the reference's argparse system
(/root/reference/arguments.py:7-137) plus the hidden constants the reference
hard-codes inside its loaders and eval driver (voxel sizes, crop ranges,
per-dataset RTE/RRE thresholds — kitti_loader.py:37, threeDMatch_loader.py:49-60,
oxford_loader.py:26-47, test.py:49-57), so that one config object fully
determines a run.

The tree is plain dataclasses (hashable / static-friendly); the parts that
feed jitted code are carried as static arguments so XLA sees compile-time
constants.
"""
from __future__ import annotations

import argparse
import dataclasses
from dataclasses import dataclass, field
from typing import Optional, Tuple

PIPELINES = ("label", "feat", "align")
DATASETS = ("3DMatch", "Oxford", "KITTI", "Synthetic")


def str2bool(v: str) -> bool:
    return str(v).lower() in ("true", "1", "yes")


@dataclass(frozen=True)
class ModelConfig:
    """Network architecture settings (reference arguments.py:25-83)."""
    feat_len: int = 4                 # 3 (xyz) or 4 (xyz+reflectance)
    use_ppf: bool = False
    num_points: int = 18000           # points per cloud (static shape)
    num_sub: int = -1                 # top-k points used for matching (<=0: all)
    num_knn: int = 16                 # neighbours in the KNN graph
    sub_sampling_ratio: Tuple[int, ...] = (4, 4, 4, 4)
    d_out: Tuple[int, ...] = (16, 64, 128, 256)   # encoder dims per layer
    out_feat_dim: int = 64            # descriptor dimension
    num_classes: int = 19             # SemanticKITTI valid classes
    dropout_rate: float = 0.5
    # normalization for the FC/MLP stacks (fc_label head + aggregation
    # MLPs) — the ONE place the reference uses BatchNorm1d where we default
    # to GroupNorm (models/layers.py docstring). 'batch' = stateless
    # batch-stat norm (BN train-mode statistics; eval uses the eval batch's
    # own stats). Default 'group' is the tree/behavior every recorded
    # checkpoint was trained with. Label-pipeline mIoU A/B: BASELINE.md.
    fc_norm: str = "group"            # 'group' | 'batch' | 'none'
    # Decoder skip-connection source. 'pre' (default — every recorded repo
    # checkpoint): each decoder stage concatenates the SAME-level encoder
    # output BEFORE pooling (standard U-Net; widths 1024/512/256/64).
    # 'post': the reference's scheme (RandLANet.py:339-359,
    # f_encoder_list[-j-2]) — the POOLED features entering the next level
    # (widths 768/384/160/64). The weight-level import of reference
    # checkpoints (utils/torch_import.py) requires 'post'; the divergence
    # was DISCOVERED by that import (round 4) — the golden-value tests never
    # saw it because they are parameter-free.
    randla_skips: str = "pre"         # 'pre' | 'post'
    # numerics
    compute_dtype: str = "float32"    # dtype for activations ("bfloat16" on TPU)
    knn_recall_target: float = 0.95   # <1: TPU ApproxTopK KNN (exact on CPU);
                                      # 1.0: guaranteed-exact everywhere
    matcher_method: str = "auto"      # 'auto': fused Pallas matcher on TPU
                                      # (near-tie quantization); 'xla': exact
    # global XLA matmul precision. On TPU the "default" runs every Dense /
    # dot at bf16-grade mantissae; the resulting descriptor noise was THE
    # round-3 quality gap vs the torch reference (fp32 everywhere): the same
    # checkpoint converges to ~0.5 deg on CPU but ~3 deg on TPU at default
    # precision. "highest" = full fp32 fidelity (3-pass bf16 on the MXU);
    # the forward is HBM-bound so the wall-clock cost is small.
    matmul_precision: str = "highest" # 'default' | 'high' | 'highest'
    # scoped overrides for the two precision-INSENSITIVE hot subgraphs.
    # The proven sensitivity is the DESCRIPTOR path (backbone matmuls):
    # descriptor noise at default precision poisons the correspondence
    # search (BASELINE.md round-3). The inlier RandLA (sigmoid weights into
    # the Kabsch solve) and the matcher's own distance matmul (argmin over
    # exact descriptors; deviations are near-tie swaps) were A/B'd at
    # default precision with NO quality change (128-pair held-out: succ
    # 1.000 / RRE 0.60 deg unchanged; robust rung unchanged) for ~25% less
    # device time per pair — the registration scan runs every iteration.
    inlier_matmul_precision: str = "default"
    matcher_matmul_precision: str = "default"
    # Activation dtype for the inlier RandLA ONLY (same precision-insensitive
    # subgraph as inlier_matmul_precision; it runs 5x per pair inside the
    # registration scan and the forward is HBM-bound, so halving its
    # activation bytes attacks the largest remaining device cost). Params
    # stay fp32 (flax param_dtype) so checkpoints load unchanged; the logit
    # is cast back to fp32 before the sigmoid/Kabsch. Quality-gated like
    # every numerics knob: flip only with a clean 128-pair held-out A/B.
    inlier_compute_dtype: str = "float32"
    # Depth of the inlier RandLA's encoder-decoder (0 = same as the backbone,
    # the reference scheme — its inlier net reuses the full 4-level
    # architecture, network/model.py:191-193 + 551-601). The inlier head is a
    # binary classifier that runs EVERY registration iteration; encoder
    # levels cost near-equal HBM bytes (N drops 4x/level while width doubles),
    # so truncating to L levels removes ~(num_layers-L)/num_layers of the
    # scan's per-iteration encoder+decoder traffic. <num_layers changes the
    # inlier param tree: requires retraining the align stage; quality-gated
    # at 128 pairs like every knob. The truncated net consumes the SAME
    # source pyramid (extra levels are simply unused).
    inlier_num_layers: int = 0
    # Neighbour count for the inlier RandLA only (0 = num_knn, the reference
    # scheme — one K for every net). KNN lists are distance-ascending, so a
    # first-k slice of the source pyramid (ops/pyramid.py::slice_neighbours)
    # is the exact k-NN subgraph: the inlier net's level-0 feature gathers
    # are the registration scan's dominant cost (~16 ms of the 64.6 ms bs2
    # device budget, BASELINE.md round 4) and gather cost scales with ROW
    # COUNT (~6 ns/row, width-independent), so k=8 halves them. AttPooling
    # params are per-channel -> the param tree is UNCHANGED and existing
    # checkpoints evaluate directly at any k; quality-gated at 128 pairs
    # like every knob.
    inlier_num_knn: int = 0
    # Neighbour count for the BACKBONE + scoring path (0 = num_knn, the
    # reference scheme). Same exact-k-NN-subgraph slice as inlier_num_knn
    # (first-k of the distance-ascending lists), applied to both clouds'
    # pyramids inside backbone_pair/score_pair; the inlier net keeps its
    # own knob (sliced independently from the FULL lists). Param tree
    # unchanged (AttPooling is per-channel), so existing checkpoints
    # evaluate at any k — but the DESCRIPTOR path is the precision- and
    # context-sensitive one (bf16 and f16-transfer A/Bs both lost on it),
    # so this knob is a perf PROBE requiring its own 128-pair quality gate
    # before any use. Targets the backbone's ~20 ms of L0 gather+conv
    # fusions (second-largest chunk of the bs2 device budget).
    backbone_num_knn: int = 0
    # Extra per-point input channels for the inlier RandLA beyond the
    # reference's 6 ([src_xyz ; matched_ref_xyz], model.py:558-577), comma
    # separated. The matcher already computes both quantities and throws
    # them away, and both are the textbook partial-overlap outlier signals:
    #   'dist'  — descriptor distance to the matched ref point (non-overlap
    #             src points match SOMETHING, but badly)
    #   'recip' — reciprocity residual |src_i - src[reverse(idx_i)]| in
    #             pose-invariant source coordinates (the mutual gate's
    #             criterion as a SOFT feature the net can learn to weigh,
    #             instead of the hard zeroing of mutual_check; forces the
    #             bidirectional matcher pass)
    # Changes the inlier param tree: requires an align retrain; gated at
    # 128 pairs like every knob.
    inlier_extra_feats: str = ""
    # Coarse-refine iteration split (opt-in, eval-only; 1 = reference
    # behavior). >1: registration iteration 1 runs at full N, iterations
    # 2..K on every stride-th source point (a uniform subsample under both
    # point-order contracts) with an in-graph subset pyramid — the
    # near-converged refinement needs far fewer correspondences than the
    # initial alignment, and the per-iteration inlier RandLA + matcher cost
    # drops ~stride-fold. Quality-gate before flipping (128-pair held-out).
    # Consumed ONLY by the test-time driver via ForwardOptions.refine_stride
    # (training.make_eval_step) — the train loop's validation ignores it.
    refine_stride: int = 1
    # Point-order mode. "shuffled": the reference contract (loader shuffles,
    # pyramid subsamples first-N — ops/pyramid.py docstring). "morton": the
    # data layer sorts each cloud along a Morton curve (ops/morton.py), the
    # pyramid subsamples strided-N (still spatially uniform), and the
    # per-level KNN searches only a curve-rank window of knn_window_halo
    # blocks each side (ops/window.py) — the windowed fused kernel is ~2.7x
    # the full fused KNN at 18000 pts. Registration quality is A/B-gated on
    # the 128-pair held-out eval before this becomes the default.
    pyramid_order: str = "shuffled"   # 'shuffled' | 'morton'
    knn_window_halo: int = 1          # window blocks per side (morton only)
    # registration loop
    num_train_reg_iter: int = 2
    num_reg_iter: int = 5
    clip_weight_thresh: float = 0.0
    # Opt-in iteration-drift fix (BASELINE.md iteration-stability finding):
    # re-solve the pose each iteration ABSOLUTELY from the ORIGINAL source
    # points to the freshly matched refs instead of composing per-iteration
    # increments (the reference's scheme, model.py:590-595). Matching and the
    # inlier network are unchanged (they still see the moved source), so the
    # flag is parameter-free and applies to existing checkpoints at eval.
    # Incremental composition compounds each iteration's small solve bias
    # (~0.4 deg/iter past the trained depth); the absolute solve cannot
    # compound. Default False = reference-faithful.
    absolute_pose_solve: bool = False
    # Opt-in mutual nearest-neighbour gate on the correspondence search
    # (beyond the reference, which keeps every forward match,
    # network/model.py:558-569): a second ref->src search per iteration and
    # zeroed Kabsch weight for non-reciprocal matches — the classical
    # partial-overlap outlier prior, composing with the learned inlier
    # weights. Costs one extra matcher pass per iteration. Parameter-free,
    # so it applies to existing checkpoints at eval. Default False =
    # reference-faithful.
    mutual_check: bool = False
    # relaxation radius for the gate: accept a match when the reverse match
    # lands within this distance of the source point (0 = exact
    # reciprocity). Measured (BASELINE.md round 3): the exact gate rescues
    # catastrophic partial-overlap failures but trims good solves; the
    # relaxed gate keeps valid-but-asymmetric matches in dense regions.
    mutual_check_tol: float = 0.0
    # sinkhorn variant (kept for API parity with the reference's RPM-style path)
    no_slack: bool = False
    num_sk_iter: int = 5

    @property
    def num_layers(self) -> int:
        return len(self.d_out)

    @property
    def pyramid_sizes(self) -> Tuple[int, ...]:
        """Number of points at each pyramid level [n, n/4, n/16, ...]."""
        sizes = [self.num_points]
        for r in self.sub_sampling_ratio:
            sizes.append(sizes[-1] // r)
        return tuple(sizes)


@dataclass(frozen=True)
class DataConfig:
    """Dataset / augmentation settings (reference arguments.py:20-40 plus
    hidden loader constants)."""
    dataset_path: str = "../data/"
    dataset_type: str = "KITTI"
    voxel_size: float = 0.3           # KITTI/Oxford 0.3, 3DMatch 0.03
    positive_pair_radius_multiplier: float = 3.0
    # data transformation magnitudes
    rot_mag: float = 45.0
    xy_rot_scale: float = 0.1
    trans_mag: float = 2.0
    # evaluation subset
    num_val: int = -1
    # loader workers (host-side pipeline)
    num_workers: int = 8
    # fixed capacity for GT match lists (static shape for the inlier loss)
    max_matches: int = 30000
    # ship host-computed GT match lists and use the list-based BCE labels
    # (the reference's scheme, loss.py:723-749). Default off: the in-graph
    # geometric membership test (losses/align.py) is exact for every point
    # and costs no host KDTree time or relay transfer (~240 KB/step); the
    # list path stays as the cross-checkable alternative
    gt_match_lists: bool = False
    # ICP-refine the Oxford test GT poses (reference oxford_loader.py:101-135;
    # its own get_data keeps the call disabled, so parity default is off)
    oxford_pose_refine: bool = False
    # Synthetic dataset split sizes (val stays fixed so training-time
    # checkpoint scores remain comparable across runs)
    synthetic_train_size: int = 256
    synthetic_eval_size: int = 32
    # Synthetic difficulty knobs: per-point gaussian noise sigma and the
    # half-space crop keep fraction (<1.0 = partial-overlap pairs) — the
    # robustness rung beyond the full-overlap training regime
    synthetic_noise: float = 0.01
    synthetic_p_keep: float = 1.0
    # test-split pair-index offset: draw an INDEPENDENT eval slice from the
    # same deterministic stream (0 = the recorded numbers' pair set)
    synthetic_eval_offset: int = 0

    @property
    def thres_radius(self) -> float:
        """Positive-pair radius (reference mutates args at runtime:
        kitti_loader.py:37, oxford_loader.py:27, threeDMatch_loader.py:50)."""
        return self.voxel_size * self.positive_pair_radius_multiplier


@dataclass(frozen=True)
class LossConfig:
    """Loss weights (reference arguments.py:42-66)."""
    loss_type: str = "mae"            # 'mae' | 'mse'
    wt_ptDist_loss: float = 1.0
    wt_inlier_loss: float = 1.0
    wt_pose_loss: float = 0.0
    loss_discount_factor: float = 0.5
    det_loss_weight: float = 1.0
    chamfer_loss_weight: float = 0.0
    feat_loss_weight: float = 0.0
    thres_radius: float = -1.0        # filled from DataConfig.thres_radius
    # Tile width for the streamed circle loss (losses/detdes.py::
    # circle_loss_tiled): 0 = materialize the (N1, N2) matrices (the
    # reference scheme, fine for num_sub-selected keypoints or small N);
    # >0 = scan the positive axis in tiles of this width so the feat stage
    # trains at the full 18000-point protocol without OOM.
    circle_loss_tile: int = 0
    # Opt-in partial-overlap fix for the detector term (losses/detdes.py):
    # restrict it (and the accuracy) to anchors that HAVE an in-radius
    # correspondent. The reference's formulation rewards scoring non-overlap
    # points high (their furthest_pos is 0, so diff < 0 always). Default off
    # = reference-faithful; the robust-curriculum recipe turns it on.
    overlap_det_mask: bool = False


@dataclass(frozen=True)
class TrainConfig:
    """Training driver settings (reference arguments.py:98-122)."""
    lr: float = 1e-3
    lr_decay_epoch: int = 4
    lr_decay_ratio: float = 0.98
    lr_clip: float = 1e-4
    batch_size: int = 1
    summary_every: int = 3000
    validate_every: int = -2
    rte_thresh: float = 0.6
    rre_thresh: float = 5.0
    resume: Optional[str] = None
    load_model_all: bool = False
    seed: int = 0
    max_epochs: int = 200
    data_parallel: bool = False


@dataclass(frozen=True)
class EvalConfig:
    """Evaluation driver settings (reference arguments.py:125-137, test.py:49-57)."""
    transform_file: Optional[str] = None
    eval_save_path: str = "./out/"
    batch_size: int = 1
    # per-dataset success thresholds (reference test.py:49-54)
    rte_thresh: float = 0.6
    rre_thresh: float = 5.0
    # optional refinement passes (reference pose_optimization switches,
    # test.py:215-216 — both off by default; RANSAC replaces the commented
    # Open3D path test.py:259-263)
    use_finetune: bool = False
    use_icp: bool = False
    use_ransac: bool = False
    # dtype for point payloads on the host->device link ("float16" halves
    # the relay bytes; math stays fp32 after the device-side upcast)
    transfer_dtype: str = "float32"
    # chordal-mean the last k iteration poses as the refined final estimate
    # (0/1 = off). All-new: shrinks the near-fixed-point jitter of the
    # iteration estimates (BASELINE.md round-3 analysis) ~sqrt(k)
    pose_average_last: int = 0


@dataclass(frozen=True)
class ParallelConfig:
    """Device-mesh layout. All-new design (the reference is single-device,
    SURVEY.md §2.5): DP over pair batches on axis 'data', optional point
    sharding of the ref cloud on axis 'model' for very large clouds."""
    data_axis: str = "data"
    model_axis: str = "model"
    num_data_shards: int = -1         # -1: all devices on the data axis
    num_model_shards: int = 1


@dataclass(frozen=True)
class Config:
    pipeline: str = "align"           # 'label' | 'feat' | 'align'
    model: ModelConfig = field(default_factory=ModelConfig)
    data: DataConfig = field(default_factory=DataConfig)
    loss: LossConfig = field(default_factory=LossConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    eval: EvalConfig = field(default_factory=EvalConfig)
    parallel: ParallelConfig = field(default_factory=ParallelConfig)
    # logging
    logdir: str = "./logs"
    name: Optional[str] = None
    dev: bool = False
    debug: bool = False

    def __post_init__(self):
        assert self.pipeline in PIPELINES, self.pipeline

    def resolved(self) -> "Config":
        """Propagate cross-section derived values (the reference does this by
        mutating argparse args at runtime; we do it in one explicit place)."""
        cfg = self
        # dataset-dependent constants (reference test.py:49-54, loaders)
        ds = cfg.data.dataset_type
        if ds == "3DMatch":
            cfg = replace(cfg, data=replace(cfg.data, voxel_size=0.03),
                          eval=replace(cfg.eval, rte_thresh=0.3, rre_thresh=15.0))
            cfg = replace(cfg, model=replace(cfg.model, feat_len=3))
        elif ds == "Oxford":
            cfg = replace(cfg, data=replace(cfg.data, voxel_size=0.3))
            cfg = replace(cfg, model=replace(cfg.model, feat_len=3))
        # thres_radius feeds the feat/align losses (the reference mutates
        # args inside its loaders); an explicitly-passed positive flag wins
        if cfg.loss.thres_radius <= 0:
            cfg = replace(cfg, loss=replace(cfg.loss,
                                            thres_radius=cfg.data.thres_radius))
        # --dev: a minutes-scale smoke configuration (tiny clouds, a couple
        # of epochs over a small synthetic split) for driving the full
        # train/validate/checkpoint loop end-to-end without a dataset or a
        # long compile. Quality numbers from a dev run are meaningless.
        if cfg.dev:
            cfg = replace(
                cfg,
                model=replace(cfg.model, num_points=min(cfg.model.num_points,
                                                        1024)),
                data=replace(
                    cfg.data,
                    # min-clamp like num_points/max_epochs: --dev must never
                    # ENLARGE an explicitly smaller run
                    synthetic_train_size=min(cfg.data.synthetic_train_size, 16),
                    synthetic_eval_size=min(cfg.data.synthetic_eval_size, 4),
                    num_workers=min(cfg.data.num_workers, 2)),
                train=replace(cfg.train, max_epochs=min(cfg.train.max_epochs,
                                                        2)),
            )
        return cfg


def replace(obj, **kw):
    return dataclasses.replace(obj, **kw)


def apply_matmul_precision(cfg: Config) -> None:
    """Install cfg.model.matmul_precision as the global XLA matmul precision.

    Drivers call this BEFORE building any jitted step (precision is captured
    at trace time). See ModelConfig.matmul_precision for why the default is
    'highest' on TPU.
    """
    if cfg.model.matmul_precision != "default":
        import jax
        jax.config.update("jax_default_matmul_precision",
                          cfg.model.matmul_precision)


# ---------------------------------------------------------------------------
# CLI bridge — accepts the same flag surface as the reference's arguments.py
# ---------------------------------------------------------------------------

def _add_net_arguments(p: argparse.ArgumentParser) -> None:
    """Flags shared by train and eval (reference arguments.py:7-95)."""
    p.add_argument("--logdir", type=str, default="./logs")
    p.add_argument("--dev", action="store_true")
    p.add_argument("--name", type=str, default=None)
    p.add_argument("--debug", action="store_true")
    p.add_argument("--dataset_path", type=str, default="../data/")
    p.add_argument("--dataset_type", default="KITTI", choices=list(DATASETS))
    p.add_argument("--feat_len", type=int, default=4)
    p.add_argument("--pipeline", type=str, default="align", choices=list(PIPELINES))
    p.add_argument("--use_ppf", type=str2bool, default=False)
    p.add_argument("--voxel_size", type=float, default=0.3)
    p.add_argument("--positive_pair_radius_multiplier", type=float, default=3.0)
    p.add_argument("--rot_mag", type=float, default=45.0)
    p.add_argument("--xy_rot_scale", type=float, default=0.1)
    p.add_argument("--trans_mag", type=float, default=2.0)
    p.add_argument("--synthetic_train_size", type=int, default=256)
    p.add_argument("--synthetic_eval_size", type=int, default=32)
    p.add_argument("--synthetic_noise", type=float, default=0.01)
    p.add_argument("--synthetic_p_keep", type=float, default=1.0)
    p.add_argument("--synthetic_eval_offset", type=int, default=0,
                   help="test-split pair-index offset (independent slice)")
    p.add_argument("--thres_radius", type=float, default=-1.0)
    p.add_argument("--gt_match_lists", type=str2bool, default=False,
                   help="use host-computed GT match lists for the inlier BCE "
                        "(the reference's scheme) instead of the exact "
                        "in-graph geometric labels")
    p.add_argument("--oxford_pose_refine", type=str2bool, default=False,
                   help="ICP-refine Oxford test GT poses (cached on disk)")
    p.add_argument("--det_loss_weight", type=float, default=1.0)
    p.add_argument("--circle_loss_tile", type=int, default=0,
                   help="stream the circle loss over positive-axis tiles of "
                        "this width (0 = materialized reference scheme)")
    p.add_argument("--overlap_det_mask", type=str2bool, default=False,
                   help="restrict the detector loss to anchors with an "
                        "in-radius correspondent (partial-overlap fix; "
                        "reference rewards scoring non-overlap points high)")
    p.add_argument("--chamfer_loss_weight", type=float, default=0.0)
    p.add_argument("--feat_loss_weight", type=float, default=0.0)
    p.add_argument("--loss_type", type=str, choices=["mse", "mae"], default="mae")
    p.add_argument("--wt_ptDist_loss", type=float, default=1.0)
    p.add_argument("--wt_inlier_loss", type=float, default=1.0)
    p.add_argument("--wt_pose_loss", type=float, default=0.0)
    p.add_argument("--clip_weight_thresh", type=float, default=0.0)
    p.add_argument("--absolute_pose_solve", type=str2bool, default=False,
                   help="re-solve the pose absolutely from the original "
                        "source each iteration (iteration-drift fix) instead "
                        "of composing increments (reference behavior)")
    p.add_argument("--mutual_check", type=str2bool, default=False,
                   help="gate Kabsch weights on mutual nearest-neighbour "
                        "consistency (one extra ref->src search per "
                        "iteration; partial-overlap outlier prior)")
    p.add_argument("--mutual_check_tol", type=float, default=0.0,
                   help="relaxation radius for --mutual_check: accept when "
                        "the reverse match lands within this distance of "
                        "the source point (0 = exact reciprocity)")
    p.add_argument("--loss_discount_factor", type=float, default=0.5)
    p.add_argument("--no_slack", action="store_true")
    p.add_argument("--num_sk_iter", type=int, default=5)
    p.add_argument("--num_train_reg_iter", type=int, default=2)
    p.add_argument("--num_reg_iter", type=int, default=5)
    p.add_argument("--num_points", type=int, default=18000)
    p.add_argument("--num_sub", type=int, default=-1)
    p.add_argument("--num_knn", type=int, default=16)
    p.add_argument("--sub_sampling_ratio", type=int, nargs="+", default=[4, 4, 4, 4])
    p.add_argument("--d_out", type=int, nargs="+", default=[16, 64, 128, 256])
    p.add_argument("--randla_skips", type=str, default="pre",
                   choices=["pre", "post"],
                   help="decoder skip source: 'pre' = same-level encoder "
                        "output (repo default), 'post' = the reference's "
                        "pooled features (required for imported ckpts)")
    p.add_argument("--fc_norm", type=str, default="group",
                   choices=["group", "batch", "none"],
                   help="normalization on the FC/MLP stacks (fc_label + "
                        "aggregation): 'batch' = the reference's BatchNorm1d "
                        "flavor, stateless; 'none' = no norm (the imported-"
                        "PyTorch-checkpoint layout, BN folded into Dense)")
    p.add_argument("--out_feat_dim", type=int, default=64)
    p.add_argument("--compute_dtype", type=str, default="float32",
                   choices=["float32", "bfloat16"])
    p.add_argument("--knn_recall_target", type=float, default=0.95)
    p.add_argument("--matcher_method", type=str, default="auto",
                   choices=["auto", "xla"])
    p.add_argument("--matmul_precision", type=str, default="highest",
                   choices=["default", "high", "highest"])
    p.add_argument("--inlier_matmul_precision", type=str, default="default",
                   choices=["default", "high", "highest"])
    p.add_argument("--matcher_matmul_precision", type=str, default="default",
                   choices=["default", "high", "highest"])
    p.add_argument("--inlier_num_layers", type=int, default=0,
                   help="encoder-decoder depth of the inlier RandLA (0 = "
                        "backbone depth); <backbone depth needs an align "
                        "retrain")
    p.add_argument("--inlier_num_knn", type=int, default=0,
                   help="neighbour count for the inlier RandLA only (0 = "
                        "num_knn); param tree unchanged, checkpoints "
                        "evaluate directly at any k < num_knn")
    p.add_argument("--backbone_num_knn", type=int, default=0,
                   help="neighbour count for the backbone+scoring path (0 = "
                        "num_knn); exact k-NN subgraph slice, param tree "
                        "unchanged — perf probe, quality-gate before use")
    p.add_argument("--inlier_extra_feats", type=str, default="",
                   help="extra inlier-net input channels: comma set of "
                        "'dist' (descriptor distance to the matched ref) "
                        "and 'recip' (reciprocity residual); needs an "
                        "align retrain")
    p.add_argument("--inlier_compute_dtype", type=str, default="float32",
                   choices=["float32", "bfloat16"],
                   help="activation dtype for the inlier RandLA only "
                        "(precision-insensitive subgraph; params stay fp32)")
    p.add_argument("--refine_stride", type=int, default=1,
                   help="eval-only: run registration iterations >=2 on every "
                        "stride-th source point (1 = full cloud every "
                        "iteration, the reference scheme)")
    p.add_argument("--pyramid_order", type=str, default="shuffled",
                   choices=["shuffled", "morton"],
                   help="morton: curve-sort clouds + windowed per-level KNN")
    p.add_argument("--knn_window_halo", type=int, default=1)
    p.add_argument("-bs", "--batch_size", type=int, default=1)
    p.add_argument("-nv", "--num_val", type=int, default=-1)
    p.add_argument("--resume", type=str, default=None)
    p.add_argument("--load_model_all", action="store_true")


def train_argument_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Train")
    _add_net_arguments(p)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--lr_decay_epoch", type=int, default=4)
    p.add_argument("--lr_decay_ratio", type=float, default=0.98)
    p.add_argument("-su", "--summary_every", type=int, default=3000)
    p.add_argument("-v", "--validate_every", type=int, default=-2)
    p.add_argument("--num_workers", type=int, default=8)
    p.add_argument("--rte_thresh", type=float, default=0.6)
    p.add_argument("--rre_thresh", type=float, default=5.0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--max_epochs", type=int, default=200)
    p.add_argument("--data_parallel", type=str2bool, default=False,
                   help="shard the batch over all devices (batch_size must "
                        "be divisible by the device count)")
    return p


def eval_argument_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Evaluation")
    _add_net_arguments(p)
    p.add_argument("--transform_file", type=str, default=None)
    p.add_argument("--eval_save_path", type=str, default="./out/")
    p.add_argument("--use_finetune", type=str2bool, default=False)
    p.add_argument("--use_icp", type=str2bool, default=False)
    p.add_argument("--use_ransac", type=str2bool, default=False)
    p.add_argument("--transfer_dtype", type=str, default="float32",
                   choices=["float32", "float16"])
    p.add_argument("--pose_average_last", type=int, default=0)
    return p


def config_from_args(args: argparse.Namespace) -> Config:
    """Build the typed config tree from parsed CLI flags."""
    model = ModelConfig(
        feat_len=args.feat_len, use_ppf=args.use_ppf, num_points=args.num_points,
        num_sub=args.num_sub, num_knn=args.num_knn,
        sub_sampling_ratio=tuple(args.sub_sampling_ratio), d_out=tuple(args.d_out),
        out_feat_dim=args.out_feat_dim, compute_dtype=args.compute_dtype,
        fc_norm=getattr(args, "fc_norm", "group"),
        randla_skips=getattr(args, "randla_skips", "pre"),
        knn_recall_target=getattr(args, "knn_recall_target", 0.95),
        matcher_method=getattr(args, "matcher_method", "auto"),
        matmul_precision=getattr(args, "matmul_precision", "highest"),
        inlier_matmul_precision=getattr(args, "inlier_matmul_precision",
                                        "default"),
        matcher_matmul_precision=getattr(args, "matcher_matmul_precision",
                                         "default"),
        inlier_compute_dtype=getattr(args, "inlier_compute_dtype", "float32"),
        inlier_num_layers=getattr(args, "inlier_num_layers", 0),
        inlier_num_knn=getattr(args, "inlier_num_knn", 0),
        backbone_num_knn=getattr(args, "backbone_num_knn", 0),
        inlier_extra_feats=getattr(args, "inlier_extra_feats", ""),
        refine_stride=getattr(args, "refine_stride", 1),
        pyramid_order=getattr(args, "pyramid_order", "shuffled"),
        knn_window_halo=getattr(args, "knn_window_halo", 1),
        num_train_reg_iter=args.num_train_reg_iter, num_reg_iter=args.num_reg_iter,
        clip_weight_thresh=args.clip_weight_thresh,
        absolute_pose_solve=getattr(args, "absolute_pose_solve", False),
        mutual_check=getattr(args, "mutual_check", False),
        mutual_check_tol=getattr(args, "mutual_check_tol", 0.0),
        no_slack=args.no_slack,
        num_sk_iter=args.num_sk_iter)
    data = DataConfig(
        dataset_path=args.dataset_path, dataset_type=args.dataset_type,
        voxel_size=args.voxel_size,
        positive_pair_radius_multiplier=args.positive_pair_radius_multiplier,
        rot_mag=args.rot_mag, xy_rot_scale=args.xy_rot_scale,
        trans_mag=args.trans_mag, num_val=args.num_val,
        num_workers=getattr(args, "num_workers", 8),
        gt_match_lists=getattr(args, "gt_match_lists", False),
        oxford_pose_refine=getattr(args, "oxford_pose_refine", False),
        synthetic_train_size=getattr(args, "synthetic_train_size", 256),
        synthetic_eval_size=getattr(args, "synthetic_eval_size", 32),
        synthetic_noise=getattr(args, "synthetic_noise", 0.01),
        synthetic_p_keep=getattr(args, "synthetic_p_keep", 1.0),
        synthetic_eval_offset=getattr(args, "synthetic_eval_offset", 0))
    loss = LossConfig(
        loss_type=args.loss_type, wt_ptDist_loss=args.wt_ptDist_loss,
        wt_inlier_loss=args.wt_inlier_loss, wt_pose_loss=args.wt_pose_loss,
        loss_discount_factor=args.loss_discount_factor,
        det_loss_weight=args.det_loss_weight,
        chamfer_loss_weight=args.chamfer_loss_weight,
        feat_loss_weight=args.feat_loss_weight, thres_radius=args.thres_radius,
        circle_loss_tile=getattr(args, "circle_loss_tile", 0),
        overlap_det_mask=getattr(args, "overlap_det_mask", False))
    train = TrainConfig(
        lr=getattr(args, "lr", 1e-3),
        lr_decay_epoch=getattr(args, "lr_decay_epoch", 4),
        lr_decay_ratio=getattr(args, "lr_decay_ratio", 0.98),
        batch_size=args.batch_size,
        summary_every=getattr(args, "summary_every", 3000),
        validate_every=getattr(args, "validate_every", -2),
        rte_thresh=getattr(args, "rte_thresh", 0.6),
        rre_thresh=getattr(args, "rre_thresh", 5.0),
        resume=args.resume, load_model_all=args.load_model_all,
        seed=getattr(args, "seed", 0),
        max_epochs=getattr(args, "max_epochs", 200),
        data_parallel=getattr(args, "data_parallel", False))
    ev = EvalConfig(
        transform_file=getattr(args, "transform_file", None),
        eval_save_path=getattr(args, "eval_save_path", "./out/"),
        use_finetune=getattr(args, "use_finetune", False),
        use_icp=getattr(args, "use_icp", False),
        use_ransac=getattr(args, "use_ransac", False),
        transfer_dtype=getattr(args, "transfer_dtype", "float32"),
        pose_average_last=getattr(args, "pose_average_last", 0))
    return Config(pipeline=args.pipeline, model=model, data=data, loss=loss,
                  train=train, eval=ev, logdir=args.logdir, name=args.name,
                  dev=args.dev, debug=args.debug).resolved()
