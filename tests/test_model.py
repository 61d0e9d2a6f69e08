import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepsir_tpu.config import ModelConfig
from deepsir_tpu.models import Network, ForwardOptions
from deepsir_tpu.models.network import PairBatch
from deepsir_tpu.models.randla import RandLA
from deepsir_tpu.ops import build_pyramid

TINY = ModelConfig(feat_len=3, num_points=256, num_knn=8,
                   sub_sampling_ratio=(4, 4), d_out=(8, 16), out_feat_dim=16)


def make_batch(rng, cfg=TINY, batch=2, with_labels=False):
    pts_src = rng.normal(size=(batch, cfg.num_points, cfg.feat_len)).astype(np.float32)
    pts_ref = rng.normal(size=(batch, cfg.num_points, cfg.feat_len)).astype(np.float32)
    pyr_src = build_pyramid(jnp.asarray(pts_src[..., :3]), cfg.num_knn,
                            cfg.sub_sampling_ratio, chunk=128)
    pyr_ref = build_pyramid(jnp.asarray(pts_ref[..., :3]), cfg.num_knn,
                            cfg.sub_sampling_ratio, chunk=128)
    labels = rng.integers(0, 19, size=(batch, cfg.num_points)).astype(np.int32) \
        if with_labels else None
    return PairBatch(jnp.asarray(pts_src), jnp.asarray(pts_ref),
                     pyr_src, pyr_ref,
                     transform_gt=jnp.broadcast_to(jnp.eye(3, 4), (batch, 3, 4)),
                     labels_src=jnp.asarray(labels) if with_labels else None,
                     labels_ref=jnp.asarray(labels) if with_labels else None)


def test_randla_shapes(rng):
    batch = make_batch(rng)
    model = RandLA(TINY, num_classes=19)
    params = model.init(jax.random.PRNGKey(0), batch.points_src, batch.pyramid_src)
    feat, logits = model.apply(params, batch.points_src, batch.pyramid_src)
    assert feat.shape == (2, 256, 16)
    assert logits.shape == (2, 256, 19)
    assert np.all(np.isfinite(np.asarray(feat)))


def test_forward_pair_label(rng):
    batch = make_batch(rng, with_labels=True)
    model = Network(TINY, pipeline="label")
    params = model.init(jax.random.PRNGKey(0), batch)
    _, out = model.apply(params, batch)
    assert out.logits_src.shape == (2, 256, 19)
    assert out.score_src is None
    # label-pipeline features are L2-normalized
    norms = np.linalg.norm(np.asarray(out.feat_src), axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-4)


def test_forward_pair_feat_with_subselection(rng):
    cfg = ModelConfig(feat_len=3, num_points=256, num_knn=8,
                      sub_sampling_ratio=(4, 4), d_out=(8, 16),
                      out_feat_dim=16, num_sub=64)
    batch = make_batch(rng, cfg)
    model = Network(cfg, pipeline="feat")
    params = model.init(jax.random.PRNGKey(0), batch)
    _, out = model.apply(params, batch)
    assert out.feat_src.shape == (2, 64, 16)
    assert out.xyz_src.shape == (2, 64, 3)
    assert out.score_src.shape == (2, 64)
    # scores are sorted descending after top-k
    s = np.asarray(out.score_src)
    assert np.all(np.diff(s, axis=-1) <= 1e-6)


def test_forward_align_shapes_and_validity(rng):
    batch = make_batch(rng)
    model = Network(TINY, pipeline="align")
    params = model.init(jax.random.PRNGKey(0), batch, ForwardOptions(2))
    transforms, out = model.apply(params, batch, ForwardOptions(num_iter=2))
    assert transforms.shape == (2, 2, 3, 4)
    assert out.inlier_logits.shape == (2, 2, 256)
    assert out.pred_idx.shape == (2, 2, 256)
    assert not np.any(np.asarray(out.invalid))
    # every iteration's transform is a proper rotation
    dets = np.linalg.det(np.asarray(transforms)[..., :3])
    assert np.all(dets > 0.9)
    assert np.all(np.isfinite(np.asarray(transforms)))


def test_forward_align_bf16_compute(rng):
    """bfloat16 compute_dtype: params stay fp32, outputs stay fp32-finite,
    and the recovered transforms agree with the fp32 path (same weights)
    to activation-rounding tolerance."""
    from dataclasses import replace as dc_replace
    batch = make_batch(rng)
    cfg16 = dc_replace(TINY, compute_dtype="bfloat16")
    m32 = Network(TINY, pipeline="align")
    m16 = Network(cfg16, pipeline="align")
    params = m32.init(jax.random.PRNGKey(0), batch, ForwardOptions(2))
    for leaf in jax.tree_util.tree_leaves(params):
        assert leaf.dtype in (jnp.float32, jnp.int32)
    t32, _ = m32.apply(params, batch, ForwardOptions(num_iter=2))
    t16, out16 = m16.apply(params, batch, ForwardOptions(num_iter=2))
    assert t16.dtype == jnp.float32
    assert np.all(np.isfinite(np.asarray(t16)))
    # bf16 activations perturb matching/weights slightly; the pose solve on
    # identical clouds must still land near the fp32 answer
    np.testing.assert_allclose(np.asarray(t16), np.asarray(t32), atol=0.15)


def test_forward_align_bf16_inlier_only(rng):
    """inlier_compute_dtype=bfloat16 scopes bf16 activations to the inlier
    RandLA only: same param tree (fp32 — checkpoints load unchanged), fp32
    logits/transforms out, and poses matching the fp32 path to rounding
    tolerance (the subgraph is the A/B-proven precision-insensitive one)."""
    from dataclasses import replace as dc_replace
    batch = make_batch(rng)
    cfg16 = dc_replace(TINY, inlier_compute_dtype="bfloat16")
    m32 = Network(TINY, pipeline="align")
    m16 = Network(cfg16, pipeline="align")
    params = m32.init(jax.random.PRNGKey(0), batch, ForwardOptions(2))
    params16 = m16.init(jax.random.PRNGKey(0), batch, ForwardOptions(2))
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(params16))
    for leaf in jax.tree_util.tree_leaves(params16):
        assert leaf.dtype in (jnp.float32, jnp.int32)
    t32, _ = m32.apply(params, batch, ForwardOptions(num_iter=2))
    t16, out16 = m16.apply(params, batch, ForwardOptions(num_iter=2))
    assert t16.dtype == jnp.float32
    assert out16.inlier_logits.dtype == jnp.float32
    # only the inlier weights round; descriptors/matching are bit-identical,
    # so poses sit much closer than the all-bf16 tolerance (0.15)
    np.testing.assert_allclose(np.asarray(t16), np.asarray(t32), atol=0.05)


def test_forward_align_truncated_inlier_net(rng):
    """inlier_num_layers=1 on a 2-level backbone: the inlier RandLA keeps
    only the first encoder level (consuming the same source pyramid), its
    param tree shrinks accordingly, and the align forward still produces
    finite proper-rotation poses over the scan."""
    from dataclasses import replace as dc_replace
    batch = make_batch(rng)
    cfg = dc_replace(TINY, inlier_num_layers=1)
    model = Network(cfg, pipeline="align")
    params = model.init(jax.random.PRNGKey(0), batch, ForwardOptions(2))
    inlier = params["params"]["inlier_model"]
    assert "enc_0" in inlier and "enc_1" not in inlier
    assert "dec_0" in inlier and "dec_1" not in inlier
    full = Network(TINY, pipeline="align").init(
        jax.random.PRNGKey(0), batch, ForwardOptions(2))
    assert "enc_1" in full["params"]["inlier_model"]
    # backbone is untouched: its subtree matches the full-depth init exactly
    assert (jax.tree_util.tree_structure(params["params"]["feat_extractor"])
            == jax.tree_util.tree_structure(full["params"]["feat_extractor"]))
    transforms, out = model.apply(params, batch, ForwardOptions(num_iter=2))
    assert transforms.shape == (2, 2, 3, 4)
    assert np.all(np.isfinite(np.asarray(transforms)))
    dets = np.linalg.det(np.asarray(transforms)[..., :3])
    assert np.all(dets > 0.9)
    assert not np.any(np.asarray(out.invalid))


def test_forward_align_inlier_extra_feats(rng):
    """inlier_extra_feats='dist,recip': the inlier net's input grows to 8
    channels (descriptor distance + reciprocity residual), the bidirectional
    matcher pass is triggered without the hard gate, and the align forward
    stays finite/proper. mlp_pre's kernel input width pins the channel
    count."""
    from dataclasses import replace as dc_replace
    batch = make_batch(rng)
    cfg = dc_replace(TINY, inlier_extra_feats="dist,recip")
    model = Network(cfg, pipeline="align")
    params = model.init(jax.random.PRNGKey(0), batch, ForwardOptions(2))
    pre = params["params"]["inlier_model"]["mlp_pre"]["Dense_0"]["kernel"]
    assert pre.shape[0] == 8
    base = Network(TINY, pipeline="align").init(
        jax.random.PRNGKey(0), batch, ForwardOptions(2))
    assert base["params"]["inlier_model"]["mlp_pre"]["Dense_0"]["kernel"].shape[0] == 6
    transforms, out = model.apply(params, batch, ForwardOptions(num_iter=2))
    assert transforms.shape == (2, 2, 3, 4)
    assert np.all(np.isfinite(np.asarray(transforms)))
    dets = np.linalg.det(np.asarray(transforms)[..., :3])
    assert np.all(dets > 0.9)
    # gradients still reach the inlier net through the BCE path
    def loss(p):
        t, o = model.apply(p, batch, ForwardOptions(num_iter=2))
        return jnp.sum(jax.nn.sigmoid(o.inlier_logits))
    g = jax.grad(loss)(params)
    gnorm = sum(float(jnp.sum(jnp.abs(x)))
                for x in jax.tree_util.tree_leaves(
                    g["params"]["inlier_model"]))
    assert gnorm > 0


def test_forward_align_refine_stride(rng):
    """refine_stride=2: iteration 1 is computed identically to the default
    path (same full-cloud body, same weights), later iterations run on the
    [::2] source subset — transforms keep the full (iters, B, 3, 4) stack
    while the refinement outputs (logits / matched idx / pt_src) describe
    the subset cloud. No new params: the subset pyramid and LocSE cache are
    parameter-free in-graph structures."""
    batch = make_batch(rng)
    opt_s = ForwardOptions(num_iter=3, refine_stride=2)
    m1 = Network(TINY, pipeline="align")
    params = m1.init(jax.random.PRNGKey(0), batch, ForwardOptions(2))
    params_s = m1.init(jax.random.PRNGKey(0), batch, opt_s)
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(params_s))

    t1, out1 = m1.apply(params, batch, ForwardOptions(num_iter=3))
    ts, outs = m1.apply(params, batch, opt_s)
    assert ts.shape == t1.shape == (3, 2, 3, 4)
    # the first iteration runs the identical full-N computation
    np.testing.assert_allclose(np.asarray(ts[0]), np.asarray(t1[0]),
                               rtol=0, atol=1e-6)
    # refinement outputs are subset-shaped and consistent with each other
    n_sub = TINY.num_points // 2
    assert outs.inlier_logits.shape == (2, 2, n_sub)
    assert outs.pred_idx.shape == (2, 2, n_sub)
    assert outs.pt_src.shape == (2, n_sub, 3)
    np.testing.assert_array_equal(np.asarray(outs.pt_src),
                                  np.asarray(batch.points_src[:, ::2, :3]))
    assert np.all(np.isfinite(np.asarray(ts)))
    # training ignores the stride (reference-faithful loss path)
    tt, outt = m1.apply(params, batch,
                        ForwardOptions(num_iter=2, refine_stride=2),
                        train=True, rngs={"dropout": jax.random.PRNGKey(1)})
    assert outt.inlier_logits.shape == (2, 2, TINY.num_points)


def test_forward_align_refine_stride_morton(rng):
    """refine_stride composes with morton mode: the [::stride] rows of a
    curve-sorted cloud stay curve-sorted, so the subset pyramid is built
    with strided sampling + windows (degrading gracefully to full search
    at small N, ops/window.windowed). The relaxed mutual gate rides along
    so all three opt-in knobs are exercised together (in refine mode the
    gate's src coordinates are the strided subset's)."""
    from dataclasses import replace as dc_replace
    from deepsir_tpu.ops.morton import morton_order_np
    cfg = dc_replace(TINY, pyramid_order="morton", knn_window_halo=1,
                     mutual_check=True, mutual_check_tol=0.5)
    pts = rng.normal(size=(2, cfg.num_points, 3)).astype(np.float32)
    pts = np.stack([c[morton_order_np(c)] for c in pts])
    ref = rng.normal(size=(2, cfg.num_points, 3)).astype(np.float32)
    ref = np.stack([c[morton_order_np(c)] for c in ref])
    pyr_src = build_pyramid(jnp.asarray(pts), cfg.num_knn,
                            cfg.sub_sampling_ratio, chunk=128,
                            sample="strided", window_halo=1)
    pyr_ref = build_pyramid(jnp.asarray(ref), cfg.num_knn,
                            cfg.sub_sampling_ratio, chunk=128,
                            sample="strided", window_halo=1)
    batch = PairBatch(jnp.asarray(pts), jnp.asarray(ref), pyr_src, pyr_ref,
                      transform_gt=jnp.broadcast_to(jnp.eye(3, 4), (2, 3, 4)))
    model = Network(cfg, pipeline="align")
    params = model.init(jax.random.PRNGKey(0), batch, ForwardOptions(2))
    ts, outs = model.apply(params, batch,
                           ForwardOptions(num_iter=3, refine_stride=2))
    assert ts.shape == (3, 2, 3, 4)
    assert outs.pred_idx.shape == (2, 2, cfg.num_points // 2)
    assert np.all(np.isfinite(np.asarray(ts)))


def test_forward_align_mutual_check(rng):
    """mutual_check is parameter-free; on identical clouds every match is
    reciprocal (exact self-distance 0) so the gated forward equals the
    ungated one, and on generic clouds it runs finite."""
    from dataclasses import replace as dc_replace
    batch = make_batch(rng)
    batch_id = batch._replace(points_ref=batch.points_src,
                              pyramid_ref=batch.pyramid_src)
    m0 = Network(TINY, pipeline="align")
    m1 = Network(dc_replace(TINY, mutual_check=True), pipeline="align")
    params = m0.init(jax.random.PRNGKey(0), batch_id, ForwardOptions(2))
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(
                m1.init(jax.random.PRNGKey(0), batch_id, ForwardOptions(2))))
    t0, _ = m0.apply(params, batch_id, ForwardOptions(num_iter=2))
    t1, _ = m1.apply(params, batch_id, ForwardOptions(num_iter=2))
    np.testing.assert_allclose(np.asarray(t0), np.asarray(t1), atol=1e-6)
    t2, _ = m1.apply(params, batch, ForwardOptions(num_iter=2))
    assert np.all(np.isfinite(np.asarray(t2)))


def test_forward_align_gradients_flow_to_inlier_net(rng):
    batch = make_batch(rng)
    model = Network(TINY, pipeline="align")
    params = model.init(jax.random.PRNGKey(0), batch, ForwardOptions(1))

    def loss_fn(p):
        transforms, out = model.apply(p, batch, ForwardOptions(num_iter=1))
        return jnp.sum(jnp.abs(transforms)) + 0.0 * jnp.sum(out.inlier_logits)

    grads = jax.grad(loss_fn)(params)
    g = jax.tree_util.tree_leaves(
        grads["params"]["inlier_model"])
    total = sum(float(jnp.sum(jnp.abs(x))) for x in g)
    assert np.isfinite(total) and total > 0.0


def test_align_jit_compiles(rng):
    batch = make_batch(rng)
    model = Network(TINY, pipeline="align")
    params = model.init(jax.random.PRNGKey(0), batch, ForwardOptions(1))
    fwd = jax.jit(lambda p, b: model.apply(p, b, ForwardOptions(num_iter=1)))
    t1, _ = fwd(params, batch)
    t2, _ = fwd(params, batch)
    np.testing.assert_allclose(np.asarray(t1), np.asarray(t2), atol=1e-6)


def test_randla_ppf_path(rng):
    """PPF input featurization (reference feat_grouping, RandLANet.py:110-137)."""
    import jax
    import jax.numpy as jnp
    from deepsir_tpu.config import ModelConfig
    from deepsir_tpu.models.randla import RandLA
    from deepsir_tpu.ops.pyramid import build_pyramid

    cfg = ModelConfig(feat_len=6, use_ppf=True, num_points=128, num_knn=8,
                      sub_sampling_ratio=(4, 4), d_out=(8, 16),
                      out_feat_dim=16, num_classes=5)
    xyz = rng.normal(size=(1, 128, 3)).astype(np.float32)
    normals = rng.normal(size=(1, 128, 3)).astype(np.float32)
    normals /= np.linalg.norm(normals, axis=-1, keepdims=True)
    feats = jnp.asarray(np.concatenate([xyz, normals], axis=-1))
    pyr = build_pyramid(jnp.asarray(xyz), 8, (4, 4), chunk=64)
    model = RandLA(cfg, num_classes=5)
    params = model.init(jax.random.PRNGKey(0), feats, pyr)
    feat, logits = model.apply(params, feats, pyr)
    assert feat.shape == (1, 128, 16) and logits.shape == (1, 128, 5)
    assert bool(jnp.all(jnp.isfinite(feat)))


def test_registration_machinery_with_oracle_features(rng):
    """SURVEY §4(c): the correspondence->inlier->Kabsch machinery must
    recover the pose ~exactly when given oracle descriptors (GT-aligned
    coordinates as features), independent of any learned network."""
    import jax.numpy as jnp
    from deepsir_tpu.math import se3, se3_np
    from deepsir_tpu.ops.distance import nearest_neighbour_index
    from deepsir_tpu.ops.gather import gather_points
    from deepsir_tpu.ops.svd3 import weighted_kabsch

    src = rng.normal(size=(1, 500, 3)).astype(np.float32) * 5
    ang = 0.8
    gt = np.eye(4, dtype=np.float32)
    gt[:3, :3] = [[np.cos(ang), -np.sin(ang), 0],
                  [np.sin(ang), np.cos(ang), 0], [0, 0, 1]]
    gt[:3, 3] = [2.0, -1.0, 0.5]
    ref = se3_np.transform(gt, src[0])[rng.permutation(500)][None]

    # oracle descriptors: the GT-aligned coordinates themselves
    feat_src = jnp.asarray(se3_np.transform(gt, src[0])[None])
    feat_ref = jnp.asarray(ref)
    idx = nearest_neighbour_index(feat_src, feat_ref)
    matched = gather_points(jnp.asarray(ref), idx)
    tr, bad = weighted_kabsch(jnp.asarray(src), matched,
                              jnp.ones((1, 500), jnp.float32))
    tr = np.asarray(tr)[0]
    assert not bool(np.asarray(bad)[0])
    assert np.abs(tr - gt[:3]).max() < 1e-4

    # success metric agrees
    from deepsir_tpu.utils.metrics import rte_rre
    succ, rte, rre = rte_rre(tr, gt, 0.6, 5.0)
    assert succ == 1.0 and rte < 1e-4 and rre < 0.01


def test_fc_norm_batch_mode(rng):
    """fc_norm='batch' (the reference's BatchNorm1d flavor, stateless):
    normalizes to per-channel zero-mean/unit-var over all non-channel axes,
    swaps the GroupNorm params for scale/bias, and trains (finite grads)."""
    from deepsir_tpu.models.layers import ConvUnit

    x = jnp.asarray(rng.normal(size=(2, 64, 16)).astype(np.float32) * 3 + 1)
    unit = ConvUnit(8, norm="batch", use_act=False)
    params = unit.init(jax.random.PRNGKey(0), x)
    assert set(params["params"].keys()) == {"Dense_0", "scale", "bias"}
    y = unit.apply(params, x)
    # scale=1, bias=0 at init -> output is exactly the normalized pre-act
    flat = np.asarray(y).reshape(-1, 8)
    np.testing.assert_allclose(flat.mean(axis=0), 0.0, atol=1e-5)
    np.testing.assert_allclose(flat.std(axis=0), 1.0, atol=1e-3)

    # the full label pipeline runs + differentiates under fc_norm='batch'
    from deepsir_tpu.config import replace
    cfg = replace(TINY, fc_norm="batch")
    batch = make_batch(rng, cfg=cfg, with_labels=True)
    model = Network(cfg, pipeline="label")
    params = model.init(jax.random.PRNGKey(0), batch)

    def loss_fn(p):
        _, out = model.apply(p, batch)
        return jnp.mean(out.logits_src ** 2)

    g = jax.grad(loss_fn)(params)
    gsum = sum(float(jnp.sum(jnp.abs(l))) for l in jax.tree_util.tree_leaves(g))
    assert np.isfinite(gsum) and gsum > 0


def test_forward_align_inlier_num_knn(rng):
    """inlier_num_knn=4 on a num_knn=8 pyramid: the inlier net consumes the
    4-NEAREST-neighbour subgraph (KNN lists are distance-ascending), the
    param tree is UNCHANGED (AttPooling scores are per-channel, pooling is
    order-invariant) so checkpoints trained at full K evaluate directly,
    and the forward stays finite/proper. inlier_num_knn=num_knn is the
    identity."""
    from dataclasses import replace as dc_replace
    batch = make_batch(rng)
    cfg = dc_replace(TINY, inlier_num_knn=4)
    model = Network(cfg, pipeline="align")
    base = Network(TINY, pipeline="align")
    params = base.init(jax.random.PRNGKey(0), batch, ForwardOptions(2))
    params_k = model.init(jax.random.PRNGKey(0), batch, ForwardOptions(2))
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(params_k))
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(params_k)):
        assert a.shape == b.shape
    # full-K checkpoint runs at the truncated k
    transforms, out = model.apply(params, batch, ForwardOptions(num_iter=2))
    assert transforms.shape == (2, 2, 3, 4)
    assert np.all(np.isfinite(np.asarray(transforms)))
    dets = np.linalg.det(np.asarray(transforms)[..., :3])
    assert np.all(dets > 0.9)
    assert not np.any(np.asarray(out.invalid))
    # k == num_knn (and 0) are bit-identical to the baseline forward
    t_base, _ = base.apply(params, batch, ForwardOptions(num_iter=2))
    for k_id in (TINY.num_knn, 0):
        m_id = Network(dc_replace(TINY, inlier_num_knn=k_id),
                       pipeline="align")
        t_id, _ = m_id.apply(params, batch, ForwardOptions(num_iter=2))
        np.testing.assert_array_equal(np.asarray(t_id), np.asarray(t_base))


def test_forward_align_backbone_num_knn(rng):
    """backbone_num_knn=4 on a num_knn=8 pyramid: the BACKBONE + scoring
    path consumes the 4-nearest-neighbour subgraph (same first-k slice as
    inlier_num_knn, applied to both clouds' pyramids in backbone_pair and
    to scoring's level-0 lists), the param tree is UNCHANGED so full-K
    checkpoints evaluate directly, and the forward stays finite/proper.
    k == num_knn (and 0) are the identity. Perf probe for the backbone's
    L0 gather+conv chunk — requires its own quality gate (the descriptor
    path is the precision/context-sensitive one)."""
    from dataclasses import replace as dc_replace
    batch = make_batch(rng)
    cfg = dc_replace(TINY, backbone_num_knn=4)
    model = Network(cfg, pipeline="align")
    base = Network(TINY, pipeline="align")
    params = base.init(jax.random.PRNGKey(0), batch, ForwardOptions(2))
    params_k = model.init(jax.random.PRNGKey(0), batch, ForwardOptions(2))
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(params_k))
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(params_k)):
        assert a.shape == b.shape
    transforms, out = model.apply(params, batch, ForwardOptions(num_iter=2))
    assert transforms.shape == (2, 2, 3, 4)
    assert np.all(np.isfinite(np.asarray(transforms)))
    dets = np.linalg.det(np.asarray(transforms)[..., :3])
    assert np.all(dets > 0.9)
    assert not np.any(np.asarray(out.invalid))
    t_base, _ = base.apply(params, batch, ForwardOptions(num_iter=2))
    for k_id in (TINY.num_knn, 0):
        m_id = Network(dc_replace(TINY, backbone_num_knn=k_id),
                       pipeline="align")
        t_id, _ = m_id.apply(params, batch, ForwardOptions(num_iter=2))
        np.testing.assert_array_equal(np.asarray(t_id), np.asarray(t_base))


def test_forward_align_combined_perf_knobs(rng):
    """The round-4 candidate deploy set composes: truncated inlier pyramid
    (inlier_num_layers) + k-truncated neighbourhoods (inlier_num_knn) +
    outlier-signal input channels (inlier_extra_feats) in ONE config. Each
    knob is unit-tested alone above; this pins the 3-way composition the
    perf queue trains/evaluates, incl. gradient flow to the inlier net."""
    from dataclasses import replace as dc_replace
    batch = make_batch(rng)
    cfg = dc_replace(TINY, inlier_num_layers=1, inlier_num_knn=4,
                     inlier_extra_feats="dist,recip")
    model = Network(cfg, pipeline="align")
    params = model.init(jax.random.PRNGKey(0), batch, ForwardOptions(2))
    # extras widen the input (6 + dist + recip = 8 channels)
    pre = params["params"]["inlier_model"]["mlp_pre"]["Dense_0"]["kernel"]
    assert pre.shape[0] == 8
    transforms, out = model.apply(params, batch, ForwardOptions(num_iter=2))
    assert transforms.shape == (2, 2, 3, 4)
    assert np.all(np.isfinite(np.asarray(transforms)))
    dets = np.linalg.det(np.asarray(transforms)[..., :3])
    assert np.all(dets > 0.9)
    assert not np.any(np.asarray(out.invalid))

    def loss_fn(p):
        _, o = model.apply(p, batch, ForwardOptions(num_iter=2))
        return jnp.sum(jax.nn.sigmoid(o.inlier_logits))
    g = jax.grad(loss_fn)(params)
    gnorm = sum(float(jnp.sum(jnp.abs(x)))
                for x in jax.tree_util.tree_leaves(
                    g["params"]["inlier_model"]))
    assert np.isfinite(gnorm) and gnorm > 0


def test_slice_neighbours_is_knn_subgraph(rng):
    """slice_neighbours(pyr, k) equals a pyramid built at k directly when
    the KNN path is exact (small N -> exact top_k): first-k of an ascending
    list IS the k-NN set."""
    from deepsir_tpu.ops.pyramid import slice_neighbours
    pts = rng.normal(size=(64, 3)).astype(np.float32)
    full = build_pyramid(jnp.asarray(pts), 8, (4,), chunk=128)
    sliced = slice_neighbours(full, 4)
    direct = build_pyramid(jnp.asarray(pts), 4, (4,), chunk=128)
    for a, b in zip(sliced.neigh_idx, direct.neigh_idx):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(sliced.pool_idx, direct.pool_idx):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
