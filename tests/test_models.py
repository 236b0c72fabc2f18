"""Shape/finite-ness tests for the model stack: backbone, FPN, decoder, head,
full detector forward on tiny synthetic inputs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparsebev_tpu.models.resnet import ResNet
from sparsebev_tpu.models.vovnet import VoVNet
from sparsebev_tpu.models.fpn import FPN
from sparsebev_tpu.models.detector import SparseBEV

PC_RANGE = [-51.2, -51.2, -5.0, 51.2, 51.2, 3.0]

# tiny geometry: 2 frames, 6 views, 64x32 images
B, T, N = 1, 2, 6
H, W = 32, 64
NUM_QUERY = 16
EMBED = 64


def _model_cfg(num_levels=4):
    return dict(
        img_backbone=dict(type="ResNet", depth=50, out_indices=(0, 1, 2, 3)),
        img_neck=dict(type="FPN", in_channels=[256, 512, 1024, 2048],
                      out_channels=EMBED, num_outs=num_levels),
        pts_bbox_head=dict(
            type="SparseBEVHead", num_classes=10, in_channels=EMBED,
            num_query=NUM_QUERY, num_frames=T, num_points=2, num_layers=2,
            num_levels=num_levels, code_size=10, pc_range=PC_RANGE),
        data_aug=dict(
            img_color_aug=True,
            img_norm_cfg=dict(mean=[123.675, 116.28, 103.53],
                              std=[58.395, 57.12, 57.375], to_rgb=True),
            img_pad_cfg=dict(size_divisor=32)),
    )


def _inputs(rng):
    img = rng.uniform(0, 255, (B, T * N, H, W, 3)).astype(np.float32)
    lidar2img = rng.randn(B, T * N, 4, 4).astype(np.float32)
    time_diff = np.asarray([[0.0, 0.5]], dtype=np.float32)
    return jnp.asarray(img), jnp.asarray(lidar2img), jnp.asarray(time_diff)


def test_resnet_shapes(rng):
    model = ResNet(depth=50)
    x = jnp.asarray(rng.randn(2, 64, 64, 3).astype(np.float32))
    vars_ = model.init(jax.random.PRNGKey(0), x)
    outs = model.apply(vars_, x)
    assert [o.shape for o in outs] == [
        (2, 16, 16, 256), (2, 8, 8, 512), (2, 4, 4, 1024), (2, 2, 2, 2048)]


def test_fpn_shapes(rng):
    model = FPN(in_channels=[256, 512, 1024, 2048], out_channels=64, num_outs=5)
    ins = [jnp.asarray(rng.randn(2, 16 // (2 ** i), 16 // (2 ** i), c).astype(np.float32))
           for i, c in enumerate([256, 512, 1024, 2048])]
    vars_ = model.init(jax.random.PRNGKey(0), ins)
    outs = model.apply(vars_, ins)
    assert len(outs) == 5
    assert outs[0].shape == (2, 16, 16, 64)
    assert outs[4].shape == (2, 1, 1, 64)


def test_vovnet_shapes(rng):
    model = VoVNet(spec_name="V-19-slim-eSE")
    x = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
    vars_ = model.init(jax.random.PRNGKey(0), x)
    outs = model.apply(vars_, x)
    assert [o.shape for o in outs] == [
        (1, 16, 16, 112), (1, 8, 8, 256), (1, 4, 4, 384), (1, 2, 2, 512)]


def test_detector_forward_inference(rng):
    model = SparseBEV(**_model_cfg())
    img, lidar2img, time_diff = _inputs(rng)
    vars_ = model.init(
        {"params": jax.random.PRNGKey(0), "aug": jax.random.PRNGKey(1)},
        img, lidar2img, time_diff, train=False)
    preds = model.apply(vars_, img, lidar2img, time_diff, train=False)
    assert preds["all_cls_scores"].shape == (2, B, NUM_QUERY, 10)
    assert preds["all_bbox_preds"].shape == (2, B, NUM_QUERY, 10)
    assert np.isfinite(np.asarray(preds["all_cls_scores"])).all()
    assert np.isfinite(np.asarray(preds["all_bbox_preds"])).all()
    # normalized-layout sanity: cz (col 4) within extended pc z-range
    cz = np.asarray(preds["all_bbox_preds"])[..., 4]
    assert cz.min() >= PC_RANGE[2] - 1e-3 and cz.max() <= PC_RANGE[5] + 1e-3


def test_detector_query_init(rng):
    model = SparseBEV(**_model_cfg())
    img, lidar2img, time_diff = _inputs(rng)
    vars_ = model.init(
        {"params": jax.random.PRNGKey(0), "aug": jax.random.PRNGKey(1)},
        img, lidar2img, time_diff, train=False)
    qb = np.asarray(vars_["params"]["head"]["init_query_bbox"])
    assert qb.shape == (NUM_QUERY, 10)
    # grid xy in (0,1), z=0, log h = 1.5, vel = 0
    assert qb[:, 0].min() > 0 and qb[:, 0].max() < 1
    np.testing.assert_allclose(qb[:, 2], 0.0)
    np.testing.assert_allclose(qb[:, 5], 1.5)
    np.testing.assert_allclose(qb[:, 8:], 0.0)
    # unique grid positions
    assert len(np.unique(qb[:, :2], axis=0)) == NUM_QUERY


def test_detector_train_mode_with_rngs(rng):
    model = SparseBEV(**_model_cfg())
    img, lidar2img, time_diff = _inputs(rng)
    vars_ = model.init(
        {"params": jax.random.PRNGKey(0), "aug": jax.random.PRNGKey(1)},
        img, lidar2img, time_diff, train=False)
    preds = model.apply(
        vars_, img, lidar2img, time_diff, train=True,
        rngs={"aug": jax.random.PRNGKey(2), "dropout": jax.random.PRNGKey(3)})
    assert np.isfinite(np.asarray(preds["all_cls_scores"])).all()


def test_decoder_inference_cls_skip_equivalence(rng):
    """The deterministic decoder path statically skips the 5 intermediate
    cls branches (only ``cls_scores[-1]`` is ever decoded — reference
    sparsebev_head.py:462-482). Verify vs a manual unrolled loop over the
    shared layer with the branch ON: identical bbox_preds at every layer,
    identical final cls, -1e4 fill elsewhere, and a train/infer param-tree
    match (scan + final unrolled call share one scope)."""
    from sparsebev_tpu.models.decoder import (
        SparseBEVTransformer, SparseBEVTransformerDecoderLayer)
    from sparsebev_tpu.ops.msmv_sampling import pack_mlvl_feats_grouped

    L, G, C = 3, 4, EMBED
    model = SparseBEVTransformer(
        embed_dims=C, num_frames=T, num_points=2, num_layers=L,
        num_levels=2, pc_range=PC_RANGE, num_groups=G, num_views=N,
        mixer_out_points=8)
    q_bbox = jnp.asarray(
        np.concatenate([rng.uniform(0.2, 0.8, (B, NUM_QUERY, 3)),
                        rng.uniform(0.5, 1.5, (B, NUM_QUERY, 3)),
                        rng.randn(B, NUM_QUERY, 4) * 0.1], -1)
        .astype(np.float32))
    q_feat = jnp.asarray(rng.randn(B, NUM_QUERY, C).astype(np.float32))
    feats = [jnp.asarray(rng.randn(B, T * N, 8 // (2 ** i), 16 // (2 ** i), C)
                         .astype(np.float32)) for i in range(2)]
    l2i = jnp.asarray(rng.randn(B, T * N, 4, 4).astype(np.float32))
    tdiff = jnp.asarray(np.tile([[0.0, 0.5]], (B, 1)).astype(np.float32))
    args = (q_bbox, q_feat, feats, None, l2i, tdiff, H, W)

    vars_inf = model.init(jax.random.PRNGKey(0), *args, deterministic=True)
    vars_tr = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        *args, deterministic=False)
    assert (jax.tree_util.tree_structure(vars_inf)
            == jax.tree_util.tree_structure(vars_tr))
    for a, b in zip(jax.tree_util.tree_leaves(vars_inf),
                    jax.tree_util.tree_leaves(vars_tr)):
        assert a.shape == b.shape and a.dtype == b.dtype

    cls_scores, bbox_preds = model.apply(vars_inf, *args, deterministic=True)

    layer = SparseBEVTransformerDecoderLayer(
        embed_dims=C, num_frames=T, num_points=2, num_levels=2,
        num_classes=10, code_size=10, pc_range=PC_RANGE, num_groups=G,
        mixer_out_points=8, num_views=N, dtype=None)
    lparams = {"params": vars_inf["params"]["decoder_layer"]}
    grouped = pack_mlvl_feats_grouped(feats, N, G, yfold=True)
    qb, qf = q_bbox, q_feat
    ref_bbox, ref_cls = [], []
    for _ in range(L):
        qf, cs, bp = layer.apply(lparams, qb, qf, grouped, None, l2i,
                                 tdiff, H, W, True, True)
        ref_bbox.append(bp)
        ref_cls.append(cs)
        qb = bp
    np.testing.assert_allclose(np.asarray(bbox_preds),
                               np.nan_to_num(np.stack(ref_bbox)),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(cls_scores[-1]),
                               np.nan_to_num(np.asarray(ref_cls[-1])),
                               rtol=1e-5, atol=1e-5)
    assert np.all(np.asarray(cls_scores[:-1]) == -1e4)


def test_detector_grad_flows(rng):
    model = SparseBEV(**_model_cfg())
    img, lidar2img, time_diff = _inputs(rng)
    vars_ = model.init(
        {"params": jax.random.PRNGKey(0), "aug": jax.random.PRNGKey(1)},
        img, lidar2img, time_diff, train=False)

    def loss_fn(params):
        preds = model.apply({"params": params, "batch_stats": vars_["batch_stats"]},
                            img, lidar2img, time_diff, train=False)
        return jnp.sum(preds["all_cls_scores"] ** 2) + jnp.sum(preds["all_bbox_preds"] ** 2)

    grads = jax.grad(loss_fn)(vars_["params"])
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    # gradient reaches the backbone and the query embeddings
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    nonzero = {jax.tree_util.keystr(k): float(jnp.abs(v).max()) for k, v in flat}
    assert any("backbone" in k and v > 0 for k, v in nonzero.items())
    assert any("init_query_bbox" in k and v > 0 for k, v in nonzero.items())
