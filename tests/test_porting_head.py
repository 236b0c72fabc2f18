"""Head/decoder checkpoint porting: torch-oracle numerics + key completeness.

Verifies the torch->flax map for everything the reference head carries
(sparsebev_head.py:50-51, sparsebev_transformer.py:104-387): a decoder layer
is assembled from real torch.nn modules under the REFERENCE state_dict key
names, the reference forward math is replicated in torch (parameter-free
geometry reuses our golden-tested jax ops on both sides), and the ported
flax layer must reproduce the torch output to fp32 tolerance. A second test
asserts the port covers the flax head param tree exactly (no missing, no
extra leaves). This is the strongest porting evidence available without a
released checkpoint on disk (zero-egress environment)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as tF

from sparsebev_tpu.models.decoder import SparseBEVTransformerDecoderLayer
from sparsebev_tpu.models.head import SparseBEVHead
from sparsebev_tpu.ops.box_ops import decode_bbox
from sparsebev_tpu.ops.msmv_sampling import pack_mlvl_feats_grouped
from sparsebev_tpu.ops.projection import make_sample_points
from sparsebev_tpu.utils.checkpoint_io import (_port_sparsebev_head,
                                               merge_pretrained)

PC = [-20.0, -20.0, -5.0, 20.0, 20.0, 3.0]
C, HEADS, G, P, T, L, N, Q, B = 32, 8, 4, 2, 2, 2, 2, 9, 1
IMG_H, IMG_W = 16, 24
NUM_CLASSES = 5


def _build_torch_layer(seed=0):
    """Reference decoder layer's parameterized modules, reference key names."""
    torch.manual_seed(seed)
    m = {}
    m["position_encoder"] = tnn.Sequential(
        tnn.Linear(3, C), tnn.LayerNorm(C), tnn.ReLU(),
        tnn.Linear(C, C), tnn.LayerNorm(C), tnn.ReLU())
    m["gen_tau"] = tnn.Linear(C, HEADS)
    m["attn"] = tnn.MultiheadAttention(C, HEADS, dropout=0.0, batch_first=True)
    m["sampling_offset"] = tnn.Linear(C, G * P * 3)
    m["scale_weights"] = tnn.Linear(C, G * P * L)
    m_params = (C // G) * (C // G)
    s_params = (T * P) * 128
    m["parameter_generator"] = tnn.Linear(C, G * (m_params + s_params))
    m["mix_out_proj"] = tnn.Linear(G * 128 * (C // G), C)
    m["ffn1"] = tnn.Linear(C, 512)
    m["ffn2"] = tnn.Linear(512, C)
    for i in (1, 2, 3):
        m[f"norm{i}"] = tnn.LayerNorm(C)
    m["cls_branch"] = tnn.Sequential(
        tnn.Linear(C, C), tnn.LayerNorm(C), tnn.ReLU(),
        tnn.Linear(C, C), tnn.LayerNorm(C), tnn.ReLU(),
        tnn.Linear(C, NUM_CLASSES))
    m["reg_branch"] = tnn.Sequential(
        tnn.Linear(C, C), tnn.ReLU(), tnn.Linear(C, C), tnn.ReLU(),
        tnn.Linear(C, 10))
    for mod in m.values():
        mod.eval()
    return m


def _state_dict(m, q=Q, with_head_embeds=True, seed=1):
    """Emit the reference checkpoint key layout for the head."""
    L_ = "pts_bbox_head.transformer.decoder.decoder_layer."
    sd = {}

    def put(dst, mod):
        for k, v in mod.state_dict().items():
            sd[f"{L_}{dst}.{k}"] = v.detach().numpy()

    put("position_encoder", m["position_encoder"])
    put("self_attn.gen_tau", m["gen_tau"])
    put("self_attn.attention.attn", m["attn"])
    put("sampling.sampling_offset", m["sampling_offset"])
    put("sampling.scale_weights", m["scale_weights"])
    put("mixing.parameter_generator", m["parameter_generator"])
    put("mixing.out_proj", m["mix_out_proj"])
    put("ffn.layers.0.0", m["ffn1"])
    put("ffn.layers.1", m["ffn2"])
    for i in (1, 2, 3):
        put(f"norm{i}", m[f"norm{i}"])
    put("cls_branch", m["cls_branch"])
    put("reg_branch", m["reg_branch"])
    if with_head_embeds:
        rng = np.random.RandomState(seed)
        sd["pts_bbox_head.init_query_bbox.weight"] = rng.randn(q, 10).astype(np.float32)
        sd["pts_bbox_head.label_enc.weight"] = rng.randn(
            NUM_CLASSES + 1, C - 1).astype(np.float32)
    return sd


def _torch_layer_forward(m, qb, qf, feats, lidar2img, time_diff):
    """Reference decoder-layer forward (sparsebev_transformer.py:104-193),
    replicated with torch modules; parameter-free geometry (box decode,
    projection+sampling) reuses our golden-tested jax ops on numpy values."""
    qb_t = torch.from_numpy(qb)
    x = torch.from_numpy(qf)

    # position encoder + residual
    x = x + m["position_encoder"](qb_t[..., :3])

    # SASA: attn_bias = dist * tau (dist = -|dxy|), additive float mask
    centers = np.asarray(decode_bbox(jnp.asarray(qb), PC))[..., :2]
    dist = -np.linalg.norm(centers[:, :, None, :] - centers[:, None, :, :],
                           axis=-1).astype(np.float32)  # [B, Q, Q]
    tau = m["gen_tau"](x)                               # [B, Q, H]
    attn_mask = (torch.from_numpy(dist)[:, None]
                 * tau.permute(0, 2, 1)[..., None])     # [B, H, Q, Q]
    attn_mask = attn_mask.reshape(B * HEADS, Q, Q)
    attn_out, _ = m["attn"](x, x, x, attn_mask=attn_mask, need_weights=False)
    x = m["norm1"](x + attn_out)

    # adaptive sampling: offsets/scale weights from torch Linears, the
    # projection+bilinear sampling itself via our jax op (no params)
    offset = m["sampling_offset"](x).reshape(B, Q, G * P, 3)
    pts = make_sample_points(jnp.asarray(qb),
                             jnp.asarray(offset.detach().numpy()), PC)
    pts = jnp.broadcast_to(pts.reshape(B, Q, 1, G, P, 3), (B, Q, T, G, P, 3))
    vel = qb[..., 8:10]
    dist_v = vel[:, :, None, :] * time_diff[:, None, :, None]
    pts = jnp.concatenate(
        [pts[..., 0:2] - dist_v[:, :, :, None, None, :], pts[..., 2:3]], -1)
    sw = m["scale_weights"](x).reshape(B, Q, G, 1, P, L)
    sw = tF.softmax(sw, dim=-1).expand(B, Q, G, T, P, L)
    from sparsebev_tpu.ops.projection import sampling_4d
    packed = pack_mlvl_feats_grouped([jnp.asarray(f) for f in feats], N, G)
    sampled = sampling_4d(pts, packed, jnp.asarray(sw.detach().numpy()),
                          jnp.asarray(lidar2img), IMG_H, IMG_W, num_views=N)
    sampled_t = torch.from_numpy(np.asarray(sampled))   # [B, Q, G, T*P, Cg]

    # adaptive mixing (reference :320-387)
    cg = C // G
    params = m["parameter_generator"](x).reshape(B * Q, G, -1)
    M = params[..., :cg * cg].reshape(B * Q, G, cg, cg)
    S = params[..., cg * cg:].reshape(B * Q, G, 128, T * P)
    out = sampled_t.reshape(B * Q, G, T * P, cg)
    out = torch.matmul(out, M)
    out = tF.relu(tF.layer_norm(out, out.shape[-2:]))
    out = torch.matmul(S, out)
    out = tF.relu(tF.layer_norm(out, out.shape[-2:]))
    out = m["mix_out_proj"](out.reshape(B, Q, -1))
    x = m["norm2"](x + out)

    # FFN
    x = m["norm3"](x + m["ffn2"](tF.relu(m["ffn1"](x))))

    cls_score = m["cls_branch"](x)
    bbox_pred = m["reg_branch"](x)

    # refine_bbox (:162-178) + velocity /dt (:179-183)
    xyz = torch.special.logit(qb_t[..., 0:3], eps=1e-5)
    xyz_new = torch.sigmoid(bbox_pred[..., 0:3] + xyz)
    bbox_pred = torch.cat([xyz_new, bbox_pred[..., 3:]], dim=-1)
    dt = torch.from_numpy(time_diff)[:, 1:2, None]
    bbox_pred = torch.cat([bbox_pred[..., :8], bbox_pred[..., 8:] / dt], -1)
    return (x.detach().numpy(), cls_score.detach().numpy(),
            bbox_pred.detach().numpy())


def _random_inputs(rng):
    qb = rng.rand(B, Q, 10).astype(np.float32)
    qb[..., 8:10] = rng.randn(B, Q, 2) * 0.1
    qf = rng.randn(B, Q, C).astype(np.float32)
    feats = [rng.randn(B, T * N, h, w, C).astype(np.float32)
             for h, w in ((8, 12), (4, 6))]
    # lidar2img: simple scaled projections so many points land in-image
    l2i = np.tile(np.eye(4, dtype=np.float32), (B, T * N, 1, 1))
    l2i[:, :, 0, 0] = 0.6
    l2i[:, :, 1, 1] = 0.6
    l2i[:, :, 0, 3] = IMG_W / 2
    l2i[:, :, 1, 3] = IMG_H / 2
    l2i[:, :, 2, 3] = 3.0
    time_diff = np.asarray([[0.0, 0.5]], np.float32)
    return qb, qf, feats, l2i, time_diff


def test_ported_decoder_layer_matches_torch(rng):
    m = _build_torch_layer()
    sd = _state_dict(m)
    ported = _port_sparsebev_head(sd)["transformer"]["decoder_layer"]

    qb, qf, feats, l2i, time_diff = _random_inputs(rng)
    with torch.no_grad():
        x_t, cls_t, box_t = _torch_layer_forward(m, qb, qf, feats, l2i,
                                                 time_diff)

    layer = SparseBEVTransformerDecoderLayer(
        C, num_frames=T, num_points=P, num_levels=L, num_classes=NUM_CLASSES,
        code_size=10, pc_range=PC, num_groups=G, mixer_out_points=128,
        num_views=N)
    packed = pack_mlvl_feats_grouped([jnp.asarray(f) for f in feats], N, G)
    variables = layer.init(jax.random.PRNGKey(0), jnp.asarray(qb),
                           jnp.asarray(qf), packed, None, jnp.asarray(l2i),
                           jnp.asarray(time_diff), IMG_H, IMG_W, True)
    # every initialized leaf must be covered by the port, and vice versa
    flat_init = jax.tree_util.tree_flatten_with_path(variables["params"])[0]
    flat_port = jax.tree_util.tree_flatten_with_path(ported)[0]
    keys_init = {jax.tree_util.keystr(p) for p, _ in flat_init}
    keys_port = {jax.tree_util.keystr(p) for p, _ in flat_port}
    assert keys_init == keys_port, (keys_init ^ keys_port)

    x_j, cls_j, box_j = layer.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, ported)},
        jnp.asarray(qb), jnp.asarray(qf), packed, None, jnp.asarray(l2i),
        jnp.asarray(time_diff), IMG_H, IMG_W, True)

    np.testing.assert_allclose(np.asarray(x_j), x_t, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(cls_j), cls_t, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(box_j), box_t, rtol=2e-4, atol=2e-4)


def test_head_port_key_coverage(rng):
    """Porting a full reference head state_dict covers our head param tree
    exactly: no missing leaves, no extras, strict shape agreement."""
    m = _build_torch_layer()
    sd = _state_dict(m)
    ported = _port_sparsebev_head(sd)

    head = SparseBEVHead(
        num_classes=NUM_CLASSES, in_channels=C, num_query=Q, num_frames=T,
        num_points=P, num_layers=2, num_levels=L, code_size=10, pc_range=PC,
        num_groups=G, mixer_out_points=128, num_views=N)
    feats = [jnp.asarray(rng.randn(B, T * N, h, w, C).astype(np.float32))
             for h, w in ((8, 12), (4, 6))]
    l2i = jnp.asarray(np.tile(np.eye(4, dtype=np.float32), (B, T * N, 1, 1)))
    td = jnp.asarray([[0.0, 0.5]], jnp.float32)
    variables = head.init(jax.random.PRNGKey(0), feats, l2i, td, IMG_H, IMG_W)

    flat_init = jax.tree_util.tree_flatten_with_path(variables["params"])[0]
    flat_port = jax.tree_util.tree_flatten_with_path(ported)[0]
    keys_init = {jax.tree_util.keystr(p): np.shape(v) for p, v in flat_init}
    keys_port = {jax.tree_util.keystr(p): np.shape(v) for p, v in flat_port}
    assert keys_init == keys_port, (
        set(keys_init) ^ set(keys_port),
        {k: (keys_init.get(k), keys_port.get(k))
         for k in keys_init if keys_port.get(k) != keys_init[k]})

    merged = merge_pretrained(variables, {"params": ported})
    got = merged["params"]["transformer"]["decoder_layer"][
        "self_attn"]["attention"]["in_proj_weight"]
    want = np.transpose(sd[
        "pts_bbox_head.transformer.decoder.decoder_layer."
        "self_attn.attention.attn.in_proj_weight"])
    np.testing.assert_array_equal(np.asarray(got), want)
