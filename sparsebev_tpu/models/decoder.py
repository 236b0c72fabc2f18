"""SparseBEV transformer decoder (TPU-native Flax rewrite).

Mirrors /root/reference/models/sparsebev_transformer.py:
- 6 iterations of ONE weight-shared decoder layer (:41-101);
- scale-adaptive self-attention (SASA, :196-248);
- adaptive spatio-temporal sampling (:251-317);
- AdaMixer-style adaptive mixing (:320-387).

TPU-first deltas: channel-last feature layout, functional modules with
explicit rngs, `lax.stop_gradient` instead of `.detach()`/`no_grad`,
`jax.checkpoint`-ready pure functions, static shapes throughout. Timestamps
are pre-reduced to a ``time_diff [B, T]`` input so the whole decoder jits.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.box_ops import decode_bbox
from ..ops.geometry import inverse_sigmoid
from ..ops.projection import make_sample_points, project_points, sampling_4d
from ..utils.dump import DUMP, dump_save
from .layers import (FFN, Linear, MultiheadAttention, bias_init_with_prob,
                     layer_norm_nd)


class SparseBEVSelfAttention(nn.Module):
    """Scale-adaptive self attention: per-head distance decay
    ``attn_bias = -dist[q, q'] * tau[b, h, q]`` (reference :196-248)."""

    embed_dims: int = 256
    num_heads: int = 8
    dropout: float = 0.1
    pc_range: Sequence[float] = ()
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, query_bbox, query_feat, pre_attn_mask,
                 deterministic: bool = True):
        b, q, _ = query_bbox.shape
        # pairwise BEV center distances; no gradient to the boxes (:236-248).
        # Geometry stays fp32 even under a bf16 compute dtype.
        centers = decode_bbox(jax.lax.stop_gradient(query_bbox), self.pc_range)[..., :2]
        centers = centers.astype(jnp.float32)
        dist = jnp.linalg.norm(centers[:, :, None, :] - centers[:, None, :, :], axis=-1)
        dist = -dist  # [B, Q, Q]

        tau = Linear(self.num_heads, dtype=self.dtype,
                     kernel_init=nn.initializers.zeros,
                     bias_init=lambda key, shape, dtype=jnp.float32:
                         jax.random.uniform(key, shape, dtype, 0.0, 2.0),
                     name="gen_tau")(query_feat)  # [B, Q, H]
        tau = tau.astype(jnp.float32)

        dump_save("sasa_tau", tau)  # viz_sample_points consumes these
        tau = jnp.transpose(tau, (0, 2, 1))  # [B, H, Q]
        attn_mask = dist[:, None, :, :] * tau[..., None]  # [B, H, Q, Q]
        if pre_attn_mask is not None:  # query denoising group isolation
            attn_mask = jnp.where(pre_attn_mask[None, None, :, :], -jnp.inf, attn_mask)
        attn_mask = attn_mask.reshape(b * self.num_heads, q, q)

        return MultiheadAttention(self.embed_dims, self.num_heads, self.dropout,
                                  dtype=self.dtype, name="attention")(
            query_feat, attn_mask=attn_mask, deterministic=deterministic)


class SparseBEVSampling(nn.Module):
    """Adaptive spatio-temporal sampling (reference :251-317): offsets in the
    box frame, velocity-compensated across frames, per-level softmax weights."""

    embed_dims: int = 256
    num_frames: int = 8
    num_groups: int = 4
    num_points: int = 4
    num_levels: int = 4
    pc_range: Sequence[float] = ()
    num_views: int = 6
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, query_bbox, query_feat, mlvl_feats, lidar2img,
                 time_diff, image_h, image_w):
        b, q = query_bbox.shape[:2]
        g, p, t = self.num_groups, self.num_points, self.num_frames

        # offsets: zero-init weight, bias ~ U(-0.5, 0.5) (:265-268);
        # the offsets feed fp32 geometry downstream
        offset = Linear(g * p * 3, dtype=self.dtype,
                        kernel_init=nn.initializers.zeros,
                        bias_init=lambda key, shape, dtype=jnp.float32:
                            jax.random.uniform(key, shape, dtype, -0.5, 0.5),
                        name="sampling_offset")(query_feat)
        offset = offset.reshape(b, q, g * p, 3).astype(jnp.float32)

        pts = make_sample_points(query_bbox, offset, self.pc_range)  # [B,Q,GP,3]
        # build the T-expanded points directly in QUERY-MAJOR (q, b, g, t, p)
        # memory order: the pre-expansion transposes are T*x smaller than
        # transposing the projected locations afterwards (r3 profile: the
        # 6D loc transpose cost ~0.9 ms/sample at r50-900q)
        base_q = jnp.transpose(pts.reshape(b, q, g, p, 3),
                               (1, 0, 2, 3, 4))          # [Q, B, G, P, 3]
        base_q = base_q[:, :, :, None, :, :]             # [Q, B, G, 1, P, 3]

        # velocity warp: move past-frame samples back along -v*dt (:285-295)
        vel = jax.lax.stop_gradient(query_bbox[..., 8:10])  # [B, Q, 2]
        dist = vel[:, :, None, :] * time_diff[:, None, :, None]  # [B, Q, T, 2]
        dist_q = jnp.transpose(dist, (1, 0, 2, 3))       # [Q, B, T, 2]
        dist_q = dist_q[:, :, None, :, None, :]          # [Q, B, 1, T, 1, 2]
        pts_q = jnp.concatenate([
            base_q[..., 0:2] - dist_q,
            jnp.broadcast_to(base_q[..., 2:3], (q, b, g, t, p, 1)),
        ], axis=-1)                                      # [Q, B, G, T, P, 3]

        # per-level weights, shared across frames (:298-300); softmax in fp32
        sw = Linear(g * p * self.num_levels, dtype=self.dtype,
                    name="scale_weights")(query_feat)
        sw = sw.reshape(b, q, g, 1, p, self.num_levels).astype(jnp.float32)
        sw = jax.nn.softmax(sw, axis=-1)
        sw = jnp.broadcast_to(sw, (b, q, g, t, p, self.num_levels))

        if DUMP.enabled:  # camera-space points + valid masks for the viz tools
            pts_bq = jnp.transpose(pts_q, (1, 0, 3, 2, 4, 5)
                                   ).reshape(b, q, t, g * p, 3)
            loc, valid = project_points(
                pts_bq, lidar2img, image_h, image_w, self.num_views)
            dump_save("sample_points_cam", loc)
            dump_save("sample_points_cam_valid_mask", valid)

        sampled = sampling_4d(None, mlvl_feats, sw, lidar2img, image_h,
                              image_w, num_views=self.num_views,
                              sample_points_q=pts_q)
        # named so the remat policy can SAVE it: re-running the sampling
        # gathers in the backward replay costs ~25 ms/step at r50 scale for
        # ~100 MB of bf16 activations kept
        from jax.ad_checkpoint import checkpoint_name
        return checkpoint_name(sampled, "sampled_feats")  # [B,Q,G,T*P,C/G]


class _EinsumDense(nn.Module):
    """Dense over a (g, o, c)-flattened input, contracted WITHOUT the flat
    reshape (fuses in the producer's layout). Param tree/init identical to
    layers.Linear's inner Dense — checkpoints port unchanged."""

    features: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, h2):  # [BQ, G, O, C]
        from .layers import torch_linear_bias_init, torch_linear_kernel_init
        bq, g, o, c = h2.shape
        fan_in = g * o * c
        kernel = self.param("kernel", torch_linear_kernel_init,
                            (fan_in, self.features))
        bias = self.param("bias", torch_linear_bias_init(fan_in),
                          (self.features,))
        k4 = kernel.reshape(g, o, c, self.features)
        if self.dtype is not None:
            h2 = h2.astype(self.dtype)
            k4 = k4.astype(self.dtype)
            bias = bias.astype(self.dtype)
        return jnp.einsum("bgoc,gocd->bd", h2, k4) + bias


class _EinsumOutProj(nn.Module):
    features: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, h2):
        # child named "linear" so the param path matches layers.Linear
        return _EinsumDense(self.features, dtype=self.dtype,
                            name="linear")(h2)


class _PreshapedGeneratorDense(nn.Module):
    """The mixing parameter generator's Dense, computed as TWO plain 2-D
    GEMMs against group-contiguous flattened weight views instead of one
    packed matmul + activation slice + lane-splitting reshapes.

    Param tree is byte-identical to ``Linear(name="parameter_generator")``
    (``parameter_generator/linear/{kernel,bias}``, kernel ``[E, G*(M+S)]``),
    so checkpoints port unchanged, and the outputs equal the packed form
    exactly (same dot, same flattening order; verified maxerr 0.0 on TPU).
    Why: slicing the packed ``[BQ, G*(M+S)]`` activation and reshaping to
    ``m [BQ,G,C,D]`` / ``s [BQ,G,O,P]`` splits the lane dimension, which XLA
    implements as relayout copies of both 30 MB tensors (~2.4 ms/sample at
    r50-900q). Pre-shaping the WEIGHT instead is free: the views are
    loop-invariant (hoisted out of the streaming/scan loop) and the dot
    emits m/s directly in 4-D layout. Measured: 1.632 -> 1.376 ms/layer for
    the full mixing block.

    A/B'd alternative (2026-08-17, REJECTED): plain 2-D GEMMs
    ``[BQ,E]@[E,G*M]`` against group-contiguous flat weight views, with the
    4-D reshape as a free bitcast of the ``{1,0}`` output. The einsum form
    lowers to a convolution fusion with a batch-minor ``{0,3,2,1}`` output
    + a 1.24 ms relayout copy (r3 profile), which looked like pure waste —
    but the full streaming loop measured 49.89 ms/sample for the GEMM form
    vs 48.89 for the einsum form: XLA's layout choices around the conv
    fusion are net better in context. Keep the einsum.
    """

    n_groups: int
    m_params: int
    s_params: int
    m_shape: tuple  # (eff_in, eff_out)
    s_shape: tuple  # (out_points, in_points)
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, query):
        from .layers import torch_linear_bias_init
        e = query.shape[-1]
        total = self.n_groups * (self.m_params + self.s_params)
        scope = self.scope.push("linear")
        kernel = scope.param("kernel", nn.initializers.zeros, (e, total))
        bias = scope.param("bias", torch_linear_bias_init(e), (total,))
        g, mp, sp = self.n_groups, self.m_params, self.s_params
        query, kernel, bias = nn.dtypes.promote_dtype(
            query, kernel, bias, dtype=self.dtype)
        wk = kernel.reshape(e, g, mp + sp)
        bk = bias.reshape(g, mp + sp)
        wm = wk[..., :mp].reshape(e, g, *self.m_shape)
        ws = wk[..., mp:].reshape(e, g, *self.s_shape)
        bm = bk[..., :mp].reshape(g, *self.m_shape)
        bs = bk[..., mp:].reshape(g, *self.s_shape)
        b, q, _ = query.shape
        q2 = query.reshape(b * q, e)
        m = jnp.einsum("be,egcd->bgcd", q2, wm) + bm
        s = jnp.einsum("be,egop->bgop", q2, ws) + bs
        return m, s


class AdaptiveMixing(nn.Module):
    """AdaMixer-style dynamic channel+point mixing (reference :320-387)."""

    in_dim: int
    in_points: int
    n_groups: int = 4
    out_points: int = 128
    query_dim: Optional[int] = None
    out_dim: Optional[int] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, query):
        qd = self.query_dim or self.in_dim
        od = self.out_dim or self.in_dim
        eff_in = self.in_dim // self.n_groups
        eff_out = od // self.n_groups
        m_params = eff_in * eff_out
        s_params = self.in_points * self.out_points
        cdt = self.dtype or x.dtype

        b, q, g, p, c = x.shape
        assert g == self.n_groups and p == self.in_points and c == eff_in

        m, s = _PreshapedGeneratorDense(
            n_groups=self.n_groups, m_params=m_params, s_params=s_params,
            m_shape=(eff_in, eff_out),
            s_shape=(self.out_points, self.in_points),
            dtype=self.dtype, name="parameter_generator")(query)

        def ln2(t, eps=1e-5):
            # param-free LN over the trailing 2 dims with EINSUM statistics:
            # sum/sumsq reduce in the producer's (bq-in-lanes) layout, so no
            # standard-layout relayout copies appear between the dots and
            # the LNs (the jnp.mean/var form cost ~3 ms/sample of pure
            # copies at r50-900q, r3 profile). E[x^2]-E[x]^2 in fp32 on
            # post-matmul O(1..10) values; oracle-tested vs torch.
            t32 = t.astype(jnp.float32)
            n = t.shape[-1] * t.shape[-2]
            s1 = jnp.einsum("bgpc->bg", t32) / n
            s2 = jnp.einsum("bgpc,bgpc->bg", t32, t32) / n
            var = jnp.maximum(s2 - s1 * s1, 0.0)
            rs = jax.lax.rsqrt(var + eps)
            return (t32 - s1[..., None, None]) * rs[..., None, None]

        out = x.reshape(b * q, g, p, c).astype(cdt)
        # adaptive channel mixing: [P, Cin] @ [Cin, Cout]
        # (A/B'd 2026-08-17, WASH: the fully transposed chain — m emitted
        # [BQ,G,D,C] so both mixes contract the MINOR dim of both operands
        # — measured 48.86 vs 48.69 ms/sample. A/B'd 2026-08-19, WASH:
        # m emitted bq-minor ("be,egcd->gcdb" + "bgpc,gcdb->bgpd") to match
        # the generator conv fusion's natural {0,3,2,1} output and kill the
        # 1.04 ms/sample copy.1433 relayout — 23.20 vs 23.19 FPS e2e: the
        # batched dot re-imposes a standard-layout operand and the copy
        # just moves. XLA's layout assignment is already at a local optimum
        # here, keep the reference-shaped form.)
        out = jnp.einsum("bgpc,bgcd->bgpd", out, m)
        out = nn.relu(ln2(out)).astype(cdt)
        # adaptive point mixing: [Pout, Pin] @ [Pin, C]
        out = jnp.einsum("bgop,bgpc->bgoc", s, out)
        out = nn.relu(ln2(out)).astype(cdt)

        # out-projection as a direct contraction over (g, o, c): the flat
        # reshape [BQ, G*O*C] forced a relayout copy of h2 before the dot
        # (~0.9 ms/sample at r50-900q); same math — kernel rows are
        # (g, o, c)-flattened exactly like the reshape was
        out = _EinsumOutProj(qd, dtype=self.dtype, name="out_proj")(out)
        return query + out.reshape(b, q, qd)


class SparseBEVTransformerDecoderLayer(nn.Module):
    """One decoder iteration (reference :104-193): pos-MLP -> SASA ->
    sampling -> mixing -> FFN -> cls/reg -> refine."""

    embed_dims: int
    num_frames: int = 8
    num_points: int = 4
    num_levels: int = 4
    num_classes: int = 10
    code_size: int = 10
    num_cls_fcs: int = 2
    num_reg_fcs: int = 2
    pc_range: Sequence[float] = ()
    num_groups: int = 4
    mixer_out_points: int = 128
    num_views: int = 6
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        c = self.embed_dims
        dt = self.dtype
        self.self_attn = SparseBEVSelfAttention(
            c, num_heads=8, dropout=0.1, pc_range=self.pc_range, dtype=dt,
            name="self_attn")
        self.sampling = SparseBEVSampling(
            c, num_frames=self.num_frames, num_groups=self.num_groups,
            num_points=self.num_points, num_levels=self.num_levels,
            pc_range=self.pc_range, num_views=self.num_views, dtype=dt,
            name="sampling")
        self.mixing = AdaptiveMixing(
            in_dim=c, in_points=self.num_points * self.num_frames,
            n_groups=self.num_groups, out_points=self.mixer_out_points,
            dtype=dt, name="mixing")
        self.ffn = FFN(c, feedforward_channels=512, ffn_drop=0.1, dtype=dt,
                       name="ffn")
        self.norm1 = nn.LayerNorm(epsilon=1e-5, dtype=dt, name="norm1")
        self.norm2 = nn.LayerNorm(epsilon=1e-5, dtype=dt, name="norm2")
        self.norm3 = nn.LayerNorm(epsilon=1e-5, dtype=dt, name="norm3")
        # position encoder: (Linear, LN, ReLU) x2 (:113-120)
        self.pos_fc1 = Linear(c, dtype=dt, name="pos_fc1")
        self.pos_ln1 = nn.LayerNorm(epsilon=1e-5, dtype=dt, name="pos_ln1")
        self.pos_fc2 = Linear(c, dtype=dt, name="pos_fc2")
        self.pos_ln2 = nn.LayerNorm(epsilon=1e-5, dtype=dt, name="pos_ln2")
        # branches (:131-144); focal-prior bias on the classifier (:152-153)
        self.cls_fcs = [Linear(c, dtype=dt, name=f"cls_fc{i}")
                        for i in range(self.num_cls_fcs)]
        self.cls_lns = [nn.LayerNorm(epsilon=1e-5, dtype=dt, name=f"cls_ln{i}")
                        for i in range(self.num_cls_fcs)]
        self.cls_out = Linear(
            self.num_classes, dtype=dt,
            bias_init=nn.initializers.constant(bias_init_with_prob(0.01)),
            name="cls_out")
        self.reg_fcs = [Linear(c, dtype=dt, name=f"reg_fc{i}")
                        for i in range(self.num_reg_fcs)]
        self.reg_out = Linear(self.code_size, dtype=dt, name="reg_out")

    def position_encoder(self, xyz):
        x = nn.relu(self.pos_ln1(self.pos_fc1(xyz)))
        return nn.relu(self.pos_ln2(self.pos_fc2(x)))

    def refine_bbox(self, bbox_proposal, bbox_delta):
        xyz = inverse_sigmoid(bbox_proposal[..., 0:3])
        xyz_new = jax.nn.sigmoid(bbox_delta[..., 0:3] + xyz)
        return jnp.concatenate([xyz_new, bbox_delta[..., 3:]], axis=-1)

    def __call__(self, query_bbox, query_feat, mlvl_feats, attn_mask,
                 lidar2img, time_diff, image_h, image_w,
                 deterministic: bool = True, with_cls: bool = True):
        query_pos = self.position_encoder(query_bbox[..., :3])
        query_feat = query_feat + query_pos

        query_feat = self.norm1(self.self_attn(
            query_bbox, query_feat, attn_mask, deterministic=deterministic))
        sampled = self.sampling(query_bbox, query_feat, mlvl_feats, lidar2img,
                                time_diff, image_h, image_w)
        query_feat = self.norm2(self.mixing(sampled, query_feat))
        query_feat = self.norm3(self.ffn(query_feat, deterministic=deterministic))

        if with_cls:
            cls_feat = query_feat
            for fc, ln in zip(self.cls_fcs, self.cls_lns):
                cls_feat = nn.relu(ln(fc(cls_feat)))
            cls_score = self.cls_out(cls_feat).astype(jnp.float32)
        else:
            # inference-only skip (see SparseBEVTransformer): intermediate
            # layers' classification feeds nothing at decode time
            cls_score = None

        reg_feat = query_feat
        for fc in self.reg_fcs:
            reg_feat = nn.relu(fc(reg_feat))
        # box refinement (inverse-sigmoid update) is fp32 geometry
        bbox_pred = self.reg_out(reg_feat).astype(jnp.float32)
        bbox_pred = self.refine_bbox(query_bbox, bbox_pred)

        # absolute velocity: divide by dt of the first history frame (:179-183)
        if self.num_frames > 1:
            dt = time_diff[:, 1:2, None]  # [B, 1, 1]
            dt = jnp.where(dt < 1e-5, 1.0, dt)
            bbox_pred = jnp.concatenate(
                [bbox_pred[..., :8], bbox_pred[..., 8:] / dt], axis=-1)

        return query_feat, cls_score, bbox_pred


class SparseBEVTransformer(nn.Module):
    """The full decoder: regroups features for sampling, then runs
    ``num_layers`` iterations of the single shared layer (reference :41-101).
    """

    embed_dims: int
    num_frames: int = 8
    num_points: int = 4
    num_layers: int = 6
    num_levels: int = 4
    num_classes: int = 10
    code_size: int = 10
    pc_range: Sequence[float] = ()
    num_groups: int = 4
    mixer_out_points: int = 128
    num_views: int = 6
    dtype: Optional[jnp.dtype] = None
    with_cp: bool = True  # remat each decoder layer in training (the
    # reference checkpoints SASA/sampling/mixing,
    # models/sparsebev_transformer.py:230-234,313-317,383-387)
    # y-fold sampling tables (fast, 2x feature memory) vs plain pair tables
    # (1x memory, 2x gather indices) — the 1600x640 T=15 configs need the
    # memory mode to fit 16 GB HBM (see ops.msmv_sampling.PackedFeatures)
    table_yfold: Any = True
    # group-split the train/offline packed tables (bool or per-level; see
    # ops.msmv_sampling.pack_mlvl_feats_grouped): a marked level packs as
    # num_groups separate per-group chunk buffers so both the forward's
    # gathers and the custom VJP's scatter-adds run against MSA-prefetchable
    # chunks. The streaming ring has its own knob (head.table_gsplit).
    table_gsplit: Any = False

    @nn.compact
    def __call__(self, query_bbox, query_feat, mlvl_feats, attn_mask,
                 lidar2img, time_diff, image_h, image_w,
                 deterministic: bool = True):
        """
        query_bbox: [B, Q, 10] query-layout boxes; query_feat: [B, Q, C].
        mlvl_feats: list of [B, T*N, H_l, W_l, C] channel-last pyramids.
        lidar2img: [B, T*N, 4, 4]; time_diff: [B, T].
        Returns (cls_scores [L, B, Q, num_classes], bbox_preds [L, B, Q, code]).
        """
        n = self.num_views
        g = self.num_groups
        # pack [B, TN, H, W, C] pyramids ONCE into grouped y-fold gather
        # tables (reference regroups to [B*T*G, N, H, W, C/G], :72-85; here
        # the group split folds into the table build as a local permute —
        # see pack_mlvl_feats_grouped). Every layer's sampling gather reuses
        # the packed buffer (a per-layer pack costs a full feature copy).
        # Streaming callers pass PackedFeatures directly (a device-side ring
        # updated once per sample — see ops.msmv_sampling.ring_update).
        from ..ops.msmv_sampling import PackedFeatures, pack_mlvl_feats_grouped
        if isinstance(mlvl_feats, PackedFeatures):
            grouped = mlvl_feats
        else:
            grouped = pack_mlvl_feats_grouped(mlvl_feats, n, g,
                                              yfold=self.table_yfold,
                                              gsplit=self.table_gsplit)

        layer_cls = SparseBEVTransformerDecoderLayer
        if self.with_cp and not deterministic:
            # rematerialize each layer's activations in backward (the decoder
            # dominates activation memory at Q=900-1600, T=8-15); image size
            # and the deterministic flag must stay static. The sampled
            # features are exempted from recomputation (checkpoint_name
            # above) — the gathers are the one fwd op that is expensive to
            # replay and cheap to keep.
            layer_cls = nn.remat(
                SparseBEVTransformerDecoderLayer, static_argnums=(7, 8, 9),
                policy=jax.checkpoint_policies.save_only_these_names(
                    "sampled_feats"))
        layer_kwargs = dict(
            embed_dims=self.embed_dims, num_frames=self.num_frames,
            num_points=self.num_points, num_levels=self.num_levels,
            num_classes=self.num_classes, code_size=self.code_size,
            pc_range=self.pc_range, num_groups=g,
            mixer_out_points=self.mixer_out_points, num_views=n,
            dtype=self.dtype)

        if DUMP.enabled:
            # unrolled path: host-callback dumps need a concrete stage index
            # at trace time (the viz tools consume per-stage artifacts)
            layer = layer_cls(**layer_kwargs, name="decoder_layer")
            cls_scores, bbox_preds = [], []
            for layer_idx in range(self.num_layers):
                DUMP.stage_count = layer_idx
                query_feat, cls_score, bbox_pred = layer(
                    query_bbox, query_feat, grouped, attn_mask,
                    lidar2img, time_diff, image_h, image_w,
                    deterministic)  # positional: static under nn.remat
                dump_save("query_bbox", decode_bbox(query_bbox, self.pc_range))
                dump_save("bbox_pred", decode_bbox(bbox_pred, self.pc_range))
                dump_save("cls_score", jax.nn.sigmoid(cls_score))
                query_bbox = jax.lax.stop_gradient(bbox_pred)
                cls_scores.append(cls_score)
                bbox_preds.append(bbox_pred)
            cls_scores = jnp.stack(cls_scores)
            bbox_preds = jnp.stack(bbox_preds)
        elif deterministic and self.num_layers > 1:
            # INFERENCE: only the final layer's classification is ever
            # decoded (reference get_bboxes reads cls_scores[-1],
            # sparsebev_head.py:462-482), but under one scan over all 6
            # weight-shared layers XLA cannot dead-code the 5 intermediate
            # cls branches. Scan the first L-1 layers with the cls branch
            # statically skipped, then run the SAME module (shared params)
            # once more unrolled with the branch on. Intermediate slots of
            # the returned [L, ...] cls_scores are filled with -1e4
            # ("no object": sigmoid ~ 0) — every inference consumer
            # (NMSFreeCoder, val/eval loops, StreamingDetector) reads [-1].
            def body(layer, carry, _):
                query_bbox, query_feat = carry
                query_feat, _, bbox_pred = layer(
                    query_bbox, query_feat, grouped, attn_mask,
                    lidar2img, time_diff, image_h, image_w, deterministic,
                    False)
                new_bbox = jax.lax.stop_gradient(bbox_pred)
                return (new_bbox, query_feat), bbox_pred

            scan = nn.scan(
                body, variable_broadcast="params",
                split_rngs={"params": False, "dropout": True},
                length=self.num_layers - 1)
            layer = layer_cls(**layer_kwargs, name="decoder_layer")
            (query_bbox, query_feat), bbox_preds = scan(
                layer, (query_bbox, query_feat), None)
            query_feat, last_cls, last_bbox = layer(
                query_bbox, query_feat, grouped, attn_mask,
                lidar2img, time_diff, image_h, image_w, deterministic, True)
            bbox_preds = jnp.concatenate([bbox_preds, last_bbox[None]], 0)
            cls_scores = jnp.concatenate(
                [jnp.full((self.num_layers - 1,) + last_cls.shape, -1e4,
                          last_cls.dtype), last_cls[None]], 0)
        else:
            # the 6 iterations share ONE set of weights (reference :87-96),
            # so roll them into a single traced body via nn.scan: the XLA
            # program carries one decoder-layer program instead of six
            # (multi-minute compiles at Q>=900 shrink ~4x; runtime identical)
            def body(layer, carry, _):
                query_bbox, query_feat = carry
                query_feat, cls_score, bbox_pred = layer(
                    query_bbox, query_feat, grouped, attn_mask,
                    lidar2img, time_diff, image_h, image_w, deterministic)
                new_bbox = jax.lax.stop_gradient(bbox_pred)
                return (new_bbox, query_feat), (cls_score, bbox_pred)

            scan = nn.scan(
                body, variable_broadcast="params",
                split_rngs={"params": False, "dropout": True},
                length=self.num_layers)
            layer = layer_cls(**layer_kwargs, name="decoder_layer")
            _, (cls_scores, bbox_preds) = scan(
                layer, (query_bbox, query_feat), None)

        cls_scores = jnp.nan_to_num(cls_scores)
        bbox_preds = jnp.nan_to_num(bbox_preds)
        return cls_scores, bbox_preds
