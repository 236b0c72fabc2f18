"""EVA02 ViT-L backbone + ViTDet SimpleFeaturePyramid (Flax, NHWC).

TPU-native rewrite of /root/reference/models/backbones/eva02/ (vit.py,
utils.py, fpn.py, main.py): plain ViT with interpolated absolute position
embeddings, 2D rotary embeddings with bicubic frequency interpolation to the
real aspect ratio, SwiGLU MLP with sub-LN, window attention on most blocks +
global attention on the rest, and deconv/identity/maxpool pyramid heads off
the single ViT feature with an optional P6 max-pool.

TPU-first deltas: channel-last end to end; RoPE tables precomputed on host as
constants; attention through ``jax.nn.dot_product_attention`` (XLA picks the
fused path — the reference's flash-attn toggle, vit.py:112-118); activation
checkpointing via ``nn.remat``; block freezing via optimizer masking.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..registry import BACKBONES
from .layers import Linear


# ---------------------------------------------------------------------------
# 2D RoPE (reference utils.py:304-361, VisionRotaryEmbeddingFast)
# ---------------------------------------------------------------------------

def _bicubic_resize(x: np.ndarray, size: Tuple[int, int]) -> np.ndarray:
    """torch F.interpolate(mode='bicubic', align_corners=False) equivalent on
    host numpy — used once at model build for the RoPE tables. Pure numpy
    via the separable ``_bicubic_matrix`` kernel (torch-exact: same cubic
    a=-0.75, half-pixel centers, border clamp) so EVA02 instantiates with
    no torch dependency; cross-checked against torch in
    tests/test_eva02.py."""
    h, w, _ = x.shape
    my = _bicubic_matrix(h, size[0]).astype(np.float64)
    mx = _bicubic_matrix(w, size[1]).astype(np.float64)
    return np.einsum("Yh,hwc,Xw->YXc", my, x.astype(np.float64), mx
                     ).astype(np.float32)


def build_rope_tables(head_dim: int, pt_seq_len: int, ft_seq_len: int,
                      theta: float = 10000.0,
                      real_img_size: Optional[Tuple[int, int]] = None):
    """Returns (cos, sin) of shape [N, head_dim] where N = ft_h * ft_w
    (square ft_seq_len unless real_img_size given)."""
    dim = head_dim // 2  # the reference passes half_head_dim
    freqs = 1.0 / (theta ** (np.arange(0, dim, 2)[: dim // 2] / dim))
    t = np.arange(ft_seq_len) / ft_seq_len * pt_seq_len
    f = np.einsum("i,j->ij", t, freqs)          # [seq, dim//2]
    f = np.repeat(f, 2, axis=-1)                # [seq, dim]
    # broadcat rows/cols -> [seq, seq, 2*dim] = [seq, seq, head_dim]
    grid = np.concatenate([
        np.broadcast_to(f[:, None, :], (ft_seq_len, ft_seq_len, f.shape[-1])),
        np.broadcast_to(f[None, :, :], (ft_seq_len, ft_seq_len, f.shape[-1])),
    ], axis=-1)
    cos = np.cos(grid)
    sin = np.sin(grid)
    if real_img_size is not None:
        cos = _bicubic_resize(cos, real_img_size)
        sin = _bicubic_resize(sin, real_img_size)
    return (cos.reshape(-1, cos.shape[-1]).astype(np.float32),
            sin.reshape(-1, sin.shape[-1]).astype(np.float32))


def _bicubic_matrix(src: int, dst: int, a: float = -0.75) -> np.ndarray:
    """[dst, src] interpolation matrix replicating torch
    F.interpolate(mode='bicubic', align_corners=False) along one axis
    (cubic convolution kernel with a=-0.75, half-pixel centers, border
    clamp). Lets traced arrays be resized with two static einsums —
    jax.image.resize uses the Keys kernel (a=-0.5) and does NOT match
    torch (≈1e-2 relative error on the interpolated pos_embed)."""
    w = np.zeros((dst, src), np.float64)

    def cubic(t):
        t = abs(t)
        if t <= 1:
            return (a + 2) * t ** 3 - (a + 3) * t ** 2 + 1
        if t < 2:
            return a * t ** 3 - 5 * a * t ** 2 + 8 * a * t - 4 * a
        return 0.0

    for i in range(dst):
        center = (i + 0.5) * src / dst - 0.5
        b = math.floor(center)
        frac = center - b
        for k in (-1, 0, 1, 2):
            w[i, min(max(b + k, 0), src - 1)] += cubic(frac - k)
    return w.astype(np.float32)


def _rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    """(even, odd) channel pairs -> (-odd, even) (reference utils.py:252-256)."""
    x1 = x[..., 0::2]
    x2 = x[..., 1::2]
    return jnp.stack([-x2, x1], axis=-1).reshape(x.shape)


def apply_rope(t: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """t: [B, N, heads, head_dim]; cos/sin: [N, head_dim]."""
    return t * cos[None, :, None, :] + _rotate_half(t) * sin[None, :, None, :]


# ---------------------------------------------------------------------------
# blocks
# ---------------------------------------------------------------------------

def window_partition(x: jnp.ndarray, ws: int):
    """[B, H, W, C] -> ([B*nW, ws, ws, C], padded (Hp, Wp))."""
    b, h, w, c = x.shape
    pad_h = (ws - h % ws) % ws
    pad_w = (ws - w % ws) % ws
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    hp, wp = h + pad_h, w + pad_w
    x = x.reshape(b, hp // ws, ws, wp // ws, ws, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(-1, ws, ws, c)
    return x, (hp, wp)


def window_unpartition(x: jnp.ndarray, ws: int, pad_hw, hw):
    hp, wp = pad_hw
    h, w = hw
    b = x.shape[0] // ((hp // ws) * (wp // ws))
    x = x.reshape(b, hp // ws, wp // ws, ws, ws, -1)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(b, hp, wp, -1)
    return x[:, :h, :w]


class SwiGLU(nn.Module):
    """w3(LN(silu(w1 x) * w2 x)) with sub-LN (reference vit.py:34-58)."""

    hidden: int
    out: int

    @nn.compact
    def __call__(self, x):
        x1 = Linear(self.hidden, name="w1")(x)
        x2 = Linear(self.hidden, name="w2")(x)
        h = nn.silu(x1) * x2
        h = nn.LayerNorm(epsilon=1e-6, use_fast_variance=False, name="ffn_ln")(h)
        return Linear(self.out, name="w3")(h)


def _chunked_attention(q, k, v, chunk: int = 512):
    """Exact attention with the query axis processed in sequential chunks.

    Softmax normalizes over the KEY axis, so query chunking changes nothing
    numerically — but it bounds the [B, heads, Nq, Nk] score buffer to one
    chunk. The global blocks of the 1600x640 EVA02 config attend over
    N=4000 tokens x 6 views: unchunked that is a 3.1 GB bf16 score tensor
    per block (the final 3.4 GB of a 19 GB HBM OOM); chunked it is ~0.4 GB.

    UNROLLED, not ``lax.map``: the scan form stacked each chunk's output
    with a per-step dynamic-update-slice that XLA turned into a relayouting
    copy of the [NC, B, chunk, H, hd] carry — measured 8 x 8.41 ms/sample
    on the eva02 1600x640 trace (2026-08-20), i.e. ~67 ms of the 1011 ms
    forward spent restacking 6 MB attention outputs. The static Python loop
    emits one concatenate instead; the optimization barrier chains chunk
    i+1's k/v on chunk i's output so only one score buffer is ever live
    (the memory bound the chunking exists for)."""
    b, n, h, hd = q.shape
    pad = (-n) % chunk
    qp = jnp.pad(q, ((0, 0), (0, pad), (0, 0), (0, 0)))
    nc = (n + pad) // chunk
    outs = []
    for i in range(nc):
        qb = jax.lax.slice_in_dim(qp, i * chunk, (i + 1) * chunk, axis=1)
        o = jax.nn.dot_product_attention(qb, k, v)
        k, v, o = jax.lax.optimization_barrier((k, v, o))
        outs.append(o)
    out = jnp.concatenate(outs, axis=1) if nc > 1 else outs[0]
    return out[:, :n]


class EvaAttention(nn.Module):
    """Separate q/k/v projections; q and v carry bias, k does not; RoPE on
    q, k per head (reference vit.py:61-124)."""

    dim: int
    num_heads: int
    # chunk the query axis when the token count exceeds this (exact; see
    # _chunked_attention). Windowed blocks stay on the fused path.
    chunk_above: int = 2048

    @nn.compact
    def __call__(self, x, rope_cos, rope_sin):
        b, h, w, c = x.shape
        n = h * w
        hd = self.dim // self.num_heads
        x = x.reshape(b, n, c)

        q = Linear(self.dim, name="q_proj")(x)
        k = Linear(self.dim, use_bias=False, name="k_proj")(x)
        v = Linear(self.dim, name="v_proj")(x)

        q = q.reshape(b, n, self.num_heads, hd)
        k = k.reshape(b, n, self.num_heads, hd)
        v = v.reshape(b, n, self.num_heads, hd)

        q = apply_rope(q, rope_cos, rope_sin).astype(v.dtype)
        k = apply_rope(k, rope_cos, rope_sin).astype(v.dtype)

        if n > self.chunk_above:
            out = _chunked_attention(q, k, v)        # [B, N, heads, hd]
        else:
            out = jax.nn.dot_product_attention(q, k, v)
        out = out.reshape(b, n, self.dim)
        out = Linear(self.dim, name="proj")(out)
        return out.reshape(b, h, w, self.dim)


class ResBottleneckBlock(nn.Module):
    """ViTDet conv propagation block (reference vit.py:126-185); LN norms,
    last norm zero-init."""

    dim: int

    @nn.compact
    def __call__(self, x):
        mid = self.dim // 2
        out = nn.Conv(mid, (1, 1), use_bias=False, name="conv1")(x)
        out = nn.LayerNorm(epsilon=1e-6, use_fast_variance=False, name="norm1")(out)
        out = nn.gelu(out, approximate=False)
        out = nn.Conv(mid, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
                      name="conv2")(out)
        out = nn.LayerNorm(epsilon=1e-6, use_fast_variance=False, name="norm2")(out)
        out = nn.gelu(out, approximate=False)
        out = nn.Conv(self.dim, (1, 1), use_bias=False, name="conv3")(out)
        out = nn.LayerNorm(epsilon=1e-6, use_fast_variance=False, name="norm3",
                           scale_init=nn.initializers.zeros,
                           bias_init=nn.initializers.zeros)(out)
        return x + out


def drop_path(rng, x, rate: float):
    """Stochastic depth on the batch dim (reference drop.py)."""
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, (x.shape[0],) + (1,) * (x.ndim - 1))
    return x * mask / keep


class EvaBlock(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float
    window_size: int = 0
    use_residual_block: bool = False
    drop_path_rate: float = 0.0

    @nn.compact
    def __call__(self, x, rope_cos, rope_sin, deterministic: bool = True):
        shortcut = x
        y = nn.LayerNorm(epsilon=1e-6, use_fast_variance=False, name="norm1")(x)
        if self.window_size > 0:
            h, w = y.shape[1], y.shape[2]
            y, pad_hw = window_partition(y, self.window_size)
        y = EvaAttention(self.dim, self.num_heads, name="attn")(
            y, rope_cos, rope_sin)
        if self.window_size > 0:
            y = window_unpartition(y, self.window_size, pad_hw, (h, w))

        if not deterministic and self.drop_path_rate > 0:
            y = drop_path(self.make_rng("dropout"), y, self.drop_path_rate)
        x = shortcut + y

        y = nn.LayerNorm(epsilon=1e-6, use_fast_variance=False, name="norm2")(x)
        y = SwiGLU(int(self.dim * self.mlp_ratio), self.dim, name="mlp")(y)
        if not deterministic and self.drop_path_rate > 0:
            y = drop_path(self.make_rng("dropout"), y, self.drop_path_rate)
        x = x + y

        if self.use_residual_block:
            x = ResBottleneckBlock(self.dim, name="residual")(x)
        return x


class ViT(nn.Module):
    """Plain ViT trunk (reference vit.py:287-446). Input [B, H, W, 3]."""

    img_size: int = 1024
    real_img_size: Tuple[int, int] = (256, 704)
    patch_size: int = 16
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4 * 2 / 3
    drop_path_rate: float = 0.0
    use_abs_pos: bool = True
    pt_hw_seq_len: int = 16
    intp_freq: bool = True
    window_size: int = 0
    window_block_indexes: Sequence[int] = ()
    residual_block_indexes: Sequence[int] = ()
    use_act_checkpoint: bool = False
    pretrain_img_size: int = 224
    pretrain_use_cls_token: bool = True
    frozen_blocks: int = -1  # enforced by optimizer masking
    dtype: Optional[Any] = None

    def setup(self):
        ps = self.patch_size
        self.patch_proj = nn.Conv(self.embed_dim, (ps, ps), strides=(ps, ps),
                                  dtype=self.dtype, name="patch_embed")
        if self.use_abs_pos:
            n_pos = (self.pretrain_img_size // ps) ** 2
            if self.pretrain_use_cls_token:
                n_pos += 1
            self.pos_embed = self.param(
                "pos_embed", nn.initializers.truncated_normal(0.02),
                (1, n_pos, self.embed_dim))

        half_head = self.embed_dim // self.num_heads // 2
        hw_seq = self.img_size // ps
        real_hw = (self.real_img_size[0] // ps, self.real_img_size[1] // ps)
        win_cos, win_sin = build_rope_tables(
            half_head * 2, self.pt_hw_seq_len,
            self.window_size if self.intp_freq else self.pt_hw_seq_len)
        glb_cos, glb_sin = build_rope_tables(
            half_head * 2, self.pt_hw_seq_len,
            hw_seq if self.intp_freq else self.pt_hw_seq_len,
            real_img_size=real_hw)
        self._rope_win = (jnp.asarray(win_cos), jnp.asarray(win_sin))
        self._rope_glb = (jnp.asarray(glb_cos), jnp.asarray(glb_sin))

        dpr = np.linspace(0, self.drop_path_rate, self.depth)
        block_cls = EvaBlock
        if self.use_act_checkpoint:
            block_cls = nn.remat(EvaBlock, static_argnums=(4,))
        self.blocks = [
            block_cls(self.embed_dim, self.num_heads, self.mlp_ratio,
                      window_size=(self.window_size
                                   if i in self.window_block_indexes else 0),
                      use_residual_block=i in self.residual_block_indexes,
                      drop_path_rate=float(dpr[i]), name=f"block{i}")
            for i in range(self.depth)
        ]

    def _abs_pos(self, h, w):
        pos = self.pos_embed
        if self.pretrain_use_cls_token:
            pos = pos[:, 1:]
        size = int(math.isqrt(pos.shape[1]))
        pos = pos.reshape(1, size, size, -1)
        if (size, size) != (h, w):
            # torch-bicubic via static interpolation matrices (get_abs_pos,
            # reference eva02/utils.py:160-189 uses F.interpolate bicubic)
            wr = jnp.asarray(_bicubic_matrix(size, h))
            wc = jnp.asarray(_bicubic_matrix(size, w))
            pos = jnp.einsum("hs,bstc,wt->bhwc", wr, pos, wc)
        return pos

    def __call__(self, x, deterministic: bool = True):
        x = self.patch_proj(x)  # [B, H/ps, W/ps, C]
        if self.use_abs_pos:
            x = x + self._abs_pos(x.shape[1], x.shape[2]).astype(x.dtype)
        for i, blk in enumerate(self.blocks):
            cos, sin = (self._rope_win if i in self.window_block_indexes
                        else self._rope_glb)
            x = blk(x, cos.astype(x.dtype), sin.astype(x.dtype), deterministic)
        return x  # [B, H/ps, W/ps, C]


class SimpleFeaturePyramid(nn.Module):
    """ViTDet pyramid off the single ViT feature (reference vit.py:448-588):
    scales (4, 2, 1, 0.5) via deconv/identity/maxpool heads, each followed by
    1x1 conv + LN + 3x3 conv + LN; optional stride-2 max-pool p6."""

    out_channels: int = 256
    scale_factors: Sequence[float] = (4.0, 2.0, 1.0, 0.5)
    top_block: bool = False
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, feat):
        dim = feat.shape[-1]
        outs = []
        for idx, scale in enumerate(self.scale_factors):
            x = feat
            if scale == 4.0:
                x = nn.ConvTranspose(dim // 2, (2, 2), strides=(2, 2),
                                     transpose_kernel=True,
                                     dtype=self.dtype, name=f"s{idx}_deconv1")(x)
                x = nn.LayerNorm(epsilon=1e-6, use_fast_variance=False, name=f"s{idx}_ln0")(x)
                x = nn.gelu(x, approximate=False)
                x = nn.ConvTranspose(dim // 4, (2, 2), strides=(2, 2),
                                     transpose_kernel=True,
                                     dtype=self.dtype, name=f"s{idx}_deconv2")(x)
            elif scale == 2.0:
                x = nn.ConvTranspose(dim // 2, (2, 2), strides=(2, 2),
                                     transpose_kernel=True,
                                     dtype=self.dtype, name=f"s{idx}_deconv1")(x)
            elif scale == 1.0:
                pass
            elif scale == 0.5:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            else:
                raise NotImplementedError(f"scale {scale}")
            x = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                        dtype=self.dtype, name=f"s{idx}_conv1")(x)
            x = nn.LayerNorm(epsilon=1e-6, use_fast_variance=False, name=f"s{idx}_ln1")(x)
            x = nn.Conv(self.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                        use_bias=False, dtype=self.dtype, name=f"s{idx}_conv2")(x)
            x = nn.LayerNorm(epsilon=1e-6, use_fast_variance=False, name=f"s{idx}_ln2")(x)
            outs.append(x)
        if self.top_block:
            outs.append(nn.max_pool(outs[-1], (1, 1), strides=(2, 2)))
        return outs


class EVA02(nn.Module):
    """ViT + SFP wrapper (reference main.py:10-93). Returns p2..p6 pyramids."""

    img_size: int = 1024
    real_img_size: Tuple[int, int] = (256, 704)
    patch_size: int = 16
    in_chans: int = 3
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4 * 2 / 3
    qkv_bias: bool = True
    drop_path_rate: float = 0.0
    use_abs_pos: bool = True
    pt_hw_seq_len: int = 16
    intp_freq: bool = True
    window_size: int = 0
    window_block_indexes: Sequence[int] = ()
    residual_block_indexes: Sequence[int] = ()
    use_act_checkpoint: bool = False
    pretrain_img_size: int = 224
    pretrain_use_cls_token: bool = True
    out_feature: str = "last_feat"
    xattn: bool = False
    frozen_blocks: int = -1
    fpn_in_feature: str = "last_feat"
    fpn_out_channels: int = 256
    fpn_scale_factors: Sequence[float] = (4.0, 2.0, 1.0, 0.5)
    fpn_top_block: bool = False
    fpn_norm: str = "LN"
    fpn_square_pad: int = 0
    pretrained: Optional[str] = None
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        feat = ViT(
            img_size=self.img_size, real_img_size=self.real_img_size,
            patch_size=self.patch_size, embed_dim=self.embed_dim,
            depth=self.depth, num_heads=self.num_heads,
            mlp_ratio=self.mlp_ratio, drop_path_rate=self.drop_path_rate,
            use_abs_pos=self.use_abs_pos, pt_hw_seq_len=self.pt_hw_seq_len,
            intp_freq=self.intp_freq, window_size=self.window_size,
            window_block_indexes=tuple(self.window_block_indexes),
            residual_block_indexes=tuple(self.residual_block_indexes),
            use_act_checkpoint=self.use_act_checkpoint,
            pretrain_img_size=self.pretrain_img_size,
            pretrain_use_cls_token=self.pretrain_use_cls_token,
            frozen_blocks=self.frozen_blocks, dtype=self.dtype,
            name="vit")(x, deterministic)
        return SimpleFeaturePyramid(
            out_channels=self.fpn_out_channels,
            scale_factors=tuple(self.fpn_scale_factors),
            top_block=self.fpn_top_block, dtype=self.dtype,
            name="sfp")(feat)


BACKBONES.register_module(name="EVA02", module=EVA02)
