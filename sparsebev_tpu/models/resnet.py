"""ResNet-50/101 backbone (Flax, channel-last / NHWC — TPU-native layout).

Re-provides the mmdet ResNet the reference configures
(/root/reference/configs/r50_nuimg_704x256.py:31-40): pytorch-style
bottlenecks (stride on the 3x3), out stages 0-3, ``norm_eval`` batch norm
(running stats always, affine still trainable), ``frozen_stages`` handled by
optimizer masking (see train/optim.py), optional per-stage remat
(``with_cp``).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..registry import BACKBONES


class FrozenBatchNorm(nn.Module):
    """BatchNorm in permanent eval mode: normalizes with stored running
    statistics (collection ``batch_stats``), applies trainable scale/bias.
    Matches mmdet ``norm_eval=True`` semantics."""

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        mean = self.variable("batch_stats", "mean",
                             lambda: jnp.zeros((c,), jnp.float32)).value
        var = self.variable("batch_stats", "var",
                            lambda: jnp.ones((c,), jnp.float32)).value
        dtype = x.dtype
        inv = (jax.lax.rsqrt(var + self.epsilon) * scale).astype(dtype)
        return x * inv + (bias - mean * jax.lax.rsqrt(var + self.epsilon)
                          * scale).astype(dtype)


def _folded_conv_bn(mod: nn.Module, conv_name: str, bn_name: str, x,
                    features: int, ksize, strides=(1, 1), padding="VALID",
                    dtype=None, epsilon: float = 1e-5):
    """conv + FrozenBatchNorm computed as ONE conv: ``conv(x, w*s) + t``.

    FrozenBN is an affine per-channel map ``y = x*s + t`` with
    ``s = scale/sqrt(var+eps)``, ``t = bias - mean*s`` (running stats, never
    updated), so it folds into the conv weights by linearity — identical
    math AND identical gradients w.r.t. (kernel, scale, bias) since the
    function is unchanged, only reassociated. Why: as separate ops each BN
    costs a full feature-map HBM round trip after its conv (XLA emits them
    as standalone multiply_add fusions, ~1.5-2 ms/sample across the r50
    backbone, r3 profile). The folded weight is loop-invariant in the
    streaming/scan loop, so the fold itself is hoisted and free.

    Param tree is byte-identical to ``nn.Conv(name=conv_name)`` +
    ``FrozenBatchNorm(name=bn_name)`` (paths ``{conv_name}/kernel``,
    ``{bn_name}/{scale,bias}``, batch_stats ``{bn_name}/{mean,var}``; same
    initializers, and flax derives init RNG from the param path, so fresh
    inits match too).
    """
    kh, kw = ksize
    cin = x.shape[-1]
    csc = mod.scope.push(conv_name)
    kernel = csc.param("kernel", nn.initializers.lecun_normal(),
                       (kh, kw, cin, features))
    bsc = mod.scope.push(bn_name)
    scale = bsc.param("scale", nn.initializers.ones, (features,))
    bias = bsc.param("bias", nn.initializers.zeros, (features,))
    mean = bsc.variable("batch_stats", "mean",
                        lambda: jnp.zeros((features,), jnp.float32)).value
    var = bsc.variable("batch_stats", "var",
                       lambda: jnp.ones((features,), jnp.float32)).value
    inv = jax.lax.rsqrt(var + epsilon) * scale
    w = kernel * inv[None, None, None, :]
    t = bias - mean * jax.lax.rsqrt(var + epsilon) * scale
    if dtype is not None:
        x = x.astype(dtype)
        w = w.astype(dtype)
        t = t.astype(dtype)
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=strides, padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return out + t


class Bottleneck(nn.Module):
    """pytorch-style bottleneck: 1x1 -> 3x3(stride) -> 1x1 (x4), residual."""

    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        cbn = partial(_folded_conv_bn, self, dtype=self.dtype)
        identity = x
        out = cbn("conv1", "bn1", x, self.planes, (1, 1))
        out = nn.relu(out)
        out = cbn("conv2", "bn2", out, self.planes, (3, 3),
                  strides=(self.stride, self.stride),
                  padding=((1, 1), (1, 1)))
        out = nn.relu(out)
        out = cbn("conv3", "bn3", out, self.planes * 4, (1, 1))
        if self.downsample:
            identity = cbn("downsample_conv", "downsample_bn", x,
                           self.planes * 4, (1, 1),
                           strides=(self.stride, self.stride))
        return nn.relu(out + identity)


_STAGE_BLOCKS = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3), 152: (3, 8, 36, 3)}


class ResNet(nn.Module):
    """ResNet with bottleneck blocks. Input [B, H, W, 3] channel-last."""

    depth: int = 50
    num_stages: int = 4
    out_indices: Sequence[int] = (0, 1, 2, 3)
    frozen_stages: int = 1       # enforced by optimizer masking, kept for config parity
    norm_eval: bool = True       # FrozenBatchNorm is always eval; kept for parity
    style: str = "pytorch"
    with_cp: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        blocks = _STAGE_BLOCKS[self.depth][: self.num_stages]

        # NOTE: a space-to-depth stem (MLPerf's conv7x7/s2 -> conv4x4/s1
        # with the 2x2 pixel phase folded into channels) was implemented,
        # verified exact, and measured SLOWER on v5e (2026-08-19): the
        # conv itself speeds up but the s2d input rearrangement costs more
        # than the conv win — reshape+6D-transpose +0.55 ms/sample of
        # relayout copies (48.34-baseline runs: 43.19 -> 43.48), strided
        # slice+concat form 43.19 -> 47.73. Do not retry without a way to
        # produce s2d layout directly from the on-device normalize.
        x = _folded_conv_bn(self, "conv1", "bn1", x, 64, (7, 7),
                            strides=(2, 2), padding=((3, 3), (3, 3)),
                            dtype=self.dtype)
        x = nn.relu(x)
        # torch maxpool 3x3 stride 2 pad 1: reduce_window's native padding
        # (init value -inf) — an explicit jnp.pad costs a separate 26 MB
        # copy of the stem activation (0.46 ms/sample profiled on v5e)
        x = nn.max_pool(x, (3, 3), strides=(2, 2),
                        padding=((1, 1), (1, 1)))

        outs = []
        planes = 64
        for stage_idx, num_blocks in enumerate(blocks):
            stride = 1 if stage_idx == 0 else 2
            block_cls = Bottleneck
            if self.with_cp:
                block_cls = nn.remat(Bottleneck, static_argnums=())
            for block_idx in range(num_blocks):
                x = block_cls(
                    planes=planes,
                    stride=stride if block_idx == 0 else 1,
                    downsample=(block_idx == 0),
                    dtype=self.dtype,
                    name=f"layer{stage_idx + 1}_{block_idx}")(x)
            if stage_idx in self.out_indices:
                outs.append(x)
            planes *= 2
        return outs


BACKBONES.register_module(name="ResNet", module=ResNet)
