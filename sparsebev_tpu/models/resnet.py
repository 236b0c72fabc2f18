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


class Bottleneck(nn.Module):
    """pytorch-style bottleneck: 1x1 -> 3x3(stride) -> 1x1 (x4), residual."""

    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        conv = partial(nn.Conv, use_bias=False, dtype=self.dtype)
        identity = x
        out = conv(self.planes, (1, 1), name="conv1")(x)
        out = FrozenBatchNorm(name="bn1")(out)
        out = nn.relu(out)
        out = conv(self.planes, (3, 3), strides=(self.stride, self.stride),
                   padding=((1, 1), (1, 1)), name="conv2")(out)
        out = FrozenBatchNorm(name="bn2")(out)
        out = nn.relu(out)
        out = conv(self.planes * 4, (1, 1), name="conv3")(out)
        out = FrozenBatchNorm(name="bn3")(out)
        if self.downsample:
            identity = conv(self.planes * 4, (1, 1),
                            strides=(self.stride, self.stride),
                            name="downsample_conv")(x)
            identity = FrozenBatchNorm(name="downsample_bn")(identity)
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
        conv = partial(nn.Conv, use_bias=False, dtype=self.dtype)

        x = conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                 name="conv1")(x)
        x = FrozenBatchNorm(name="bn1")(x)
        x = nn.relu(x)
        # torch maxpool 3x3 stride 2 pad 1
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)),
                    constant_values=-jnp.inf)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))

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
