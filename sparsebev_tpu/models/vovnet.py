"""VoVNet backbone (Flax, NHWC): OSA modules with dense aggregation + eSE
channel attention (reference /root/reference/models/backbones/vovnet.py).

Seven stage specs (V-19 slim/dw variants through V-99, vovnet.py:12-90); the
reference configs use V-99-eSE. BatchNorm follows the same ``norm_eval``
contract as our ResNet (FrozenBatchNorm: running stats fixed, affine
trainable); ``frozen_stages`` is enforced by optimizer masking.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..registry import BACKBONES
from .resnet import FrozenBatchNorm

_STAGE_SPECS: Dict[str, Dict[str, Any]] = {
    "V-19-slim-dw-eSE": dict(stem=[64, 64, 64], stage_conv_ch=[64, 80, 96, 112],
                             stage_out_ch=[112, 256, 384, 512], layer_per_block=3,
                             block_per_stage=[1, 1, 1, 1], eSE=True, dw=True),
    "V-19-dw-eSE": dict(stem=[64, 64, 64], stage_conv_ch=[128, 160, 192, 224],
                        stage_out_ch=[256, 512, 768, 1024], layer_per_block=3,
                        block_per_stage=[1, 1, 1, 1], eSE=True, dw=True),
    "V-19-slim-eSE": dict(stem=[64, 64, 128], stage_conv_ch=[64, 80, 96, 112],
                          stage_out_ch=[112, 256, 384, 512], layer_per_block=3,
                          block_per_stage=[1, 1, 1, 1], eSE=True, dw=False),
    "V-19-eSE": dict(stem=[64, 64, 128], stage_conv_ch=[128, 160, 192, 224],
                     stage_out_ch=[256, 512, 768, 1024], layer_per_block=3,
                     block_per_stage=[1, 1, 1, 1], eSE=True, dw=False),
    "V-39-eSE": dict(stem=[64, 64, 128], stage_conv_ch=[128, 160, 192, 224],
                     stage_out_ch=[256, 512, 768, 1024], layer_per_block=5,
                     block_per_stage=[1, 1, 2, 2], eSE=True, dw=False),
    "V-57-eSE": dict(stem=[64, 64, 128], stage_conv_ch=[128, 160, 192, 224],
                     stage_out_ch=[256, 512, 768, 1024], layer_per_block=5,
                     block_per_stage=[1, 1, 4, 3], eSE=True, dw=False),
    "V-99-eSE": dict(stem=[64, 64, 128], stage_conv_ch=[128, 160, 192, 224],
                     stage_out_ch=[256, 512, 768, 1024], layer_per_block=5,
                     block_per_stage=[1, 3, 9, 3], eSE=True, dw=False),
}


class ConvBNReLU(nn.Module):
    out_ch: int
    kernel: int = 3
    stride: int = 1
    depthwise: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        pad = self.kernel // 2
        if self.depthwise:
            x = nn.Conv(x.shape[-1], (self.kernel, self.kernel),
                        strides=(self.stride, self.stride),
                        padding=((pad, pad), (pad, pad)),
                        feature_group_count=x.shape[-1],
                        use_bias=False, dtype=self.dtype, name="dw_conv")(x)
            x = nn.Conv(self.out_ch, (1, 1), use_bias=False,
                        dtype=self.dtype, name="pw_conv")(x)
        else:
            x = nn.Conv(self.out_ch, (self.kernel, self.kernel),
                        strides=(self.stride, self.stride),
                        padding=((pad, pad), (pad, pad)),
                        use_bias=False, dtype=self.dtype, name="conv")(x)
        x = FrozenBatchNorm(name="norm")(x)
        return nn.relu(x)


class ESEModule(nn.Module):
    """Effective squeeze-excite: global-avg-pool -> 1x1 conv -> hsigmoid gate
    (vovnet.py:166-178)."""

    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        gap = jnp.mean(x, axis=(1, 2), keepdims=True)
        gate = nn.Conv(x.shape[-1], (1, 1), dtype=self.dtype, name="fc")(gap)
        gate = jnp.clip(gate + 3.0, 0.0, 6.0) / 6.0  # hsigmoid
        return x * gate


class OSAModule(nn.Module):
    """One-shot aggregation: k 3x3 convs whose outputs all concat with the
    input, then a 1x1 reduce + eSE (vovnet.py:181-238)."""

    stage_ch: int
    concat_ch: int
    layer_per_block: int
    use_ese: bool = True
    identity: bool = False
    depthwise: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        identity_feat = x
        outputs = [x]
        if self.depthwise and x.shape[-1] != self.stage_ch:
            x = ConvBNReLU(self.stage_ch, kernel=1, dtype=self.dtype,
                           name="conv_reduction")(x)
        for i in range(self.layer_per_block):
            x = ConvBNReLU(self.stage_ch, kernel=3, depthwise=self.depthwise,
                           dtype=self.dtype, name=f"layer{i}")(x)
            outputs.append(x)
        x = jnp.concatenate(outputs, axis=-1)
        x = ConvBNReLU(self.concat_ch, kernel=1, dtype=self.dtype, name="concat")(x)
        if self.use_ese:
            x = ESEModule(dtype=self.dtype, name="ese")(x)
        if self.identity:
            x = x + identity_feat
        return x


class VoVNet(nn.Module):
    """Input [B, H, W, 3]; returns the stages named in ``out_features``
    (e.g. ('stage2','stage3','stage4','stage5')) in order."""

    spec_name: str = "V-99-eSE"
    out_features: Sequence[str] = ("stage2", "stage3", "stage4", "stage5")
    frozen_stages: int = -1      # enforced via optimizer masking
    norm_eval: bool = True       # FrozenBatchNorm is always eval
    with_cp: bool = False
    input_ch: int = 3
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        spec = _STAGE_SPECS[self.spec_name]
        stem_ch = spec["stem"]
        dw = spec["dw"]

        # stem: conv3x3 s2 -> conv s1 -> conv s2 (vovnet.py:305-309)
        x = ConvBNReLU(stem_ch[0], 3, 2, dtype=self.dtype, name="stem1")(x)
        x = ConvBNReLU(stem_ch[1], 3, 1, depthwise=dw, dtype=self.dtype, name="stem2")(x)
        x = ConvBNReLU(stem_ch[2], 3, 2, depthwise=dw, dtype=self.dtype, name="stem3")(x)

        outs = []
        if "stem" in self.out_features:
            outs.append(x)

        osa = OSAModule
        if self.with_cp:
            osa = nn.remat(OSAModule)

        for i in range(4):
            stage_num = i + 2
            if stage_num != 2:
                # ceil-mode 3x3/2 max pool
                h, w = x.shape[1], x.shape[2]
                ph = (2 - (h - 3) % 2) % 2 if h > 3 else 0
                pw = (2 - (w - 3) % 2) % 2 if w > 3 else 0
                x = jnp.pad(x, ((0, 0), (0, ph + 0), (0, pw + 0), (0, 0)),
                            constant_values=-jnp.inf)
                x = nn.max_pool(x, (3, 3), strides=(2, 2))
            blocks = spec["block_per_stage"][i]
            for b in range(blocks):
                # the reference's SE flag is dead code — _OSA_module applies
                # eSE unconditionally (vovnet.py:209,227); match that
                x = osa(spec["stage_conv_ch"][i], spec["stage_out_ch"][i],
                        spec["layer_per_block"], use_ese=True,
                        identity=(b > 0), depthwise=dw, dtype=self.dtype,
                        name=f"stage{stage_num}_block{b}")(x)
            if f"stage{stage_num}" in self.out_features:
                outs.append(x)
        return outs


BACKBONES.register_module(name="VoVNet", module=VoVNet)
