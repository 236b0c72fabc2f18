"""Feature Pyramid Network (Flax, NHWC).

Re-provides the mmdet FPN the reference configures
(/root/reference/configs/r50_nuimg_704x256.py:41-45): 1x1 laterals, nearest
top-down upsample + add, 3x3 output convs; extra output levels (num_outs >
len(inputs)) via stride-2 max-pool on the last output (mmdet
``add_extra_convs=False`` default).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..registry import NECKS


class FPN(nn.Module):
    in_channels: Sequence[int] = (256, 512, 1024, 2048)
    out_channels: int = 256
    num_outs: int = 4
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, inputs):
        assert len(inputs) == len(self.in_channels)
        laterals = [
            nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                    name=f"lateral_conv{i}")(x)
            for i, x in enumerate(inputs)
        ]
        # top-down: nearest upsample + add
        for i in range(len(laterals) - 1, 0, -1):
            up = laterals[i]
            b, h, w, c = up.shape
            th, tw = laterals[i - 1].shape[1:3]
            up = jnp.repeat(jnp.repeat(up, th // h, axis=1), tw // w, axis=2)
            laterals[i - 1] = laterals[i - 1] + up

        outs = [
            nn.Conv(self.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name=f"fpn_conv{i}")(lat)
            for i, lat in enumerate(laterals)
        ]
        # extra levels from stride-2 max pool on the last output
        while len(outs) < self.num_outs:
            outs.append(nn.max_pool(outs[-1], (1, 1), strides=(2, 2)))
        return outs


NECKS.register_module(name="FPN", module=FPN)
