"""SparseBEV detector: on-device aug -> normalize -> pad -> backbone -> neck
-> head (reference /root/reference/models/sparsebev.py).

TPU-first deltas:
- channel-last images [B, T*N, H, W, 3] end to end;
- ``stop_prev_grad``: `lax.stop_gradient` on past-frame features instead of a
  separate eval-mode no-grad pass (sparsebev.py:102-122) — BN is frozen
  anyway, and XLA drops the unneeded activations;
- all meta (lidar2img, time_diff, image shape) are explicit array inputs so
  the full forward jits.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..registry import BACKBONES, DETECTORS, HEADS, NECKS, build
from .augment import grid_mask, photometric_distortion
from .head import SparseBEVHead  # noqa: F401  (registration)
from .fpn import FPN  # noqa: F401
from .resnet import ResNet  # noqa: F401
from .vovnet import VoVNet  # noqa: F401


def pad_multiple(imgs: jnp.ndarray, size_divisor: int = 32) -> jnp.ndarray:
    """Zero-pad H/W (bottom/right) to a multiple of ``size_divisor``
    (reference models/utils.py:105-121)."""
    h, w = imgs.shape[-3], imgs.shape[-2]
    pad_h = (size_divisor - h % size_divisor) % size_divisor
    pad_w = (size_divisor - w % size_divisor) % size_divisor
    if pad_h == 0 and pad_w == 0:
        return imgs
    pad = [(0, 0)] * (imgs.ndim - 3) + [(0, pad_h), (0, pad_w), (0, 0)]
    return jnp.pad(imgs, pad)


class SparseBEV(nn.Module):
    """Top-level detector. Config mirrors the reference's model dict
    (configs/r50_nuimg_704x256.py:51-113)."""

    img_backbone: Dict[str, Any]
    pts_bbox_head: Dict[str, Any]
    img_neck: Optional[Dict[str, Any]] = None
    data_aug: Optional[Dict[str, Any]] = None
    stop_prev_grad: int = 0
    use_grid_mask: bool = True
    compute_dtype: Any = jnp.float32

    def setup(self):
        backbone_cfg = dict(self.img_backbone)
        backbone_cfg.setdefault("dtype", self.compute_dtype)
        self.backbone = build(backbone_cfg, BACKBONES)
        if self.img_neck is not None:
            neck_cfg = dict(self.img_neck)
            neck_cfg.setdefault("dtype", self.compute_dtype)
            self.neck = build(neck_cfg, NECKS)
        else:
            self.neck = None
        head_cfg = dict(self.pts_bbox_head)
        if self.compute_dtype != jnp.float32:
            head_cfg.setdefault("compute_dtype", self.compute_dtype)
        self.head = build(head_cfg, HEADS)

    def preprocess(self, img: jnp.ndarray, train: bool) -> jnp.ndarray:
        """GPU-side color aug + BGR->RGB + normalize (sparsebev.py:72-95).

        img: [B, TN, H, W, 3] raw BGR [0, 255] — uint8 straight from the
        loader (4x cheaper host->device) or float32.
        """
        if not jnp.issubdtype(img.dtype, jnp.floating):
            img = img.astype(jnp.float32)
        b, tn, h, w, _ = img.shape
        flat = img.reshape(b * tn, h, w, 3)
        aug = self.data_aug or {}

        if train and aug.get("img_color_aug", False):
            flat = photometric_distortion(self.make_rng("aug"), flat)

        norm_cfg = aug.get("img_norm_cfg")
        if norm_cfg is not None:
            mean = jnp.asarray(norm_cfg["mean"], flat.dtype)
            std = jnp.asarray(norm_cfg["std"], flat.dtype)
            if norm_cfg.get("to_rgb", False):
                flat = flat[..., ::-1]
            flat = (flat - mean) / std

        pad_cfg = aug.get("img_pad_cfg")
        if pad_cfg is not None:
            flat = pad_multiple(flat, pad_cfg["size_divisor"])
        return flat.reshape(b, tn, flat.shape[1], flat.shape[2], 3)

    def extract_img_feat(self, img: jnp.ndarray, train: bool):
        """GridMask -> backbone -> neck on folded [BN, H, W, 3]
        (sparsebev.py:46-59)."""
        if self.use_grid_mask and train:
            img = grid_mask(self.make_rng("aug"), img)
        img = img.astype(self.compute_dtype)
        from .eva02 import EVA02
        if isinstance(self.backbone, EVA02):
            feats = self.backbone(img, deterministic=not train)
        else:
            feats = self.backbone(img)
        if self.neck is not None:
            feats = self.neck(feats)
        # keep features in the compute dtype: the decoder's sampling gathers
        # accumulate in fp32, and the reference likewise feeds fp16 features
        # to its head (sparsebev.py:297-313); fp32 configs are unchanged
        return [f.astype(self.compute_dtype) for f in feats]

    def extract_feat(self, img: jnp.ndarray, train: bool = False):
        """img: [B, TN, H, W, 3] preprocessed. Returns list of
        [B, TN, H', W', C] pyramids."""
        b, tn, h, w, _ = img.shape
        if train and self.stop_prev_grad > 0:
            # frames beyond the first k contribute features but no gradients
            k = self.stop_prev_grad * 6
            img_grad = img[:, :k]
            img_nograd = jax.lax.stop_gradient(img[:, k:])
            feats_grad = self.extract_img_feat(
                img_grad.reshape(-1, h, w, 3), train)
            feats_nograd = self.extract_img_feat(
                img_nograd.reshape(-1, h, w, 3), train)
            feats_nograd = [jax.lax.stop_gradient(f) for f in feats_nograd]
            feats = []
            for fg, fn in zip(feats_grad, feats_nograd):
                hh, ww, c = fg.shape[1:]
                feats.append(jnp.concatenate([
                    fg.reshape(b, k, hh, ww, c),
                    fn.reshape(b, tn - k, hh, ww, c)], axis=1))
            return feats
        feats = self.extract_img_feat(img.reshape(b * tn, h, w, 3), train)
        return [f.reshape(b, tn, *f.shape[1:]) for f in feats]

    def __call__(self, img, lidar2img, time_diff,
                 dn_inputs: Optional[dict] = None, train: bool = False):
        """Full forward.

        img: [B, T*6, H, W, 3] raw BGR float; lidar2img [B, T*6, 4, 4]
        (already IDA/BEV-aug folded by the data pipeline); time_diff [B, T].
        Returns the head's prediction dict.
        """
        img = self.preprocess(img, train)
        image_h, image_w = img.shape[2], img.shape[3]
        feats = self.extract_feat(img, train)
        return self.head(feats, lidar2img, time_diff, image_h, image_w,
                         dn_inputs=dn_inputs, deterministic=not train)

    def forward_features(self, img, train: bool = False):
        """Backbone+neck only — the streaming eval path caches these per
        frame (sparsebev.py:255-321)."""
        img = self.preprocess(img, train)
        return self.extract_feat(img, train)

    def forward_frame_packed(self, img, train: bool = False):
        """Extract ONE frame's pyramid and pack it into grouped y-fold
        sampling tables (the streaming ring-cache unit of work — see
        ops.msmv_sampling.ring_update). img: [B, 6, H, W, 3] raw BGR."""
        from ..ops.msmv_sampling import pack_mlvl_feats_grouped
        feats = self.forward_features(img, train)
        return pack_mlvl_feats_grouped(feats, self.head.num_views,
                                       self.head.num_groups,
                                       yfold=self.head.table_yfold)

    def forward_head(self, feats, lidar2img, time_diff, image_h, image_w):
        return self.head(feats, lidar2img, time_diff, image_h, image_w,
                         dn_inputs=None, deterministic=True)


DETECTORS.register_module(name="SparseBEV", module=SparseBEV)
