"""NMS-free top-k box decoding (reference
/root/reference/models/bbox/coders/nms_free_coder.py).

Static-shape TPU rewrite: always returns ``max_num`` boxes per sample plus a
validity mask (score threshold + post-center-range filter become the mask
instead of dynamic boolean indexing).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.box_ops import denormalize_bbox
from ..registry import BBOX_CODERS
from ..utils.version import VERSION


class NMSFreeCoder:
    def __init__(self,
                 pc_range: Sequence[float],
                 voxel_size: Optional[Sequence[float]] = None,
                 post_center_range: Optional[Sequence[float]] = None,
                 max_num: int = 100,
                 score_threshold: Optional[float] = None,
                 num_classes: int = 10):
        self.pc_range = pc_range
        self.voxel_size = voxel_size
        self.post_center_range = post_center_range
        self.max_num = max_num
        self.score_threshold = score_threshold
        self.num_classes = num_classes

    def decode_single(self, cls_scores: jnp.ndarray, bbox_preds: jnp.ndarray
                      ) -> Dict[str, jnp.ndarray]:
        """cls_scores [Q, C] logits; bbox_preds [Q, 10] normalized layout.
        Returns dict with bboxes [max_num, 9] (world layout), scores, labels,
        and a validity ``mask`` [max_num] (coder:37-88)."""
        scores = jax.nn.sigmoid(cls_scores).reshape(-1)  # [Q*C]
        k = min(self.max_num, scores.shape[0])
        top_scores, idx = jax.lax.top_k(scores, k)
        labels = idx % self.num_classes
        bbox_index = idx // self.num_classes
        boxes = denormalize_bbox(bbox_preds[bbox_index])  # [K, 9]

        if VERSION.name == "v0.17.1":
            # Old-checkpoint decode back-compat (reference
            # models/sparsebev_head.py:470-478): released v0.17.1-era
            # checkpoints store dims as (l, w) and yaw in the flipped
            # convention; swap w/l and remap yaw = -yaw - pi/2 so the world
            # boxes match the devkit layout. Read at TRACE time — set
            # VERSION from the checkpoint before building any jitted decode
            # (mirrors reference val.py:128-129).
            boxes = jnp.concatenate([
                boxes[:, :3], boxes[:, 4:5], boxes[:, 3:4], boxes[:, 5:6],
                -boxes[:, 6:7] - np.pi / 2, boxes[:, 7:],
            ], axis=-1)

        mask = jnp.ones_like(top_scores, dtype=bool)
        if self.score_threshold is not None:
            mask &= top_scores > self.score_threshold
        if self.post_center_range is not None:
            limit = jnp.asarray(self.post_center_range, boxes.dtype)
            mask &= (boxes[:, :3] >= limit[:3]).all(-1)
            mask &= (boxes[:, :3] <= limit[3:]).all(-1)

        return {"bboxes": boxes, "scores": top_scores,
                "labels": labels, "mask": mask}

    def decode(self, preds_dicts: Dict[str, jnp.ndarray]):
        """Decode the LAST decoder layer for every sample in the batch."""
        cls = preds_dicts["all_cls_scores"][-1]   # [B, Q, C]
        box = preds_dicts["all_bbox_preds"][-1]   # [B, Q, 10]
        return jax.vmap(self.decode_single)(cls, box)


BBOX_CODERS.register_module(name="NMSFreeCoder", module=NMSFreeCoder)
