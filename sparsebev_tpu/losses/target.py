"""Set-prediction target assignment + per-layer losses (static shapes).

Re-provides the DETRHead loss path the reference uses
(/root/reference/models/sparsebev_head.py:301-460): per-layer Hungarian
matching (focal cls cost + weighted L1), focal classification loss and
weighted L1 box regression, with globally-consistent normalizers.

Where the reference `reduce_mean`s the positive count across GPUs
(sparsebev_head.py:374,384), we simply compute counts over the global batch —
under pjit the whole logical batch is visible and XLA inserts the collectives.
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax
import jax.numpy as jnp

from ..ops.box_ops import normalize_bbox
from .focal import focal_loss, focal_loss_cost
from .l1 import l1_loss
from .matching import hungarian_matching


def _sanitize_gt(gt_boxes: jnp.ndarray, gt_mask: jnp.ndarray) -> jnp.ndarray:
    """Replace padded gt rows with a benign box so log()/normalize stay finite."""
    safe = jnp.asarray([0., 0., 0., 1., 1., 1., 0., 0., 0.], gt_boxes.dtype)
    return jnp.where(gt_mask[..., None], gt_boxes, safe)


def _match_single_layer(cls_scores, bbox_preds, norm_gt, gt_labels, gt_mask,
                        code_weights, cls_cost_weight, reg_cost_weight):
    """cls_scores [B,Q,C], bbox_preds [B,Q,10], norm_gt [B,M,10].
    Returns assigned query index per gt [B, M]."""
    def per_sample(cls_s, bbox_p, ngt, glab):
        c_cls = focal_loss_cost(cls_s, glab, weight=cls_cost_weight)  # [Q, M]
        pw = bbox_p * code_weights
        gw = ngt * code_weights
        c_reg = jnp.abs(pw[:, None, :] - gw[None, :, :]).sum(-1) * reg_cost_weight
        return c_cls + c_reg

    cost = jax.vmap(per_sample)(cls_scores, bbox_preds, norm_gt, gt_labels)
    cost = jnp.transpose(cost, (0, 2, 1))  # [B, M, Q]
    return hungarian_matching(cost, gt_mask)


def compute_detection_loss(all_cls_scores: jnp.ndarray,
                           all_bbox_preds: jnp.ndarray,
                           gt_boxes: jnp.ndarray,
                           gt_labels: jnp.ndarray,
                           gt_mask: jnp.ndarray,
                           num_classes: int,
                           code_weights: Sequence[float],
                           loss_cls_weight: float = 2.0,
                           loss_bbox_weight: float = 0.25,
                           cls_cost_weight: float = 2.0,
                           reg_cost_weight: float = 0.25) -> Dict[str, jnp.ndarray]:
    """all_cls_scores [L,B,Q,C]; all_bbox_preds [L,B,Q,10] (normalized box
    layout, world coords); gt_boxes [B,M,9] world (gravity-centered);
    gt_labels [B,M]; gt_mask [B,M] bool. Returns the reference's loss dict
    keys: loss_cls/loss_bbox (+ d{i}. prefixes for intermediate layers)."""
    num_layers, b, q, _ = all_cls_scores.shape
    m = gt_labels.shape[1]
    cw = jnp.asarray(code_weights, jnp.float32)

    gt_boxes = _sanitize_gt(gt_boxes, gt_mask)
    norm_gt = normalize_bbox(gt_boxes)  # [B, M, 10]
    num_pos = jnp.maximum(gt_mask.sum().astype(jnp.float32), 1.0)
    cls_avg = jnp.maximum(num_pos, 1.0)

    b_idx = jnp.arange(b)[:, None]

    def layer_loss(cls_scores, bbox_preds):
        assigned = _match_single_layer(
            cls_scores, bbox_preds, norm_gt, gt_labels, gt_mask, cw,
            cls_cost_weight, reg_cost_weight)  # [B, M]
        q_idx = jnp.where(gt_mask, assigned, q)  # dump invalid to slot Q

        labels = jnp.full((b, q + 1), num_classes, jnp.int32)
        labels = labels.at[b_idx, q_idx].set(gt_labels)[:, :q]
        targets = jnp.zeros((b, q + 1, norm_gt.shape[-1]), jnp.float32)
        targets = targets.at[b_idx, q_idx].set(norm_gt)[:, :q]
        pos_w = jnp.zeros((b, q + 1), jnp.float32)
        pos_w = pos_w.at[b_idx, q_idx].set(1.0)[:, :q]

        lcls = focal_loss(cls_scores.reshape(-1, num_classes),
                          labels.reshape(-1),
                          jnp.ones((b * q,), jnp.float32),
                          cls_avg, num_classes) * loss_cls_weight
        bbox_w = pos_w[..., None] * cw
        lbox = l1_loss(bbox_preds.reshape(-1, bbox_preds.shape[-1]),
                       targets.reshape(-1, targets.shape[-1]),
                       bbox_w.reshape(-1, bbox_w.shape[-1]),
                       num_pos) * loss_bbox_weight
        return jnp.nan_to_num(lcls), jnp.nan_to_num(lbox)

    losses_cls, losses_bbox = jax.vmap(layer_loss)(all_cls_scores, all_bbox_preds)

    loss_dict: Dict[str, jnp.ndarray] = {
        "loss_cls": losses_cls[-1],
        "loss_bbox": losses_bbox[-1],
    }
    for i in range(num_layers - 1):
        loss_dict[f"d{i}.loss_cls"] = losses_cls[i]
        loss_dict[f"d{i}.loss_bbox"] = losses_bbox[i]
    return loss_dict
