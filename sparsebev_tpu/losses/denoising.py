"""DN-DETR query denoising — static-shape TPU rewrite of
/root/reference/models/sparsebev_head.py:119-299.

Ground truth arrives padded to M slots with a validity mask; the DN pad size
is the STATIC ``groups * M`` (the reference sizes it by the dynamic max GT in
the batch). Each group holds an independently-noised copy of the GT; the
attention mask isolates groups from each other and hides all DN slots from
the match queries. Padded slots carry label ``num_classes`` with zeroed
features (the head zeroes them via ``dn_mask``) and zero loss weight.
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.box_ops import encode_bbox, normalize_bbox
from .focal import focal_loss
from .l1 import l1_loss
from .target import _sanitize_gt


def build_dn_attn_mask(num_query: int, max_gt: int, groups: int) -> np.ndarray:
    """[DN+Q, DN+Q] bool, True = attention blocked (head:196-207). Static —
    compute once per config."""
    dn_pad = max_gt * groups
    total = dn_pad + num_query
    mask = np.zeros((total, total), dtype=bool)
    # match queries must not see the denoising queries
    mask[dn_pad:, :dn_pad] = True
    # DN group i must not see DN group j != i
    for i in range(groups):
        lo, hi = i * max_gt, (i + 1) * max_gt
        mask[lo:hi, :lo] = True
        mask[lo:hi, hi:dn_pad] = True
    return mask


def prepare_dn_inputs(rng: jax.Array,
                      gt_boxes: jnp.ndarray,
                      gt_labels: jnp.ndarray,
                      gt_mask: jnp.ndarray,
                      num_query: int,
                      num_classes: int,
                      pc_range: Sequence[float],
                      groups: int = 10,
                      bbox_noise_scale: float = 0.5,
                      label_noise_scale: float = 0.5) -> Dict[str, jnp.ndarray]:
    """gt_boxes [B,M,9] world gravity-centered; gt_labels [B,M]; gt_mask [B,M].

    Returns dn_inputs for the head: dn_query_bbox [B,G*M,10] (encoded, noised),
    dn_labels [B,G*M] (noised; num_classes on padding), dn_mask [B,G*M],
    attn_mask [G*M+Q, G*M+Q] bool.
    """
    b, m = gt_labels.shape
    g = groups
    k_box, k_label_p, k_label_v = jax.random.split(rng, 3)

    gt_boxes = _sanitize_gt(gt_boxes, gt_mask)
    boxes = jnp.broadcast_to(gt_boxes[:, None], (b, g, m, gt_boxes.shape[-1]))
    labels = jnp.broadcast_to(gt_labels[:, None], (b, g, m))
    mask = jnp.broadcast_to(gt_mask[:, None], (b, g, m))

    # box center noise: +- wlh/2 * scale (head:157-160)
    if bbox_noise_scale > 0:
        wlh = boxes[..., 3:6]
        noise = jax.random.uniform(k_box, boxes[..., :3].shape,
                                   minval=-1.0, maxval=1.0)
        xyz = boxes[..., 0:3] + noise * (wlh / 2) * bbox_noise_scale
        boxes = jnp.concatenate([xyz, boxes[..., 3:]], axis=-1)

    enc = encode_bbox(boxes, pc_range)  # [B, G, M, 10]
    enc = enc.at[..., 0:3].set(jnp.clip(enc[..., 0:3], 0.0, 1.0))

    # label flip noise (head:169-173)
    if label_noise_scale > 0:
        flip = jax.random.uniform(k_label_p, labels.shape) < label_noise_scale
        rand_label = jax.random.randint(k_label_v, labels.shape, 0, num_classes)
        labels = jnp.where(flip, rand_label, labels)

    # padding slots: zero boxes, no-object label
    enc = jnp.where(mask[..., None], enc, 0.0)
    labels = jnp.where(mask, labels, num_classes)

    return {
        "dn_query_bbox": enc.reshape(b, g * m, -1),
        "dn_labels": labels.reshape(b, g * m).astype(jnp.int32),
        "dn_mask": mask.reshape(b, g * m),
        "attn_mask": jnp.asarray(build_dn_attn_mask(num_query, m, g)),
    }


def compute_dn_loss(dn_cls_scores: jnp.ndarray,
                    dn_bbox_preds: jnp.ndarray,
                    gt_boxes: jnp.ndarray,
                    gt_labels: jnp.ndarray,
                    gt_mask: jnp.ndarray,
                    num_classes: int,
                    code_weights: Sequence[float],
                    groups: int = 10,
                    dn_weight: float = 1.0,
                    loss_cls_weight: float = 2.0,
                    loss_bbox_weight: float = 0.25) -> Dict[str, jnp.ndarray]:
    """Reconstruction loss on the DN slots (head:239-299). Targets are the
    ORIGINAL (un-noised) boxes/labels, tiled over groups; slot (g, i) is
    supervised iff gt i is valid."""
    num_layers, b, dn, _ = dn_cls_scores.shape
    m = gt_labels.shape[1]
    assert dn == groups * m
    cw = jnp.asarray(code_weights, jnp.float32)

    gt_boxes = _sanitize_gt(gt_boxes, gt_mask)
    norm_gt = normalize_bbox(gt_boxes)  # [B, M, 10]
    tgt_boxes = jnp.tile(norm_gt, (1, groups, 1))          # [B, DN, 10]
    tgt_labels = jnp.tile(gt_labels, (1, groups))          # [B, DN]
    tgt_mask = jnp.tile(gt_mask, (1, groups))              # [B, DN]
    tgt_labels = jnp.where(tgt_mask, tgt_labels, num_classes)

    num_tgt = jnp.maximum(tgt_mask.sum().astype(jnp.float32), 1.0)

    def layer_loss(cls_scores, bbox_preds):
        lcls = focal_loss(cls_scores.reshape(-1, num_classes),
                          tgt_labels.reshape(-1),
                          tgt_mask.reshape(-1).astype(jnp.float32),
                          num_tgt, num_classes) * loss_cls_weight
        w = tgt_mask[..., None].astype(jnp.float32) * cw
        lbox = l1_loss(bbox_preds.reshape(-1, bbox_preds.shape[-1]),
                       tgt_boxes.reshape(-1, tgt_boxes.shape[-1]),
                       w.reshape(-1, w.shape[-1]), num_tgt) * loss_bbox_weight
        return (dn_weight * jnp.nan_to_num(lcls),
                dn_weight * jnp.nan_to_num(lbox))

    losses_cls, losses_bbox = jax.vmap(layer_loss)(dn_cls_scores, dn_bbox_preds)

    out: Dict[str, jnp.ndarray] = {
        "loss_cls_dn": losses_cls[-1],
        "loss_bbox_dn": losses_bbox[-1],
    }
    for i in range(num_layers - 1):
        out[f"d{i}.loss_cls_dn"] = losses_cls[i]
        out[f"d{i}.loss_bbox_dn"] = losses_bbox[i]
    return out
