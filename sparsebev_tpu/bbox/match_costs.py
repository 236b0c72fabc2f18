"""Matching costs (reference /root/reference/models/bbox/match_costs/match_cost.py)."""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp

from ..registry import MATCH_COSTS


def bbox3d_l1_cost(bbox_pred: jnp.ndarray, gt_bboxes: jnp.ndarray,
                   weight: float = 1.0) -> jnp.ndarray:
    """L1 cdist between [Q, D] preds and [M, D] gts -> [Q, M] (match_cost.py:5-27)."""
    cost = jnp.abs(bbox_pred[:, None, :] - gt_bboxes[None, :, :]).sum(-1)
    return cost * weight


def bbox_bev_l1_cost(bboxes: jnp.ndarray, gt_bboxes: jnp.ndarray,
                     pc_range: Sequence[float], weight: float = 1.0) -> jnp.ndarray:
    """BEV-center L1 with xy normalized to [0,1] by pc_range (match_cost.py:30-43)."""
    start = jnp.asarray(pc_range[0:2], bboxes.dtype)
    extent = jnp.asarray(pc_range[3:5], bboxes.dtype) - start
    p = (bboxes[:, :2] - start) / extent
    g = (gt_bboxes[:, :2] - start) / extent
    cost = jnp.abs(p[:, None, :] - g[None, :, :]).sum(-1)
    return cost * weight


def iou3d_cost(iou: jnp.ndarray, weight: float = 1.0) -> jnp.ndarray:
    """Negated IoU (match_cost.py:46-53)."""
    return -iou * weight


MATCH_COSTS.register_module(name="BBox3DL1Cost", module=lambda weight=1.0: (
    lambda bbox_pred, gt: bbox3d_l1_cost(bbox_pred, gt, weight)))
MATCH_COSTS.register_module(name="IoU3DCost", module=lambda weight=1.0: (
    lambda iou: iou3d_cost(iou, weight)))
