"""Sigmoid focal loss + focal matching cost (mmdet semantics).

Re-provides FocalLoss(use_sigmoid, gamma=2, alpha=0.25, loss_weight=2.0) and
FocalLossCost(weight=2.0) configured at
/root/reference/configs/r50_nuimg_704x256.py:93-98,108.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def focal_loss(logits: jnp.ndarray,
               labels: jnp.ndarray,
               label_weights: jnp.ndarray,
               avg_factor,
               num_classes: int,
               gamma: float = 2.0,
               alpha: float = 0.25) -> jnp.ndarray:
    """mmdet py_sigmoid_focal_loss with hard labels.

    logits: [N, C]; labels: [N] int (``num_classes`` = background -> all-zero
    one-hot); label_weights: [N]; avg_factor: scalar normalizer.
    """
    target = jax.nn.one_hot(labels, num_classes, dtype=logits.dtype)  # bg -> 0s
    p = jax.nn.sigmoid(logits)
    # BCE with logits (numerically stable)
    ce = jnp.maximum(logits, 0) - logits * target + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    p_t = p * target + (1 - p) * (1 - target)
    alpha_t = alpha * target + (1 - alpha) * (1 - target)
    loss = ce * alpha_t * jnp.power(jnp.abs(target - p), gamma)
    loss = loss.sum(-1) * label_weights
    return loss.sum() / jnp.maximum(avg_factor, 1e-6)


def focal_loss_cost(logits: jnp.ndarray,
                    gt_labels: jnp.ndarray,
                    weight: float = 2.0,
                    gamma: float = 2.0,
                    alpha: float = 0.25,
                    eps: float = 1e-12) -> jnp.ndarray:
    """mmdet FocalLossCost: per-(query, gt) classification cost.

    logits: [Q, C]; gt_labels: [M] int. Returns [Q, M].
    """
    p = jax.nn.sigmoid(logits)
    neg_cost = -jnp.log(1 - p + eps) * (1 - alpha) * jnp.power(p, gamma)
    pos_cost = -jnp.log(p + eps) * alpha * jnp.power(1 - p, gamma)
    cost = pos_cost[:, gt_labels] - neg_cost[:, gt_labels]  # [Q, M]
    return cost * weight
