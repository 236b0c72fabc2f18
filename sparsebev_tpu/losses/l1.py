"""Weighted L1 loss (mmdet L1Loss semantics; configured with loss_weight 0.25
at /root/reference/configs/r50_nuimg_704x256.py:99)."""

from __future__ import annotations

import jax.numpy as jnp


def l1_loss(pred: jnp.ndarray, target: jnp.ndarray, weights: jnp.ndarray,
            avg_factor) -> jnp.ndarray:
    """|pred - target| * weights, summed, / avg_factor. All [N, D]."""
    loss = jnp.abs(pred - target) * weights
    return loss.sum() / jnp.maximum(avg_factor, 1e-6)
