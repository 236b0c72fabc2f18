"""Optimizer assembly: AdamW + global-norm clip + cosine/warmup schedule +
per-parameter lr multipliers.

Re-provides the reference's optimizer config surface
(/root/reference/configs/r50_nuimg_704x256.py:186-209): AdamW(2e-4, wd .01),
``paramwise_cfg.custom_keys`` substring lr multipliers (img_backbone x0.1,
sampling_offset x0.1), Fp16OptimizerHook's grad clip (35, L2) — loss scaling
itself is unnecessary with bf16 compute / fp32 params — and the
CosineAnnealing-with-linear-warmup schedule. ``frozen_stages`` freezing
(mmdet ResNet._freeze_stages) becomes a 0x multiplier on the matching paths.
"""

from __future__ import annotations

from typing import Mapping, Optional, Sequence

import jax
import jax.numpy as jnp
import optax


def cosine_warmup_schedule(base_lr: float,
                           total_steps: int,
                           warmup_iters: int = 500,
                           warmup_ratio: float = 1.0 / 3,
                           min_lr_ratio: float = 1e-3):
    """Linear warmup from base_lr*warmup_ratio, then cosine to base_lr*min_lr_ratio."""
    min_lr = base_lr * min_lr_ratio

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm_frac = jnp.clip(step / max(warmup_iters, 1), 0.0, 1.0)
        warm_lr = base_lr * (warmup_ratio + (1 - warmup_ratio) * warm_frac)
        frac = jnp.clip(step / max(total_steps, 1), 0.0, 1.0)
        cos_lr = min_lr + (base_lr - min_lr) * 0.5 * (1 + jnp.cos(jnp.pi * frac))
        return jnp.where(step < warmup_iters, warm_lr, cos_lr)

    return schedule


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)


def build_lr_mult_tree(params,
                       custom_keys: Optional[Mapping[str, float]] = None,
                       frozen_patterns: Sequence[str] = ()):
    """Per-leaf lr multiplier: first matching custom_keys substring applies
    (mmcv semantics); frozen_patterns force 0."""
    custom_keys = dict(custom_keys or {})

    def leaf_mult(path, _):
        p = _path_str(path)
        for pat in frozen_patterns:
            if pat in p:
                return 0.0
        for key, mult in custom_keys.items():
            if key in p:
                return float(mult)
        return 1.0

    return jax.tree_util.tree_map_with_path(leaf_mult, params)


def resnet_frozen_patterns(frozen_stages: int, prefix: str = "backbone") -> list:
    """mmdet ResNet frozen_stages: stem + stages 1..k (resnet.py config parity)."""
    pats = []
    if frozen_stages >= 0:
        pats += [f"{prefix}/conv1", f"{prefix}/bn1"]
    for s in range(1, frozen_stages + 1):
        pats.append(f"{prefix}/layer{s}_")
    return pats


def vovnet_frozen_patterns(frozen_stages: int, prefix: str = "backbone") -> list:
    """VoVNet freezing: stem + stages 2..k+1 (reference vovnet.py:361-372)."""
    pats = []
    if frozen_stages >= 0:
        pats += [f"{prefix}/stem1", f"{prefix}/stem2", f"{prefix}/stem3"]
    for s in range(1, frozen_stages + 1):
        pats.append(f"{prefix}/stage{s + 1}_")
    return pats


def eva02_frozen_patterns(frozen_blocks: int, prefix: str = "backbone") -> list:
    """EVA02 freezing: patch embed + pos embed + first k blocks
    (reference eva02/vit.py:430-441)."""
    pats = []
    if frozen_blocks >= 0:
        pats += [f"{prefix}/vit/patch_embed", f"{prefix}/vit/pos_embed"]
    for i in range(frozen_blocks):
        pats.append(f"{prefix}/vit/block{i}/")
    return pats


def backbone_frozen_patterns(backbone_cfg: Mapping, prefix: str = "backbone") -> list:
    """Dispatch by backbone type from the model config."""
    btype = backbone_cfg.get("type", "ResNet")
    if btype == "ResNet":
        return resnet_frozen_patterns(backbone_cfg.get("frozen_stages", -1), prefix)
    if btype == "VoVNet":
        return vovnet_frozen_patterns(backbone_cfg.get("frozen_stages", -1), prefix)
    if btype == "EVA02":
        return eva02_frozen_patterns(backbone_cfg.get("frozen_blocks", -1), prefix)
    return []


def build_optimizer(params,
                    lr: float = 2e-4,
                    weight_decay: float = 0.01,
                    total_steps: int = 100_000,
                    warmup_iters: int = 500,
                    warmup_ratio: float = 1.0 / 3,
                    min_lr_ratio: float = 1e-3,
                    grad_clip: float = 35.0,
                    custom_keys: Optional[Mapping[str, float]] = None,
                    frozen_patterns: Sequence[str] = ()) -> optax.GradientTransformation:
    """AdamW chain with lr multipliers applied AFTER adam scaling, so weight
    decay is also scaled per-parameter (torch AdamW couples wd with lr)."""
    schedule = cosine_warmup_schedule(lr, total_steps, warmup_iters,
                                      warmup_ratio, min_lr_ratio)
    mult_tree = build_lr_mult_tree(params, custom_keys, frozen_patterns)

    def scale_by_multipliers():
        def init_fn(params):
            return optax.EmptyState()

        def update_fn(updates, state, params=None):
            updates = jax.tree_util.tree_map(
                lambda u, m: u * m, updates, mult_tree)
            return updates, state

        return optax.GradientTransformation(init_fn, update_fn)

    return optax.chain(
        optax.clip_by_global_norm(grad_clip),
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
        optax.add_decayed_weights(weight_decay),
        scale_by_multipliers(),
        optax.scale_by_learning_rate(schedule),  # includes the -1 flip
    ), schedule
