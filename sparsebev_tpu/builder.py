"""Config-driven builders bridging reference-style config dicts to the Flax
modules (the ``build_model``/``build_dataset``/``build_dataloader`` surface of
/root/reference/train.py:98-124).

The model config keeps the reference's schema (model.pts_bbox_head carries
bbox_coder / code_weights / denoising / train_cfg knobs). Keys that are
training/eval concerns rather than network architecture are split off into a
ModelAux record consumed by the train step and the evaluator.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional

import jax.numpy as jnp

from .registry import BBOX_CODERS, DATASETS, DETECTORS, build

# populate the registries
from . import models as _models  # noqa: F401
from . import data as _data  # noqa: F401
from . import bbox as _bbox  # noqa: F401

# head-config keys that parametrize training/eval, not the nn module
_HEAD_AUX_KEYS = ("bbox_coder", "code_weights", "query_denoising",
                  "query_denoising_groups", "sync_cls_avg_factor",
                  "loss_cls", "loss_bbox", "loss_iou", "positional_encoding")
_TRANSFORMER_KEYS = ("num_frames", "num_points", "num_layers", "num_levels",
                     "code_size", "pc_range")


@dataclasses.dataclass
class ModelAux:
    pc_range: List[float]
    code_weights: List[float]
    num_classes: int
    num_query: int
    query_denoising: bool
    dn_groups: int
    bbox_coder_cfg: Optional[Dict[str, Any]]
    assigner_cfg: Optional[Dict[str, Any]]
    loss_cls_weight: float = 2.0
    loss_bbox_weight: float = 0.25

    def build_coder(self):
        if self.bbox_coder_cfg is None:
            return None
        return build(dict(self.bbox_coder_cfg), BBOX_CODERS)


def build_model(cfg) -> tuple:
    """cfg: the full Config or its ``model`` dict. Returns (SparseBEV, ModelAux)."""
    model_cfg = dict(cfg["model"] if "model" in cfg else cfg)
    assert model_cfg.pop("type") == "SparseBEV"

    head_cfg = dict(model_cfg.pop("pts_bbox_head"))
    # fold the reference's nested transformer dict into the flat head schema
    transformer = dict(head_cfg.pop("transformer", {}))
    transformer.pop("type", None)
    transformer.pop("embed_dims", None)
    for k in _TRANSFORMER_KEYS:
        if k in transformer:
            head_cfg.setdefault(k, transformer[k])

    aux = ModelAux(
        pc_range=list(head_cfg.get("pc_range", [])),
        code_weights=list(head_cfg.get("code_weights", [1.0] * 10)),
        num_classes=head_cfg.get("num_classes", 10),
        num_query=head_cfg.get("num_query", 900),
        query_denoising=head_cfg.get("query_denoising", True),
        dn_groups=head_cfg.get("query_denoising_groups", 10),
        bbox_coder_cfg=head_cfg.get("bbox_coder"),
        assigner_cfg=(model_cfg.get("train_cfg") or {}).get("pts", {}).get("assigner"),
        loss_cls_weight=(head_cfg.get("loss_cls") or {}).get("loss_weight", 2.0),
        loss_bbox_weight=(head_cfg.get("loss_bbox") or {}).get("loss_weight", 0.25),
    )
    for k in _HEAD_AUX_KEYS:
        head_cfg.pop(k, None)
    model_cfg.pop("train_cfg", None)
    model_cfg.pop("test_cfg", None)
    model_cfg.pop("pretrained", None)
    model_cfg["pts_bbox_head"] = head_cfg

    compute_dtype = model_cfg.pop("compute_dtype", "bfloat16")
    if isinstance(compute_dtype, str):
        compute_dtype = dict(float32=jnp.float32,
                             bfloat16=jnp.bfloat16)[compute_dtype]
    model_cfg["compute_dtype"] = compute_dtype

    model = build(dict(type="SparseBEV", **model_cfg), DETECTORS)
    return model, aux


def build_dataset(cfg: Dict[str, Any]):
    return build(dict(cfg), DATASETS)


def build_dataloader(dataset, batch_size: int, num_workers: int = 4,
                     shard_id: int = 0, num_shards: int = 1,
                     shuffle: bool = True, seed: int = 0,
                     max_gt: int = 64, drop_last: bool = True):
    from .data.loader import DataLoader, ShardedGroupSampler
    sampler = ShardedGroupSampler(len(dataset), shard_id=shard_id,
                                  num_shards=num_shards, shuffle=shuffle,
                                  seed=seed)
    return DataLoader(dataset, batch_size=batch_size, sampler=sampler,
                      num_workers=num_workers, max_gt=max_gt,
                      drop_last=drop_last)
