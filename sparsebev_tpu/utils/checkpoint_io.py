"""Checkpoint save/load: orbax for native state, torch-pickle porting for the
reference's pretrained backbones.

Re-provides the mmcv surface (SURVEY.md section 5.4): CheckpointHook-style
periodic save with max-keep, ``runner.resume`` full-state restore, and
``load_checkpoint(..., revise_keys=...)`` prefix remapping for warm-starting
torch weights (reference train.py:160-174).
"""

from __future__ import annotations

import logging
import os
import re
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import numpy as np


def _ocp():
    import orbax.checkpoint as ocp
    return ocp


def save_checkpoint(work_dir: str, step: int, state, max_keep: int = 1,
                    extra: Optional[Dict[str, Any]] = None) -> str:
    """Save {params, batch_stats, opt_state, step} (+metadata) under
    ``work_dir/ckpt_{step}``; prune old ones (CheckpointHook
    max_keep_ckpts=1 parity, configs/r50_nuimg_704x256.py:221)."""
    ocp = _ocp()
    path = os.path.abspath(os.path.join(work_dir, f"ckpt_{step}"))
    payload = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": np.asarray(state.step),
    }
    if extra:
        payload["extra"] = extra
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, payload, force=True)

    # prune
    existing = sorted(
        (d for d in os.listdir(work_dir) if re.match(r"ckpt_\d+$", d)),
        key=lambda d: int(d.split("_")[1]))
    for d in existing[:-max_keep]:
        import shutil
        shutil.rmtree(os.path.join(work_dir, d), ignore_errors=True)
    return path


def latest_checkpoint(work_dir: str) -> Optional[str]:
    if not os.path.isdir(work_dir):
        return None
    cands = [d for d in os.listdir(work_dir) if re.match(r"ckpt_\d+$", d)]
    if not cands:
        return None
    best = max(cands, key=lambda d: int(d.split("_")[1]))
    return os.path.join(work_dir, best)


def load_checkpoint(path: str) -> Dict[str, Any]:
    ocp = _ocp()
    return ocp.PyTreeCheckpointer().restore(os.path.abspath(path))


def restore_train_state(path: str, state):
    """Full resume: weights/optimizer/step (reference runner.resume,
    train.py:160-162)."""
    payload = load_checkpoint(path)
    restored = jax.tree_util.tree_map(lambda x: x, payload)  # to host arrays
    return state.replace(
        params=restored["params"],
        batch_stats=restored.get("batch_stats", state.batch_stats),
        opt_state=restored["opt_state"],
        step=np.asarray(restored["step"]))


# ---------------------------------------------------------------------------
# torch checkpoint porting
# ---------------------------------------------------------------------------

def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Read a torch ``.pth`` state dict to numpy (CPU torch is available)."""
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    for key in ("state_dict", "model"):
        if isinstance(ckpt, dict) and key in ckpt:
            ckpt = ckpt[key]
            break
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
            for k, v in ckpt.items()}


def apply_revise_keys(state_dict: Dict[str, np.ndarray],
                      revise_keys: Sequence[Tuple[str, str]]) -> Dict[str, np.ndarray]:
    """mmcv revise_keys: regex prefix remap, e.g. ('backbone', 'img_backbone')
    (reference configs/r50_nuimg_704x256.py:215)."""
    out = dict(state_dict)
    for pattern, repl in revise_keys:
        out = {re.sub(pattern, repl, k): v for k, v in out.items()}
    return out


def _port_resnet(sd: Dict[str, np.ndarray], prefix: str):
    """torch(mmdet) ResNet state dict -> our flax ResNet params/batch_stats."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def conv(src):
        w = sd[f"{src}.weight"]  # [out, in, kh, kw]
        return {"kernel": np.transpose(w, (2, 3, 1, 0))}

    def bn(src):
        return ({"scale": sd[f"{src}.weight"], "bias": sd[f"{src}.bias"]},
                {"mean": sd[f"{src}.running_mean"],
                 "var": sd[f"{src}.running_var"]})

    params["conv1"] = conv(f"{prefix}conv1")
    params["bn1"], stats["bn1"] = bn(f"{prefix}bn1")

    # stage blocks: torch layer{s}.{i}. -> ours layer{s}_{i}
    block_re = re.compile(rf"^{re.escape(prefix)}layer(\d+)\.(\d+)\.")
    seen = sorted({(int(m.group(1)), int(m.group(2)))
                   for k in sd if (m := block_re.match(k))})
    for s, i in seen:
        src = f"{prefix}layer{s}.{i}"
        dst = f"layer{s}_{i}"
        p: Dict[str, Any] = {}
        st: Dict[str, Any] = {}
        for j in (1, 2, 3):
            p[f"conv{j}"] = conv(f"{src}.conv{j}")
            p[f"bn{j}"], st[f"bn{j}"] = bn(f"{src}.bn{j}")
        if f"{src}.downsample.0.weight" in sd:
            p["downsample_conv"] = conv(f"{src}.downsample.0")
            p["downsample_bn"], st["downsample_bn"] = bn(f"{src}.downsample.1")
        params[dst] = p
        stats[dst] = st
    return params, stats


def _port_fpn(sd: Dict[str, np.ndarray], prefix: str):
    params: Dict[str, Any] = {}

    def conv(src):
        w = sd[f"{src}.weight"]
        out = {"kernel": np.transpose(w, (2, 3, 1, 0))}
        if f"{src}.bias" in sd:
            out["bias"] = sd[f"{src}.bias"]
        return out

    i = 0
    while f"{prefix}lateral_convs.{i}.conv.weight" in sd:
        params[f"lateral_conv{i}"] = conv(f"{prefix}lateral_convs.{i}.conv")
        params[f"fpn_conv{i}"] = conv(f"{prefix}fpn_convs.{i}.conv")
        i += 1
    return params


def port_torch_params(state_dict: Dict[str, np.ndarray],
                      revise_keys: Sequence[Tuple[str, str]] = (),
                      backbone_type: str = "ResNet"):
    """Port a reference/mmdet pretrain checkpoint into our detector's
    {params, batch_stats} for the backbone (+ neck when present).

    Unmatched keys (heads etc.) are ignored, matching the reference's
    non-strict load (train.py:164-174).
    """
    sd = apply_revise_keys(state_dict, revise_keys)
    bb_prefix = ("img_backbone." if any(k.startswith("img_backbone.") for k in sd)
                 else "backbone.")
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    if backbone_type == "ResNet":
        p, s = _port_resnet(sd, bb_prefix)
        params["backbone"] = p
        stats["backbone"] = s
    else:
        raise NotImplementedError(backbone_type)

    if any(k.startswith("img_neck.") for k in sd):
        params["neck"] = _port_fpn(sd, "img_neck.")
    elif any(k.startswith("neck.") for k in sd):
        params["neck"] = _port_fpn(sd, "neck.")
    return {"params": params, "batch_stats": stats}


def merge_pretrained(variables, pretrained, logger=logging):
    """Graft ported subtrees onto freshly-initialized variables, checking
    shapes; returns the merged variables dict."""
    import flax

    variables = flax.core.unfreeze(variables) if hasattr(flax.core, "unfreeze") \
        else dict(variables)

    def merge(dst, src, path=""):
        for k, v in src.items():
            if isinstance(v, dict):
                if k not in dst:
                    logger.warning("pretrained subtree %s/%s missing in model",
                                   path, k)
                    continue
                merge(dst[k], v, f"{path}/{k}")
            else:
                if k not in dst:
                    logger.warning("pretrained leaf %s/%s missing", path, k)
                    continue
                if tuple(np.shape(dst[k])) != tuple(np.shape(v)):
                    raise ValueError(
                        f"shape mismatch at {path}/{k}: "
                        f"{np.shape(dst[k])} vs {np.shape(v)}")
                dst[k] = np.asarray(v, dtype=np.asarray(dst[k]).dtype)

    for col in ("params", "batch_stats"):
        if col in pretrained:
            merge(variables[col], pretrained[col], col)
    return variables
