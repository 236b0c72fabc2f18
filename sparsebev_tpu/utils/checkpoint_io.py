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
    from .version import VERSION
    extra = dict(extra or {})
    extra.setdefault("version", VERSION.name)
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
    # the forward is VERSION-dependent (ops/projection.py yaw convention):
    # a resume from a ported v0.17.1 checkpoint must restore the tag too,
    # exactly like tools/val.py --weights does
    tag = restored.get("extra", {}).get("version")
    if tag is not None:
        from .version import VERSION
        VERSION.name = str(tag)
    return state.replace(
        params=restored["params"],
        batch_stats=restored.get("batch_stats", state.batch_stats),
        opt_state=restored["opt_state"],
        step=np.asarray(restored["step"]))


# ---------------------------------------------------------------------------
# torch checkpoint porting
# ---------------------------------------------------------------------------

def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Read a torch ``.pth`` state dict to numpy (CPU torch is available).

    Side effect: if the checkpoint carries a top-level ``version`` tag
    (released SparseBEV checkpoints do), set the global VERSION singleton so
    downstream decode applies the v0.17.1 w/l+yaw back-compat swap — mirrors
    reference val.py:128-129.
    """
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "version" in ckpt:
        from .version import VERSION
        VERSION.name = str(ckpt["version"])
        logging.info("checkpoint version tag: %s", VERSION.name)
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


def _port_vovnet(sd: Dict[str, np.ndarray], prefix: str):
    """torch VoVNet (reference models/backbones/vovnet.py naming: OrderedDict
    keys with '/'-separated tags) -> our flax VoVNet params/batch_stats."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def conv(src):
        w = sd[f"{src}.weight"]
        out = {"kernel": np.transpose(w, (2, 3, 1, 0))}
        if f"{src}.bias" in sd:
            out["bias"] = sd[f"{src}.bias"]
        return out

    def bn(src):
        return ({"scale": sd[f"{src}.weight"], "bias": sd[f"{src}.bias"]},
                {"mean": sd[f"{src}.running_mean"],
                 "var": sd[f"{src}.running_var"]})

    def convbn(dst_p, dst_s, src_conv, src_norm):
        dst_p["conv"] = conv(src_conv)
        dst_p["norm"], dst_s["norm"] = bn(src_norm)

    # stem: stem.stem_{k}/conv + /norm
    for k in (1, 2, 3):
        p: Dict[str, Any] = {}
        s: Dict[str, Any] = {}
        convbn(p, s, f"{prefix}stem.stem_{k}/conv", f"{prefix}stem.stem_{k}/norm")
        params[f"stem{k}"] = p
        stats[f"stem{k}"] = s

    # stages: stage{n}.OSA{n}_{b}.{layers.i.TAG/conv, concat.TAG/conv, ese.fc}
    osa_re = re.compile(rf"^{re.escape(prefix)}stage(\d+)\.OSA(\d+)_(\d+)\.")
    seen = sorted({(int(m.group(1)), int(m.group(3)))
                   for k in sd if (m := osa_re.match(k))})
    for stage, block in seen:
        src = f"{prefix}stage{stage}.OSA{stage}_{block}"
        dst = f"stage{stage}_block{block - 1}"
        p, s = {}, {}
        i = 0
        while f"{src}.layers.{i}.OSA{stage}_{block}_{i}/conv.weight" in sd:
            lp, ls = {}, {}
            convbn(lp, ls, f"{src}.layers.{i}.OSA{stage}_{block}_{i}/conv",
                   f"{src}.layers.{i}.OSA{stage}_{block}_{i}/norm")
            p[f"layer{i}"] = lp
            s[f"layer{i}"] = ls
            i += 1
        cp, cs = {}, {}
        convbn(cp, cs, f"{src}.concat.OSA{stage}_{block}_concat/conv",
               f"{src}.concat.OSA{stage}_{block}_concat/norm")
        p["concat"] = cp
        s["concat"] = cs
        if f"{src}.ese.fc.weight" in sd:
            p["ese"] = {"fc": conv(f"{src}.ese.fc")}
        params[dst] = p
        stats[dst] = s
    return params, stats


def _linear(sd, src, dst_bias=True):
    out = {"linear": {"kernel": np.transpose(sd[f"{src}.weight"])}}
    if dst_bias and f"{src}.bias" in sd:
        out["linear"]["bias"] = sd[f"{src}.bias"]
    return out


def _ln(sd, src):
    return {"scale": sd[f"{src}.weight"], "bias": sd[f"{src}.bias"]}


def _port_eva02(sd: Dict[str, np.ndarray], prefix: str):
    """EVA02 checkpoint (detectron2-style keys ``backbone.net.*`` for the ViT
    trunk and ``backbone.simfp_*`` for the pyramid) -> our flax EVA02."""
    net = f"{prefix}net."
    vit: Dict[str, Any] = {}

    vit["patch_embed"] = {
        "kernel": np.transpose(sd[f"{net}patch_embed.proj.weight"], (2, 3, 1, 0)),
        "bias": sd[f"{net}patch_embed.proj.bias"],
    }
    if f"{net}pos_embed" in sd:
        vit["pos_embed"] = sd[f"{net}pos_embed"]

    blk_re = re.compile(rf"^{re.escape(net)}blocks\.(\d+)\.")
    n_blocks = 1 + max((int(m.group(1)) for k in sd if (m := blk_re.match(k))),
                       default=-1)
    for i in range(n_blocks):
        b = f"{net}blocks.{i}."
        attn = {
            "q_proj": {"linear": {"kernel": np.transpose(sd[f"{b}attn.q_proj.weight"]),
                                  "bias": sd[f"{b}attn.q_bias"]}},
            "k_proj": {"linear": {"kernel": np.transpose(sd[f"{b}attn.k_proj.weight"])}},
            "v_proj": {"linear": {"kernel": np.transpose(sd[f"{b}attn.v_proj.weight"]),
                                  "bias": sd[f"{b}attn.v_bias"]}},
            "proj": _linear(sd, f"{b}attn.proj"),
        }
        vit[f"block{i}"] = {
            "norm1": _ln(sd, f"{b}norm1"),
            "norm2": _ln(sd, f"{b}norm2"),
            "attn": attn,
            "mlp": {
                "w1": _linear(sd, f"{b}mlp.w1"),
                "w2": _linear(sd, f"{b}mlp.w2"),
                "w3": _linear(sd, f"{b}mlp.w3"),
                "ffn_ln": _ln(sd, f"{b}mlp.ffn_ln"),
            },
        }

    # SimpleFeaturePyramid: simfp_{stage} sequentials. Per scale the torch
    # Sequential indices are: 4.0 -> [deconv, LN, GELU, deconv, conv1, conv2];
    # 2.0 -> [deconv, conv1, conv2]; 1.0 -> [conv1, conv2];
    # 0.5 -> [maxpool, conv1, conv2]; detectron2 Conv2d carries .norm.
    sfp: Dict[str, Any] = {}

    def deconv(src):
        # torch ConvTranspose2d weight [in, out, kh, kw] -> [kh, kw, out, in]
        # (our SFP deconvs use flax transpose_kernel=True = torch semantics)
        out = {"kernel": np.transpose(sd[f"{src}.weight"], (2, 3, 1, 0))}
        if f"{src}.bias" in sd:
            out["bias"] = sd[f"{src}.bias"]
        return out

    def conv(src):
        out = {"kernel": np.transpose(sd[f"{src}.weight"], (2, 3, 1, 0))}
        if f"{src}.bias" in sd:
            out["bias"] = sd[f"{src}.bias"]
        return out

    # stage number -> (our scale index, member layout)
    layouts = {
        2: ("s0", ["deconv1", "ln0", None, "deconv2", "conv1", "conv2"]),
        3: ("s1", ["deconv1", "conv1", "conv2"]),
        4: ("s2", ["conv1", "conv2"]),
        5: ("s3", [None, "conv1", "conv2"]),
    }
    for stage, (sidx, members) in layouts.items():
        base = f"{prefix}simfp_{stage}."
        if f"{base}0.weight" not in sd and f"{base}1.weight" not in sd:
            continue
        for j, member in enumerate(members):
            if member is None:
                continue
            src = f"{base}{j}"
            if member.startswith("deconv"):
                sfp[f"{sidx}_{member}"] = deconv(src)
            elif member.startswith("ln"):
                sfp[f"{sidx}_{member}"] = _ln(sd, src)
            else:  # detectron2 Conv2d with fused .norm
                sfp[f"{sidx}_{member}"] = conv(src)
                ln_dst = {"conv1": "ln1", "conv2": "ln2"}[member]
                sfp[f"{sidx}_{ln_dst}"] = _ln(sd, f"{src}.norm")
    return {"vit": vit, "sfp": sfp}


def _port_sparsebev_head(sd: Dict[str, np.ndarray],
                         prefix: str = "pts_bbox_head."):
    """Reference SparseBEVHead state_dict -> our flax head param tree.

    Key map (reference models/sparsebev_head.py:50-51 and
    models/sparsebev_transformer.py:104-387; the decoder layer is
    weight-shared so there is exactly one layer's worth of weights):

      init_query_bbox.weight                  -> init_query_bbox
      label_enc.weight                        -> label_enc.embedding
      transformer.decoder.decoder_layer.*     -> transformer.decoder_layer.*
        position_encoder.{0,1,3,4}            -> pos_fc1/pos_ln1/pos_fc2/pos_ln2
        self_attn.gen_tau                     -> self_attn.gen_tau
        self_attn.attention.attn.in_proj_*    -> self_attn.attention.in_proj_*
          (torch packs [Wq;Wk;Wv] on the out dim; ours is the transpose)
        self_attn.attention.attn.out_proj     -> self_attn.attention.out_proj
        sampling.{sampling_offset,scale_weights}
        mixing.{parameter_generator,out_proj}
        ffn.layers.0.0 / ffn.layers.1         -> ffn.fc1 / ffn.fc2 (mmcv FFN)
        norm{1,2,3}                           -> norm{1,2,3}
        cls_branch.{0,1,3,4,6}                -> cls_fc0/cls_ln0/cls_fc1/cls_ln1/cls_out
        reg_branch.{0,2,4}                    -> reg_fc0/reg_fc1/reg_out
    """
    L = f"{prefix}transformer.decoder.decoder_layer."
    layer: Dict[str, Any] = {
        "pos_fc1": _linear(sd, f"{L}position_encoder.0"),
        "pos_ln1": _ln(sd, f"{L}position_encoder.1"),
        "pos_fc2": _linear(sd, f"{L}position_encoder.3"),
        "pos_ln2": _ln(sd, f"{L}position_encoder.4"),
        "self_attn": {
            "gen_tau": _linear(sd, f"{L}self_attn.gen_tau"),
            "attention": {
                "in_proj_weight": np.transpose(
                    sd[f"{L}self_attn.attention.attn.in_proj_weight"]),
                "in_proj_bias": sd[f"{L}self_attn.attention.attn.in_proj_bias"],
                "out_proj": _linear(sd, f"{L}self_attn.attention.attn.out_proj"),
            },
        },
        "sampling": {
            "sampling_offset": _linear(sd, f"{L}sampling.sampling_offset"),
            "scale_weights": _linear(sd, f"{L}sampling.scale_weights"),
        },
        "mixing": {
            "parameter_generator": _linear(sd, f"{L}mixing.parameter_generator"),
            "out_proj": _linear(sd, f"{L}mixing.out_proj"),
        },
        "ffn": {
            "fc1": _linear(sd, f"{L}ffn.layers.0.0"),
            "fc2": _linear(sd, f"{L}ffn.layers.1"),
        },
        "norm1": _ln(sd, f"{L}norm1"),
        "norm2": _ln(sd, f"{L}norm2"),
        "norm3": _ln(sd, f"{L}norm3"),
        "cls_out": _linear(sd, f"{L}cls_branch.6"),
        "reg_out": _linear(sd, f"{L}reg_branch.4"),
    }
    for i, (fc_idx, ln_idx) in enumerate(((0, 1), (3, 4))):
        layer[f"cls_fc{i}"] = _linear(sd, f"{L}cls_branch.{fc_idx}")
        layer[f"cls_ln{i}"] = _ln(sd, f"{L}cls_branch.{ln_idx}")
    for i, fc_idx in enumerate((0, 2)):
        layer[f"reg_fc{i}"] = _linear(sd, f"{L}reg_branch.{fc_idx}")

    return {
        "init_query_bbox": sd[f"{prefix}init_query_bbox.weight"],
        "label_enc": {"embedding": sd[f"{prefix}label_enc.weight"]},
        "transformer": {"decoder_layer": layer},
    }


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
    elif backbone_type == "VoVNet":
        p, s = _port_vovnet(sd, bb_prefix)
        params["backbone"] = p
        stats["backbone"] = s
    elif backbone_type == "EVA02":
        # EVA02 pretrains carry detectron2-style 'backbone.net.*' keys
        # (reference eva02/main.py:84-89 loads non-strict onto the module)
        params["backbone"] = _port_eva02(sd, "backbone.")
    else:
        raise NotImplementedError(backbone_type)

    if any(k.startswith("img_neck.") for k in sd):
        params["neck"] = _port_fpn(sd, "img_neck.")
    elif any(k.startswith("neck.") for k in sd):
        params["neck"] = _port_fpn(sd, "neck.")
    if any(k.startswith("pts_bbox_head.") for k in sd):
        params["head"] = _port_sparsebev_head(sd, "pts_bbox_head.")
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
