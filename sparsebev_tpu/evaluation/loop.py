"""Shared offline evaluation loop: jitted forward + NMS-free decode over a
val loader, optionally data-parallel over a device mesh.

Replaces the reference's ``multi_gpu_test(gpu_collect=True)`` path
(/root/reference/val.py:132): instead of per-rank processes and an NCCL
gather, the batch axis is sharded over a ``jax.sharding.Mesh`` and XLA runs
the forward SPMD; ``device_get`` assembles the full decoded arrays on host.
Tail batches are padded to the static batch size (and masked out of the
evaluator) so one compiled program serves the whole split.

Used by tools/val.py and the training-time EvalHook (reference registers
DistEvalHook at interval=total_epochs, train.py:154-158).
"""

from __future__ import annotations

import logging
from typing import Dict, Optional

import numpy as np


def add_batch_sample(evaluator, batch, i, res, token):
    """Feed one decoded sample into the evaluator with the devkit filters
    (gt_mask slicing, ego-pose frame, num_lidar_pts) — the single shared
    implementation for the online (tools/val.py) and offline loops, so the
    two paths can never apply different filters."""
    if "gt_boxes" not in batch:
        return
    m = batch["gt_mask"][i]
    evaluator.add_sample(
        res["bboxes"], res["scores"], res["labels"],
        batch["gt_boxes"][i][m], batch["gt_labels"][i][m],
        pred_mask=res["mask"], sample_token=token,
        ego_frame=(batch["ego_frame"][i]
                   if "ego_frame" in batch else None),
        gt_num_pts=(batch["gt_num_pts"][i][m]
                    if "gt_num_pts" in batch else None))


def run_offline_eval(model, variables, coder, dataset, loader,
                     mesh=None) -> Dict:
    """Returns (metrics dict or None, results_per_sample dict)."""
    import jax
    import jax.numpy as jnp

    from ..parallel import replicate, shard_batch
    from .metrics import NuScenesDetectionEvaluator

    use_mesh = mesh is not None and int(np.prod(mesh.devices.shape)) > 1
    if use_mesh:
        variables = jax.device_put(variables, replicate(mesh))

    @jax.jit
    def forward(variables, img, lidar2img, time_diff):
        preds = model.apply(variables, img, lidar2img, time_diff, train=False)
        return coder.decode(preds)

    evaluator = NuScenesDetectionEvaluator(classes=dataset.classes)
    results_per_sample = {}
    n_done = 0
    static_bs = None
    for batch in loader:
        metas = batch["img_metas"]
        n_real = len(metas)
        if static_bs is None:
            static_bs = n_real
            if use_mesh and static_bs % int(np.prod(mesh.devices.shape)):
                logging.warning(
                    "batch size %d not divisible by %d devices — running "
                    "single-device eval", static_bs,
                    int(np.prod(mesh.devices.shape)))
                use_mesh = False
        arrs = {k: np.asarray(batch[k])
                for k in ("img", "lidar2img", "time_diff")}
        if n_real < static_bs:  # pad the tail batch (no recompilation)
            pad = static_bs - n_real
            arrs = {k: np.concatenate([v] + [v[-1:]] * pad) for k, v in
                    arrs.items()}
        if use_mesh:
            arrs = shard_batch(arrs, mesh)
        else:
            arrs = {k: jnp.asarray(v) for k, v in arrs.items()}
        dec = jax.device_get(forward(variables, arrs["img"],
                                     arrs["lidar2img"], arrs["time_diff"]))
        for i, meta in enumerate(metas):
            token = meta.get("sample_idx") or f"sample_{n_done}"
            res = {k: np.asarray(v[i]) for k, v in dec.items()}
            results_per_sample[token] = res
            add_batch_sample(evaluator, batch, i, res, token)
            n_done += 1

    metrics = evaluator.evaluate() if evaluator._num_samples > 0 else None
    return metrics, results_per_sample
