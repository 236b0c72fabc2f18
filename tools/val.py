#!/usr/bin/env python
"""Evaluation CLI (the reference's val.py surface: checkpoint load, offline
inference over the val split, NDS/mAP metric table —
/root/reference/val.py:19-137). Uses the built-in nuScenes-protocol
evaluator; writes a devkit-schema submission JSON as well."""

import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def parse_args():
    parser = argparse.ArgumentParser(description="Validate SparseBEV-TPU")
    parser.add_argument("--config", required=True)
    parser.add_argument("--weights", default=None, help="orbax checkpoint dir")
    parser.add_argument("--batch-size", type=int, default=1)
    parser.add_argument("--limit", type=int, default=None,
                        help="evaluate only the first N samples")
    parser.add_argument("--out", default=None, help="submission json path")
    parser.add_argument("--shard-queries", action="store_true",
                        help="with --online: query-shard the decoder over "
                             "all devices (parallel/query_parallel.py)")
    parser.add_argument("--online", action="store_true",
                        help="streaming eval with the per-frame feature cache "
                             "(reference simple_test_online; requires "
                             "batch-size 1)")
    parser.add_argument("--override", nargs="+", default=None)
    parser.add_argument("--platform", default=None)
    return parser.parse_args()


def main():
    args = parse_args()
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    import jax
    import jax.numpy as jnp

    from sparsebev_tpu.config import Config
    from sparsebev_tpu.builder import build_model, build_dataset, build_dataloader
    from sparsebev_tpu.evaluation import (NuScenesDetectionEvaluator,
                                          add_batch_sample,
                                          format_nusc_submission)
    from sparsebev_tpu.utils import init_logging, load_checkpoint

    init_logging()
    cfg = Config.fromfile(args.config)
    if args.override:
        cfg.merge_from_dict(dict(kv.split("=", 1) for kv in args.override))

    dataset = build_dataset(cfg.data["val"])
    if args.limit:
        dataset.data_infos = dataset.data_infos[:args.limit]
    loader = build_dataloader(dataset, batch_size=args.batch_size,
                              num_workers=cfg.data.get("workers_per_gpu", 4),
                              shuffle=False, drop_last=False,
                              max_gt=cfg.get("max_gt", 64))

    model, aux = build_model(cfg)
    coder = aux.build_coder()

    batch = next(iter(loader))
    if args.online:
        # streaming-shaped init: never runs the backbone on T*6 views at
        # once (OOM for the 1600x640 T=15 configs); byte-identical params
        from sparsebev_tpu.inference import init_streaming_variables
        fh, fw = batch["img"].shape[2], batch["img"].shape[3]
        variables = init_streaming_variables(
            model, jnp.asarray(batch["img"][:1, :6]),
            jnp.asarray(batch["lidar2img"][:1]),
            jnp.asarray(batch["time_diff"][:1]), fh, fw)
    else:
        variables = jax.jit(model.init, static_argnames=("train",))(
            {"params": jax.random.PRNGKey(0), "aug": jax.random.PRNGKey(1)},
            jnp.asarray(batch["img"][:1]), jnp.asarray(batch["lidar2img"][:1]),
            jnp.asarray(batch["time_diff"][:1]), train=False)
    if args.weights:
        payload = load_checkpoint(args.weights)
        variables = {"params": payload["params"],
                     "batch_stats": payload.get("batch_stats", {})}
        logging.info("loaded weights from %s (step %s)",
                     args.weights, payload.get("step"))
        # v0.17.1 back-compat: restore the checkpoint's version tag BEFORE
        # any decode is traced so the coder applies the w/l+yaw swap
        # (reference val.py:128-129 -> sparsebev_head.py:470-478)
        ckpt_version = (payload.get("extra") or {}).get("version")
        if ckpt_version:
            from sparsebev_tpu.utils.version import VERSION
            VERSION.name = str(ckpt_version)
            logging.info("checkpoint version: %s", VERSION.name)
    else:
        logging.warning("no --weights given: evaluating a random-init model")

    streaming = None
    if args.online:
        assert args.batch_size == 1, "--online requires --batch-size 1"
        from sparsebev_tpu.inference import StreamingDetector
        mesh = None
        if args.shard_queries:
            import numpy as _np
            from jax.sharding import Mesh
            from sparsebev_tpu.parallel.query_parallel import QUERY_AXIS
            mesh = Mesh(_np.asarray(jax.devices()), (QUERY_AXIS,))
        streaming = StreamingDetector(
            model, variables,
            num_frames=cfg.model["pts_bbox_head"]["num_frames"], coder=coder,
            mesh=mesh)

    if streaming is not None:
        evaluator = NuScenesDetectionEvaluator(classes=dataset.classes)
        results_per_sample = {}
        n_done = 0
        # one-batch lookahead: the threaded loader overlaps JPEG decode and
        # prefetch_upload starts sample i+1's H2D transfer before sample
        # i's forward dispatch (the double-buffer run_e2e measures)
        it = iter(loader)
        batch = next(it, None)
        if batch is not None:
            streaming.prefetch_upload(batch["img"],
                                      batch["img_metas"][0].get("filename", []))
        while batch is not None:
            nxt = next(it, None)
            if nxt is not None:
                streaming.prefetch_upload(
                    nxt["img"], nxt["img_metas"][0].get("filename", []))
            dec = jax.device_get(streaming.infer(
                batch["img"], batch["lidar2img"], batch["time_diff"],
                batch["img_metas"][0].get("filename", [])))
            for i, meta in enumerate(batch["img_metas"]):
                token = meta.get("sample_idx") or f"sample_{n_done}"
                res = {k: np.asarray(v[i]) for k, v in dec.items()}
                results_per_sample[token] = res
                add_batch_sample(evaluator, batch, i, res, token)
                n_done += 1
            logging.info("evaluated %d samples", n_done)
            batch = nxt
        metrics = evaluator.evaluate() if evaluator._num_samples else None
    else:
        # offline path: data-parallel over all visible devices (replaces the
        # reference's multi_gpu_test/gpu_collect, val.py:132)
        from sparsebev_tpu.evaluation import run_offline_eval
        from sparsebev_tpu.parallel import make_mesh
        mesh = make_mesh() if len(jax.devices()) > 1 else None
        if mesh is not None:
            logging.info("data-parallel eval over %d devices",
                         len(jax.devices()))
        metrics, results_per_sample = run_offline_eval(
            model, variables, coder, dataset, loader, mesh=mesh)

    if args.out:
        format_nusc_submission(results_per_sample, dataset.classes, args.out)
        logging.info("wrote submission to %s", args.out)

    if metrics is not None:
        logging.info("===== results =====")
        for k in ("NDS", "mAP", "mATE", "mASE", "mAOE", "mAVE", "mAAE"):
            logging.info("%s: %.4f", k, metrics[k])
        for k, v in metrics.items():
            if k.startswith("AP_"):
                logging.info("%s: %.4f", k, v)
        return metrics


if __name__ == "__main__":
    main()
