#!/usr/bin/env python
"""Training CLI (the reference's train.py surface: config load + override,
seeding, work-dir + code backup, dataset/loader/model/optimizer build, runner
with hooks, resume/load — /root/reference/train.py:20-176 — rebuilt on
jax.sharding data parallelism instead of NCCL DDP)."""

import argparse
import logging
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def parse_args():
    parser = argparse.ArgumentParser(description="Train SparseBEV-TPU")
    parser.add_argument("--config", required=True)
    parser.add_argument("--work-dir", default=None)
    parser.add_argument("--epochs", type=int, default=None)
    parser.add_argument("--batch-size", type=int, default=None)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--override", nargs="+", default=None,
                        help="config overrides: key.path=value")
    parser.add_argument("--platform", default=None,
                        help="force jax platform (e.g. cpu for smoke runs)")
    parser.add_argument("--multihost", action="store_true",
                        help="multi-host training: jax.distributed.initialize "
                             "from TPU pod env; the data mesh then spans "
                             "ICI + DCN (replaces torchrun/NCCL init, "
                             "reference train.py:92)")
    parser.add_argument("--query-shards", type=int, default=1,
                        help="hybrid dp x sp training: shard the decoder's "
                             "query axis over this many devices per data "
                             "shard (parallel.make_hybrid_mesh; divides the "
                             "sampling-gather wall by sp)")
    return parser.parse_args()


def main():
    args = parse_args()
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    import jax
    if args.multihost:
        jax.distributed.initialize()
    import jax.numpy as jnp

    from sparsebev_tpu.config import Config
    from sparsebev_tpu.builder import build_model, build_dataset, build_dataloader
    from sparsebev_tpu.parallel import make_mesh_for_batch
    from sparsebev_tpu.train import (build_optimizer, create_train_state,
                                     make_train_step)
    from sparsebev_tpu.train.hooks import (CheckpointHook, IterTimerHook,
                                           SamplerSeedHook, TextLoggerHook,
                                           TensorboardLoggerHook)
    from sparsebev_tpu.train.optim import backbone_frozen_patterns
    from sparsebev_tpu.train.runner import Runner
    from sparsebev_tpu.utils import (backup_code, init_logging,
                                     load_torch_checkpoint, merge_pretrained,
                                     port_torch_params, latest_checkpoint)

    cfg = Config.fromfile(args.config)
    if args.override:
        cfg.merge_from_dict(dict(kv.split("=", 1) for kv in args.override))
    if args.epochs is not None:
        cfg.total_epochs = args.epochs
    if args.batch_size is not None:
        cfg.batch_size = args.batch_size

    work_dir = args.work_dir or os.path.join(
        "outputs", os.path.splitext(os.path.basename(args.config))[0],
        time.strftime("%Y-%m-%d_%H-%M-%S"))
    os.makedirs(work_dir, exist_ok=True)
    init_logging(os.path.join(work_dir, "train.log"),
                 debug=cfg.get("debug", False))
    backup_code(work_dir)
    logging.info("work dir: %s", work_dir)
    logging.info("devices: %s", jax.devices())
    np.random.seed(args.seed)

    # data
    dataset = build_dataset(cfg.data["train"])
    loader = build_dataloader(
        dataset, batch_size=cfg.batch_size // jax.process_count(),
        num_workers=cfg.data.get("workers_per_gpu", 4),
        shard_id=jax.process_index(), num_shards=jax.process_count(),
        shuffle=True, seed=args.seed, max_gt=cfg.get("max_gt", 64))
    logging.info("dataset: %d samples, %d iters/epoch", len(dataset), len(loader))

    # model
    model, aux = build_model(cfg)
    batch = next(iter(loader))
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": jax.random.PRNGKey(args.seed),
         "aug": jax.random.PRNGKey(args.seed + 1)},
        batch["img"][:1], batch["lidar2img"][:1], batch["time_diff"][:1],
        train=False)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(variables["params"]))
    logging.info("model params: %.2fM", n_params / 1e6)

    # pretrained warm start (reference train.py:164-174)
    if cfg.get("load_from"):
        sd = load_torch_checkpoint(cfg.load_from)
        ported = port_torch_params(
            sd, revise_keys=cfg.get("revise_keys") or [],
            backbone_type=cfg.model["img_backbone"]["type"])
        variables = merge_pretrained(variables, ported)
        logging.info("loaded pretrained weights from %s", cfg.load_from)

    # optimizer
    total_steps = cfg.total_epochs * len(loader)
    opt_cfg = cfg.optimizer
    custom_keys = {k: v["lr_mult"] for k, v in
                   opt_cfg.get("paramwise_cfg", {}).get("custom_keys", {}).items()}
    frozen = backbone_frozen_patterns(cfg.model["img_backbone"],
                                      prefix="backbone")
    tx, schedule = build_optimizer(
        variables["params"], lr=opt_cfg["lr"],
        weight_decay=opt_cfg.get("weight_decay", 0.01),
        total_steps=total_steps,
        warmup_iters=cfg.lr_config.get("warmup_iters", 500),
        warmup_ratio=cfg.lr_config.get("warmup_ratio", 1 / 3),
        min_lr_ratio=cfg.lr_config.get("min_lr_ratio", 1e-3),
        grad_clip=cfg.optimizer_config.get("grad_clip", {}).get("max_norm", 35.0),
        custom_keys=custom_keys, frozen_patterns=frozen)
    state = create_train_state(variables, tx)

    # train step + runner
    if args.query_shards > 1:
        from sparsebev_tpu.parallel import make_hybrid_mesh
        n_dev = len(jax.devices())
        mesh = make_hybrid_mesh(n_dev // args.query_shards, args.query_shards)
    else:
        mesh = make_mesh_for_batch(cfg.batch_size)
    train_step = make_train_step(
        model, num_classes=aux.num_classes, code_weights=aux.code_weights,
        pc_range=aux.pc_range, num_query=aux.num_query,
        query_denoising=aux.query_denoising, dn_groups=aux.dn_groups,
        loss_cls_weight=aux.loss_cls_weight,
        loss_bbox_weight=aux.loss_bbox_weight,
        mesh=mesh if args.query_shards > 1 else None)

    hooks = [IterTimerHook(), SamplerSeedHook()]
    for hcfg in cfg.get("log_config", {}).get("hooks", []):
        if hcfg["type"] == "TextLoggerHook":
            hooks.append(TextLoggerHook(interval=hcfg.get("interval", 1)))
        elif hcfg["type"] == "TensorboardLoggerHook":
            hooks.append(TensorboardLoggerHook(interval=hcfg.get("interval", 50)))
    ck = cfg.get("checkpoint_config", {})
    hooks.append(CheckpointHook(interval=ck.get("interval", 1),
                                max_keep_ckpts=ck.get("max_keep_ckpts", 1)))

    # training-time eval (reference registers Dist/EvalHook at
    # interval=total_epochs, train.py:154-158 / eval_config)
    eval_interval = cfg.get("eval_config", {}).get(
        "interval", cfg.total_epochs)
    val_cfg = cfg.data.get("val") or {}
    ann = val_cfg.get("ann_file")
    ann_first = ann[0] if isinstance(ann, (list, tuple)) else ann
    if ann_first and os.path.exists(ann_first) and eval_interval > 0:
        from sparsebev_tpu.evaluation import run_offline_eval
        from sparsebev_tpu.train.hooks import EvalHook

        val_dataset = build_dataset(cfg.data["val"])
        val_loader = build_dataloader(
            val_dataset, batch_size=1,
            num_workers=cfg.data.get("workers_per_gpu", 4),
            shuffle=False, drop_last=False, max_gt=cfg.get("max_gt", 64))

        def eval_fn(state):
            variables = {"params": jax.device_get(state.params)}
            if getattr(state, "batch_stats", None):
                variables["batch_stats"] = jax.device_get(state.batch_stats)
            metrics, _ = run_offline_eval(model, variables, aux.build_coder(),
                                          val_dataset, val_loader)
            return metrics

        hooks.append(EvalHook(interval=eval_interval, eval_fn=eval_fn))

    runner = Runner(train_step, state, loader, work_dir,
                    total_epochs=cfg.total_epochs, lr_schedule=schedule,
                    hooks=hooks, mesh=mesh,
                    seed=args.seed,
                    steps_per_dispatch=cfg.get("steps_per_dispatch", 1))

    resume_from = cfg.get("resume_from")
    if resume_from == "auto":
        resume_from = latest_checkpoint(work_dir)
    if resume_from:
        runner.resume(resume_from)

    runner.run()
    logging.info("training done at step %d", runner.global_step)


if __name__ == "__main__":
    main()
