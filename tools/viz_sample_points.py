#!/usr/bin/env python
"""Visualize the decoder's adaptive sampling points over frames x views
(reference /root/reference/viz_sample_points.py:82-147): run one sample with
DUMP enabled, reload the per-stage dumps (camera-space points + valid masks +
scores), scatter the top-query points on each camera image."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def parse_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--weights", default=None)
    parser.add_argument("--sample", type=int, default=0)
    parser.add_argument("--stage", type=int, default=5)
    parser.add_argument("--out-dir", default="outputs/viz_points")
    parser.add_argument("--platform", default=None)
    parser.add_argument("--override", nargs="+", default=None)
    return parser.parse_args()


def main():
    args = parse_args()
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    import jax
    import jax.numpy as jnp
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from sparsebev_tpu.config import Config
    from sparsebev_tpu.builder import build_model, build_dataset
    from sparsebev_tpu.data.loader import collate_batch
    from sparsebev_tpu.utils import load_checkpoint
    from sparsebev_tpu.utils.dump import DUMP

    cfg = Config.fromfile(args.config)
    if args.override:
        cfg.merge_from_dict(dict(kv.split("=", 1) for kv in args.override))
    dataset = build_dataset(cfg.data["val"])
    model, aux = build_model(cfg)

    batch = collate_batch([dataset[args.sample]], max_gt=cfg.get("max_gt", 64))
    img = jnp.asarray(batch["img"])
    l2i = jnp.asarray(batch["lidar2img"])
    td = jnp.asarray(batch["time_diff"])

    variables = model.init(
        {"params": jax.random.PRNGKey(0), "aug": jax.random.PRNGKey(1)},
        img, l2i, td, train=False)
    if args.weights:
        payload = load_checkpoint(args.weights)
        variables = {"params": payload["params"],
                     "batch_stats": payload.get("batch_stats", {})}

    out_dir = DUMP.enable(args.out_dir)
    preds = model.apply(variables, img, l2i, td, train=False)
    jax.block_until_ready(preds)
    DUMP.enabled = False
    print(f"dumps written to {out_dir}")

    # camera-space points: [B, T, Q, GP, 3]; valid: [B, T, Q, GP]
    loc = DUMP.load("sample_points_cam", args.stage)
    valid = DUMP.load("sample_points_cam_valid_mask", args.stage)
    scores = DUMP.load("cls_score", args.stage)  # [B, Q, num_classes]
    q_best = int(scores[0].max(-1).argmax())

    t = loc.shape[1]
    n = 6
    imgs = np.asarray(batch["img"]).reshape(1, t, n, *batch["img"].shape[2:])
    fig, axes = plt.subplots(t, n, figsize=(3 * n, 2 * t), squeeze=False)
    h, w = imgs.shape[3], imgs.shape[4]
    for ti in range(t):
        for vi in range(n):
            ax = axes[ti][vi]
            ax.imshow(imgs[0, ti, vi][..., ::-1].astype(np.uint8))
            pts = loc[0, ti, q_best]        # [GP, 3]
            msk = valid[0, ti, q_best] > 0.5
            view_idx = np.round(pts[:, 2] * (n - 1)).astype(int)
            sel = msk & (view_idx == vi)
            ax.scatter(pts[sel, 0] * w, pts[sel, 1] * h, s=12, c="red")
            ax.set_xticks([]); ax.set_yticks([])
            if ti == 0:
                ax.set_title(f"view {vi}", fontsize=8)
    fig.suptitle(f"stage {args.stage}, query {q_best} sampling points")
    out_png = os.path.join(out_dir, f"sample_points_stage{args.stage}.png")
    fig.savefig(out_png, dpi=120, bbox_inches="tight")
    print(f"saved {out_png}")


if __name__ == "__main__":
    main()
