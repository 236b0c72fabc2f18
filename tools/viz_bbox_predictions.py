#!/usr/bin/env python
"""Render predicted 3D boxes on the 6 camera views + a BEV plot
(reference /root/reference/viz_bbox_predictions.py:38-147, reimplemented
without nuscenes-devkit: corners projected through each view's lidar2img)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# box corner topology: 4 bottom, 4 top, verticals
_EDGES = [(0, 1), (1, 2), (2, 3), (3, 0),
          (4, 5), (5, 6), (6, 7), (7, 4),
          (0, 4), (1, 5), (2, 6), (3, 7)]

CLASS_COLORS = ["tab:blue", "tab:orange", "tab:green", "tab:red",
                "tab:purple", "tab:brown", "tab:pink", "tab:gray",
                "tab:olive", "tab:cyan"]


def box_corners(box):
    """[x, y, z(gravity), w, l, h, yaw, ...] -> [8, 3] corners."""
    x, y, z, w, l, h, yaw = box[:7]
    dx, dy, dz = w / 2, l / 2, h / 2
    corners = np.array([
        [dx, dy, -dz], [dx, -dy, -dz], [-dx, -dy, -dz], [-dx, dy, -dz],
        [dx, dy, dz], [dx, -dy, dz], [-dx, -dy, dz], [-dx, dy, dz]])
    c, s = np.cos(yaw), np.sin(yaw)
    rot_t = np.array([[c, s, 0], [-s, c, 0], [0, 0, 1]])
    return corners @ rot_t + np.array([x, y, z])


def draw_box_on_view(ax, box, l2i, img_hw, color):
    corners = box_corners(box)
    homo = np.concatenate([corners, np.ones((8, 1))], -1) @ l2i.T  # [8, 4]
    z = homo[:, 2]
    if (z < 0.1).all():
        return
    uv = homo[:, :2] / np.maximum(z[:, None], 0.1)
    h, w = img_hw
    for a, b in _EDGES:
        if z[a] < 0.1 or z[b] < 0.1:
            continue
        ax.plot([uv[a, 0], uv[b, 0]], [uv[a, 1], uv[b, 1]],
                color=color, linewidth=0.8)


def parse_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--weights", default=None)
    parser.add_argument("--sample", type=int, default=0)
    parser.add_argument("--score-thresh", type=float, default=0.3)
    parser.add_argument("--out-dir", default="outputs/viz_bbox")
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

    cfg = Config.fromfile(args.config)
    if args.override:
        cfg.merge_from_dict(dict(kv.split("=", 1) for kv in args.override))
    dataset = build_dataset(cfg.data["val"])
    model, aux = build_model(cfg)
    coder = aux.build_coder()

    batch = collate_batch([dataset[args.sample]], max_gt=cfg.get("max_gt", 64))
    img = jnp.asarray(batch["img"])
    l2i_all = np.asarray(batch["lidar2img"])[0]
    td = jnp.asarray(batch["time_diff"])

    variables = model.init(
        {"params": jax.random.PRNGKey(0), "aug": jax.random.PRNGKey(1)},
        img, jnp.asarray(batch["lidar2img"]), td, train=False)
    if args.weights:
        payload = load_checkpoint(args.weights)
        variables = {"params": payload["params"],
                     "batch_stats": payload.get("batch_stats", {})}

    preds = model.apply(variables, img, jnp.asarray(batch["lidar2img"]), td,
                        train=False)
    dec = jax.device_get(coder.decode(preds))
    boxes = dec["bboxes"][0]
    scores = dec["scores"][0]
    labels = dec["labels"][0]
    keep = dec["mask"][0] & (scores > args.score_thresh)
    print(f"{keep.sum()} boxes above {args.score_thresh}")

    os.makedirs(args.out_dir, exist_ok=True)
    imgs = np.asarray(batch["img"])[0]  # [T*6, H, W, 3]
    h, w = imgs.shape[1:3]
    fig, axes = plt.subplots(2, 3, figsize=(15, 6))
    order = [2, 0, 1, 4, 3, 5]  # FL, F, FR / BL, B, BR visual layout
    for plot_i, view_i in enumerate(order):
        ax = axes[plot_i // 3][plot_i % 3]
        ax.imshow(imgs[view_i][..., ::-1].astype(np.uint8))
        for b, s, l in zip(boxes[keep], scores[keep], labels[keep]):
            draw_box_on_view(ax, b, l2i_all[view_i], (h, w),
                             CLASS_COLORS[int(l) % 10])
        ax.set_xlim(0, w); ax.set_ylim(h, 0)
        ax.set_xticks([]); ax.set_yticks([])
    out_png = os.path.join(args.out_dir, f"cams_{args.sample}.png")
    fig.savefig(out_png, dpi=120, bbox_inches="tight")

    # BEV plot: predictions + (if available) ground truth
    fig2, ax = plt.subplots(figsize=(8, 8))
    for b, l in zip(boxes[keep], labels[keep]):
        cs = box_corners(b)[:4, :2]
        ax.fill(cs[:, 0], cs[:, 1], alpha=0.4,
                color=CLASS_COLORS[int(l) % 10])
    if "gt_boxes" in batch:
        for g, m in zip(batch["gt_boxes"][0], batch["gt_mask"][0]):
            if not m:
                continue
            cs = box_corners(g)[:4, :2]
            ax.plot(np.append(cs[:, 0], cs[0, 0]),
                    np.append(cs[:, 1], cs[0, 1]), "k-", linewidth=0.6)
    ax.set_xlim(-55, 55); ax.set_ylim(-55, 55); ax.set_aspect("equal")
    ax.set_title("BEV: predictions (filled) vs GT (outline)")
    out_bev = os.path.join(args.out_dir, f"bev_{args.sample}.png")
    fig2.savefig(out_bev, dpi=120, bbox_inches="tight")
    print(f"saved {out_png} and {out_bev}")


if __name__ == "__main__":
    main()
