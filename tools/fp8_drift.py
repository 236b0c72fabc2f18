#!/usr/bin/env python
"""fp8-L0 ring accuracy proxy (VERDICT r3 weak #6).

The big 1600x640 configs can opt into a float8_e4m3 y-fold L0 streaming ring
(half the L0 gather indices at equal ring bytes, +4-6% FPS measured —
docs/ROADMAP.md). fp8 storage quantizes L0 features, and with no real
nuScenes data or checkpoints in the sandbox the NDS effect is unmeasurable —
this tool bounds the damage with the sandbox proxy: identical synthetic
frame streams through a bf16 ring and an fp8-L0 ring, then reports decoded-
box drift (center / size / yaw deltas) and score churn between the two.

Usage:
  python tools/fp8_drift.py --config configs/vov99_dd3d_1600x640_trainval_future.py
  python tools/fp8_drift.py --config ... --platform cpu   # small configs only

Prints one JSON line with the drift stats.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description="fp8-L0 ring drift proxy")
    p.add_argument("--config", required=True)
    p.add_argument("--samples", type=int, default=4,
                   help="streamed samples (the ring fills with quantized "
                        "history as the stream advances)")
    p.add_argument("--platform", default=None)
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args()


def main():
    args = parse_args()
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    import jax
    import jax.numpy as jnp

    from sparsebev_tpu.builder import build_model
    from sparsebev_tpu.config import Config
    from sparsebev_tpu.inference import (StreamingDetector,
                                         init_streaming_variables)

    cfg = Config.fromfile(args.config)
    num_frames = cfg.model["pts_bbox_head"]["num_frames"]
    num_levels = cfg.model["pts_bbox_head"].get("num_levels", 4)
    fh, fw = cfg.ida_aug_conf["final_dim"]

    rng = np.random.RandomState(args.seed)
    frame0 = jnp.asarray(
        rng.uniform(0, 255, (1, 6, fh, fw, 3)).astype(np.float32))
    l2i = jnp.asarray(rng.randn(1, num_frames * 6, 4, 4).astype(np.float32))
    td = jnp.asarray(np.linspace(0, 0.5 * (num_frames - 1), num_frames,
                                 dtype=np.float32)[None])

    model, aux = build_model(cfg)
    variables = init_streaming_variables(model, frame0, l2i, td, fh, fw)
    coder = aux.build_coder()

    fp8_l0 = {"model.pts_bbox_head.table_yfold": [True] * num_levels,
              "model.pts_bbox_head.table_fp8":
                  [True] + [False] * (num_levels - 1)}
    cfg8 = Config.fromfile(args.config)
    cfg8.merge_from_dict(fp8_l0)
    model8, aux8 = build_model(cfg8)

    # Stream the SAME samples through each ring variant SEQUENTIALLY — two
    # live detectors means two full ring caches (~6 GB at 1600x640 T=15)
    # and OOMs the 16 GB chip (RESOURCE_EXHAUSTED, observed 2026-08-19).
    # The frames are regenerated identically from a forked RNG per pass.
    def stream(m, cd):
        det = StreamingDetector(m, variables, num_frames=num_frames,
                                coder=cd)
        srng = np.random.RandomState(args.seed + 1)
        outs = []
        for i in range(args.samples):
            # fresh pixels per sample. Window = T frames, newest first;
            # history identified by key (its pixels are cached, so only
            # position 0 is ever uploaded), with the keyframe repeated for
            # missing history like the loader does.
            frame = np.asarray(
                srng.uniform(0, 255, (1, 6, fh, fw, 3)).astype(np.float32))
            window = np.tile(frame, (1, num_frames, 1, 1, 1))
            names = [f"frame_{max(i - k, 0)}_{v}" for k in range(num_frames)
                     for v in range(6)]
            outs.append(jax.device_get(det.infer(
                window, np.asarray(l2i), np.asarray(td), names)))
        return outs

    outs_bf16 = stream(model, coder)
    outs_fp8 = stream(model8, aux8.build_coder())

    drift = {"d_center_m": [], "d_size_m": [], "d_yaw_rad": [],
             "d_score": [], "d_vel_ms": []}
    for a, b in zip(outs_bf16, outs_fp8):
        ba, bb = np.asarray(a["bboxes"]), np.asarray(b["bboxes"])
        drift["d_center_m"].append(np.abs(ba[..., :3] - bb[..., :3]))
        drift["d_size_m"].append(np.abs(ba[..., 3:6] - bb[..., 3:6]))
        dyaw = np.abs(ba[..., 6] - bb[..., 6])
        drift["d_yaw_rad"].append(np.minimum(dyaw, 2 * np.pi - dyaw))
        if ba.shape[-1] > 7:
            drift["d_vel_ms"].append(np.abs(ba[..., 7:9] - bb[..., 7:9]))
        drift["d_score"].append(
            np.abs(np.asarray(a["scores"]) - np.asarray(b["scores"])))

    # Weights-independent bound: relative quantization error of the L0
    # features themselves (the box drift above runs through RANDOM weights,
    # whose query refinement is chaotic w.r.t. feature noise — see
    # tests/test_tools.py::test_streaming_fp8_ring — so it OVERSTATES the
    # drift a trained model would see; this number does not).
    fp = jax.jit(lambda v, img: model.apply(
        v, img, train=False, method=model.forward_frame_packed))(
            variables, frame0)
    l0 = np.asarray(fp.tables[0], np.float32).reshape(-1)
    lim = float(jnp.finfo(jnp.float8_e4m3fn).max)
    q = np.asarray(np.clip(l0, -lim, lim).astype(jnp.float8_e4m3fn),
                   np.float32)
    denom = max(float(np.abs(l0).mean()), 1e-12)
    report = {"metric": "fp8l0_drift", "config": os.path.basename(args.config),
              "samples": args.samples,
              "l0_feature_rel_err_mean": round(
                  float(np.abs(q - l0).mean()) / denom, 5),
              "l0_feature_rel_err_max": round(
                  float(np.abs(q - l0).max()) / denom, 5)}
    for k, vs in drift.items():
        if not vs:
            continue
        v = np.concatenate([x.reshape(-1) for x in vs])
        report[k + "_mean"] = round(float(v.mean()), 5)
        report[k + "_p99"] = round(float(np.percentile(v, 99)), 5)
        report[k + "_max"] = round(float(v.max()), 5)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
