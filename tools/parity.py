#!/usr/bin/env python
"""One-command NDS parity runner: reference torch checkpoint -> ported orbax
weights -> offline eval -> NDS diff (VERDICT r2 next-round #9).

The moment real nuScenes data + a released checkpoint are mounted:

    python tools/parity.py --config configs/r50_nuimg_704x256.py \
        --torch-ckpt /data/sparsebev_r50.pth \
        --ann-file /data/nuscenes/nuscenes_infos_val_sweep.pkl \
        --data-root /data/nuscenes --expected-nds 55.6

Until then it dry-runs end to end against the synthetic fixtures
(--synthetic), exercising every stage except the real weights: port map,
orbax save with the checkpoint's version tag (v0.17.1 decode back-compat,
reference val.py:128-129), val CLI, NDS table, diff report.

Port protocol (reference train.py:160-174 + val.py:122-129): strict load of
the full model state dict with ``revise_keys=[('^backbone\\.',
'img_backbone.')]``; the checkpoint's top-level ``version`` tag drives the
w/l+yaw decode swap via utils.version.VERSION.
"""

import argparse
import json
import logging
import os
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def parse_args():
    p = argparse.ArgumentParser(description="torch-checkpoint NDS parity run")
    p.add_argument("--config", required=True)
    p.add_argument("--torch-ckpt", default=None,
                   help=".pth checkpoint (reference release or reproduction)")
    p.add_argument("--ann-file", default=None,
                   help="val infos pkl (overrides the config's)")
    p.add_argument("--data-root", default=None)
    p.add_argument("--expected-nds", type=float, default=None,
                   help="published NDS to diff against (noise bar +-0.3, "
                        "reference README.md:37)")
    p.add_argument("--limit", type=int, default=None)
    p.add_argument("--work-dir", default=None,
                   help="where to keep the ported orbax checkpoint")
    p.add_argument("--synthetic", action="store_true",
                   help="dry-run on a synthetic split with random weights")
    p.add_argument("--platform", default=None)
    p.add_argument("--online", action="store_true",
                   help="evaluate with the streaming path instead of offline")
    return p.parse_args()


def port_checkpoint(cfg, torch_ckpt: str, work_dir: str) -> str:
    """torch .pth -> merged orbax checkpoint dir; returns its path."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from types import SimpleNamespace

    from sparsebev_tpu.builder import build_model
    from sparsebev_tpu.utils.checkpoint_io import (
        load_torch_checkpoint, port_torch_params, merge_pretrained,
        save_checkpoint)

    sd = load_torch_checkpoint(torch_ckpt)  # sets VERSION from the tag
    backbone_type = cfg.model["img_backbone"]["type"]
    ported = port_torch_params(
        sd, revise_keys=[(r"^backbone\.", "img_backbone.")],
        backbone_type=backbone_type)

    # init with streaming-shaped variables (never runs the backbone on all
    # T*6 views at once), then graft the ported weights
    from sparsebev_tpu.inference import init_streaming_variables
    num_frames = cfg.model["pts_bbox_head"]["num_frames"]
    fh, fw = cfg.ida_aug_conf["final_dim"]
    rng = np.random.RandomState(0)
    frame = jnp.asarray(rng.uniform(0, 255, (1, 6, fh, fw, 3)),
                        dtype=jnp.float32)
    l2i = jnp.asarray(rng.randn(1, num_frames * 6, 4, 4).astype(np.float32))
    td = jnp.asarray(np.zeros((1, num_frames), np.float32))
    model, _ = build_model(cfg)
    variables = init_streaming_variables(model, frame, l2i, td, fh, fw)
    merged = merge_pretrained(variables, ported)

    state = SimpleNamespace(params=merged["params"],
                            batch_stats=merged.get("batch_stats", {}),
                            opt_state={}, step=0)
    path = save_checkpoint(work_dir, 0, state)  # stamps VERSION into extra
    logging.info("ported checkpoint saved to %s", path)
    return path


def main():
    args = parse_args()
    from sparsebev_tpu.config import Config
    from sparsebev_tpu.utils import init_logging

    init_logging()
    cfg = Config.fromfile(args.config)

    work_dir = args.work_dir or tempfile.mkdtemp(prefix="parity_")
    os.makedirs(work_dir, exist_ok=True)

    overrides = []
    ann = args.ann_file
    if args.synthetic and ann is None:
        from sparsebev_tpu.data import make_synthetic_dataset
        ann = make_synthetic_dataset(os.path.join(work_dir, "synth"),
                                     num_samples=4, sweeps_between=2,
                                     image_hw=tuple(
                                         cfg.ida_aug_conf["final_dim"]))
        # synthetic eval needs GT through the pipeline
        overrides += ["data.val.test_mode=False"]
    if ann:
        overrides += [f"data.val.ann_file={ann}"]
    if args.data_root is not None:
        overrides += [f"data.val.data_root={args.data_root}"]

    ckpt_path = None
    if args.torch_ckpt:
        ckpt_path = port_checkpoint(cfg, args.torch_ckpt, work_dir)
    elif not args.synthetic:
        logging.error("need --torch-ckpt (or --synthetic for a dry run)")
        return 2

    cmd = [sys.executable, os.path.join(REPO, "tools", "val.py"),
           "--config", args.config,
           "--out", os.path.join(work_dir, "submission.json")]
    if ckpt_path:
        cmd += ["--weights", ckpt_path]
    if args.limit:
        cmd += ["--limit", str(args.limit)]
    if args.platform:
        cmd += ["--platform", args.platform]
    if args.online:
        cmd += ["--online"]
    if overrides:
        cmd += ["--override"] + overrides
    logging.info("running: %s", " ".join(cmd))
    out = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO)
    log_text = out.stdout + out.stderr
    sys.stderr.write(log_text[-4000:])
    if out.returncode != 0:
        logging.error("val failed (rc=%d)", out.returncode)
        return out.returncode

    nds = None
    for line in log_text.splitlines():
        if "NDS:" in line:
            nds = float(line.rsplit("NDS:", 1)[1])
    report = {"nds": nds, "expected": args.expected_nds,
              "checkpoint": args.torch_ckpt, "work_dir": work_dir}
    if nds is not None and args.expected_nds is not None:
        report["diff"] = round(nds - args.expected_nds, 4)
        report["within_noise"] = abs(report["diff"]) <= 0.3
    print(json.dumps(report))
    with open(os.path.join(work_dir, "parity.json"), "w") as f:
        json.dump(report, f)
    return 0


if __name__ == "__main__":
    sys.exit(main())
