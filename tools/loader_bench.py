#!/usr/bin/env python
"""Input-pipeline throughput benchmark: can the host feed the chip?

Reference counterpart: the turbojpeg + multi-worker decode path
(/root/reference/loaders/pipelines/loading.py:48-51). Per val sample the
streaming pipeline decodes 6 new 1600x900 JPEGs (history frames are cached);
per TRAIN sample it decodes T*6. This tool times the full host pipeline
(decode -> resize -> crop -> flip, fused C++ vs eager PIL) on synthetic
nuScenes-sized JPEGs and reports JPEGs/s and samples/s for both cases.

The claim to check: loader samples/s >= model FPS (bench.py).
"""

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_jpegs(root, n, hw=(900, 1600)):
    from PIL import Image
    rng = np.random.RandomState(0)
    paths = []
    for i in range(n):
        # low-frequency content: realistic JPEG entropy, not white noise
        small = rng.randint(0, 255, (hw[0] // 8, hw[1] // 8, 3), np.uint8)
        arr = np.asarray(Image.fromarray(small).resize((hw[1], hw[0])))
        p = os.path.join(root, f"im{i}.jpg")
        Image.fromarray(arr).save(p, quality=90)
        paths.append(p)
    return paths


def run_pipeline(paths, lazy, ida_conf, reps):
    from sparsebev_tpu.data.pipelines import (LoadMultiViewImageFromFiles,
                                              RandomTransformImage)
    load = LoadMultiViewImageFromFiles(lazy=lazy)
    tr = RandomTransformImage(ida_aug_conf=ida_conf, training=False)
    t0 = time.perf_counter()
    for _ in range(reps):
        results = {"img_filename": list(paths),
                   "lidar2img": [np.eye(4, dtype=np.float32)
                                 for _ in paths]}
        results = load(results)
        results = tr(results)
        assert results["img"][0].shape[:2] == tuple(ida_conf["final_dim"])
    dt = (time.perf_counter() - t0) / reps
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=8,
                    help="frames per sample (T); 1 models the streaming case")
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    from sparsebev_tpu.data import fastloader
    ida_conf = dict(H=900, W=1600, final_dim=(256, 704),
                    resize_lim=(0.38, 0.55), bot_pct_lim=(0.0, 0.0),
                    rot_lim=(0.0, 0.0), rand_flip=True)
    n = args.frames * 6
    with tempfile.TemporaryDirectory() as root:
        paths = make_jpegs(root, n)
        rows = []
        for name, lazy in (("fused_native", "auto"), ("eager_pil", "never")):
            if lazy == "auto" and not fastloader.available():
                print(f"# {name}: native lib not built, skipping")
                continue
            dt = run_pipeline(paths, lazy, ida_conf, args.reps)
            rows.append({"path": name, "jpegs_per_s": round(n / dt, 1),
                         "samples_per_s": round(1.0 / dt, 2),
                         "ms_per_sample": round(dt * 1e3, 1)})
        # per-image decode is embarrassingly parallel across the fused
        # path's worker threads (capped at 8 and by host cores); the eager
        # PIL path is single-threaded. Report the facts, not a projection.
        for r in rows:
            r["host_cores"] = os.cpu_count() or 1
            r["fused_worker_threads"] = 8 if r["path"] == "fused_native" else 1
            print(json.dumps(r))


if __name__ == "__main__":
    main()
