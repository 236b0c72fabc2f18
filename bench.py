"""Benchmark: streaming (online) inference FPS of the flagship
r50_nuimg_704x256 model on one chip — the reference's headline speed metric
(/root/reference/timing.py:77-96, README: 15.8 FPS on an RTX 3090 fp32).

Streaming semantics (reference models/sparsebev.py:255-321): per sample only
the NEWEST frame's 6 views go through the backbone; the 7 history frames'
features come from the cache. TPU-native cache design: the decoder's grouped
y-fold sampling tables live in a device-side ring (ops.msmv_sampling
ring_update/ring_packed) — per sample the new frame is packed into one ring
slot with a contiguous in-place dynamic_update_slice, and the decoder reads
history through a [T]-slot indirection. History features are never copied
or re-packed (the concat+repack formulation cost ~7 ms/sample of the 64 ms
round-1 total). The in-jit loop carries the ring, so each iteration has a
real data dependency on the previous one.

Timing notes: through the axon tunnel a single host->device round trip costs
~30 ms, so per-call host timing lies; we run ITERS iterations inside one jit
and read back one scalar (see .claude/skills/verify/SKILL.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np
import jax
import jax.numpy as jnp

from __graft_entry__ import _build_model
from sparsebev_tpu.inference import make_ring_bench

BASELINE_FPS = 15.8  # RTX 3090 fp32, reference README.md:28,36
ITERS = 20


def main():
    num_frames, h, w = 8, 256, 704
    model = _build_model(num_query=900, num_frames=num_frames, embed_dims=256,
                         num_points=4, num_layers=6, image_hw=(h, w),
                         compute_dtype=jnp.bfloat16)
    rng = np.random.RandomState(0)
    frame = jnp.asarray(rng.uniform(0, 255, (1, 6, h, w, 3)).astype(np.float32))
    lidar2img = jnp.asarray(rng.randn(1, num_frames * 6, 4, 4).astype(np.float32))
    time_diff = jnp.asarray(np.linspace(0.0, 3.5, num_frames, dtype=np.float32)[None])

    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": jax.random.PRNGKey(0), "aug": jax.random.PRNGKey(1)},
        jnp.tile(frame, (1, num_frames, 1, 1, 1)), lidar2img, time_diff,
        train=False)

    loop_for, ring = make_ring_bench(
        model, variables, frame, lidar2img, time_diff, num_frames, h, w)
    bench_loop = loop_for(ITERS)

    # compile + warm
    ring, acc = bench_loop(variables, ring, frame)
    float(acc)
    t0 = time.perf_counter()
    ring, acc = bench_loop(variables, ring, frame)
    float(acc)
    dt = (time.perf_counter() - t0) / ITERS
    fps = 1.0 / dt

    print(json.dumps({
        "metric": "r50_nuimg_704x256_streaming_fps",
        "value": round(fps, 2),
        "unit": "fps",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
    }))


if __name__ == "__main__":
    main()
