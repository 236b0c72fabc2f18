"""Benchmark: streaming (online) inference FPS of the flagship
r50_nuimg_704x256 model on one chip — the reference's headline speed metric
(/root/reference/timing.py:77-96, README: 15.8 FPS on an RTX 3090 fp32).

Streaming semantics (reference models/sparsebev.py:255-321): per sample only
the NEWEST frame's 6 views go through the backbone; the 7 history frames'
features come from the cache. We model the cache as a rolling feature buffer
carried through an in-jit loop — each iteration runs backbone-on-1-frame +
the full 6-layer decoder, with a real data dependency between iterations.

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

    extract = jax.jit(lambda v, img: model.apply(v, img, train=False,
                                                 method=model.forward_features))
    # feature cache: list of [1, T*6, H', W', C] pyramids, newest frame first
    cache = extract(variables, jnp.tile(frame, (1, num_frames, 1, 1, 1)))
    cache = jax.block_until_ready(cache)

    def one_sample(variables, cache, frame, lidar2img, time_diff):
        new_feats = model.apply(variables, frame, train=False,
                                method=model.forward_features)
        cache = [
            jnp.concatenate([nf, c[:, : (num_frames - 1) * 6]], axis=1)
            for nf, c in zip(new_feats, cache)
        ]
        preds = model.apply(variables, cache, lidar2img, time_diff,
                            h, w, method=model.forward_head)
        return cache, preds

    @jax.jit
    def bench_loop(variables, cache, frame, lidar2img, time_diff):
        def body(i, carry):
            cache, acc = carry
            cache, preds = one_sample(variables, cache, frame + i * 1e-3,
                                      lidar2img, time_diff)
            return cache, acc + preds["all_cls_scores"][-1].sum()
        _, acc = jax.lax.fori_loop(0, ITERS, body, (cache, jnp.float32(0)))
        return acc

    # compile + warm
    float(bench_loop(variables, cache, frame, lidar2img, time_diff))
    t0 = time.perf_counter()
    float(bench_loop(variables, cache, frame, lidar2img, time_diff))
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
