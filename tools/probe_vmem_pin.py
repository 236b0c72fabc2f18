#!/usr/bin/env python
"""VMEM-pinning probe (TPU v5e) for the r50 y-fold ring tables.

Question behind the fp8 ring mode (inference.ring_table_dtypes): if
level-1's streaming table is stored 1-byte (139 MB bf16 -> 70 MB), does
XLA's memory-space assignment pin it to VMEM (~6.8 ns/gather-idx) instead
of HBM (~14-17 ns/idx) — in the presence of the other levels' tables
(L0 557 MB never fits 128 MB VMEM, L2 35 MB + L3 9 MB already pin)?

Runs each level's window-gather+fold alone (bf16/int8/fp8) and then the
4-level combos at exact r50-900q shapes. Honest-timing rules (see
docs/ROADMAP.md + .claude/skills/verify/SKILL.md): indices perturbed per
iteration so nothing hoists/CSEs, full window consumed via the real fold
math, one scalar readback per loop.
"""
import time
import numpy as np
import jax
import jax.numpy as jnp

K = 115200  # indices per level per layer at r50-900q
CH = 128    # 2c lanes in the y-fold window
# real r50 y-fold ring dims (rows, cols): rows = T*N*G*Hl etc.
DIMS = [(12288, 177), (6144, 89), (3072, 45), (1536, 23)]


def window_fold(table, starts, wxa, wxb, ya, yb):
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3), collapsed_slice_dims=(), start_index_map=(0, 1))
    g = jax.lax.gather(table, starts, dn, slice_sizes=(1, 2, CH),
                       mode="promise_in_bounds")
    g2 = g[:, 0]
    c = CH // 2
    if g2.dtype != jnp.bfloat16:
        g2 = g2.astype(jnp.bfloat16)
    xa = wxa[:, None].astype(g2.dtype)
    xb = wxb[:, None].astype(g2.dtype)
    out = (((g2[:, 0, :c] * xa).astype(jnp.float32)
            + (g2[:, 1, :c] * xb).astype(jnp.float32)) * ya[:, None]
           + ((g2[:, 0, c:] * xa).astype(jnp.float32)
              + (g2[:, 1, c:] * xb).astype(jnp.float32)) * yb[:, None])
    return out.astype(jnp.bfloat16)


def bench(fn, *args, iters=30):
    @jax.jit
    def loop(*a):
        def body(i, acc):
            return acc + fn(i, *a)
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))
    float(loop(*args))
    t0 = time.perf_counter()
    float(loop(*args))
    return (time.perf_counter() - t0) / iters * 1e3


def mk_table(rows, cols, dt, rng):
    if dt == jnp.int8:
        return jnp.asarray(rng.randint(-127, 127, (rows, cols, CH)), jnp.int8)
    if dt == jnp.float8_e4m3fn:
        tile = rng.randn(1024, cols, CH).astype(np.float32)
        reps = int(np.ceil(rows / 1024))
        return jnp.asarray(np.tile(tile, (reps, 1, 1))[:rows]).astype(dt)
    # host-side fp32 rand is slow at 557MB; fill from smaller tile
    tile = rng.randn(1024, cols, CH).astype(np.float32)
    reps = int(np.ceil(rows / 1024))
    return jnp.asarray(np.tile(tile, (reps, 1, 1))[:rows]).astype(dt)


def mk_args(rows, cols, rng):
    r = rng.randint(0, rows, K).astype(np.int32)
    c = rng.randint(0, cols - 1, K).astype(np.int32)
    starts = jnp.asarray(np.stack([r, c], -1))
    w = [jnp.asarray(rng.rand(K).astype(np.float32)) for _ in range(4)]
    return starts, w


def run_case(name, table, rows, cols, rng):
    starts, (wxa, wxb, ya, yb) = mk_args(rows, cols, rng)

    def g(i, t, s, a, b_, c_, d_):
        s2 = (s + i) % jnp.asarray([rows - 1, cols - 1])
        return window_fold(t, s2, a, b_, c_, d_).astype(jnp.float32).sum()
    ms = bench(g, table, starts, wxa, wxb, ya, yb)
    print(f"{name}: {ms:7.3f} ms  ({ms*1e6/K:5.1f} ns/idx)", flush=True)


def run_combo(name, dts, rng):
    ts, ss = [], []
    for (rows, cols), dt in zip(DIMS, dts):
        ts.append(mk_table(rows, cols, dt, rng))
        ss.append(mk_args(rows, cols, rng))

    def g4(i, t0, t1, t2, t3):
        acc = jnp.float32(0)
        for (rows, cols), t, (s, (wxa, wxb, ya, yb)) in zip(DIMS,
                                                            (t0, t1, t2, t3),
                                                            ss):
            s2 = (s + i) % jnp.asarray([rows - 1, cols - 1])
            acc += window_fold(t, s2, wxa, wxb, ya, yb).astype(
                jnp.float32).sum()
            acc = jax.lax.optimization_barrier(acc)
        return acc
    ms = bench(g4, *ts)
    print(f"{name}: {ms:7.3f} ms  ({ms*1e6/(4*K):5.1f} ns/idx avg)",
          flush=True)


def main():
    rng = np.random.RandomState(0)
    for name, idx, dt in [
        ("bf16  35MB alone (L2)", 2, jnp.bfloat16),
        ("bf16 139MB alone (L1)", 1, jnp.bfloat16),
        ("int8  70MB alone (L1q)", 1, jnp.int8),
        ("fp8   70MB alone (L1f)", 1, jnp.float8_e4m3fn),
        ("int8 279MB alone (L0q)", 0, jnp.int8),
    ]:
        rows, cols = DIMS[idx]
        t = mk_table(rows, cols, dt, rng)
        run_case(name, t, rows, cols, rng)
        del t

    run_combo("combo bf16x4 (current model)",
              [jnp.bfloat16] * 4, rng)
    run_combo("combo L1 fp8 (proposed)",
              [jnp.bfloat16, jnp.float8_e4m3fn, jnp.bfloat16, jnp.bfloat16],
              rng)
    run_combo("combo L0+L1 fp8",
              [jnp.float8_e4m3fn, jnp.float8_e4m3fn, jnp.bfloat16,
               jnp.bfloat16], rng)


if __name__ == "__main__":
    main()
