"""Pallas TPU kernel: fused AdaptiveMixing core.

The decoder's adaptive mixing (reference models/sparsebev_transformer.py:
320-387) is, per query q and group g:

    h1 = relu(LN2d(x[q,g] @ m[q,g]))        x: [P, C], m: [C, C]
    out = relu(LN2d(s[q,g] @ h1))           s: [O, P] -> out: [O, C]

with LN2d = parameter-free layer norm over BOTH trailing dims (fp32 stats).
As XLA einsums this chain is layout-bound inside the decoder scan (~4.2
ms/sample at r50-900q, of which the matmuls are ~0.8 ms). This kernel runs
the chain VMEM-resident per query block — one HBM read of x/m/s, one write
of the output, zero intermediate traffic.

EXPERIMENTAL — NOT wired into the decoder. CLOSED 2026-08-19 (v5e, real
chip): the long-standing "Mosaic compiler crash" on the batched kernel was
actually a scoped-VMEM stack OOM surfaced as an opaque remote-compile
HTTP 500 — the fp32 intermediates of a [128, ...]-block double-buffered
pipeline need 27.8 MB of scoped VMEM vs the 16 MB default. Raising the
per-kernel limit (pltpu.CompilerParams(vmem_limit_bytes=...)) or shrinking
the block makes every variant compile and run EXACT — and every variant
LOSES to XLA's einsum chain at the r50 shapes (bq=900, g=4, P=32, C=64,
O=128): blk=32 1.754 ms, blk=64 1.829 ms, blk=128 1.947 ms vs XLA 1.191 ms
per call. The batched dot_general (one batch dim) maps to the MXU but its
small per-item dots (32x64 @ 64x64) leave the systolic array mostly idle,
and XLA's own chain already fuses the LN/relu epilogues. Kept with its
measured diagnosis, like ops/msmv_pallas.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _mixing_kernel(x_ref, m_ref, s_ref, o_ref, h1_ref, h2_ref, *, eps):
    # Per-(bq*g) loops of small dots, PHASED so independent dots pipeline
    # on the MXU (dots -> all LNs -> dots -> all LNs). STATUS (v5e,
    # 2026-08-17): exact, and phasing cut 3.8 -> 2.73 ms — but XLA's einsum
    # chain is 1.24 ms standalone, so the 3600-small-dot formulation stays
    # latency-bound and is NOT wired into the decoder. What would win is a
    # batched tpu.matmul, but dot_general with 2 batch dims is rejected
    # ("Up to 1 batch dim supported"), and both the 1-batch-dim fold AND
    # block-level keepdims stats CRASH the Mosaic compiler (layout.h:320
    # Check failed: arr.size() >= layout_rank) as of 2026-08.
    blk = x_ref.shape[0]

    for b in range(blk):
        h1_ref[b] = jnp.dot(x_ref[b], m_ref[b],
                            preferred_element_type=jnp.float32)

    for b in range(blk):  # per-item scalar LN stats (2D full reduces)
        h1 = h1_ref[b]
        mu = jnp.mean(h1)
        var = jnp.mean(jnp.square(h1 - mu))
        h1_ref[b] = jnp.maximum((h1 - mu) * jax.lax.rsqrt(var + eps), 0.0)

    for b in range(blk):
        h2_ref[b] = jnp.dot(s_ref[b], h1_ref[b].astype(s_ref.dtype),
                            preferred_element_type=jnp.float32)

    for b in range(blk):
        h2 = h2_ref[b]
        mu2 = jnp.mean(h2)
        var2 = jnp.mean(jnp.square(h2 - mu2))
        o_ref[b] = jnp.maximum((h2 - mu2) * jax.lax.rsqrt(var2 + eps),
                               0.0).astype(o_ref.dtype)


def mixing_core_tpu(x: jnp.ndarray, m: jnp.ndarray, s: jnp.ndarray,
                    eps: float = 1e-5, bq_blk: int = 12,
                    interpret: bool = False) -> jnp.ndarray:
    """x: [BQ, G, P, C]; m: [BQ, G, C, C]; s: [BQ, G, O, P] ->
    [BQ, G, O, C] (dtype of x). BQ is padded to a bq_blk multiple."""
    bq, g, p, c = x.shape
    o = s.shape[2]
    blk = bq_blk * g
    x = x.reshape(bq * g, p, c)
    m = m.reshape(bq * g, c, c)
    s = s.reshape(bq * g, o, p)
    pad = (-(bq * g)) % blk
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0), (0, 0)))
        m = jnp.pad(m, ((0, pad), (0, 0), (0, 0)))
        s = jnp.pad(s, ((0, pad), (0, 0), (0, 0)))
    n = bq * g + pad
    kernel = functools.partial(_mixing_kernel, eps=eps)
    out = pl.pallas_call(
        kernel,
        grid=(n // blk,),
        in_specs=[
            pl.BlockSpec((blk, p, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, c, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, o, p), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((blk, o, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, o, c), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((blk, p, c), jnp.float32),   # h1 (pre/post LN)
            pltpu.VMEM((blk, o, c), jnp.float32),   # h2 (pre LN)
        ],
        interpret=interpret,
    )(x, m, s)
    return out[:bq * g].reshape(bq, g, o, c)


def _mixing_kernel_batched(x_ref, m_ref, s_ref, o_ref, *, eps):
    """Batched formulation: ONE dot_general with a single batch dim per
    phase (the fold of (BQ, G) into one axis happens host-side), LN stats
    with every intermediate kept RANK >= 2 — the r3 retry (nested
    non-keepdims reduces, [blk]-shaped stats) crashed Mosaic at
    layout.h:320 `Check failed: arr.size() >= layout_rank`, which points
    at the rank-1 [blk] values: a vector layout needs >= 2 dims. This r4
    variant reduces axis 2 then axis 1 WITH keepdims, so stats stay
    [blk, 1] / [blk, 1, 1] and no rank-1 array ever exists.

    r4 RESULT: compiles and is exact once the block's scoped-VMEM budget
    fits (blk<=32 under the 16 MB default; larger blocks need
    CompilerParams(vmem_limit_bytes=...)), but is slower than XLA's
    einsum chain at every block size — see the module docstring."""
    x = x_ref[...]
    m = m_ref[...]
    h1 = jax.lax.dot_general(
        x, m, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)            # [blk, P, C]
    n1 = h1.shape[1] * h1.shape[2]
    mu = jnp.sum(jnp.sum(h1, axis=2, keepdims=True), axis=1,
                 keepdims=True) / n1                   # [blk, 1, 1]
    sq = jnp.sum(jnp.sum(h1 * h1, axis=2, keepdims=True), axis=1,
                 keepdims=True) / n1
    var = jnp.maximum(sq - mu * mu, 0.0)
    rs = jax.lax.rsqrt(var + eps)
    h1 = jnp.maximum((h1 - jnp.broadcast_to(mu, h1.shape))
                     * jnp.broadcast_to(rs, h1.shape), 0.0)

    h2 = jax.lax.dot_general(
        s_ref[...], h1.astype(s_ref.dtype),
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)            # [blk, O, C]
    n2 = h2.shape[1] * h2.shape[2]
    mu2 = jnp.sum(jnp.sum(h2, axis=2, keepdims=True), axis=1,
                  keepdims=True) / n2
    sq2 = jnp.sum(jnp.sum(h2 * h2, axis=2, keepdims=True), axis=1,
                  keepdims=True) / n2
    var2 = jnp.maximum(sq2 - mu2 * mu2, 0.0)
    rs2 = jax.lax.rsqrt(var2 + eps)
    o_ref[...] = jnp.maximum(
        (h2 - jnp.broadcast_to(mu2, h2.shape))
        * jnp.broadcast_to(rs2, h2.shape), 0.0).astype(o_ref.dtype)


def mixing_core_tpu_batched(x: jnp.ndarray, m: jnp.ndarray, s: jnp.ndarray,
                            eps: float = 1e-5, bq_blk: int = 32,
                            interpret: bool = False) -> jnp.ndarray:
    """Batched-dot variant of :func:`mixing_core_tpu` (same contract)."""
    bq, g, p, c = x.shape
    o = s.shape[2]
    blk = bq_blk * g
    x = x.reshape(bq * g, p, c)
    m = m.reshape(bq * g, c, c)
    s = s.reshape(bq * g, o, p)
    pad = (-(bq * g)) % blk
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0), (0, 0)))
        m = jnp.pad(m, ((0, pad), (0, 0), (0, 0)))
        s = jnp.pad(s, ((0, pad), (0, 0), (0, 0)))
    n = bq * g + pad
    kernel = functools.partial(_mixing_kernel_batched, eps=eps)
    out = pl.pallas_call(
        kernel,
        grid=(n // blk,),
        in_specs=[
            pl.BlockSpec((blk, p, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, c, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, o, p), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((blk, o, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, o, c), x.dtype),
        interpret=interpret,
    )(x, m, s)
    return out[:bq * g].reshape(bq, g, o, c)


def _mixing_core_xla(x, m, s, eps=1e-5):
    """Reference XLA formulation (bwd primal + CPU fallback)."""
    def ln2(t):
        t32 = t.astype(jnp.float32)
        axes = (t.ndim - 2, t.ndim - 1)
        mu = jnp.mean(t32, axis=axes, keepdims=True)
        var = jnp.var(t32, axis=axes, keepdims=True)
        return (t32 - mu) * jax.lax.rsqrt(var + eps)
    h1 = jnp.einsum("bgpc,bgcd->bgpd", x, m,
                    preferred_element_type=jnp.float32)
    h1 = jnp.maximum(ln2(h1), 0.0).astype(x.dtype)
    h2 = jnp.einsum("bgop,bgpc->bgoc", s, h1,
                    preferred_element_type=jnp.float32)
    h2 = jnp.maximum(ln2(h2), 0.0)
    return h2.astype(x.dtype)


@jax.custom_vjp
def mixing_core(x: jnp.ndarray, m: jnp.ndarray, s: jnp.ndarray) -> jnp.ndarray:
    if jax.default_backend() == "tpu":
        return mixing_core_tpu(x, m, s)
    return _mixing_core_xla(x, m, s)


def _mixing_core_fwd(x, m, s):
    return mixing_core(x, m, s), (x, m, s)


def _mixing_core_bwd(res, g):
    x, m, s = res
    _, vjp = jax.vjp(_mixing_core_xla, x, m, s)
    return vjp(g.astype(x.dtype))


mixing_core.defvjp(_mixing_core_fwd, _mixing_core_bwd)
