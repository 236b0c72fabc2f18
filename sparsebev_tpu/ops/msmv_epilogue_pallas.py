"""Pallas TPU kernel: fused tap-weight epilogue for the y-fold sampling
forward.

After each level's (1, 2, 2C) window gather, the forward must contract the
4 bilinear taps with separable weights and accumulate across levels. As XLA
ops this costs ~8 ms/sample at r50-900q (r3 profile): the [K, 2, 2C] gather
output is relayouted to K-minor (2.4 ms of "data formatting") and the
multiply+adds run as standalone loop fusions (5.7 ms), re-reading the taps
from HBM. This kernel reads each gather output ONCE in its native layout
(bitcast to [2, K, 2C]: the gather's {2,0,1} layout IS [2, K, 2C]
major-to-minor), applies x-slot weights per plane, y-half weights via a
lane mask, accumulates all levels in VMEM, and folds the two y-halves with
one tiny MXU matmul against a [2C, C] stacked-identity — bandwidth-bound at
~0.3 ms/layer.

Forward-only: gradients route through the half-row custom VJP
(ops/msmv_sampling._msmv_yfold_bwd), so this epilogue never needs a
transpose rule. Numerics: taps and weights multiply in fp32 (the XLA form
multiplied in the tap dtype — the kernel is slightly MORE precise);
equivalence is property-tested against msmv_sampling_reference.

Reference contract: msmv_sampling_forward.cu:123-156 (bilinear taps,
level-weighted sum).

STATUS (v5e, 2026-08-17): correct (interpret-tested vs
msmv_sampling_reference) and compiles on hardware, but NOT wired into
_yfold_forward. Measured end to end at r50-900q: 53.2 ms/sample vs 50.7 ms
for the XLA slice-add form. The kernel itself wins (3.8 ms vs 5.7 ms reduce
+ 2.4 ms copy) and the [2, K, 2C] operand bitcast works as designed (no
gather-output copy), but (a) the window gather's custom fusion costs ~5 ms
MORE when its consumer is a custom call instead of a fusible elementwise op,
and (b) materializing the [K, 4] per-point weights in sublane-major costs a
2.3 ms lane->sublane relayout (the upstream weight math is K-in-lanes).
Kept as a measured diagnostic like ops/msmv_pallas.py; revisit if Mosaic
gains a layout hint for custom-call producers or a cheap [K]-lane ->
[K]-sublane transpose.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _tap_fold_kernel(*refs, num_levels: int, out_dtype):
    gs = refs[:num_levels]             # each [2, Kb, 2C]
    ws = refs[num_levels:2 * num_levels]  # each [Kb, 4] fp32
    fold = refs[2 * num_levels]        # [2C, C] fp32
    out = refs[2 * num_levels + 1]     # [Kb, C]

    kb = gs[0].shape[1]
    c2 = gs[0].shape[2]
    lane = jax.lax.broadcasted_iota(jnp.int32, (kb, c2), 1)
    first_half = lane < (c2 // 2)

    acc = jnp.zeros((kb, c2), jnp.float32)
    for l in range(num_levels):
        g0 = gs[l][0].astype(jnp.float32)
        g1 = gs[l][1].astype(jnp.float32)
        w = ws[l]
        wy = jnp.where(first_half, w[:, 2:3], w[:, 3:4])  # lw pre-folded
        acc = acc + (g0 * w[:, 0:1] + g1 * w[:, 1:2]) * wy
    out[...] = jnp.dot(acc, fold[...],
                       preferred_element_type=jnp.float32).astype(out.dtype)


def tap_fold_epilogue(gathered: Sequence[jnp.ndarray],
                      weights: Sequence[jnp.ndarray],
                      c: int,
                      out_dtype,
                      k_blk: int = 512,
                      interpret: bool = False) -> jnp.ndarray:
    """gathered: per-level [K, 2, 2C] window-gather outputs (bf16/fp32);
    weights: per-level [K, 4] fp32 = (wxa, wxb, wya*lw, wyb*lw).
    Returns [K, C] in ``out_dtype``."""
    num_levels = len(gathered)
    k = gathered[0].shape[0]
    c2 = gathered[0].shape[2]
    assert c2 == 2 * c

    pad = (-k) % k_blk
    # bitcast view: [K, 2, 2C] with the gather's natural {2,0,1} layout IS
    # [2, K, 2C] major-to-minor — the transpose lowers to a bitcast
    gs = [jnp.transpose(g, (1, 0, 2)) for g in gathered]
    if pad:
        gs = [jnp.pad(g, ((0, 0), (0, pad), (0, 0))) for g in gs]
        weights = [jnp.pad(w, ((0, pad), (0, 0))) for w in weights]
    kp = k + pad

    fold = jnp.concatenate([jnp.eye(c, dtype=jnp.float32)] * 2, axis=0)

    kernel = functools.partial(_tap_fold_kernel, num_levels=num_levels,
                               out_dtype=out_dtype)
    out = pl.pallas_call(
        kernel,
        grid=(kp // k_blk,),
        in_specs=(
            [pl.BlockSpec((2, k_blk, c2), lambda i: (0, i, 0),
                          memory_space=pltpu.VMEM)] * num_levels
            + [pl.BlockSpec((k_blk, 4), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)] * num_levels
            + [pl.BlockSpec((2 * c, c), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)]
        ),
        out_specs=pl.BlockSpec((k_blk, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((kp, c), out_dtype),
        interpret=interpret,
    )(*gs, *weights, fold)
    return out[:k]
