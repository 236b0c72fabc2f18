"""Pallas TPU kernel: build grouped y-fold sampling tables in one pass.

The msmv gather consumes per-level tables ``[B*T*N*H*G, W+1, 2Cg]`` (row
order (b,t,n,h,g); row (…h,g) holds ``feat[h, :, g-block] ‖ feat[h+1, :,
g-block]`` plus a zero guard column — see msmv_sampling.PackedFeatures).
Expressed as XLA reshape/transpose/concat/pad this build materializes the
740 MB (r50-scale, bf16) pyramid several times (~10-14 ms measured on v5e);
the information-theoretic cost is one read + one write (~1.8 ms). This
kernel hits that: each grid step copies an H-block of one (b,t,n) image
from HBM to VMEM once and emits the permuted/duplicated rows with static
lane-slice copies only (no relayouts, no gathers).

The next-H-block overlap (row h+1 of the block's last row) is handled by a
second BlockSpec on the same operand pinned to block j+1 (clamped at the
image's last block, where the second channel half is zeroed instead).

Training still differentiates through the pack: a custom VJP implements the
adjoint (sum of each feature element's two table copies) in plain XLA —
the backward pays the copy chain, the hot inference path does not.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pack_kernel(a_ref, b_ref, o_ref, *, bh, w, cg, groups, nhb):
    """a: (1, BH, W, C) this block; b: same array, next block (clamped);
    o: (1, BH, G, W+1, 2Cg)."""
    j = pl.program_id(1)
    is_last = j == nhb - 1
    zeros_row = jnp.zeros((w, cg), a_ref.dtype)
    for g in range(groups):
        lo = g * cg
        # first channel half: feat[h]
        o_ref[0, :, g, 0:w, 0:cg] = a_ref[0, :, :, lo:lo + cg]
        # second half: feat[h+1] — rows shift up by one inside the block
        # (a 1-row block has no intra-block shift: its only row is the
        # "last row" handled below)
        if bh > 1:
            o_ref[0, 0:bh - 1, g, 0:w, cg:2 * cg] = \
                a_ref[0, 1:bh, :, lo:lo + cg]

        # ...and the block's last row takes the next block's first row
        # (zeros at the image's bottom row).
        @pl.when(jnp.logical_not(is_last))
        def _():
            o_ref[0, bh - 1, g, 0:w, cg:2 * cg] = b_ref[0, 0, :, lo:lo + cg]

        @pl.when(is_last)
        def _():
            o_ref[0, bh - 1, g, 0:w, cg:2 * cg] = zeros_row

        # zero guard column at x = W
        o_ref[0, :, g, w, :] = jnp.zeros((bh, 2 * cg), a_ref.dtype)


def pack_level_tpu(feat: jnp.ndarray, num_groups: int,
                   interpret: bool = False) -> jnp.ndarray:
    """feat: [M, H, W, C] (M = B*T*N images) -> [M, H, G, W+1, 2Cg]."""
    m, h, w, c = feat.shape
    g = num_groups
    cg = c // g
    assert c % g == 0
    # block height: largest divisor of h whose working set (2 input blocks +
    # 1 output block, double-buffered by the pipeline) fits in scoped VMEM.
    # A fixed bh=16 OOMs at r101 scale (w=352: 23 MB > the 16 MB limit).
    itemsize = jnp.dtype(feat.dtype).itemsize
    per_row = (2 * w * c + g * (w + 1) * 2 * cg) * itemsize
    bh = min(h, 16)
    while bh > 1 and (per_row * bh * 2 > 12 * 1024 * 1024 or h % bh):
        bh //= 2
    assert h % bh == 0, (h, bh)
    nhb = h // bh

    kernel = functools.partial(_pack_kernel, bh=bh, w=w, cg=cg, groups=g,
                               nhb=nhb)
    return pl.pallas_call(
        kernel,
        grid=(m, nhb),
        in_specs=[
            pl.BlockSpec((1, bh, w, c), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bh, w, c),
                         lambda i, j: (i, jnp.minimum(j + 1, nhb - 1), 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bh, g, w + 1, 2 * cg),
                               lambda i, j: (i, j, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, h, g, w + 1, 2 * cg), feat.dtype),
        interpret=interpret,
    )(feat, feat)


def _pack_level_xla(feat: jnp.ndarray, num_groups: int) -> jnp.ndarray:
    """Reference XLA formulation (fallback + VJP primal definition)."""
    m, h, w, c = feat.shape
    g = num_groups
    cg = c // g
    f = feat.reshape(m, h, w, g, cg)
    fy = jnp.concatenate([f[:, 1:], jnp.zeros_like(f[:, :1])], axis=1)
    t2 = jnp.stack([f, fy], axis=-2)                   # [M,H,W,G,2,Cg]
    t2 = jnp.transpose(t2, (0, 1, 3, 2, 4, 5))         # [M,H,G,W,2,Cg]
    t2 = jnp.pad(t2, ((0, 0), (0, 0), (0, 0), (0, 1), (0, 0), (0, 0)))
    return t2.reshape(m, h, g, w + 1, 2 * cg)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def pack_level(feat: jnp.ndarray, num_groups: int) -> jnp.ndarray:
    if jax.default_backend() == "tpu":
        return pack_level_tpu(feat, num_groups)
    return _pack_level_xla(feat, num_groups)


def _pack_level_fwd(feat, num_groups):
    return pack_level(feat, num_groups), feat.shape


def _pack_level_bwd(num_groups, feat_shape, dt):
    """Adjoint: dfeat[m,h,w,(g,cg)] = dT[m,h,g,w,cg] + dT[m,h-1,g,w,Cg+cg]."""
    m, h, w, c = feat_shape
    g = num_groups
    cg = c // g
    dt = dt[:, :, :, :w]                                # drop guard column
    d0 = dt[..., :cg]                                   # [M,H,G,W,Cg]
    d1 = dt[..., cg:]
    d1 = jnp.concatenate([jnp.zeros_like(d1[:, :1]), d1[:, :h - 1]], axis=1)
    dsum = d0 + d1                                      # [M,H,G,W,Cg]
    dfeat = jnp.transpose(dsum, (0, 1, 3, 2, 4)).reshape(m, h, w, c)
    return (dfeat,)


pack_level.defvjp(_pack_level_fwd, _pack_level_bwd)


def _pack_pair_kernel(a_ref, o_ref, *, bh, w, cg, groups):
    """Pair (memory) mode: a: (1, BH, W, C) -> o: (1, BH, G, W+1, Cg).

    No y-interleave (pair levels take two y-row gathers per point instead),
    so there is no next-block operand and no channel doubling — just the
    (W <-> G) local permute plus the zero guard column."""
    for g in range(groups):
        lo = g * cg
        o_ref[0, :, g, 0:w, :] = a_ref[0, :, :, lo:lo + cg]
        o_ref[0, :, g, w, :] = jnp.zeros((bh, cg), a_ref.dtype)


def pack_level_pair_tpu(feat: jnp.ndarray, num_groups: int,
                        interpret: bool = False) -> jnp.ndarray:
    """feat: [M, H, W, C] -> [M, H, G, W+1, Cg] (pair-mode rows).

    The XLA reshape/transpose/pad chain for the 1600x640 pair-mode L0
    (the only level big configs keep at 1x feature memory) materializes
    the ~200 MB pyramid several times — measured ~7.4 ms/sample of
    pad/copy/slice glue on the vov99 trace (2026-08-20); one read + one
    write is ~0.5 ms. Same kernel structure as the y-fold pack, minus the
    next-block operand."""
    m, h, w, c = feat.shape
    g = num_groups
    cg = c // g
    assert c % g == 0
    itemsize = jnp.dtype(feat.dtype).itemsize
    per_row = (w * c + g * (w + 1) * cg) * itemsize
    bh = min(h, 16)
    while bh > 1 and (per_row * bh * 2 > 12 * 1024 * 1024 or h % bh):
        bh //= 2
    assert h % bh == 0, (h, bh)
    nhb = h // bh

    kernel = functools.partial(_pack_pair_kernel, bh=bh, w=w, cg=cg, groups=g)
    return pl.pallas_call(
        kernel,
        grid=(m, nhb),
        in_specs=[
            pl.BlockSpec((1, bh, w, c), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bh, g, w + 1, cg),
                               lambda i, j: (i, j, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, h, g, w + 1, cg), feat.dtype),
        interpret=interpret,
    )(feat)


def _pack_pair_xla(feat: jnp.ndarray, num_groups: int) -> jnp.ndarray:
    """Reference XLA formulation (fallback + VJP primal definition)."""
    m, h, w, c = feat.shape
    g = num_groups
    cg = c // g
    f = feat.reshape(m, h, w, g, cg)
    f = jnp.transpose(f, (0, 1, 3, 2, 4))              # [M,H,G,W,Cg]
    f = jnp.pad(f, ((0, 0),) * 3 + ((0, 1), (0, 0)))   # guard column
    return f


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def pack_level_pair(feat: jnp.ndarray, num_groups: int) -> jnp.ndarray:
    if jax.default_backend() == "tpu":
        return pack_level_pair_tpu(feat, num_groups)
    return _pack_pair_xla(feat, num_groups)


def _pack_pair_fwd(feat, num_groups):
    return pack_level_pair(feat, num_groups), feat.shape


def _pack_pair_bwd(num_groups, feat_shape, dt):
    """Adjoint: each feature element has exactly ONE table copy."""
    m, h, w, c = feat_shape
    dfeat = jnp.transpose(dt[:, :, :, :w], (0, 1, 3, 2, 4)).reshape(
        m, h, w, c)
    return (dfeat,)


pack_level_pair.defvjp(_pack_pair_fwd, _pack_pair_bwd)
