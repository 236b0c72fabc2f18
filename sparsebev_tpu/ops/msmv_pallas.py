"""Pallas TPU kernel: MXU one-hot sampling for the small pyramid levels.

Why: XLA's TPU gather costs ~14-17 ns per index regardless of payload
(measured on v5e), capping the decoder's spatio-temporal sampling at
~15 ms/layer at r50 scale. For levels with small images, the bilinear sample
can instead run as a DENSE one-hot matmul on the MXU:

    rows   = A @ F         A: [QB, N*H] with 2 bilinear-weighted nonzeros/row
                           F: [N*H, W*C] one slice's level features
    out[k] = sum_w X[k, w] * rows[k, w, :]    X: 2 nonzeros over W

The matmul spends FLOPs on zeros, but MXU throughput (~200 bf16 TFLOP/s)
makes that profitable whenever ``N*H_l * W_l * C`` is small: levels 1..3 of
the r50 pyramid cost ~0.33 TFLOP/layer as matmuls vs ~11 ms of gathers.
Level 0 stays on the XLA pair-gather path (its area makes one-hot
FLOPs-bound). Both stages fuse per (slice, query-block) so the [QB, W*C]
intermediate never leaves VMEM.

Mosaic lowering lessons baked in (v5e, 2026-08):
- lane-splitting reshapes ([QB, W*C] -> [QB, W, C]) and jnp.repeat do not
  lower: the x-selection runs on the flat layout via an MXU expansion matmul
  and a binary reduction matmul;
- a [K]-vector read followed by ``[:, None]`` is a lane->sublane relayout
  (~us each): all per-query scalars travel as ONE [S, K, 8] fp32 array whose
  in-kernel reads are already sublane-major [QB, 8];
- dynamic LANE offsets relayout; dynamic SUBLANE offsets are cheap.

STATUS (v5e, 2026-08): correct (oracle-tested) but NOT faster than the XLA
pair-gather — ~4-7 ms/level vs the ~0.3-2 ms FLOP estimate. Ablations
(in-kernel vs XLA-prebuilt one-hot matrices, per-block vs per-slice grids,
packed sublane-major scalars) all land on the same floor: the auxiliary
matmuls are SKINNY (contraction dims 48-192, output tiles of 64 lanes), so
the MXU runs at ~10-20% utilization and the decomposition is
utilization-bound, not overhead-bound. Candidate follow-ups: batch multiple
slices into one fat matmul (block-diagonal A), int8 one-hots, or fusing the
expand/reduce one-hots into the main contraction. Kept as the
``set_sampling_impl("hybrid")`` opt-in; the production default remains
``"xla"``. Forward-only (inference); training uses the XLA formulation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# packed scalar channels: rows0, rows1, wy0, wy1, x0, wx0, wx1, (pad)
_NCHAN = 8


def _onehot_sample_kernel(a_ref, xsel_ref, feat_ref, out_ref,
                          *, nh: int, w: int, c: int, qb: int, nq: int):
    """One grid step per SLICE; query blocks loop inside the kernel.

    The one-hot matrices are PREBUILT by XLA outside the kernel (building
    them in-kernel hit VPU relayout floors): a: [1, K, NH] bf16 row one-hot
    with y-weights folded in; xsel: [1, K, W] bf16 x-pair one-hot;
    feat: [1, NH, W*C] bf16; out: [1, K, C] f32. The kernel is pure MXU:
    g = a @ feat; expand xsel to lanes via E; reduce W-groups via R.
    """
    feat = feat_ref[0]

    # fixed binary matrices: expansion E[w, w*C + j] = (j // C == w) and
    # reduction R[i, j] = (i mod C == j)
    e_w = jax.lax.broadcasted_iota(jnp.int32, (w, w * c), 0)
    e_l = jax.lax.broadcasted_iota(jnp.int32, (w, w * c), 1) // c
    expand_mat = (e_w == e_l).astype(jnp.bfloat16)
    r_i = jax.lax.broadcasted_iota(jnp.int32, (w * c, c), 0)
    r_j = jax.lax.broadcasted_iota(jnp.int32, (w * c, c), 1)
    reduce_mat = (jax.lax.rem(r_i, c) == r_j).astype(jnp.bfloat16)

    def body(qi, _):
        qs = pl.ds(qi * qb, qb)
        a = a_ref[0, qs, :]                               # [QB, NH] bf16
        g = jnp.dot(a, feat, preferred_element_type=jnp.float32)  # [QB, W*C]
        xsel_full = jnp.dot(xsel_ref[0, qs, :], expand_mat,
                            preferred_element_type=jnp.float32)   # [QB, W*C]
        gx = (g * xsel_full).astype(jnp.bfloat16)
        out_ref[0, qs, :] = jnp.dot(gx, reduce_mat,
                                    preferred_element_type=jnp.float32)
        return 0

    jax.lax.fori_loop(0, nq, body, 0)


def onehot_sample_level(feat_table: jnp.ndarray,
                        rows0: jnp.ndarray, rows1: jnp.ndarray,
                        wy0: jnp.ndarray, wy1: jnp.ndarray,
                        x0: jnp.ndarray,
                        wx0: jnp.ndarray, wx1: jnp.ndarray,
                        w: int, c: int,
                        query_block: int = 256,
                        interpret: bool = False) -> jnp.ndarray:
    """Sample one pyramid level for all slices via MXU one-hot matmuls.

    feat_table: [S, NH, W*C] (S = B*T*G slices; bf16 recommended).
    rows0/rows1: [S, K] int32 row index (view*H + y) of the two y taps
      (clipped in-range; out-of-range taps must carry zero weights).
    wy0/wy1: [S, K] f32 y-tap weights with the level's scale weight folded in.
    x0: [S, K] int32 left x tap, clipped to [0, W-2] with the weight remap
      for shifted windows already applied (same contract as the pair-gather).
    wx0/wx1: [S, K] f32 x-pair weights.
    Returns [S, K, C] fp32: wy0*(wx0*F[r0,x0] + wx1*F[r0,x0+1]) + wy1*(...)
    — bilinear weights are separable, so this equals the 4-tap form.
    """
    s, nh, wc = feat_table.shape
    assert wc == w * c
    k = rows0.shape[1]
    qb = query_block
    k_pad = -(-k // qb) * qb
    nq = k_pad // qb

    # build the one-hot matrices with XLA (vectorized compares — cheap; the
    # in-kernel build hit VPU relayout floors)
    row_ids = jnp.arange(nh, dtype=jnp.int32)
    a_mat = ((rows0[..., None] == row_ids) * wy0[..., None]
             + (rows1[..., None] == row_ids) * wy1[..., None])  # [S, K, NH]
    col_ids = jnp.arange(w, dtype=jnp.int32)
    xsel = ((x0[..., None] == col_ids) * wx0[..., None]
            + ((x0[..., None] + 1) == col_ids) * wx1[..., None])  # [S, K, W]
    a_mat = a_mat.astype(jnp.bfloat16)
    xsel = xsel.astype(jnp.bfloat16)
    if k_pad != k:
        a_mat = jnp.pad(a_mat, ((0, 0), (0, k_pad - k), (0, 0)))
        xsel = jnp.pad(xsel, ((0, 0), (0, k_pad - k), (0, 0)))

    kernel = functools.partial(_onehot_sample_kernel, nh=nh, w=w, c=c, qb=qb,
                               nq=nq)
    out = pl.pallas_call(
        kernel,
        grid=(s,),
        in_specs=[pl.BlockSpec((1, k_pad, nh), lambda si: (si, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, k_pad, w), lambda si: (si, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, nh, wc), lambda si: (si, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, k_pad, c), lambda si: (si, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((s, k_pad, c), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(a_mat, xsel, feat_table)
    return out[:, :k]
