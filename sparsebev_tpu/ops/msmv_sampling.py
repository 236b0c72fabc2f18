"""Multi-scale multi-view bilinear sampling (the reference's one custom op).

Semantics contract (mirrors the CUDA kernel + PyTorch fallback at
/root/reference/models/csrc/msmv_sampling/msmv_sampling_forward.cu:75-164 and
/root/reference/models/csrc/wrapper.py:14-38):

- ``mlvl_feats``: list of L feature pyramids, each ``[B, N, H_l, W_l, C]``
  (channel-last — the layout the CUDA op also uses, and TPU-native).
- ``sampling_locations``: ``[B, Q, P, 3]`` — x, y in [0, 1] with
  ``align_corners=True`` scaling (pixel = loc * (size - 1)), third coord is
  the view index normalized by ``1 / (N - 1)``; the view is selected by
  ``round(v * (N - 1))`` (nearest view, msmv_sampling_forward.cu:110).
- ``scale_weights``: ``[B, Q, P, L]`` per-level aggregation weights.
- Output: ``[B, Q, P, C]`` = sum_l w_l * bilinear(feat_l, x, y) with
  zero padding outside the image (per-tap border guard).

Two implementations:

- :func:`msmv_sampling_reference` — direct per-level formulation; the
  readable oracle (analog of ``msmv_sampling_pytorch``).
- :func:`msmv_sampling` — production path: all L levels and 4 bilinear taps
  are folded into ONE flat XLA gather over a concatenated feature buffer,
  so HBM is touched once per tap with C-contiguous (128-byte-aligned for
  C>=64 bf16) vector loads. Gradients flow through the bilinear weights via
  autodiff (the scatter-add backward XLA derives matches the CUDA col2im
  ``atomicAdd`` backward, msmv_sampling_backward.cu:29-105).

Both are jit/vmap/grad-safe with static shapes.
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp


def _bilinear_taps(x_pix, y_pix, h, w):
    """Corner indices + weights for bilinear sampling with zero padding.

    Returns (ix0, iy0, ix1, iy1, w00, w01, w10, w11, valid_*) where weights
    already include the out-of-bounds zero masking per tap.
    """
    x0 = jnp.floor(x_pix)
    y0 = jnp.floor(y_pix)
    lx = x_pix - x0
    ly = y_pix - y0
    hx = 1.0 - lx
    hy = 1.0 - ly

    ix0 = x0.astype(jnp.int32)
    iy0 = y0.astype(jnp.int32)
    ix1 = ix0 + 1
    iy1 = iy0 + 1

    def inb(ix, iy):
        return ((ix >= 0) & (ix <= w - 1) & (iy >= 0) & (iy <= h - 1))

    w00 = hy * hx * inb(ix0, iy0)  # (y0, x0)
    w01 = hy * lx * inb(ix1, iy0)  # (y0, x1)
    w10 = ly * hx * inb(ix0, iy1)  # (y1, x0)
    w11 = ly * lx * inb(ix1, iy1)  # (y1, x1)
    return (ix0, iy0, ix1, iy1), (w00, w01, w10, w11)


def msmv_sampling_reference(mlvl_feats: Sequence[jnp.ndarray],
                            sampling_locations: jnp.ndarray,
                            scale_weights: jnp.ndarray) -> jnp.ndarray:
    """Readable per-level oracle. Shapes per module docstring."""
    assert scale_weights.shape[-1] == len(mlvl_feats)
    b, q, p, _ = sampling_locations.shape
    n = mlvl_feats[0].shape[1]
    c = mlvl_feats[0].shape[-1]

    x = sampling_locations[..., 0]
    y = sampling_locations[..., 1]
    v = sampling_locations[..., 2]
    view = jnp.round(v * (n - 1)).astype(jnp.int32)
    view = jnp.clip(view, 0, n - 1)

    out = jnp.zeros((b, q, p, c), dtype=jnp.float32)
    batch_idx = jnp.arange(b)[:, None, None]
    for lvl, feat in enumerate(mlvl_feats):
        h, w = feat.shape[2], feat.shape[3]
        x_pix = x * (w - 1)
        y_pix = y * (h - 1)
        (ix0, iy0, ix1, iy1), (w00, w01, w10, w11) = _bilinear_taps(x_pix, y_pix, h, w)
        ix0c, ix1c = jnp.clip(ix0, 0, w - 1), jnp.clip(ix1, 0, w - 1)
        iy0c, iy1c = jnp.clip(iy0, 0, h - 1), jnp.clip(iy1, 0, h - 1)
        tap = (feat[batch_idx, view, iy0c, ix0c] * w00[..., None]
               + feat[batch_idx, view, iy0c, ix1c] * w01[..., None]
               + feat[batch_idx, view, iy1c, ix0c] * w10[..., None]
               + feat[batch_idx, view, iy1c, ix1c] * w11[..., None])
        out = out + tap.astype(jnp.float32) * scale_weights[..., lvl:lvl + 1].astype(jnp.float32)
    return out


def msmv_sampling(mlvl_feats: Sequence[jnp.ndarray],
                  sampling_locations: jnp.ndarray,
                  scale_weights: jnp.ndarray) -> jnp.ndarray:
    """Production path: one fused gather across all levels and taps.

    Equivalent to :func:`msmv_sampling_reference`; property-tested against it.
    """
    num_levels = len(mlvl_feats)
    assert scale_weights.shape[-1] == num_levels
    b, q, p, _ = sampling_locations.shape
    n = mlvl_feats[0].shape[1]
    c = mlvl_feats[0].shape[-1]

    x = sampling_locations[..., 0]  # [B, Q, P]
    y = sampling_locations[..., 1]
    v = sampling_locations[..., 2]
    view = jnp.clip(jnp.round(v * (n - 1)).astype(jnp.int32), 0, n - 1)

    # Concatenate all levels' [N*H*W] flattened spatial axes into one buffer,
    # then fold the batch in as well: ONE flat [B*sum(N*H*W), C] table and one
    # global int32 index per tap. A single `jnp.take(axis=0)` is the fastest
    # gather lowering XLA has on TPU (~2.7 ns/index, measured on v5e; batched
    # take_along_axis and multi-gather formulations are 30-50% slower).
    flat_feats = []
    level_offsets = []
    offset = 0
    for feat in mlvl_feats:
        h, w = feat.shape[2], feat.shape[3]
        flat_feats.append(feat.reshape(b, n * h * w, c))
        level_offsets.append(offset)
        offset += n * h * w
    total = offset
    flat = jnp.concatenate(flat_feats, axis=1).reshape(b * total, c)
    batch_base = (jnp.arange(b, dtype=jnp.int32) * total)[:, None, None]  # [B,1,1]

    all_idx = []   # per (level, tap): [B, Q, P] int32 global flat index
    all_wgt = []   # per (level, tap): [B, Q, P] f32 combined weight
    for lvl, feat in enumerate(mlvl_feats):
        h, w = feat.shape[2], feat.shape[3]
        x_pix = x * (w - 1)
        y_pix = y * (h - 1)
        (ix0, iy0, ix1, iy1), taps_w = _bilinear_taps(x_pix, y_pix, h, w)
        ix0c, ix1c = jnp.clip(ix0, 0, w - 1), jnp.clip(ix1, 0, w - 1)
        iy0c, iy1c = jnp.clip(iy0, 0, h - 1), jnp.clip(iy1, 0, h - 1)
        base = batch_base + level_offsets[lvl] + view * (h * w)
        lw = scale_weights[..., lvl].astype(jnp.float32)
        for (iyc, ixc), tw in zip(((iy0c, ix0c), (iy0c, ix1c), (iy1c, ix0c), (iy1c, ix1c)),
                                  taps_w):
            all_idx.append(base + iyc * w + ixc)
            all_wgt.append(tw * lw)

    k = num_levels * 4
    idx = jnp.stack(all_idx, axis=-1).reshape(b * q * p * k)
    wgt = jnp.stack(all_wgt, axis=-1).reshape(b * q * p * k)

    gathered = jnp.take(flat, idx, axis=0)  # [B*Q*P*K, C]
    out = gathered.astype(jnp.float32) * wgt[:, None]
    out = out.reshape(b, q, p, k, c).sum(axis=3)
    return out  # [B, Q, P, C]
