"""Camera projection + spatio-temporal sampling orchestration.

TPU-native rewrite of /root/reference/models/sparsebev_sampling.py:8-130:
the box-frame sample-point placement (``make_sample_points``) and the
homogeneous projection / single-valid-view selection / layout folding
(``sampling_4d``) feeding :func:`~sparsebev_tpu.ops.msmv_sampling.msmv_sampling`.

Differences from the reference (deliberate, TPU-first):
- einsum-based batched projection instead of expanded matmuls;
- channel-last features throughout.

One quirk is preserved on purpose: the reference folds scale weights as
``(B, G, T)`` while features/locations fold as ``(B, T, G)``
(models/sparsebev_sampling.py:112-119). When T != G this pairs feature group
``i % G`` with the weights generated for group ``i // T`` — a fixed
permutation the trained checkpoints have adapted to. We replicate it exactly
so ported weights reproduce the reference bit-for-bit.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from .box_ops import decode_bbox
from .geometry import rotation_3d_in_axis
from .msmv_sampling import msmv_sampling


def make_sample_points(query_bbox: jnp.ndarray, offset: jnp.ndarray,
                       pc_range) -> jnp.ndarray:
    """Place normalized offsets in each query box's frame.

    query_bbox: ``[B, Q, 10]`` (query layout); offset: ``[B, Q, P, 3]``
    normalized by box extent. Returns world-space points ``[B, Q, P, 3]``.
    (reference: models/sparsebev_sampling.py:8-24)
    """
    bbox = decode_bbox(query_bbox, pc_range)  # [B, Q, 9+]
    xyz = bbox[..., 0:3]
    wlh = bbox[..., 3:6]
    ang = bbox[..., 6:7]
    delta_xyz = offset[..., 0:3] * wlh[:, :, None, :]
    delta_xyz = rotation_3d_in_axis(delta_xyz, ang)
    return xyz[:, :, None, :] + delta_xyz


def project_points(sample_points: jnp.ndarray,
                   lidar2img: jnp.ndarray,
                   image_h: int, image_w: int,
                   num_views: int = 6,
                   eps: float = 1e-5):
    """Project world points through per-frame per-view matrices and pick the
    single valid view per point (argmax trick,
    models/sparsebev_sampling.py:101-109).

    sample_points: ``[B, Q, T, GP, 3]``; lidar2img: ``[B, T*N, 4, 4]``.
    Returns:
      loc: ``[B, T, Q, GP, 3]`` — x, y in [0, 1] + view/(N-1);
      valid: ``[B, T, Q, GP]`` — 1.0 where the chosen view sees the point.
    """
    b, q, t, gp, _ = sample_points.shape
    n = num_views
    l2i = lidar2img.reshape(b, t, n, 4, 4)

    ones = jnp.ones_like(sample_points[..., :1])
    pts_h = jnp.concatenate([sample_points, ones], axis=-1)  # [B, Q, T, GP, 4]

    # [B, T, N, Q, GP, 4] = l2i @ pts. Geometry must be exact fp32: on TPU the
    # default matmul precision is bf16, which moves pixels by ~0.2% — force
    # full precision for this tiny (j=4) contraction.
    cam = jnp.einsum("btnij,bqtpj->btnqpi", l2i, pts_h,
                     precision=jax.lax.Precision.HIGHEST)

    homo = cam[..., 2:3]
    homo_nonzero = jnp.maximum(homo, eps)
    xy = cam[..., 0:2] / homo_nonzero
    xy = xy / jnp.asarray([image_w, image_h], dtype=xy.dtype)

    valid = ((homo[..., 0] > eps)
             & (xy[..., 0] > 0.0) & (xy[..., 0] < 1.0)
             & (xy[..., 1] > 0.0) & (xy[..., 1] < 1.0)).astype(xy.dtype)
    # [B, T, N, Q, GP] -> choose exactly one view per point
    valid_t = jnp.moveaxis(valid, 2, -1)          # [B, T, Q, GP, N]
    xy_t = jnp.moveaxis(xy, 2, -2)                # [B, T, Q, GP, N, 2]
    view = jnp.argmax(valid_t, axis=-1)           # [B, T, Q, GP]
    xy_sel = jnp.take_along_axis(
        xy_t, view[..., None, None].astype(jnp.int32), axis=-2)[..., 0, :]
    valid_sel = jnp.take_along_axis(valid_t, view[..., None], axis=-1)[..., 0]

    view_coord = view.astype(xy.dtype) / (n - 1)
    loc = jnp.concatenate([xy_sel, view_coord[..., None]], axis=-1)
    return loc, valid_sel


def sampling_4d(sample_points: jnp.ndarray,
                mlvl_feats: Sequence[jnp.ndarray],
                scale_weights: jnp.ndarray,
                lidar2img: jnp.ndarray,
                image_h: int, image_w: int,
                num_views: int = 6,
                eps: float = 1e-5,
                debug_out: Optional[dict] = None) -> jnp.ndarray:
    """Spatio-temporal multi-view sampling (models/sparsebev_sampling.py:27-130).

    Args:
      sample_points: ``[B, Q, T, G, P, 3]`` world-space points.
      mlvl_feats: list of ``[B*T*G, N, H_l, W_l, C]`` channel-last pyramids.
      scale_weights: ``[B, Q, G, T, P, L]`` softmaxed level weights.
      lidar2img: ``[B, T*N, 4, 4]``.
      debug_out: optional dict populated with projection intermediates
        (the DUMP mechanism, models/sparsebev_sampling.py:82-86).
    Returns:
      ``[B, Q, G, T*P, C]`` sampled features (fp32).
    """
    b, q, t, g, p, _ = sample_points.shape
    n = num_views
    num_levels = scale_weights.shape[-1]

    pts = sample_points.reshape(b, q, t, g * p, 3)
    loc, valid = project_points(pts, lidar2img, image_h, image_w, n, eps)

    if debug_out is not None:
        debug_out["sample_points_cam"] = loc
        debug_out["valid_mask"] = valid

    # [B, T, Q, G*P, 3] -> [B*T*G, Q, P, 3]
    loc = loc.reshape(b, t, q, g, p, 3)
    loc = jnp.transpose(loc, (0, 1, 3, 2, 4, 5)).reshape(b * t * g, q, p, 3)

    # [B, Q, G, T, P, L] -> [B*G*T, Q, P, L]  (reference fold order — see
    # the module docstring for why this is (G, T) and not (T, G))
    sw = jnp.transpose(scale_weights, (0, 2, 3, 1, 4, 5))
    sw = sw.reshape(b * g * t, q, p, num_levels)

    from .msmv_sampling import PackedFeatures
    if not isinstance(mlvl_feats, PackedFeatures):
        mlvl_feats = list(mlvl_feats)
    final = msmv_sampling(mlvl_feats, loc, sw)  # [BTG, Q, P, C]

    c = final.shape[-1]
    final = final.reshape(b, t, g, q, p, c)
    final = jnp.transpose(final, (0, 3, 2, 1, 4, 5))  # [B, Q, G, T, P, C]
    return final.reshape(b, q, g, t * p, c)
