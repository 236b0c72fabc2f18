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
    # Reference reads the global VERSION inside rotation_3d_in_axis
    # (models/utils.py:66-77); read at trace time — set VERSION from the
    # checkpoint before jitting the forward.
    from ..utils.version import VERSION
    delta_xyz = rotation_3d_in_axis(delta_xyz, ang, version=VERSION.name)
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
    k = q * gp
    l2i = lidar2img.reshape(b, t, n, 4, 4)

    # points-major layout [B, T, K, 4]: the per-point (N, 4) camera results
    # then live on the two MINOR axes, so the divide/validity/argmax/select
    # chain below fuses on the VPU instead of degenerating into transposed
    # copies (measured 1.2 ms/layer on v5e with the [B,T,N,Q,GP] layout).
    pts = jnp.transpose(sample_points, (0, 2, 1, 3, 4)).reshape(b, t, k, 3)

    # cam[b,t,k,n,i] = sum_j l2i[b,t,n,i,j] * pts_h[b,t,k,j]. Geometry must
    # be exact fp32, and a dot_general here forces a pathological 4-wide
    # column-major operand relayout (see project_points_qmajor) — unroll
    # the j=4 contraction as fp32 multiply-adds instead.
    l2ib = l2i[:, :, None]                       # [B, T, 1, N, 4, 4]
    ptsb = pts[:, :, :, None]                    # [B, T, K, 1, 3]
    cam = (l2ib[..., 0] * ptsb[..., 0:1]
           + l2ib[..., 1] * ptsb[..., 1:2]
           + l2ib[..., 2] * ptsb[..., 2:3]
           + l2ib[..., 3])                       # [B, T, K, N, 4]

    homo = cam[..., 2]                                     # [B, T, K, N]
    homo_nonzero = jnp.maximum(homo, eps)
    xy = cam[..., 0:2] / homo_nonzero[..., None]
    xy = xy / jnp.asarray([image_w, image_h], dtype=xy.dtype)

    valid = ((homo > eps)
             & (xy[..., 0] > 0.0) & (xy[..., 0] < 1.0)
             & (xy[..., 1] > 0.0) & (xy[..., 1] < 1.0))    # [B, T, K, N]
    # choose exactly one view per point (first valid, argmax trick); the
    # select is a one-hot contraction over N — a clean elementwise fusion
    view = jnp.argmax(valid, axis=-1)                      # [B, T, K]
    onehot = (jnp.arange(n, dtype=jnp.int32) == view[..., None])
    xy_sel = jnp.sum(xy * onehot[..., None], axis=-2)      # [B, T, K, 2]
    valid_sel = jnp.sum(valid & onehot, axis=-1).astype(xy.dtype)

    view_coord = view.astype(xy.dtype) / (n - 1)
    loc = jnp.concatenate([xy_sel, view_coord[..., None]], axis=-1)
    loc = loc.reshape(b, t, q, gp, 3)
    return loc, valid_sel.reshape(b, t, q, gp)


def project_points_qmajor(pts_q: jnp.ndarray,
                          lidar2img: jnp.ndarray,
                          image_h: int, image_w: int,
                          num_views: int = 6,
                          eps: float = 1e-5):
    """Query-major variant of :func:`project_points` — same math, but the
    points arrive (and the locations leave) already in the decoder's
    (q, b, g, t, p) memory order, so the final fold into the gather layout
    is a pure reshape instead of a 6D transpose (~0.9 ms/sample at
    r50-900q, r3 profile).

    pts_q: ``[Q, B, G, T, P, 3]``. Returns loc ``[Q, B*G*T, P, 3]`` and
    valid ``[Q, B*G*T, P]``.
    """
    qq, b, g, t, p, _ = pts_q.shape
    n = num_views
    l2i = lidar2img.reshape(b, t, n, 4, 4)
    # The j=4 contraction as explicit fp32 multiply-adds instead of a dot:
    # the einsum form (HIGHEST-precision dot_general) materialized the
    # points operand as f32[K,4]{0,1} (4-wide column-major), and the
    # relayout copy+reshape into that layout cost ~0.63 ms/sample at
    # r50-900q (r4 profile: copy.1432 + reshape.10029). The unrolled j-sum
    # is the same fp32 multiply-add math with no dot operand layout
    # constraints (j=4 does zero useful MXU work anyway) — A/B'd
    # 2026-08-19 on v5e: 23.31 vs 23.19 FPS e2e.
    l2ib = l2i[None, :, None, :, None]          # [1,b,1,t,1,n,4,4]
    cam = (l2ib[..., 0] * pts_q[..., None, None, 0]
           + l2ib[..., 1] * pts_q[..., None, None, 1]
           + l2ib[..., 2] * pts_q[..., None, None, 2]
           + l2ib[..., 3])                       # [q,b,g,t,p,n,4]

    homo = cam[..., 2]
    homo_nonzero = jnp.maximum(homo, eps)
    xy = cam[..., 0:2] / homo_nonzero[..., None]
    xy = xy / jnp.asarray([image_w, image_h], dtype=xy.dtype)
    valid = ((homo > eps)
             & (xy[..., 0] > 0.0) & (xy[..., 0] < 1.0)
             & (xy[..., 1] > 0.0) & (xy[..., 1] < 1.0))
    view = jnp.argmax(valid, axis=-1)
    onehot = (jnp.arange(n, dtype=jnp.int32) == view[..., None])
    xy_sel = jnp.sum(xy * onehot[..., None], axis=-2)
    valid_sel = jnp.sum(valid & onehot, axis=-1).astype(xy.dtype)
    view_coord = view.astype(xy.dtype) / (n - 1)
    loc = jnp.concatenate([xy_sel, view_coord[..., None]], axis=-1)
    return (loc.reshape(qq, b * g * t, p, 3),
            valid_sel.reshape(qq, b * g * t, p))


def sampling_4d(sample_points: Optional[jnp.ndarray],
                mlvl_feats: Sequence[jnp.ndarray],
                scale_weights: jnp.ndarray,
                lidar2img: jnp.ndarray,
                image_h: int, image_w: int,
                num_views: int = 6,
                eps: float = 1e-5,
                debug_out: Optional[dict] = None,
                sample_points_q: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Spatio-temporal multi-view sampling (models/sparsebev_sampling.py:27-130).

    Args:
      sample_points: ``[B, Q, T, G, P, 3]`` world-space points (may be None
        when ``sample_points_q`` is given).
      mlvl_feats: list of ``[B*T*G, N, H_l, W_l, C]`` channel-last pyramids.
      scale_weights: ``[B, Q, G, T, P, L]`` softmaxed level weights.
      lidar2img: ``[B, T*N, 4, 4]``.
      debug_out: optional dict populated with projection intermediates
        (the DUMP mechanism, models/sparsebev_sampling.py:82-86).
      sample_points_q: optional ``[Q, B, G, T, P, 3]`` query-major points —
        the fast path: callers that BUILD the points in this order (the
        decoder) skip the loc 6D transpose entirely
        (:func:`project_points_qmajor`).
    Returns:
      ``[B, Q, G, T*P, C]`` sampled features, in the sampling accumulator
      dtype (the table dtype — bf16 for bf16 configs; see
      ``msmv_sampling.table_acc_dtype``).
    """
    n = num_views
    num_levels = scale_weights.shape[-1]

    if sample_points_q is not None:
        q, b, g, t, p, _ = sample_points_q.shape
        loc, valid = project_points_qmajor(sample_points_q, lidar2img,
                                           image_h, image_w, n, eps)
        if debug_out is not None:
            # debug consumers expect the [B, T, Q, GP] order
            lv = loc.reshape(q, b, g, t, p, 3)
            debug_out["sample_points_cam"] = jnp.transpose(
                lv, (1, 3, 0, 2, 4, 5)).reshape(b, t, q, g * p, 3)
            debug_out["valid_mask"] = jnp.transpose(
                valid.reshape(q, b, g, t, p), (1, 3, 0, 2, 4)
            ).reshape(b, t, q, g * p)
    else:
        b, q, t, g, p, _ = sample_points.shape
        pts = sample_points.reshape(b, q, t, g * p, 3)
        loc, valid = project_points(pts, lidar2img, image_h, image_w, n, eps)
        if debug_out is not None:
            debug_out["sample_points_cam"] = loc
            debug_out["valid_mask"] = valid

    from .msmv_sampling import (PackedFeatures, pack_mlvl_feats_grouped,
                                get_sampling_impl)
    if not isinstance(mlvl_feats, PackedFeatures):
        if get_sampling_impl() == "hybrid":
            # ADVICE r2: the grouped query-major pack has no MXU tables, so
            # the experimental hybrid impl is unreachable from the model
            # path — surface that instead of silently using "xla"
            # (hybrid remains reachable via direct msmv_sampling calls on
            # pack_mlvl_feats output; see ops/msmv_pallas.py STATUS).
            import warnings
            warnings.warn(
                "set_sampling_impl('hybrid') has no effect on sampling_4d's "
                "grouped pack path; using the XLA y-fold gather",
                stacklevel=2)
        mlvl_feats = pack_mlvl_feats_grouped(list(mlvl_feats), n,
                                             num_groups=1)

    # QUERY-MAJOR point order (b, q, g, t, p): the sampled features then
    # reshape straight into the mixing layout [B*Q, G, T*P, C] — no
    # feature-domain 6D transpose (a ~30 MB relayout per decoder layer);
    # the transposes happen on the 3-float locations / L-float weights.
    # [B, T, Q, G, P, 3] -> [Q, B, G, T, P, 3] -> [Q, B*G*T, P, 3]
    if sample_points_q is None:
        loc = loc.reshape(b, t, q, g, p, 3)
        loc = jnp.transpose(loc, (2, 0, 3, 1, 4, 5)).reshape(
            q, b * g * t, p, 3)

    # weight pairing preserves the reference's (B, G, T) fold quirk (module
    # docstring): loc slice (g, t) — whose reference flat position within a
    # sample is j = t*G + g — takes the weights at flat position j of the
    # (G, T)-folded weights, i.e. sw[b, j // T, j % T].
    jmat = (jnp.arange(t)[None, :] * g
            + jnp.arange(g)[:, None])                 # [G, T]: j = t*G + g
    swf = scale_weights.reshape(b, q, g * t, p, num_levels)
    sw = jnp.take(swf, jmat.reshape(-1), axis=2)      # [B, Q, G*T, P, L]
    sw = jnp.transpose(sw, (1, 0, 2, 3, 4)).reshape(q, b * g * t, p,
                                                    num_levels)

    # slice values for (b, g, t) point order: the packed slice space is
    # (b, t, g)-ordered (g minor) regardless of how the tables were built,
    # composed with any ring slot indirection
    logical = ((jnp.arange(b, dtype=jnp.int32)[:, None, None] * t
                + jnp.arange(t, dtype=jnp.int32)[None, None, :]) * g
               + jnp.arange(g, dtype=jnp.int32)[None, :, None])  # [B, G, T]
    logical = logical.reshape(b * g * t)
    if mlvl_feats.slice_map is not None:
        logical = jnp.take(mlvl_feats.slice_map, logical)
    packed = PackedFeatures(
        mlvl_feats.tables, b * g * t, mlvl_feats.num_views,
        mlvl_feats.level_shapes, mlvl_feats.channels,
        mxu_tables=mlvl_feats.mxu_tables, num_groups=mlvl_feats.num_groups,
        slice_map=logical, yfold=mlvl_feats.yfold,
        # slice axis here is (b, g, t): position s -> group (s // t) % g
        # (group-split levels partition by this STATIC pattern; see
        # PackedFeatures.slice_groups)
        slice_groups=tuple((s // t) % g for s in range(b * g * t)))

    final = msmv_sampling(packed, loc, sw, qmajor=True)  # [Q, BGT, P, C]

    c = final.shape[-1]
    final = final.reshape(q, b, g, t * p, c)
    return jnp.transpose(final, (1, 0, 2, 3, 4))  # [B, Q, G, T*P, C]
