"""Geometry primitives shared across the model and data pipeline.

References:
- ``rotation_3d_in_axis``: /root/reference/models/utils.py:49-84 (two yaw
  conventions gated by checkpoint version).
- ``inverse_sigmoid``: /root/reference/models/utils.py:87-102.
- ``compose_lidar2img``: /root/reference/loaders/pipelines/loading.py:9-32
  (ego-motion-compensated projection of a past camera into the current lidar
  frame); numpy, host-side.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def rotation_3d_in_axis(points: jnp.ndarray, angles: jnp.ndarray,
                        version: str = "v1.0.0") -> jnp.ndarray:
    """Rotate ``points [..., P, 3]`` around the z axis by ``angles [..., 1]``.

    With the default (v1.0.0) convention, a point is right-multiplied by::

        [[ cos,  sin, 0],
         [-sin,  cos, 0],
         [   0,    0, 1]]

    i.e. ``p @ R_T`` — a counter-clockwise rotation of the point by ``angle``.
    ``version='v0.17.1'`` flips the sine signs for old-checkpoint compat.
    """
    angles = angles[..., 0]  # [...]
    rot_sin = jnp.sin(angles)
    rot_cos = jnp.cos(angles)
    if version == "v0.17.1":
        rot_sin = -rot_sin
    # p @ R_T written elementwise: exact fp32 on the VPU, no MXU roundoff
    # (a 3x3 contraction on the MXU would go through bf16 by default).
    c = rot_cos[..., None]  # [..., 1] broadcasting over P
    s = rot_sin[..., None]
    px, py, pz = points[..., 0], points[..., 1], points[..., 2]
    out_x = px * c - py * s
    out_y = px * s + py * c
    return jnp.stack([out_x, out_y, pz], axis=-1)


def inverse_sigmoid(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Numerically-clamped logit."""
    x = jnp.clip(x, 0.0, 1.0)
    x1 = jnp.clip(x, eps, None)
    x2 = jnp.clip(1.0 - x, eps, None)
    return jnp.log(x1 / x2)


def compose_lidar2img(ego2global_translation_curr,
                      ego2global_rotation_curr,
                      lidar2ego_translation_curr,
                      lidar2ego_rotation_curr,
                      sensor2global_translation_past,
                      sensor2global_rotation_past,
                      cam_intrinsic_past) -> np.ndarray:
    """4x4 matrix projecting current-keyframe lidar points into a (possibly
    past/future) camera image. Host-side numpy; used by the sweep loaders.

    Derivation: map lidar -> current ego -> global with the current pose,
    then global -> past camera with the past sensor pose, then apply the
    camera intrinsics. Returns the combined row-vector-convention matrix
    ``lidar2img`` such that ``pix_homo = lidar2img @ [x, y, z, 1]^T``.
    """
    e2g_r = np.asarray(ego2global_rotation_curr, dtype=np.float64)
    l2e_r = np.asarray(lidar2ego_rotation_curr, dtype=np.float64)
    e2g_t = np.asarray(ego2global_translation_curr, dtype=np.float64)
    l2e_t = np.asarray(lidar2ego_translation_curr, dtype=np.float64)
    s2g_r = np.asarray(sensor2global_rotation_past, dtype=np.float64)
    s2g_t = np.asarray(sensor2global_translation_past, dtype=np.float64)
    intrinsic = np.asarray(cam_intrinsic_past, dtype=np.float64)

    inv = np.linalg.inv
    # R, T express the past sensor pose in the current lidar frame.
    m = inv(e2g_r).T @ inv(l2e_r).T
    r = s2g_r @ m
    t = s2g_t @ m - (e2g_t @ m + l2e_t @ inv(l2e_r).T)

    lidar2cam_r = inv(r.T)
    lidar2cam_t = t @ lidar2cam_r.T

    lidar2cam_rt = np.eye(4)
    lidar2cam_rt[:3, :3] = lidar2cam_r.T
    lidar2cam_rt[3, :3] = -lidar2cam_t

    viewpad = np.eye(4)
    viewpad[:intrinsic.shape[0], :intrinsic.shape[1]] = intrinsic
    lidar2img = (viewpad @ lidar2cam_rt.T).astype(np.float32)
    return lidar2img
