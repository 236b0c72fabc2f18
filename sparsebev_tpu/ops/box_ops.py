"""3D box codecs (pure JAX).

Two box layouts flow through the model (reference:
/root/reference/models/bbox/utils.py:4-77):

- **world boxes** ``[cx, cy, cz, w, l, h, yaw, (vx, vy)]`` — metric
  coordinates; what the dataset provides and what evaluation consumes.
- **normalized boxes** ``[cx, cy, logw, logl, cz, logh, sin, cos, (vx, vy)]``
  — the layout the losses / matcher / NMS-free coder operate on
  (:func:`normalize_bbox` / :func:`denormalize_bbox`).
- **query boxes** ``[x, y, z, logw, logl, logh, sin, cos, vx, vy]`` with xyz
  scaled to [0, 1] by the point-cloud range — the decoder's running state
  (:func:`encode_bbox` / :func:`decode_bbox`).

All functions broadcast over leading dims and are jit/vmap-safe.
"""

from __future__ import annotations

import jax.numpy as jnp


def normalize_bbox(bboxes: jnp.ndarray) -> jnp.ndarray:
    """World box [cx,cy,cz,w,l,h,rot,(vx,vy)] -> loss layout
    [cx,cy,logw,logl,cz,logh,sin,cos,(vx,vy)]."""
    cx = bboxes[..., 0:1]
    cy = bboxes[..., 1:2]
    cz = bboxes[..., 2:3]
    w = jnp.log(bboxes[..., 3:4])
    l = jnp.log(bboxes[..., 4:5])
    h = jnp.log(bboxes[..., 5:6])
    rot = bboxes[..., 6:7]
    parts = [cx, cy, w, l, cz, h, jnp.sin(rot), jnp.cos(rot)]
    if bboxes.shape[-1] > 7:
        parts += [bboxes[..., 7:8], bboxes[..., 8:9]]
    return jnp.concatenate(parts, axis=-1)


def denormalize_bbox(normalized_bboxes: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`normalize_bbox` -> [cx,cy,cz,w,l,h,rot,(vx,vy)]."""
    rot = jnp.arctan2(normalized_bboxes[..., 6:7], normalized_bboxes[..., 7:8])
    cx = normalized_bboxes[..., 0:1]
    cy = normalized_bboxes[..., 1:2]
    cz = normalized_bboxes[..., 4:5]
    w = jnp.exp(normalized_bboxes[..., 2:3])
    l = jnp.exp(normalized_bboxes[..., 3:4])
    h = jnp.exp(normalized_bboxes[..., 5:6])
    parts = [cx, cy, cz, w, l, h, rot]
    if normalized_bboxes.shape[-1] > 8:
        parts += [normalized_bboxes[..., 8:9], normalized_bboxes[..., 9:10]]
    return jnp.concatenate(parts, axis=-1)


def encode_bbox(bboxes: jnp.ndarray, pc_range=None) -> jnp.ndarray:
    """World box -> query layout [x01,y01,z01,logw,logl,logh,sin,cos,(vx,vy)].

    xyz normalized to [0,1] by ``pc_range = [x0,y0,z0,x1,y1,z1]`` when given.
    """
    xyz = bboxes[..., 0:3]
    if pc_range is not None:
        lo = jnp.asarray(pc_range[0:3], dtype=bboxes.dtype)
        hi = jnp.asarray(pc_range[3:6], dtype=bboxes.dtype)
        xyz = (xyz - lo) / (hi - lo)
    wlh = jnp.log(bboxes[..., 3:6])
    rot = bboxes[..., 6:7]
    parts = [xyz, wlh, jnp.sin(rot), jnp.cos(rot)]
    if bboxes.shape[-1] > 7:
        parts.append(bboxes[..., 7:9])
    return jnp.concatenate(parts, axis=-1)


def decode_bbox(bboxes: jnp.ndarray, pc_range=None) -> jnp.ndarray:
    """Query layout -> world box [cx,cy,cz,w,l,h,rot,(vx,vy)]."""
    xyz = bboxes[..., 0:3]
    if pc_range is not None:
        lo = jnp.asarray(pc_range[0:3], dtype=bboxes.dtype)
        hi = jnp.asarray(pc_range[3:6], dtype=bboxes.dtype)
        xyz = xyz * (hi - lo) + lo
    wlh = jnp.exp(bboxes[..., 3:6])
    rot = jnp.arctan2(bboxes[..., 6:7], bboxes[..., 7:8])
    parts = [xyz, wlh, rot]
    if bboxes.shape[-1] > 8:
        parts.append(bboxes[..., 8:10])
    return jnp.concatenate(parts, axis=-1)
