"""sampling_4d parity vs a torch re-implementation of the reference path
(/root/reference/models/sparsebev_sampling.py:27-130): homogeneous
projection, z-clip, argmax single-view selection, per-level grid_sample,
level-weighted sum and the (B, Q, G, T*P, C) output fold."""

import jax.numpy as jnp
import numpy as np
import pytest

from sparsebev_tpu.ops import make_sample_points, sampling_4d
from sparsebev_tpu.ops.projection import project_points

B, Q, T, G, P, N, C = 1, 7, 2, 2, 3, 6, 8
IMAGE_H, IMAGE_W = 64, 176
LEVEL_SHAPES = [(16, 44), (8, 22)]
PC_RANGE = [-51.2, -51.2, -5.0, 51.2, 51.2, 3.0]


def _make_cameras(rng):
    """Six outward-facing pinhole cameras at the origin."""
    mats = []
    for i in range(N):
        yaw = 2 * np.pi * i / N + rng.uniform(-0.1, 0.1)
        # world->cam: cam looks along +x rotated by yaw; cam z = forward
        cy, sy = np.cos(yaw), np.sin(yaw)
        r_wc = np.array([[-sy, cy, 0.0],    # cam x (right)
                         [0.0, 0.0, -1.0],  # cam y (down)
                         [cy, sy, 0.0]])    # cam z (forward)
        t = rng.uniform(-0.5, 0.5, 3)
        rt = np.eye(4)
        rt[:3, :3] = r_wc
        rt[:3, 3] = -r_wc @ t
        k = np.eye(4)
        f = IMAGE_W * 0.8
        k[0, 0], k[1, 1] = f, f
        k[0, 2], k[1, 2] = IMAGE_W / 2, IMAGE_H / 2
        mats.append((k @ rt).astype(np.float32))
    return np.stack(mats)  # [N, 4, 4]


def _torch_sampling_4d(sample_points, mlvl_feats_nchw, scale_weights, lidar2img):
    """Line-by-line torch port of the reference sampling_4d + pytorch fallback."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    sp = torch.from_numpy(sample_points)       # [B, Q, T, G, P, 3]
    sw = torch.from_numpy(scale_weights)       # [B, Q, G, T, P, L]
    l2i = torch.from_numpy(lidar2img)          # [B, T*N, 4, 4]
    eps = 1e-5

    b, q, t, g, p, _ = sp.shape
    sp = sp.reshape(b, q, t, g * p, 3)
    l2i = l2i[:, :, None, None, :, :].expand(b, t * N, q, g * p, 4, 4)
    l2i = l2i.reshape(b, t, N, q, g * p, 4, 4)

    ones = torch.ones_like(sp[..., :1])
    sp = torch.cat([sp, ones], dim=-1)
    sp = sp[:, :, None, ..., None]
    sp = sp.expand(b, q, N, t, g * p, 4, 1)
    sp = sp.transpose(1, 3)
    cam = torch.matmul(l2i, sp).squeeze(-1)    # [B, T, N, Q, GP, 4]

    homo = cam[..., 2:3]
    homo_nz = torch.maximum(homo, torch.zeros_like(homo) + eps)
    cam = cam[..., 0:2] / homo_nz
    cam[..., 0] /= IMAGE_W
    cam[..., 1] /= IMAGE_H
    valid = ((homo > eps)
             & (cam[..., 1:2] > 0.0) & (cam[..., 1:2] < 1.0)
             & (cam[..., 0:1] > 0.0) & (cam[..., 0:1] < 1.0)).squeeze(-1).float()

    valid = valid.permute(0, 1, 3, 4, 2)       # [B, T, Q, GP, N]
    cam = cam.permute(0, 1, 3, 4, 2, 5)        # [B, T, Q, GP, N, 2]
    i_view = torch.argmax(valid, dim=-1)[..., None]
    cam = torch.gather(cam, 4, i_view[..., None].expand(b, t, q, g * p, 1, 2))
    cam = torch.cat([cam, i_view[..., None].float() / (N - 1)], dim=-1)  # [B,T,Q,GP,1,3]

    cam = cam.reshape(b, t, q, g, p, 1, 3).permute(0, 1, 3, 2, 4, 5, 6)
    cam = cam.reshape(b * t * g, q, p, 3)

    sw = sw.reshape(b, q, g, t, p, -1).permute(0, 2, 3, 1, 4, 5)
    sw = sw.reshape(b * g * t, q, p, -1)

    # pytorch fallback msmv (wrapper.py:14-38); feats [BTG, C, N, H, W]
    loc = cam * 2 - 1
    loc = loc[:, :, :, None, :]
    final = torch.zeros(b * t * g, C, q, p)
    for lvl, f in enumerate(mlvl_feats_nchw):
        out = F.grid_sample(torch.from_numpy(f), loc, mode="bilinear",
                            padding_mode="zeros", align_corners=True)[..., 0]
        final += out * sw[..., lvl].reshape(b * t * g, 1, q, p)

    final = final.permute(0, 2, 1, 3)  # [BTG, Q, C, P] (wrapper.py:38)
    final = final.reshape(b, t, g, q, C, p).permute(0, 3, 2, 1, 5, 4)
    return final.flatten(3, 4).numpy()  # [B, Q, G, T*P, C]


def test_sampling_4d_parity(rng):
    cams = _make_cameras(rng)
    lidar2img = np.tile(cams[None], (B, T, 1, 1)).reshape(B, T * N, 4, 4)
    pts = rng.uniform(-30, 30, (B, Q, T, G, P, 3)).astype(np.float32)
    pts[..., 2] = rng.uniform(-2, 2, (B, Q, T, G, P))
    # weights constant across T (as produced by the model: expand over frames)
    sw = rng.rand(B, Q, G, 1, P, len(LEVEL_SHAPES)).astype(np.float32)
    sw = sw / sw.sum(-1, keepdims=True)
    sw = np.tile(sw, (1, 1, 1, T, 1, 1))
    feats = [rng.randn(B * T * G, N, h, w, C).astype(np.float32)
             for h, w in LEVEL_SHAPES]

    want = _torch_sampling_4d(
        pts, [np.transpose(f, (0, 4, 1, 2, 3)) for f in feats], sw, lidar2img)
    got = np.asarray(sampling_4d(
        jnp.asarray(pts), [jnp.asarray(f) for f in feats], jnp.asarray(sw),
        jnp.asarray(lidar2img), IMAGE_H, IMAGE_W, num_views=N))

    assert got.shape == (B, Q, G, T * P, C)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_project_points_validity(rng):
    cams = _make_cameras(rng)
    lidar2img = np.tile(cams[None], (B, T, 1, 1)).reshape(B, T * N, 4, 4)
    pts = rng.uniform(-30, 30, (B, Q, T, G * P, 3)).astype(np.float32)
    loc, valid = project_points(jnp.asarray(pts), jnp.asarray(lidar2img),
                                IMAGE_H, IMAGE_W, num_views=N)
    loc, valid = np.asarray(loc), np.asarray(valid)
    assert loc.shape == (B, T, Q, G * P, 3)
    # wherever valid, x/y must be inside (0, 1)
    inside = (loc[..., 0] > 0) & (loc[..., 0] < 1) & (loc[..., 1] > 0) & (loc[..., 1] < 1)
    assert np.all(inside[valid > 0.5])
    # a reasonable share of random points around 6 ring cameras should land
    # in some view (the synthetic cameras have a narrow vertical FOV)
    assert valid.mean() > 0.05


def test_make_sample_points_zero_offset_is_center(rng):
    qb = np.zeros((1, 4, 10), dtype=np.float32)
    qb[..., 0:3] = rng.rand(1, 4, 3)
    qb[..., 3:6] = 0.0  # log extent 0 -> 1m
    qb[..., 7] = 1.0    # cos=1 -> yaw 0
    off = np.zeros((1, 4, 5, 3), dtype=np.float32)
    pts = np.asarray(make_sample_points(jnp.asarray(qb), jnp.asarray(off), PC_RANGE))
    # all points sit at the decoded box center
    lo = np.array(PC_RANGE[:3])
    hi = np.array(PC_RANGE[3:])
    want = qb[..., 0:3] * (hi - lo) + lo
    np.testing.assert_allclose(pts, np.broadcast_to(want[:, :, None, :], pts.shape),
                               rtol=1e-4, atol=1e-4)
