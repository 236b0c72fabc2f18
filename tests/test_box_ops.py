import numpy as np
import jax.numpy as jnp
import pytest

from sparsebev_tpu.ops import (
    normalize_bbox, denormalize_bbox, encode_bbox, decode_bbox,
    rotation_3d_in_axis, inverse_sigmoid,
)

PC_RANGE = [-51.2, -51.2, -5.0, 51.2, 51.2, 3.0]


def test_normalize_denormalize_roundtrip(rng):
    boxes = np.concatenate([
        rng.uniform(-50, 50, (7, 3)),      # cx cy cz
        rng.uniform(0.5, 5.0, (7, 3)),     # w l h
        rng.uniform(-np.pi, np.pi, (7, 1)),  # yaw
        rng.uniform(-3, 3, (7, 2)),        # vx vy
    ], axis=-1).astype(np.float32)
    norm = normalize_bbox(jnp.asarray(boxes))
    assert norm.shape == (7, 10)
    rec = denormalize_bbox(norm)
    np.testing.assert_allclose(np.asarray(rec), boxes, rtol=1e-4, atol=1e-4)


def test_normalize_layout_golden():
    # layout contract: [cx, cy, logw, logl, cz, logh, sin, cos, vx, vy]
    box = jnp.asarray([[1.0, 2.0, 3.0, np.e, np.e**2, np.e**3, np.pi / 2, 4.0, 5.0]])
    norm = np.asarray(normalize_bbox(box))
    np.testing.assert_allclose(
        norm[0], [1, 2, 1, 2, 3, 3, 1, 0, 4, 5], rtol=1e-4, atol=1e-4)


def test_encode_decode_roundtrip(rng):
    boxes = np.concatenate([
        rng.uniform(-50, 50, (5, 2)),
        rng.uniform(-4, 2, (5, 1)),
        rng.uniform(0.5, 5.0, (5, 3)),
        rng.uniform(-np.pi, np.pi, (5, 1)),
        rng.uniform(-3, 3, (5, 2)),
    ], axis=-1).astype(np.float32)
    enc = encode_bbox(jnp.asarray(boxes), PC_RANGE)
    assert enc.shape == (5, 10)
    # xyz must be in [0, 1]
    assert np.asarray(enc)[:, :3].min() >= 0 and np.asarray(enc)[:, :3].max() <= 1
    dec = decode_bbox(enc, PC_RANGE)
    np.testing.assert_allclose(np.asarray(dec), boxes, rtol=1e-3, atol=1e-3)


def test_rotation_golden():
    # rotate (1, 0, 0) by +90deg with the v1.0.0 convention: p @ R_T
    pts = jnp.asarray([[[1.0, 0.0, 0.0]]])
    ang = jnp.asarray([[np.pi / 2]])
    out = np.asarray(rotation_3d_in_axis(pts, ang))
    # p @ [[cos, sin, 0], [-sin, cos, 0], [0,0,1]] = (cos, sin, 0)
    np.testing.assert_allclose(out[0, 0], [0.0, 1.0, 0.0], atol=1e-6)
    # v0.17.1 flips the sign
    out_old = np.asarray(rotation_3d_in_axis(pts, ang, version="v0.17.1"))
    np.testing.assert_allclose(out_old[0, 0], [0.0, -1.0, 0.0], atol=1e-6)


def test_rotation_matches_torch_reference(rng):
    torch = pytest.importorskip("torch")
    pts = rng.randn(4, 6, 5, 3).astype(np.float32)
    ang = rng.uniform(-np.pi, np.pi, (4, 6, 1)).astype(np.float32)

    # reference re-implementation (models/utils.py:49-84, v1.0.0 branch)
    tp = torch.from_numpy(pts).reshape(-1, 5, 3)
    ta = torch.from_numpy(ang).reshape(-1)
    rs, rc = torch.sin(ta), torch.cos(ta)
    ones, zeros = torch.ones_like(rc), torch.zeros_like(rc)
    rot_t = torch.stack([rc, rs, zeros, -rs, rc, zeros, zeros, zeros, ones]
                        ).transpose(0, 1).reshape(-1, 3, 3)
    want = torch.bmm(tp, rot_t).reshape(4, 6, 5, 3).numpy()

    got = np.asarray(rotation_3d_in_axis(jnp.asarray(pts), jnp.asarray(ang)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_inverse_sigmoid():
    x = jnp.asarray([0.0, 0.25, 0.5, 0.75, 1.0])
    y = np.asarray(inverse_sigmoid(x))
    # midpoint exact, clamped at the ends
    np.testing.assert_allclose(y[2], 0.0, atol=1e-6)
    assert y[0] == pytest.approx(np.log(1e-5 / 1.0), rel=1e-3)
    # roundtrip through sigmoid away from the clamp region
    x_mid = jnp.asarray([0.1, 0.4, 0.9])
    rec = 1 / (1 + np.exp(-np.asarray(inverse_sigmoid(x_mid))))
    np.testing.assert_allclose(rec, np.asarray(x_mid), rtol=1e-4)
