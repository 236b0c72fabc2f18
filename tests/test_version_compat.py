"""v0.17.1 checkpoint back-compat: the decode-time w/l+yaw swap
(reference models/sparsebev_head.py:470-478) and its plumbing from
checkpoint tags to the VERSION singleton (reference val.py:128-129)."""

import numpy as np
import jax.numpy as jnp
import pytest

from sparsebev_tpu.bbox.nms_free_coder import NMSFreeCoder
from sparsebev_tpu.ops.box_ops import denormalize_bbox
from sparsebev_tpu.utils.version import VERSION

PC_RANGE = [-51.2, -51.2, -5.0, 51.2, 51.2, 3.0]


@pytest.fixture
def restore_version():
    old = VERSION.name
    yield
    VERSION.name = old


def _random_preds(rng, q=32, c=10):
    cls = rng.standard_normal((1, q, c)).astype(np.float32)
    box = np.concatenate([
        rng.uniform(-30, 30, (1, q, 2)),   # cx cy
        rng.uniform(-1, 1, (1, q, 2)),     # logw logl
        rng.uniform(-3, 1, (1, q, 1)),     # cz
        rng.uniform(-1, 1, (1, q, 1)),     # logh
        rng.uniform(-1, 1, (1, q, 2)),     # sin cos
        rng.uniform(-2, 2, (1, q, 2)),     # vx vy
    ], axis=-1).astype(np.float32)
    return {"all_cls_scores": jnp.asarray(cls[None]),
            "all_bbox_preds": jnp.asarray(box[None])}


def test_v0171_decode_swap(restore_version):
    rng = np.random.default_rng(0)
    preds = _random_preds(rng)
    coder = NMSFreeCoder(PC_RANGE, max_num=16, num_classes=10)

    VERSION.name = "v1.0.0"
    new = {k: np.asarray(v) for k, v in coder.decode(preds).items()}
    VERSION.name = "v0.17.1"
    old = {k: np.asarray(v) for k, v in coder.decode(preds).items()}

    # scores/labels/selection identical; only the box layout changes
    np.testing.assert_array_equal(new["labels"], old["labels"])
    np.testing.assert_allclose(new["scores"], old["scores"], rtol=1e-6)

    # reference formula (sparsebev_head.py:472-476) applied to the new-layout
    # output: swap w<->l, yaw -> -yaw - pi/2
    expect = new["bboxes"].copy()
    expect[..., [3, 4]] = expect[..., [4, 3]]
    expect[..., 6] = -expect[..., 6] - np.pi / 2
    np.testing.assert_allclose(old["bboxes"], expect, rtol=1e-5, atol=1e-5)


def test_v0171_matches_torch_oracle(restore_version):
    """Drive the reference's exact get_bboxes arithmetic in numpy/torch on
    the same denormalized boxes and compare (gravity-centered layout —
    the bottom-center shift cancels out of the comparison)."""
    import torch

    rng = np.random.default_rng(1)
    preds = _random_preds(rng)
    coder = NMSFreeCoder(PC_RANGE, max_num=16, num_classes=10)
    VERSION.name = "v0.17.1"
    ours = np.asarray(coder.decode(preds)["bboxes"])[0]

    # torch oracle: same topk indices, reference swap on denormalized boxes
    cls = torch.from_numpy(np.asarray(preds["all_cls_scores"][-1][0]))
    box = torch.from_numpy(np.asarray(preds["all_bbox_preds"][-1][0]))
    scores = cls.sigmoid().reshape(-1)
    top, idx = scores.topk(16)
    bbox_index = idx // 10
    bboxes = torch.from_numpy(
        np.asarray(denormalize_bbox(jnp.asarray(box.numpy()[bbox_index.numpy()]))))
    w, ln = bboxes[:, 3].clone(), bboxes[:, 4].clone()
    bboxes[:, 3], bboxes[:, 4] = ln, w
    bboxes[:, 6] = -bboxes[:, 6] - np.pi / 2
    np.testing.assert_allclose(ours, bboxes.numpy(), rtol=1e-5, atol=1e-5)


def test_checkpoint_version_roundtrip(tmp_path, restore_version):
    """save_checkpoint stamps VERSION into extra; load restores it."""
    from types import SimpleNamespace
    from sparsebev_tpu.utils.checkpoint_io import (save_checkpoint,
                                                   load_checkpoint)
    VERSION.name = "v0.17.1"
    state = SimpleNamespace(params={"w": np.zeros(2, np.float32)},
                            batch_stats={}, opt_state={"m": np.zeros(2)},
                            step=3)
    path = save_checkpoint(str(tmp_path), 3, state)
    payload = load_checkpoint(path)
    assert payload["extra"]["version"] == "v0.17.1"
