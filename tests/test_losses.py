"""Loss-stack tests: Hungarian vs scipy, focal vs torch reference math,
end-to-end detection loss behavior, DN preparation and loss."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparsebev_tpu.losses import (
    focal_loss, focal_loss_cost, l1_loss,
    hungarian_matching, hungarian_matching_callback,
    compute_detection_loss, prepare_dn_inputs, compute_dn_loss,
)
from sparsebev_tpu.losses.denoising import build_dn_attn_mask
from sparsebev_tpu.bbox import NMSFreeCoder

PC_RANGE = [-51.2, -51.2, -5.0, 51.2, 51.2, 3.0]
CODE_WEIGHTS = [2.0, 2.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0]


# ---------- Hungarian ----------

def test_hungarian_matches_scipy(rng):
    from scipy.optimize import linear_sum_assignment
    for trial in range(10):
        m, q = rng.randint(1, 12), rng.randint(12, 40)
        cost = rng.randn(m, q).astype(np.float32) * 10
        got = np.asarray(hungarian_matching(jnp.asarray(cost[None]),
                                            jnp.ones((1, m), bool)))[0]
        rows, cols = linear_sum_assignment(cost)
        # same total cost (assignment may differ under ties)
        np.testing.assert_allclose(cost[np.arange(m), got].sum(),
                                   cost[rows, cols].sum(), rtol=1e-5)
        assert len(np.unique(got)) == m  # injective


def test_hungarian_with_padding(rng):
    m, q = 8, 20
    cost = rng.randn(m, q).astype(np.float32)
    mask = np.zeros(m, bool)
    mask[:3] = True
    got = np.asarray(hungarian_matching(jnp.asarray(cost[None]),
                                        jnp.asarray(mask[None])))[0]
    from scipy.optimize import linear_sum_assignment
    rows, cols = linear_sum_assignment(cost[:3])
    np.testing.assert_allclose(cost[np.arange(3), got[:3]].sum(),
                               cost[rows, cols].sum(), rtol=1e-5)


def test_hungarian_callback_agrees(rng):
    m, q = 6, 15
    cost = rng.randn(2, m, q).astype(np.float32)
    mask = np.ones((2, m), bool)
    a = np.asarray(hungarian_matching(jnp.asarray(cost), jnp.asarray(mask)))
    b = np.asarray(hungarian_matching_callback(jnp.asarray(cost), jnp.asarray(mask)))
    ca = np.take_along_axis(cost, a[..., None], -1).sum()
    cb = np.take_along_axis(cost, b[..., None], -1).sum()
    np.testing.assert_allclose(ca, cb, rtol=1e-5)


def test_hungarian_jits_and_vmaps(rng):
    cost = jnp.asarray(rng.randn(3, 4, 5, 30).astype(np.float32))
    mask = jnp.ones((3, 4, 5), bool)
    out = jax.jit(hungarian_matching)(cost, mask)
    assert out.shape == (3, 4, 5)


# ---------- focal ----------

def test_focal_loss_matches_torch(rng):
    torch = pytest.importorskip("torch")
    n, c = 40, 10
    logits = rng.randn(n, c).astype(np.float32)
    labels = rng.randint(0, c + 1, n)  # c = background

    got = float(focal_loss(jnp.asarray(logits), jnp.asarray(labels),
                           jnp.ones(n), 7.0, c))

    # mmdet py_sigmoid_focal_loss reimplementation
    t = torch.from_numpy(logits)
    tgt = torch.nn.functional.one_hot(torch.from_numpy(labels), c + 1)[:, :c].float()
    p = t.sigmoid()
    pt = (1 - p) * tgt + p * (1 - tgt)
    fw = (0.25 * tgt + 0.75 * (1 - tgt)) * pt.pow(2.0)
    loss = torch.nn.functional.binary_cross_entropy_with_logits(
        t, tgt, reduction="none") * fw
    want = float(loss.sum() / 7.0)
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_focal_cost_shape(rng):
    cost = focal_loss_cost(jnp.asarray(rng.randn(9, 10).astype(np.float32)),
                           jnp.asarray(rng.randint(0, 10, 4)))
    assert cost.shape == (9, 4)
    assert np.isfinite(np.asarray(cost)).all()


# ---------- detection loss ----------

def _fake_preds_and_gt(rng, layers=2, b=2, q=25, m=5):
    cls = rng.randn(layers, b, q, 10).astype(np.float32)
    box = np.concatenate([
        rng.uniform(-40, 40, (layers, b, q, 2)),
        rng.uniform(-1, 1, (layers, b, q, 2)),
        rng.uniform(-3, 1, (layers, b, q, 1)),
        rng.uniform(-1, 1, (layers, b, q, 3)),
        rng.uniform(-2, 2, (layers, b, q, 2)),
    ], -1).astype(np.float32)
    gt_boxes = np.concatenate([
        rng.uniform(-40, 40, (b, m, 2)),
        rng.uniform(-3, 1, (b, m, 1)),
        rng.uniform(0.5, 4, (b, m, 3)),
        rng.uniform(-np.pi, np.pi, (b, m, 1)),
        rng.uniform(-2, 2, (b, m, 2)),
    ], -1).astype(np.float32)
    gt_labels = rng.randint(0, 10, (b, m)).astype(np.int32)
    gt_mask = np.ones((b, m), bool)
    if b > 1:
        gt_mask[1, 3:] = False
    return cls, box, gt_boxes, gt_labels, gt_mask


def test_detection_loss_keys_and_finite(rng):
    cls, box, gb, gl, gm = _fake_preds_and_gt(rng)
    losses = compute_detection_loss(
        jnp.asarray(cls), jnp.asarray(box), jnp.asarray(gb),
        jnp.asarray(gl), jnp.asarray(gm), 10, CODE_WEIGHTS)
    assert set(losses) == {"loss_cls", "loss_bbox", "d0.loss_cls", "d0.loss_bbox"}
    for v in losses.values():
        assert np.isfinite(float(v)) and float(v) >= 0


def test_detection_loss_perfect_preds_lower_bbox_loss(rng):
    """Predictions placed exactly on GT should yield ~zero bbox loss."""
    from sparsebev_tpu.ops.box_ops import normalize_bbox
    cls, box, gb, gl, gm = _fake_preds_and_gt(rng, layers=1, b=1, q=25, m=5)
    ngt = np.asarray(normalize_bbox(jnp.asarray(gb)))[0]
    box_perfect = box.copy()
    box_perfect[0, 0, :5] = ngt  # first 5 queries sit exactly on the 5 gts
    cls_perfect = np.full_like(cls, -10.0)
    for i in range(5):
        cls_perfect[0, 0, i, gl[0, i]] = 10.0

    l_rand = compute_detection_loss(jnp.asarray(cls), jnp.asarray(box),
                                    jnp.asarray(gb), jnp.asarray(gl),
                                    jnp.asarray(gm), 10, CODE_WEIGHTS)
    l_good = compute_detection_loss(jnp.asarray(cls_perfect), jnp.asarray(box_perfect),
                                    jnp.asarray(gb), jnp.asarray(gl),
                                    jnp.asarray(gm), 10, CODE_WEIGHTS)
    assert float(l_good["loss_bbox"]) < 0.02
    assert float(l_good["loss_cls"]) < float(l_rand["loss_cls"])
    assert float(l_good["loss_bbox"]) < float(l_rand["loss_bbox"])


def test_detection_loss_no_gt(rng):
    cls, box, gb, gl, gm = _fake_preds_and_gt(rng)
    gm[:] = False
    losses = compute_detection_loss(
        jnp.asarray(cls), jnp.asarray(box), jnp.asarray(gb),
        jnp.asarray(gl), jnp.asarray(gm), 10, CODE_WEIGHTS)
    for v in losses.values():
        assert np.isfinite(float(v))


def test_detection_loss_grads(rng):
    cls, box, gb, gl, gm = _fake_preds_and_gt(rng)

    def f(cls_, box_):
        losses = compute_detection_loss(cls_, box_, jnp.asarray(gb),
                                        jnp.asarray(gl), jnp.asarray(gm),
                                        10, CODE_WEIGHTS)
        return sum(losses.values())

    g_cls, g_box = jax.jit(jax.grad(f, argnums=(0, 1)))(jnp.asarray(cls), jnp.asarray(box))
    assert np.isfinite(np.asarray(g_cls)).all() and np.isfinite(np.asarray(g_box)).all()
    assert float(jnp.abs(g_cls).max()) > 0 and float(jnp.abs(g_box).max()) > 0


# ---------- denoising ----------

def test_dn_attn_mask_structure():
    mask = build_dn_attn_mask(num_query=6, max_gt=2, groups=3)
    dn = 6
    # match queries cannot see DN
    assert mask[dn:, :dn].all()
    # match queries see each other
    assert not mask[dn:, dn:].any()
    # group 0 sees itself, not groups 1-2
    assert not mask[0:2, 0:2].any()
    assert mask[0:2, 2:6].all()
    # DN sees match queries (reference leaves this open)
    assert not mask[:dn, dn:].any()


def test_prepare_dn_inputs(rng):
    b, m, g = 2, 4, 3
    _, _, gb, gl, gm = _fake_preds_and_gt(rng, b=b, m=m)
    dn = prepare_dn_inputs(jax.random.PRNGKey(0), jnp.asarray(gb),
                           jnp.asarray(gl), jnp.asarray(gm),
                           num_query=9, num_classes=10, pc_range=PC_RANGE,
                           groups=g)
    assert dn["dn_query_bbox"].shape == (b, g * m, 10)
    assert dn["dn_labels"].shape == (b, g * m)
    assert dn["attn_mask"].shape == (g * m + 9, g * m + 9)
    enc = np.asarray(dn["dn_query_bbox"])
    assert enc[..., :3].min() >= 0 and enc[..., :3].max() <= 1
    # padded slots: zero boxes and background label
    mask = np.asarray(dn["dn_mask"])
    assert (enc[~mask] == 0).all()
    assert (np.asarray(dn["dn_labels"])[~mask] == 10).all()


def test_dn_loss(rng):
    b, m, g, layers = 2, 4, 3, 2
    _, _, gb, gl, gm = _fake_preds_and_gt(rng, b=b, m=m)
    dn_cls = jnp.asarray(rng.randn(layers, b, g * m, 10).astype(np.float32))
    dn_box = jnp.asarray(rng.randn(layers, b, g * m, 10).astype(np.float32))
    losses = compute_dn_loss(dn_cls, dn_box, jnp.asarray(gb), jnp.asarray(gl),
                             jnp.asarray(gm), 10, CODE_WEIGHTS, groups=g)
    assert set(losses) == {"loss_cls_dn", "loss_bbox_dn",
                           "d0.loss_cls_dn", "d0.loss_bbox_dn"}
    for v in losses.values():
        assert np.isfinite(float(v))


# ---------- coder ----------

def test_nms_free_coder(rng):
    q, c, k = 50, 10, 12
    coder = NMSFreeCoder(PC_RANGE, post_center_range=[-61.2, -61.2, -10, 61.2, 61.2, 10],
                         max_num=k, score_threshold=0.05, num_classes=c)
    cls = rng.randn(2, q, c).astype(np.float32)
    box = np.concatenate([
        rng.uniform(-40, 40, (2, q, 2)), rng.uniform(-1, 1, (2, q, 2)),
        rng.uniform(-3, 1, (2, q, 1)), rng.uniform(-1, 1, (2, q, 3)),
        rng.uniform(-2, 2, (2, q, 2))], -1).astype(np.float32)
    out = coder.decode({"all_cls_scores": jnp.asarray(cls[None]),
                        "all_bbox_preds": jnp.asarray(box[None])})
    assert out["bboxes"].shape == (2, k, 9)
    assert out["scores"].shape == (2, k)
    # scores sorted descending
    s = np.asarray(out["scores"])
    assert (np.diff(s, axis=1) <= 1e-6).all()
    # top-1 matches manual argmax
    sig = 1 / (1 + np.exp(-cls[0]))
    assert np.isclose(s[0, 0], sig.max(), atol=1e-5)
