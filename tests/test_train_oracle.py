"""Composed TRAINING-side torch oracle (VERDICT r3 missing #3).

The inference pipeline has an image->boxes torch oracle
(test_full_model_oracle.py); this is its loss-stack mirror: a faithful
torch re-implementation of the reference's training loss composition —
Hungarian assignment (focal cls cost + weighted L1 reg cost,
/root/reference/models/bbox/assigners/hungarian_assigner_3d.py:27-90) ->
target build (/root/reference/models/sparsebev_head.py:300-347) ->
per-layer focal + L1 (sparsebev_head.py:349-404) -> DN reconstruction loss
(sparsebev_head.py:224-299) — evaluated on identical tiny inputs against
``losses.compute_detection_loss`` + ``losses.compute_dn_loss`` (the exact
functions ``train/step.py`` sums into the training objective). Asserts
every per-layer loss key AND the input-gradients of the total to fp32
tolerance, so a silently-wrong loss composition cannot survive.

Conventions mirrored from the reference head (verified against the source):
- assigner called with with_velo=True and code_weights -> reg cost over all
  10 normalized dims (sparsebev_head.py:309).
- cls_avg_factor = num_total_pos (+ num_total_neg * bg_cls_weight, and
  bg_cls_weight = 0 since the config sets no class_weight); bbox avg_factor
  = clamp(num_total_pos, min=1). Single-process, so reduce_mean = identity.
- negative rows get normalize_bbox(zeros) = -inf logs; the reference drops
  them via the isnotnan filter, which equals our zero-weight scatter.
- DN: targets are the ORIGINAL boxes/labels tiled over groups; only slots
  of valid GT are supervised; avg = total valid*groups (clamped to 1).
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # full-pipeline tier: see conftest

import jax
import jax.numpy as jnp

from sparsebev_tpu.losses import compute_detection_loss, compute_dn_loss

torch = pytest.importorskip("torch")

C = 10                # classes
CODE_WEIGHTS = [2.0, 2.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0]
LOSS_CLS_W = 2.0      # configs/r50_nuimg_704x256.py:93-99
LOSS_BBOX_W = 0.25
GROUPS = 2


# ---------------- torch reference math (oracle) ----------------

def t_normalize_bbox(b):
    """/root/reference/models/bbox/utils.py:4-20 (9 -> 10 dims)."""
    return torch.cat([b[..., 0:2], b[..., 3:5].log(), b[..., 2:3],
                      b[..., 5:6].log(), b[..., 6:7].sin(),
                      b[..., 6:7].cos(), b[..., 7:9]], dim=-1)


def t_focal_loss(logits, labels, label_weights, avg_factor):
    """mmdet py_sigmoid_focal_loss (gamma 2, alpha .25), hard labels with
    C = background."""
    tgt = torch.nn.functional.one_hot(labels, C + 1)[:, :C].float()
    p = logits.sigmoid()
    pt = (1 - p) * tgt + p * (1 - tgt)
    fw = (0.25 * tgt + 0.75 * (1 - tgt)) * pt.pow(2.0)
    loss = torch.nn.functional.binary_cross_entropy_with_logits(
        logits, tgt, reduction="none") * fw
    return (loss.sum(-1) * label_weights).sum() / avg_factor


def t_focal_cost(logits, gt_labels, weight=2.0, eps=1e-12):
    """mmdet FocalLossCost (matching cost, detached by the assigner)."""
    p = logits.sigmoid()
    neg = -(1 - p + eps).log() * 0.75 * p.pow(2.0)
    pos = -(p + eps).log() * 0.25 * (1 - p).pow(2.0)
    return (pos[:, gt_labels] - neg[:, gt_labels]) * weight


def t_assign(bbox_pred, cls_pred, gt_boxes, gt_labels, code_weights):
    """hungarian_assigner_3d.py:27-90 with with_velo=True: returns the
    matched query index per gt (row i of gt -> query col)."""
    from scipy.optimize import linear_sum_assignment
    with torch.no_grad():
        cls_cost = t_focal_cost(cls_pred, gt_labels)
        ngt = t_normalize_bbox(gt_boxes) * code_weights
        pred_w = bbox_pred * code_weights
        reg_cost = (pred_w[:, None, :] - ngt[None, :, :]).abs().sum(-1) * 0.25
        cost = torch.nan_to_num(cls_cost + reg_cost, nan=100.0,
                                posinf=100.0, neginf=-100.0)
        rows, cols = linear_sum_assignment(cost.numpy())
        # rows = query idx, cols = gt idx (Q >= M here)
        q_of_gt = np.empty(gt_boxes.shape[0], np.int64)
        q_of_gt[cols] = rows
    return torch.from_numpy(q_of_gt)


def t_loss_single(cls_scores, bbox_preds, gt_list, gl_list, code_weights):
    """sparsebev_head.py:349-404 for ONE decoder layer over the batch."""
    b, q, _ = cls_scores.shape
    labels, bbox_targets, bbox_weights = [], [], []
    num_total_pos = 0
    for i in range(b):
        lab = torch.full((q,), C, dtype=torch.long)
        tgt = torch.zeros(q, 9)
        w = torch.zeros(q, 10)
        if len(gl_list[i]):
            q_of_gt = t_assign(bbox_preds[i], cls_scores[i], gt_list[i],
                               gl_list[i], code_weights)
            lab[q_of_gt] = gl_list[i]
            tgt[q_of_gt] = gt_list[i]
            w[q_of_gt] = 1.0
            num_total_pos += len(gl_list[i])
        labels.append(lab)
        bbox_targets.append(tgt)
        bbox_weights.append(w)
    labels = torch.cat(labels)
    bbox_targets = torch.cat(bbox_targets)
    bbox_weights = torch.cat(bbox_weights) * code_weights

    cls_avg_factor = max(num_total_pos * 1.0, 1)  # bg_cls_weight = 0
    loss_cls = t_focal_loss(cls_scores.reshape(-1, C), labels,
                            torch.ones(b * q), cls_avg_factor) * LOSS_CLS_W

    norm_tgt = t_normalize_bbox(bbox_targets)
    isnotnan = torch.isfinite(norm_tgt).all(dim=-1)
    npos = max(float(num_total_pos), 1.0)
    pred = bbox_preds.reshape(-1, 10)
    loss_bbox = ((pred[isnotnan] - norm_tgt[isnotnan]).abs()
                 * bbox_weights[isnotnan]).sum() / npos * LOSS_BBOX_W
    return torch.nan_to_num(loss_cls), torch.nan_to_num(loss_bbox)


def t_dn_loss_single(cls_scores, bbox_preds, gt_list, gl_list, code_weights):
    """sparsebev_head.py:224-299 for ONE layer: DN slots laid out
    [B, GROUPS*M] with slot (g, i) supervising gt i; only valid gt rows are
    'known'."""
    b = cls_scores.shape[0]
    m = cls_scores.shape[1] // GROUPS
    known_cls, known_box, known_labels, known_gt = [], [], [], []
    for i in range(b):
        n = len(gl_list[i])
        for g in range(GROUPS):
            sl = slice(g * m, g * m + n)
            known_cls.append(cls_scores[i, sl])
            known_box.append(bbox_preds[i, sl])
            known_labels.append(gl_list[i])
            known_gt.append(gt_list[i])
    known_cls = torch.cat(known_cls)
    known_box = torch.cat(known_box)
    known_labels = torch.cat(known_labels)
    known_gt = torch.cat(known_gt)
    num_tgt = max(float(known_labels.numel()), 1.0)

    loss_cls = t_focal_loss(known_cls, known_labels,
                            torch.ones(len(known_cls)), num_tgt) * LOSS_CLS_W
    norm_gt = t_normalize_bbox(known_gt)
    isnotnan = torch.isfinite(norm_gt).all(dim=-1)
    w = torch.ones_like(known_box) * torch.as_tensor(code_weights)
    loss_bbox = ((known_box[isnotnan] - norm_gt[isnotnan]).abs()
                 * w[isnotnan]).sum() / num_tgt * LOSS_BBOX_W
    return torch.nan_to_num(loss_cls), torch.nan_to_num(loss_bbox)


def torch_total(all_cls, all_box, dn_cls, dn_box, gt_list, gl_list):
    cw = torch.as_tensor(CODE_WEIGHTS)
    out = {}
    L = all_cls.shape[0]
    for li in range(L):
        lc, lb = t_loss_single(all_cls[li], all_box[li], gt_list, gl_list, cw)
        dc, db = t_dn_loss_single(dn_cls[li], dn_box[li], gt_list, gl_list,
                                  CODE_WEIGHTS)
        tag = "" if li == L - 1 else f"d{li}."
        out[f"{tag}loss_cls"], out[f"{tag}loss_bbox"] = lc, lb
        out[f"{tag}loss_cls_dn"], out[f"{tag}loss_bbox_dn"] = dc, db
    return out


# ---------------- the composed comparison ----------------

def _inputs(rng, layers=3, b=2, q=16, m=5):
    all_cls = rng.randn(layers, b, q, C).astype(np.float32)
    all_box = np.concatenate([
        rng.uniform(-40, 40, (layers, b, q, 2)),    # cx cy
        rng.uniform(-1, 1, (layers, b, q, 2)),      # log w, log l
        rng.uniform(-3, 1, (layers, b, q, 1)),      # cz
        rng.uniform(-1, 1, (layers, b, q, 3)),      # log h, sin, cos
        rng.uniform(-2, 2, (layers, b, q, 2)),      # vx vy
    ], -1).astype(np.float32)
    dn = GROUPS * m
    dn_cls = rng.randn(layers, b, dn, C).astype(np.float32)
    dn_box = np.concatenate([
        rng.uniform(-40, 40, (layers, b, dn, 2)),
        rng.uniform(-1, 1, (layers, b, dn, 2)),
        rng.uniform(-3, 1, (layers, b, dn, 1)),
        rng.uniform(-1, 1, (layers, b, dn, 3)),
        rng.uniform(-2, 2, (layers, b, dn, 2)),
    ], -1).astype(np.float32)
    gt_boxes = np.concatenate([
        rng.uniform(-40, 40, (b, m, 2)),
        rng.uniform(-3, 1, (b, m, 1)),
        rng.uniform(0.5, 4, (b, m, 3)),             # w l h (positive)
        rng.uniform(-np.pi, np.pi, (b, m, 1)),
        rng.uniform(-2, 2, (b, m, 2)),
    ], -1).astype(np.float32)
    gt_labels = rng.randint(0, C, (b, m)).astype(np.int32)
    gt_mask = np.ones((b, m), bool)
    gt_mask[1, 2:] = False  # sample 1: only 2 valid GT (ragged batch)
    return all_cls, all_box, dn_cls, dn_box, gt_boxes, gt_labels, gt_mask


def _jax_losses(all_cls, all_box, dn_cls, dn_box, gb, gl, gm):
    losses = compute_detection_loss(all_cls, all_box, gb, gl, gm, C,
                                    CODE_WEIGHTS)
    losses.update(compute_dn_loss(dn_cls, dn_box, gb, gl, gm, C,
                                  CODE_WEIGHTS, groups=GROUPS))
    return losses


def test_composed_loss_matches_torch_reference(rng):
    all_cls, all_box, dn_cls, dn_box, gb, gl, gm = _inputs(rng)

    got = jax.jit(_jax_losses)(*map(jnp.asarray,
                                    (all_cls, all_box, dn_cls, dn_box,
                                     gb, gl, gm)))
    got = {k: float(v) for k, v in got.items()}

    gt_list = [torch.from_numpy(gb[i][gm[i]]) for i in range(gb.shape[0])]
    gl_list = [torch.from_numpy(gl[i][gm[i]]).long()
               for i in range(gb.shape[0])]
    want = torch_total(torch.from_numpy(all_cls), torch.from_numpy(all_box),
                       torch.from_numpy(dn_cls), torch.from_numpy(dn_box),
                       gt_list, gl_list)
    want = {k: float(v) for k, v in want.items()}

    assert set(got) == set(want), (sorted(got), sorted(want))
    for k in sorted(want):
        np.testing.assert_allclose(got[k], want[k], rtol=2e-4, atol=1e-6,
                                   err_msg=k)


def test_composed_loss_grads_match_torch_reference(rng):
    """Input-gradients of the TOTAL objective (what actually trains the
    model) w.r.t. every prediction tensor must match torch autograd through
    the same composition (assignment detached on both sides)."""
    all_cls, all_box, dn_cls, dn_box, gb, gl, gm = _inputs(rng, layers=2)

    def total(preds):
        losses = _jax_losses(preds["c"], preds["b"], preds["dc"],
                             preds["db"], jnp.asarray(gb), jnp.asarray(gl),
                             jnp.asarray(gm))
        return sum(jax.tree_util.tree_leaves(losses))

    g = jax.jit(jax.grad(total))({"c": jnp.asarray(all_cls),
                                  "b": jnp.asarray(all_box),
                                  "dc": jnp.asarray(dn_cls),
                                  "db": jnp.asarray(dn_box)})

    tc = torch.from_numpy(all_cls).requires_grad_(True)
    tb = torch.from_numpy(all_box).requires_grad_(True)
    tdc = torch.from_numpy(dn_cls).requires_grad_(True)
    tdb = torch.from_numpy(dn_box).requires_grad_(True)
    gt_list = [torch.from_numpy(gb[i][gm[i]]) for i in range(gb.shape[0])]
    gl_list = [torch.from_numpy(gl[i][gm[i]]).long()
               for i in range(gb.shape[0])]
    sum(torch_total(tc, tb, tdc, tdb, gt_list, gl_list).values()).backward()

    for name, ours, theirs in (("cls", g["c"], tc.grad),
                               ("bbox", g["b"], tb.grad),
                               ("dn_cls", g["dc"], tdc.grad),
                               ("dn_bbox", g["db"], tdb.grad)):
        np.testing.assert_allclose(np.asarray(ours), theirs.numpy(),
                                   rtol=2e-4, atol=1e-6, err_msg=name)


def test_composed_loss_zero_gt_sample(rng):
    """A batch whose second sample has NO valid GT (the reference assigns
    all queries to background, sparsebev_head.py:46-52 in the assigner):
    losses must still match and stay finite."""
    all_cls, all_box, dn_cls, dn_box, gb, gl, gm = _inputs(rng)
    gm = gm.copy()
    gm[1, :] = False

    got = _jax_losses(*map(jnp.asarray, (all_cls, all_box, dn_cls, dn_box,
                                         gb, gl, gm)))
    got = {k: float(v) for k, v in got.items()}
    gt_list = [torch.from_numpy(gb[i][gm[i]]) for i in range(gb.shape[0])]
    gl_list = [torch.from_numpy(gl[i][gm[i]]).long()
               for i in range(gb.shape[0])]
    want = torch_total(torch.from_numpy(all_cls), torch.from_numpy(all_box),
                       torch.from_numpy(dn_cls), torch.from_numpy(dn_box),
                       gt_list, gl_list)
    for k in sorted(want):
        assert np.isfinite(got[k]), k
        np.testing.assert_allclose(got[k], float(want[k]), rtol=2e-4,
                                   atol=1e-6, err_msg=k)
