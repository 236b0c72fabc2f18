"""nuScenes-protocol metric tests: perfect predictions score ~1 NDS-wise
(minus the attribute term), garbage scores ~0, noise degrades monotonically."""

import numpy as np
import pytest

from sparsebev_tpu.evaluation import NuScenesDetectionEvaluator, \
    format_nusc_submission

CLASSES = ["car", "truck", "construction_vehicle", "bus", "trailer", "barrier",
           "motorcycle", "bicycle", "pedestrian", "traffic_cone"]


def _random_gt(rng, n):
    # keep centers within every class's devkit range (barrier/cone: 30 m)
    return np.concatenate([
        rng.uniform(-20, 20, (n, 2)),
        rng.uniform(-2, 1, (n, 1)),
        rng.uniform(1, 4, (n, 3)),
        rng.uniform(-np.pi, np.pi, (n, 1)),
        rng.uniform(-3, 3, (n, 2)),
    ], -1).astype(np.float32)


def test_perfect_predictions(rng):
    ev = NuScenesDetectionEvaluator(CLASSES)
    for s in range(4):
        gt = _random_gt(rng, 8)
        labels = rng.randint(0, 10, 8)
        ev.add_sample(gt.copy(), np.full(8, 0.9), labels.copy(), gt, labels)
    m = ev.evaluate()
    assert m["mAP"] > 0.99
    assert m["mATE"] < 0.01 and m["mASE"] < 0.01
    assert m["mAOE"] < 0.01 and m["mAVE"] < 0.01
    # identical velocities -> identical heuristic attributes
    assert m["mAAE"] < 0.01
    assert m["NDS"] == pytest.approx(1.0, abs=0.01)


def test_garbage_predictions(rng):
    ev = NuScenesDetectionEvaluator(CLASSES)
    for s in range(4):
        gt = _random_gt(rng, 8)
        labels = rng.randint(0, 10, 8)
        preds = _random_gt(rng, 8) + 500.0  # far away from everything
        ev.add_sample(preds, np.full(8, 0.9), labels, gt, labels)
    m = ev.evaluate()
    assert m["mAP"] < 0.01
    assert m["NDS"] < 0.05


def test_noise_monotonic(rng):
    def run(noise):
        ev = NuScenesDetectionEvaluator(CLASSES)
        r = np.random.RandomState(0)
        for s in range(6):
            gt = _random_gt(r, 10)
            labels = r.randint(0, 10, 10)
            preds = gt.copy()
            preds[:, :2] += r.randn(10, 2) * noise
            ev.add_sample(preds, np.full(10, 0.9), labels, gt, labels)
        return ev.evaluate()

    m0, m1, m2 = run(0.1), run(1.0), run(3.0)
    assert m0["mAP"] > m1["mAP"] > m2["mAP"]
    assert m0["mATE"] < m1["mATE"]
    assert m0["NDS"] > m1["NDS"] > m2["NDS"]


def test_missing_class_counts_zero(rng):
    ev = NuScenesDetectionEvaluator(CLASSES)
    gt = _random_gt(rng, 4)
    labels = np.zeros(4, int)  # all cars
    ev.add_sample(gt, np.full(4, 0.9), labels, gt, labels)
    m = ev.evaluate()
    assert m["AP_car"] > 0.99
    assert m["AP_truck"] == 0.0
    assert m["mAP"] == pytest.approx(m["AP_car"] / 10, abs=1e-3)


def test_submission_format(rng, tmp_path):
    gt = _random_gt(rng, 3)
    res = {"tok1": dict(bboxes=gt, scores=np.array([0.9, 0.5, 0.1]),
                        labels=np.array([0, 1, 8]),
                        mask=np.array([True, True, False]))}
    out = format_nusc_submission(res, CLASSES, str(tmp_path / "sub.json"))
    entries = out["results"]["tok1"]
    assert len(entries) == 2  # masked box dropped
    e = entries[0]
    assert set(e) == {"sample_token", "translation", "size", "rotation",
                      "velocity", "detection_name", "detection_score",
                      "attribute_name"}
    assert e["detection_name"] == "car"
    assert len(e["rotation"]) == 4
    import json, os
    assert os.path.exists(tmp_path / "sub.json")
    json.load(open(tmp_path / "sub.json"))


def test_calc_ap_calc_tp_devkit_semantics():
    """Golden checks of the devkit index conventions (algo.py)."""
    import numpy as np
    from sparsebev_tpu.evaluation.metrics import (_MetricData, calc_ap,
                                                  calc_tp, TP_METRICS)
    ones_err = {k: np.full(101, 0.5) for k in TP_METRICS}

    # calc_ap slices precision[11:] — the first 11 grid points are ignored
    prec = np.concatenate([np.zeros(11), np.ones(90)])
    md = _MetricData(prec, np.ones(101), ones_err)
    assert calc_ap(md) == pytest.approx(1.0)
    md = _MetricData(np.full(101, 0.1), np.ones(101), ones_err)
    assert calc_ap(md) == pytest.approx(0.0)
    md = _MetricData(np.ones(101), np.ones(101), ones_err)
    assert calc_ap(md) == pytest.approx(1.0)

    # calc_tp averages errors[11 : max_recall_ind + 1]
    conf = np.concatenate([np.full(51, 0.9), np.zeros(50)])
    errs = {k: np.concatenate([np.full(51, 0.5), np.full(50, 7.0)])
            for k in TP_METRICS}
    md = _MetricData(np.ones(101), conf, errs)
    assert md.max_recall_ind == 50
    assert calc_tp(md, "trans_err") == pytest.approx(0.5)
    # no achieved recall -> defined as 1.0
    md = _MetricData(np.ones(101), np.zeros(101), errs)
    assert calc_tp(md, "trans_err") == 1.0


def test_class_range_filter(rng):
    """devkit detection_cvpr_2019 class ranges: a barrier at 45 m is outside
    its 30 m range and must not contribute to GT counts or predictions."""
    ev = NuScenesDetectionEvaluator(CLASSES)
    bidx = CLASSES.index("barrier")
    box_far = np.array([[45.0, 0, 0, 1, 1, 1, 0, 0, 0]], np.float32)
    box_near = np.array([[10.0, 0, 0, 1, 1, 1, 0, 0, 0]], np.float32)
    ev.add_sample(box_far, np.array([0.9]), np.array([bidx]),
                  box_far, np.array([bidx]))
    assert ev._gt_count["barrier"] == 0
    assert len(ev._preds["barrier"]) == 0
    ev.add_sample(box_near, np.array([0.9]), np.array([bidx]),
                  box_near, np.array([bidx]))
    assert ev._gt_count["barrier"] == 1
    assert len(ev._preds["barrier"]) == 1


def test_tp_skip_rules(rng):
    """traffic_cone orientation errors must not leak into mAOE (devkit skips
    orient/vel/attr for cones, vel/attr for barriers)."""
    ev = NuScenesDetectionEvaluator(CLASSES)
    cidx = CLASSES.index("traffic_cone")
    car = CLASSES.index("car")
    gt = np.array([[5.0, 0, 0, 1, 1, 1, 0.0, 0, 0],
                   [8.0, 0, 0, 1, 1, 1, 0.0, 0, 0]], np.float32)
    pred = gt.copy()
    pred[0, 6] = np.pi / 2  # badly wrong cone orientation
    labels = np.array([cidx, car])
    ev.add_sample(pred, np.array([0.9, 0.9]), labels, gt, labels)
    m = ev.evaluate()
    assert m["mAOE"] < 1e-6  # the car is perfect; the cone is skipped


def test_attribute_heuristic():
    from sparsebev_tpu.evaluation.results import velocity_attribute
    assert velocity_attribute("car", 1.0, 0.0) == "vehicle.moving"
    assert velocity_attribute("car", 0.0, 0.0) == "vehicle.parked"
    assert velocity_attribute("bus", 0.05, 0.0) == "vehicle.stopped"
    assert velocity_attribute("bicycle", 2.0, 0.0) == "cycle.with_rider"
    assert velocity_attribute("bicycle", 0.0, 0.0) == "cycle.without_rider"
    assert velocity_attribute("pedestrian", 0.0, 0.0) == "pedestrian.standing"
    assert velocity_attribute("pedestrian", 1.0, 0.0) == "pedestrian.moving"
    assert velocity_attribute("barrier", 5.0, 0.0) == ""


def test_max_boxes_per_sample_cap(rng):
    ev = NuScenesDetectionEvaluator(CLASSES)
    n = 501
    boxes = _random_gt(rng, n)
    with pytest.raises(AssertionError):
        ev.add_sample(boxes, np.ones(n), np.zeros(n, int),
                      boxes[:1], np.zeros(1, int))


def test_ego_frame_range_filter(rng):
    """devkit ego_dist: class-range filtering must measure from the ego pose
    (via the lidar->ego-relative-global affine), not the lidar origin."""
    ev = NuScenesDetectionEvaluator(CLASSES)
    # one car GT at x=45 m in the lidar frame; ego_frame shifts everything
    # +10 m in x -> ego distance 55 m > 50 m car range -> filtered out
    gt = _random_gt(rng, 1)
    gt[0, :2] = [45.0, 0.0]
    ego_frame = np.concatenate([np.eye(3), [[10.0], [0.0], [0.0]]], 1)
    ev.add_sample(gt.copy(), np.array([0.9]), np.array([0]), gt,
                  np.array([0]), ego_frame=ego_frame)
    assert ev._gt_count["car"] == 0
    assert len(ev._preds["car"]) == 0

    # without the shift both survive (45 < 50)
    ev2 = NuScenesDetectionEvaluator(CLASSES)
    ev2.add_sample(gt.copy(), np.array([0.9]), np.array([0]), gt,
                   np.array([0]))
    assert ev2._gt_count["car"] == 1
    assert len(ev2._preds["car"]) == 1

    # a rotational ego_frame must not change distances (norm-preserving
    # about the ego origin)
    th = 0.7
    rot = np.array([[np.cos(th), -np.sin(th), 0],
                    [np.sin(th), np.cos(th), 0], [0, 0, 1.0]])
    ev3 = NuScenesDetectionEvaluator(CLASSES)
    ev3.add_sample(gt.copy(), np.array([0.9]), np.array([0]), gt,
                   np.array([0]),
                   ego_frame=np.concatenate([rot, np.zeros((3, 1))], 1))
    assert ev3._gt_count["car"] == 1


def test_fast_accumulate_matches_naive(rng):
    """_accumulate_all (shared distance/error matrices, one greedy pass per
    threshold) must produce curves identical to the literal devkit loop
    (_accumulate_naive) — same matches, same interpolated precision/conf/
    error arrays — on noisy multi-token data with unmatched preds and GTs."""
    from sparsebev_tpu.evaluation.metrics import DIST_THRESHOLDS
    ev = NuScenesDetectionEvaluator(CLASSES)
    r = np.random.RandomState(7)
    for s in range(5):
        ngt, npred = r.randint(3, 12), r.randint(3, 14)
        gt = _random_gt(r, ngt)
        glabels = r.randint(0, 10, ngt)
        preds = _random_gt(r, npred)
        # half the preds are perturbed copies of GTs (matchable at varying
        # thresholds), half are random (mostly unmatchable)
        for i in range(npred // 2):
            preds[i] = gt[i % ngt]
            preds[i, :2] += r.randn(2) * r.uniform(0.1, 3.0)
        plabels = np.concatenate(
            [glabels[np.arange(npred // 2) % ngt],
             r.randint(0, 10, npred - npred // 2)])
        ev.add_sample(preds, r.uniform(0.05, 1.0, npred), plabels,
                      gt, glabels)

    for cname in CLASSES:
        fast = ev._accumulate_all(cname)
        for th in DIST_THRESHOLDS:
            naive = ev._accumulate_naive(cname, th)
            f = fast[th]
            if naive is None or f is None:
                assert naive is None and f is None
                continue
            np.testing.assert_allclose(f.precision, naive.precision)
            np.testing.assert_allclose(f.confidence, naive.confidence)
            for k in f.errors:
                np.testing.assert_allclose(f.errors[k], naive.errors[k])


def test_gt_num_pts_filter(rng):
    """devkit filter_eval_boxes: GT with num_lidar_pts+num_radar_pts == 0
    are removed; -1 (count unknown) is kept."""
    gt = _random_gt(rng, 3)
    labels = np.zeros(3, np.int64)
    ev = NuScenesDetectionEvaluator(CLASSES)
    ev.add_sample(gt.copy(), np.full(3, 0.9), labels, gt, labels,
                  gt_num_pts=np.array([5, 0, -1]))
    assert ev._gt_count["car"] == 2  # the 0-point box dropped, -1 kept
    # predictions are never filtered by num_pts
    assert len(ev._preds["car"]) == 3
