"""nuScenes-protocol metric tests: perfect predictions score ~1 NDS-wise
(minus the attribute term), garbage scores ~0, noise degrades monotonically."""

import numpy as np
import pytest

from sparsebev_tpu.evaluation import NuScenesDetectionEvaluator, \
    format_nusc_submission

CLASSES = ["car", "truck", "construction_vehicle", "bus", "trailer", "barrier",
           "motorcycle", "bicycle", "pedestrian", "traffic_cone"]


def _random_gt(rng, n):
    return np.concatenate([
        rng.uniform(-40, 40, (n, 2)),
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
    assert m["mAAE"] == 1.0  # no attribute head
    # NDS = (5*1 + 4*1 + 0) / 10
    assert m["NDS"] == pytest.approx(0.9, abs=0.01)


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
