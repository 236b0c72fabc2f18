"""nuScenes submission formatting: decoded predictions -> the devkit's
results JSON schema (what mmdet3d's ``format_results`` produces for the
leaderboard; reference val.py relies on dataset.evaluate / format_results)."""

from __future__ import annotations

import json
from typing import Dict, List, Optional, Sequence

import numpy as np

DEFAULT_ATTRIBUTES = {
    "car": "vehicle.moving", "truck": "vehicle.moving",
    "construction_vehicle": "vehicle.parked", "bus": "vehicle.moving",
    "trailer": "vehicle.parked", "barrier": "",
    "motorcycle": "cycle.with_rider", "bicycle": "cycle.without_rider",
    "pedestrian": "pedestrian.moving", "traffic_cone": "",
}
STOPPED_ATTRIBUTES = {
    "car": "vehicle.parked", "truck": "vehicle.parked",
    "bus": "vehicle.stopped", "motorcycle": "cycle.without_rider",
    "pedestrian": "pedestrian.standing",
}


def _yaw_to_quaternion(yaw: float) -> List[float]:
    return [float(np.cos(yaw / 2)), 0.0, 0.0, float(np.sin(yaw / 2))]


def format_nusc_submission(results_per_sample: Dict[str, Dict],
                           classes: Sequence[str],
                           out_path: Optional[str] = None,
                           vel_thresh: float = 0.2) -> Dict:
    """results_per_sample: token -> dict(bboxes [K,9] world gravity-centered,
    scores [K], labels [K], mask [K]). Attribute assignment follows mmdet3d's
    velocity heuristic."""
    submission = {
        "meta": {
            "use_camera": True, "use_lidar": False, "use_radar": False,
            "use_map": False, "use_external": True,
        },
        "results": {},
    }
    for token, res in results_per_sample.items():
        entries = []
        boxes = np.asarray(res["bboxes"])
        scores = np.asarray(res["scores"])
        labels = np.asarray(res["labels"])
        mask = np.asarray(res.get("mask", np.ones(len(boxes), bool)))
        for b, s, l, m in zip(boxes, scores, labels, mask):
            if not m:
                continue
            name = classes[int(l)]
            speed = float(np.linalg.norm(b[7:9])) if len(b) > 8 else 0.0
            attr = (DEFAULT_ATTRIBUTES.get(name, "") if speed > vel_thresh
                    else STOPPED_ATTRIBUTES.get(name,
                                                DEFAULT_ATTRIBUTES.get(name, "")))
            entries.append({
                "sample_token": token,
                "translation": [float(x) for x in b[:3]],
                "size": [float(x) for x in b[3:6]],
                "rotation": _yaw_to_quaternion(float(b[6])),
                "velocity": [float(x) for x in b[7:9]] if len(b) > 8 else [0, 0],
                "detection_name": name,
                "detection_score": float(s),
                "attribute_name": attr,
            })
        submission["results"][token] = entries

    if out_path is not None:
        with open(out_path, "w") as f:
            json.dump(submission, f)
    return submission
