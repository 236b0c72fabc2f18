"""Self-contained nuScenes detection metrics (NDS / mAP / mATE / mASE / mAOE /
mAVE / mAAE).

The reference delegates to nuscenes-devkit via mmdet3d's
``NuScenesDataset.evaluate`` (/root/reference/val.py:19-47); the devkit is
not available in this environment, so this module implements the published
nuScenes detection protocol directly:

- per class, per center-distance threshold d in {0.5, 1, 2, 4} m: greedy
  match predictions (globally sorted by score) to ground truth;
- AP = area of the precision-recall curve above precision 0.1 and recall
  0.1, normalized by 0.9^2;
- TP metrics (translation / scale / orientation / velocity / attribute
  errors) accumulated at d = 2 m over the recall > 0.1 region;
- NDS = (5*mAP + sum_tp (1 - min(1, mTP))) / 10.

Attributes are not predicted by this model family (the reference relies on
mmdet3d's velocity heuristic + devkit defaults); mAAE here defaults to the
worst case 1.0 unless attribute scores are supplied.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, Optional, Sequence

import numpy as np

DIST_THRESHOLDS = (0.5, 1.0, 2.0, 4.0)
TP_THRESHOLD = 2.0
MIN_RECALL = 0.1
MIN_PRECISION = 0.1
NELEM = 101  # recall samples

DEFAULT_CLASSES = (
    "car", "truck", "construction_vehicle", "bus", "trailer", "barrier",
    "motorcycle", "bicycle", "pedestrian", "traffic_cone")

# classes where some TP metrics are undefined (devkit convention)
NO_VELOCITY = {"barrier", "traffic_cone"}
NO_ATTRIBUTE = {"barrier", "traffic_cone"}
PERIOD_PI = {"barrier"}  # orientation compared modulo pi


def _angle_diff(a, b, period):
    d = (a - b) % period
    return np.minimum(d, period - d)


def _aligned_iou3d(dims_a, dims_b):
    """IoU of two axis-aligned, center-aligned boxes given (w, l, h)."""
    inter = np.prod(np.minimum(dims_a, dims_b), axis=-1)
    union = np.prod(dims_a, axis=-1) + np.prod(dims_b, axis=-1) - inter
    return inter / np.maximum(union, 1e-9)


class NuScenesDetectionEvaluator:
    """Accumulates per-sample predictions + GT, computes the metric table."""

    def __init__(self, classes: Sequence[str] = DEFAULT_CLASSES):
        self.classes = list(classes)
        self.reset()

    def reset(self):
        self._preds = defaultdict(list)  # class -> list of records
        self._gt_count = defaultdict(int)
        self._gt = {}                    # (sample, class) -> gt arrays
        self._num_samples = 0

    def add_sample(self,
                   pred_boxes: np.ndarray, pred_scores: np.ndarray,
                   pred_labels: np.ndarray,
                   gt_boxes: np.ndarray, gt_labels: np.ndarray,
                   pred_mask: Optional[np.ndarray] = None,
                   sample_token: Optional[str] = None) -> None:
        """Boxes are world gravity-centered [x, y, z, w, l, h, yaw, vx, vy]."""
        token = sample_token or f"sample_{self._num_samples}"
        self._num_samples += 1
        if pred_mask is None:
            pred_mask = np.ones(len(pred_boxes), bool)
        for ci, cname in enumerate(self.classes):
            gsel = np.asarray(gt_labels) == ci
            self._gt[(token, cname)] = np.asarray(gt_boxes)[gsel]
            self._gt_count[cname] += int(gsel.sum())
            psel = (np.asarray(pred_labels) == ci) & pred_mask
            for b, s in zip(np.asarray(pred_boxes)[psel],
                            np.asarray(pred_scores)[psel]):
                self._preds[cname].append((token, float(s), b))

    # -- core accumulation (devkit algorithm) -------------------------------
    def _accumulate(self, cname: str, dist_th: float):
        """Greedy match across the whole set in score order. Returns
        (precision, recall, tp_errors dict of running means per match)."""
        npos = self._gt_count[cname]
        preds = sorted(self._preds[cname], key=lambda r: -r[1])
        if npos == 0 or len(preds) == 0:
            return None

        tp, fp = [], []
        errs = {"trans": [], "scale": [], "orient": [], "vel": [], "attr": []}
        period = np.pi if cname in PERIOD_PI else 2 * np.pi
        free = {}  # (token) -> bool mask of unmatched gts (vectorized scan)

        for token, score, box in preds:
            gts = self._gt.get((token, cname), np.zeros((0, 9)))
            if token not in free:
                free[token] = np.ones(len(gts), bool)
            mask = free[token]
            best = None
            if mask.any():
                d = np.linalg.norm(gts[:, :2] - box[:2], axis=1)
                d = np.where(mask, d, np.inf)
                gi = int(np.argmin(d))
                if d[gi] < dist_th:
                    best = gi
            if best is None:
                tp.append(0)
                fp.append(1)
                continue
            free[token][best] = False
            tp.append(1)
            fp.append(0)
            g = gts[best]
            errs["trans"].append(float(np.linalg.norm(box[:2] - g[:2])))
            errs["scale"].append(1.0 - float(_aligned_iou3d(box[3:6], g[3:6])))
            errs["orient"].append(float(_angle_diff(box[6], g[6], period)))
            if cname not in NO_VELOCITY and box.shape[-1] > 8:
                errs["vel"].append(float(np.linalg.norm(box[7:9] - g[7:9])))
            errs["attr"].append(1.0)  # no attribute head: worst case

        tp = np.cumsum(tp).astype(np.float64)
        fp = np.cumsum(fp).astype(np.float64)
        precision = tp / np.maximum(tp + fp, 1e-9)
        recall = tp / npos
        return precision, recall, errs

    @staticmethod
    def _ap(precision, recall) -> float:
        """Interpolated AP above (0.1, 0.1) normalized by 0.9^2."""
        rec_interp = np.linspace(0, 1, NELEM)
        prec = np.interp(rec_interp, recall, precision, right=0)
        # running max from the right (monotone non-increasing envelope)
        prec = np.maximum.accumulate(prec[::-1])[::-1]
        prec = prec[rec_interp >= MIN_RECALL]
        prec = np.maximum(prec - MIN_PRECISION, 0)
        return float(prec.mean() / (1.0 - MIN_PRECISION))

    def _tp_metric(self, cname: str, key: str) -> float:
        """Mean error over the recall > MIN_RECALL region at TP_THRESHOLD
        (devkit: average of the cumulative-mean curve)."""
        acc = self._accumulate(cname, TP_THRESHOLD)
        if acc is None:
            return np.nan
        precision, recall, errs = acc
        e = np.asarray(errs[key], np.float64)
        if len(e) == 0:
            return np.nan
        cummean = np.cumsum(e) / (np.arange(len(e)) + 1)
        # sample the cumulative mean on the match-recall axis
        match_recall = np.arange(1, len(e) + 1) / max(self._gt_count[cname], 1)
        rec_interp = np.linspace(0, 1, NELEM)
        curve = np.interp(rec_interp, match_recall, cummean,
                          right=cummean[-1] if len(cummean) else 1.0)
        sel = rec_interp >= MIN_RECALL
        max_recall = match_recall[-1] if len(match_recall) else 0.0
        sel &= rec_interp <= max(max_recall, MIN_RECALL + 1e-9)
        if not sel.any():
            return 1.0
        return float(curve[sel].mean())

    def evaluate(self) -> Dict[str, float]:
        per_class_ap = {}
        tp_names = {"trans": "mATE", "scale": "mASE", "orient": "mAOE",
                    "vel": "mAVE", "attr": "mAAE"}
        tp_vals = {k: [] for k in tp_names}

        for cname in self.classes:
            aps = []
            for d in DIST_THRESHOLDS:
                acc = self._accumulate(cname, d)
                aps.append(0.0 if acc is None else self._ap(acc[0], acc[1]))
            per_class_ap[cname] = float(np.mean(aps))
            if self._gt_count[cname] > 0:
                for key in tp_names:
                    if key == "vel" and cname in NO_VELOCITY:
                        continue
                    if key == "attr" and cname in NO_ATTRIBUTE:
                        continue
                    v = self._tp_metric(cname, key)
                    if not np.isnan(v):
                        tp_vals[key].append(v)

        mean_ap = float(np.mean(list(per_class_ap.values())))
        out = {"mAP": mean_ap}
        tp_scores = []
        for key, name in tp_names.items():
            v = float(np.mean(tp_vals[key])) if tp_vals[key] else 1.0
            out[name] = v
            tp_scores.append(max(0.0, 1.0 - min(1.0, v)))
        out["NDS"] = float((5 * mean_ap + sum(tp_scores)) / 10.0)
        for cname, ap in per_class_ap.items():
            out[f"AP_{cname}"] = ap
        return out
