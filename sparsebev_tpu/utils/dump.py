"""Debug tensor dumping (the reference's DUMP singleton,
/root/reference/models/utils.py:309-317): when enabled, per-decoder-stage
intermediates (query boxes, predictions, scores, SASA tau, camera-space
sample points + masks) are saved to disk for the visualization tools."""

from __future__ import annotations

import os
import tempfile

import numpy as np


class DumpConfig:
    def __init__(self):
        self.enabled = False
        self.out_dir = None
        self.stage_count = 0
        self.frame_count = 0

    def enable(self, out_dir=None):
        self.enabled = True
        self.out_dir = out_dir or tempfile.mkdtemp(prefix="sparsebev_dump_")
        os.makedirs(self.out_dir, exist_ok=True)
        return self.out_dir

    def save(self, name: str, array) -> None:
        if not self.enabled:
            return
        path = os.path.join(self.out_dir, f"{name}_stage{self.stage_count}.npy")
        np.save(path, np.asarray(array))

    def load(self, name: str, stage: int):
        path = os.path.join(self.out_dir, f"{name}_stage{stage}.npy")
        return np.load(path)


DUMP = DumpConfig()
