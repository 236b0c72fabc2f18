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

    def save(self, name: str, array, stage: int = None) -> None:
        if not self.enabled:
            return
        stage = self.stage_count if stage is None else stage
        path = os.path.join(self.out_dir, f"{name}_stage{stage}.npy")
        np.save(path, np.asarray(array))

    def load(self, name: str, stage: int):
        path = os.path.join(self.out_dir, f"{name}_stage{stage}.npy")
        return np.load(path)


DUMP = DumpConfig()


def dump_save(name: str, array) -> None:
    """jit-safe dump: checked at trace time, saved via a host callback with
    the stage index captured at trace time (the decoder sets
    ``DUMP.stage_count`` per layer iteration, mirroring
    models/sparsebev_transformer.py:88)."""
    if not DUMP.enabled:
        return
    import jax
    stage = DUMP.stage_count
    jax.debug.callback(
        lambda a, _n=name, _s=stage: DUMP.save(_n, a, stage=_s), array)
