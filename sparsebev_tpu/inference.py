"""Streaming (online) inference with a per-frame feature cache.

Re-provides ``simple_test_online`` (reference
/root/reference/models/sparsebev.py:255-321): per sample, only frames whose
keyframe filename is not cached go through the backbone; history features
come from a FIFO cache (evict at 16 frames). This is what makes streaming FPS
about backbone-on-1-frame + decoder.

The cache is host-side state; the two jitted programs (single-frame feature
extraction, decoder head on the assembled pyramid) have fixed shapes, so the
whole loop is retrace-free.
"""

from __future__ import annotations

from collections import OrderedDict
from typing import List

import jax
import jax.numpy as jnp
import numpy as np


class StreamingDetector:
    def __init__(self, model, variables, num_frames: int, coder=None,
                 cache_size: int = 16, num_views: int = 6):
        self.model = model
        self.variables = variables
        self.num_frames = num_frames
        self.num_views = num_views
        self.coder = coder
        self.cache_size = cache_size
        self.memory: "OrderedDict[str, List[jnp.ndarray]]" = OrderedDict()

        self._extract = jax.jit(lambda v, img: model.apply(
            v, img, train=False, method=model.forward_features))

        def _head(v, feats, lidar2img, time_diff, image_h, image_w):
            preds = model.apply(v, feats, lidar2img, time_diff,
                                image_h, image_w, method=model.forward_head)
            if coder is not None:
                return coder.decode(preds)
            return preds

        self._head = jax.jit(_head, static_argnums=(4, 5))

    def _features_for_frame(self, key: str, frame_imgs: jnp.ndarray):
        """frame_imgs: [1, 6, H, W, 3]. Returns the cached/extracted pyramid
        (list of [1, 6, H', W', C])."""
        if key in self.memory:
            return self.memory[key]
        feats = self._extract(self.variables, frame_imgs)
        self.memory[key] = feats
        while len(self.memory) > self.cache_size:  # FIFO evict (reference :290-292)
            self.memory.popitem(last=False)
        return feats

    def infer(self, img: np.ndarray, lidar2img: np.ndarray,
              time_diff: np.ndarray, filenames: List[str]):
        """img: [1, T*6, H, W, 3]; filenames: per-view file names (frame i is
        identified by its first view's name, reference :282-284)."""
        n = self.num_views
        t = img.shape[1] // n
        h, w = img.shape[2], img.shape[3]
        img = jnp.asarray(img)

        frame_feats = []
        for i in range(t):
            key = filenames[i * n] if filenames else f"frame_{i}"
            frame_feats.append(
                self._features_for_frame(key, img[:, i * n:(i + 1) * n]))

        feats = [jnp.concatenate([ff[lvl] for ff in frame_feats], axis=1)
                 for lvl in range(len(frame_feats[0]))]
        return self._head(self.variables, feats, jnp.asarray(lidar2img),
                          jnp.asarray(time_diff), h, w)
