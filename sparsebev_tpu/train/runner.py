"""Epoch-based training runner (the TPU-native replacement for mmcv's
EpochBasedRunner + hook dispatch, reference /root/reference/train.py:138-176).

One jitted train step over a device mesh; host-side loop handles data,
hooks, checkpoints and resume.
"""

from __future__ import annotations

import logging
import os
from typing import Any, Callable, Dict, List, Optional

import jax
import numpy as np

from ..parallel import make_mesh, replicate, shard_batch
from .hooks import Hook, IterTimerHook


class Runner:
    def __init__(self,
                 train_step_fn: Callable,
                 state,
                 loader,
                 work_dir: str,
                 total_epochs: int,
                 lr_schedule: Optional[Callable] = None,
                 hooks: Optional[List[Hook]] = None,
                 mesh=None,
                 seed: int = 0,
                 steps_per_dispatch: int = 1):
        """``steps_per_dispatch > 1`` runs K steps per host dispatch via
        ``make_multi_step`` (lax.scan over K stacked batches) — amortizes
        per-dispatch host overhead; hooks then fire once per dispatch with
        the K metrics averaged."""
        self.steps_per_dispatch = max(1, steps_per_dispatch)
        # donate the train state: without donation every step copies the
        # full params+optimizer buffers (~0.5 GB for r50) before updating
        if self.steps_per_dispatch > 1:
            from .step import make_multi_step
            self.train_step_fn = jax.jit(
                make_multi_step(train_step_fn, self.steps_per_dispatch),
                donate_argnums=(0,))
        else:
            self.train_step_fn = jax.jit(train_step_fn, donate_argnums=(0,))
        self.state = state
        self.loader = loader
        self.work_dir = work_dir
        self.total_epochs = total_epochs
        self.lr_schedule = lr_schedule
        self.hooks = hooks or []
        self.mesh = mesh if mesh is not None else make_mesh()
        self.seed = seed

        self.epoch = 0
        self.iter = 0
        self.log_vars: Dict[str, Any] = {}
        self.eval_results: Dict[str, Any] = {}
        os.makedirs(work_dir, exist_ok=True)

    @property
    def iters_per_epoch(self) -> int:
        return len(self.loader) // self.steps_per_dispatch

    @property
    def global_step(self) -> int:
        return int(self.state.step)

    def current_lr(self) -> float:
        if self.lr_schedule is None:
            return 0.0
        return float(self.lr_schedule(self.global_step))

    def _call_hooks(self, event: str, *args):
        for h in self.hooks:
            fn = getattr(h, event, None)
            if fn is not None:
                fn(self, *args)

    def resume(self, path: str):
        """Full-state resume (reference runner.resume, train.py:160-162)."""
        from ..utils.checkpoint_io import load_checkpoint, restore_train_state
        payload = load_checkpoint(path)
        self.state = restore_train_state(path, self.state)
        self.epoch = int(payload.get("extra", {}).get("epoch", 0))
        logging.info("resumed from %s at step %d (epoch %d)",
                     path, self.global_step, self.epoch)

    def run(self):
        self.state = jax.device_put(self.state, replicate(self.mesh))
        rng = jax.random.PRNGKey(self.seed)
        self._call_hooks("before_run")
        start_epoch = self.epoch
        for epoch in range(start_epoch, self.total_epochs):
            self.epoch = epoch
            self._call_hooks("before_epoch")
            timer = next((h for h in self.hooks if isinstance(h, IterTimerHook)),
                         None)
            for i, batch in enumerate(self._iter_batches()):
                self.iter = i
                batch = shard_batch(batch, self.mesh)
                if timer is not None:
                    timer.before_iter(self)
                rng, step_rng = jax.random.split(rng)
                self.state, metrics = self.train_step_fn(
                    self.state, batch, step_rng)
                # with K steps per dispatch, metric leaves are [K]: average
                metrics = {k: float(np.mean(jax.device_get(v)))
                           for k, v in metrics.items()}
                self._call_hooks("after_iter", metrics)
            self._call_hooks("after_epoch")
        return self.state

    def _iter_batches(self):
        """Yield per-dispatch batches: plain batches for steps_per_dispatch=1,
        K-stacked batches otherwise (dropping a trailing partial group)."""
        k = self.steps_per_dispatch
        if k == 1:
            for batch in self.loader:
                batch.pop("img_metas", None)
                yield batch
            return
        group = []
        for batch in self.loader:
            batch.pop("img_metas", None)
            group.append(batch)
            if len(group) == k:
                yield jax.tree_util.tree_map(
                    lambda *xs: np.stack(xs), *group)
                group = []
        if group:  # no silent caps: a trailing partial group cannot fill a
            # K-step dispatch with static shapes, so it is skipped — say so
            logging.info(
                "steps_per_dispatch=%d drops a trailing partial group of "
                "%d batch(es) this epoch", k, len(group))
