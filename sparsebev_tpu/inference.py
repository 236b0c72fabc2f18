"""Streaming (online) inference with a device-side packed-feature ring.

Re-provides ``simple_test_online`` (reference
/root/reference/models/sparsebev.py:255-321): per sample, only frames whose
keyframe filename is not cached go through the backbone; history features
come from a FIFO cache (evict at 16 frames). This is what makes streaming
FPS about backbone-on-1-frame + decoder.

TPU-first delta: the cache holds the decoder's grouped y-fold SAMPLING
TABLES (ops.msmv_sampling.PackedFeatures) in a fixed ring of device buffers,
not raw pyramids. A new frame costs one single-frame pack plus a contiguous
``dynamic_update_slice`` into each level's ring (~0.8 ms at r50 scale on
v5e); the decoder reads the ring through a [T]-slot indirection
(``ring_packed``), so history frames are never copied or re-packed (the
round-1 concat+repack path cost ~7 ms/sample). Slot bookkeeping is host-side
state; both jitted programs (pack+update, head) have fixed shapes, so the
loop is retrace-free.
"""

from __future__ import annotations

from collections import OrderedDict
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from .ops.msmv_sampling import (ring_copy_slot, ring_init, ring_packed,
                                ring_update)


def compiler_options_from_env():
    """Optional per-jit XLA:TPU compiler overrides from the environment.

    ``SPARSEBEV_COMPILER_OPTIONS="k=v,k2=v2"`` → dict for
    ``jax.jit(compiler_options=...)``. Used by the streaming bench jits so
    flags like ``xla_tpu_scoped_vmem_limit_kib`` can be A/B-tested without
    process-level XLA_FLAGS (which the axon client rejects for TPU flags).
    Returns None (compiler defaults) when unset.
    """
    import os

    spec = os.environ.get("SPARSEBEV_COMPILER_OPTIONS", "").strip()
    if not spec:
        return None
    out = {}
    for item in spec.split(","):
        k, _, v = item.partition("=")
        if k.strip():
            out[k.strip()] = v.strip()
    return out or None


def ring_table_dtypes(model, frame_packed):
    """Per-level ring-table dtypes for the streaming cache.

    Default: the packed frame's own dtype (bf16). A level marked in the
    head config's ``table_fp8`` (bool or per-level sequence) is stored as
    float8_e4m3fn instead: e4m3 is scale-free, so dequant is a pure upcast
    fused into the sampling fold (ops/msmv_sampling.py). Why: XLA MSA pins
    gather tables to VMEM only when they fit its budget — at r50 scale the
    bf16 y-fold rings are L0 557 / L1 139 / L2 35 / L3 9 MB and only
    L2+L3 pin (6.8 ns/idx vs 14-17 from HBM, see docs/ROADMAP.md). fp8
    halves L1 to 70 MB, toward the pin threshold. OPT-IN and
    inference-only (the ring exists only in streaming; training and
    offline eval sample exact bf16 tables): e4m3 keeps ~2 significant
    digits per feature, so enable per config after checking accuracy.
    Fold math is exact vs pre-quantized tables
    (tests/test_msmv_sampling.py::test_ring_fp8_matches_prequantized).
    """
    spec = model.pts_bbox_head.get("table_fp8", False)
    n = len(frame_packed.level_shapes)
    if isinstance(spec, bool):
        spec = (spec,) * n
    base = frame_packed.tables[0].dtype
    return tuple(jnp.float8_e4m3fn if s else base for s in spec)


def _head_split_spec(model):
    spec = model.pts_bbox_head.get("table_split", 1)
    return (spec,) if isinstance(spec, int) else tuple(spec)


def ring_table_splits(model, frame_packed, num_frames: int):
    """Per-level streaming ring chunk-split counts (head config
    ``table_split``, int or per-level sequence; default 1 = unsplit).

    A level split into N separate chunk buffers (each covering T/N ring
    slots) gathers chunk-by-chunk with UNCHANGED index count and bf16-exact
    numerics; XLA MSA prefetch-pipelines each <=70 MB chunk into VMEM
    while its predecessor gathers, cutting that level's gather rate from
    ~11.5 to ~6.8 ns/idx on v5e (ops/msmv_sampling.py PackedFeatures.split
    for the measured rationale). Splits must divide the frame window."""
    spec = model.pts_bbox_head.get("table_split", 1)
    n = len(frame_packed.level_shapes)
    if isinstance(spec, int):
        spec = (spec,) * n
    spec = tuple(int(s) for s in spec)
    for s in spec:
        if s > 1 and num_frames % s:
            raise ValueError(
                f"table_split={spec} must divide num_frames={num_frames}")
    return spec


def ring_table_gsplits(model, frame_packed):
    """Per-level GROUP-split flags (head config ``table_gsplit``, bool or
    per-level sequence; default False).

    A marked level's streaming ring is stored as ``num_groups`` separate
    per-group chunk buffers (ops.msmv_sampling.GroupSplitRing): the gather
    partitions on the STATIC group axis, so — unlike ``table_split`` — there
    is no runtime point permute, no lax.switch in the ring update, and no
    slot-bijection fixup, while each chunk (r50 L1: 139/4 = 35 MB) drops
    under XLA MSA's VMEM prefetch threshold (~11.5 -> ~6.8 ns/idx measured
    v5e). bf16-exact vs the unsplit ring."""
    spec = model.pts_bbox_head.get("table_gsplit", False)
    n = len(frame_packed.level_shapes)
    if isinstance(spec, bool):
        spec = (spec,) * n
    return tuple(bool(s) for s in spec)


def init_streaming_variables(model, frame, lidar2img, time_diff,
                             image_h: int, image_w: int, seed: int = 0):
    """Initialize model variables WITHOUT a full T-frame forward.

    A plain ``model.init`` runs the backbone on all T*6 views at once —
    at 1600x640 T=15 that alone OOMs a 16 GB chip (90 ViT-L views of
    activations). Streaming never does that: the backbone sees one frame,
    the head reads packed tables. So init the same way: backbone+neck via
    ``forward_frame_packed`` on ONE real frame, head via ``forward_head`` on
    a TINY dummy packed pyramid (head params are independent of feature map
    sizes), and merge the trees.

    frame: [1, 6, H, W, 3]; lidar2img [1, T*6, 4, 4]; time_diff [1, T].
    """
    # model may be un-bound (setup not run); read the config dict
    head_cfg = model.pts_bbox_head
    g = head_cfg.get("num_groups", 4)
    c = head_cfg["in_channels"]
    num_levels = head_cfg.get("num_levels", 4)
    num_frames = head_cfg.get("num_frames", 8)
    num_views = head_cfg.get("num_views", 6)
    yfold = head_cfg.get("table_yfold", True)

    rngs = {"params": jax.random.PRNGKey(seed),
            "aug": jax.random.PRNGKey(seed + 1)}
    bb_vars = jax.jit(lambda r, f: model.init(
        r, f, train=False, method=model.forward_frame_packed))(rngs, frame)

    from .ops.msmv_sampling import PackedFeatures
    cg = c // g
    if isinstance(yfold, bool):
        yfold = (yfold,) * num_levels
    shapes = []
    h0, w0 = 8, 8
    tables = []
    for lvl in range(num_levels):
        h_l, w_l = max(h0 >> lvl, 1), max(w0 >> lvl, 1)
        shapes.append((h_l, w_l))
        ch = (2 if yfold[lvl] else 1) * cg
        tables.append(jnp.zeros(
            (num_frames * num_views * h_l * g, w_l + 1, ch), jnp.float32))
    dummy = PackedFeatures(tuple(tables), num_frames * g, num_views,
                           tuple(shapes), cg, num_groups=g, yfold=yfold)
    head_vars = jax.jit(lambda r, d, l, t: model.init(
        r, d, l, t, image_h, image_w, method=model.forward_head))(
        rngs, dummy, lidar2img, time_diff)

    params = dict(bb_vars["params"])
    params.update(head_vars["params"])
    out = {"params": params}
    for k in set(bb_vars) | set(head_vars):
        if k == "params":
            continue
        merged = dict(bb_vars.get(k, {}))
        merged.update(head_vars.get(k, {}))
        out[k] = merged
    return out


def make_ring_bench(model, variables, frame, lidar2img, time_diff,
                    num_frames: int, image_h: int, image_w: int, mesh=None):
    """Shared in-jit streaming benchmark harness (bench.py + tools/timing.py
    use the SAME slot arithmetic and donation setup so the two tools cannot
    silently diverge).

    Returns ``(loop_for, ring)``: ``loop_for(iters)`` builds a jitted
    ``loop_fn(variables, ring, frame)`` that runs ``iters`` streaming
    samples inside one jit (each iteration packs the perturbed frame into
    ring slot i mod T and runs the head over the ring — a real data
    dependency between iterations) and returns ``(ring, scalar)``; read the
    scalar back for an honest device sync. The ring argument is DONATED
    (multi-GB table rings must not double-buffer in the while-loop carry).
    """
    import functools

    pack = jax.jit(lambda v, img: model.apply(
        v, img, train=False, method=model.forward_frame_packed))
    fp0 = pack(variables, frame)
    meta = jax.tree_util.tree_map(lambda _: None, fp0)  # geometry only
    ring = ring_init(fp0, num_frames, ring_table_dtypes(model, fp0),
                     ring_table_splits(model, fp0, num_frames),
                     ring_table_gsplits(model, fp0))
    upd = jax.jit(ring_update, donate_argnums=(0,))
    for s in range(num_frames):  # prefill so iteration 0 sees a full window
        ring = upd(ring, fp0, jnp.int32(s))

    def one_sample(variables, ring, i, frame):
        fp = model.apply(variables, frame, train=False,
                         method=model.forward_frame_packed)
        ring = ring_update(ring, fp, jnp.mod(i, num_frames))
        slots = jnp.mod(i - jnp.arange(num_frames, dtype=jnp.int32),
                        num_frames)
        packed = ring_packed(ring, slots, num_frames, meta)
        preds = model.apply(variables, packed, lidar2img, time_diff,
                            image_h, image_w, method=model.forward_head)
        if mesh is not None:
            from .parallel.query_parallel import constrain_preds
            preds = constrain_preds(preds, mesh)
        return ring, preds

    def loop_for(iters: int):
        @functools.partial(jax.jit, donate_argnums=(1,),
                           compiler_options=compiler_options_from_env())
        def loop_fn(variables, ring, frame):
            def body(i, carry):
                ring, acc = carry
                ring, preds = one_sample(variables, ring, i,
                                         frame + i * 1e-3)
                return ring, acc + preds["all_cls_scores"][-1].astype(
                    jnp.float32).sum()
            return jax.lax.fori_loop(0, iters, body, (ring, jnp.float32(0)))
        return loop_fn

    return loop_for, ring


class StreamingDetector:
    def __init__(self, model, variables, num_frames: int, coder=None,
                 cache_size: int = 16, num_views: int = 6, mesh=None):
        """``mesh``: optional device mesh with a "q" axis — the decoder then
        runs query-sharded over all its devices (parallel/query_parallel.py),
        dividing the sampling-gather latency by the mesh size."""
        self.model = model
        self.variables = variables
        self.num_frames = num_frames
        self.num_views = num_views
        self.mesh = mesh
        self.coder = coder
        self.cache_size = max(cache_size, num_frames)
        self._split_mode = any(s > 1 for s in _head_split_spec(model))
        if self._split_mode:
            # chunk-split rings need exactly one chunk-partition of the
            # T-frame window: points partition statically by physical slot
            # only when every ring slot belongs to the current sample
            # (ops/msmv_sampling.py _yfold_forward). Costs re-decode on
            # out-of-window revisits; sequential val never revisits.
            self.cache_size = num_frames
        # filename -> ring slot, insertion-ordered (FIFO evict, reference
        # sparsebev.py:290-292)
        self.slot_of_key: "OrderedDict[str, int]" = OrderedDict()
        # key -> in-flight device array from prefetch_upload (H2D
        # double-buffering: sample i+1's frame pixels transfer while sample
        # i's forward runs; infer() consumes entries instead of re-uploading)
        self._pending: dict = {}
        self.ring = None    # per-level table ring (device buffers)
        self._meta = None   # single-frame PackedFeatures geometry (static)
        self._head = None   # built lazily once _meta is known
        self._copy = None   # jitted ring_copy_slot, built with _head

        self._pack_frame = jax.jit(lambda v, img: model.apply(
            v, img, train=False, method=model.forward_frame_packed))
        # donate the ring so the slice update happens in place
        self._update = jax.jit(
            lambda ring, fp, slot: ring_update(ring, fp, slot),
            donate_argnums=(0,))

    def _build_head(self):
        model, coder, meta, t = self.model, self.coder, self._meta, self.num_frames
        mesh = self.mesh

        def _head(v, ring, slots_of_t, lidar2img, time_diff, image_h, image_w):
            packed = ring_packed(ring, slots_of_t, t, meta)
            preds = model.apply(v, packed, lidar2img, time_diff,
                                image_h, image_w, method=model.forward_head)
            if mesh is not None:
                from .parallel.query_parallel import constrain_preds
                preds = constrain_preds(preds, mesh)
            if coder is not None:
                return coder.decode(preds)
            return preds

        return jax.jit(_head, static_argnums=(5, 6))

    def _slot_for_new_frame(self, protected) -> int:
        used = set(self.slot_of_key.values())
        if len(used) < self.cache_size:
            # lowest free physical slot (not simply len(slot_of_key):
            # duplicate-frame aliasing below may evict without reinserting,
            # leaving holes anywhere in the slot space)
            return min(s for s in range(self.cache_size) if s not in used)
        # FIFO evict (reference :290-292) — but never a frame of the sample
        # being assembled (possible when cache_size is close to T)
        for victim in self.slot_of_key:
            if victim not in protected:
                return self.slot_of_key.pop(victim)
        raise RuntimeError("ring cache smaller than the frame window")

    def _dedupe_slots(self, slots, protected):
        """Make the sample's [T] slot list a bijection onto physical slots.

        The chunk-split gather (_yfold_forward) partitions points statically
        by PHYSICAL slot, which silently reads wrong chunks when the window
        maps two logical frames to one slot — normal at sequence start, where
        the loader pads missing history by repeating the keyframe (reference
        loading.py:59-72). Each duplicate occurrence gets its frame's table
        rows COPIED into a free physical slot (ring_copy_slot); alias slots
        are transient (not cached), so later frames may overwrite them.
        """
        seen, out = set(), []
        free = [s for s in range(self.cache_size)
                if s not in set(self.slot_of_key.values())]
        for s in slots:
            if s not in seen:
                seen.add(s)
                out.append(s)
                continue
            if free:
                dst = free.pop(0)
            else:
                for victim in self.slot_of_key:
                    if victim not in protected:
                        dst = self.slot_of_key.pop(victim)
                        break
                else:
                    raise RuntimeError(
                        "ring cache smaller than the frame window")
            self.ring = self._copy(self.ring, jnp.int32(s), jnp.int32(dst))
            seen.add(dst)
            out.append(dst)
        return out

    def _ensure_frame(self, key: str, frame_imgs_fn,
                      protected) -> int:
        """frame_imgs_fn: () -> [1, 6, H, W, 3] device array (lazy, so a
        cache hit uploads nothing). Returns the frame's ring slot."""
        if key in self.slot_of_key:
            return self.slot_of_key[key]
        fp = self._pack_frame(self.variables, frame_imgs_fn())
        if self.ring is None:
            # geometry-only copy (aux metadata survives tree_map; the
            # single-frame table buffers themselves are not retained)
            self._meta = jax.tree_util.tree_map(lambda _: None, fp)
            self.ring = ring_init(fp, self.cache_size,
                                  ring_table_dtypes(self.model, fp),
                                  ring_table_splits(self.model, fp,
                                                    self.cache_size),
                                  ring_table_gsplits(self.model, fp))
            self._head = self._build_head()
            meta = self._meta
            self._copy = jax.jit(
                lambda ring, src, dst: ring_copy_slot(ring, meta, src, dst),
                donate_argnums=(0,))
        slot = self._slot_for_new_frame(protected)
        self.ring = self._update(self.ring, fp, jnp.int32(slot))
        self.slot_of_key[key] = slot
        return slot

    def infer(self, img: np.ndarray, lidar2img: np.ndarray,
              time_diff: np.ndarray, filenames: List[str]):
        """img: [1, F*6, H, W, 3]; filenames: per-view file names (frame i is
        identified by its first view's name, reference :282-284). Under the
        loader's ``load_online`` FPS mode (reference loading.py:103-144) the
        pipeline skips decoding history frames, so F < T and every
        pixel-less frame MUST already be cached."""
        n = self.num_views
        frames_with_pixels = img.shape[1] // n
        t = len(filenames) // n if filenames else frames_with_pixels
        h, w = img.shape[2], img.shape[3]
        img = np.asarray(img)  # stay on host: upload ONLY uncached frames

        # normalize to absolute paths: keyframe filenames arrive absolute
        # from the dataset while sweep entries are relpath'd (reference
        # loading.py:132) — the cache key must be identical for the same
        # file in both roles
        import os
        keys = [os.path.abspath(filenames[i * n]) if filenames
                else f"frame_{i}" for i in range(t)]
        protected = set(keys)

        def upload(i):
            def fn():
                pend = self._pending.pop(keys[i], None)
                if pend is not None:
                    return pend       # H2D already in flight (prefetch_upload)
                if i >= frames_with_pixels:
                    raise RuntimeError(
                        f"history frame {i} ({keys[i]}) is not cached and "
                        "its pixels were skipped by load_online")
                return jnp.asarray(
                    np.ascontiguousarray(img[:, i * n:(i + 1) * n]))
            return fn

        slots = [self._ensure_frame(keys[i], upload(i), protected)
                 for i in range(t)]
        if self._split_mode and len(set(slots)) < t:
            slots = self._dedupe_slots(slots, protected)

        return self._head(self.variables, self.ring,
                          jnp.asarray(slots, jnp.int32),
                          jnp.asarray(lidar2img), jnp.asarray(time_diff),
                          h, w)

    def prefetch_upload(self, img: np.ndarray, filenames: List[str]):
        """Start the H2D transfer of a sample's uncached frame pixels NOW.

        Call with sample i+1's pixels before dispatching sample i's forward
        (H2D double-buffering): ``jax.device_put`` returns immediately with
        the copy in flight, and the later ``infer`` on the same sample
        consumes the in-flight array instead of a fresh synchronous upload.
        Steady-state streaming uploads exactly one frame per sample, so this
        hides the per-sample transfer behind the previous forward. Safe to
        skip entirely — ``infer`` is unchanged without it."""
        import os
        n = self.num_views
        frames_with_pixels = img.shape[1] // n
        img = np.asarray(img)
        for i in range(frames_with_pixels):
            key = (os.path.abspath(filenames[i * n]) if filenames
                   else f"frame_{i}")
            if key in self.slot_of_key or key in self._pending:
                continue
            self._pending[key] = jax.device_put(
                np.ascontiguousarray(img[:, i * n:(i + 1) * n]))
