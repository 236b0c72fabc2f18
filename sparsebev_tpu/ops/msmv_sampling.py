"""Multi-scale multi-view bilinear sampling (the reference's one custom op).

Semantics contract (mirrors the CUDA kernel + PyTorch fallback at
/root/reference/models/csrc/msmv_sampling/msmv_sampling_forward.cu:75-164 and
/root/reference/models/csrc/wrapper.py:14-38):

- ``mlvl_feats``: list of L feature pyramids, each ``[B, N, H_l, W_l, C]``
  (channel-last — the layout the CUDA op also uses, and TPU-native).
- ``sampling_locations``: ``[B, Q, P, 3]`` — x, y in [0, 1] with
  ``align_corners=True`` scaling (pixel = loc * (size - 1)), third coord is
  the view index normalized by ``1 / (N - 1)``; the view is selected by
  ``round(v * (N - 1))`` (nearest view, msmv_sampling_forward.cu:110).
- ``scale_weights``: ``[B, Q, P, L]`` per-level aggregation weights.
- Output: ``[B, Q, P, C]`` = sum_l w_l * bilinear(feat_l, x, y) with
  zero padding outside the image (per-tap border guard).

Implementations (all jit/vmap-safe, static shapes):

- :func:`msmv_sampling_reference` — direct per-level formulation; the
  readable oracle (analog of ``msmv_sampling_pytorch``).
- :func:`msmv_sampling` — production path. Forward: per-level Y-FOLD
  gathers over y-interleaved row tables ``[B*N*H, W+1, 2C]`` where row y
  holds ``feat[y] ‖ feat[y+1]`` on the channel axis — ONE ``lax.gather``
  index fetches all four bilinear taps as a (1, 2, 2C) slice. XLA's TPU
  gather cost is per-index and flat in payload size (measured on v5e:
  ~12-14 ns/idx for both (1,2,C) and (1,2,2C) slices), so folding y halves
  the sampling time vs the round-1 pair-gather: 11.9 -> 6.4 ms/layer fp32
  (10.2 -> 5.5 bf16) at r50 scale. Backward: a custom VJP routes gradients
  through a half-row formulation (2 single-row taps per point instead of 4)
  whose single-row scatter-adds are the fast scatter shape on TPU; this
  mirrors the CUDA col2im ``atomicAdd`` backward
  (msmv_sampling_backward.cu:29-105).
- ``set_sampling_impl("hybrid")`` — experimental inference-only MXU one-hot
  kernel for small levels (see ``msmv_pallas.py``); superseded by the y-fold
  gather (4-7 ms/level vs 5.5 ms for ALL levels) but kept as an opt-in.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np


# sampling implementation selector: "xla" (y-fold gather everywhere; default,
# differentiable) or "hybrid" (MXU one-hot Pallas kernel for small levels +
# y-fold gather for large ones; inference-only experiment).
_SAMPLING_IMPL = "xla"
# use the MXU path when a level's one-hot matmul work (N*H * W*C MACs per
# point) undercuts gather cost — see msmv_pallas.py STATUS before enabling
_MXU_LEVEL_MAX_ELEMS = 2_200_000


def set_sampling_impl(name: str) -> None:
    global _SAMPLING_IMPL
    assert name in ("xla", "hybrid"), name
    _SAMPLING_IMPL = name


def get_sampling_impl() -> str:
    return _SAMPLING_IMPL


@jax.tree_util.register_pytree_node_class
class PackedFeatures:
    """Per-level y-interleaved row tables ``[B*N*H_l, W_l + 1, 2C]``.

    Row ``y`` of each image holds ``feat[y] ‖ feat[y+1]`` concatenated on the
    channel axis (``feat[H]`` reads as zeros), plus one zero guard column on
    the right so an x0 = W-1 pair-slice reads a zero, never a neighbour.
    One ``lax.gather`` index then fetches all FOUR bilinear taps
    ``(y0,x0) (y0,x1) (y1,x0) (y1,x1)`` as a (1, 2, 2C) slice. Gather cost
    on TPU is per-index and flat in payload size (~12-14 ns/idx on v5e), so
    this halves sampling time vs pair-gathers at 2x feature memory.

    Packing copies the features once, so the decoder packs ONCE per forward
    and reuses the tables across its 6 weight-shared layers.

    Registered as a pytree with STATIC metadata (batch/num_views/shapes/
    channel count stay Python ints across jit boundaries).
    """

    def __init__(self, tables, batch, num_views, level_shapes, channels,
                 mxu_tables=(), num_groups=1, slice_map=None, yfold=True,
                 slice_groups=None):
        self.tables = tuple(tables)      # per level [rows, W+1, 2C] or None
        self.batch = batch               # slice count B' fed to the gather
        self.num_views = num_views
        self.level_shapes = tuple(level_shapes)
        self.channels = channels         # C (tables carry 2C)
        # row order: (bt, n, h, g) where a slice index s in [0, B') is
        # (bt = s // G, g = s % G). G = 1 for generically packed lists;
        # pack_mlvl_feats_grouped uses G = num_groups so the group split is
        # a LOCAL (W <-> G) permute instead of a global feature transpose.
        self.num_groups = num_groups
        # optional int32 [B'] logical->physical slice indirection (streaming
        # ring cache: the tables hold frames in ring-slot order, newest frame
        # is NOT slot 0). Applied before the per-point expansion, so it costs
        # a [B']-sized take, not a [K]-sized gather.
        self.slice_map = slice_map
        # Per-LEVEL table mode (a bool broadcasts to all levels).
        # yfold=True: rows carry feat[y] ‖ feat[y+1] (2C channels, ONE gather
        # index per point — the fast mode, 2x feature memory). yfold=False:
        # plain rows (C channels, TWO y-row gather indices per point — the
        # memory mode). 1600x640 T=15 configs pair-code ONLY level 0 (the 2x
        # memory of its y-fold table alone is ~6 GB of the 16 GB HBM) and
        # keep the small levels on the fast mode.
        if isinstance(yfold, bool):
            yfold = (yfold,) * len(self.level_shapes)
        self.yfold = tuple(yfold)
        # Streaming CHUNK-SPLIT mode (derived from structure, not stored):
        # a level whose ring is a TUPLE of per-slot-range buffers instead of
        # one array is gathered chunk-by-chunk. Rationale (measured v5e,
        # 2026-08-19): XLA's memory-space assignment prefetch-pipelines a
        # <=70 MB table buffer into VMEM while the previous chunk gathers,
        # moving that chunk's gathers from the HBM engine rate (~11.5
        # ns/idx) to the VMEM rate (~6.8 ns/idx). One 140-557 MB buffer
        # never prefetches; 35-70 MB chunks do. Index count is UNCHANGED —
        # points partition statically on the physical-slot axis after a
        # one-take permute (see _yfold_forward). bf16-exact vs unsplit.
        self.split = tuple(
            len(t) if isinstance(t, tuple) else 1 for t in self.tables)
        # GROUP-split mode (static sibling of the slot chunk-split; see
        # GroupSplitRing): the chunk a point reads is its group index, so
        # the partition is compile-time static — no permutes, no dedupe.
        self.gsplit = tuple(
            isinstance(t, GroupSplitRing) for t in self.tables)
        # STATIC group of each slice-axis position (tuple of len batch).
        # The slice AXIS ordering is caller-defined — ring_packed emits
        # (t, g) while the decoder's sampling_4d re-pack emits (b, g, t) —
        # so group-split levels cannot assume s % G; they partition by this
        # pattern instead. None is fine when no level is group-split.
        self.slice_groups = (None if slice_groups is None
                             else tuple(int(x) for x in slice_groups))
        # "hybrid" impl only: bf16 [B, N*H, W*C] tables for the MXU levels
        self.mxu_tables = tuple(mxu_tables)

    def tree_flatten(self):
        return ((self.tables, self.mxu_tables, self.slice_map),
                (self.batch, self.num_views, self.level_shapes, self.channels,
                 self.num_groups, self.yfold, self.slice_groups))

    @classmethod
    def tree_unflatten(cls, aux, children):
        tables, mxu_tables, slice_map = children
        return cls(tables, aux[0], aux[1], aux[2], aux[3], mxu_tables,
                   num_groups=aux[4], slice_map=slice_map, yfold=aux[5],
                   slice_groups=aux[6])

    def row_index(self, slice_idx, view, row_y, height):
        """Flat table row for (slice, view, y-row) under the row order above."""
        g = self.num_groups
        if g == 1:
            return (slice_idx * self.num_views + view) * height + row_y
        bt = slice_idx // g
        gi = slice_idx % g
        return ((bt * self.num_views + view) * height + row_y) * g + gi


def pack_mlvl_feats(mlvl_feats: Sequence[jnp.ndarray]) -> PackedFeatures:
    b, n = mlvl_feats[0].shape[0], mlvl_feats[0].shape[1]
    c = mlvl_feats[0].shape[-1]
    hybrid = _SAMPLING_IMPL == "hybrid"
    tables, shapes, mxu = [], [], []
    for feat in mlvl_feats:
        h, w = feat.shape[2], feat.shape[3]
        if hybrid and n * h * w * c <= _MXU_LEVEL_MAX_ELEMS:
            mxu.append(feat.reshape(b, n * h, w * c).astype(jnp.bfloat16))
            tables.append(None)
        else:
            mxu.append(None)
            # y-interleave: row y carries [feat[y], feat[y+1]] (zeros at H)
            f1 = jnp.concatenate(
                [feat[:, :, 1:], jnp.zeros_like(feat[:, :, :1])], axis=2)
            t = jnp.concatenate([feat, f1], axis=-1)   # [B, N, H, W, 2C]
            t = t.reshape(b * n * h, w, 2 * c)
            t = jnp.pad(t, ((0, 0), (0, 1), (0, 0)))   # zero guard column
            tables.append(t)
        shapes.append((h, w))
    return PackedFeatures(tuple(tables), b, n, tuple(shapes), c, tuple(mxu))


def pack_mlvl_feats_grouped(mlvl_feats: Sequence[jnp.ndarray],
                            num_views: int,
                            num_groups: int,
                            yfold: bool = True,
                            gsplit: bool = False) -> PackedFeatures:
    """Pack raw per-frame pyramids [B, T*N, H, W, C] directly into grouped
    y-fold tables, replacing the decoder's global [B,T,G,N,H,W,Cg] feature
    transpose (a full extra copy of the pyramid — ~4 ms at r50 scale on
    v5e) with a LOCAL (W <-> G) permute that XLA fuses into the table build.
    Row order: (b, t, n, h, g) — see PackedFeatures.row_index.

    ``yfold=False``: memory mode — plain [.., W+1, Cg] rows (1x feature
    memory instead of 2x) at the cost of a second y-row gather per point.
    A per-level sequence mixes modes (pair the huge level 0, y-fold the
    small levels).

    ``gsplit`` (bool or per-level): a marked level packs as ``num_groups``
    SEPARATE per-group chunk buffers (:class:`GroupSplitRing`, row order
    (b, t, n, h)) instead of one (b, t, n, h, g)-ordered table — the
    TRAIN/OFFLINE twin of the streaming ring's ``table_gsplit``: each chunk
    (r50 L1 at T=8: 139/4 = 35 MB) lands under XLA MSA's VMEM prefetch
    threshold, so both the forward's chunk gathers and the custom VJP's
    per-chunk single-row scatter-adds run against a prefetchable buffer.
    The partition is the STATIC group axis; differentiable end-to-end
    (each group's table build reads its own channel slice)."""
    n, g = num_views, num_groups
    b, tn = mlvl_feats[0].shape[0], mlvl_feats[0].shape[1]
    t = tn // n
    c = mlvl_feats[0].shape[-1]
    cg = c // g
    if isinstance(yfold, bool):
        yfold = (yfold,) * len(mlvl_feats)
    yfold = tuple(yfold)
    assert len(yfold) == len(mlvl_feats)
    if isinstance(gsplit, bool):
        gsplit = (gsplit,) * len(mlvl_feats)
    gsplit = tuple(bool(s) for s in gsplit)
    if len(gsplit) != len(mlvl_feats):
        raise ValueError(
            f"per-level gsplit sequence has {len(gsplit)} entries for "
            f"{len(mlvl_feats)} feature levels (check table_gsplit_pack in "
            "the config — inheriting configs that change num_levels must "
            "override the base's tuple)")
    from .msmv_pack_pallas import pack_level
    tables, shapes = [], []
    for feat, yf, gs in zip(mlvl_feats, yfold, gsplit):
        h, w = feat.shape[2], feat.shape[3]
        if gs:
            if not yf:
                raise ValueError("table_gsplit requires a yfold level")
            # one pack_level call per group on its channel slice (a lane
            # slice that fuses into the kernel's input read): total bytes
            # moved equal the unsplit pack — one pyramid read, one write
            bufs = []
            for gi in range(g):
                fs = feat[..., gi * cg:(gi + 1) * cg]
                t2 = pack_level(fs.reshape(b * t * n, h, w, cg), 1)
                bufs.append(t2.reshape(b * t * n * h, w + 1, 2 * cg))
            tables.append(GroupSplitRing(bufs))
        elif yf:
            t2 = pack_level(feat.reshape(b * t * n, h, w, c), g)
            tables.append(t2.reshape(b * t * n * h * g, w + 1, 2 * cg))
        else:
            # pair (memory) mode rows via the Pallas pack kernel: the XLA
            # transpose/pad chain re-materializes the big-config L0
            # pyramid (~7.4 ms/sample of glue on the vov99 trace)
            from .msmv_pack_pallas import pack_level_pair
            f = pack_level_pair(feat.reshape(b * t * n, h, w, c), g)
            tables.append(f.reshape(b * t * n * h * g, w + 1, cg))
        shapes.append((h, w))
    return PackedFeatures(tuple(tables), b * t * g, n, tuple(shapes), cg,
                          num_groups=g, yfold=yfold,
                          # native slice order is (b, t, g) — g minor (see
                          # row_index). Direct callers get length-1 runs
                          # (correct, more gathers); sampling_4d re-packs
                          # with its (b, g, t) order and T-length runs.
                          slice_groups=(tuple(s % g for s in range(b * t * g))
                                        if any(gsplit) else None))


def _lw_levels(scale_weights, k, num_levels):
    """Level weights [d0, d1, P, L] -> fp32 [L, K], built as L lane-slices.

    The obvious ``transpose(reshape(k, L))`` makes XLA materialize the
    L-minor tensor through a (8,128)-tiled relayout copy where only L of
    the 128 lanes carry data — measured 4.5 ms/sample at vov99 1600q/60s/L5
    scale (trace ops copy.2325 + reshape.13503, 2026-08-20) and ~0.5 at
    r50. Slicing each level out of the producer's own layout and stacking
    reads the same bytes with no transposing relayout (the lane-slice trick
    from :func:`_gmajor_forward`).

    Gated to L >= 5: at r50's L = 4 the relayout is only ~0.5 ms/sample
    and the slice-stack spelling measured a slight LOSS (43.33 vs 42.74
    ms, clean same-day A/B 2026-08-20) — an even minor dim tiles
    tolerably and four strided lane reads cost more than the one copy. At
    L = 5 (the 1600x640 configs) the odd minor dim makes the relayout
    pathological and the slices win."""
    if num_levels < 5:
        return jnp.transpose(
            scale_weights.reshape(k, num_levels)).astype(jnp.float32)
    sw32 = scale_weights.astype(jnp.float32)
    return jnp.stack([sw32[..., lvl].reshape(k) for lvl in range(num_levels)])


def _group_runs(slice_groups):
    """Segment the slice axis into maximal same-group runs.

    Returns ``(group, lo, hi)`` triples covering [0, len) in order — the
    static iteration structure of :func:`_gmajor_forward` (and the
    run-major half-row VJP primal)."""
    runs = []
    for s, gi in enumerate(slice_groups):
        if runs and runs[-1][0] == gi:
            runs[-1][2] = s + 1
        else:
            runs.append([gi, s, s + 1])
    return [tuple(r) for r in runs]


@jax.tree_util.register_pytree_node_class
class GroupSplitRing:
    """Marker pytree for a GROUP-split ring level: ``bufs[g]`` holds group
    ``g``'s table rows for ALL ring slots, ordered (slot, n, h).

    Group-split is the STATIC sibling of the slot chunk-split: the chunk a
    point belongs to is its (static) group index, not its (traced) ring
    slot — so the gather partitions with zero runtime permutes, the ring
    update writes every chunk with a plain dynamic_update_slice (no
    lax.switch pass-through copies), and duplicate frames in the T-window
    need no dedupe (the slot indirection stays inside the gather's index
    computation). r50 L1: 139 MB -> 4 x 35 MB chunks, each under XLA MSA's
    VMEM prefetch threshold (~11.5 -> ~6.8 ns/idx, measured v5e — see
    PackedFeatures.split for the mechanism)."""

    def __init__(self, bufs):
        self.bufs = tuple(bufs)

    def tree_flatten(self):
        return (self.bufs, None)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children)

    def __len__(self):
        return len(self.bufs)

    def __getitem__(self, i):
        return self.bufs[i]


def ring_init(frame_packed_meta: PackedFeatures, num_slots: int,
              dtype=jnp.bfloat16, split=1, gsplit=False):
    """Allocate an all-zero table ring with ``num_slots`` frame slots.

    ``frame_packed_meta`` supplies the per-frame table geometry (a
    single-frame ``pack_mlvl_feats_grouped`` result; its buffers are not
    read). ``dtype`` may be a single dtype or a per-level sequence — e.g.
    float8_e4m3fn for a level whose 1-byte table fits XLA's VMEM pinning
    budget (see inference.ring_table_dtypes). ``split`` (int or per-level
    sequence) > 1 allocates that level as ``split`` SEPARATE chunk buffers
    covering ``num_slots/split`` slots each, which XLA prefetch-pipelines
    into VMEM during the gathers (see PackedFeatures.split; separate
    buffers are required — slice views of one array do not prefetch,
    measured +1.5 ms/sample on v5e). ``gsplit`` (bool or per-level
    sequence) allocates that level as ``num_groups`` SEPARATE per-group
    chunk buffers instead — the static-partition variant (GroupSplitRing);
    mutually exclusive with ``split`` per level. Returns a per-level tuple
    of [S*N*H*G, W+1, 2Cg] arrays (or per-level chunk containers)."""
    shapes = frame_packed_meta.level_shapes
    if not isinstance(dtype, (list, tuple)):
        dtype = (dtype,) * len(shapes)
    if len(dtype) != len(shapes):
        raise ValueError(
            f"per-level dtype sequence has {len(dtype)} entries for "
            f"{len(shapes)} feature levels (check table_fp8 in the config)")
    if not isinstance(split, (list, tuple)):
        split = (split,) * len(shapes)
    if len(split) != len(shapes):
        raise ValueError(
            f"per-level split sequence has {len(split)} entries for "
            f"{len(shapes)} feature levels (check table_split in the config)")
    if not isinstance(gsplit, (list, tuple)):
        gsplit = (gsplit,) * len(shapes)
    if len(gsplit) != len(shapes):
        raise ValueError(
            f"per-level gsplit sequence has {len(gsplit)} entries for "
            f"{len(shapes)} feature levels (check table_gsplit in the config)")
    ring = []
    for (h, w), yf, dt, sp, gs in zip(shapes, frame_packed_meta.yfold, dtype,
                                      split, gsplit):
        ch = (2 if yf else 1) * frame_packed_meta.channels
        rows = frame_packed_meta.num_views * h * frame_packed_meta.num_groups
        if gs:
            if sp != 1:
                raise ValueError(
                    "table_split and table_gsplit are mutually exclusive "
                    "per level")
            if not yf:
                raise ValueError("table_gsplit requires a yfold level")
            g = frame_packed_meta.num_groups
            rows_g = frame_packed_meta.num_views * h
            ring.append(GroupSplitRing(
                jnp.zeros((num_slots * rows_g, w + 1, ch), dt)
                for _ in range(g)))
        elif sp == 1:
            ring.append(jnp.zeros((num_slots * rows, w + 1, ch), dt))
        else:
            if num_slots % sp:
                raise ValueError(
                    f"table_split={sp} must divide num_slots={num_slots}")
            if not yf:
                raise ValueError("table_split requires a yfold level")
            cf = num_slots // sp
            ring.append(tuple(jnp.zeros((cf * rows, w + 1, ch), dt)
                              for _ in range(sp)))
    return tuple(ring)


def ring_update(ring_tables, frame_packed: PackedFeatures, slot):
    """Write one frame's grouped tables into ring slot ``slot``.

    Streaming inference (reference models/sparsebev.py:255-321) re-extracts
    only the newest frame; history features stay on device. Keeping the
    y-fold gather tables themselves in an S-slot ring means the per-sample
    pack touches one frame's table bytes (a contiguous
    dynamic_update_slice) instead of rebuilding all T frames (~2.5 ms ->
    ~0.4 ms per sample at r50 scale on v5e).

    ring_tables: per-level [S*N*H*G, W+1, 2Cg] (row order (slot, n, h, g),
    B = 1); frame_packed: ``pack_mlvl_feats_grouped`` output for a single
    frame (batch B*T = 1). ``slot`` may be a traced int scalar.
    Returns the updated per-level table tuple.
    """
    assert frame_packed.batch == frame_packed.num_groups, \
        "ring_update expects single-frame, B=1 packed tables"
    def _cast(frame, dt):
        if dt == jnp.float8_e4m3fn and frame.dtype != dt:
            # e4m3 has no inf: out-of-range casts produce NaN (verified
            # with ml_dtypes), so saturate explicitly — rare post-FPN
            # outliers beyond +-448 must clamp, not poison the ring
            lim = float(jnp.finfo(jnp.float8_e4m3fn).max)
            frame = jnp.clip(frame.astype(jnp.float32), -lim, lim)
        return frame.astype(dt)

    out = []
    for ring, frame in zip(ring_tables, frame_packed.tables):
        rows_per_frame = frame.shape[0]
        if isinstance(ring, GroupSplitRing):
            # group-split level: the frame's rows are (n, h, g)-ordered; each
            # group's strided extraction lands in ITS chunk buffer at a plain
            # dynamic offset — every chunk updates, no lax.switch, no
            # pass-through copies (the whole point vs the slot chunk-split).
            g = len(ring)
            rows_g = rows_per_frame // g
            fr = _cast(frame, ring[0].dtype)
            fr = fr.reshape(rows_g, g, *frame.shape[1:])
            out.append(GroupSplitRing(
                jax.lax.dynamic_update_slice_in_dim(
                    buf, fr[:, gi], slot * rows_g, axis=0)
                for gi, buf in enumerate(ring.bufs)))
            continue
        if isinstance(ring, tuple):
            # chunk-split level: the new frame lands in ONE chunk buffer.
            # lax.switch picks it; pass-through branches forward the other
            # buffers (the pass-through copies are charged once per sample,
            # against the per-layer gather win — see _yfold_forward).
            sp = len(ring)
            assert ring[0].shape[0] % rows_per_frame == 0
            cf = ring[0].shape[0] // rows_per_frame   # frames per chunk
            fr = _cast(frame, ring[0].dtype)
            buf_i = (slot // cf) % sp
            off = (slot % cf) * rows_per_frame

            def _branch(b, _ring=ring, _fr=fr, _off=off):
                def br(r):
                    return tuple(
                        jax.lax.dynamic_update_slice_in_dim(
                            buf, _fr, _off, axis=0) if i == b else buf
                        for i, buf in enumerate(r))
                return br

            out.append(jax.lax.switch(
                buf_i, [_branch(b) for b in range(sp)], ring))
        else:
            assert ring.shape[0] % rows_per_frame == 0
            out.append(jax.lax.dynamic_update_slice_in_dim(
                ring, _cast(frame, ring.dtype), slot * rows_per_frame,
                axis=0))
    return tuple(out)


def ring_copy_slot(ring_tables, frame_packed_meta: PackedFeatures, src, dst):
    """Copy one frame's table rows from ring slot ``src`` to slot ``dst``.

    Needed by the chunk-split streaming mode: its static chunk partition
    requires the sample's [T] slot list to be a BIJECTION onto ring slots,
    but duplicate frames in the T-window are normal at sequence start (the
    reference pads missing history by repeating the keyframe,
    loading.py:59-72). StreamingDetector then duplicates the frame's table
    rows into a free physical slot instead of feeding a non-bijective
    slice_map to the split gather (which would silently read stale slots).
    ``src``/``dst`` may be traced int scalars. Returns the updated ring.
    """
    shapes = frame_packed_meta.level_shapes
    out = []
    for ring, (h, w) in zip(ring_tables, shapes):
        rows = (frame_packed_meta.num_views * h * frame_packed_meta.num_groups)
        if isinstance(ring, GroupSplitRing):
            rows_g = frame_packed_meta.num_views * h
            out.append(GroupSplitRing(
                jax.lax.dynamic_update_slice_in_dim(
                    buf,
                    jax.lax.dynamic_slice_in_dim(buf, src * rows_g, rows_g,
                                                 axis=0),
                    dst * rows_g, axis=0)
                for buf in ring.bufs))
            continue
        if isinstance(ring, tuple):
            sp = len(ring)
            cf = ring[0].shape[0] // rows            # frames per chunk
            src_buf = (src // cf) % sp
            src_off = (src % cf) * rows
            frame = jax.lax.switch(
                src_buf,
                [lambda r, _i=i: jax.lax.dynamic_slice_in_dim(
                    r[_i], src_off, rows, axis=0) for i in range(sp)],
                ring)
            dst_buf = (dst // cf) % sp
            dst_off = (dst % cf) * rows

            def _wr(b):
                def br(r):
                    return tuple(
                        jax.lax.dynamic_update_slice_in_dim(
                            buf, frame, dst_off, axis=0) if i == b else buf
                        for i, buf in enumerate(r))
                return br

            out.append(jax.lax.switch(
                dst_buf, [_wr(b) for b in range(sp)], ring))
        else:
            frame = jax.lax.dynamic_slice_in_dim(
                ring, src * rows, rows, axis=0)
            out.append(jax.lax.dynamic_update_slice_in_dim(
                ring, frame, dst * rows, axis=0))
    return tuple(out)


def ring_packed(ring_tables, slots_of_t, num_frames: int,
                frame_packed_meta: PackedFeatures) -> PackedFeatures:
    """View a table ring as PackedFeatures for the decoder.

    ``slots_of_t``: int32 [T] — physical ring slot of each logical frame
    (0 = newest). The indirection is carried as ``slice_map`` [T*G] and
    applied before the per-point index expansion (_flat_point_geometry),
    so it never becomes a K-sized gather.
    """
    g = frame_packed_meta.num_groups
    slots_of_t = slots_of_t.astype(jnp.int32)
    slice_map = (slots_of_t[:, None] * g
                 + jnp.arange(g, dtype=jnp.int32)[None]).reshape(num_frames * g)
    return PackedFeatures(
        ring_tables, num_frames * g, frame_packed_meta.num_views,
        frame_packed_meta.level_shapes, frame_packed_meta.channels,
        num_groups=g, slice_map=slice_map, yfold=frame_packed_meta.yfold,
        # slice axis here is (t, g): position s belongs to group s % g
        slice_groups=tuple(s % g for s in range(num_frames * g)))


def table_acc_dtype(packed: PackedFeatures):
    """Output/accumulator dtype of the sampling op.

    Matches the TABLE dtype for bf16/fp32 tables (per-level tap
    contractions still reduce in fp32; the consumer — AdaptiveMixing —
    casts to this dtype anyway, and at bf16 the matching accumulator halves
    its HBM traffic); anything else accumulates fp32. Both _yfold_forward
    and the custom VJP's halfrow primal MUST use this (jax.vjp rejects
    cotangents whose dtype differs from the primal output)."""
    t0 = packed.tables[0]
    if isinstance(t0, (tuple, GroupSplitRing)):
        t0 = t0[0]
    dt = t0.dtype if t0 is not None else jnp.float32
    return dt if dt in (jnp.bfloat16, jnp.float32) else jnp.float32


def _bilinear_taps(x_pix, y_pix, h, w):
    """Corner indices + weights for bilinear sampling with zero padding.

    Returns (ix0, iy0, ix1, iy1, w00, w01, w10, w11) where weights already
    include the out-of-bounds zero masking per tap.
    """
    x0 = jnp.floor(x_pix)
    y0 = jnp.floor(y_pix)
    lx = x_pix - x0
    ly = y_pix - y0
    hx = 1.0 - lx
    hy = 1.0 - ly

    ix0 = x0.astype(jnp.int32)
    iy0 = y0.astype(jnp.int32)
    ix1 = ix0 + 1
    iy1 = iy0 + 1

    def inb(ix, iy):
        return ((ix >= 0) & (ix <= w - 1) & (iy >= 0) & (iy <= h - 1))

    w00 = hy * hx * inb(ix0, iy0)  # (y0, x0)
    w01 = hy * lx * inb(ix1, iy0)  # (y0, x1)
    w10 = ly * hx * inb(ix0, iy1)  # (y1, x0)
    w11 = ly * lx * inb(ix1, iy1)  # (y1, x1)
    return (ix0, iy0, ix1, iy1), (w00, w01, w10, w11)


def _separable_slot_weights(x_pix, y_pix, h, w):
    """Slot indices + separable weights for the y-fold window gather.

    The gather window is rows ``ry`` (carrying y-taps ``ry`` and ``ry+1`` on
    channel halves) x columns ``[sx, sx+1]``. When the true ``ix0``/``iy0``
    is -1 the window shifts up/left by one, so the x1/y1 weight moves to the
    window's FIRST slot (the x0/y0 weight is already masked to 0 there).
    Returns (sx, ry, (wxa, wxb), (wya, wyb)) with border masks folded in;
    the four bilinear weights are the separable products wx*wy.
    """
    x0 = jnp.floor(x_pix)
    y0 = jnp.floor(y_pix)
    lx = x_pix - x0
    ly = y_pix - y0

    ix0 = x0.astype(jnp.int32)
    iy0 = y0.astype(jnp.int32)

    inx0 = (ix0 >= 0) & (ix0 <= w - 1)
    inx1 = (ix0 + 1 >= 0) & (ix0 + 1 <= w - 1)
    iny0 = (iy0 >= 0) & (iy0 <= h - 1)
    iny1 = (iy0 + 1 >= 0) & (iy0 + 1 <= h - 1)

    wx0 = (1.0 - lx) * inx0
    wx1 = lx * inx1
    wy0 = (1.0 - ly) * iny0
    wy1 = ly * iny1

    sh_x = ix0 < 0
    sx = jnp.clip(ix0, 0, w - 1)  # x1 then lands in the zero guard column
    wxa = jnp.where(sh_x, wx1, wx0)
    wxb = jnp.where(sh_x, 0.0, wx1)

    sh_y = iy0 < 0
    ry = jnp.clip(iy0, 0, h - 1)  # row H-1's second half is already zeros
    wya = jnp.where(sh_y, wy1, wy0)
    wyb = jnp.where(sh_y, 0.0, wy1)
    return sx, ry, (wxa, wxb), (wya, wyb)


def msmv_sampling_reference(mlvl_feats: Sequence[jnp.ndarray],
                            sampling_locations: jnp.ndarray,
                            scale_weights: jnp.ndarray) -> jnp.ndarray:
    """Readable per-level oracle. Shapes per module docstring."""
    assert scale_weights.shape[-1] == len(mlvl_feats)
    b, q, p, _ = sampling_locations.shape
    n = mlvl_feats[0].shape[1]
    c = mlvl_feats[0].shape[-1]

    x = sampling_locations[..., 0]
    y = sampling_locations[..., 1]
    v = sampling_locations[..., 2]
    view = jnp.round(v * (n - 1)).astype(jnp.int32)
    view = jnp.clip(view, 0, n - 1)

    out = jnp.zeros((b, q, p, c), dtype=jnp.float32)
    batch_idx = jnp.arange(b)[:, None, None]
    for lvl, feat in enumerate(mlvl_feats):
        h, w = feat.shape[2], feat.shape[3]
        x_pix = x * (w - 1)
        y_pix = y * (h - 1)
        (ix0, iy0, ix1, iy1), (w00, w01, w10, w11) = _bilinear_taps(x_pix, y_pix, h, w)
        ix0c, ix1c = jnp.clip(ix0, 0, w - 1), jnp.clip(ix1, 0, w - 1)
        iy0c, iy1c = jnp.clip(iy0, 0, h - 1), jnp.clip(iy1, 0, h - 1)
        tap = (feat[batch_idx, view, iy0c, ix0c] * w00[..., None]
               + feat[batch_idx, view, iy0c, ix1c] * w01[..., None]
               + feat[batch_idx, view, iy1c, ix0c] * w10[..., None]
               + feat[batch_idx, view, iy1c, ix1c] * w11[..., None])
        out = out + tap.astype(jnp.float32) * scale_weights[..., lvl:lvl + 1].astype(jnp.float32)
    return out


def _flat_point_geometry(packed: PackedFeatures, sampling_locations,
                         qmajor: bool = False):
    """Shared per-point geometry: flat x/y in [0,1], view row base.

    Point order: ``[S, Q, P]`` (slice-major, default) or ``[Q, S, P]``
    (query-major) — the latter lets the output reshape straight into the
    decoder's mixing layout [B*Q, G, T*P, C] with no feature-domain
    transpose (see sampling_4d)."""
    if qmajor:
        q, s, p, _ = sampling_locations.shape
    else:
        s, q, p, _ = sampling_locations.shape
    n = packed.num_views
    k = s * q * p
    x = sampling_locations[..., 0].reshape(k)
    y = sampling_locations[..., 1].reshape(k)
    v = sampling_locations[..., 2].reshape(k)
    view = jnp.clip(jnp.round(v * (n - 1)).astype(jnp.int32), 0, n - 1)
    slices = (jnp.arange(s, dtype=jnp.int32) if packed.slice_map is None
              else packed.slice_map.astype(jnp.int32))
    if qmajor:  # K = (q, s, p): tile the per-slice pattern over queries
        batch_row = jnp.broadcast_to(
            jnp.repeat(slices, p, total_repeat_length=s * p)[None],
            (q, s * p)).reshape(k)
    else:       # K = (s, q, p)
        batch_row = jnp.repeat(slices, q * p, total_repeat_length=k)
    return x, y, view, batch_row, k


def _halfrow_runmajor(packed: PackedFeatures, x, y, view, batch_row,
                      lw_levels, q, b, p, runs):
    """Run-major half-row walk for group-split tables (the VJP primal).

    Structure mirrors :func:`_gmajor_forward` — geometry lane-sliced per
    same-group run, per-run accumulators, pieces concatenated straight into
    [Q, S, P, C] — but reads half-row taps (two (1, 1, 2C) single-row takes
    per point) instead of the (1, 2, 2C) window gather. Under ``jax.vjp``
    the transposed graph then scatter-adds each run's cotangents into ITS
    per-group chunk buffer: single-row adds (the fast scatter shape, ~16x
    vs multi-column slice scatters on v5e) against a <=70 MB chunk that XLA
    MSA can prefetch-pipeline — the training twin of the forward's
    group-split gather win. Non-gsplit levels take from their full table
    with run-sliced indices (same index count as the flat-[K] walk).
    Reference backward contract: msmv_sampling_backward.cu:108-224.
    """
    n = packed.num_views
    c = packed.channels
    gg = packed.num_groups
    num_levels = len(packed.level_shapes)

    def gsl(a, lo, hi):
        # lane-dim slice of the [Q, S*P] view (see _gmajor_forward.gsl)
        return jax.lax.slice_in_dim(a.reshape(q, b * p), lo * p, hi * p,
                                    axis=1).reshape(-1)

    pieces = []
    for gi, lo, hi in runs:
        xg = gsl(x, lo, hi)
        yg = gsl(y, lo, hi)
        vg = gsl(view, lo, hi)
        brg = gsl(batch_row, lo, hi)
        lwg = jax.lax.slice_in_dim(
            lw_levels.reshape(num_levels, q, b * p), lo * p, hi * p,
            axis=2).reshape(num_levels, -1)
        kg = q * (hi - lo) * p
        og = jnp.zeros((kg, c), jnp.float32)
        for lvl in range(num_levels):
            h, w = packed.level_shapes[lvl]
            row_ch = (2 if packed.yfold[lvl] else 1) * c
            if packed.gsplit[lvl]:
                # chunk rows index by (bt, n, h) alone — the group is the
                # buffer choice (see _gmajor_forward's row computation)
                flat = packed.tables[lvl][gi].reshape(-1, row_ch)
                base = (brg // gg * n + vg) * h
            else:
                flat = packed.tables[lvl].reshape(-1, row_ch)
                base = None
            sx, ry, (wxa, wxb), (wya, wyb) = _separable_slot_weights(
                xg * (w - 1), yg * (h - 1), h, w)
            lw = lwg[lvl]
            if packed.yfold[lvl]:
                row = ((base + ry if base is not None
                        else packed.row_index(brg, vg, ry, h)) * (w + 1))
                wy = jnp.stack([wya, wyb], -1).astype(jnp.float32)  # [Kg, 2]
                for slot, wx in ((0, wxa), (1, wxb)):
                    gch = jnp.take(flat, row + sx + slot,
                                   axis=0).astype(jnp.float32)
                    gch = gch.reshape(kg, 2, c)
                    og = og + (gch * wy[..., None]).sum(1) * (wx * lw)[:, None]
            else:
                assert not packed.gsplit[lvl], \
                    "group-split levels store yfold tables"
                for row_y, wyv in ((ry, wya),
                                   (jnp.minimum(ry + 1, h - 1), wyb)):
                    row = packed.row_index(brg, vg, row_y, h) * (w + 1)
                    for slot, wx in ((0, wxa), (1, wxb)):
                        gch = jnp.take(flat, row + sx + slot,
                                       axis=0).astype(jnp.float32)
                        og = og + gch * (wx * wyv * lw)[:, None]
        pieces.append(og.reshape(q, hi - lo, p, c))
    return jnp.concatenate(pieces, axis=1)   # [Q, S, P, C]


def _msmv_halfrow(qmajor: bool,
                  packed: PackedFeatures,
                  sampling_locations: jnp.ndarray,
                  scale_weights: jnp.ndarray) -> jnp.ndarray:
    """Two-indices-per-point formulation over the y-fold tables.

    Reads the two x slots of the window as separate (1, 1, 2C) row taps.
    Slower FORWARD than the windowed gather (2x the indices), but its
    BACKWARD is the one XLA handles well: single-row scatter-adds are ~16x
    faster than multi-column slice scatters (measured on v5e), and folding
    y into channels halves the scatter count vs a plain single-tap form —
    so the custom VJP below routes gradients here.
    """
    num_levels = len(packed.level_shapes)
    assert all(s == 1 for s in packed.split), \
        "table_split rings are streaming-inference-only (no VJP path: the " \
        "slot partition is runtime data)"
    d0, d1, p, _ = sampling_locations.shape
    n = packed.num_views
    c = packed.channels
    x, y, view, batch_row, k = _flat_point_geometry(
        packed, sampling_locations, qmajor)
    # single materialization of the shared geometry (see _yfold_forward);
    # in the VJP this also keeps the transposed graph flat-[K]-shaped
    lw_levels = _lw_levels(scale_weights, k, num_levels)  # [L, K]
    x, y, view, batch_row, lw_levels = jax.lax.optimization_barrier(
        (x, y, view, batch_row, lw_levels))

    if any(packed.gsplit):
        # run-major half-row primal (see _halfrow_runmajor): its transposed
        # graph scatter-adds into the per-group CHUNK buffers — the training
        # twin of the forward's group-split gather win
        assert qmajor, "table_gsplit requires the query-major layout"
        assert packed.slice_groups is not None, \
            "group-split tables need PackedFeatures.slice_groups"
        q, b = d0, d1
        out = _halfrow_runmajor(packed, x, y, view, batch_row, lw_levels,
                                q, b, p, _group_runs(packed.slice_groups))
        return out.astype(table_acc_dtype(packed))

    out = jnp.zeros((k, c), jnp.float32)
    for lvl in range(num_levels):
        h, w = packed.level_shapes[lvl]
        row_ch = (2 if packed.yfold[lvl] else 1) * c
        flat = packed.tables[lvl].reshape(-1, row_ch)
        sx, ry, (wxa, wxb), (wya, wyb) = _separable_slot_weights(
            x * (w - 1), y * (h - 1), h, w)
        lw = lw_levels[lvl]
        if packed.yfold[lvl]:
            row = packed.row_index(batch_row, view, ry, h) * (w + 1)
            wy = jnp.stack([wya, wyb], -1).astype(jnp.float32)  # [K, 2]
            for slot, wx in ((0, wxa), (1, wxb)):
                g = jnp.take(flat, row + sx + slot,
                             axis=0).astype(jnp.float32)
                g = g.reshape(k, 2, c)  # (y-half, C)
                out = out + (g * wy[..., None]).sum(1) * (wx * lw)[:, None]
        else:
            # memory mode: four single-row taps (same fast scatter shape in
            # the transposed/backward direction)
            for row_y, wy in ((ry, wya),
                              (jnp.minimum(ry + 1, h - 1), wyb)):
                row = packed.row_index(batch_row, view, row_y, h) * (w + 1)
                for slot, wx in ((0, wxa), (1, wxb)):
                    g = jnp.take(flat, row + sx + slot,
                                 axis=0).astype(jnp.float32)
                    out = out + g * (wx * wy * lw)[:, None]
    # internal math stays fp32; output dtype via the shared rule (see
    # table_acc_dtype — it must match _yfold_forward's)
    return out.reshape(d0, d1, p, c).astype(table_acc_dtype(packed))


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _msmv_yfold(qmajor: bool, packed: PackedFeatures, sampling_locations,
                scale_weights):
    return _yfold_forward(qmajor, packed, sampling_locations, scale_weights)


def _msmv_yfold_fwd(qmajor, packed, sampling_locations, scale_weights):
    return (_yfold_forward(qmajor, packed, sampling_locations, scale_weights),
            (packed, sampling_locations, scale_weights))


def _msmv_yfold_bwd(qmajor, res, g):
    packed, loc, sw = res
    _, vjp = jax.vjp(functools.partial(_msmv_halfrow, qmajor),
                     packed, loc, sw)
    return vjp(g)


_msmv_yfold.defvjp(_msmv_yfold_fwd, _msmv_yfold_bwd)


def msmv_sampling(mlvl_feats: Union[PackedFeatures, Sequence[jnp.ndarray]],
                  sampling_locations: jnp.ndarray,
                  scale_weights: jnp.ndarray,
                  qmajor: bool = False) -> jnp.ndarray:
    """Production path.

    Equivalent to :func:`msmv_sampling_reference`; property-tested against it.
    Accepts either a level list or :class:`PackedFeatures` (pre-flattened —
    pack once per decoder forward, reuse across the 6 layers). Forward runs
    the y-fold window gather (or the hybrid MXU kernel when enabled);
    gradients route through the half-row formulation via a custom VJP.
    ``qmajor``: locations/weights arrive [Q, S, P, ...] instead of
    [S, Q, P, ...] and the output is [Q, S, P, C] (see
    ``_flat_point_geometry``).
    """
    if not isinstance(mlvl_feats, PackedFeatures):
        mlvl_feats = pack_mlvl_feats(mlvl_feats)
    if not any(t is not None for t in mlvl_feats.mxu_tables):
        return _msmv_yfold(qmajor, mlvl_feats, sampling_locations,
                           scale_weights)
    # hybrid (inference-only) path
    assert not qmajor, "hybrid MXU impl supports slice-major order only"
    return _yfold_forward(qmajor, mlvl_feats, sampling_locations,
                          scale_weights)


def _fold_window_taps(g2, fxa, fxb, fya, fyb, c):
    """y-fold window tap contraction: [Kx, 2, 2C] gather window -> [Kx, C].

    Single expression, 4 lane/window slices of ``g2``, one output — the
    x fold runs as bf16 products with fp32 adds, then the y/level weights
    fold in fp32; every op stays in the gather's native channel-minor
    layout (see the layout rationale on the unsplit yfold branch)."""
    if g2.dtype == jnp.float8_e4m3fn:
        g2 = g2.astype(jnp.bfloat16)
    xa = fxa[:, None].astype(g2.dtype)
    xb = fxb[:, None].astype(g2.dtype)
    return (((g2[:, 0, :c] * xa).astype(jnp.float32)
             + (g2[:, 1, :c] * xb).astype(jnp.float32)) * fya
            + ((g2[:, 0, c:] * xa).astype(jnp.float32)
               + (g2[:, 1, c:] * xb).astype(jnp.float32)) * fyb)


def _gmajor_forward(packed: PackedFeatures, x, y, view, batch_row,
                    lw_levels, q, b, p, runs, window_dnums, acc_dtype):
    """GROUP-MAJOR level loop for group-split tables (streaming AND packed).

    The per-level gsplit branch this replaced was measured a WASH on v5e
    (2026-08-19 trace diff, docs/ROADMAP.md): its chunk gathers hit the
    fast MSA-prefetch rate (~6.4-7.7 ns/idx vs 11.5 unsplit) but per layer
    the glue gave the ~0.5 ms win back — an un-fused level accumulate, a
    [Q,S*P*C] -> [K,C] chunk reassembly, and per-level geometry-operand
    slices. This loop restructures the WHOLE level walk group-major
    instead: geometry is lane-sliced once per run (not per level), each run
    accumulates its own [Kg, C] so the level adds fuse into the fold
    fusions exactly like the unsplit path, and the per-run pieces
    concatenate straight into the [Q, S, P, C] output (the caller's own
    layout) with no flat-[K] reassembly. Non-gsplit levels gather from
    their full table with run-sliced indices — same index count, same
    rate, so only the chunked levels' gathers get faster and no glue term
    scales with the level count.

    Inputs are the flat-[K] barriered geometry of :func:`_yfold_forward`;
    ``runs`` is the static segmentation of the slice axis into maximal
    same-group runs: ``(group, lo, hi)`` triples covering [0, b) in order.
    The decoder's (b, g, t) slice order yields B*G runs of length T (one
    per group when B = 1 — the streaming case); any other static order
    still partitions correctly, just into more/smaller gathers.
    """
    n = packed.num_views
    c = packed.channels
    gg = packed.num_groups
    num_levels = len(packed.level_shapes)

    def gsl(a, lo, hi):
        # lane-dim slice of the [Q, S*P] view of the flat [K] geometry —
        # a [Q, S, P] reshape instead tiles P=4 into lanes and
        # relayout-copies every operand (+2 ms/sample, profiled 2026-08-19)
        return jax.lax.slice_in_dim(a.reshape(q, b * p), lo * p, hi * p,
                                    axis=1).reshape(-1)

    pieces = []
    for gi, lo, hi in runs:
        xg = gsl(x, lo, hi)
        yg = gsl(y, lo, hi)
        vg = gsl(view, lo, hi)
        brg = gsl(batch_row, lo, hi)
        lwg = jax.lax.slice_in_dim(
            lw_levels.reshape(num_levels, q, b * p), lo * p, hi * p,
            axis=2).reshape(num_levels, -1)
        kg = q * (hi - lo) * p
        og = jnp.zeros((kg, c), acc_dtype)
        for lvl in range(num_levels):
            h, w = packed.level_shapes[lvl]
            sx, ry, (wxa, wxb), (wya, wyb) = _separable_slot_weights(
                xg * (w - 1), yg * (h - 1), h, w)
            lw = lwg[lvl]
            if packed.yfold[lvl]:
                if packed.gsplit[lvl]:
                    # chunk tables are per-group: rows index by physical
                    # SLOT alone (the packed slice space is (b, t, g) with
                    # g minor, so slot = physical_index // G)
                    table = packed.tables[lvl][gi]
                    row = (brg // gg * n + vg) * h + ry
                else:
                    table = packed.tables[lvl]
                    row = packed.row_index(brg, vg, ry, h)
                starts = jnp.stack([row, sx], axis=-1)
                gch = jax.lax.gather(table, starts, window_dnums,
                                     slice_sizes=(1, 2, 2 * c),
                                     mode="promise_in_bounds")
                lvl_out = _fold_window_taps(gch[:, 0], wxa, wxb,
                                            (wya * lw)[:, None],
                                            (wyb * lw)[:, None], c)
            else:
                # pair (memory) mode level: two (1, 2, C) x-window gathers,
                # one per y tap (group-split levels are always yfold)
                assert not packed.gsplit[lvl], \
                    "group-split levels store yfold tables"
                lvl_out = jnp.zeros((kg, c), jnp.float32)
                for row_y, wy in ((ry, wya),
                                  (jnp.minimum(ry + 1, h - 1), wyb)):
                    row = packed.row_index(brg, vg, row_y, h)
                    starts = jnp.stack([row, sx], axis=-1)
                    gch = jax.lax.gather(packed.tables[lvl], starts,
                                         window_dnums,
                                         slice_sizes=(1, 2, c),
                                         mode="promise_in_bounds")
                    g2 = gch[:, 0]
                    if g2.dtype == jnp.float8_e4m3fn:
                        g2 = g2.astype(jnp.bfloat16)
                    wyl = wy * lw
                    w0 = (wxa * wyl)[:, None].astype(g2.dtype)
                    w1 = (wxb * wyl)[:, None].astype(g2.dtype)
                    lvl_out = lvl_out + ((g2[:, 0] * w0).astype(jnp.float32)
                                         + (g2[:, 1] * w1).astype(jnp.float32))
            og = og + lvl_out.astype(acc_dtype)
            # per-level accumulator barrier: same VMEM-pressure rationale
            # as the unsplit branch (A/B'd 2026-08-17)
            og = jax.lax.optimization_barrier(og)
        pieces.append(og.reshape(q, hi - lo, p, c))
    return jnp.concatenate(pieces, axis=1)   # [Q, S, P, C]


def _yfold_forward(qmajor: bool,
                   mlvl_feats: PackedFeatures,
                   sampling_locations: jnp.ndarray,
                   scale_weights: jnp.ndarray) -> jnp.ndarray:
    packed = mlvl_feats
    num_levels = len(packed.level_shapes)
    assert scale_weights.shape[-1] == num_levels
    d0, d1, p, _ = sampling_locations.shape
    b, q = (d1, d0) if qmajor else (d0, d1)
    assert b == packed.batch
    n = packed.num_views
    c = packed.channels
    split = packed.split
    unperm = None
    assert not (any(s > 1 for s in split) and any(packed.gsplit)), \
        "slot chunk-split and group-split cannot mix (the slot permute " \
        "would break the group branch's static slice layout)"
    if any(s > 1 for s in split):
        # Chunk-split levels partition points by PHYSICAL ring slot, so the
        # slice axis is reordered into physical order ONCE (two small takes
        # per layer), every level runs on the permuted order with an
        # identity slice map, and the permutation is inverted on the
        # accumulated output (one [K, C] take). Works for ANY full slot
        # permutation (argsort), not just the bench loop's rotation.
        assert qmajor, "table_split requires the streaming query-major layout"
        sm = packed.slice_map
        if sm is None:
            sm = jnp.arange(b, dtype=jnp.int32)
        else:
            sm = sm.astype(jnp.int32)
        perm = jnp.argsort(sm)          # physical position -> logical slice
        sampling_locations = jnp.take(sampling_locations, perm, axis=1)
        scale_weights = jnp.take(scale_weights, perm, axis=1)
        unperm = sm                     # logical s lives at position sm[s]
        packed = PackedFeatures(
            packed.tables, packed.batch, packed.num_views,
            packed.level_shapes, packed.channels, packed.mxu_tables,
            num_groups=packed.num_groups, slice_map=None,
            yfold=packed.yfold)
    x, y, view, batch_row, k = _flat_point_geometry(
        packed, sampling_locations, qmajor)

    window_dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3), collapsed_slice_dims=(),
        start_index_map=(0, 1))

    acc_dtype = table_acc_dtype(packed)  # shared rule, see its docstring

    # Materialize the shared per-point geometry and the level weights ONCE
    # in flat [K] layout. Without the barrier XLA re-derives each from the
    # [Q, S, P]-shaped producers inside every level's fusion, paying a
    # lane->sublane relayout copy per level per layer (~3 ms/sample at
    # r50-900q, measured r3 profile: 0.6 ms x 5 copies of
    # f32[900,32,4,1]{0,1,3,2}->{2,1,0,3}).
    lw_levels = _lw_levels(scale_weights, k, num_levels)  # [L, K]
    x, y, view, batch_row, lw_levels = jax.lax.optimization_barrier(
        (x, y, view, batch_row, lw_levels))

    if any(packed.gsplit):
        # GROUP-MAJOR path: the whole level walk restructures group-major
        # over the static segmentation of the slice axis into same-group
        # runs — where the chunk gathers' MSA-prefetch win survives
        # composition (see _gmajor_forward). The decoder's (b, g, t) slice
        # order gives B*G runs of length T; ring_packed's native (t, g)
        # order degenerates to length-1 runs (correct, more gather calls).
        assert qmajor, "table_gsplit requires the query-major layout"
        assert packed.slice_groups is not None, \
            "group-split tables need PackedFeatures.slice_groups"
        assert not any(t is not None for t in (packed.mxu_tables or ())), \
            "table_gsplit cannot mix with the hybrid MXU path"
        return _gmajor_forward(packed, x, y, view, batch_row, lw_levels,
                               q, b, p, _group_runs(packed.slice_groups),
                               window_dnums, acc_dtype)

    out = jnp.zeros((k, c), acc_dtype)
    for lvl in range(num_levels):
        h, w = packed.level_shapes[lvl]
        x_pix = x * (w - 1)
        y_pix = y * (h - 1)

        if (packed.mxu_tables and lvl < len(packed.mxu_tables)
                and packed.mxu_tables[lvl] is not None):
            # MXU one-hot path (separable bilinear weights; see msmv_pallas)
            from .msmv_pallas import onehot_sample_level
            lw = lw_levels[lvl]
            x0f = jnp.floor(x_pix)
            y0f = jnp.floor(y_pix)
            lx = x_pix - x0f
            ly = y_pix - y0f
            ix0 = x0f.astype(jnp.int32)
            iy0 = y0f.astype(jnp.int32)
            inx0 = (ix0 >= 0) & (ix0 <= w - 1)
            inx1 = (ix0 + 1 >= 0) & (ix0 + 1 <= w - 1)
            iny0 = (iy0 >= 0) & (iy0 <= h - 1)
            iny1 = (iy0 + 1 >= 0) & (iy0 + 1 <= h - 1)
            wy0 = (1.0 - ly) * iny0 * lw
            wy1 = ly * iny1 * lw
            # slot window [s0, s0+1] with per-slot weight remap at both edges
            s0 = jnp.clip(ix0, 0, w - 2)
            wx0 = (jnp.where(s0 == ix0, (1.0 - lx) * inx0, 0.0)
                   + jnp.where(s0 == ix0 + 1, lx * inx1, 0.0))
            wx1 = (jnp.where(s0 + 1 == ix0, (1.0 - lx) * inx0, 0.0)
                   + jnp.where(s0 + 1 == ix0 + 1, lx * inx1, 0.0))
            rows0 = view * h + jnp.clip(iy0, 0, h - 1)
            rows1 = view * h + jnp.clip(iy0 + 1, 0, h - 1)
            kk = q * p
            res = onehot_sample_level(
                packed.mxu_tables[lvl],
                rows0.reshape(b, kk), rows1.reshape(b, kk),
                wy0.reshape(b, kk), wy1.reshape(b, kk),
                s0.reshape(b, kk),
                wx0.reshape(b, kk), wx1.reshape(b, kk),
                w=w, c=c,
                interpret=jax.default_backend() == "cpu")
            out = out + res.reshape(k, c).astype(out.dtype)
            continue

        sx, ry, (wxa, wxb), (wya, wyb) = _separable_slot_weights(
            x_pix, y_pix, h, w)
        lw = lw_levels[lvl]

        def _fold_window(g2, fxa, fxb, fya, fyb):
            return _fold_window_taps(g2, fxa, fxb, fya, fyb, c)

        if split[lvl] > 1:
            # chunk-split ring level: one gather per chunk buffer over the
            # statically-sliced physical-slot range. Same index count; each
            # <=70 MB chunk buffer gets MSA-prefetched into VMEM while its
            # predecessor gathers (~11.5 -> ~6.8 ns/idx on v5e — the win
            # the whole mode exists for).
            sp = split[lvl]
            assert packed.yfold[lvl], "table_split requires yfold tables"
            sg = b // sp                       # slices per chunk

            def ch(a, ci):
                return jax.lax.slice_in_dim(
                    a.reshape(q, b, p), ci * sg, (ci + 1) * sg,
                    axis=1).reshape(-1)

            pieces = []
            for ci in range(sp):
                row = packed.row_index(ch(batch_row, ci) - ci * sg,
                                       ch(view, ci), ch(ry, ci), h)
                starts = jnp.stack([row, ch(sx, ci)], axis=-1)
                gch = jax.lax.gather(packed.tables[lvl][ci], starts,
                                     window_dnums, slice_sizes=(1, 2, 2 * c),
                                     mode="promise_in_bounds")
                lwc = ch(lw, ci)
                piece = _fold_window(gch[:, 0], ch(wxa, ci), ch(wxb, ci),
                                     (ch(wya, ci) * lwc)[:, None],
                                     (ch(wyb, ci) * lwc)[:, None])
                pieces.append(piece.reshape(q, sg, p, c))
            lvl_out = jnp.concatenate(pieces, axis=1).reshape(k, c)
            out = out + lvl_out.astype(acc_dtype)
            out = jax.lax.optimization_barrier(out)
            continue

        if packed.yfold[lvl]:
            row = packed.row_index(batch_row, view, ry, h)
            starts = jnp.stack([row, sx], axis=-1)            # [K, 2]
            g = jax.lax.gather(packed.tables[lvl], starts, window_dnums,
                               slice_sizes=(1, 2, 2 * c),
                               mode="promise_in_bounds")      # [K, 1, 2, 2C]
            # tap contraction WITHOUT the (2, 2C) -> (4, C) reshape: that
            # reshape splits the lane dim, so XLA relayout-copies the whole
            # gather output to K-minor before the multiplies (~0.7 ms copy
            # + ~1.05 ms K-minor multiply per level, r3 profile). Slicing
            # the window dim (x taps) and the lane halves (y-folded
            # channels) keeps every op in the gather's native channel-minor
            # layout: x fold as bf16 products with fp32 adds, then the y/
            # level weights fold in fp32. Measured (micro-bench at exact
            # shapes, 2026-08-17): 5.76 vs 6.64 ms/layer for gather+fold.
            # Ruled out earlier: jnp.sum(axis=1) (+1.2 ms), einsum
            # (+4.3 ms), fused Pallas epilogue
            # (ops/msmv_epilogue_pallas.py STATUS: gather fusion regrows
            # ~5 ms with a custom-call consumer).
            # single expression, 4 lane/window slices of g[:, 0], one
            # output (see _fold_window): a two-stage form (row = x-fold;
            # then slice row twice for the y-fold) gives `row` two
            # consumers, XLA splits it into two fusions per level, and the
            # materialized fp32 [K, 2C] intermediates evict the gather
            # outputs from VMEM (+5 ms on the gathers themselves, r3
            # profile). fp8 ring levels (streaming VMEM mode, see
            # inference.ring_table_dtypes) upcast inside the fold fusion —
            # e4m3 is scale-free, dequant is a pure convert.
            lvl_out = _fold_window(g[:, 0], wxa, wxb,
                                   (wya * lw)[:, None], (wyb * lw)[:, None])
            out = out + lvl_out.astype(acc_dtype)
            # barrier the accumulator each level: otherwise XLA merges the
            # four level adds into ONE fusion over all four level folds,
            # whose combined inputs again blow the VMEM budget (also
            # A/B'd 2026-08-17: barrier every SECOND level = 50.12
            # ms/sample vs 48.89 with the per-level barrier — the merged
            # fusion's extra VMEM pressure costs more than the saved
            # accumulator round trip)
            out = jax.lax.optimization_barrier(out)
        else:
            # memory mode: one (1, 2, C) x-window gather per y tap. wyb is
            # already 0 whenever row ry+1 would be invalid, so the clamp is
            # weight-safe.
            for row_y, wy in ((ry, wya),
                              (jnp.minimum(ry + 1, h - 1), wyb)):
                row = packed.row_index(batch_row, view, row_y, h)
                starts = jnp.stack([row, sx], axis=-1)
                g = jax.lax.gather(packed.tables[lvl], starts, window_dnums,
                                   slice_sizes=(1, 2, c),
                                   mode="promise_in_bounds")  # [K, 1, 2, C]
                # window-dim slices + [K, 1] broadcasts: same lane-layout
                # rationale as the yfold branch above (no K-minor relayout)
                g2 = g[:, 0]                                  # [K, 2, C]
                if g2.dtype == jnp.float8_e4m3fn:
                    g2 = g2.astype(jnp.bfloat16)
                wyl = wy * lw
                w0 = (wxa * wyl)[:, None].astype(g2.dtype)
                w1 = (wxb * wyl)[:, None].astype(g2.dtype)
                lvl_out = ((g2[:, 0] * w0).astype(jnp.float32)
                           + (g2[:, 1] * w1).astype(jnp.float32))
                out = out + lvl_out.astype(acc_dtype)

    out = out.reshape(d0, d1, p, c)   # [S, Q, P, C] or [Q, S, P, C]
    if unperm is not None:
        # back from physical-slot order to logical frame order
        out = jnp.take(out, unperm, axis=1)
    return out
