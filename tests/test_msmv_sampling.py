"""The sampling op is the framework's one custom kernel. Its correctness
contract is torch's ``F.grid_sample(mode=bilinear, padding=zeros,
align_corners=True)`` per level, weighted-summed — the reference's PyTorch
fallback (/root/reference/models/csrc/wrapper.py:14-38). We test:
  1. fused gather impl == readable reference impl (property test);
  2. both == the torch oracle;
  3. gradients are finite and match finite differences through the weights.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparsebev_tpu.ops import msmv_sampling, msmv_sampling_reference

B, N, Q, P, C = 2, 6, 8, 5, 16
LEVEL_SHAPES = [(16, 44), (8, 22), (4, 11), (2, 6)]


def _make_inputs(rng, loc_spread=1.4):
    feats = [rng.randn(B, N, h, w, C).astype(np.float32) for h, w in LEVEL_SHAPES]
    # locations straddling borders (some out of [0,1]) and exact view coords
    loc_xy = (rng.rand(B, Q, P, 2).astype(np.float32) * loc_spread) - (loc_spread - 1) / 2
    view = rng.randint(0, N, (B, Q, P, 1)).astype(np.float32) / (N - 1)
    loc = np.concatenate([loc_xy, view], axis=-1)
    w = rng.rand(B, Q, P, len(LEVEL_SHAPES)).astype(np.float32)
    w = w / w.sum(-1, keepdims=True)
    return feats, loc, w


def _torch_oracle(feats, loc, w):
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F
    # reference fallback: feats [B, C, N, H, W], 3D grid_sample, align_corners
    final = torch.zeros(B, C, Q, P)
    tloc = torch.from_numpy(loc) * 2 - 1
    tloc = tloc[:, :, :, None, :]  # [B, Q, P, 1, 3]
    for lvl, f in enumerate(feats):
        tf = torch.from_numpy(f).permute(0, 4, 1, 2, 3)  # [B, C, N, H, W]
        out = F.grid_sample(tf, tloc, mode="bilinear", padding_mode="zeros",
                            align_corners=True)[..., 0]
        final += out * torch.from_numpy(w[..., lvl]).reshape(B, 1, Q, P)
    return final.permute(0, 2, 3, 1).numpy()  # [B, Q, P, C]


def test_fused_matches_reference(rng):
    feats, loc, w = _make_inputs(rng)
    jf = [jnp.asarray(f) for f in feats]
    out_ref = np.asarray(msmv_sampling_reference(jf, jnp.asarray(loc), jnp.asarray(w)))
    out_fused = np.asarray(msmv_sampling(jf, jnp.asarray(loc), jnp.asarray(w)))
    np.testing.assert_allclose(out_fused, out_ref, rtol=1e-5, atol=1e-5)


def test_matches_torch_grid_sample(rng):
    feats, loc, w = _make_inputs(rng)
    want = _torch_oracle(feats, loc, w)
    jf = [jnp.asarray(f) for f in feats]
    got = np.asarray(msmv_sampling(jf, jnp.asarray(loc), jnp.asarray(w)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_out_of_image_is_zero(rng):
    feats, loc, w = _make_inputs(rng)
    loc[..., 0:2] = 7.5  # way outside
    jf = [jnp.asarray(f) for f in feats]
    got = np.asarray(msmv_sampling(jf, jnp.asarray(loc), jnp.asarray(w)))
    np.testing.assert_allclose(got, 0.0, atol=1e-6)


def test_gradients(rng):
    feats, loc, w = _make_inputs(rng, loc_spread=0.9)
    jf = [jnp.asarray(f) for f in feats]

    def loss_fn(loc_, w_, feats_):
        out = msmv_sampling(feats_, loc_, w_)
        return jnp.sum(out ** 2)

    g_loc, g_w = jax.grad(loss_fn, argnums=(0, 1))(jnp.asarray(loc), jnp.asarray(w), jf)
    assert np.isfinite(np.asarray(g_loc)).all()
    assert np.isfinite(np.asarray(g_w)).all()
    assert float(jnp.abs(g_loc).max()) > 0
    assert float(jnp.abs(g_w).max()) > 0

    # finite-difference check on scale weights (smooth everywhere)
    eps = 1e-3
    w0 = w.copy()
    w0[0, 0, 0, 0] -= eps
    w1 = w.copy()
    w1[0, 0, 0, 0] += eps
    f0 = float(loss_fn(jnp.asarray(loc), jnp.asarray(w0), jf))
    f1 = float(loss_fn(jnp.asarray(loc), jnp.asarray(w1), jf))
    fd = (f1 - f0) / (2 * eps)
    np.testing.assert_allclose(float(g_w[0, 0, 0, 0]), fd, rtol=2e-2, atol=1e-3)

    # gradient also flows to the feature maps
    g_f = jax.grad(lambda fs: loss_fn(jnp.asarray(loc), jnp.asarray(w), fs))(jf)
    assert any(float(jnp.abs(g).max()) > 0 for g in g_f)


def test_jit_and_dtype(rng):
    feats, loc, w = _make_inputs(rng)
    jf = [jnp.asarray(f, dtype=jnp.bfloat16) for f in feats]
    fn = jax.jit(lambda fs, l_, w_: msmv_sampling(fs, l_, w_))
    out = fn(jf, jnp.asarray(loc), jnp.asarray(w))
    # per-level tap contractions reduce in fp32; the cross-level accumulator
    # matches the table dtype (what the decoder's mixing consumes anyway)
    assert out.dtype == jnp.bfloat16
    want = np.asarray(msmv_sampling([jnp.asarray(f) for f in feats],
                                    jnp.asarray(loc), jnp.asarray(w)))
    np.testing.assert_allclose(np.asarray(out).astype(np.float32), want,
                               rtol=2e-2, atol=2e-2)


def test_grouped_pack_matches_generic(rng):
    """pack_mlvl_feats_grouped (local-permute table build, row order
    (b,t,n,h,g)) must equal the explicit [B,T,G,N,H,W,Cg] regroup + generic
    pack — forward and gradients."""
    from sparsebev_tpu.ops.msmv_sampling import (msmv_sampling,
                                                 pack_mlvl_feats,
                                                 pack_mlvl_feats_grouped)
    b, t, n, g, cg = 2, 3, 6, 4, 8
    c = g * cg
    q, p = 5, 4
    shapes = [(8, 12), (4, 6)]
    feats = [rng.randn(b, t * n, h, w, c).astype(np.float32) for h, w in shapes]
    loc = rng.rand(b * t * g, q, p, 3).astype(np.float32)
    loc[..., 2] = rng.randint(0, n, loc.shape[:-1]) / (n - 1)
    sw = rng.rand(b * t * g, q, p, len(shapes)).astype(np.float32)

    def explicit_group(feats_):
        out = []
        for feat in feats_:
            h, w = feat.shape[2], feat.shape[3]
            f = feat.reshape(b, t, n, h, w, g, cg)
            f = jnp.transpose(f, (0, 1, 5, 2, 3, 4, 6))
            out.append(f.reshape(b * t * g, n, h, w, cg))
        return out

    jf = [jnp.asarray(f) for f in feats]
    jl, jw = jnp.asarray(loc), jnp.asarray(sw)

    def loss_generic(fs):
        packed = pack_mlvl_feats(explicit_group(fs))
        return jnp.sum(msmv_sampling(packed, jl, jw) ** 2)

    def loss_grouped(fs):
        packed = pack_mlvl_feats_grouped(fs, num_views=n, num_groups=g)
        return jnp.sum(msmv_sampling(packed, jl, jw) ** 2)

    out_a = msmv_sampling(pack_mlvl_feats(explicit_group(jf)), jl, jw)
    out_b = msmv_sampling(pack_mlvl_feats_grouped(jf, n, g), jl, jw)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b),
                               rtol=1e-5, atol=1e-5)

    ga = jax.grad(loss_generic)(jf)
    gb = jax.grad(loss_grouped)(jf)
    for a_, b_ in zip(ga, gb):
        np.testing.assert_allclose(np.asarray(a_), np.asarray(b_),
                                   rtol=1e-4, atol=1e-4)


def test_ring_cache_matches_full_pack(rng):
    """Streaming ring semantics: per-frame packs written into permuted ring
    slots + the slice_map indirection must sample identically to packing the
    whole T-frame window at once (B=1, S > T exercises spare slots)."""
    from sparsebev_tpu.ops.msmv_sampling import (
        msmv_sampling, pack_mlvl_feats_grouped, ring_init, ring_packed,
        ring_update)
    t, n, g, cg = 3, 6, 2, 8
    c = g * cg
    q, p = 5, 4
    num_slots = t + 2
    shapes = [(8, 12), (4, 6)]
    feats = [rng.randn(1, t * n, h, w, c).astype(np.float32)
             for h, w in shapes]
    loc = rng.rand(t * g, q, p, 3).astype(np.float32)
    loc[..., 2] = rng.randint(0, n, loc.shape[:-1]) / (n - 1)
    sw = rng.rand(t * g, q, p, len(shapes)).astype(np.float32)

    jf = [jnp.asarray(f) for f in feats]
    jl, jw = jnp.asarray(loc), jnp.asarray(sw)
    want = msmv_sampling(pack_mlvl_feats_grouped(jf, n, g), jl, jw)

    # frames land in ring slots out of order: logical frame i -> slot
    slots_of_t = np.array([4, 0, 2], np.int32)
    fp0 = pack_mlvl_feats_grouped([f[:, :n] for f in jf], n, g)
    ring = ring_init(fp0, num_slots, jnp.float32)
    for i in range(t):
        fp = pack_mlvl_feats_grouped(
            [f[:, i * n:(i + 1) * n] for f in jf], n, g)
        ring = ring_update(ring, fp, jnp.int32(slots_of_t[i]))
    meta = jax.tree_util.tree_map(lambda _: None, fp0)
    packed = ring_packed(ring, jnp.asarray(slots_of_t), t, meta)
    got = msmv_sampling(packed, jl, jw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)

    # jit boundary: PackedFeatures with slice_map crosses as a pytree
    got_jit = jax.jit(msmv_sampling)(packed, jl, jw)
    np.testing.assert_allclose(np.asarray(got_jit), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_ring_fp8_matches_prequantized(rng):
    """fp8 streaming ring (per-level ring_init dtypes): sampling from a
    float8_e4m3fn ring must equal sampling from tables whose VALUES were
    pre-quantized to e4m3 and stored bf16 — i.e. quantization on ring write
    is the only difference; the fold math (upcast-to-bf16 dequant) is
    unchanged. Mixed per-level dtypes exercise the fp32-accumulated
    cross-level sum."""
    from sparsebev_tpu.ops.msmv_sampling import (
        msmv_sampling, pack_mlvl_feats_grouped, ring_init, ring_packed,
        ring_update)
    t, n, g, cg = 3, 6, 2, 8
    c = g * cg
    q, p = 5, 4
    shapes = [(8, 12), (4, 6)]
    feats = [rng.randn(1, t * n, h, w, c).astype(np.float32)
             for h, w in shapes]
    loc = rng.rand(t * g, q, p, 3).astype(np.float32)
    loc[..., 2] = rng.randint(0, n, loc.shape[:-1]) / (n - 1)
    sw = rng.rand(t * g, q, p, len(shapes)).astype(np.float32)
    jl, jw = jnp.asarray(loc), jnp.asarray(sw)

    def fill(ring, fns):
        fps = [pack_mlvl_feats_grouped(
            [fn(jnp.asarray(f[:, i * n:(i + 1) * n]))
             for fn, f in zip(fns, feats)], n, g) for i in range(t)]
        for i, fp in enumerate(fps):
            ring = ring_update(ring, fp, jnp.int32(i))
        meta = jax.tree_util.tree_map(lambda _: None, fps[0])
        return ring_packed(ring, jnp.arange(t, dtype=jnp.int32), t, meta)

    fp0 = pack_mlvl_feats_grouped(
        [jnp.asarray(f[:, :n]) for f in feats], n, g)
    ident = lambda x: x
    prequant = lambda x: x.astype(jnp.float8_e4m3fn).astype(jnp.bfloat16)

    # level 0 fp8, level 1 bf16 (mixed, like a real table_fp8=[True,False])
    got = msmv_sampling(
        fill(ring_init(fp0, t, (jnp.float8_e4m3fn, jnp.bfloat16)),
             (ident, ident)), jl, jw)
    # reference: bf16 ring, level-0 VALUES pre-quantized to e4m3
    want = msmv_sampling(
        fill(ring_init(fp0, t, jnp.bfloat16), (prequant, ident)), jl, jw)
    # sanity: quantization is not a no-op vs exact bf16
    exact = msmv_sampling(
        fill(ring_init(fp0, t, jnp.bfloat16), (ident, ident)), jl, jw)
    assert float(jnp.abs(want.astype(jnp.float32)
                         - exact.astype(jnp.float32)).max()) > 0
    np.testing.assert_allclose(np.asarray(got.astype(jnp.float32)),
                               np.asarray(want.astype(jnp.float32)),
                               rtol=1e-2, atol=1e-2)


def test_gradients_bf16_tables(rng):
    """Regression: with bf16 tables the forward emits bf16; the custom VJP's
    halfrow primal must emit the SAME dtype or jax.vjp rejects the cotangent
    (caught live on TPU where the decoder packs bf16 tables)."""
    feats, loc, w = _make_inputs(rng)
    jf = [jnp.asarray(f, dtype=jnp.bfloat16) for f in feats]
    jl, jw = jnp.asarray(loc), jnp.asarray(w)

    def loss(l_, w_):
        return msmv_sampling(jf, l_, w_).astype(jnp.float32).sum()

    gl, gw = jax.grad(loss, argnums=(0, 1))(jl, jw)
    assert bool(jnp.isfinite(gl).all()) and bool(jnp.isfinite(gw).all())


def test_pair_mode_matches_yfold(rng):
    """Memory mode (yfold=False: plain rows, 2 y-row gathers per point) must
    sample and differentiate identically to the y-fold mode, including the
    ring indirection."""
    from sparsebev_tpu.ops.msmv_sampling import (msmv_sampling,
                                                 pack_mlvl_feats_grouped)
    t, n, g, cg = 2, 6, 2, 8
    c = g * cg
    q, p = 5, 4
    shapes = [(8, 12), (4, 6)]
    feats = [rng.randn(1, t * n, h, w, c).astype(np.float32)
             for h, w in shapes]
    loc = (rng.rand(t * g, q, p, 3).astype(np.float32) * 1.3 - 0.15)
    loc[..., 2] = rng.randint(0, n, loc.shape[:-1]) / (n - 1)
    sw = rng.rand(t * g, q, p, len(shapes)).astype(np.float32)

    jf = [jnp.asarray(f) for f in feats]
    jl, jw = jnp.asarray(loc), jnp.asarray(sw)

    def loss(fs, yfold):
        packed = pack_mlvl_feats_grouped(fs, n, g, yfold=yfold)
        return jnp.sum(msmv_sampling(packed, jl, jw) ** 2)

    out_y = msmv_sampling(pack_mlvl_feats_grouped(jf, n, g, yfold=True),
                          jl, jw)
    out_p = msmv_sampling(pack_mlvl_feats_grouped(jf, n, g, yfold=False),
                          jl, jw)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_y),
                               rtol=1e-5, atol=1e-5)

    gy = jax.grad(lambda fs: loss(fs, True))(jf)
    gp = jax.grad(lambda fs: loss(fs, False))(jf)
    for a_, b_ in zip(gy, gp):
        np.testing.assert_allclose(np.asarray(a_), np.asarray(b_),
                                   rtol=1e-4, atol=1e-4)


def test_mixed_level_table_modes(rng):
    """Per-level table modes (pair the big level, y-fold the rest) must
    sample and differentiate identically to uniform modes."""
    from sparsebev_tpu.ops.msmv_sampling import (msmv_sampling,
                                                 pack_mlvl_feats_grouped)
    t, n, g, cg = 2, 6, 2, 8
    c = g * cg
    q, p = 5, 4
    shapes = [(8, 12), (4, 6)]
    feats = [rng.randn(1, t * n, h, w, c).astype(np.float32)
             for h, w in shapes]
    loc = (rng.rand(t * g, q, p, 3).astype(np.float32) * 1.3 - 0.15)
    loc[..., 2] = rng.randint(0, n, loc.shape[:-1]) / (n - 1)
    sw = rng.rand(t * g, q, p, len(shapes)).astype(np.float32)

    jf = [jnp.asarray(f) for f in feats]
    jl, jw = jnp.asarray(loc), jnp.asarray(sw)
    want = msmv_sampling(pack_mlvl_feats_grouped(jf, n, g, yfold=True),
                         jl, jw)
    got = msmv_sampling(
        pack_mlvl_feats_grouped(jf, n, g, yfold=(False, True)), jl, jw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)

    def loss(fs, yf):
        packed = pack_mlvl_feats_grouped(fs, n, g, yfold=yf)
        return jnp.sum(msmv_sampling(packed, jl, jw) ** 2)

    ga = jax.grad(lambda fs: loss(fs, True))(jf)
    gb = jax.grad(lambda fs: loss(fs, (False, True)))(jf)
    for a_, b_ in zip(ga, gb):
        np.testing.assert_allclose(np.asarray(a_), np.asarray(b_),
                                   rtol=1e-4, atol=1e-4)


def test_tap_fold_epilogue_matches_xla(rng):
    """The (not-wired, see STATUS) Pallas tap-fold epilogue must equal the
    production slice-add contraction on random gather outputs/weights."""
    from sparsebev_tpu.ops.msmv_epilogue_pallas import tap_fold_epilogue

    k, c, L = 600, 16, 3  # k deliberately not a k_blk multiple (pad path)
    gs = [jnp.asarray(rng.randn(k, 2, 2 * c).astype(np.float32))
          for _ in range(L)]
    ws = [jnp.asarray(rng.rand(k, 4).astype(np.float32)) for _ in range(L)]
    got = np.asarray(tap_fold_epilogue(gs, ws, c, jnp.float32,
                                       interpret=True))

    want = np.zeros((k, c), np.float32)
    for g, w in zip(gs, ws):
        g = np.asarray(g).reshape(k, 2, 2, c)  # (x-slot, y-half, C)
        w = np.asarray(w)
        want += (g[:, 0, 0] * (w[:, 0] * w[:, 2])[:, None]
                 + g[:, 0, 1] * (w[:, 0] * w[:, 3])[:, None]
                 + g[:, 1, 0] * (w[:, 1] * w[:, 2])[:, None]
                 + g[:, 1, 1] * (w[:, 1] * w[:, 3])[:, None])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_ring_chunk_split_matches_unsplit(rng):
    """Chunk-split streaming ring (table_split): per-level tuple-of-chunk
    buffers + the physical-slot point permutation must sample EXACTLY like
    the unsplit ring (same dtype, same per-point math — only the gather
    partitioning differs), for an arbitrary full slot permutation."""
    from sparsebev_tpu.ops.msmv_sampling import (
        msmv_sampling, pack_mlvl_feats_grouped, ring_init, ring_packed,
        ring_update)
    t, n, g, cg = 4, 6, 2, 8
    c = g * cg
    q, p = 5, 3
    shapes = [(8, 12), (4, 6)]
    feats = [rng.randn(1, t * n, h, w, c).astype(np.float32)
             for h, w in shapes]
    # query-major layout (the streaming head's): [Q, T*G, P, ...]
    loc = rng.rand(q, t * g, p, 3).astype(np.float32)
    loc[..., 2] = rng.randint(0, n, loc.shape[:-1]) / (n - 1)
    sw = rng.rand(q, t * g, p, len(shapes)).astype(np.float32)
    jf = [jnp.asarray(f) for f in feats]
    jl, jw = jnp.asarray(loc), jnp.asarray(sw)

    # frames land out of order; slots are a FULL permutation of 0..T-1
    slots_of_t = np.array([2, 0, 3, 1], np.int32)
    fp0 = pack_mlvl_feats_grouped([f[:, :n] for f in jf], n, g)
    meta = jax.tree_util.tree_map(lambda _: None, fp0)

    rings = {}
    for split in ((1, 1), (2, 1), (4, 2)):
        ring = ring_init(fp0, t, jnp.float32, split)
        for i in range(t):
            fp = pack_mlvl_feats_grouped(
                [f[:, i * n:(i + 1) * n] for f in jf], n, g)
            ring = ring_update(ring, fp, jnp.int32(slots_of_t[i]))
        rings[split] = ring

    def run(ring):
        packed = ring_packed(ring, jnp.asarray(slots_of_t), t, meta)
        return np.asarray(jax.jit(
            lambda pk: msmv_sampling(pk, jl, jw, qmajor=True))(packed))

    want = run(rings[(1, 1)])
    assert np.isfinite(want).all()
    for split in ((2, 1), (4, 2)):
        got = run(rings[split])
        np.testing.assert_array_equal(got, want, err_msg=str(split))


def test_ring_group_split_matches_unsplit(rng):
    """GROUP-split streaming ring (table_gsplit): per-group chunk buffers
    with the static group partition must sample EXACTLY like the unsplit
    ring — for an arbitrary slot permutation AND for a DUPLICATE-slot window
    (which the slot chunk-split cannot take without a dedupe fixup)."""
    from sparsebev_tpu.ops.msmv_sampling import (
        msmv_sampling, pack_mlvl_feats_grouped, ring_init, ring_packed,
        ring_update)
    t, n, g, cg = 4, 6, 2, 8
    c = g * cg
    q, p = 5, 3
    shapes = [(8, 12), (4, 6)]
    feats = [rng.randn(1, t * n, h, w, c).astype(np.float32)
             for h, w in shapes]
    loc = rng.rand(q, t * g, p, 3).astype(np.float32)
    loc[..., 2] = rng.randint(0, n, loc.shape[:-1]) / (n - 1)
    sw = rng.rand(q, t * g, p, len(shapes)).astype(np.float32)
    jf = [jnp.asarray(f) for f in feats]
    jl, jw = jnp.asarray(loc), jnp.asarray(sw)

    fp0 = pack_mlvl_feats_grouped([f[:, :n] for f in jf], n, g)
    meta = jax.tree_util.tree_map(lambda _: None, fp0)

    rings = {}
    for gs in (False, (True, False), (True, True)):
        ring = ring_init(fp0, t, jnp.float32, 1, gs)
        for i, slot in enumerate((2, 0, 3, 1)):
            fp = pack_mlvl_feats_grouped(
                [f[:, i * n:(i + 1) * n] for f in jf], n, g)
            ring = ring_update(ring, fp, jnp.int32(slot))
        rings[gs] = ring

    def run(ring, slots):
        packed = ring_packed(ring, jnp.asarray(slots, jnp.int32), t, meta)
        return np.asarray(jax.jit(
            lambda pk: msmv_sampling(pk, jl, jw, qmajor=True))(packed))

    for slots in ((2, 0, 3, 1), (3, 3, 1, 1)):  # permutation + duplicates
        want = run(rings[False], slots)
        assert np.isfinite(want).all()
        for gs in ((True, False), (True, True)):
            got = run(rings[gs], slots)
            np.testing.assert_array_equal(got, want,
                                          err_msg=f"gsplit={gs} {slots}")


def test_group_split_gmajor_mixed_yfold(rng):
    """GROUP-MAJOR fast path (the decoder's (b, g, t) slice order) with a
    MIXED yfold spec: level 0 in pair (memory) mode, level 1 y-fold and
    group-split — the vov99/eva02 big-config shape. ring_packed's (t, g)
    order takes the per-level gsplit branch; this test applies the same
    logical repack sampling_4d does (projection.py:236-251) so the whole
    level loop runs through _gmajor_forward, and checks exactness against
    the unsplit ring for a rotated AND a duplicate slot window."""
    from sparsebev_tpu.ops.msmv_sampling import (
        PackedFeatures, msmv_sampling, pack_mlvl_feats_grouped, ring_init,
        ring_packed, ring_update)
    t, n, g, cg = 4, 6, 2, 8
    c = g * cg
    q, p = 5, 3
    shapes = [(8, 12), (4, 6)]
    yfold = (False, True)
    feats = [rng.randn(1, t * n, h, w, c).astype(np.float32)
             for h, w in shapes]
    loc = rng.rand(q, t * g, p, 3).astype(np.float32)
    loc[..., 2] = rng.randint(0, n, loc.shape[:-1]) / (n - 1)
    sw = rng.rand(q, t * g, p, len(shapes)).astype(np.float32)
    jf = [jnp.asarray(f) for f in feats]
    jl, jw = jnp.asarray(loc), jnp.asarray(sw)

    fp0 = pack_mlvl_feats_grouped([f[:, :n] for f in jf], n, g, yfold=yfold)
    meta = jax.tree_util.tree_map(lambda _: None, fp0)

    rings = {}
    for gs in (False, (False, True)):
        ring = ring_init(fp0, t, jnp.float32, 1, gs)
        for i, slot in enumerate((2, 0, 3, 1)):
            fp = pack_mlvl_feats_grouped(
                [f[:, i * n:(i + 1) * n] for f in jf], n, g, yfold=yfold)
            ring = ring_update(ring, fp, jnp.int32(slot))
        rings[gs] = ring

    def run(ring, slots):
        rp = ring_packed(ring, jnp.asarray(slots, jnp.int32), t, meta)
        # sampling_4d's logical repack: slice axis (b, g, t) with b=1 —
        # group runs contiguous and in order, the gmajor fast layout
        logical = (jnp.arange(t, dtype=jnp.int32)[None, :] * g
                   + jnp.arange(g, dtype=jnp.int32)[:, None]).reshape(-1)
        logical = jnp.take(rp.slice_map, logical)
        packed = PackedFeatures(
            rp.tables, t * g, rp.num_views, rp.level_shapes, rp.channels,
            mxu_tables=rp.mxu_tables, num_groups=g, slice_map=logical,
            yfold=rp.yfold,
            slice_groups=tuple((s // t) % g for s in range(t * g)))
        return np.asarray(jax.jit(
            lambda pk: msmv_sampling(pk, jl, jw, qmajor=True))(packed))

    for slots in ((2, 0, 3, 1), (3, 3, 1, 1)):
        want = run(rings[False], slots)
        assert np.isfinite(want).all()
        got = run(rings[(False, True)], slots)
        np.testing.assert_array_equal(got, want, err_msg=str(slots))


def test_ring_copy_slot_group_split(rng):
    """ring_copy_slot on a group-split ring: copy src->dst must equal a
    ring_update of dst with that frame's packed features."""
    from sparsebev_tpu.ops.msmv_sampling import (
        pack_mlvl_feats_grouped, ring_copy_slot, ring_init, ring_update)
    t, n, g, cg = 4, 6, 2, 8
    c = g * cg
    shapes = [(8, 12), (4, 6)]
    feats = [jnp.asarray(rng.randn(1, t * n, h, w, c).astype(np.float32))
             for h, w in shapes]
    fps = [pack_mlvl_feats_grouped([f[:, i * n:(i + 1) * n] for f in feats],
                                   n, g) for i in range(t)]
    ring = ring_init(fps[0], t, jnp.float32, 1, (True, True))
    for i in range(t):
        ring = ring_update(ring, fps[i], jnp.int32(i))
    got = jax.jit(lambda r, s, d: ring_copy_slot(r, fps[0], s, d))(
        ring, jnp.int32(1), jnp.int32(3))
    want = ring_update(ring, fps[1], jnp.int32(3))
    for a, b in zip(jax.tree_util.tree_leaves(got),
                    jax.tree_util.tree_leaves(want)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_ring_copy_slot_matches_update(rng):
    """ring_copy_slot (the chunk-split duplicate-frame dedupe, ADVICE r3
    high): copying frame rows src->dst must equal ring_update'ing dst with
    that frame's packed features — for unsplit AND chunk-split rings, with
    traced src/dst, across same-chunk and cross-chunk (src,dst) pairs."""
    from sparsebev_tpu.ops.msmv_sampling import (
        pack_mlvl_feats_grouped, ring_copy_slot, ring_init, ring_update)
    t, n, g, cg = 4, 6, 2, 8
    c = g * cg
    shapes = [(8, 12), (4, 6)]
    feats = [jnp.asarray(rng.randn(1, t * n, h, w, c).astype(np.float32))
             for h, w in shapes]
    fps = [pack_mlvl_feats_grouped([f[:, i * n:(i + 1) * n] for f in feats],
                                   n, g) for i in range(t)]
    for split in ((1, 1), (2, 1), (4, 2)):
        ring = ring_init(fps[0], t, jnp.float32, split)
        for i in range(t):
            ring = ring_update(ring, fps[i], jnp.int32(i))
        copy = jax.jit(lambda r, s, d: ring_copy_slot(r, fps[0], s, d))
        # (1,3): cross-chunk at split 4, cross-chunk at split 2
        # (1,0): cross-chunk at split 4, SAME chunk at split 2
        for src, dst in ((1, 3), (1, 0)):
            got = copy(ring, jnp.int32(src), jnp.int32(dst))
            want = ring_update(ring, fps[src], jnp.int32(dst))
            for a, b in zip(jax.tree_util.tree_leaves(got),
                            jax.tree_util.tree_leaves(want)):
                np.testing.assert_array_equal(
                    np.asarray(a), np.asarray(b),
                    err_msg=f"split={split} {src}->{dst}")


def test_grouped_pack_gsplit_train_forward_and_grads(rng):
    """TRAIN/OFFLINE group-split (table_gsplit_pack): packing a level as
    per-group chunk buffers must leave the sampled output AND the gradients
    w.r.t. the raw pyramids / locations / weights equal to the unsplit pack.
    Exercises the full differentiable chain the training decoder runs:
    pack_mlvl_feats_grouped(gsplit) -> sampling_4d's (b, g, t) logical
    repack -> _gmajor_forward primal -> _halfrow_runmajor VJP ->
    pack_level's custom VJP — with B > 1 (multiple same-group runs)."""
    from sparsebev_tpu.ops.msmv_sampling import (
        PackedFeatures, msmv_sampling, pack_mlvl_feats_grouped)
    b, t, n, g, cg = 2, 3, 2, 2, 8
    c = g * cg
    q, p = 4, 3
    shapes = [(6, 9), (3, 5)]
    feats = [jnp.asarray(rng.randn(b, t * n, h, w, c).astype(np.float32))
             for h, w in shapes]
    loc = rng.rand(q, b * g * t, p, 3).astype(np.float32)
    loc[..., 2] = rng.randint(0, n, loc.shape[:-1]) / (n - 1)
    sw = rng.rand(q, b * g * t, p, len(shapes)).astype(np.float32)
    jl, jw = jnp.asarray(loc), jnp.asarray(sw)
    # non-uniform cotangent so grad errors can't cancel
    cot = jnp.asarray(rng.randn(q, b * g * t, p, cg).astype(np.float32))

    # sampling_4d's logical slice order (b, g, t) over the packed (b, t, g)
    # space (projection.py:247-264)
    logical = ((jnp.arange(b, dtype=jnp.int32)[:, None, None] * t
                + jnp.arange(t, dtype=jnp.int32)[None, None, :]) * g
               + jnp.arange(g, dtype=jnp.int32)[None, :, None]).reshape(-1)
    slice_groups = tuple((s // t) % g for s in range(b * g * t))

    def make_fn(gsplit):
        def fn(fs, lo, wts):
            pk = pack_mlvl_feats_grouped(fs, n, g, gsplit=gsplit)
            packed = PackedFeatures(
                pk.tables, b * g * t, n, pk.level_shapes, pk.channels,
                num_groups=g, slice_map=logical, yfold=pk.yfold,
                slice_groups=slice_groups)
            out = msmv_sampling(packed, lo, wts, qmajor=True)
            return (out * cot).sum(), out
        return fn

    (v0, out0), g0 = jax.jit(jax.value_and_grad(
        make_fn(False), argnums=(0, 1, 2), has_aux=True))(feats, jl, jw)
    for gsplit in (True, (True, False)):
        (v1, out1), g1 = jax.jit(jax.value_and_grad(
            make_fn(gsplit), argnums=(0, 1, 2), has_aux=True))(feats, jl, jw)
        np.testing.assert_array_equal(np.asarray(out1), np.asarray(out0),
                                      err_msg=f"forward gsplit={gsplit}")
        for a, want in zip(jax.tree_util.tree_leaves(g1),
                           jax.tree_util.tree_leaves(g0)):
            # scatter-add order differs between the flat and per-chunk
            # backward walks; values agree to fp32 roundoff
            np.testing.assert_allclose(np.asarray(a), np.asarray(want),
                                       rtol=2e-6, atol=2e-6,
                                       err_msg=f"grad gsplit={gsplit}")
        assert np.isfinite(np.asarray(v1)).all()
