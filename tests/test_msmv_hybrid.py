"""Hybrid (MXU one-hot Pallas) sampling path: must agree with the XLA
pair-gather path bit-for-bit-ish. Runs the kernel in interpret mode on CPU."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sparsebev_tpu.ops import msmv_sampling, msmv_sampling_reference
from sparsebev_tpu.ops.msmv_sampling import (
    pack_mlvl_feats, set_sampling_impl, get_sampling_impl)

B, N, Q, P, C = 2, 6, 8, 5, 64
LEVEL_SHAPES = [(16, 44), (8, 22), (4, 11)]  # all small -> all on the MXU path


@pytest.fixture(autouse=True)
def _restore_impl():
    yield
    set_sampling_impl("xla")


def _make_inputs(rng, loc_spread=1.4):
    feats = [rng.randn(B, N, h, w, C).astype(np.float32) for h, w in LEVEL_SHAPES]
    loc_xy = (rng.rand(B, Q, P, 2).astype(np.float32) * loc_spread) - (loc_spread - 1) / 2
    view = rng.randint(0, N, (B, Q, P, 1)).astype(np.float32) / (N - 1)
    loc = np.concatenate([loc_xy, view], axis=-1)
    w = rng.rand(B, Q, P, len(LEVEL_SHAPES)).astype(np.float32)
    w = w / w.sum(-1, keepdims=True)
    return feats, loc, w


def test_hybrid_matches_reference(rng):
    feats, loc, w = _make_inputs(rng)
    jf = [jnp.asarray(f) for f in feats]
    want = np.asarray(msmv_sampling_reference(jf, jnp.asarray(loc), jnp.asarray(w)))

    set_sampling_impl("hybrid")
    packed = pack_mlvl_feats(jf)
    assert all(t is not None for t in packed.mxu_tables)  # all levels small
    got = np.asarray(msmv_sampling(packed, jnp.asarray(loc), jnp.asarray(w)))
    # bf16 feature tables in the MXU path: tolerance accordingly
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)
    # boundary behavior: fully out-of-image locations sample to zero
    loc2 = loc.copy()
    loc2[..., :2] = 5.0
    got2 = np.asarray(msmv_sampling(packed, jnp.asarray(loc2), jnp.asarray(w)))
    np.testing.assert_allclose(got2, 0.0, atol=1e-6)


def test_hybrid_mixed_levels(rng):
    """A big level 0 stays on pair-gather while small levels use the MXU."""
    shapes = [(64, 176), (8, 22)]
    feats = [jnp.asarray(rng.randn(B, N, h, w, C).astype(np.float32))
             for h, w in shapes]
    loc_xy = rng.rand(B, Q, P, 2).astype(np.float32)
    view = rng.randint(0, N, (B, Q, P, 1)).astype(np.float32) / (N - 1)
    loc = jnp.asarray(np.concatenate([loc_xy, view], -1))
    w = rng.rand(B, Q, P, 2).astype(np.float32)
    w = jnp.asarray(w / w.sum(-1, keepdims=True))

    want = np.asarray(msmv_sampling_reference(feats, loc, w))
    set_sampling_impl("hybrid")
    packed = pack_mlvl_feats(feats)
    assert packed.mxu_tables[0] is None        # level 0 too big
    assert packed.mxu_tables[1] is not None    # level 1 on MXU
    got = np.asarray(msmv_sampling(packed, loc, w))
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_impl_selector_default():
    assert get_sampling_impl() == "xla"
