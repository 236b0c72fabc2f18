"""Query-sharded (tensor-parallel) inference: sharding the decoder's query
axis over a mesh must (1) produce the single-device outputs and (2) actually
PARTITION the sampling gathers (K/n rows per device) rather than replicate
them — the whole point is dividing the gather wall by the mesh size.
See parallel/query_parallel.py."""

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from __graft_entry__ import _build_model
from sparsebev_tpu.parallel.query_parallel import (QUERY_AXIS,
                                                   constrain_preds,
                                                   query_sharding)

NUM_FRAMES, H, W, Q = 4, 64, 128, 64
NDEV = 4


@pytest.fixture(scope="module")
def setup():
    model = _build_model(num_query=Q, num_frames=NUM_FRAMES, embed_dims=64,
                         num_points=2, num_layers=2, image_hw=(H, W),
                         compute_dtype=jnp.float32)
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.uniform(0, 255, (1, NUM_FRAMES * 6, H, W, 3))
                      .astype(np.float32))
    l2i = jnp.asarray(rng.randn(1, NUM_FRAMES * 6, 4, 4).astype(np.float32))
    td = jnp.asarray(np.linspace(0, 1.5, NUM_FRAMES, dtype=np.float32)[None])
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "aug": jax.random.PRNGKey(1)},
        img, l2i, td, train=False)
    mesh = Mesh(np.asarray(jax.devices()[:NDEV]), (QUERY_AXIS,))
    return model, variables, img, l2i, td, mesh


def test_query_sharded_matches_single_device(setup):
    model, variables, img, l2i, td, mesh = setup

    def fwd(v, img, l2i, td):
        preds = model.apply(v, img, l2i, td, train=False)
        return constrain_preds(preds, mesh)

    ref = jax.jit(lambda v, i, l, t: model.apply(v, i, l, t, train=False))(
        variables, img, l2i, td)
    repl = NamedSharding(mesh, P())
    compiled = jax.jit(fwd, in_shardings=(repl,) * 4).lower(
        variables, img, l2i, td).compile()
    out = compiled(variables, img, l2i, td)

    for k in ("all_cls_scores", "all_bbox_preds"):
        assert out[k].sharding.spec == query_sharding(mesh).spec
        np.testing.assert_allclose(np.asarray(ref[k]), np.asarray(out[k]),
                                   rtol=2e-4, atol=2e-4)

    # the sampling gathers must be partitioned: per-device gather row count
    # = B*Q*G*T*P / NDEV (window gathers have output shape [K, 1, 2, C])
    hlo = compiled.as_text()
    k_full = 1 * Q * 4 * NUM_FRAMES * 2
    rows = [int(m.group(1)) for m in
            re.finditer(r"gather\(", hlo) and
            re.finditer(r"f32\[(\d+),1,2,\d+\]\S* gather\(", hlo)]
    assert rows, "no window gathers found in HLO"
    assert all(r == k_full // NDEV for r in rows), (rows, k_full)


def test_streaming_detector_with_mesh(setup):
    model, variables, img, l2i, td, mesh = setup
    from sparsebev_tpu.inference import StreamingDetector

    plain = StreamingDetector(model, variables, num_frames=NUM_FRAMES)
    sharded = StreamingDetector(model, variables, num_frames=NUM_FRAMES,
                                mesh=mesh)
    want = jax.device_get(plain.infer(np.asarray(img), np.asarray(l2i),
                                      np.asarray(td), []))
    got = jax.device_get(sharded.infer(np.asarray(img), np.asarray(l2i),
                                       np.asarray(td), []))
    for k in want:
        np.testing.assert_allclose(np.asarray(want[k]), np.asarray(got[k]),
                                   rtol=2e-4, atol=2e-4)


def test_streaming_fp8_ring_with_mesh(setup):
    """fp8 ring tables x query sharding: the composed mode (fp8 dequant in
    the fold + GSPMD query partition) must match the unsharded fp8 run —
    quantization is identical on both sides, so tolerance is tight."""
    _, variables, img, l2i, td, mesh = setup
    from sparsebev_tpu.inference import StreamingDetector

    model8 = _build_model(num_query=Q, num_frames=NUM_FRAMES, embed_dims=64,
                          num_points=2, num_layers=2, image_hw=(H, W),
                          compute_dtype=jnp.float32, table_fp8=True)
    plain = StreamingDetector(model8, variables, num_frames=NUM_FRAMES)
    sharded = StreamingDetector(model8, variables, num_frames=NUM_FRAMES,
                                mesh=mesh)
    want = jax.device_get(plain.infer(np.asarray(img), np.asarray(l2i),
                                      np.asarray(td), []))
    got = jax.device_get(sharded.infer(np.asarray(img), np.asarray(l2i),
                                       np.asarray(td), []))
    assert all(t.dtype == jnp.float8_e4m3fn for t in sharded.ring)
    for k in want:
        np.testing.assert_allclose(np.asarray(want[k]), np.asarray(got[k]),
                                   rtol=2e-4, atol=2e-4)


def test_init_streaming_variables_matches_full_init(setup):
    """Two-stage streaming init (backbone on one frame + head on a dummy
    packed pyramid) must produce the SAME param tree as a full-window init —
    flax derives per-param RNGs from module paths, which are identical."""
    model, variables, img, l2i, td, _ = setup
    from sparsebev_tpu.inference import init_streaming_variables
    got = init_streaming_variables(model, img[:, :6], l2i, td, H, W)

    ref_flat = jax.tree_util.tree_leaves_with_path(variables["params"])
    got_flat = dict(jax.tree_util.tree_leaves_with_path(got["params"]))
    assert len(ref_flat) == len(got_flat)
    for path, leaf in ref_flat:
        np.testing.assert_allclose(np.asarray(leaf),
                                   np.asarray(got_flat[path]),
                                   rtol=0, atol=0, err_msg=str(path))
