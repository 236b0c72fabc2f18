"""Train step + data-parallel sharding tests on the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparsebev_tpu.models.detector import SparseBEV
from sparsebev_tpu.parallel import make_mesh, shard_batch, replicate, data_sharding
from sparsebev_tpu.train import build_optimizer, create_train_state, make_train_step
from sparsebev_tpu.train.optim import build_lr_mult_tree, resnet_frozen_patterns, \
    cosine_warmup_schedule

PC_RANGE = [-51.2, -51.2, -5.0, 51.2, 51.2, 3.0]
CODE_WEIGHTS = [2.0, 2.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0]

B, T, N, H, W = 8, 2, 6, 32, 64
NUM_QUERY, EMBED, MAX_GT = 16, 64, 4


def _model(**head_overrides):
    return SparseBEV(
        img_backbone=dict(type="ResNet", depth=50, out_indices=(0, 1, 2, 3)),
        img_neck=dict(type="FPN", in_channels=[256, 512, 1024, 2048],
                      out_channels=EMBED, num_outs=4),
        pts_bbox_head=dict(
            type="SparseBEVHead", num_classes=10, in_channels=EMBED,
            num_query=NUM_QUERY, num_frames=T, num_points=2, num_layers=2,
            num_levels=4, code_size=10, pc_range=PC_RANGE, **head_overrides),
        data_aug=dict(img_norm_cfg=dict(mean=[123.675, 116.28, 103.53],
                                        std=[58.395, 57.12, 57.375], to_rgb=True)),
    )


def _batch(rng, b=B):
    return {
        "img": jnp.asarray(rng.uniform(0, 255, (b, T * N, H, W, 3)).astype(np.float32)),
        "lidar2img": jnp.asarray(rng.randn(b, T * N, 4, 4).astype(np.float32)),
        "time_diff": jnp.asarray(np.tile(np.asarray([[0.0, 0.5]], np.float32), (b, 1))),
        "gt_boxes": jnp.asarray(np.concatenate([
            rng.uniform(-40, 40, (b, MAX_GT, 2)),
            rng.uniform(-3, 1, (b, MAX_GT, 1)),
            rng.uniform(0.5, 4, (b, MAX_GT, 3)),
            rng.uniform(-np.pi, np.pi, (b, MAX_GT, 1)),
            rng.uniform(-2, 2, (b, MAX_GT, 2))], -1).astype(np.float32)),
        "gt_labels": jnp.asarray(rng.randint(0, 10, (b, MAX_GT)).astype(np.int32)),
        "gt_mask": jnp.asarray(rng.rand(b, MAX_GT) > 0.3),
    }


@pytest.fixture(scope="module")
def model_and_state():
    model = _model()
    rng = np.random.RandomState(0)
    batch = _batch(rng, b=1)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "aug": jax.random.PRNGKey(1)},
        batch["img"], batch["lidar2img"], batch["time_diff"], train=False)
    tx, _ = build_optimizer(
        variables["params"], lr=2e-4, total_steps=100,
        custom_keys={"backbone": 0.1, "sampling_offset": 0.1},
        frozen_patterns=resnet_frozen_patterns(1, prefix="backbone"))
    state = create_train_state(variables, tx)
    return model, state


def test_schedule_shape():
    sched = cosine_warmup_schedule(2e-4, total_steps=1000, warmup_iters=100)
    assert float(sched(0)) == pytest.approx(2e-4 / 3, rel=1e-5)
    assert float(sched(100)) == pytest.approx(2e-4 * (1 + np.cos(np.pi * 0.1)) / 2
                                              + 2e-7 * (1 - (1 + np.cos(np.pi * 0.1)) / 2),
                                              rel=1e-2)
    assert float(sched(1000)) == pytest.approx(2e-7, rel=1e-3)


def test_lr_mult_tree(model_and_state):
    model, state = model_and_state
    mults = build_lr_mult_tree(
        state.params, {"backbone": 0.1, "sampling_offset": 0.1},
        resnet_frozen_patterns(1, prefix="backbone"))
    flat = jax.tree_util.tree_flatten_with_path(mults)[0]
    by_path = {jax.tree_util.keystr(k): v for k, v in flat}
    assert any(v == 0.0 for k, v in by_path.items() if "layer1_" in k)
    assert any(v == 0.1 for k, v in by_path.items() if "layer4" in k)
    assert any(v == 0.1 for k, v in by_path.items() if "sampling_offset" in k)
    assert any(v == 1.0 for k, v in by_path.items() if "head" in k and "sampling_offset" not in k)


def test_train_step_runs_and_descends(model_and_state):
    model, state = model_and_state
    rng = np.random.RandomState(1)
    batch = _batch(rng, b=2)
    step_fn = jax.jit(make_train_step(
        model, num_classes=10, code_weights=CODE_WEIGHTS, pc_range=PC_RANGE,
        num_query=NUM_QUERY, query_denoising=True, dn_groups=3))

    metrics_hist = []
    for i in range(3):
        state, metrics = step_fn(state, batch, jax.random.PRNGKey(i))
        metrics_hist.append({k: float(v) for k, v in metrics.items()})
    assert all(np.isfinite(m["loss"]) for m in metrics_hist)
    assert {"loss_cls", "loss_bbox", "loss_cls_dn", "loss_bbox_dn",
            "d0.loss_cls"} <= set(metrics_hist[0])
    # same batch 3x: loss should decrease
    assert metrics_hist[-1]["loss"] < metrics_hist[0]["loss"]
    assert int(state.step) == 3


def test_frozen_params_do_not_move(model_and_state):
    model, state = model_and_state
    rng = np.random.RandomState(2)
    batch = _batch(rng, b=2)
    step_fn = jax.jit(make_train_step(
        model, num_classes=10, code_weights=CODE_WEIGHTS, pc_range=PC_RANGE,
        num_query=NUM_QUERY, query_denoising=False))
    before = state.params["backbone"]["layer1_0"]["conv1"]["kernel"]
    head_before = state.params["head"]["init_query_bbox"]
    new_state, _ = step_fn(state, batch, jax.random.PRNGKey(0))
    after = new_state.params["backbone"]["layer1_0"]["conv1"]["kernel"]
    np.testing.assert_array_equal(np.asarray(before), np.asarray(after))
    assert not np.allclose(np.asarray(head_before),
                           np.asarray(new_state.params["head"]["init_query_bbox"]))


def test_data_parallel_step_on_mesh(model_and_state):
    """The pjit path: batch sharded over 8 CPU devices, params replicated."""
    model, state = model_and_state
    mesh = make_mesh()
    assert mesh.devices.size == 8
    rng = np.random.RandomState(3)
    batch = shard_batch(_batch(rng, b=8), mesh)
    state = jax.device_put(state, replicate(mesh))

    step_fn = jax.jit(make_train_step(
        model, num_classes=10, code_weights=CODE_WEIGHTS, pc_range=PC_RANGE,
        num_query=NUM_QUERY, query_denoising=True, dn_groups=2))
    new_state, metrics = step_fn(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))

    # gradient math must be identical to the single-device run
    state_local = jax.device_put(state, jax.devices()[0])
    batch_local = jax.device_put(batch, jax.devices()[0])
    new_state_local, metrics_local = step_fn(state_local, batch_local,
                                             jax.random.PRNGKey(0))
    np.testing.assert_allclose(float(metrics["loss"]),
                               float(metrics_local["loss"]), rtol=1e-4)
    a = np.asarray(new_state.params["head"]["init_query_bbox"])
    b = np.asarray(new_state_local.params["head"]["init_query_bbox"])
    np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-5)


def test_hybrid_dp_sp_step_on_mesh(model_and_state):
    """Hybrid dp x sp training (make_train_step(mesh=...)): a 2x4 mesh
    ('data' x 'q') sharding the batch AND the decoder's query axis must
    produce the same updates as a single device — GSPMD propagates the
    query partition through sampling/mixing and all-gathers before the
    Hungarian matcher."""
    from sparsebev_tpu.parallel import make_hybrid_mesh
    model, state = model_and_state
    mesh = make_hybrid_mesh(2, 4)
    rng = np.random.RandomState(5)
    batch = shard_batch(_batch(rng, b=2), mesh)
    state_r = jax.device_put(state, replicate(mesh))

    step_fn = jax.jit(make_train_step(
        model, num_classes=10, code_weights=CODE_WEIGHTS, pc_range=PC_RANGE,
        num_query=NUM_QUERY, query_denoising=True, dn_groups=2, mesh=mesh))
    new_state, metrics = step_fn(state_r, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))

    plain = jax.jit(make_train_step(
        model, num_classes=10, code_weights=CODE_WEIGHTS, pc_range=PC_RANGE,
        num_query=NUM_QUERY, query_denoising=True, dn_groups=2))
    state_local = jax.device_put(state, jax.devices()[0])
    batch_local = jax.device_put(batch, jax.devices()[0])
    new_local, metrics_local = plain(state_local, batch_local,
                                     jax.random.PRNGKey(0))
    np.testing.assert_allclose(float(metrics["loss"]),
                               float(metrics_local["loss"]), rtol=1e-4)
    a = np.asarray(new_state.params["head"]["init_query_bbox"])
    b = np.asarray(new_local.params["head"]["init_query_bbox"])
    np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-5)


def test_multi_step(model_and_state):
    """K steps per dispatch via lax.scan over a stacked batch must match K
    sequential single-step dispatches."""
    from sparsebev_tpu.train import make_multi_step, make_train_step
    model, state = model_and_state
    rng = np.random.RandomState(7)
    k = 3
    batches = [_batch(rng, b=2) for _ in range(k)]
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *batches)

    step_fn = make_train_step(model, num_classes=10, code_weights=CODE_WEIGHTS,
                              pc_range=PC_RANGE, num_query=NUM_QUERY,
                              query_denoising=False)
    multi = jax.jit(make_multi_step(step_fn, k))
    st_multi, metrics = multi(state, stacked, jax.random.PRNGKey(0))
    assert metrics["loss"].shape == (k,)
    assert np.isfinite(np.asarray(metrics["loss"])).all()

    # sequential reference with the same per-step keys
    keys = jax.random.split(jax.random.PRNGKey(0), k)
    st_seq = state
    seq_losses = []
    step_jit = jax.jit(step_fn)
    for i in range(k):
        st_seq, m = step_jit(st_seq, batches[i], keys[i])
        seq_losses.append(float(m["loss"]))
    np.testing.assert_allclose(np.asarray(metrics["loss"]), seq_losses,
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(st_multi.params["head"]["init_query_bbox"]),
        np.asarray(st_seq.params["head"]["init_query_bbox"]),
        rtol=1e-4, atol=1e-5)


def test_train_step_gsplit_pack_matches_baseline(model_and_state):
    """table_gsplit_pack (training group-split tables): one full train step —
    losses AND updated params — must match the unsplit pack. The knob only
    changes HOW the sampled tables are laid out (per-group chunk buffers +
    the run-major halfrow VJP), never the math: forward is bitwise-equal,
    the backward's scatter-add order differs (fp32 roundoff on grads)."""
    model, state = model_and_state
    rng = np.random.RandomState(7)
    batch = _batch(rng, b=2)

    def one_step(m):
        step_fn = jax.jit(make_train_step(
            m, num_classes=10, code_weights=CODE_WEIGHTS, pc_range=PC_RANGE,
            num_query=NUM_QUERY, query_denoising=True, dn_groups=2))
        st, metrics = step_fn(state, batch, jax.random.PRNGKey(3))
        return st, {k: float(v) for k, v in metrics.items()}

    st0, m0 = one_step(_model())
    st1, m1 = one_step(_model(table_gsplit_pack=True))
    assert m1["loss"] == pytest.approx(m0["loss"], rel=1e-6, abs=1e-6)
    for (p0, a), (p1, b) in zip(
            jax.tree_util.tree_flatten_with_path(st0.params)[0],
            jax.tree_util.tree_flatten_with_path(st1.params)[0]):
        assert p0 == p1
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5,
            err_msg=jax.tree_util.keystr(p0))
