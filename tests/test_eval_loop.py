"""Data-parallel offline eval: sharded over the 8-device CPU mesh, results
must equal the single-device run (replaces reference multi_gpu_test,
val.py:132). Also exercises tail-batch padding."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # full-pipeline tier: see conftest
import jax


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    from sparsebev_tpu.data import make_synthetic_dataset
    from sparsebev_tpu.config import Config
    from sparsebev_tpu.builder import (build_model, build_dataset,
                                       build_dataloader)

    root = tmp_path_factory.mktemp("synth_dp")
    ann = make_synthetic_dataset(str(root), num_samples=6, sweeps_between=2,
                                 image_hw=(64, 128))
    cfg = Config.fromfile("configs/smoke_synthetic.py")
    cfg.merge_from_dict({"data.val.ann_file": ann})
    dataset = build_dataset(cfg.data["val"])
    model, aux = build_model(cfg)
    batchify = lambda bs, ds: build_dataloader(
        ds, batch_size=bs, num_workers=0, shuffle=False, drop_last=False,
        max_gt=cfg.get("max_gt", 8))
    import jax.numpy as jnp
    loader = batchify(1, dataset)
    batch = next(iter(loader))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "aug": jax.random.PRNGKey(1)},
        jnp.asarray(batch["img"][:1]), jnp.asarray(batch["lidar2img"][:1]),
        jnp.asarray(batch["time_diff"][:1]), train=False)
    return cfg, dataset, model, aux, variables, batchify


def test_dp_eval_matches_single_device(setup):
    from sparsebev_tpu.evaluation import run_offline_eval
    from sparsebev_tpu.parallel import make_mesh

    cfg, dataset, model, aux, variables, batchify = setup
    coder = aux.build_coder()

    # batch 4 over a 4-device mesh; 6 samples -> one padded tail batch
    mesh = make_mesh(jax.devices()[:4])
    m_dp, res_dp = run_offline_eval(model, variables, coder, dataset,
                                    batchify(4, dataset), mesh=mesh)
    m_sd, res_sd = run_offline_eval(model, variables, coder, dataset,
                                    batchify(1, dataset), mesh=None)

    assert set(res_dp) == set(res_sd)
    assert len(res_dp) == 6
    for tok in res_dp:
        np.testing.assert_allclose(res_dp[tok]["bboxes"],
                                   res_sd[tok]["bboxes"], rtol=2e-4, atol=2e-4)
    for k in ("NDS", "mAP", "mATE"):
        assert m_dp[k] == pytest.approx(m_sd[k], abs=2e-4)
