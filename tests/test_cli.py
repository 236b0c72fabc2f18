"""End-to-end CLI tests: train 2 iterations on synthetic data, checkpoint,
then evaluate with tools/val.py reusing that checkpoint. Runs as subprocesses
(the real user surface)."""

import json
import os
import re
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # full-pipeline tier: see conftest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def synth_ann(tmp_path_factory):
    from sparsebev_tpu.data import make_synthetic_dataset
    root = tmp_path_factory.mktemp("cli_synth")
    return make_synthetic_dataset(str(root), num_samples=4, sweeps_between=2,
                                  image_hw=(64, 128))


def _run(cmd, timeout=900):
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=8")
    return subprocess.run(cmd, capture_output=True, text=True,
                          timeout=timeout, env=env, cwd=REPO)


def test_train_cli(synth_ann, tmp_path):
    work = str(tmp_path / "work")
    out = _run([
        sys.executable, "tools/train.py",
        "--config", "configs/smoke_synthetic.py",
        "--work-dir", work, "--platform", "cpu",
        "--override", f"data.train.ann_file={synth_ann}",
    ])
    assert out.returncode == 0, out.stderr[-3000:]
    log = out.stdout + out.stderr
    assert "training done" in log
    assert re.search(r"loss: [\d.]+", log)
    # checkpoint saved
    assert any(d.startswith("ckpt_") for d in os.listdir(work))
    # code backup exists (reference utils.backup_code parity)
    assert os.path.isdir(os.path.join(work, "backup", "sparsebev_tpu"))

    # val CLI reusing the checkpoint
    ckpt = os.path.join(work, sorted(
        d for d in os.listdir(work) if d.startswith("ckpt_"))[-1])
    out = _run([
        sys.executable, "tools/val.py",
        "--config", "configs/smoke_synthetic.py",
        "--weights", ckpt, "--platform", "cpu",
        "--override", f"data.val.ann_file={synth_ann}",
    ])
    assert out.returncode == 0, out.stderr[-3000:]
    log = out.stdout + out.stderr
    assert "NDS" in log and "mAP" in log


def test_val_cli_random_init(synth_ann):
    out = _run([
        sys.executable, "tools/val.py",
        "--config", "configs/smoke_synthetic.py",
        "--platform", "cpu", "--limit", "2",
        "--override", f"data.val.ann_file={synth_ann}",
    ])
    assert out.returncode == 0, out.stderr[-3000:]
    assert "NDS" in out.stdout + out.stderr


def test_train_cli_multi_dispatch(synth_ann, tmp_path):
    """steps_per_dispatch=2: two train steps per jitted dispatch."""
    work = str(tmp_path / "workk")
    out = _run([
        sys.executable, "tools/train.py",
        "--config", "configs/smoke_synthetic.py",
        "--work-dir", work, "--platform", "cpu",
        "--override", f"data.train.ann_file={synth_ann}",
        "steps_per_dispatch=2",
    ])
    assert out.returncode == 0, out.stderr[-3000:]
    log = out.stdout + out.stderr
    assert "training done" in log
    import re as _re
    m = _re.search(r"training done at step (\d+)", log)
    assert m and int(m.group(1)) == 2  # 2 batches -> 1 dispatch of 2 steps


def test_train_cli_with_eval_hook(synth_ann, tmp_path):
    """Training ends with a metric table when a val split exists (reference
    registers EvalHook at interval=total_epochs, train.py:154-158)."""
    work = str(tmp_path / "work_eval")
    out = _run([
        sys.executable, "tools/train.py",
        "--config", "configs/smoke_synthetic.py",
        "--work-dir", work, "--platform", "cpu",
        "--override", f"data.train.ann_file={synth_ann}",
        f"data.val.ann_file={synth_ann}",
    ])
    assert out.returncode == 0, out.stderr[-3000:]
    log = out.stdout + out.stderr
    assert "eval @ epoch" in log and "NDS" in log


def test_bench_machinery_cpu():
    """bench.py's in-jit ring loop + e2e helper on the smoke config: guards
    the driver-facing bench surface (which otherwise only ever runs on the
    real chip) against library API drift."""
    import bench

    fps = bench.bench_config("configs/smoke_synthetic.py", iters=2)
    assert fps > 0
    serial, overlapped = bench.bench_e2e_flagship(
        num_samples=2, cfg_path="configs/smoke_synthetic.py")
    # both stats dicts carry fps + the host/device split (the self-
    # explaining artifact contract bench.py emits into BENCH_r*.json)
    assert serial["e2e_fps"] > 0 and overlapped["e2e_fps"] > 0
    assert {"host_pipeline_ms", "dispatch_upload_forward_ms"} <= set(serial)
    assert {"host_wait_ms", "dispatch_upload_forward_ms"} <= set(overlapped)
