"""Native C++ loader tests: decode parity with PIL, resize/crop/flip batch
path, graceful fallback."""

import os
import numpy as np
import pytest

from sparsebev_tpu.data import fastloader

pytestmark = pytest.mark.skipif(not fastloader.available(),
                                reason="libfastloader.so not built")


@pytest.fixture(scope="module")
def jpegs(tmp_path_factory, ):
    from PIL import Image
    rng = np.random.RandomState(0)
    root = tmp_path_factory.mktemp("jpegs")
    paths = []
    for i in range(4):
        arr = rng.randint(0, 255, (48, 64, 3), np.uint8)
        p = str(root / f"im{i}.jpg")
        Image.fromarray(arr).save(p, quality=90)
        paths.append(p)
    return paths


def test_decode_matches_pil(jpegs):
    from PIL import Image
    for p in jpegs:
        got = fastloader.decode(p)
        assert got is not None and got.shape == (48, 64, 3)
        want = np.asarray(Image.open(p).convert("RGB"))[..., ::-1]
        # both decoders sit on libjpeg; allow off-by-one from IDCT variants
        assert np.abs(got.astype(int) - want.astype(int)).max() <= 1


def test_load_batch_resize_crop_flip(jpegs):
    from PIL import Image
    out = fastloader.load_batch(jpegs, resize_wh=(32, 24),
                                crop_xywh=(4, 2, 16, 12), flip=True,
                                num_threads=2)
    assert out is not None and out.shape == (4, 12, 16, 3)
    # PIL reference: bicubic resize + crop + flip (tolerance: our bicubic
    # matches PIL's filter closely but not bit-exactly)
    im = Image.open(jpegs[0]).convert("RGB").resize((32, 24))
    im = im.crop((4, 2, 20, 14)).transpose(Image.FLIP_LEFT_RIGHT)
    want = np.asarray(im)[..., ::-1].astype(int)
    diff = np.abs(out[0].astype(int) - want)
    assert np.median(diff) <= 2 and diff.mean() < 6


def test_load_batch_missing_file(jpegs):
    out = fastloader.load_batch([jpegs[0], "/nonexistent.jpg"],
                                resize_wh=(32, 24), crop_xywh=(0, 0, 32, 24))
    assert out is None  # partial failure reported


def test_pipeline_uses_native(jpegs):
    from sparsebev_tpu.data.pipelines import _imread_bgr
    from PIL import Image
    got = _imread_bgr(jpegs[0])
    want = np.asarray(Image.open(jpegs[0]).convert("RGB"))[..., ::-1]
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 1


def test_fused_transform_matches_pil_path(jpegs):
    """lazy decode + fused C++ resize/crop/flip == eager PIL path (within
    the resize-filter tolerance above); the ida homography must be equal."""
    from sparsebev_tpu.data.pipelines import (LoadMultiViewImageFromFiles,
                                              RandomTransformImage)
    conf = dict(H=48, W=64, final_dim=(24, 48), resize_lim=(0.7, 0.8),
                bot_pct_lim=(0.0, 0.0), rot_lim=(0.0, 0.0), rand_flip=False)

    def run(lazy):
        results = {"img_filename": list(jpegs)}
        results = LoadMultiViewImageFromFiles(lazy=lazy)(results)
        results["lidar2img"] = [np.eye(4, dtype=np.float32)
                                for _ in jpegs]
        tr = RandomTransformImage(ida_aug_conf=conf, training=False)
        return tr(results)

    fused = run("auto")
    eager = run("never")
    assert all(isinstance(im, np.ndarray) for im in fused["img"])
    for a, b in zip(fused["img"], eager["img"]):
        assert a.shape == b.shape == (24, 48, 3)
        diff = np.abs(a.astype(int) - b.astype(int))
        assert np.median(diff) <= 2 and diff.mean() < 6
    for a, b in zip(fused["lidar2img"], eager["lidar2img"]):
        np.testing.assert_allclose(a, b, atol=1e-6)


def test_lazy_images_materialize_without_transform(jpegs):
    """A lazy load not followed by RandomTransformImage must still produce
    pixel arrays at formatting time (defensive materialization)."""
    from sparsebev_tpu.data.pipelines import (DefaultFormatBundle3D,
                                              LoadMultiViewImageFromFiles)
    results = {"img_filename": list(jpegs)}
    results = LoadMultiViewImageFromFiles(lazy="auto")(results)
    results["lidar2img"] = [np.eye(4, dtype=np.float32) for _ in jpegs]
    results["img_timestamp"] = [0.0] * len(jpegs)
    out = DefaultFormatBundle3D()(results)
    assert out["img"].shape == (4, 48, 64, 3)


def _sweep_pipeline_results(synth_root, loader_step, lazy):
    """Run keyframe-load -> sweep-load -> RandomTransformImage -> format on
    one synthetic sample with the given sweep loader config."""
    from sparsebev_tpu.builder import build_dataset
    cfg = dict(type="NuScenesSweepDataset", ann_file=synth_root,
               pipeline=[
                   dict(type="LoadMultiViewImageFromFiles", lazy=lazy),
                   loader_step,
                   dict(type="RandomTransformImage",
                        ida_aug_conf=dict(H=48, W=96, final_dim=(24, 48),
                                          resize_lim=(0.6, 0.7),
                                          bot_pct_lim=(0.0, 0.0),
                                          rot_lim=(0.0, 0.0),
                                          rand_flip=False),
                        training=False),
                   dict(type="DefaultFormatBundle3D"),
               ])
    ds = build_dataset(cfg)
    return ds[1]


@pytest.fixture(scope="module")
def sweep_synth(tmp_path_factory):
    from sparsebev_tpu.data import make_synthetic_dataset
    root = tmp_path_factory.mktemp("sweep_synth")
    return make_synthetic_dataset(str(root), num_samples=4,
                                  sweeps_between=2, image_hw=(48, 96))


@pytest.mark.parametrize("loader_step", [
    dict(type="LoadMultiViewImageFromMultiSweeps", sweeps_num=2,
         test_mode=True),
    dict(type="LoadMultiViewImageFromMultiSweepsFuture",
         prev_sweeps_num=1, next_sweeps_num=1, test_mode=True),
    dict(type="LoadMultiViewImageFromMultiSweepsFutureInterleave",
         prev_sweeps_num=1, next_sweeps_num=1, test_mode=True),
])
def test_sweep_loaders_lazy_fused_matches_eager(sweep_synth, loader_step):
    """All three sweep loaders must propagate LazyJPEG markers through their
    repeat/pick/interleave plumbing so the fused C++ path produces the same
    images as the eager PIL path (ROADMAP item: fused-path coverage for
    Future/Interleave)."""
    fused = _sweep_pipeline_results(sweep_synth, loader_step, lazy="auto")
    eager = _sweep_pipeline_results(sweep_synth, loader_step, lazy="never")
    assert fused["img"].shape == eager["img"].shape
    assert fused["img"].dtype == np.uint8
    diff = np.abs(fused["img"].astype(int) - eager["img"].astype(int))
    assert np.median(diff) <= 2 and diff.mean() < 6
    np.testing.assert_allclose(fused["lidar2img"], eager["lidar2img"],
                               atol=1e-6)
