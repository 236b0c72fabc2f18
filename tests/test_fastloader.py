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
