"""Smoke config for the streaming FPS workflow: identical to
smoke_synthetic but the val pipeline uses ``load_online=True`` — history
frames carry metadata only (no JPEG decode), matching the reference's
single-GPU test path (/root/reference/loaders/pipelines/loading.py:103-144).
With TEST_INTERVAL=6 and the sweep layout, every history frame is a
previously-visited keyframe, so the StreamingDetector ring cache always
hits; tests/test_tools.py drives tools/val.py --online over a full split on
this config to prove the invariant.
"""

_base_ = ["./smoke_synthetic.py"]

num_frames = 2
ida_aug_conf = {
    "resize_lim": (0.8, 1.0),
    "final_dim": (32, 64),
    "bot_pct_lim": (0.0, 0.0),
    "rot_lim": (0.0, 0.0),
    "H": 64, "W": 128,
    "rand_flip": False,
}

test_pipeline_online = [
    dict(type="LoadMultiViewImageFromFiles"),
    dict(type="LoadMultiViewImageFromMultiSweeps", sweeps_num=num_frames - 1,
         test_mode=True, load_online=True),
    dict(type="RandomTransformImage", ida_aug_conf=ida_aug_conf,
         training=False),
    dict(type="DefaultFormatBundle3D"),
    dict(type="Collect3D", keys=["gt_bboxes_3d", "gt_labels_3d", "img"]),
]

data = dict(
    val=dict(pipeline=test_pipeline_online),
)
