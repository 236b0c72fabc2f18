# Tiny smoke config: synthetic dataset, 2-layer decoder, 2 frames, CPU-sized.
# Used by the CLI integration tests and quick sanity runs.
_base_ = ["./r50_nuimg_704x256.py"]

embed_dims = 64
num_frames = 2
num_query = 16

model = dict(
    compute_dtype="float32",
    img_neck=dict(out_channels=embed_dims),
    pts_bbox_head=dict(
        in_channels=embed_dims,
        num_query=num_query,
        num_frames=num_frames,
        num_points=2,
        num_layers=2,
        query_denoising_groups=2,
    ),
)

max_gt = 8

ida_aug_conf = {
    "resize_lim": (0.8, 1.0),
    "final_dim": (32, 64),
    "bot_pct_lim": (0.0, 0.0),
    "rot_lim": (0.0, 0.0),
    "H": 64, "W": 128,
    "rand_flip": True,
}

_point_cloud_range = [-51.2, -51.2, -5.0, 51.2, 51.2, 3.0]
_class_names = [
    "car", "truck", "construction_vehicle", "bus", "trailer", "barrier",
    "motorcycle", "bicycle", "pedestrian", "traffic_cone",
]

train_pipeline = [
    dict(type="LoadMultiViewImageFromFiles"),
    dict(type="LoadMultiViewImageFromMultiSweeps", sweeps_num=num_frames - 1),
    dict(type="ObjectRangeFilter", point_cloud_range=_point_cloud_range),
    dict(type="ObjectNameFilter", classes=_class_names),
    dict(type="RandomTransformImage", ida_aug_conf=ida_aug_conf, training=True),
    dict(type="GlobalRotScaleTransImage"),
    dict(type="DefaultFormatBundle3D"),
    dict(type="Collect3D", keys=["gt_bboxes_3d", "gt_labels_3d", "img"]),
]

test_pipeline = [
    dict(type="LoadMultiViewImageFromFiles"),
    dict(type="LoadMultiViewImageFromMultiSweeps", sweeps_num=num_frames - 1,
         test_mode=True),
    dict(type="RandomTransformImage", ida_aug_conf=ida_aug_conf, training=False),
    dict(type="DefaultFormatBundle3D"),
    dict(type="Collect3D", keys=["gt_bboxes_3d", "gt_labels_3d", "img"]),
]

# ann_file is filled in by the test / user via --override
data = dict(
    workers_per_gpu=2,
    train=dict(ann_file="", pipeline=train_pipeline, test_mode=False,
               use_valid_flag=True, data_root=""),
    val=dict(ann_file="", pipeline=test_pipeline, test_mode=False,
             use_valid_flag=True, data_root=""),
    test=dict(ann_file="", pipeline=test_pipeline, data_root=""),
)

total_epochs = 1
eval_config = dict(interval=1)
batch_size = 2
log_config = dict(interval=1, hooks=[dict(type="TextLoggerHook", interval=1)])
