"""Sustained-training benchmark config (VERDICT r2 #6): the FULL r50 setting
(704x256 input, T=8, Q=900, DN on, bf16 compute) driven by synthetic JPEGs
generated at the network input resolution, so a long run measures the real
train-step cost and the host input pipeline without nuScenes on disk.

Only the data plumbing differs from r50_nuimg_704x256: 1:1 IDA (synthetic
images are generated at final_dim already) and the ann_file is injected via
--override. Model, losses, optimizer, DN, schedule are inherited untouched.
Driven by tools/sustained_train.py.
"""

_base_ = ["./r50_nuimg_704x256.py"]

_point_cloud_range = [-51.2, -51.2, -5.0, 51.2, 51.2, 3.0]
_class_names = [
    "car", "truck", "construction_vehicle", "bus", "trailer", "barrier",
    "motorcycle", "bicycle", "pedestrian", "traffic_cone",
]

ida_aug_conf = {
    "resize_lim": (1.0, 1.0),
    "final_dim": (256, 704),
    "bot_pct_lim": (0.0, 0.0),
    "rot_lim": (0.0, 0.0),
    "H": 256, "W": 704,
    "rand_flip": True,
}

train_pipeline = [
    dict(type="LoadMultiViewImageFromFiles", to_float32=False),
    dict(type="LoadMultiViewImageFromMultiSweeps", sweeps_num=7),
    dict(type="LoadAnnotations3D", with_bbox_3d=True, with_label_3d=True),
    dict(type="ObjectRangeFilter", point_cloud_range=_point_cloud_range),
    dict(type="ObjectNameFilter", classes=_class_names),
    dict(type="RandomTransformImage", ida_aug_conf=ida_aug_conf,
         training=True),
    dict(type="GlobalRotScaleTransImage", rot_range=[-0.3925, 0.3925],
         scale_ratio_range=[0.95, 1.05]),
    dict(type="DefaultFormatBundle3D", class_names=_class_names),
    dict(type="Collect3D", keys=["gt_bboxes_3d", "gt_labels_3d", "img"]),
]

data = dict(
    workers_per_gpu=4,
    train=dict(ann_file="", pipeline=train_pipeline, data_root=""),
)

batch_size = 2
steps_per_dispatch = 10
eval_config = dict(interval=0)   # no EvalHook during the benchmark run
checkpoint_config = dict(interval=100, max_keep_ckpts=1)
