# ResNet-101 at 1408x512 with a 5-level pyramid
# (reference configs/r101_nuimg_1408x512.py).
_base_ = ["./r50_nuimg_704x256.py"]

class_names = [
    "car", "truck", "construction_vehicle", "bus", "trailer", "barrier",
    "motorcycle", "bicycle", "pedestrian", "traffic_cone",
]
point_cloud_range = [-51.2, -51.2, -5.0, 51.2, 51.2, 3.0]
num_frames = 8

model = dict(
    # with_cp matches the reference r101 config (their configs set backbone
    # checkpointing on r50 AND r101). At 1408x512 T=8 the 23 un-remat'd
    # layer3 blocks alone hold ~6 GB of [48,32,88,1024] activations;
    # measured 2026-08-20: the B=1 DN-on train step still wants 23.8 GB
    # HBM even WITH backbone remat — r101 training does not fit one 16 GB
    # v5e (the reference trains it with full 8-frame backward on larger
    # GPUs); it needs a >=2-chip query-sharded/FSDP mesh or stop_prev_grad.
    # Our r50 config leaves with_cp off: 704x256 fits to B=2 without
    # recompute and steps faster.
    img_backbone=dict(depth=101, with_cp=True),
    img_neck=dict(num_outs=5),
    # 5 feature levels: the base's 4-entry table_gsplit must be overridden.
    # Ring sizes here are L0 2.2 GB / L1 557 / L2 139 / L3 35 / L4 8.7 MB;
    # group-splitting L2 (139 -> 4x35 MB chunks) is the one in MSA's VMEM
    # prefetch window. Measured v5e 2026-08-19: 85.1 ms/sample streaming
    # (11.75 FPS) with gsplit L2; L1+L2 measured the same (557 MB / 4 =
    # 139 MB chunks add nothing, as on r50's L0).
    pts_bbox_head=dict(
        num_levels=5,
        table_gsplit=(False, False, True, False, False),
        # train/offline pack twin (same level: 4x35 MB chunks); the r50
        # train-step A/B measured -6.7% (2026-08-20), mechanism identical
        table_gsplit_pack=(False, False, True, False, False),
    ),
)

ida_aug_conf = {
    "resize_lim": (0.76, 1.10),
    "final_dim": (512, 1408),
    "bot_pct_lim": (0.0, 0.0),
    "rot_lim": (0.0, 0.0),
    "H": 900, "W": 1600,
    "rand_flip": True,
}

train_pipeline = [
    dict(type="LoadMultiViewImageFromFiles", to_float32=False),
    dict(type="LoadMultiViewImageFromMultiSweeps", sweeps_num=num_frames - 1),
    dict(type="LoadAnnotations3D", with_bbox_3d=True, with_label_3d=True),
    dict(type="ObjectRangeFilter", point_cloud_range=point_cloud_range),
    dict(type="ObjectNameFilter", classes=class_names),
    dict(type="RandomTransformImage", ida_aug_conf=ida_aug_conf, training=True),
    dict(type="GlobalRotScaleTransImage", rot_range=[-0.3925, 0.3925],
         scale_ratio_range=[0.95, 1.05]),
    dict(type="DefaultFormatBundle3D", class_names=class_names),
    dict(type="Collect3D", keys=["gt_bboxes_3d", "gt_labels_3d", "img"]),
]

test_pipeline = [
    dict(type="LoadMultiViewImageFromFiles", to_float32=False),
    dict(type="LoadMultiViewImageFromMultiSweeps", sweeps_num=num_frames - 1,
         test_mode=True),
    dict(type="RandomTransformImage", ida_aug_conf=ida_aug_conf, training=False),
    dict(type="DefaultFormatBundle3D", class_names=class_names,
         with_label=False),
    dict(type="Collect3D", keys=["img"]),
]

data = dict(
    train=dict(pipeline=train_pipeline),
    val=dict(pipeline=test_pipeline),
    test=dict(pipeline=test_pipeline),
)
