# EVA02 ViT-L at 1600x640, 1600 queries, 15 frames (7+7 interleaved sweeps),
# SimpleFeaturePyramid inside the backbone (no separate neck), stop_prev_grad
# (reference configs/vit_eva02_1600x640_trainval_future.py).
_base_ = ["./vov99_dd3d_1600x640_trainval_future.py"]

img_norm_cfg = dict(
    mean=[123.675, 116.280, 103.530],
    std=[58.395, 57.120, 57.375],
    to_rgb=True,
)

model = dict(
    data_aug=dict(img_norm_cfg=img_norm_cfg),
    img_backbone=dict(
        _delete_=True,
        type="EVA02",
        img_size=1536,
        real_img_size=(640, 1600),
        patch_size=16,
        in_chans=3,
        embed_dim=1024,
        depth=24,
        num_heads=16,
        mlp_ratio=4 * 2 / 3,
        qkv_bias=True,
        drop_path_rate=0.3,
        use_abs_pos=True,
        window_size=16,
        # global attention on blocks 2, 5, 8, 11, 14, 17, 20, 23
        window_block_indexes=(
            list(range(0, 2)) + list(range(3, 5)) + list(range(6, 8))
            + list(range(9, 11)) + list(range(12, 14)) + list(range(15, 17))
            + list(range(18, 20)) + list(range(21, 23))
        ),
        residual_block_indexes=(),
        use_act_checkpoint=True,
        fpn_out_channels=256,
        fpn_scale_factors=(4.0, 2.0, 1.0, 0.5),
        fpn_top_block=True,
        frozen_blocks=3,
    ),
    img_neck=None,
    stop_prev_grad=4,
    pts_bbox_head=dict(
        num_query=1600,
        num_levels=5,
        num_points=8,
        num_frames=15,
        # PAIR tables for level 0 only (its y-fold table alone is ~6 GB
        # at 1600x640 T=15 — does not fit 16 GB HBM); the small levels
        # keep the fast one-gather y-fold mode
        table_yfold=(False, True, True, True, True),
    ),
)

_class_names = [
    "car", "truck", "construction_vehicle", "bus", "trailer", "barrier",
    "motorcycle", "bicycle", "pedestrian", "traffic_cone",
]
_point_cloud_range = [-51.2, -51.2, -5.0, 51.2, 51.2, 3.0]

ida_aug_conf = {
    "resize_lim": (0.94, 1.25),
    "final_dim": (640, 1600),
    "bot_pct_lim": (0.0, 0.0),
    "rot_lim": (0.0, 0.0),
    "H": 900, "W": 1600,
    "rand_flip": True,
}

train_pipeline = [
    dict(type="LoadMultiViewImageFromFiles", to_float32=False),
    dict(type="LoadMultiViewImageFromMultiSweepsFutureInterleave",
         prev_sweeps_num=7, next_sweeps_num=7),
    dict(type="LoadAnnotations3D", with_bbox_3d=True, with_label_3d=True),
    dict(type="ObjectRangeFilter", point_cloud_range=_point_cloud_range),
    dict(type="ObjectNameFilter", classes=_class_names),
    dict(type="RandomTransformImage", ida_aug_conf=ida_aug_conf, training=True),
    dict(type="GlobalRotScaleTransImage", rot_range=[-0.3925, 0.3925],
         scale_ratio_range=[0.95, 1.05]),
    dict(type="DefaultFormatBundle3D", class_names=_class_names),
    dict(type="Collect3D", keys=["gt_bboxes_3d", "gt_labels_3d", "img"]),
]

test_pipeline = [
    dict(type="LoadMultiViewImageFromFiles", to_float32=False),
    dict(type="LoadMultiViewImageFromMultiSweepsFutureInterleave",
         prev_sweeps_num=7, next_sweeps_num=7, test_mode=True),
    dict(type="RandomTransformImage", ida_aug_conf=ida_aug_conf, training=False),
    dict(type="DefaultFormatBundle3D", class_names=_class_names,
         with_label=False),
    dict(type="Collect3D", keys=["img"]),
]

data = dict(
    train=dict(pipeline=train_pipeline),
    val=dict(pipeline=test_pipeline),
    test=dict(pipeline=test_pipeline),
)

load_from = "pretrain/eva02_L_coco_det_sys_o365.pth"
revise_keys = None
