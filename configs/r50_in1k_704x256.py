# torchvision ImageNet-1k pretrained ResNet-50, backbone lr x0.4, 36 epochs
# (reference configs/r50_in1k_704x256.py).
_base_ = ["./r50_nuimg_704x256.py"]

optimizer = dict(
    paramwise_cfg=dict(custom_keys={
        "backbone": dict(lr_mult=0.4),
        "sampling_offset": dict(lr_mult=0.1),
    }),
)

load_from = None  # e.g. a ported torchvision resnet50 .pth
revise_keys = None

total_epochs = 36
eval_config = dict(interval=total_epochs)
