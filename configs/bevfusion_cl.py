"""BEVFusion stage-2: camera+lidar fusion at production scale (reference
bevfusion/configs/nuscenes/det/transfusion/secfpn/camera+lidar/swint_v0p075/
convfuser.yaml): Swin-T camera branch at 256x704, DepthLSSTransform,
ConvFuser, warm-started from the stage-1 lidar checkpoint
(``--load_from work_dirs/bevfusion_lidar``)."""
from bevfusion_lidar import *  # noqa: F401,F403

model = dict(
    type="BEVFusion",
    with_camera=True,
    num_classes=10,
    num_proposals=200,
    voxel_caps=(120000, 60000, 30000, 30000),
    image_size=(256, 704),
    camera_out_channels=80,
)

_cam_train_pre = dict(
    mode="train", shuffle_points=True,
    global_rot_noise=[-0.3925, 0.3925], global_scale_noise=[0.9, 1.1],
    db_sampler=None, class_names=class_names,  # noqa: F405
)

train_pipeline = [
    dict(type="LoadPointCloudFromFile", dataset="NuScenesDataset"),
    dict(type="LoadPointCloudAnnotations", with_bbox=True),
    dict(type="LoadMultiViewImages"),
    dict(type="Preprocess", cfg=_cam_train_pre),
    # reference ImageAug3D ranges (swint_v0p075/default.yaml)
    dict(type="ImageAug3D", final_dim=(256, 704), resize_lim=(0.38, 0.55),
         bot_pct_lim=(0.0, 0.0), rot_lim=(-5.4, 5.4), rand_flip=True),
    dict(type="GridMask", prob=0.0, ratio=0.5),  # disabled in the det config
    dict(type="ImageNormalize"),
    dict(type="ReformatCamera", final_dim=(256, 704)),
    dict(type="ReformatFixedShape", max_gt=200),
]
test_pipeline = [
    dict(type="LoadPointCloudFromFile", dataset="NuScenesDataset"),
    dict(type="LoadPointCloudAnnotations", with_bbox=True),
    dict(type="LoadMultiViewImages"),
    dict(type="Preprocess", cfg=val_preprocessor),  # noqa: F405
    dict(type="ImageAug3D", final_dim=(256, 704), resize_lim=(0.48, 0.48),
         bot_pct_lim=(0.0, 0.0), rot_lim=(0.0, 0.0), rand_flip=False),
    dict(type="ImageNormalize"),
    dict(type="ReformatCamera", final_dim=(256, 704)),
    dict(type="ReformatFixedShape", max_gt=200),
]

data = dict(
    samples_per_gpu=2,
    train=dict(type="NuScenesDataset", root_path=data_root, info_path=train_anno,  # noqa: F405
               nsweeps=nsweeps, class_names=class_names, pipeline=train_pipeline),  # noqa: F405
    val=dict(type="NuScenesDataset", root_path=data_root, info_path=val_anno,  # noqa: F405
             test_mode=True, nsweeps=nsweeps, class_names=class_names,  # noqa: F405
             pipeline=test_pipeline),
)

lr_config = dict(type="one_cycle", lr_max=0.0001, moms=[0.95, 0.85],
                 div_factor=10.0, pct_start=0.4)
work_dir = "./work_dirs/bevfusion_cl"
total_epochs = 6  # reference stage-2 fine-tune schedule
