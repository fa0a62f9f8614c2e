"""BEVFusion camera+lidar (stage-2) config on the synthetic multi-view
dataset — smoke config for tools/train_bevfusion.py's fusion path
(reference bevfusion/configs/nuscenes/det/transfusion/secfpn/camera+lidar/
swint_v0p075/convfuser.yaml)."""
from bevfusion_synthetic import *  # noqa: F401,F403

model = dict(
    type="BEVFusion",
    with_camera=True,
    num_classes=3,
    num_proposals=32,
    voxel_caps=(4000, 2000, 1000, 1000),
    decoder_channels=(32, 64),
    image_size=(32, 48),
    camera_out_channels=16,
    # BEV map segmentation on the fused map (LoadBEVSegmentation targets)
    with_map_seg=True,
)

_classes = ["car", "pedestrian", "traffic_cone"]
_cam_train_pre = dict(
    mode="train", shuffle_points=False,
    global_rot_noise=[-0.3925, 0.3925], global_scale_noise=[0.95, 1.05],
    db_sampler=None, class_names=_classes,
)

train_pipeline = [
    dict(type="LoadPointCloudFromFile", dataset="NuScenesDataset"),
    dict(type="LoadPointCloudAnnotations", with_bbox=True),
    dict(type="LoadMultiViewImages"),
    dict(type="Preprocess", cfg=_cam_train_pre),
    dict(type="ImageAug3D", final_dim=(32, 48), resize_lim=(0.48, 0.52),
         bot_pct_lim=(0.0, 0.0), rot_lim=(-5.4, 5.4), rand_flip=True),
    dict(type="GridMask", prob=0.3, ratio=0.5),
    dict(type="ImageNormalize"),
    # map-mask targets over the scene extent at the fused-BEV resolution
    dict(type="LoadBEVSegmentation", xbound=(-8.0, 8.0, 2.0), ybound=(-8.0, 8.0, 2.0)),
    dict(type="ReformatCamera", final_dim=(32, 48)),
    dict(type="ReformatFixedShape", max_gt=32),
]

data = dict(
    samples_per_gpu=2,
    train=dict(type="NuScenesDataset", root_path="data/synthetic_cam",
               info_path="data/synthetic_cam/infos_train_10sweeps_withvelo.pkl",
               nsweeps=1, class_names=_classes, pipeline=train_pipeline),
)

work_dir = "./work_dirs/bevfusion_cl_synthetic"
total_epochs = 1
