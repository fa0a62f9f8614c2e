"""BEVFusion stage-1: lidar-only TransFusion-L (reference
bevfusion/configs/nuscenes/det/transfusion/secfpn/lidar/voxelnet_0p075.yaml):
0.075m voxels over ±54m, SparseEncoder, SECOND+SECONDFPN decoder, TransFusion
head with 200 proposals."""
import itertools

class_names = [
    "car", "truck", "construction_vehicle", "bus", "trailer",
    "barrier", "motorcycle", "bicycle", "pedestrian", "traffic_cone",
]
tasks = [dict(num_class=10, class_names=class_names)]

model = dict(
    type="BEVFusion",
    with_camera=False,
    num_classes=10,
    num_proposals=200,
    voxel_caps=(120000, 60000, 30000, 30000),
)

voxel_generator = dict(
    range=[-54.0, -54.0, -5.0, 54.0, 54.0, 3.0],
    voxel_size=[0.075, 0.075, 0.2],
    max_points_in_voxel=10,
    max_voxel_num=120000,
)

test_cfg = dict(
    out_size_factor=8,
    voxel_size=[0.075, 0.075],
    pc_range=[-54.0, -54.0],
    score_threshold=0.0,
    max_detections=200,
)

dataset_type = "NuScenesDataset"
nsweeps = 10
data_root = "data/nuScenes"
max_points = 300000
train_anno = "data/nuScenes/infos_train_10sweeps_withvelo.pkl"
val_anno = "data/nuScenes/infos_val_10sweeps_withvelo.pkl"

train_preprocessor = dict(
    mode="train", shuffle_points=True,
    global_rot_noise=[-0.3925, 0.3925], global_scale_noise=[0.9, 1.1],
    db_sampler=None, class_names=class_names,
)
val_preprocessor = dict(mode="val", shuffle_points=False)

train_pipeline = [
    dict(type="LoadPointCloudFromFile", dataset=dataset_type),
    dict(type="LoadPointCloudAnnotations", with_bbox=True),
    dict(type="Preprocess", cfg=train_preprocessor),
    dict(type="ReformatFixedShape", max_gt=200),
]
test_pipeline = [
    dict(type="LoadPointCloudFromFile", dataset=dataset_type),
    dict(type="LoadPointCloudAnnotations", with_bbox=True),
    dict(type="Preprocess", cfg=val_preprocessor),
    dict(type="ReformatFixedShape", max_gt=200),
]

data = dict(
    samples_per_gpu=2,
    train=dict(type=dataset_type, root_path=data_root, info_path=train_anno,
               nsweeps=nsweeps, class_names=class_names, pipeline=train_pipeline),
    val=dict(type=dataset_type, root_path=data_root, info_path=val_anno, test_mode=True,
             nsweeps=nsweeps, class_names=class_names, pipeline=test_pipeline),
)

optimizer = dict(TYPE="adamw", VALUE=dict(wd=0.01))
lr_config = dict(type="one_cycle", lr_max=0.0001, moms=[0.95, 0.85], div_factor=10.0, pct_start=0.4)
work_dir = "./work_dirs/bevfusion_lidar"
total_epochs = 20
