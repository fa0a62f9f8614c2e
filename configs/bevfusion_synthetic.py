"""BEVFusion lidar-only config bound to the synthetic nuScenes-schema dataset
(development / CI smoke runs for tools/train_bevfusion.py). Same structure as
configs/bevfusion_lidar.py, scaled down to the 16m synthetic scenes."""
import itertools

tasks = [
    dict(num_class=1, class_names=["car"]),
    dict(num_class=2, class_names=["pedestrian", "traffic_cone"]),
]
class_names = list(itertools.chain(*[t["class_names"] for t in tasks]))

model = dict(
    type="BEVFusion",
    with_camera=False,
    num_classes=3,
    num_proposals=32,
    voxel_caps=(4000, 2000, 1000, 1000),
    decoder_channels=(32, 64),
)

voxel_generator = dict(
    range=[-8.0, -8.0, -3.0, 8.0, 8.0, 1.0],
    voxel_size=[0.25, 0.25, 0.1],
    max_points_in_voxel=5,
    max_voxel_num=4000,
)

test_cfg = dict(
    out_size_factor=8,
    voxel_size=[0.25, 0.25],
    pc_range=[-8.0, -8.0],
    score_threshold=0.0,
    max_detections=32,
)

dataset_type = "NuScenesDataset"
nsweeps = 1
data_root = "data/synthetic"
max_points = 30000

train_preprocessor = dict(
    mode="train", shuffle_points=True,
    global_rot_noise=[-0.3925, 0.3925], global_scale_noise=[0.95, 1.05],
    db_sampler=None, class_names=class_names,
)
val_preprocessor = dict(mode="val", shuffle_points=False)

train_pipeline = [
    dict(type="LoadPointCloudFromFile", dataset=dataset_type),
    dict(type="LoadPointCloudAnnotations", with_bbox=True),
    dict(type="Preprocess", cfg=train_preprocessor),
    dict(type="ReformatFixedShape", max_gt=32),
]
test_pipeline = [
    dict(type="LoadPointCloudFromFile", dataset=dataset_type),
    dict(type="LoadPointCloudAnnotations", with_bbox=True),
    dict(type="Preprocess", cfg=val_preprocessor),
    dict(type="ReformatFixedShape", max_gt=32),
]

train_anno = "data/synthetic/infos_train_10sweeps_withvelo.pkl"
val_anno = "data/synthetic/infos_val_10sweeps_withvelo.pkl"

data = dict(
    samples_per_gpu=2,
    train=dict(type=dataset_type, root_path=data_root, info_path=train_anno,
               nsweeps=nsweeps, class_names=class_names, pipeline=train_pipeline),
    val=dict(type=dataset_type, root_path=data_root, info_path=val_anno, test_mode=True,
             nsweeps=nsweeps, class_names=class_names, pipeline=test_pipeline),
)

optimizer = dict(TYPE="adamw", VALUE=dict(wd=0.01))
lr_config = dict(type="one_cycle", lr_max=0.001, moms=[0.95, 0.85], div_factor=10.0, pct_start=0.4)
log_config = dict(interval=2)
work_dir = "./work_dirs/bevfusion_synthetic"
total_epochs = 1
