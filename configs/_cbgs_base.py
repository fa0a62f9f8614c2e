"""Shared CBGS VoxelNet experiment definition (importable base).

TPU-native counterpart of the common body of the reference's 14 executable
configs (examples/active/cbgs_*.py — e.g. cbgs_spatial_temporal.py): 6 task
groups over 10 nuScenes classes, per-class anchors, 0.1m voxels over ±51.2m,
OneCycle training. Experiment files do
``from _cbgs_base import *`` and override ``selector`` / paths.
"""
import itertools

tasks = [
    dict(num_class=1, class_names=["car"]),
    dict(num_class=2, class_names=["truck", "construction_vehicle"]),
    dict(num_class=2, class_names=["bus", "trailer"]),
    dict(num_class=1, class_names=["barrier"]),
    dict(num_class=2, class_names=["motorcycle", "bicycle"]),
    dict(num_class=2, class_names=["pedestrian", "traffic_cone"]),
]
class_names = list(itertools.chain(*[t["class_names"] for t in tasks]))

_anchor = dict(
    type="anchor_generator_range", rotations=[0, 1.57], velocities=[0, 0]
)


def _gen(cls, size, z, mt, ut):
    return dict(
        **_anchor,
        sizes=size,
        anchor_ranges=[-51.2, -51.2, z, 51.2, 51.2, z],
        matched_threshold=mt,
        unmatched_threshold=ut,
        class_name=cls,
    )


target_assigner = dict(
    type="iou",
    anchor_generators=[
        _gen("car", [1.97, 4.63, 1.74], -0.95, 0.6, 0.45),
        _gen("truck", [2.51, 6.93, 2.84], -0.40, 0.55, 0.4),
        _gen("construction_vehicle", [2.85, 6.37, 3.19], -0.225, 0.5, 0.35),
        _gen("bus", [2.94, 10.5, 3.47], -0.085, 0.55, 0.4),
        _gen("trailer", [2.90, 12.29, 3.87], 0.115, 0.5, 0.35),
        _gen("barrier", [2.53, 0.50, 0.98], -1.33, 0.55, 0.4),
        _gen("motorcycle", [0.77, 2.11, 1.47], -1.085, 0.5, 0.3),
        _gen("bicycle", [0.60, 1.70, 1.28], -1.18, 0.5, 0.35),
        _gen("pedestrian", [0.67, 0.73, 1.77], -0.935, 0.6, 0.4),
        _gen("traffic_cone", [0.41, 0.41, 1.07], -1.285, 0.6, 0.4),
    ],
    sample_positive_fraction=-1,
    sample_size=512,
    region_similarity_calculator=dict(type="nearest_iou_similarity"),
    pos_area_threshold=-1,
    tasks=tasks,
)

box_coder = dict(type="ground_box3d_coder", n_dim=9, linear_dim=False, encode_angle_vector=True)

model = dict(
    type="FPNVoxelNet",
    pretrained=None,
    reader=dict(type="VoxelFeatureExtractorV3", num_input_features=5),
    backbone=dict(
        type="FPNSpMiddleResNetFHD", num_input_features=5, ds_factor=8,
        voxel_caps=(60000, 60000, 30000, 30000),
        # banded MXU engine (ops/banded.py): one-hot slab gathers on the MXU
        # over the brick layout; measured 16.5 vs brick 9.9 scans/s/chip at
        # production scale (round-3 A/B, host plans fed on both engines)
        impl="banded", dtype="bfloat16",
        brick_widths=(16, 16, 8, 4, 4),
        brick_caps=(48000, 17000, 10000, 6000, 6000),
    ),
    neck=dict(
        type="RPN",
        layer_nums=[5, 5],
        ds_layer_strides=[1, 2],
        ds_num_filters=[128, 256],
        us_layer_strides=[1, 2],
        us_num_filters=[256, 256],
        num_input_features=256,
    ),
    bbox_head=dict(
        type="MultiGroupHead",
        mode="3d",
        in_channels=512,
        tasks=tasks,
        weights=[1],
        encode_background_as_zeros=True,
        loss_norm=dict(type="NormByNumPositives", pos_cls_weight=1.0, neg_cls_weight=2.0),
        loss_cls=dict(type="SigmoidFocalLoss", alpha=0.25, gamma=2.0, loss_weight=1.0),
        use_sigmoid_score=True,
        loss_bbox=dict(
            type="WeightedSmoothL1Loss", sigma=3.0,
            code_weights=[1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 0.2, 0.2, 1.0, 1.0],
            codewise=True, loss_weight=0.25,
        ),
        encode_rad_error_by_sin=False,
        loss_aux=None,
    ),
)

assigner = dict(box_coder=box_coder, target_assigner=target_assigner, out_size_factor=8, debug=False)
train_cfg = dict(assigner=assigner)

test_cfg = dict(
    nms=dict(
        use_rotate_nms=True, use_multi_class_nms=False,
        nms_pre_max_size=1000, nms_post_max_size=83, nms_iou_threshold=0.2,
    ),
    score_threshold=0.1,
    post_center_limit_range=[-61.2, -61.2, -10.0, 61.2, 61.2, 10.0],
    max_per_img=500,
)

dataset_type = "NuScenesDataset"
nsweeps = 10
data_root = "data/nuScenes"
max_points = 300000  # padded point capacity (10 sweeps)

db_sampler = dict(
    type="GT-AUG",
    enable=False,  # parity: reference ignores this flag; sampler is always built
    db_info_path="data/nuScenes/dbinfos_train_10sweeps_withvelo.pkl",
    sample_groups=[
        dict(car=2), dict(truck=3), dict(construction_vehicle=7), dict(bus=4),
        dict(trailer=6), dict(barrier=2), dict(motorcycle=6), dict(bicycle=6),
        dict(pedestrian=2), dict(traffic_cone=2),
    ],
    db_prep_steps=[
        dict(filter_by_min_num_points=dict(
            car=5, truck=5, bus=5, trailer=5, construction_vehicle=5,
            traffic_cone=5, barrier=5, motorcycle=5, bicycle=5, pedestrian=5,
        )),
        dict(filter_by_difficulty=[-1]),
    ],
    global_random_rotation_range_per_object=[0, 0],
    rate=1.0,
)

train_preprocessor = dict(
    mode="train",
    shuffle_points=True,
    gt_loc_noise=[0.0, 0.0, 0.0],
    gt_rot_noise=[0.0, 0.0],
    global_rot_noise=[-0.3925, 0.3925],
    global_scale_noise=[0.95, 1.05],
    global_trans_noise=[0.2, 0.2, 0.2],
    remove_points_after_sample=False,
    db_sampler=db_sampler,
    class_names=class_names,
)
val_preprocessor = dict(mode="val", shuffle_points=False)

voxel_generator = dict(
    range=[-51.2, -51.2, -5.0, 51.2, 51.2, 3.0],
    voxel_size=[0.1, 0.1, 0.2],
    max_points_in_voxel=10,
    max_voxel_num=60000,
    bf16=True,  # production: ship bf16 mean features (halves H2D payload)
)

train_pipeline = [
    dict(type="LoadPointCloudFromFile", dataset=dataset_type),
    dict(type="LoadPointCloudAnnotations", with_bbox=True),
    dict(type="Preprocess", cfg=train_preprocessor),
    dict(type="ReformatFixedShape"),
]
test_pipeline = [
    dict(type="LoadPointCloudFromFile", dataset=dataset_type),
    dict(type="LoadPointCloudAnnotations", with_bbox=True),
    dict(type="Preprocess", cfg=val_preprocessor),
    dict(type="ReformatFixedShape"),
]

train_anno = "data/nuScenes/infos_train_10sweeps_withvelo.pkl"
val_anno = "data/nuScenes/infos_val_10sweeps_withvelo.pkl"
test_anno = None

data = dict(
    samples_per_gpu=2,
    workers_per_gpu=4,
    train=dict(
        type=dataset_type, root_path=data_root, info_path=train_anno,
        nsweeps=nsweeps, class_names=class_names, pipeline=train_pipeline,
    ),
    val=dict(
        type=dataset_type, root_path=data_root, info_path=val_anno,
        test_mode=True, nsweeps=nsweeps, class_names=class_names, pipeline=test_pipeline,
    ),
    test=dict(
        type=dataset_type, root_path=data_root, info_path=test_anno,
        nsweeps=nsweeps, class_names=class_names, pipeline=test_pipeline,
    ),
)

optimizer = dict(TYPE="adam", VALUE=dict(amsgrad=0.0, wd=0.01), FIXED_WD=True, MOVING_AVERAGE=False)
optimizer_config = dict(grad_clip=dict(max_norm=35, norm_type=2))
lr_config = dict(type="one_cycle", lr_max=0.002, moms=[0.95, 0.85], div_factor=10.0, pct_start=0.4)

checkpoint_config = dict(interval=1)
log_config = dict(interval=5)
work_dir = "./work_dirs/cbgs"
load_from = None
resume_from = None
train_epochs = 20
total_epochs = train_epochs
workflow = [("train", train_epochs), ("val", 1)]
device_ids = range(2)
log_level = "INFO"
