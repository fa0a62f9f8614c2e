"""Small-scale config bound to the synthetic nuScenes-schema dataset
(development / CI / CLI smoke runs). Same structure as the production
configs, scaled down: 16m range, (41,64,64) sparse grid (production depth
chain), 2 task groups, 8k-point clouds."""
import itertools

tasks = [
    dict(num_class=1, class_names=["car"]),
    dict(num_class=2, class_names=["pedestrian", "traffic_cone"]),
]
class_names = list(itertools.chain(*[t["class_names"] for t in tasks]))

_anchor = dict(type="anchor_generator_range", rotations=[0, 1.57], velocities=[0, 0])

target_assigner = dict(
    type="iou",
    anchor_generators=[
        # synthetic boxes have uniform random yaw: the production 0.6 match
        # threshold leaves ~1 force-matched anchor per GT, so the smoke config
        # uses looser thresholds to get a trainable positive set
        dict(**_anchor, sizes=[1.97, 4.63, 1.74], anchor_ranges=[-8, -8, -0.95, 8, 8, -0.95],
             matched_threshold=0.4, unmatched_threshold=0.3, class_name="car"),
        dict(**_anchor, sizes=[0.67, 0.73, 1.77], anchor_ranges=[-8, -8, -0.935, 8, 8, -0.935],
             matched_threshold=0.35, unmatched_threshold=0.2, class_name="pedestrian"),
        dict(**_anchor, sizes=[0.41, 0.41, 1.07], anchor_ranges=[-8, -8, -1.285, 8, 8, -1.285],
             matched_threshold=0.35, unmatched_threshold=0.2, class_name="traffic_cone"),
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
    reader=dict(type="VoxelFeatureExtractorV3", num_input_features=5),
    backbone=dict(type="FPNSpMiddleResNetFHD", num_input_features=5, ds_factor=8,
                  voxel_caps=(8000, 4000, 2000, 2000)),
    neck=dict(type="RPN", layer_nums=[3, 3], ds_layer_strides=[1, 2],
              ds_num_filters=[64, 128], us_layer_strides=[1, 2],
              us_num_filters=[64, 64], num_input_features=256),
    bbox_head=dict(
        type="MultiGroupHead", tasks=tasks,
        loss_norm=dict(type="NormByNumPositives", pos_cls_weight=1.0, neg_cls_weight=2.0),
        loss_cls=dict(type="SigmoidFocalLoss", alpha=0.25, gamma=2.0, loss_weight=1.0),
        loss_bbox=dict(type="WeightedSmoothL1Loss", sigma=3.0,
                       code_weights=[1.0] * 10, codewise=True, loss_weight=0.25),
        encode_rad_error_by_sin=False,
    ),
)

assigner = dict(box_coder=box_coder, target_assigner=target_assigner, out_size_factor=8)
train_cfg = dict(assigner=assigner)
test_cfg = dict(
    nms=dict(use_rotate_nms=True, nms_pre_max_size=128, nms_post_max_size=16,
             nms_iou_threshold=0.2),
    score_threshold=0.05,
    post_center_limit_range=[-10, -10, -5, 10, 10, 5],
    max_per_img=64,
)

dataset_type = "NuScenesDataset"
nsweeps = 1
data_root = "data/synthetic"
max_points = 30000

# 0.125 m voxels -> (41, 128, 128) grid -> 16x16 anchor map (1 m anchor
# spacing); at the smoke scale the coarser 0.25 m/8x8 grid leaves anchors
# ~2 m apart and random-pose GTs unmatched (num_pos ~2)
voxel_generator = dict(
    range=[-8.0, -8.0, -3.0, 8.0, 8.0, 1.0],
    voxel_size=[0.125, 0.125, 0.1],
    max_points_in_voxel=5,
    max_voxel_num=8000,
)

train_preprocessor = dict(
    mode="train", shuffle_points=True,
    gt_loc_noise=[0.0, 0.0, 0.0], gt_rot_noise=[0.0, 0.0],
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
    workers_per_gpu=1,
    train=dict(type=dataset_type, root_path=data_root, info_path=train_anno,
               nsweeps=nsweeps, class_names=class_names, pipeline=train_pipeline),
    val=dict(type=dataset_type, root_path=data_root, info_path=val_anno, test_mode=True,
             nsweeps=nsweeps, class_names=class_names, pipeline=test_pipeline),
)

optimizer = dict(TYPE="adam", VALUE=dict(amsgrad=0.0, wd=0.01), FIXED_WD=True)
optimizer_config = dict(grad_clip=dict(max_norm=35, norm_type=2))
lr_config = dict(type="one_cycle", lr_max=0.003, moms=[0.95, 0.85], div_factor=10.0, pct_start=0.4)

selector = dict(
    type="SpatialTemporalSelector",
    budget=6,
    buffer_file="data/buffers/synthetic_st.json",
    infos_origin=train_anno,
    logs_file="data/synthetic/v1.0-trainval/log.json",
    distance_store_file="data/buffers/synthetic_dij.npy",
)

checkpoint_config = dict(interval=1)
log_config = dict(interval=2)
work_dir = "./work_dirs/cbgs_synthetic"
train_epochs = 2
total_epochs = train_epochs
workflow = [("train", train_epochs), ("val", 1)]
