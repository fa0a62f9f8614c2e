"""Detection-quality harness: overfit a tiny synthetic scene and assert
real mAP through the full path (points -> voxelize -> sparse backbone -> RPN
-> head -> decode -> rotated NMS -> kitti-style AP40).

The reference's acceptance oracle is end-to-end devkit eval
(det3d/datasets/nuscenes/nuscenes.py:181); with no nuScenes data in CI this
is the equivalent falsifiable check — a decode/NMS/anchor-layout regression
sends mAP to ~0 even when the training loss still decreases (600 steps are
needed because eval-mode BatchNorm uses running stats, torch momentum 0.01).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dal3d_tpu.ops.voxelize import VoxelConfig
from dal3d_tpu.core.anchors import generate_task_anchors
from dal3d_tpu.core.box_coders import GroundBox3dCoder
from dal3d_tpu.core.target_assigner import DeviceTargetAssigner
from dal3d_tpu.models import FPNVoxelNet
from dal3d_tpu.models.builder import DetectorBundle
from dal3d_tpu.models.heads.mg_head import LossConfig, TestConfig
from dal3d_tpu.runtime.steps import create_train_state, make_train_step, make_predict_step
from dal3d_tpu.solver.optim import OneCycleSchedule, build_optimizer
from dal3d_tpu.eval.kitti_eval import kitti_eval

pytestmark = [pytest.mark.slow, pytest.mark.overfit]

VCFG = VoxelConfig(
    point_cloud_range=(-8.0, -8.0, -3.0, 8.0, 8.0, 1.0),
    voxel_size=(0.5, 0.5, 0.1),  # grid 32x32x40 -> sparse (41,32,32)
    max_points_in_voxel=5,
    max_voxel_num=1000,
)
GENS = [
    dict(type="anchor_generator_range", sizes=[1.97, 4.63, 1.74],
         anchor_ranges=[-8, -8, -0.95, 8, 8, -0.95], rotations=[0, 1.57], velocities=[0, 0],
         matched_threshold=0.6, unmatched_threshold=0.45, class_name="car"),
]
TASKS = [dict(num_class=1, class_names=["car"])]


def make_bundle():
    coder = GroundBox3dCoder(vec_encode=True, n_dim=9)
    tas = generate_task_anchors(GENS, TASKS, [1, 4, 4])
    model = FPNVoxelNet(
        voxel_cfg=VCFG, num_classes=(1,), voxel_caps=(1000, 500, 250, 250),
        rpn_ds_filters=(32, 64), rpn_us_filters=(32, 32),
    )
    return DetectorBundle(
        model=model, voxel_cfg=VCFG, task_anchors=tas, box_coder=coder,
        assigner=DeviceTargetAssigner(tas, coder), loss_cfg=LossConfig(),
        test_cfg=TestConfig(nms_pre_max_size=32, nms_post_max_size=8,
                            score_threshold=0.3),
        num_classes=(1,), class_names=["car"],
    )


def sample_box_points(rng, box, n):
    x, y, z, w, l, h = box[:6]
    yaw = box[8]
    local = rng.uniform(-0.5, 0.5, (n, 3)) * [w, l, h]
    c, s = np.cos(yaw), np.sin(yaw)
    return np.stack([
        local[:, 0] * c - local[:, 1] * s + x,
        local[:, 0] * s + local[:, 1] * c + y,
        local[:, 2] + z,
    ], 1)


def make_scene(seed, n_cars):
    rng = np.random.RandomState(seed)
    gt = np.zeros((4, 9), np.float32)
    cls = np.zeros((4,), np.int32)
    poses = [(-4.0, -3.5, 0.3), (3.5, 2.5, 1.2), (0.5, -4.5, -0.7), (-3.0, 4.0, 2.0)]
    pts_list = []
    for i in range(n_cars):
        x, y, yaw = poses[i]
        gt[i] = [x, y, -0.9, 1.97, 4.63, 1.74, 0, 0, yaw]
        cls[i] = 1
        pts_list.append(sample_box_points(rng, gt[i], 400))
    pts_list.append(np.stack([
        rng.uniform(-7.9, 7.9, 1200), rng.uniform(-7.9, 7.9, 1200),
        rng.uniform(-2.95, -2.5, 1200)], 1))
    xyz = np.concatenate(pts_list)
    P = 2600
    pts = np.zeros((P, 5), np.float32)
    n = min(len(xyz), P)
    pts[:n, :3] = xyz[:n]
    valid = np.zeros(P, bool)
    valid[:n] = True
    return pts, valid, gt, cls


def test_overfit_reaches_detection_map():
    frames = [make_scene(s, n_cars=2 + s % 2) for s in range(2)]
    B = len(frames)
    batch = {
        "points": jnp.asarray(np.stack([f[0] for f in frames])),
        "points_valid": jnp.asarray(np.stack([f[1] for f in frames])),
        "gt_boxes": [jnp.asarray(np.stack([f[2] for f in frames]))],
        "gt_classes": [jnp.asarray(np.stack([f[3] for f in frames]))],
    }
    bundle = make_bundle()
    n_steps = 600
    opt = build_optimizer(OneCycleSchedule(lr_max=0.003, total_steps=n_steps))
    state = create_train_state(bundle, opt, jax.random.PRNGKey(0), batch)
    step = make_train_step(bundle, opt)
    for _ in range(n_steps):
        state, logs = step(state, batch)
    assert float(logs["loss"]) < 0.05  # overfit succeeded

    predict = make_predict_step(bundle)
    out = predict(state.params, state.batch_stats,
                  {"points": batch["points"], "points_valid": batch["points_valid"]})
    out = {k: np.asarray(v) for k, v in out.items()}
    gt_frames, pred_frames = [], []
    for b in range(B):
        gtb = frames[b][2][frames[b][3] > 0]
        gt_frames.append({"boxes": gtb, "names": np.array(["car"] * len(gtb)),
                          "scores": None})
        v = out["det_valid"][b].astype(bool)
        pred_frames.append({
            "boxes": out["box3d_lidar"][b][v],
            "names": np.array(["car"] * int(v.sum())),
            "scores": out["scores"][b][v],
        })
    res = kitti_eval(gt_frames, pred_frames, ["car"])["results"]
    # BEV @0.7 IoU is the robust signal; 3D adds the z/h axis which the
    # 0.5m-voxel toy grid resolves more coarsely
    assert res["mAP_bev"] >= 0.5, res
    assert res["mAP_3d"] >= 0.3, res
