"""BEV map-segmentation data path (reference bevfusion loading.py:239) +
seg-head training integration."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dal3d_tpu.data.pipelines.bev_seg import (
    LoadBEVSegmentation, synthetic_map_masks, _lidar_to_global,
)

CLASSES = ("drivable_area", "ped_crossing", "walkway",
           "stop_line", "carpark_area", "divider")


def test_identity_transform_masks_match_direct_eval():
    stage = LoadBEVSegmentation(xbound=(-8, 8, 1.0), ybound=(-8, 8, 1.0),
                                classes=CLASSES)
    res, info = stage({}, {})
    masks = res["gt_masks_bev"]
    assert masks.shape == (len(CLASSES), 16, 16)
    xs = -8 + (np.arange(16) + 0.5)
    gx, gy = np.meshgrid(xs, xs, indexing="ij")
    direct = synthetic_map_masks(np.stack([gx, gy], -1), CLASSES)
    np.testing.assert_array_equal(masks, direct)
    assert masks.sum() > 0  # the map is non-trivial over the patch


def test_global_transform_shifts_masks():
    # ego 10 m further along +y: the road band pattern (period 40 in global
    # y) must shift accordingly
    ref_from_car = np.eye(4)
    car_from_global = np.eye(4)
    car_from_global[:3, 3] = -(car_from_global[:3, :3] @ [0.0, 10.0, 0.0])
    info = {"ref_from_car": ref_from_car, "car_from_global": car_from_global}
    l2g = _lidar_to_global(info, None)
    np.testing.assert_allclose(l2g[:3, 3], [0, 10, 0], atol=1e-9)

    stage = LoadBEVSegmentation(xbound=(-8, 8, 1.0), ybound=(-8, 8, 1.0),
                                classes=CLASSES)
    res, _ = stage({}, info)
    xs = -8 + (np.arange(16) + 0.5)
    gx, gy = np.meshgrid(xs, xs, indexing="ij")
    direct = synthetic_map_masks(np.stack([gx, gy + 10.0], -1), CLASSES)
    np.testing.assert_array_equal(res["gt_masks_bev"], direct)


def test_lidar_aug_matrix_is_inverted():
    # a 90-degree lidar-frame rotation: augmented point (x, y) was
    # originally (y, -x); masks must follow
    A = np.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    stage = LoadBEVSegmentation(xbound=(-8, 8, 1.0), ybound=(-8, 8, 1.0),
                                classes=CLASSES)
    res, _ = stage({"lidar": {"aug_matrix": A}}, {})
    xs = -8 + (np.arange(16) + 0.5)
    gx, gy = np.meshgrid(xs, xs, indexing="ij")
    inv = np.linalg.inv(A)
    pts = np.stack([gx, gy, np.zeros_like(gx)], -1) @ inv.T
    direct = synthetic_map_masks(pts[..., :2], CLASSES)
    np.testing.assert_array_equal(res["gt_masks_bev"], direct)


@pytest.mark.slow
def test_seg_loss_trains_with_fusion_step():
    from dal3d_tpu.models.bevfusion.bevfusion import BEVFusion
    from dal3d_tpu.ops.voxelize import VoxelConfig
    from dal3d_tpu.runtime.bevfusion_steps import (
        create_bevfusion_state, make_bevfusion_train_step,
    )
    from dal3d_tpu.models.bevfusion.transfusion import TransFusionTestCfg
    from dal3d_tpu.solver.optim import OneCycleSchedule, build_optimizer

    vcfg = VoxelConfig((-8.0, -8.0, -3.0, 8.0, 8.0, 1.0), (0.25, 0.25, 0.1),
                       3, 2000)
    model = BEVFusion(voxel_cfg=vcfg, with_camera=False, num_classes=2,
                      num_proposals=8, voxel_caps=(2000, 1000, 500, 500),
                      decoder_channels=(32, 64), with_map_seg=True,
                      seg_classes=CLASSES)
    rng = np.random.RandomState(0)
    B, P = 2, 1500
    pts = np.zeros((B, P, 5), np.float32)
    pts[..., :2] = rng.uniform(-7.9, 7.9, (B, P, 2))
    pts[..., 2] = rng.uniform(-2.9, 0.9, (B, P))
    gt = np.zeros((B, 4, 9), np.float32)
    gt[..., 3:6] = 1.0
    gt[:, 0] = [2, 3, -0.9, 2.0, 4.6, 1.7, 0, 0, 0.5]
    cls = np.zeros((B, 4), np.int32)
    cls[:, 0] = 1
    # 8x8 seg canvas (= fused BEV 64/8) with a fixed pattern to fit
    masks = np.zeros((B, 8, 8, len(CLASSES)), np.float32)
    masks[:, :4, :, 0] = 1.0
    batch = {
        "points": jnp.asarray(pts), "points_valid": jnp.ones((B, P), bool),
        "gt_boxes": jnp.asarray(gt), "gt_classes": jnp.asarray(cls),
        "gt_masks_bev": jnp.asarray(masks),
    }
    tcfg = TransFusionTestCfg(out_size_factor=8, voxel_size=(0.25, 0.25),
                              pc_range=(-8.0, -8.0))
    opt = build_optimizer(OneCycleSchedule(lr_max=1e-3, total_steps=30))
    state = create_bevfusion_state(model, opt, jax.random.PRNGKey(0), batch)
    step = make_bevfusion_train_step(model, opt, tcfg)
    segs = []
    for _ in range(12):
        state, logs = step(state, batch)
        segs.append(float(logs["seg_loss"]))
    assert np.isfinite(segs).all()
    assert segs[-1] < segs[0]  # seg head is learning
