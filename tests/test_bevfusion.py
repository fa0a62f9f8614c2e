"""BEVFusion track: bev_pool oracle, vtransform geometry, swin shapes,
lidar-only and camera+lidar forward, TransFusion loss/decode."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dal3d_tpu.ops.bev_pool import bev_pool, bev_pool_batched
from dal3d_tpu.ops.voxelize import VoxelConfig, voxelize_mean_grid
from dal3d_tpu.models.bevfusion import (
    BEVFusion, SwinTransformer, TransFusionTestCfg, transfusion_decode, transfusion_loss,
)

VCFG = VoxelConfig(
    point_cloud_range=(-8.0, -8.0, -3.0, 8.0, 8.0, 1.0),
    voxel_size=(0.25, 0.25, 0.1),
    max_points_in_voxel=5,
    max_voxel_num=2000,
)


def test_bev_pool_matches_scatter_oracle():
    rng = np.random.RandomState(0)
    Np, C, nx, ny, nz = 500, 8, 16, 16, 2
    feats = rng.randn(Np, C).astype(np.float32)
    coords = np.stack([
        rng.randint(-2, nx + 2, Np), rng.randint(-2, ny + 2, Np), rng.randint(0, nz, Np)
    ], axis=1).astype(np.int32)
    valid = np.all((coords >= 0) & (coords < [nx, ny, nz]), axis=1)
    out = np.asarray(bev_pool(jnp.asarray(feats), jnp.asarray(coords), jnp.asarray(valid), nx, ny, nz))
    ref = np.zeros((nz, ny, nx, C), np.float32)
    for i in np.flatnonzero(valid):
        x, y, z = coords[i]
        ref[z, y, x] += feats[i]
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_bev_pool_batched_channel_collapse():
    rng = np.random.RandomState(1)
    B, Np, C, n = 2, 100, 4, 8
    feats = rng.randn(B, Np, C).astype(np.float32)
    coords = rng.randint(0, n, (B, Np, 3)).astype(np.int32)
    coords[..., 2] = rng.randint(0, 2, (B, Np))
    out = bev_pool_batched(jnp.asarray(feats), jnp.asarray(coords), jnp.ones((B, Np), bool), n, n, 2)
    assert out.shape == (B, n, n, 2 * C)


def test_add_fuser():
    from dal3d_tpu.models.bevfusion import AddFuser

    rng = np.random.RandomState(0)
    cam = jnp.asarray(rng.randn(1, 8, 8, 16).astype(np.float32))
    lid = jnp.asarray(rng.randn(1, 8, 8, 24).astype(np.float32))
    m = AddFuser(out_channels=32, dropout=0.5)
    var = m.init(jax.random.PRNGKey(0), [cam, lid], False)
    out = m.apply(var, [cam, lid], False)
    assert out.shape == (1, 8, 8, 32)
    # eval path = plain mean of the two transformed branches
    # train path with dropout: some draws drop one branch, renormalized
    outs = [
        m.apply(var, [cam, lid], True,
                rngs={"dropout": jax.random.PRNGKey(s)}, mutable=["batch_stats"])[0]
        for s in range(8)
    ]
    assert any(not np.allclose(o, outs[0]) for o in outs[1:])


@pytest.mark.slow
def test_swin_tiny_shapes():
    model = SwinTransformer(embed_dim=24, depths=(1, 1, 2), num_heads=(2, 4, 8),
                            out_indices=(0, 1, 2), window_size=4)
    x = jnp.zeros((1, 64, 64, 3))
    var = model.init(jax.random.PRNGKey(0), x, False)
    outs = model.apply(var, x, False)
    assert [o.shape for o in outs] == [(1, 16, 16, 24), (1, 8, 8, 48), (1, 4, 4, 96)]


@pytest.fixture(scope="module")
def lidar_batch():
    rng = np.random.RandomState(0)
    B, P = 1, 2048
    pts = np.zeros((B, P, 5), np.float32)
    pts[..., :2] = rng.uniform(-7.9, 7.9, (B, P, 2))
    pts[..., 2] = rng.uniform(-2.9, 0.9, (B, P))
    G = 6
    gt = np.zeros((B, G, 9), np.float32)
    gt[..., 3:6] = 1.0
    gt[:, 0] = [2, 3, -0.9, 2.0, 4.6, 1.7, 0, 0, 0.5]
    gt[:, 1] = [-4, 1, -1.0, 0.7, 0.8, 1.7, 0, 0, -0.2]
    cls = np.zeros((B, G), np.int32)
    cls[:, 0] = 1
    cls[:, 1] = 9
    return {
        "points": jnp.asarray(pts),
        "points_valid": jnp.ones((B, P), bool),
    }, jnp.asarray(gt), jnp.asarray(cls)


@pytest.mark.slow
def test_bevfusion_lidar_only_forward_and_loss(lidar_batch):
    batch, gt, cls = lidar_batch
    model = BEVFusion(
        voxel_cfg=VCFG, with_camera=False, num_proposals=16,
        decoder_channels=(32, 64), voxel_caps=(2000, 1000, 500, 500),
    )
    var = model.init(jax.random.PRNGKey(0), batch, False)
    preds = model.apply(var, batch, False)
    assert preds["cls_logits"].shape == (1, 16, 10)
    assert preds["heatmap"].shape[0] == 1

    tcfg = TransFusionTestCfg(out_size_factor=8, voxel_size=(0.25, 0.25), pc_range=(-8.0, -8.0))
    dets = transfusion_decode(preds, tcfg)
    assert dets["box3d_lidar"].shape == (1, 16, 9)
    assert np.isfinite(np.asarray(dets["box3d_lidar"])).all()

    logs = transfusion_loss(preds, gt, cls, tcfg)
    assert np.isfinite(float(logs["loss"])) and float(logs["loss"]) > 0
    assert int(logs["num_matched"]) == 2


@pytest.mark.slow
def test_bevfusion_camera_lidar_forward(lidar_batch):
    batch, gt, cls = lidar_batch
    B, N = 1, 2
    iH, iW = 64, 64
    rng = np.random.RandomState(0)
    intrins = np.tile(np.array([[50.0, 0, iW / 2], [0, 50.0, iH / 2], [0, 0, 1]], np.float32), (B, N, 1, 1))
    cam_batch = dict(batch)
    cam_batch.update({
        "images": jnp.asarray(rng.rand(B, N, iH, iW, 3).astype(np.float32)),
        "depth_images": jnp.asarray(rng.rand(B, N, iH, iW, 1).astype(np.float32) * 20),
        "camera2lidar_rots": jnp.asarray(np.tile(np.eye(3, dtype=np.float32), (B, N, 1, 1))),
        "camera2lidar_trans": jnp.zeros((B, N, 3), jnp.float32),
        "camera_intrinsics": jnp.asarray(intrins),
        "img_aug_rots": jnp.asarray(np.tile(np.eye(3, dtype=np.float32), (B, N, 1, 1))),
        "img_aug_trans": jnp.zeros((B, N, 3), jnp.float32),
    })
    model = BEVFusion(
        voxel_cfg=VCFG, with_camera=True, num_proposals=8,
        decoder_channels=(32, 64), voxel_caps=(2000, 1000, 500, 500),
        image_size=(iH, iW), camera_out_channels=16,
    )
    var = model.init(jax.random.PRNGKey(0), cam_batch, False)
    preds = model.apply(var, cam_batch, False)
    assert preds["cls_logits"].shape == (1, 8, 10)
    assert np.isfinite(np.asarray(preds["cls_logits"])).all()

    # profiling cuts (tools/profile_bevfusion.py): each stop_at returns the
    # stage tensor as a live output; "decoder" is bit-identical to the full
    # forward's shared bev_feat, and the lidar cut matches between the
    # "lidar" and "camera" stops (same sub-program prefix)
    cut_l = model.apply(var, cam_batch, False, stop_at="lidar")
    cut_c = model.apply(var, cam_batch, False, stop_at="camera")
    cut_f = model.apply(var, cam_batch, False, stop_at="fused")
    cut_d = model.apply(var, cam_batch, False, stop_at="decoder")
    assert set(cut_l) == {"lidar"} and set(cut_c) == {"camera", "lidar"}
    np.testing.assert_allclose(np.asarray(cut_c["lidar"]), np.asarray(cut_l["lidar"]))
    assert cut_c["camera"].shape[:3] == cut_l["lidar"].shape[:3]
    assert cut_f["fused"].shape[:3] == cut_l["lidar"].shape[:3]
    np.testing.assert_allclose(
        np.asarray(cut_d["decoder"]), np.asarray(preds["bev_feat"]), rtol=1e-6)


@pytest.mark.slow
def test_bevfusion_train_step(lidar_batch):
    """Full jitted train step: loss decreases over a few steps."""
    from dal3d_tpu.runtime.bevfusion_steps import (
        create_bevfusion_state, make_bevfusion_train_step,
    )
    from dal3d_tpu.solver.optim import OneCycleSchedule, build_optimizer

    batch, gt, cls = lidar_batch
    model = BEVFusion(
        voxel_cfg=VCFG, with_camera=False, num_proposals=16,
        decoder_channels=(32, 64), voxel_caps=(2000, 1000, 500, 500),
    )
    full = dict(batch)
    full["gt_boxes"] = gt
    full["gt_classes"] = cls
    opt = build_optimizer(OneCycleSchedule(lr_max=0.003, total_steps=30))
    state = create_bevfusion_state(model, opt, jax.random.PRNGKey(0), full)
    tcfg = TransFusionTestCfg(out_size_factor=8, voxel_size=(0.25, 0.25), pc_range=(-8.0, -8.0))
    step = make_bevfusion_train_step(model, opt, tcfg)
    losses = []
    for _ in range(8):
        state, logs = step(state, full)
        losses.append(float(logs["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], f"no learning: {losses[0]:.3f} -> {losses[-1]:.3f}"


def test_bevfusion_camera_only_forward():
    """Camera-only mode (reference camera-only baseline): no lidar branch,
    LSSTransform without the depth input."""
    rng = np.random.RandomState(0)
    B, N, iH, iW = 1, 2, 64, 64
    intrins = np.tile(np.array([[50.0, 0, iW / 2], [0, 50.0, iH / 2], [0, 0, 1]],
                               np.float32), (B, N, 1, 1))
    batch = {
        "images": jnp.asarray(rng.rand(B, N, iH, iW, 3).astype(np.float32)),
        "camera2lidar_rots": jnp.asarray(np.tile(np.eye(3, dtype=np.float32), (B, N, 1, 1))),
        "camera2lidar_trans": jnp.zeros((B, N, 3), jnp.float32),
        "camera_intrinsics": jnp.asarray(intrins),
        "img_aug_rots": jnp.asarray(np.tile(np.eye(3, dtype=np.float32), (B, N, 1, 1))),
        "img_aug_trans": jnp.zeros((B, N, 3), jnp.float32),
    }
    model = BEVFusion(
        voxel_cfg=VCFG, with_lidar=False, with_camera=True, vtransform="lss",
        num_proposals=8, decoder_channels=(16, 32), decoder_layer_nums=(1, 1),
        neck_out_channels=(16, 16), hidden_channel=16, num_heads=2,
        ffn_channel=32, camera_out_channels=16, image_size=(iH, iW),
    )
    var = model.init(jax.random.PRNGKey(0), batch, False)
    preds = model.apply(var, batch, False)
    assert preds["cls_logits"].shape == (B, 8, 10)
    assert np.isfinite(np.asarray(preds["heatmap"])).all()
    # no lidar modules in the tree
    assert "SparseEncoder_0" not in var["params"]
    assert "ConvFuser_0" not in var["params"]


def test_bevfusion_centerpoint_head(lidar_batch):
    """head="centerpoint" routes the BEV map through CenterHead (reference
    centerhead configs) and decodes via center_head_decode."""
    from dal3d_tpu.models.bevfusion.centerpoint import (
        CenterTestCfg, center_head_decode, center_head_loss,
    )

    batch, gt, cls = lidar_batch
    model = BEVFusion(
        voxel_cfg=VCFG, with_camera=False, head="centerpoint",
        center_task_classes=(1, 2), decoder_channels=(16, 32),
        decoder_layer_nums=(1, 1), neck_out_channels=(16, 16),
        voxel_caps=(2000, 1000, 500, 500),
    )
    var = model.init(jax.random.PRNGKey(0), batch, False)
    preds = model.apply(var, batch, False)
    assert len(preds["center_preds"]) == 2
    ccfg = CenterTestCfg(out_size_factor=8, voxel_size=(0.25, 0.25),
                         pc_range=(-8.0, -8.0), max_per_task=10)
    dets = center_head_decode(preds["center_preds"], ccfg)
    assert np.isfinite(np.asarray(dets["box3d_lidar"])).all()


@pytest.mark.slow
@pytest.mark.overfit
def test_transfusion_overfit_localizes(lidar_batch):
    """Overfit evidence for the faithful head: a few hundred Hungarian-
    matched steps on one synthetic scene must localize the GT boxes (the
    top-scoring decoded centers land near the two GT centers)."""
    import optax

    from dal3d_tpu.runtime.bevfusion_steps import (
        create_bevfusion_state, make_bevfusion_train_step,
    )

    batch, gt, cls = lidar_batch
    model = BEVFusion(
        voxel_cfg=VCFG, with_camera=False, num_proposals=16,
        decoder_channels=(32, 64), decoder_layer_nums=(2, 2),
        neck_out_channels=(64, 64), hidden_channel=64, ffn_channel=128,
        num_heads=4, voxel_caps=(2000, 1000, 500, 500),
    )
    tcfg = TransFusionTestCfg(out_size_factor=8, voxel_size=(0.25, 0.25),
                              pc_range=(-8.0, -8.0))
    opt = optax.chain(optax.clip_by_global_norm(10.0), optax.adam(3e-4))
    tb = dict(batch)
    tb["gt_boxes"], tb["gt_classes"] = gt, cls
    state = create_bevfusion_state(model, opt, jax.random.PRNGKey(0), tb)
    step = make_bevfusion_train_step(model, opt, tcfg)
    losses = []
    for _ in range(400):
        state, logs = step(state, tb)
        losses.append(float(logs["loss"]))
    assert losses[-1] < losses[0] * 0.1, (losses[0], losses[-1])

    preds = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats}, batch, False)
    dets = transfusion_decode(preds, tcfg)
    boxes = np.asarray(dets["box3d_lidar"][0])
    order = np.argsort(-np.asarray(dets["scores"][0]))
    top = boxes[order[:2], :2]
    gt_xy = np.asarray(gt[0, :2, :2])
    # the two top-scoring detections land within 1.5 m of the two GT centers
    for g in gt_xy:
        assert np.min(np.linalg.norm(top - g[None], axis=1)) < 1.5, (top, g)


@pytest.mark.slow
def test_bevfusion_train_step_mesh(lidar_batch):
    """BEVFusion train step runs sharded over the 8-vCPU mesh (batch DP with
    XLA gradient psum — the torchpack-DDP equivalent)."""
    import optax

    from dal3d_tpu.parallel.mesh import make_mesh, shard_batch
    from dal3d_tpu.runtime.bevfusion_steps import (
        create_bevfusion_state, make_bevfusion_train_step,
    )

    assert jax.device_count() >= 8
    mesh = make_mesh(n_data=8, n_model=1)
    batch, gt, cls = lidar_batch
    B = 8
    tb = {
        "points": jnp.tile(batch["points"], (B, 1, 1)),
        "points_valid": jnp.tile(batch["points_valid"], (B, 1)),
        "gt_boxes": jnp.tile(gt, (B, 1, 1)),
        "gt_classes": jnp.tile(cls, (B, 1)),
    }
    model = BEVFusion(
        voxel_cfg=VCFG, with_camera=False, num_proposals=8,
        decoder_channels=(16, 32), decoder_layer_nums=(1, 1),
        neck_out_channels=(16, 16), hidden_channel=16, ffn_channel=32,
        num_heads=2, voxel_caps=(2000, 1000, 500, 500),
    )
    tcfg = TransFusionTestCfg(out_size_factor=8, voxel_size=(0.25, 0.25),
                              pc_range=(-8.0, -8.0))
    opt = optax.adam(1e-4)
    state = create_bevfusion_state(model, opt, jax.random.PRNGKey(0), tb)
    step = make_bevfusion_train_step(model, opt, tcfg)
    sb = shard_batch(tb, mesh)
    with jax.set_mesh(mesh):
        state, logs = step(state, sb)
    assert np.isfinite(float(logs["loss"]))
    assert int(logs["num_matched"]) == 2 * B


def test_bevfusion_host_voxel_feed_matches_device_voxelize(lidar_batch):
    """Feeding precomputed voxels ('voxel_features' in the batch) must skip
    the on-device voxelizer and produce the SAME lidar BEV as the raw-points
    path. The production loader host-voxelizes (native C++); on chip the
    device voxelizer's 85M-cell compaction is 65% of the lidar branch."""
    batch, _, _ = lidar_batch
    model = BEVFusion(
        voxel_cfg=VCFG, with_camera=False, num_proposals=16,
        decoder_channels=(32, 64), voxel_caps=(2000, 1000, 500, 500),
    )
    var = model.init(jax.random.PRNGKey(0), batch, False)
    a = model.apply(var, batch, False, stop_at="lidar")["lidar"]

    # precompute voxels with the same device voxelizer, feed them in
    vox = jax.vmap(lambda p, v: voxelize_mean_grid(p, v, VCFG))(
        batch["points"], batch["points_valid"])
    fed = dict(batch, voxel_features=vox["features"],
               voxel_coords=vox["coordinates"], voxel_valid=vox["voxel_valid"])
    b = model.apply(var, fed, False, stop_at="lidar")["lidar"]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0, atol=0)
