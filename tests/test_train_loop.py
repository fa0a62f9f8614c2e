"""Train step + trainer + checkpoint + multi-device mesh smoke tests."""
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
from dal3d_tpu.runtime import checkpoint as ckpt
from dal3d_tpu.solver.optim import OneCycleSchedule, build_optimizer
from dal3d_tpu.parallel.mesh import make_mesh, shard_batch

pytestmark = pytest.mark.slow

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
        test_cfg=TestConfig(nms_pre_max_size=32, nms_post_max_size=8),
        num_classes=(1,), class_names=["car"],
    )


def make_batch(B=2, P=2048, seed=0):
    rng = np.random.RandomState(seed)
    pts = np.zeros((B, P, 5), np.float32)
    pts[..., :2] = rng.uniform(-7.9, 7.9, (B, P, 2))
    pts[..., 2] = rng.uniform(-2.9, 0.9, (B, P))
    G = 4
    gt = np.zeros((B, G, 9), np.float32)
    gt[..., 3:6] = 1.0
    gt[:, 0] = [2, 3, -0.9, 2.0, 4.6, 1.7, 0, 0, 0.5]
    cls = np.zeros((B, G), np.int32)
    cls[:, 0] = 1
    return {
        "points": jnp.asarray(pts),
        "points_valid": jnp.ones((B, P), bool),
        "gt_boxes": [jnp.asarray(gt)],
        "gt_classes": [jnp.asarray(cls)],
    }


def test_train_step_reduces_loss():
    bundle = make_bundle()
    opt = build_optimizer(OneCycleSchedule(lr_max=0.003, total_steps=50))
    batch = make_batch()
    state = create_train_state(bundle, opt, jax.random.PRNGKey(0), batch)
    step = make_train_step(bundle, opt)
    state, logs0 = step(state, batch)
    losses = [float(logs0["loss"])]
    for _ in range(14):
        state, logs = step(state, batch)
        losses.append(float(logs["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.7, f"no learning: {losses[0]:.3f} -> {losses[-1]:.3f}"
    assert int(state.step) == 15


def test_checkpoint_roundtrip(tmp_path):
    bundle = make_bundle()
    opt = build_optimizer(OneCycleSchedule(total_steps=10))
    batch = make_batch()
    state = create_train_state(bundle, opt, jax.random.PRNGKey(0), batch)
    step = make_train_step(bundle, opt)
    state, _ = step(state, batch)
    ckpt.save_checkpoint(str(tmp_path), state, epoch=1, meta={"classes": ["car"]})

    template = create_train_state(bundle, opt, jax.random.PRNGKey(1), batch)
    restored, meta = ckpt.load_checkpoint(str(tmp_path), template)
    assert meta["epoch"] == 1
    for a, b in zip(jax.tree_util.tree_leaves(state.params), jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(restored.step) == 1


def test_multidevice_data_parallel():
    assert jax.device_count() >= 8, "conftest must provide 8 CPU devices"
    mesh = make_mesh(n_data=4, n_model=2)
    bundle = make_bundle()
    opt = build_optimizer(OneCycleSchedule(total_steps=10))
    batch = make_batch(B=8)
    state = create_train_state(bundle, opt, jax.random.PRNGKey(0), batch)
    step = make_train_step(bundle, opt)

    sharded = shard_batch(batch, mesh)
    state2, logs = step(state, sharded)
    assert np.isfinite(float(logs["loss"]))

    # parity: sharded result == single-device result
    state_ref = create_train_state(bundle, opt, jax.random.PRNGKey(0), batch)
    _, logs_ref = step(state_ref, batch)
    np.testing.assert_allclose(float(logs["loss"]), float(logs_ref["loss"]), rtol=2e-4)

    # predict on the mesh
    pred = make_predict_step(bundle)
    dets = pred(state2.params, state2.batch_stats, {k: sharded[k] for k in ("points", "points_valid")})
    assert dets["box3d_lidar"].shape[0] == 8
    assert np.isfinite(np.asarray(dets["embedding"])).all()


def test_active_trainer_mesh_epoch(tmp_path):
    """ActiveTrainer shards batches over the mesh like Trainer (review r3:
    the dual-model epoch loop previously bypassed shard_batch entirely)."""
    import optax

    from dal3d_tpu.models.detectors.estimator import Estimator
    from dal3d_tpu.runtime.active_trainer import ActiveTrainer

    assert jax.device_count() >= 8
    mesh = make_mesh(n_data=4, n_model=2)
    bundle = make_bundle()
    opt = build_optimizer(OneCycleSchedule(total_steps=10))
    estimator = Estimator(max_pts=32, hidden=(16, 32))
    tr = ActiveTrainer(bundle, opt, estimator, optax.adam(1e-3), str(tmp_path),
                       mesh=mesh)
    batch = make_batch(B=8)
    tr.init_state(jax.random.PRNGKey(0), batch)
    tr.init_estimator(jax.random.PRNGKey(1), batch)
    stats = tr.train_epoch([batch])
    assert np.isfinite(stats["loss"]) and np.isfinite(stats["estimator_loss"])
