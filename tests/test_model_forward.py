"""End-to-end model slice: points -> voxelize -> backbone -> neck -> head ->
loss / predict, on tiny shapes (CPU)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dal3d_tpu.ops.voxelize import VoxelConfig
from dal3d_tpu.core.anchors import generate_task_anchors
from dal3d_tpu.core.box_coders import GroundBox3dCoder
from dal3d_tpu.core.target_assigner import DeviceTargetAssigner
from dal3d_tpu.models import FPNVoxelNet, multi_group_loss, multi_group_predict
from dal3d_tpu.models.heads.mg_head import LossConfig, TestConfig

VCFG = VoxelConfig(
    point_cloud_range=(-8.0, -8.0, -3.0, 8.0, 8.0, 1.0),
    voxel_size=(0.25, 0.25, 0.1),  # grid 64x64x40, sparse (41,64,64): same depth chain as production (21,11,5,2)
    max_points_in_voxel=5,
    max_voxel_num=2000,
)
NUM_CLASSES = (1, 2)
GENS = [
    dict(type="anchor_generator_range", sizes=[1.97, 4.63, 1.74],
         anchor_ranges=[-8, -8, -0.95, 8, 8, -0.95], rotations=[0, 1.57], velocities=[0, 0],
         matched_threshold=0.6, unmatched_threshold=0.45, class_name="car"),
    dict(type="anchor_generator_range", sizes=[2.51, 6.93, 2.84],
         anchor_ranges=[-8, -8, -0.4, 8, 8, -0.4], rotations=[0, 1.57], velocities=[0, 0],
         matched_threshold=0.55, unmatched_threshold=0.4, class_name="truck"),
    dict(type="anchor_generator_range", sizes=[0.6, 1.7, 1.28],
         anchor_ranges=[-8, -8, -1.18, 8, 8, -1.18], rotations=[0, 1.57], velocities=[0, 0],
         matched_threshold=0.5, unmatched_threshold=0.35, class_name="bicycle"),
]
TASKS = [dict(num_class=1, class_names=["car"]), dict(num_class=2, class_names=["truck", "bicycle"])]


@pytest.fixture(scope="module")
def setup():
    model = FPNVoxelNet(
        voxel_cfg=VCFG, num_classes=NUM_CLASSES, voxel_caps=(2000, 1000, 500, 500),
        rpn_ds_filters=(32, 64), rpn_us_filters=(64, 64),
    )
    B, P = 2, 4096
    rng = np.random.RandomState(0)
    pts = np.zeros((B, P, 5), np.float32)
    pts[..., :2] = rng.uniform(-7.9, 7.9, (B, P, 2))
    pts[..., 2] = rng.uniform(-2.9, 0.9, (B, P))
    valid = np.ones((B, P), bool)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(pts), jnp.asarray(valid), False)
    return model, variables, pts, valid


def test_forward_shapes(setup):
    model, variables, pts, valid = setup
    out = model.apply(variables, jnp.asarray(pts), jnp.asarray(valid), False)
    # ds_factor 8: 64/8 = 8
    assert out["embedding"].shape == (2, 128)  # us_filters 64+64
    assert out["neck_feat"].shape == (2, 8, 8, 128)
    preds = out["preds"]
    assert len(preds) == 2
    # task 0: 1 class * 2 rot -> box 2*10=20ch, cls 2*1=2ch
    assert preds[0]["box_preds"].shape == (2, 8, 8, 20)
    assert preds[0]["cls_preds"].shape == (2, 8, 8, 2)
    # task 1: 2 classes * 2 rot -> box 40, cls 4*2=8
    assert preds[1]["box_preds"].shape == (2, 8, 8, 40)
    assert preds[1]["cls_preds"].shape == (2, 8, 8, 8)
    assert len(out["middle"]) == 4
    assert np.isfinite(np.asarray(out["embedding"])).all()


@pytest.mark.slow
def test_loss_and_grad(setup):
    model, variables, pts, valid = setup
    coder = GroundBox3dCoder(vec_encode=True, n_dim=9)
    tas = generate_task_anchors(GENS, TASKS, [1, 8, 8])
    assigner = DeviceTargetAssigner(tas, coder)

    B, G = 2, 8
    gt = np.zeros((2, B, G, 9), np.float32)
    gt[..., 3:6] = 1.0
    gt[0, 0, 0] = [2, 3, -0.8, 1.9, 4.6, 1.7, 0, 0, 0.3]
    cls = np.zeros((2, B, G), np.int32)
    cls[0, 0, 0] = 1

    def loss_fn(params, batch_stats):
        out, new_state = model.apply(
            {"params": params, "batch_stats": batch_stats},
            jnp.asarray(pts), jnp.asarray(valid), True,
            mutable=["batch_stats"],
        )
        labels, targets, _ = assigner.assign_all(
            [jnp.asarray(gt[i]) for i in range(2)], [jnp.asarray(cls[i]) for i in range(2)]
        )
        logs = multi_group_loss(out["preds"], labels, targets, NUM_CLASSES, LossConfig())
        return logs["loss"], (logs, new_state)

    (loss, (logs, _)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        variables["params"], variables["batch_stats"]
    )
    assert np.isfinite(float(loss)) and float(loss) > 0
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert sum(float(np.abs(np.asarray(l)).sum()) for l in leaves) > 0
    assert int(logs["num_pos"][0]) >= 1


def test_predict_shapes(setup):
    model, variables, pts, valid = setup
    coder = GroundBox3dCoder(vec_encode=True, n_dim=9)
    tas = generate_task_anchors(GENS, TASKS, [1, 8, 8])
    out = model.apply(variables, jnp.asarray(pts), jnp.asarray(valid), False)
    tcfg = TestConfig(nms_pre_max_size=64, nms_post_max_size=16, score_threshold=0.05,
                      post_center_limit_range=(-10, -10, -5, 10, 10, 5))
    dets = multi_group_predict(out["preds"], tas, coder, tcfg)
    assert dets["box3d_lidar"].shape == (2, 32, 9)
    assert dets["scores"].shape == (2, 32)
    assert dets["label_preds"].shape == (2, 32)
    # labels offset: task1 labels in {1, 2}
    lab = np.asarray(dets["label_preds"])
    vmask = np.asarray(dets["det_valid"])
    if vmask[:, 16:].any():
        assert set(lab[:, 16:][vmask[:, 16:]].tolist()) <= {1, 2}
    assert np.isfinite(np.asarray(dets["box3d_lidar"])).all()


def test_predict_stop_before_nms_matches_stage1(setup):
    """The profiling hook's truncated pytree must be the exact stage-1
    candidate set the full predict feeds into NMS: every valid detection in
    the full output appears verbatim (box, score, label) among its task's
    candidates, and the candidate arrays are finite-where-scored."""
    model, variables, pts, valid = setup
    coder = GroundBox3dCoder(vec_encode=True, n_dim=9)
    tas = generate_task_anchors(GENS, TASKS, [1, 8, 8])
    out = model.apply(variables, jnp.asarray(pts), jnp.asarray(valid), False)
    tcfg = TestConfig(nms_pre_max_size=64, nms_post_max_size=16, score_threshold=0.05,
                      post_center_limit_range=(-10, -10, -5, 10, 10, 5))
    cand = multi_group_predict(out["preds"], tas, coder, tcfg, stop_before_nms=True)
    full = multi_group_predict(out["preds"], tas, coder, tcfg)

    T, B, pre = len(out["preds"]), 2, tcfg.nms_pre_max_size
    assert cand["cand_scores"].shape == (T, B, pre)
    assert cand["cand_labels"].shape == (T, B, pre)
    assert cand["cand_boxes"].shape == (T, B, pre, 9)
    cs = np.asarray(cand["cand_scores"])
    cb = np.asarray(cand["cand_boxes"])
    cl = np.asarray(cand["cand_labels"])
    assert np.isfinite(cb[np.isfinite(cs)]).all()

    post = tcfg.nms_post_max_size
    fb = np.asarray(full["box3d_lidar"]).reshape(B, T, post, 9)
    fs = np.asarray(full["scores"]).reshape(B, T, post)
    fl = np.asarray(full["label_preds"]).reshape(B, T, post)
    fv = np.asarray(full["det_valid"]).reshape(B, T, post)
    for b in range(B):
        for t in range(T):
            for k in np.nonzero(fv[b, t])[0]:
                hits = np.nonzero(np.isclose(cs[t, b], fs[b, t, k]))[0]
                assert hits.size, "detection score missing from candidates"
                assert any(
                    np.allclose(cb[t, b, h], fb[b, t, k]) and cl[t, b, h] == fl[b, t, k]
                    for h in hits
                )


def test_predict_with_iou_branch(setup):
    """mg_iou_head predict semantics: decoded per-detection iou_preds ride
    along; iou_rescore_alpha>0 applies the score^(1-a)*iou^a rectifier
    (reference mg_iou_head.py:582-608, :706)."""
    model, variables, pts, valid = setup
    coder = GroundBox3dCoder(vec_encode=True, n_dim=9)
    tas = generate_task_anchors(GENS, TASKS, [1, 8, 8])
    out = model.apply(variables, jnp.asarray(pts), jnp.asarray(valid), False)
    rng = np.random.RandomState(0)
    preds = []
    for p in out["preds"]:
        p = dict(p)
        hm = p["cls_preds"]
        p["iou_preds"] = jnp.asarray(
            rng.randn(hm.shape[0], hm.shape[1], hm.shape[2],
                      p["box_preds"].shape[-1] // coder.code_size).astype(np.float32)
        )
        preds.append(p)
    tcfg = TestConfig(nms_pre_max_size=64, nms_post_max_size=16, score_threshold=0.05,
                      post_center_limit_range=(-10, -10, -5, 10, 10, 5))
    dets = multi_group_predict(preds, tas, coder, tcfg)
    assert "iou_preds" in dets and dets["iou_preds"].shape == dets["scores"].shape
    iou = np.asarray(dets["iou_preds"])
    vm = np.asarray(dets["det_valid"])
    assert ((iou[vm] >= 0) & (iou[vm] <= 1)).all()

    # rescoring changes the ranking score monotonically with predicted iou
    dets_r = multi_group_predict(preds, tas, coder, tcfg, iou_rescore_alpha=0.5)
    s0, s1 = np.asarray(dets["scores"]), np.asarray(dets_r["scores"])
    assert not np.allclose(s0[vm], s1[np.asarray(dets_r["det_valid"])][: vm.sum()])


def test_iou_and_loss_head_variants(setup):
    """The two reference head variants (mg_iou_head / mg_loss_head) split:
    per-anchor IoU MLP branch vs GAP frame-loss branch, both loss flavors."""
    from dal3d_tpu.models import (
        MultiGroupIoUHead, MultiGroupLossHead, compute_loss_loss,
        decode_iou_preds, multi_group_loss_with_iou,
    )

    model, variables, pts, valid = setup
    out = model.apply(variables, jnp.asarray(pts), jnp.asarray(valid), False)
    neck = out["neck_feat"]  # [2, 8, 8, 128]

    # --- IoU head: per-anchor branch shape + BN train-mode mutation ---
    ih = MultiGroupIoUHead(num_classes=NUM_CLASSES, iou_hidden=32)
    v = ih.init(jax.random.PRNGKey(1), neck, False)
    preds = ih.apply(v, neck, False)
    assert preds[0]["iou_preds"].shape == (2, 8, 8, 2)   # 1 class * 2 rot
    assert preds[1]["iou_preds"].shape == (2, 8, 8, 4)   # 2 classes * 2 rot
    _, mut = ih.apply(v, neck, True, mutable=["batch_stats"])
    assert "batch_stats" in mut

    # --- both IoU loss flavors + predict-time decode ---
    coder = GroundBox3dCoder(vec_encode=True, n_dim=9)
    tas = generate_task_anchors(GENS, TASKS, [1, 8, 8])
    assigner = DeviceTargetAssigner(tas, coder)
    B, G = 2, 8
    gt = np.zeros((2, B, G, 9), np.float32)
    gt[..., 3:6] = 1.0
    gt[0, 0, 0] = [2, 3, -0.8, 1.9, 4.6, 1.7, 0, 0, 0.3]
    cls = np.zeros((2, B, G), np.int32)
    cls[0, 0, 0] = 1
    labels, targets, _ = assigner.assign_all(
        [jnp.asarray(gt[i]) for i in range(2)], [jnp.asarray(cls[i]) for i in range(2)]
    )
    gt_by_task = [jnp.asarray(gt[i]) for i in range(2)]
    for flavor in ("smooth_l1", "sigmoid"):
        logs = multi_group_loss_with_iou(
            preds, labels, targets, tas, coder, gt_by_task, NUM_CLASSES,
            LossConfig(), iou_loss_type=flavor,
        )
        assert np.isfinite(float(logs["iou_loss"]))
        assert float(logs["loss"]) >= float(logs["loss"] - logs["iou_loss"])
    raw = jnp.asarray([[-5.0, 0.0, 5.0]])
    d_l1 = np.asarray(decode_iou_preds(raw, "smooth_l1"))
    d_sg = np.asarray(decode_iou_preds(raw, "sigmoid"))
    assert (d_l1 >= 0).all() and (d_l1 <= 1).all()
    assert (d_sg > 0).all() and (d_sg < 1).all()
    assert d_l1[0, 0] == 0.0 and d_l1[0, 2] == 1.0  # de-norm + clamp

    # --- frame-loss head: GAP branch -> [B, num_loss] + its L1 loss ---
    lh = MultiGroupLossHead(num_classes=NUM_CLASSES, num_loss=1)
    vl = lh.init(jax.random.PRNGKey(2), neck, False)
    lpreds = lh.apply(vl, neck, False)
    assert lpreds[0]["loss_preds"].shape == (2, 1)
    assert lpreds[1]["loss_preds"].shape == (2, 1)
    ll = compute_loss_loss(jnp.asarray(3.7), [p["loss_preds"] for p in lpreds], 2)
    assert np.isfinite(float(ll)) and float(ll) >= 0
