"""Device target assignment vs a direct numpy port of the reference algorithm
(det3d/core/anchor/target_ops.py:28-222, per-class as in target_assigner.py:68)."""
import numpy as np
import jax.numpy as jnp

from dal3d_tpu.core import box_np_ops as bn
from dal3d_tpu.core.anchors import generate_task_anchors
from dal3d_tpu.core.box_coders import GroundBox3dCoder
from dal3d_tpu.core.target_assigner import DeviceTargetAssigner, assign_one_class


def np_create_target(anchors, gt_boxes, gt_classes, matched_thr, unmatched_thr, coder):
    """Numpy oracle replicating reference create_target_np (no anchor mask,
    no positive_fraction)."""
    A = anchors.shape[0]
    labels = np.full(A, -1, np.int32)
    targets = np.zeros((A, coder.code_size), np.float32)
    if len(gt_boxes) > 0:
        a_rbv = anchors[:, [0, 1, 3, 4, -1]]
        g_rbv = gt_boxes[:, [0, 1, 3, 4, -1]]
        S = bn.iou_jit(bn.rbbox2d_to_near_bbox(a_rbv), bn.rbbox2d_to_near_bbox(g_rbv), eps=0.0)
        a2g_argmax = S.argmax(1)
        a2g_max = S[np.arange(A), a2g_argmax]
        g2a_argmax = S.argmax(0)
        g2a_max = S[g2a_argmax, np.arange(S.shape[1])]
        g2a_max[g2a_max == 0] = -1
        force_anchors = np.where(S == g2a_max)[0]
        gt_inds_force = a2g_argmax[force_anchors]
        labels[force_anchors] = gt_classes[gt_inds_force]
        pos = a2g_max >= matched_thr
        labels[pos] = gt_classes[a2g_argmax[pos]]
        bg = np.where(a2g_max < unmatched_thr)[0]
        labels[bg] = 0
        labels[force_anchors] = gt_classes[gt_inds_force]
        fg = np.where(labels > 0)[0]
        targets[fg] = coder.encode(gt_boxes[a2g_argmax[fg]], anchors[fg])
    else:
        labels[:] = 0
    rw = (labels > 0).astype(np.float32)
    return labels, targets, rw


def rand_gt(n, seed):
    rng = np.random.RandomState(seed)
    g = np.zeros((n, 9), np.float32)
    g[:, :2] = rng.uniform(-40, 40, (n, 2))
    g[:, 2] = rng.uniform(-2, 0, n)
    g[:, 3:6] = rng.uniform(1.5, 5, (n, 3))
    g[:, 6:8] = rng.uniform(-2, 2, (n, 2))
    g[:, 8] = rng.uniform(-np.pi, np.pi, n)
    return g


CODER = GroundBox3dCoder(vec_encode=True, n_dim=9)
GEN_CFGS = [
    dict(type="anchor_generator_range", sizes=[1.97, 4.63, 1.74],
         anchor_ranges=[-51.2, -51.2, -0.95, 51.2, 51.2, -0.95], rotations=[0, 1.57],
         velocities=[0, 0], matched_threshold=0.6, unmatched_threshold=0.45, class_name="car"),
    dict(type="anchor_generator_range", sizes=[2.51, 6.93, 2.84],
         anchor_ranges=[-51.2, -51.2, -0.40, 51.2, 51.2, -0.40], rotations=[0, 1.57],
         velocities=[0, 0], matched_threshold=0.55, unmatched_threshold=0.4, class_name="truck"),
]
TASKS = [dict(num_class=2, class_names=["car", "truck"])]


def test_single_class_matches_oracle():
    tas = generate_task_anchors(GEN_CFGS, TASKS, [1, 32, 32])
    ta = tas[0]
    anchors = ta.anchors_by_class[0]  # car anchors [A,9]
    gt = rand_gt(12, seed=0)
    gt_cls = np.ones(12, np.int32)
    ref_l, ref_t, ref_w = np_create_target(anchors, gt, gt_cls, 0.6, 0.45, CODER)

    G = 16
    gt_pad = np.zeros((G, 9), np.float32)
    gt_pad[:, 3:6] = 1.0  # benign pad dims
    gt_pad[:12] = gt
    cls_pad = np.zeros(G, np.int32)
    cls_pad[:12] = 1
    l, t, w = assign_one_class(
        jnp.asarray(anchors), jnp.asarray(gt_pad), jnp.asarray(cls_pad == 1),
        jnp.asarray(1), jnp.asarray(0.6), jnp.asarray(0.45), vec_encode=True,
    )
    np.testing.assert_array_equal(np.asarray(l), ref_l)
    np.testing.assert_array_equal(np.asarray(w), ref_w)
    np.testing.assert_allclose(np.asarray(t), ref_t, rtol=1e-4, atol=1e-4)


def test_empty_gt_all_background():
    tas = generate_task_anchors(GEN_CFGS, TASKS, [1, 8, 8])
    anchors = tas[0].anchors_by_class[0]
    G = 4
    gt_pad = np.zeros((G, 9), np.float32)
    gt_pad[:, 3:6] = 1.0
    l, t, w = assign_one_class(
        jnp.asarray(anchors), jnp.asarray(gt_pad), jnp.asarray(np.zeros(G, bool)),
        jnp.asarray(1), jnp.asarray(0.6), jnp.asarray(0.45),
    )
    assert (np.asarray(l) == 0).all()
    assert np.asarray(t).sum() == 0 and np.asarray(w).sum() == 0


def test_task_interleaving_matches_reference_layout():
    """Full-task assignment must interleave per-class results at the
    per-location dim like assign_v2's axis=-2 concat."""
    tas = generate_task_anchors(GEN_CFGS, TASKS, [1, 16, 16])
    ta = tas[0]
    assigner = DeviceTargetAssigner(tas, CODER)

    gt_car = rand_gt(5, seed=1)
    gt_truck = rand_gt(4, seed=2)
    gt_truck[:, 3:6] += 2.0
    G = 16
    gt_pad = np.zeros((G, 9), np.float32)
    gt_pad[:, 3:6] = 1.0
    gt_pad[:5] = gt_car
    gt_pad[5:9] = gt_truck
    cls_pad = np.zeros(G, np.int32)
    cls_pad[:5] = 1
    cls_pad[5:9] = 2

    labels, targets, rw = assigner.assign_task(0, jnp.asarray(gt_pad), jnp.asarray(cls_pad))
    labels = np.asarray(labels)
    A = ta.anchors.shape[0]
    assert labels.shape == (A,)

    # oracle per class then interleave
    l_car, t_car, _ = np_create_target(ta.anchors_by_class[0], gt_car, np.ones(5, np.int32), 0.6, 0.45, CODER)
    l_tr, t_tr, _ = np_create_target(ta.anchors_by_class[1], gt_truck, np.full(4, 2, np.int32), 0.55, 0.4, CODER)
    L = 16 * 16
    ref_labels = np.stack([l_car.reshape(L, 2), l_tr.reshape(L, 2)], axis=1).reshape(-1)
    np.testing.assert_array_equal(labels, ref_labels)
    ref_targets = np.stack([t_car.reshape(L, 2, -1), t_tr.reshape(L, 2, -1)], axis=1).reshape(-1, 10)
    np.testing.assert_allclose(np.asarray(targets), ref_targets, rtol=1e-4, atol=1e-4)
    assert np.asarray(rw).sum() > 0  # some positives matched
