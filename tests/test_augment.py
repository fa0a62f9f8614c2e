"""Host augmentation primitives — full noise_per_object semantics.

Parity target: det3d/core/sampler/preprocess.py noise_per_object_v3_
(:587-709): per-object candidate poses, BEV collision accept/reject, points
move with their first containing box.
"""
import numpy as np
import pytest

from dal3d_tpu.core import box_np_ops
from dal3d_tpu.data.pipelines import augment
from dal3d_tpu.data.sampler import box_collision_test


def _scene(rng, centers, dims, yaws, pts_per_box=40):
    """Boxes + interior points. Points are convex combinations of the SAME
    BEV corners points_in_rbbox uses, so membership is by construction —
    no independent rotation convention to disagree with."""
    boxes = np.zeros((len(centers), 9), np.float64)
    boxes[:, :3] = centers
    boxes[:, 3:6] = dims
    boxes[:, -1] = yaws
    corners = box_np_ops.center_to_corner_box2d(boxes[:, :2], boxes[:, 3:5],
                                                boxes[:, -1])  # [N, 4, 2]
    pts = []
    for b, crn in zip(boxes, corners):
        w = rng.dirichlet(np.ones(4), size=pts_per_box) * 0.9
        w += 0.025  # keep strictly interior
        w /= w.sum(axis=1, keepdims=True)
        xy = w @ crn
        p = np.zeros((pts_per_box, 5))
        p[:, :2] = xy
        p[:, 2] = b[2] + 0.3 * b[5]
        pts.append(p)
    return boxes, np.concatenate(pts)


def test_zero_noise_is_identity():
    rng = np.random.RandomState(0)
    boxes, points = _scene(rng, [[0, 0, 0], [8, 8, 0]], [[2, 4, 1.5]] * 2, [0.3, 1.0])
    b0, p0 = boxes.copy(), points.copy()
    augment.noise_per_object(boxes, points, rotation_perturb=(0.0, 0.0),
                             center_noise_std=(0.0, 0.0, 0.0), rng=rng)
    np.testing.assert_array_equal(boxes, b0)
    np.testing.assert_array_equal(points, p0)


def test_isolated_box_takes_first_candidate_exactly():
    """With no collision partners, the accepted pose must be candidate 0 —
    byte-exact replication of the reference's draw order (loc then rot)."""
    rng = np.random.RandomState(7)
    boxes, points = _scene(rng, [[0, 0, 0]], [[2, 4, 1.5]], [0.2])
    b0 = boxes.copy()
    # replicate the draws
    r2 = np.random.RandomState(11)
    loc = r2.normal(scale=np.maximum([0.5, 0.5, 0.1], 1e-12), size=[1, 100, 3])
    rot = r2.uniform(-0.3, 0.3, size=[1, 100])
    augment.noise_per_object(boxes, points, rotation_perturb=(-0.3, 0.3),
                             center_noise_std=(0.5, 0.5, 0.1),
                             rng=np.random.RandomState(11))
    np.testing.assert_allclose(boxes[0, :3], b0[0, :3] + loc[0, 0], atol=1e-12)
    np.testing.assert_allclose(boxes[0, -1], b0[0, -1] + rot[0, 0], atol=1e-12)


def test_points_move_with_their_box():
    """Interior points remain interior after jitter (rotation conventions of
    the corner test and the point transform agree)."""
    rng = np.random.RandomState(3)
    boxes, points = _scene(rng, [[0, 0, 0], [20, 0, 0]], [[2, 4, 1.5]] * 2, [0.0, 0.9])
    n_in_before = box_np_ops.points_in_rbbox(points, boxes).sum(axis=0)
    augment.noise_per_object(boxes, points, rotation_perturb=(-0.6, 0.6),
                             center_noise_std=(0.8, 0.8, 0.0), rng=rng)
    masks = box_np_ops.points_in_rbbox(points, boxes)
    n_in_after = masks.sum(axis=0)
    np.testing.assert_array_equal(n_in_after, n_in_before)


def test_collision_rejection_keeps_boxes_disjoint():
    """A tight 3x3 grid of boxes under big jitter: accepted poses never
    overlap in BEV (the reference accept/reject invariant)."""
    rng = np.random.RandomState(5)
    centers = [[4.6 * i, 4.6 * j, 0.0] for i in range(3) for j in range(3)]
    boxes, points = _scene(rng, centers, [[4, 4, 1.5]] * 9, [0.0] * 9)
    augment.noise_per_object(boxes, points, rotation_perturb=(-0.7, 0.7),
                             center_noise_std=(1.0, 1.0, 0.0), num_try=50, rng=rng)
    corners = box_np_ops.center_to_corner_box2d(boxes[:, :2], boxes[:, 3:5], boxes[:, -1])
    coll = box_collision_test(corners, corners)
    np.fill_diagonal(coll, False)
    assert not coll.any(), np.argwhere(coll)
    # and at least one box actually moved (jitter was not rejected wholesale)
    assert np.abs(boxes[:, :2] - np.asarray(centers)[:, :2]).max() > 1e-3


def test_invalid_boxes_untouched():
    rng = np.random.RandomState(9)
    boxes, points = _scene(rng, [[0, 0, 0], [30, 0, 0]], [[2, 4, 1.5]] * 2, [0.0, 0.0])
    b0 = boxes.copy()
    mask = np.array([True, False])
    augment.noise_per_object(boxes, points, valid_mask=mask,
                             rotation_perturb=(-0.5, 0.5),
                             center_noise_std=(0.7, 0.7, 0.0), rng=rng)
    np.testing.assert_array_equal(boxes[1], b0[1])
    assert np.abs(boxes[0, :2] - b0[0, :2]).max() > 1e-6


def test_scalar_args_normalized_like_reference():
    """Scalar rotation_perturb r means (-r, r); scalar std broadcasts to 3."""
    rng = np.random.RandomState(13)
    boxes, points = _scene(rng, [[0, 0, 0]], [[2, 4, 1.5]], [0.0])
    augment.noise_per_object(boxes, points, rotation_perturb=0.4,
                             center_noise_std=0.5, rng=rng)
    assert abs(boxes[0, -1]) <= 0.4 + 1e-9
