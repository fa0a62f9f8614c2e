"""Geometry parity: JAX device ops vs numpy host oracle."""
import numpy as np
import jax.numpy as jnp
import pytest

from dal3d_tpu.core import box_np_ops as bn
from dal3d_tpu.core import box_ops_jax as bj
from dal3d_tpu.core.box_coders import GroundBox3dCoder


def rand_boxes(n, ndim=9, seed=0):
    rng = np.random.RandomState(seed)
    b = np.zeros((n, ndim), np.float32)
    b[:, :2] = rng.uniform(-50, 50, (n, 2))
    b[:, 2] = rng.uniform(-3, 1, n)
    b[:, 3:6] = rng.uniform(0.5, 5.0, (n, 3))
    if ndim == 9:
        b[:, 6:8] = rng.uniform(-3, 3, (n, 2))
    b[:, -1] = rng.uniform(-np.pi, np.pi, n)
    return b


@pytest.mark.parametrize("ndim", [7, 9])
@pytest.mark.parametrize("vec", [False, True])
def test_encode_decode_roundtrip_np(ndim, vec):
    boxes = rand_boxes(64, ndim, seed=1)
    anchors = rand_boxes(64, ndim, seed=2)
    enc = bn.second_box_encode(boxes, anchors, encode_angle_to_vector=vec)
    assert enc.shape == (64, ndim + (1 if vec else 0))
    dec = bn.second_box_decode(enc, anchors, encode_angle_to_vector=vec)
    if vec:
        # angle recovered mod atan2 — compare sin/cos
        np.testing.assert_allclose(np.sin(dec[:, -1]), np.sin(boxes[:, -1]), atol=1e-4)
        np.testing.assert_allclose(np.cos(dec[:, -1]), np.cos(boxes[:, -1]), atol=1e-4)
        np.testing.assert_allclose(dec[:, :-1], boxes[:, :-1], rtol=1e-4, atol=1e-4)
    else:
        np.testing.assert_allclose(dec, boxes, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("vec", [False, True])
def test_encode_decode_jax_matches_np(vec):
    boxes = rand_boxes(128, 9, seed=3)
    anchors = rand_boxes(128, 9, seed=4)
    enc_np = bn.second_box_encode(boxes, anchors, encode_angle_to_vector=vec)
    enc_j = np.asarray(bj.second_box_encode(jnp.asarray(boxes), jnp.asarray(anchors), encode_angle_to_vector=vec))
    np.testing.assert_allclose(enc_j, enc_np, rtol=1e-5, atol=1e-5)
    dec_np = bn.second_box_decode(enc_np, anchors, encode_angle_to_vector=vec)
    dec_j = np.asarray(bj.second_box_decode(jnp.asarray(enc_np), jnp.asarray(anchors), encode_angle_to_vector=vec))
    np.testing.assert_allclose(dec_j, dec_np, rtol=1e-5, atol=1e-5)


def test_box_coder_code_size():
    coder = GroundBox3dCoder(vec_encode=True, n_dim=9)
    assert coder.code_size == 10
    boxes, anchors = rand_boxes(8, 9, 5), rand_boxes(8, 9, 6)
    assert coder.encode(boxes, anchors).shape == (8, 10)


def test_nearest_bbox_jax_matches_np():
    rb = rand_boxes(100, 7, seed=7)[:, [0, 1, 3, 4, 6]]
    out_np = bn.rbbox2d_to_near_bbox(rb)
    out_j = np.asarray(bj.rbbox2d_to_near_bbox(jnp.asarray(rb)))
    np.testing.assert_allclose(out_j, out_np, rtol=1e-5, atol=1e-5)


def test_iou_jax_matches_np():
    a = bn.rbbox2d_to_near_bbox(rand_boxes(50, 7, 8)[:, [0, 1, 3, 4, 6]])
    b = bn.rbbox2d_to_near_bbox(rand_boxes(30, 7, 9)[:, [0, 1, 3, 4, 6]])
    iou_np = bn.iou_jit(a, b, eps=0.0)
    iou_j = np.asarray(bj.pairwise_iou_aa(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(iou_j, iou_np, rtol=1e-4, atol=1e-5)


def test_corners_2d_matches_np():
    boxes = rand_boxes(40, 7, seed=11)
    bev = boxes[:, [0, 1, 3, 4, 6]]
    ref = bn.center_to_corner_box2d(bev[:, :2], bev[:, 2:4], bev[:, 4])
    out = np.asarray(bj.corners_2d(jnp.asarray(bev)))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_points_in_rbbox():
    boxes = np.array([[0, 0, 0, 2, 4, 2, 0, 0, 0.0]], np.float32)
    pts = np.array(
        [[0, 0, 1.0], [0.9, 1.9, 0.5], [1.1, 0, 0.5], [0, 2.1, 0.5], [0, 0, 2.5]], np.float32
    )
    m = bn.points_in_rbbox(pts, boxes)
    assert m[:, 0].tolist() == [True, True, False, False, False]
    # rotated 90°: w/l swap
    boxes_r = boxes.copy()
    boxes_r[0, -1] = np.pi / 2
    m = bn.points_in_rbbox(pts, boxes_r)
    assert m[0, 0] and not m[1, 0]


def test_anchor_grid_shape_and_layout():
    anchors = bn.create_anchors_3d_range(
        [1, 4, 4], [-51.2, -51.2, -0.95, 51.2, 51.2, -0.95], [1.97, 4.63, 1.74],
        rotations=[0, 1.57], velocities=[0, 0],
    )
    assert anchors.shape == (1, 4, 4, 1, 2, 9)
    a = anchors.reshape(-1, 9)
    # stride = 102.4/4 = 25.6, first center at -51.2+12.8
    np.testing.assert_allclose(a[0, :3], [-38.4, -38.4, -0.95], atol=1e-5)
    np.testing.assert_allclose(a[0, 3:6], [1.97, 4.63, 1.74], atol=1e-5)
    assert a[0, -1] == 0 and abs(a[1, -1] - 1.57) < 1e-6
    # x varies fastest within a row (W dim), y across rows
    np.testing.assert_allclose(a[2, 0], -12.8, atol=1e-5)
    np.testing.assert_allclose(a[2, 1], -38.4, atol=1e-5)
