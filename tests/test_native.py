"""Native C++ host ops vs python/numpy oracles."""
import numpy as np
import pytest

from dal3d_tpu.native import host_ops
from dal3d_tpu.core import box_np_ops as bn
from dal3d_tpu.core.voxel_generator import points_to_voxel as np_voxelize
from dal3d_tpu.data.sampler import box_collision_test as np_collision
from dal3d_tpu.ops.kcenter import kcenter_numpy

pytestmark = pytest.mark.skipif(not host_ops.available(), reason="native lib not built")


def test_native_voxelize_matches_numpy():
    rng = np.random.RandomState(0)
    pts = rng.uniform(-9.9, 9.9, (500, 5)).astype(np.float32)
    pts[:, 2] = rng.uniform(-1.9, 1.9, 500)
    vs, pcr = (0.5, 0.5, 0.5), (-10, -10, -2, 10, 10, 2)
    v1, c1, n1 = host_ops.points_to_voxel(pts, vs, pcr, 5, 200)
    v2, c2, n2 = np_voxelize(pts, vs, pcr, 5, 200)
    np.testing.assert_array_equal(c1, c2)
    np.testing.assert_array_equal(n1, n2)
    np.testing.assert_allclose(v1, v2, atol=1e-6)


def test_native_collision_matches_numpy():
    rng = np.random.RandomState(1)
    n, k = 30, 25
    boxes = np.zeros((n, 5), np.float32)
    boxes[:, :2] = rng.uniform(-10, 10, (n, 2))
    boxes[:, 2:4] = rng.uniform(1, 4, (n, 2))
    boxes[:, 4] = rng.uniform(-np.pi, np.pi, n)
    qboxes = boxes[:k] + rng.uniform(-1, 1, (k, 5)).astype(np.float32)
    ca = bn.center_to_corner_box2d(boxes[:, :2], boxes[:, 2:4], boxes[:, 4])
    cb = bn.center_to_corner_box2d(qboxes[:, :2], qboxes[:, 2:4], qboxes[:, 4])
    got = host_ops.box_collision_test(ca, cb)
    ref = np_collision(ca, cb)
    np.testing.assert_array_equal(got, ref)


def test_native_nms_reasonable():
    rng = np.random.RandomState(2)
    n = 50
    boxes = np.zeros((n, 5), np.float32)
    boxes[:, :2] = rng.uniform(-10, 10, (n, 2))
    boxes[:, 2:4] = rng.uniform(2, 5, (n, 2))
    boxes[:, 4] = rng.uniform(-np.pi, np.pi, n)
    corners = bn.center_to_corner_box2d(boxes[:, :2], boxes[:, 2:4], boxes[:, 4])
    keep = host_ops.rotate_nms_cpu(corners, 0.3)
    assert keep[0]  # highest score always kept
    assert 0 < keep.sum() <= n
    # identical duplicate boxes: only first kept
    dup = np.concatenate([corners[:1], corners[:1]], axis=0)
    kd = host_ops.rotate_nms_cpu(dup, 0.3)
    assert kd.tolist() == [True, False]


def test_native_kcenter_matches_numpy():
    rng = np.random.RandomState(3)
    x = rng.randn(40, 3)
    d = np.sqrt(((x[:, None] - x[None, :]) ** 2).sum(-1)).astype(np.float32)
    costs = np.full(40, 0.25, np.float32)
    init = np.full(40, np.inf, np.float32)
    already = np.zeros(40, bool)
    got = host_ops.kcenter_greedy(d, costs, 3.0, init, 7, already, 40)
    ref, _ = kcenter_numpy(d, costs, 3.0, init, 7, already)
    assert got == ref


def test_native_mean_voxelizer_matches_sequential():
    """points_to_voxel_mean (MT + single-pass paths, f32 + bf16) is
    bit-parity with the sequential voxelizer's first-appearance order,
    first-K truncation, and max_voxels cap (host_ops.cc points_to_voxel)."""
    rng = np.random.RandomState(11)
    pts = rng.uniform(-2, 52, size=(60000, 5)).astype(np.float32)
    pts[:, 2] = rng.uniform(-4, 4, size=60000).astype(np.float32)
    vs = [0.2, 0.2, 0.4]
    pcr = [0, -1, -3, 51.2, 50.0, 1.0]
    for mp, mv in [(5, 9000), (1, 500), (20, 60000)]:
        vox, c0, n0 = host_ops.points_to_voxel(pts, vs, pcr, mp, mv)
        ref_mean = vox.sum(1) / np.maximum(n0, 1)[:, None]
        for T in (1, 3):  # 1 = single-pass fast path, 3 = 3-phase merge path
            mean, c1, n1 = host_ops.points_to_voxel_mean(
                pts, vs, pcr, mp, mv, n_threads=T)
            np.testing.assert_array_equal(c0, c1)
            np.testing.assert_array_equal(n0, n1)
            np.testing.assert_allclose(ref_mean, mean, rtol=1e-6, atol=1e-6)
            mb, cb, nb = host_ops.points_to_voxel_mean(
                pts, vs, pcr, mp, mv, n_threads=T, bf16=True)
            np.testing.assert_array_equal(c0, cb)
            np.testing.assert_allclose(
                np.asarray(mb, np.float32), mean, rtol=8e-3, atol=8e-3)
