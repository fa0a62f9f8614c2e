"""Rotated IoU + NMS kernels: analytic cases + numpy greedy oracle."""
import numpy as np
import jax.numpy as jnp

from dal3d_tpu.ops.rotated_iou import rotated_iou_matrix
from dal3d_tpu.ops.nms import rotate_nms, greedy_nms_from_iou
from dal3d_tpu.core import box_np_ops as bn


def box(x, y, w, l, r):
    return [x, y, w, l, r]


def test_identical_and_disjoint():
    b = jnp.asarray([box(0, 0, 2, 4, 0.3), box(10, 10, 1, 1, 1.0)], jnp.float32)
    iou = np.asarray(rotated_iou_matrix(b, b))
    np.testing.assert_allclose(np.diag(iou), [1.0, 1.0], atol=1e-5)
    assert iou[0, 1] == 0.0 and iou[1, 0] == 0.0


def test_axis_aligned_matches_aa_iou():
    rng = np.random.RandomState(0)
    n = 40
    b = np.zeros((n, 5), np.float32)
    b[:, :2] = rng.uniform(-5, 5, (n, 2))
    b[:, 2:4] = rng.uniform(1, 4, (n, 2))
    # rotations multiples of pi (w/l unchanged)
    b[:, 4] = rng.randint(0, 2, n) * np.pi
    iou = np.asarray(rotated_iou_matrix(jnp.asarray(b), jnp.asarray(b)))
    aa = bn.center_to_minmax_2d(b[:, :2], b[:, 2:4])
    ref = bn.iou_jit(aa, aa, eps=0.0)
    np.testing.assert_allclose(iou, ref, atol=1e-4)


def test_rotated_45_square():
    # unit square vs the same square rotated 45°: intersection is a regular
    # octagon with area 2*(sqrt(2)-1) ≈ 0.8284; union = 2 - inter
    b = jnp.asarray([box(0, 0, 1, 1, 0.0), box(0, 0, 1, 1, np.pi / 4)], jnp.float32)
    iou = np.asarray(rotated_iou_matrix(b, b))
    inter = 2 * (np.sqrt(2) - 1)
    expect = inter / (2 - inter)
    np.testing.assert_allclose(iou[0, 1], expect, atol=1e-4)
    np.testing.assert_allclose(iou[1, 0], expect, atol=1e-4)


def test_contained_box():
    b = jnp.asarray([box(0, 0, 4, 4, 0.1), box(0, 0, 1, 1, 0.7)], jnp.float32)
    iou = np.asarray(rotated_iou_matrix(b, b))
    np.testing.assert_allclose(iou[0, 1], 1.0 / 16.0, atol=1e-4)


def np_greedy_nms(iou, scores, thresh):
    order = np.argsort(-scores)
    keep = []
    suppressed = np.zeros(len(scores), bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        suppressed |= iou[i] > thresh
        suppressed[i] = True  # self, but already kept
    return keep


def test_nms_matches_numpy_oracle():
    rng = np.random.RandomState(1)
    n = 200
    b = np.zeros((n, 5), np.float32)
    b[:, :2] = rng.uniform(-20, 20, (n, 2))
    b[:, 2:4] = rng.uniform(2, 5, (n, 2))
    b[:, 4] = rng.uniform(-np.pi, np.pi, n)
    scores = rng.uniform(0, 1, n).astype(np.float32)
    valid = np.ones(n, bool)

    idx, keep_valid = rotate_nms(
        jnp.asarray(b), jnp.asarray(scores), jnp.asarray(valid),
        pre_max_size=128, post_max_size=50, iou_threshold=0.3,
    )
    got = [int(i) for i, v in zip(np.asarray(idx), np.asarray(keep_valid)) if v]

    # oracle on the top-128 by score
    top = np.argsort(-scores)[:128]
    iou = np.asarray(rotated_iou_matrix(jnp.asarray(b[top]), jnp.asarray(b[top])))
    ref_local = np_greedy_nms(iou, scores[top], 0.3)
    ref = [int(top[i]) for i in ref_local][:50]
    assert got == ref


def test_nms_all_invalid():
    b = jnp.zeros((16, 5), jnp.float32)
    s = jnp.zeros((16,), jnp.float32)
    idx, keep = rotate_nms(b, s, jnp.zeros(16, bool), pre_max_size=8, post_max_size=4, iou_threshold=0.5)
    assert not np.asarray(keep).any()


def test_greedy_chain_suppression():
    # chain a-b-c where iou(a,b)>t, iou(b,c)>t, iou(a,c)<t:
    # greedy keeps a and c (b suppressed by a, c NOT suppressed since b dead)
    iou = np.eye(3, dtype=np.float32)
    iou[0, 1] = iou[1, 0] = 0.9
    iou[1, 2] = iou[2, 1] = 0.9
    keep = np.asarray(greedy_nms_from_iou(jnp.asarray(iou), jnp.ones(3, bool), 0.5))
    assert keep.tolist() == [True, False, True]


def test_fast_iou_matches_clipper():
    from dal3d_tpu.ops.rotated_iou_fast import rotated_iou_matrix_fast, boxes_iou3d_fast
    from dal3d_tpu.ops.rotated_iou import boxes_iou3d

    rng = np.random.RandomState(5)
    n = 60
    b = np.zeros((n, 5), np.float32)
    b[:, :2] = rng.uniform(-15, 15, (n, 2))
    b[:, 2:4] = rng.uniform(0.5, 6, (n, 2))
    b[:, 4] = rng.uniform(-np.pi, np.pi, n)
    ref = np.asarray(rotated_iou_matrix(jnp.asarray(b), jnp.asarray(b)))
    got = np.asarray(rotated_iou_matrix_fast(jnp.asarray(b), jnp.asarray(b)))
    np.testing.assert_allclose(got, ref, atol=1e-4)

    b3 = np.zeros((20, 9), np.float32)
    b3[:, :2] = rng.uniform(-10, 10, (20, 2))
    b3[:, 2] = rng.uniform(-2, 0, 20)
    b3[:, 3:6] = rng.uniform(0.5, 4, (20, 3))
    b3[:, 8] = rng.uniform(-np.pi, np.pi, 20)
    r3 = np.asarray(boxes_iou3d(jnp.asarray(b3), jnp.asarray(b3)))
    g3 = np.asarray(boxes_iou3d_fast(jnp.asarray(b3), jnp.asarray(b3)))
    np.testing.assert_allclose(g3, r3, atol=1e-4)
