"""Pallas tiled rotated-IoU kernel (ops/pallas_iou.py) — numerics parity.

Interpret mode proves the kernel math; on-chip Mosaic lowering is validated
separately (tools/profile_predict.py on the real TPU). The contract is
bit-level-convention parity with rotated_iou_fast.rotated_iou_matrix_greens
(same eps / boundary half-weighting / killed rules), plus agreement with the
exact bitonic-clipping reference on generic boxes.
"""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dal3d_tpu.ops.pallas_iou import (
    rotated_iou_matrix_batched,
    rotated_iou_matrix_greens_pallas,
)
from dal3d_tpu.ops.rotated_iou_fast import (
    rotated_iou_matrix_fast,
    rotated_iou_matrix_greens,
)


def _random_boxes(rng, n):
    b = np.zeros((n, 5), np.float32)
    b[:, 0:2] = rng.uniform(-40, 40, (n, 2))
    b[:, 2:4] = rng.uniform(0.5, 6.0, (n, 2))
    b[:, 4] = rng.uniform(-np.pi, np.pi, n)
    return b


def _interp(fn, *args):
    os.environ["DAL3D_IOU"] = "interpret"
    try:
        return fn(*args)
    finally:
        del os.environ["DAL3D_IOU"]


def test_pallas_iou_matches_greens_xla():
    """Kernel == the XLA Green's path it replaces (identical conventions)."""
    rng = np.random.RandomState(0)
    G, N, M = 3, 130, 57  # non-multiples of 128 exercise the padding
    b1 = jnp.asarray(np.stack([_random_boxes(rng, N) for _ in range(G)]))
    b2 = jnp.asarray(np.stack([_random_boxes(rng, M) for _ in range(G)]))
    got = np.asarray(_interp(rotated_iou_matrix_greens_pallas, b1, b2))
    want = np.asarray(jax.vmap(rotated_iou_matrix_greens)(b1, b2))
    assert got.shape == (G, N, M)
    # f32 op-reordering noise only (measured ~3e-5 at |xy| <= 40 m); an
    # eps-branch flip on a near-parallel edge pair could exceed this but
    # must stay rare — bound the tail too
    np.testing.assert_allclose(got, want, atol=1e-3)
    assert np.percentile(np.abs(got - want), 99.9) < 1e-4


def test_pallas_iou_matches_exact_reference():
    """Kernel agrees with the exact bitonic clipper on generic boxes."""
    rng = np.random.RandomState(1)
    N = 64
    b = jnp.asarray(_random_boxes(rng, N))
    got = np.asarray(_interp(rotated_iou_matrix_greens_pallas,
                             b[None], b[None]))[0]
    want = np.asarray(rotated_iou_matrix_fast(b, b))
    # generic (non-degenerate) random boxes: the two formulations agree
    np.testing.assert_allclose(got, want, atol=1e-3)
    # diagonal is self-IoU 1
    np.testing.assert_allclose(np.diag(got), 1.0, atol=1e-4)


def test_pallas_iou_identical_and_disjoint():
    boxes = jnp.asarray(
        np.array(
            [
                [0.0, 0.0, 2.0, 4.0, 0.3],
                [0.0, 0.0, 2.0, 4.0, 0.3],  # identical -> 1
                [50.0, 50.0, 2.0, 4.0, 1.0],  # far away -> 0
                [0.0, 0.0, 0.0, 0.0, 0.0],  # degenerate pad slot
            ],
            np.float32,
        )
    )
    got = np.asarray(_interp(rotated_iou_matrix_greens_pallas,
                             boxes[None], boxes[None]))[0]
    want = np.asarray(rotated_iou_matrix_greens(boxes, boxes))
    np.testing.assert_allclose(got, want, atol=1e-4)
    assert got[0, 1] > 0.999
    assert got[0, 2] < 1e-6


def test_duplicate_far_boxes_bounded():
    """Regression: exact-duplicate boxes at far centers blew up the XLA
    Green's path to IoU ~425 in f32 (double-ring over-count when the
    boundary half-weighting misses |num| <= eps on a coincident edge ->
    union ~ 0). The inter <= min(areas) clamp bounds every entry; both
    paths must return self-IoU 1 on the diagonal."""
    rng = np.random.RandomState(7)
    n = 96
    b = np.zeros((n, 5), np.float32)
    b[:, 0:2] = rng.uniform(-50, 50, (n, 2))
    b[:, 2:4] = rng.uniform(0.3, 8.0, (n, 2))
    b[:, 4] = rng.uniform(-np.pi, np.pi, n)
    b[n // 2:] = b[: n - n // 2]  # exact duplicates
    boxes = jnp.asarray(b)
    for name, got in (
        ("xla", np.asarray(rotated_iou_matrix_greens(boxes, boxes))),
        ("pallas", np.asarray(_interp(rotated_iou_matrix_greens_pallas,
                                      boxes[None], boxes[None]))[0]),
    ):
        assert got.min() >= 0.0 and got.max() <= 1.0 + 1e-4, (
            name, got.min(), got.max())
        np.testing.assert_allclose(np.diag(got), 1.0, atol=1e-3,
                                   err_msg=name)


def test_coincident_edge_cases():
    """Boxes sharing a coincident edge (abutting or partially overlapping
    collinear edges) — the boundary half-weighting's hardest inputs (ADVICE
    r4 #4). Both the XLA Green's path and the Pallas kernel (interpret) must
    match the exact clipper on: axis-aligned abutting (IoU 0), collinear
    shared edges with partial overlap, containment sharing an edge, and
    45-degree-rotated abutting squares."""
    c = float(np.cos(np.pi / 4))
    cases = np.array(
        [
            [0.5, 0.5, 1, 1, 0],       # A of each pair
            [1.5, 0.5, 1, 1, 0],       # abutting -> 0
            [0.5, 0.5, 1, 1, 0],
            [1.0, 0.5, 1, 1, 0],       # shared collinear edges -> 1/3
            [1.0, 0.5, 2, 1, 0],
            [0.5, 0.5, 1, 1, 0],       # contained, shares an edge -> 1/2
            [0.0, 0.0, 1, 1, np.pi / 4],
            [c, c, 1, 1, np.pi / 4],   # rotated abutting -> 0
        ],
        np.float32,
    )
    b1 = jnp.asarray(cases[0::2])
    b2 = jnp.asarray(cases[1::2])
    want = np.array([0.0, 1.0 / 3.0, 0.5, 0.0], np.float32)
    exact = np.asarray(jax.vmap(
        lambda a, b: rotated_iou_matrix_fast(a[None], b[None])[0, 0])(b1, b2))
    np.testing.assert_allclose(exact, want, atol=1e-5)
    greens = np.asarray(jax.vmap(
        lambda a, b: rotated_iou_matrix_greens(a[None], b[None])[0, 0])(b1, b2))
    np.testing.assert_allclose(greens, want, atol=1e-3)
    pal = np.asarray(_interp(rotated_iou_matrix_greens_pallas,
                             b1[:, None], b2[:, None]))[:, 0, 0]
    np.testing.assert_allclose(pal, want, atol=1e-3)


def test_batched_dispatcher_default_is_xla():
    """With DAL3D_IOU unset the dispatcher defaults to "auto": Pallas on a
    real TPU (chip-validated 2026-08-20 — faster AND more accurate there),
    the XLA Green's path on CPU backends like this test run."""
    assert os.environ.get("DAL3D_IOU") is None
    assert jax.default_backend() != "tpu"
    rng = np.random.RandomState(2)
    b = jnp.asarray(np.stack([_random_boxes(rng, 32) for _ in range(2)]))
    got = np.asarray(rotated_iou_matrix_batched(b, b))
    want = np.asarray(jax.vmap(rotated_iou_matrix_greens)(b, b))
    np.testing.assert_allclose(got, want, rtol=0, atol=0)  # same code path
