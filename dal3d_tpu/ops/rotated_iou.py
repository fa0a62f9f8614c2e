"""Rotated BEV box IoU via vectorized convex polygon clipping.

TPU-native replacement for the reference's C++/CUDA rotated-IoU kernels
(det3d/ops/nms/nms.cc rotate_non_max_suppression_cpu, det3d/ops/iou3d_nms,
det3d/ops/box2d_iou_rotated): intersection of two rotated rectangles by
Sutherland–Hodgman clipping with fixed vertex buffers, fully vmappable —
no host round-trip (the reference bounces GPU->CPU->C++ per frame at
det3d/core/bbox/box_torch_ops.py:528-545).

Boxes are BEV [x, y, w, l, yaw] with the project's corner convention
(core.box_ops_jax.corners_2d).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.box_ops_jax import corners_2d

_VBUF = 16  # intersection of two convex quads has <= 8 vertices; headroom for clipping


def _clip_halfplane(poly, count, a, b):
    """Clip polygon (poly [V,2], count valid) by half-plane left of edge a->b.

    Returns (new_poly [V,2], new_count). Emits, per input edge (cur -> nxt):
    cur if inside, then the edge/halfplane intersection if the edge crosses.
    """
    V = poly.shape[0]
    idx = jnp.arange(V)
    in_poly = idx < count
    nxt_idx = jnp.where(idx + 1 < count, idx + 1, 0)
    cur = poly
    nxt = poly[nxt_idx]

    edge = b - a
    # signed area; inside = left of a->b
    side_cur = edge[0] * (cur[:, 1] - a[1]) - edge[1] * (cur[:, 0] - a[0])
    side_nxt = edge[0] * (nxt[:, 1] - a[1]) - edge[1] * (nxt[:, 0] - a[0])
    in_cur = side_cur >= 0
    in_nxt = side_nxt >= 0

    denom = side_cur - side_nxt
    t = jnp.where(jnp.abs(denom) > 1e-12, side_cur / jnp.where(denom == 0, 1.0, denom), 0.0)
    inter = cur + t[:, None] * (nxt - cur)

    emit_cur = in_cur & in_poly
    emit_int = (in_cur != in_nxt) & in_poly

    # positions via exclusive cumsum of emit counts
    n_emit = emit_cur.astype(jnp.int32) + emit_int.astype(jnp.int32)
    base = jnp.cumsum(n_emit) - n_emit
    pos_cur = jnp.where(emit_cur, base, V)
    pos_int = jnp.where(emit_int, base + emit_cur.astype(jnp.int32), V)

    out = jnp.zeros_like(poly)
    out = out.at[pos_cur].set(cur, mode="drop")
    out = out.at[pos_int].set(inter, mode="drop")
    return out, jnp.sum(n_emit)


def _poly_area(poly, count):
    V = poly.shape[0]
    idx = jnp.arange(V)
    nxt = poly[jnp.where(idx + 1 < count, idx + 1, 0)]
    cross = poly[:, 0] * nxt[:, 1] - nxt[:, 0] * poly[:, 1]
    cross = jnp.where(idx < count, cross, 0.0)
    area = 0.5 * jnp.sum(cross)
    return jnp.abs(area)


def _rect_intersection_area(c1, c2):
    """c1, c2: [4, 2] corner arrays (convex, consistent winding)."""
    # ensure counterclockwise winding for the clipper (shoelace > 0)
    def ccw(c):
        a2 = jnp.sum(c[:, 0] * jnp.roll(c[:, 1], -1) - jnp.roll(c[:, 0], -1) * c[:, 1])
        return jnp.where(a2 < 0, c[::-1], c)

    c1, c2 = ccw(c1), ccw(c2)
    poly = jnp.zeros((_VBUF, 2), c1.dtype).at[:4].set(c1)
    count = jnp.int32(4)
    for i in range(4):
        a, b = c2[i], c2[(i + 1) % 4]
        poly, count = _clip_halfplane(poly, count, a, b)
    return jnp.where(count >= 3, _poly_area(poly, count), 0.0)


def rotated_iou_matrix(boxes1: jnp.ndarray, boxes2: jnp.ndarray, block: int = 128) -> jnp.ndarray:
    """Exact rotated IoU matrix [N, M] for BEV boxes [*, 5] (x,y,w,l,yaw).

    Row-blocked (lax.map) so peak memory stays at block*M clip buffers.
    """
    N, M = boxes1.shape[0], boxes2.shape[0]
    c1 = corners_2d(boxes1)  # [N,4,2]
    c2 = corners_2d(boxes2)  # [M,4,2]
    area1 = boxes1[:, 2] * boxes1[:, 3]
    area2 = boxes2[:, 2] * boxes2[:, 3]

    pad = (-N) % block
    c1p = jnp.pad(c1, ((0, pad), (0, 0), (0, 0)))
    a1p = jnp.pad(area1, (0, pad))

    inter_fn = jax.vmap(jax.vmap(_rect_intersection_area, in_axes=(None, 0)), in_axes=(0, None))

    def row_block(args):
        cb, ab = args  # [block,4,2], [block]
        inter = inter_fn(cb, c2)  # [block, M]
        union = ab[:, None] + area2[None, :] - inter
        return jnp.where(union > 0, inter / union, 0.0)

    nb = (N + pad) // block
    out = jax.lax.map(row_block, (c1p.reshape(nb, block, 4, 2), a1p.reshape(nb, block)))
    return out.reshape(nb * block, M)[:N]


def boxes_iou3d(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Exact 3D rotated IoU matrix [N, M] for boxes [*, 7+] (x,y,z,w,l,h,...,yaw),
    z = bottom center. TPU-native replacement for the reference's
    boxes_iou3d_gpu CUDA kernel (det3d/ops/iou3d_nms/src/iou3d_nms.cpp,
    bevfusion/mmdet3d/ops/iou3d): BEV polygon intersection x z-overlap."""
    bev1 = jnp.stack([boxes1[:, 0], boxes1[:, 1], boxes1[:, 3], boxes1[:, 4], boxes1[:, -1]], -1)
    bev2 = jnp.stack([boxes2[:, 0], boxes2[:, 1], boxes2[:, 3], boxes2[:, 4], boxes2[:, -1]], -1)
    c1 = corners_2d(bev1)
    c2 = corners_2d(bev2)
    area1 = bev1[:, 2] * bev1[:, 3]
    area2 = bev2[:, 2] * bev2[:, 3]
    inter_fn = jax.vmap(jax.vmap(_rect_intersection_area, in_axes=(None, 0)), in_axes=(0, None))
    inter_bev = inter_fn(c1, c2)  # [N, M]
    z1lo, z1hi = boxes1[:, 2], boxes1[:, 2] + boxes1[:, 5]
    z2lo, z2hi = boxes2[:, 2], boxes2[:, 2] + boxes2[:, 5]
    zov = jnp.maximum(
        jnp.minimum(z1hi[:, None], z2hi[None, :]) - jnp.maximum(z1lo[:, None], z2lo[None, :]), 0.0
    )
    inter3d = inter_bev * zov
    vol1 = area1 * boxes1[:, 5]
    vol2 = area2 * boxes2[:, 5]
    union = vol1[:, None] + vol2[None, :] - inter3d
    return jnp.where(union > 0, inter3d / union, 0.0)
