"""Scatter-free rotated IoU: candidate points + bitonic sort network.

The Sutherland-Hodgman clipper in ops.rotated_iou compacts vertices with
scatters, which lowers catastrophically on TPU inside vmap (measured ~7 s for
a 1000x1000 matrix). This kernel reformulates intersection area the way GPU
rotated-IoU kernels do (cf. detectron2 / the reference's
det3d/ops/box2d_iou_rotated CUDA kernel), but with *pure vectorized lane
math* — no scatters, no data-dependent control flow:

1. candidate vertices of the intersection polygon =
   corners of A inside B (4) + corners of B inside A (4) +
   all proper edge-edge intersection points (16)  -> 24 candidates w/ masks,
2. sort candidates by angle around their mean with a fixed bitonic network
   (invalid candidates get +inf keys and sort to the end),
3. replace invalid slots with the first (angular-min) valid vertex so the
   triangle-fan shoelace ignores them, and sum the fan area.

Everything is elementwise over the pair dimension -> VPU-friendly at any
batch shape, differentiable, and ~3 orders of magnitude faster than the
scatter clipper on this TPU runtime.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core.box_ops_jax import corners_2d

_NCAND = 24
_PADDED = 32  # bitonic network size


def _point_in_quad(p, quad):
    """p [..., 2], quad [..., 4, 2] -> bool [...]: inside (sign-consistent)."""
    a = quad
    b = jnp.roll(quad, -1, axis=-2)
    s = (b[..., 0] - a[..., 0]) * (p[..., None, 1] - a[..., 1]) - (
        b[..., 1] - a[..., 1]
    ) * (p[..., None, 0] - a[..., 0])
    return jnp.all(s >= -1e-9, axis=-1) | jnp.all(s <= 1e-9, axis=-1)


def _edge_intersections(c1, c2):
    """All 16 edge-pair intersection points.

    c1, c2: [..., 4, 2] -> (pts [..., 16, 2], valid [..., 16]).
    """
    a0 = c1[..., :, None, :]  # [..., 4, 1, 2]
    a1 = jnp.roll(c1, -1, axis=-2)[..., :, None, :]
    b0 = c2[..., None, :, :]  # [..., 1, 4, 2]
    b1 = jnp.roll(c2, -1, axis=-2)[..., None, :, :]

    da = a1 - a0
    db = b1 - b0
    denom = da[..., 0] * db[..., 1] - da[..., 1] * db[..., 0]
    dp = b0 - a0
    t = (dp[..., 0] * db[..., 1] - dp[..., 1] * db[..., 0]) / jnp.where(
        jnp.abs(denom) < 1e-12, 1.0, denom
    )
    u = (dp[..., 0] * da[..., 1] - dp[..., 1] * da[..., 0]) / jnp.where(
        jnp.abs(denom) < 1e-12, 1.0, denom
    )
    valid = (jnp.abs(denom) > 1e-12) & (t >= 0) & (t <= 1) & (u >= 0) & (u <= 1)
    pts = a0 + t[..., None] * da
    shp = pts.shape[:-3]
    return pts.reshape(*shp, 16, 2), valid.reshape(*shp, 16)


def _bitonic_sort_by_key(keys, vals):
    """Fixed bitonic network over axis -1 (len must be a power of two).

    keys [..., L]; vals [..., L, 2]. Ascending by key.
    """
    L = keys.shape[-1]
    k = 2
    while k <= L:
        j = k // 2
        while j >= 1:
            idx = jnp.arange(L)
            partner = idx ^ j
            ascending = (idx & k) == 0
            k1 = keys
            k2 = keys[..., partner]
            v2 = vals[..., partner, :]
            keep_first = jnp.where(
                idx < partner,
                jnp.where(ascending, k1 <= k2, k1 >= k2),
                jnp.where(ascending, k2 <= k1, k2 >= k1),
            )
            keys = jnp.where(keep_first, k1, k2)
            vals = jnp.where(keep_first[..., None], vals, v2)
            j //= 2
        k *= 2
    return keys, vals


def _pair_intersection_area(c1, c2):
    """c1, c2 [..., 4, 2] -> intersection area [...] (batched, scatter-free)."""
    # vectorized containment: broadcast each corner against the other quad
    def contains(quad, pts):  # quad [...,4,2], pts [...,4,2] -> [...,4]
        a = quad[..., None, :, :]  # [...,1,4,2]
        b = jnp.roll(quad, -1, axis=-2)[..., None, :, :]
        p = pts[..., :, None, :]  # [...,4,1,2]
        s = (b[..., 0] - a[..., 0]) * (p[..., 1] - a[..., 1]) - (
            b[..., 1] - a[..., 1]
        ) * (p[..., 0] - a[..., 0])
        return jnp.all(s >= -1e-9, axis=-1) | jnp.all(s <= 1e-9, axis=-1)

    c1, c2 = jnp.broadcast_arrays(c1, c2)
    vA = contains(c2, c1)  # [..., 4] corners of A inside B
    vB = contains(c1, c2)
    inter_pts, inter_valid = _edge_intersections(c1, c2)  # [...,16,2],[...,16]

    pts = jnp.concatenate([c1, c2, inter_pts], axis=-2)  # [..., 24, 2]
    valid = jnp.concatenate([vA, vB, inter_valid], axis=-1)  # [..., 24]
    n_valid = valid.sum(axis=-1)

    # angular sort around the valid-mean
    denom = jnp.maximum(n_valid, 1)[..., None]
    center = (pts * valid[..., None]).sum(axis=-2) / denom  # [..., 2]
    rel = pts - center[..., None, :]
    # pseudo-angle: monotone in atan2 over [0, 4) at one division and no
    # trig — atan2 here cost 24 transcendentals per pair and dominated the
    # [12, 1000, 1000] NMS IoU matrices
    dx, dy = rel[..., 0], rel[..., 1]
    r = dx / (jnp.abs(dx) + jnp.abs(dy) + 1e-12)
    ang = jnp.where(dy >= 0, 1.0 - r, 3.0 + r)
    _INVALID = 1e9
    keys = jnp.where(valid, ang, _INVALID)
    # pad to the bitonic size
    pad = _PADDED - _NCAND
    keys = jnp.concatenate(
        [keys, jnp.full((*keys.shape[:-1], pad), _INVALID)], axis=-1
    )
    pts_p = jnp.concatenate([pts, jnp.zeros((*pts.shape[:-2], pad, 2))], axis=-2)
    keys_s, pts_s = _bitonic_sort_by_key(keys, pts_p)

    # invalid slots -> first valid vertex (zero triangle-fan contribution)
    first = pts_s[..., 0:1, :]
    ok = keys_s < 1e8
    ring = jnp.where(ok[..., None], pts_s, first)

    v = ring - first
    nxt = jnp.roll(v, -1, axis=-2)
    cross = v[..., 0] * nxt[..., 1] - nxt[..., 0] * v[..., 1]
    # the roll wraps last->first: v_first = 0, contributes 0 ✓
    area = 0.5 * jnp.abs(cross.sum(axis=-1))
    return jnp.where(n_valid >= 3, area, 0.0)


def rotated_iou_matrix_fast(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Exact rotated IoU matrix [N, M] for BEV boxes [*, 5] (x,y,w,l,yaw)."""
    c1 = corners_2d(boxes1)  # [N,4,2]
    c2 = corners_2d(boxes2)  # [M,4,2]
    inter = _pair_intersection_area(c1[:, None], c2[None, :])  # [N, M]
    area1 = jnp.abs(boxes1[:, 2] * boxes1[:, 3])
    area2 = jnp.abs(boxes2[:, 2] * boxes2[:, 3])
    # physical bound: inter <= min(areas). Guards the fp blow-up where a
    # degenerate (coincident-edge) pair over-counts inter, union -> ~0 and
    # IoU explodes (measured up to 425 on exact-duplicate boxes on chip)
    inter = jnp.minimum(inter, jnp.minimum(area1[:, None], area2[None, :]))
    union = area1[:, None] + area2[None, :] - inter
    return jnp.where(union > 0, inter / union, 0.0)


def boxes_iou3d_fast(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """3D IoU [N, M] using the scatter-free BEV intersection."""
    bev1 = jnp.stack([boxes1[:, 0], boxes1[:, 1], boxes1[:, 3], boxes1[:, 4], boxes1[:, -1]], -1)
    bev2 = jnp.stack([boxes2[:, 0], boxes2[:, 1], boxes2[:, 3], boxes2[:, 4], boxes2[:, -1]], -1)
    inter_bev = _pair_intersection_area(
        corners_2d(bev1)[:, None], corners_2d(bev2)[None, :]
    )
    z1lo, z1hi = boxes1[:, 2], boxes1[:, 2] + boxes1[:, 5]
    z2lo, z2hi = boxes2[:, 2], boxes2[:, 2] + boxes2[:, 5]
    zov = jnp.maximum(
        jnp.minimum(z1hi[:, None], z2hi[None, :]) - jnp.maximum(z1lo[:, None], z2lo[None, :]), 0.0
    )
    inter = inter_bev * zov
    vol1 = jnp.abs(boxes1[:, 3] * boxes1[:, 4] * boxes1[:, 5])
    vol2 = jnp.abs(boxes2[:, 3] * boxes2[:, 4] * boxes2[:, 5])
    # physical bound (see rotated_iou_matrix_fast)
    inter = jnp.minimum(inter, jnp.minimum(vol1[:, None], vol2[None, :]))
    union = vol1[:, None] + vol2[None, :] - inter
    return jnp.where(union > 0, inter / union, 0.0)


def _pair_intersection_area_greens(c1, c2):
    """Green's-theorem intersection area — no sort, ~200 flops/pair.

    area(A∩B) = 0.5 |Σ cross(u, v)| over the boundary segments of A∩B, which
    are exactly {A's edges Cyrus–Beck-clipped to B} ∪ {B's edges clipped to A}.
    Both quads must share winding; we orient both counterclockwise first.
    c1, c2: [..., 4, 2] broadcastable.
    """
    c1, c2 = jnp.broadcast_arrays(c1, c2)
    # corners_2d emits a fixed CLOCKWISE winding for positive (w, l); rather
    # than reversing the rings (negative-stride slices SIGABRT the TPU
    # compiler in this graph), keep CW order and use the right-hand normal
    # as "inward" below; |total| absorbs the orientation sign.

    _EPS = 1e-4  # meters; boxes are lidar-scale

    def clipped_contrib(edges_from, clip_to):
        """Σ cross(u, v) over edges of `edges_from` Cyrus–Beck-clipped to the
        convex `clip_to`. Shared-boundary convention: a clipped segment lying
        ON the clip boundary is weighted 1/2 — its mirror sub-segment on the
        other polygon traverses it in the opposite direction, so coincident
        boundaries sum to one traversal and edge-only contact cancels to
        zero area."""
        p0 = edges_from  # [..., 4, 2]
        p1 = jnp.roll(edges_from, -1, axis=-2)
        d = p1 - p0
        # CCW clip quad half-planes: inward unit normal of edge (a->b)
        a = clip_to[..., None, :, :]  # [..., 1, 4, 2] (clip edges)
        b = jnp.roll(clip_to, -1, axis=-2)[..., None, :, :]
        e = b - a
        elen = jnp.sqrt(jnp.maximum(jnp.sum(e * e, axis=-1), 1e-20))
        # CW ring -> inward unit normal is the RIGHT-hand normal (ey, -ex)
        n = jnp.stack([e[..., 1], -e[..., 0]], axis=-1) / elen[..., None]
        # signed distance of p0 from the plane, projection of the edge dir
        num = jnp.sum(n * (p0[..., :, None, :] - a), axis=-1)  # [..., 4e, 4p] meters
        den = jnp.sum(n * d[..., :, None, :], axis=-1)  # meters
        parallel = jnp.abs(den) < _EPS
        t_at = -num / jnp.where(parallel, 1.0, den)
        is_entry = den > 0  # moving inward
        t_lo = jnp.max(jnp.where(is_entry & ~parallel, t_at, 0.0), axis=-1)
        t_hi = jnp.min(jnp.where(~is_entry & ~parallel, t_at, 1.0), axis=-1)
        on_boundary = parallel & (jnp.abs(num) <= _EPS)
        killed = jnp.any(parallel & (num < -_EPS), axis=-1)
        weight = jnp.where(jnp.any(on_boundary, axis=-1), 0.5, 1.0)
        t_lo = jnp.clip(t_lo, 0.0, 1.0)
        t_hi = jnp.clip(t_hi, 0.0, 1.0)
        ok = (t_hi > t_lo) & ~killed
        u = p0 + t_lo[..., None] * d
        v = p0 + t_hi[..., None] * d
        cr = u[..., 0] * v[..., 1] - v[..., 0] * u[..., 1]
        return (jnp.where(ok, cr, 0.0) * weight).sum(axis=-1)

    total = clipped_contrib(c1, c2) + clipped_contrib(c2, c1)
    return 0.5 * jnp.abs(total)


def _clip_planes(c: jnp.ndarray):
    """Per-box clip planes of a CW corner ring [M, 4, 2]:
    (inward unit normals n [M, 4, 2], offsets a.n [M, 4]). Hoisting this out
    of the pair grid removes 8 sqrt+div per PAIR from the NMS IoU matrices."""
    a = c
    e = jnp.roll(c, -1, axis=-2) - a
    elen = jnp.sqrt(jnp.maximum(jnp.sum(e * e, axis=-1), 1e-20))
    n = jnp.stack([e[..., 1], -e[..., 0]], axis=-1) / elen[..., None]
    return n, jnp.sum(n * a, axis=-1)


def _matrix_contrib(cf: jnp.ndarray, n: jnp.ndarray, an: jnp.ndarray):
    """Σ cross(u, v) of `cf`'s edges ([N, 4, 2]) Cyrus-Beck-clipped to each
    box with planes (n, an) ([M, 4, *]) -> [N, M]. Same math/conventions as
    _pair_intersection_area_greens, with the plane dots as one contraction."""
    _EPS = 1e-4
    p0 = cf
    d = jnp.roll(cf, -1, axis=-2) - p0
    # HIGHEST precision: TPU lowers these contractions onto the MXU at bf16
    # by default, whose ~3-digit mantissa wrecks the _EPS=1e-4 boundary /
    # parallel classification below (measured on chip: mean IoU err 0.08 on
    # overlapping pairs, 11% NMS decision flips vs the exact clipper). The
    # dots are [*,4,2]x[*,4,2] — f32 costs nothing here.
    hp = jax.lax.Precision.HIGHEST
    num = jnp.einsum("iex,jpx->iejp", p0, n, precision=hp) - an[None, None]  # [N,4e,M,4p]
    den = jnp.einsum("iex,jpx->iejp", d, n, precision=hp)
    parallel = jnp.abs(den) < _EPS
    t_at = -num / jnp.where(parallel, 1.0, den)
    is_entry = den > 0
    t_lo = jnp.max(jnp.where(is_entry & ~parallel, t_at, 0.0), axis=-1)
    t_hi = jnp.min(jnp.where(~is_entry & ~parallel, t_at, 1.0), axis=-1)
    on_boundary = jnp.any(parallel & (jnp.abs(num) <= _EPS), axis=-1)
    killed = jnp.any(parallel & (num < -_EPS), axis=-1)
    weight = jnp.where(on_boundary, 0.5, 1.0)
    t_lo = jnp.clip(t_lo, 0.0, 1.0)
    t_hi = jnp.clip(t_hi, 0.0, 1.0)
    ok = (t_hi > t_lo) & ~killed
    u = p0[:, :, None] + t_lo[..., None] * d[:, :, None]  # [N,4,M,2]
    v = p0[:, :, None] + t_hi[..., None] * d[:, :, None]
    cr = u[..., 0] * v[..., 1] - v[..., 0] * u[..., 1]
    return (jnp.where(ok, cr, 0.0) * weight).sum(axis=1)  # [N, M]


def rotated_iou_matrix_greens(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Rotated IoU matrix via the Green's-theorem kernel (fastest path)."""
    c1 = corners_2d(boxes1)
    c2 = corners_2d(boxes2)
    n1, an1 = _clip_planes(c1)
    n2, an2 = _clip_planes(c2)
    inter = 0.5 * jnp.abs(
        _matrix_contrib(c1, n2, an2) + _matrix_contrib(c2, n1, an1).T
    )
    area1 = jnp.abs(boxes1[:, 2] * boxes1[:, 3])
    area2 = jnp.abs(boxes2[:, 2] * boxes2[:, 3])
    # physical bound: inter <= min(areas). On exact-duplicate boxes the
    # double-ring sum can count the full area TWICE when the boundary
    # half-weighting misfires in f32 (|num| lands just above _EPS on a
    # coincident edge) -> union ~ 0 and IoU up to ~425 (measured on chip).
    # The clamp also floors union at max(area1, area2) > 0.
    inter = jnp.minimum(inter, jnp.minimum(area1[:, None], area2[None, :]))
    union = area1[:, None] + area2[None, :] - inter
    return jnp.where(union > 0, inter / union, 0.0)
