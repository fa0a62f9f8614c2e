"""Host-side (numpy) 3D box geometry.

Functional re-implementation of the reference's box math (behavioral parity
with det3d/core/bbox/box_np_ops.py — encode/decode at :54-230, anchors at
:735-810, nearest-bbox/IoU at :345-357,:958-996, corners/rotation at :360-520,
points-in-rbbox at :612-660) written as vectorized numpy instead of numba
loops. The JAX twins live in ``dal3d_tpu.core.box_ops_jax`` and are unit-tested
against this module.

Box convention (lidar frame): [x, y, z, w, l, h, (vx, vy,) yaw], z is the
box *bottom* center in storage, yaw around +z.
"""
from __future__ import annotations

import numpy as np


# ---------------------------------------------------------------------------
# angle helpers
# ---------------------------------------------------------------------------

def limit_period(val, offset: float = 0.5, period: float = np.pi):
    return val - np.floor(val / period + offset) * period


# ---------------------------------------------------------------------------
# residual box coding (SECOND), n_dim 7 or 9 (with velocity)
# ---------------------------------------------------------------------------

def second_box_encode(boxes, anchors, encode_angle_to_vector=False, smooth_dim=False):
    """Encode target boxes w.r.t. anchors.

    boxes/anchors: [N, 7] (x,y,z,w,l,h,r) or [N, 9] (x,y,z,w,l,h,vx,vy,r).
    Returns [N, code_size]; code_size = ndim (+1 if angle-vector encoding).
    """
    boxes = np.asarray(boxes)
    anchors = np.asarray(anchors)
    ndim = anchors.shape[-1]
    xa, ya, za, wa, la, ha = (anchors[..., i] for i in range(6))
    xg, yg, zg, wg, lg, hg = (boxes[..., i] for i in range(6))
    ra, rg = anchors[..., -1], boxes[..., -1]

    diagonal = np.sqrt(la**2 + wa**2)
    xt = (xg - xa) / diagonal
    yt = (yg - ya) / diagonal
    zt = (zg - za) / ha
    if smooth_dim:
        lt, wt, ht = lg / la - 1, wg / wa - 1, hg / ha - 1
    else:
        lt, wt, ht = np.log(lg / la), np.log(wg / wa), np.log(hg / ha)
    ret = [xt, yt, zt, wt, lt, ht]
    if ndim > 7:
        vxt = boxes[..., 6] - anchors[..., 6]
        vyt = boxes[..., 7] - anchors[..., 7]
        ret.extend([vxt, vyt])
    if encode_angle_to_vector:
        ret.extend([np.cos(rg) - np.cos(ra), np.sin(rg) - np.sin(ra)])
    else:
        ret.append(rg - ra)
    return np.stack(ret, axis=-1)


def second_box_decode(box_encodings, anchors, encode_angle_to_vector=False, smooth_dim=False):
    """Inverse of :func:`second_box_encode`. Returns [N, ndim] boxes."""
    box_encodings = np.asarray(box_encodings)
    anchors = np.asarray(anchors)
    ndim = anchors.shape[-1]
    xa, ya, za, wa, la, ha = (anchors[..., i] for i in range(6))
    ra = anchors[..., -1]
    xt, yt, zt, wt, lt, ht = (box_encodings[..., i] for i in range(6))

    diagonal = np.sqrt(la**2 + wa**2)
    xg = xt * diagonal + xa
    yg = yt * diagonal + ya
    zg = zt * ha + za
    if smooth_dim:
        lg, wg, hg = (lt + 1) * la, (wt + 1) * wa, (ht + 1) * ha
    else:
        lg, wg, hg = np.exp(lt) * la, np.exp(wt) * wa, np.exp(ht) * ha
    ret = [xg, yg, zg, wg, lg, hg]
    if ndim > 7:
        ret.append(box_encodings[..., 6] + anchors[..., 6])
        ret.append(box_encodings[..., 7] + anchors[..., 7])
        if encode_angle_to_vector:
            rtx, rty = box_encodings[..., 8], box_encodings[..., 9]
        else:
            rt = box_encodings[..., 8]
    else:
        if encode_angle_to_vector:
            rtx, rty = box_encodings[..., 6], box_encodings[..., 7]
        else:
            rt = box_encodings[..., 6]
    if encode_angle_to_vector:
        rg = np.arctan2(rty + np.sin(ra), rtx + np.cos(ra))
    else:
        rg = rt + ra
    ret.append(rg)
    return np.stack(ret, axis=-1)


# ---------------------------------------------------------------------------
# corners / rotation
# ---------------------------------------------------------------------------

def corners_nd(dims, origin=0.5):
    """Compute corner offsets from box dims. dims: [N, ndim] -> [N, 2**ndim, ndim].

    Corner ordering matches the reference (binary count with x-flip for 2D:
    (x-z)(y-z)(z-z) pattern) so downstream surface/polygon code agrees.
    """
    dims = np.asarray(dims)
    ndim = int(dims.shape[1])
    corners_norm = np.stack(
        np.unravel_index(np.arange(2**ndim), [2] * ndim), axis=1
    ).astype(dims.dtype)
    # reorder to the reference's convention:
    # 2D: [(0,0),(0,1),(1,1),(1,0)]  (counterclockwise when y up)
    # 3D: [(0,0,0),(0,0,1),(0,1,1),(0,1,0),(1,0,0),(1,0,1),(1,1,1),(1,1,0)]
    if ndim == 2:
        corners_norm = corners_norm[[0, 1, 3, 2]]
    elif ndim == 3:
        corners_norm = corners_norm[[0, 1, 3, 2, 4, 5, 7, 6]]
    corners_norm = corners_norm - np.array(origin, dtype=dims.dtype)
    return dims.reshape(-1, 1, ndim) * corners_norm.reshape(1, 2**ndim, ndim)


def rotation_2d(points, angles):
    """Rotate [N, P, 2] points by [N] angles (counterclockwise in reference's
    clockwise-when-y-down convention, matching det3d rotation_2d)."""
    rot_sin = np.sin(angles)
    rot_cos = np.cos(angles)
    rot_mat_T = np.stack([[rot_cos, -rot_sin], [rot_sin, rot_cos]])  # [2,2,N]
    return np.einsum("aij,jka->aik", points, rot_mat_T)


def rotation_3d_in_axis(points, angles, axis=2):
    """Rotate [N, P, 3] points by [N] angles around an axis."""
    rot_sin = np.sin(angles)
    rot_cos = np.cos(angles)
    ones = np.ones_like(rot_cos)
    zeros = np.zeros_like(rot_cos)
    if axis == 1:
        rot_mat_T = np.stack(
            [[rot_cos, zeros, -rot_sin], [zeros, ones, zeros], [rot_sin, zeros, rot_cos]]
        )
    elif axis in (2, -1):
        rot_mat_T = np.stack(
            [[rot_cos, -rot_sin, zeros], [rot_sin, rot_cos, zeros], [zeros, zeros, ones]]
        )
    elif axis == 0:
        rot_mat_T = np.stack(
            [[ones, zeros, zeros], [zeros, rot_cos, -rot_sin], [zeros, rot_sin, rot_cos]]
        )
    else:
        raise ValueError("axis should be in [0, 1, 2]")
    return np.einsum("aij,jka->aik", points, rot_mat_T)


def center_to_corner_box2d(centers, dims, angles=None, origin=0.5):
    """BEV boxes -> corners. centers [N,2], dims [N,2], angles [N] -> [N,4,2]."""
    corners = corners_nd(dims, origin=origin)
    if angles is not None:
        corners = rotation_2d(corners, angles)
    return corners + centers.reshape(-1, 1, 2)


def center_to_corner_box3d(centers, dims, angles=None, origin=(0.5, 0.5, 0.0), axis=2):
    """3D boxes -> 8 corners. origin (0.5,0.5,0) = z is bottom center."""
    corners = corners_nd(dims, origin=origin)
    if angles is not None:
        corners = rotation_3d_in_axis(corners, angles, axis=axis)
    return corners + centers.reshape(-1, 1, 3)


def corner_to_standup_nd(boxes_corner):
    """[N, K, ndim] corners -> [N, 2*ndim] axis-aligned (min..., max...)."""
    return np.concatenate([boxes_corner.min(axis=1), boxes_corner.max(axis=1)], axis=-1)


def center_to_minmax_2d(centers, dims):
    return np.concatenate([centers - dims / 2, centers + dims / 2], axis=-1)


def rbbox2d_to_near_bbox(rbboxes):
    """Rotated BEV boxes [N,5] (x,y,w,l,r) -> nearest axis-aligned [N,4].

    Swaps w/l when the yaw is closer to +-pi/2 (reference semantics for the
    'nearest IoU' anchor-matching similarity).
    """
    rbboxes = np.asarray(rbboxes)
    rots = rbboxes[..., -1]
    rots_0_pi_div_2 = np.abs(limit_period(rots, 0.5, np.pi))
    cond = (rots_0_pi_div_2 > np.pi / 4)[..., np.newaxis]
    bboxes_center = np.where(cond, rbboxes[:, [0, 1, 3, 2]], rbboxes[:, :4])
    return center_to_minmax_2d(bboxes_center[:, :2], bboxes_center[:, 2:])


def iou_jit(boxes, query_boxes, eps: float = 1.0):
    """Axis-aligned 2D IoU matrix [N, K] (vectorized; numba-free)."""
    boxes = np.asarray(boxes)
    query_boxes = np.asarray(query_boxes)
    N, K = boxes.shape[0], query_boxes.shape[0]
    if N == 0 or K == 0:
        return np.zeros((N, K), dtype=boxes.dtype if N else np.float32)
    b = boxes[:, None, :]  # [N,1,4]
    q = query_boxes[None, :, :]  # [1,K,4]
    iw = np.minimum(b[..., 2], q[..., 2]) - np.maximum(b[..., 0], q[..., 0]) + eps
    ih = np.minimum(b[..., 3], q[..., 3]) - np.maximum(b[..., 1], q[..., 1]) + eps
    inter = np.where((iw > 0) & (ih > 0), iw * ih, 0.0)
    area_b = (b[..., 2] - b[..., 0] + eps) * (b[..., 3] - b[..., 1] + eps)
    area_q = (q[..., 2] - q[..., 0] + eps) * (q[..., 3] - q[..., 1] + eps)
    union = area_b + area_q - inter
    iou = np.where(inter > 0, inter / union, 0.0)
    return iou.astype(boxes.dtype)


# ---------------------------------------------------------------------------
# points-in-box tests (for GT database creation / point aug)
# ---------------------------------------------------------------------------

def corner_to_surfaces_3d(corners):
    """[N, 8, 3] corners -> [N, 6, 4, 3] surfaces with outward normals."""
    surfaces = np.array(
        [
            [corners[:, 0], corners[:, 1], corners[:, 2], corners[:, 3]],
            [corners[:, 7], corners[:, 6], corners[:, 5], corners[:, 4]],
            [corners[:, 0], corners[:, 3], corners[:, 7], corners[:, 4]],
            [corners[:, 1], corners[:, 5], corners[:, 6], corners[:, 2]],
            [corners[:, 0], corners[:, 4], corners[:, 5], corners[:, 1]],
            [corners[:, 3], corners[:, 2], corners[:, 6], corners[:, 7]],
        ]
    ).transpose([2, 0, 1, 3])
    return surfaces


def surface_equ_3d(polygon_surfaces):
    """Plane (normal, d) per surface from its first 3 vertices."""
    surface_vec = polygon_surfaces[:, :, :2, :] - polygon_surfaces[:, :, 1:3, :]
    normal_vec = np.cross(surface_vec[:, :, 0, :], surface_vec[:, :, 1, :])
    d = -np.einsum("aij,aij->ai", normal_vec, polygon_surfaces[:, :, 0, :])
    return normal_vec, d


def points_in_convex_polygon_3d(points, polygon_surfaces):
    """points [P,3], polygon_surfaces [N,6,4,3] -> bool [P,N]."""
    normal_vec, d = surface_equ_3d(polygon_surfaces)
    # sign = p . n + d ; inside if <= 0 for all surfaces
    sign = np.einsum("pk,nsk->pns", points[:, :3], normal_vec) + d[None, :, :]
    return np.all(sign < 0, axis=-1)


def points_in_rbbox(points, rbbox, origin=(0.5, 0.5, 0.0)):
    """points [P, >=3], rbbox [N, 7] -> bool [P, N]."""
    rbbox = np.asarray(rbbox)
    if rbbox.shape[0] == 0:
        return np.zeros((points.shape[0], 0), dtype=bool)
    # boxes may carry velocity dims; geometry uses x,y,z,w,l,h,yaw
    if rbbox.shape[-1] > 7:
        rbbox = rbbox[:, [0, 1, 2, 3, 4, 5, rbbox.shape[-1] - 1]]
    rbbox_corners = center_to_corner_box3d(
        rbbox[:, :3], rbbox[:, 3:6], rbbox[:, 6], origin=origin, axis=2
    )
    surfaces = corner_to_surfaces_3d(rbbox_corners)
    return points_in_convex_polygon_3d(points[:, :3], surfaces)


def remove_points_in_boxes(points, boxes):
    masks = points_in_rbbox(points, boxes)
    return points[np.logical_not(masks.any(-1))]


# ---------------------------------------------------------------------------
# anchor grid
# ---------------------------------------------------------------------------

def create_anchors_3d_range(
    feature_size,
    anchor_range,
    sizes=(1.6, 3.9, 1.56),
    rotations=(0, np.pi / 2),
    velocities=None,
    dtype=np.float32,
):
    """Dense anchor grid over a BEV feature map.

    feature_size: [D, H, W] (zyx). Returns [D, H, W, num_size, num_rot, ndim]
    with ndim 7 or 9 (when velocities given). Semantics match the reference
    (x/y centers at stride/2 offsets, z linspace inclusive).
    """
    anchor_range = np.asarray(anchor_range, dtype)
    stride = (anchor_range[3] - anchor_range[0]) / feature_size[2]
    z_centers = np.linspace(anchor_range[2], anchor_range[5], feature_size[0], dtype=dtype)
    y_centers = (
        np.linspace(anchor_range[1], anchor_range[4], feature_size[1], endpoint=False, dtype=dtype)
        + stride / 2
    )
    x_centers = (
        np.linspace(anchor_range[0], anchor_range[3], feature_size[2], endpoint=False, dtype=dtype)
        + stride / 2
    )
    rotations = np.asarray(rotations, dtype=dtype)
    sizes = np.reshape(np.asarray(sizes, dtype=dtype), [-1, 3])
    if velocities is not None:
        velocities = np.asarray(velocities, dtype=dtype).reshape([-1, 2])
        combines = np.hstack([sizes, velocities]).reshape([-1, 5])
    else:
        combines = sizes

    rets = list(np.meshgrid(x_centers, y_centers, z_centers, rotations, indexing="ij"))
    tile_shape = [1] * 5
    tile_shape[-2] = int(sizes.shape[0])
    for i in range(len(rets)):
        rets[i] = np.tile(rets[i][..., np.newaxis, :], tile_shape)
        rets[i] = rets[i][..., np.newaxis]
    combines = np.reshape(combines, [1, 1, 1, -1, 1, combines.shape[-1]])
    tile_size_shape = list(rets[0].shape)
    tile_size_shape[3] = 1
    combines = np.tile(combines, tile_size_shape)
    rets.insert(3, combines)
    ret = np.concatenate(rets, axis=-1)
    # [x, y, z, rot] meshgrid order -> transpose to [z(D), y(H), x(W), size, rot]
    ret = np.transpose(ret, [2, 1, 0, 3, 4, 5])
    # reorder last dim from (x,y,z,(w,l,h,vx,vy),rot) which is already correct
    return ret
