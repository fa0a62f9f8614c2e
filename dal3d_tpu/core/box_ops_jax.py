"""Device-side (JAX) 3D box geometry — jit/vmap-able twins of box_np_ops.

These run inside the jitted train/predict steps (on-device target assignment,
box decode, NMS prep). Numerical parity with ``dal3d_tpu.core.box_np_ops`` is
unit-tested (reference semantics: det3d/core/bbox/box_np_ops.py).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def limit_period(val, offset: float = 0.5, period: float = np.pi):
    return val - jnp.floor(val / period + offset) * period


def second_box_encode(boxes, anchors, encode_angle_to_vector=False, smooth_dim=False):
    """boxes/anchors [..., 7|9] -> encodings [..., code_size]."""
    ndim = anchors.shape[-1]
    xa, ya, za, wa, la, ha = (anchors[..., i] for i in range(6))
    xg, yg, zg, wg, lg, hg = (boxes[..., i] for i in range(6))
    ra, rg = anchors[..., -1], boxes[..., -1]

    diagonal = jnp.sqrt(la**2 + wa**2)
    xt = (xg - xa) / diagonal
    yt = (yg - ya) / diagonal
    zt = (zg - za) / ha
    if smooth_dim:
        lt, wt, ht = lg / la - 1, wg / wa - 1, hg / ha - 1
    else:
        lt, wt, ht = jnp.log(lg / la), jnp.log(wg / wa), jnp.log(hg / ha)
    ret = [xt, yt, zt, wt, lt, ht]
    if ndim > 7:
        ret.append(boxes[..., 6] - anchors[..., 6])
        ret.append(boxes[..., 7] - anchors[..., 7])
    if encode_angle_to_vector:
        ret.extend([jnp.cos(rg) - jnp.cos(ra), jnp.sin(rg) - jnp.sin(ra)])
    else:
        ret.append(rg - ra)
    return jnp.stack(ret, axis=-1)


def second_box_decode(box_encodings, anchors, encode_angle_to_vector=False, smooth_dim=False):
    ndim = anchors.shape[-1]
    xa, ya, za, wa, la, ha = (anchors[..., i] for i in range(6))
    ra = anchors[..., -1]
    xt, yt, zt, wt, lt, ht = (box_encodings[..., i] for i in range(6))

    diagonal = jnp.sqrt(la**2 + wa**2)
    xg = xt * diagonal + xa
    yg = yt * diagonal + ya
    zg = zt * ha + za
    if smooth_dim:
        lg, wg, hg = (lt + 1) * la, (wt + 1) * wa, (ht + 1) * ha
    else:
        lg, wg, hg = jnp.exp(lt) * la, jnp.exp(wt) * wa, jnp.exp(ht) * ha
    ret = [xg, yg, zg, wg, lg, hg]
    if ndim > 7:
        ret.append(box_encodings[..., 6] + anchors[..., 6])
        ret.append(box_encodings[..., 7] + anchors[..., 7])
        ang = box_encodings[..., 8:]
    else:
        ang = box_encodings[..., 6:]
    if encode_angle_to_vector:
        rg = jnp.arctan2(ang[..., 1] + jnp.sin(ra), ang[..., 0] + jnp.cos(ra))
    else:
        rg = ang[..., 0] + ra
    ret.append(rg)
    return jnp.stack(ret, axis=-1)


def center_to_minmax_2d(centers, dims):
    return jnp.concatenate([centers - dims / 2, centers + dims / 2], axis=-1)


def rbbox2d_to_near_bbox(rbboxes):
    """[..., 5] (x,y,w,l,r) -> [..., 4] nearest axis-aligned bbox."""
    rots = rbboxes[..., -1]
    rots_0_pi_div_2 = jnp.abs(limit_period(rots, 0.5, np.pi))
    cond = (rots_0_pi_div_2 > np.pi / 4)[..., None]
    swapped = jnp.stack(
        [rbboxes[..., 0], rbboxes[..., 1], rbboxes[..., 3], rbboxes[..., 2]], axis=-1
    )
    bboxes_center = jnp.where(cond, swapped, rbboxes[..., :4])
    return center_to_minmax_2d(bboxes_center[..., :2], bboxes_center[..., 2:4])


def pairwise_iou_aa(boxes, query_boxes, eps: float = 0.0):
    """Axis-aligned 2D IoU matrix [N, K] of (xmin,ymin,xmax,ymax) boxes."""
    b = boxes[:, None, :]
    q = query_boxes[None, :, :]
    iw = jnp.minimum(b[..., 2], q[..., 2]) - jnp.maximum(b[..., 0], q[..., 0]) + eps
    ih = jnp.minimum(b[..., 3], q[..., 3]) - jnp.maximum(b[..., 1], q[..., 1]) + eps
    inter = jnp.where((iw > 0) & (ih > 0), iw * ih, 0.0)
    area_b = (b[..., 2] - b[..., 0] + eps) * (b[..., 3] - b[..., 1] + eps)
    area_q = (q[..., 2] - q[..., 0] + eps) * (q[..., 3] - q[..., 1] + eps)
    union = area_b + area_q - inter
    return jnp.where(inter > 0, inter / union, 0.0)


def nearest_iou_similarity(boxes1_rbv, boxes2_rbv):
    """NearestIouSimilarity (reference det3d/core/bbox/region_similarity.py:73):
    rotated BEV boxes [N,5]/[K,5] -> axis-aligned-nearest IoU matrix [N,K]."""
    bv1 = rbbox2d_to_near_bbox(boxes1_rbv)
    bv2 = rbbox2d_to_near_bbox(boxes2_rbv)
    return pairwise_iou_aa(bv1, bv2, eps=0.0)


def corners_2d(boxes_bev):
    """Rotated BEV boxes [..., 5] (x,y,w,l,r) -> corners [..., 4, 2].

    Corner order counterclockwise, matching box_np_ops.center_to_corner_box2d.
    """
    x, y, w, l, r = (boxes_bev[..., i] for i in range(5))
    # corners_nd order for 2D: [(-.5,-.5), (-.5,.5), (.5,.5), (.5,-.5)] * (w,l)
    dx = jnp.stack([-w / 2, -w / 2, w / 2, w / 2], axis=-1)
    dy = jnp.stack([-l / 2, l / 2, l / 2, -l / 2], axis=-1)
    cos, sin = jnp.cos(r)[..., None], jnp.sin(r)[..., None]
    cx = dx * cos + dy * sin
    cy = -dx * sin + dy * cos
    # NOTE: reference rotation_2d uses R^T = [[c,-s],[s,c]] applied as p @ R^T:
    #   x' = x*c + y*s ; y' = -x*s + y*c
    return jnp.stack([cx + x[..., None], cy + y[..., None]], axis=-1)
