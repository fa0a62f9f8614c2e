"""IoU estimators for the partial-label AL pipeline.

Re-design of det3d/models/detectors/estimator.py:343 (Estimator) /
pp_estimator.py (PPEstimator): a second network that predicts the quality
(3D IoU vs. GT) of a detector's boxes from the raw points around each box.
The reference builds on CUDA roipool3d + rroi_align + pointnet2 interpolate;
here box-local point pooling is a fixed-shape masked gather (points-in-box
test on device) followed by a PointNet-style MLP + max-pool, and the 3-NN
machinery lives in ops.pointnet.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...core import box_ops_jax
from ..registry import DETECTORS


def points_in_box_pool(points, points_valid, boxes, max_pts: int = 128, expand: float = 1.0):
    """For each box [K, 9], gather up to max_pts interior points (canonical
    box frame). Returns ([K, max_pts, 4], [K, max_pts] mask): xyz in the box
    frame + intensity. Fixed shapes via top_k over an interior score
    (replacing the reference's roipool3d CUDA kernel)."""
    K = boxes.shape[0]
    xy = points[:, :2]
    rel = xy[None, :, :] - boxes[:, None, :2]  # [K, P, 2]
    cos, sin = jnp.cos(boxes[:, -1]), jnp.sin(boxes[:, -1])
    lx = rel[..., 0] * cos[:, None] + rel[..., 1] * sin[:, None]
    ly = -rel[..., 0] * sin[:, None] + rel[..., 1] * cos[:, None]
    lz = points[None, :, 2] - boxes[:, None, 2]
    inside = (
        (jnp.abs(lx) <= boxes[:, None, 3] * expand / 2)
        & (jnp.abs(ly) <= boxes[:, None, 4] * expand / 2)
        & (lz >= 0) & (lz <= boxes[:, None, 5] * expand)
        & points_valid[None, :]
    )
    score = jnp.where(inside, 1.0, 0.0) - jnp.arange(points.shape[0])[None, :] * 1e-9
    _, idx = jax.lax.top_k(score, max_pts)  # [K, max_pts]
    mask = jnp.take_along_axis(inside, idx, axis=1)
    feat = jnp.stack(
        [
            jnp.take_along_axis(lx, idx, axis=1),
            jnp.take_along_axis(ly, idx, axis=1),
            jnp.take_along_axis(lz, idx, axis=1),
            points[idx, 3] if points.shape[1] > 3 else jnp.zeros_like(lx[:, :max_pts]),
        ],
        axis=-1,
    )
    return jnp.where(mask[..., None], feat, 0.0), mask


@DETECTORS.register_module
class Estimator(nn.Module):
    """Box-quality (IoU) estimator: pooled box points + box geometry -> IoU."""

    max_pts: int = 128
    hidden: Tuple[int, ...] = (64, 128)

    @nn.compact
    def __call__(self, points, points_valid, boxes, train: bool = False):
        """points [B, P, F], boxes [B, K, 9] -> predicted IoU [B, K] in [0,1]."""

        def per_sample(pts, pv, bxs):
            feat, mask = points_in_box_pool(pts, pv, bxs, self.max_pts)
            return feat, mask

        feat, mask = jax.vmap(per_sample)(points, points_valid, boxes)
        x = feat
        for h in self.hidden:
            x = nn.Dense(h)(x)
            x = nn.relu(x)
        x = jnp.where(mask[..., None], x, -1e9).max(axis=2)  # [B, K, C]
        x = jnp.where(jnp.isfinite(x), x, 0.0)
        geom = jnp.concatenate([boxes[..., 3:6], jnp.cos(boxes[..., -1:]), jnp.sin(boxes[..., -1:])], -1)
        x = jnp.concatenate([x, geom], axis=-1)
        x = nn.relu(nn.Dense(128)(x))
        iou = nn.Dense(1)(x)[..., 0]
        return jax.nn.sigmoid(iou)


@DETECTORS.register_module
class PPEstimator(Estimator):
    """PointPillars-flavored estimator (reference pp_estimator.py) — same
    quality-regression contract, shallower pooling."""

    max_pts: int = 64
    hidden: Tuple[int, ...] = (64,)
