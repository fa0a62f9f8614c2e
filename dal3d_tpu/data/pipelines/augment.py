"""Host-side (numpy) point/box augmentation primitives.

Behavioral parity with det3d/core/sampler/preprocess.py:
- random_flip_both (:829-854): independent y-axis then x-axis flips (p=0.5),
- global_rotation (:796-813): shared z-rotation of points, box centers,
  velocities; yaw += angle,
- global_scaling_v2 (:857-861): uniform scale of everything but yaw,
- global_translate (:962-985): gaussian translation (configured but unused by
  the reference Preprocess — kept for completeness),
- noise_per_object (:*): per-object jitter — identity under the canonical
  configs (gt_loc_noise = 0, gt_rot_noise = 0), implemented as the simplified
  zero-noise-aware version.

All functions mutate copies and return (gt_boxes, points).
"""
from __future__ import annotations

import numpy as np

from ...core import box_np_ops


def _rot_z(pts, angle):
    c, s = np.cos(angle), np.sin(angle)
    rot = np.array([[c, -s], [s, c]], dtype=pts.dtype)
    out = pts.copy()
    out[:, :2] = pts[:, :2] @ rot  # x' = x c + y s ; y' = -x s + y c
    return out


def random_flip_both(gt_boxes, points, probability=0.5, rng=None, record=None):
    rng = rng or np.random
    if rng.uniform() < probability:  # y := -y
        gt_boxes[:, 1] = -gt_boxes[:, 1]
        gt_boxes[:, -1] = -gt_boxes[:, -1] + np.pi
        points[:, 1] = -points[:, 1]
        if gt_boxes.shape[1] > 7:
            gt_boxes[:, 7] = -gt_boxes[:, 7]
        if record is not None:
            record["flip_y"] = True
    if rng.uniform() < probability:  # x := -x
        gt_boxes[:, 0] = -gt_boxes[:, 0]
        points[:, 0] = -points[:, 0]
        gt_boxes[:, -1] = -gt_boxes[:, -1] + 2 * np.pi
        if gt_boxes.shape[1] > 7:
            gt_boxes[:, 6] = -gt_boxes[:, 6]
        if record is not None:
            record["flip_x"] = True
    return gt_boxes, points


def global_rotation(gt_boxes, points, rotation=(-np.pi / 4, np.pi / 4), rng=None, record=None):
    rng = rng or np.random
    if not isinstance(rotation, (list, tuple, np.ndarray)):
        rotation = (-rotation, rotation)
    angle = rng.uniform(rotation[0], rotation[1])
    if record is not None:
        record["rotation"] = float(angle)
    points[:, :2] = _rot_z(points[:, :3], angle)[:, :2]
    gt_boxes[:, :2] = _rot_z(gt_boxes[:, :3], angle)[:, :2]
    if gt_boxes.shape[1] > 7:
        gt_boxes[:, 6:8] = _rot_z(
            np.hstack([gt_boxes[:, 6:8], np.zeros((gt_boxes.shape[0], 1), gt_boxes.dtype)]), angle
        )[:, :2]
    gt_boxes[:, -1] += angle
    return gt_boxes, points


def global_scaling_v2(gt_boxes, points, min_scale=0.95, max_scale=1.05, rng=None, record=None):
    rng = rng or np.random
    s = rng.uniform(min_scale, max_scale)
    if record is not None:
        record["scale"] = float(s)
    points[:, :3] *= s
    gt_boxes[:, :-1] *= s
    return gt_boxes, points


def global_translate(gt_boxes, points, noise_std=(0.2, 0.2, 0.2), rng=None):
    rng = rng or np.random
    noise_std = np.asarray(noise_std, np.float64)
    if np.all(noise_std == 0):
        return gt_boxes, points
    t = np.array([rng.normal(0, noise_std[0]), rng.normal(0, noise_std[1]), rng.normal(0, noise_std[2])])
    points[:, :3] += t
    gt_boxes[:, :3] += t
    return gt_boxes, points


def noise_per_object(gt_boxes, points, valid_mask=None, rotation_perturb=(0.0, 0.0),
                     center_noise_std=(0.0, 0.0, 0.0), num_try=100, rng=None):
    """Per-object pose jitter. Identity when all noise magnitudes are zero
    (the canonical CBGS configs)."""
    if (np.all(np.asarray(rotation_perturb) == 0) and np.all(np.asarray(center_noise_std) == 0)):
        return gt_boxes, points
    rng = rng or np.random
    # simplified: jitter each box center/yaw and move its interior points with it
    n = gt_boxes.shape[0]
    if valid_mask is None:
        valid_mask = np.ones(n, bool)
    masks = box_np_ops.points_in_rbbox(points, gt_boxes)
    for i in range(n):
        if not valid_mask[i]:
            continue
        loc_noise = rng.normal(0, np.asarray(center_noise_std))
        rot_noise = rng.uniform(rotation_perturb[0], rotation_perturb[1])
        sel = masks[:, i]
        pts = points[sel]
        pts[:, :3] -= gt_boxes[i, :3]
        pts[:, :2] = _rot_z(pts[:, :3], rot_noise)[:, :2]
        pts[:, :3] += gt_boxes[i, :3] + loc_noise
        points[sel] = pts
        gt_boxes[i, :3] += loc_noise
        gt_boxes[i, -1] += rot_noise
    return gt_boxes, points
