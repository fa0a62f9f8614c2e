"""On-device (jitted, batched) anchor->GT target assignment.

TPU-first re-design of the reference's CPU/numba target assignment
(det3d/core/anchor/target_ops.py:28-222 + target_assigner.py:68-142): instead
of assigning inside data-loader worker processes, the whole assignment is a
fixed-shape XLA function that runs inside the train step, vmapped over
(batch, class). GT boxes arrive as padded [G_max, ndim] arrays with a validity
mask.

Semantics preserved exactly (unit-tested against a numpy port):
- per-class assignment against that class's own anchor block,
- bidirectional argmax with force-matching of each GT's best anchors
  (ties included; zero-overlap GTs never force-match),
- thresholds: >= matched -> positive, < unmatched -> background (0),
  in-between -> ignore (-1); force-match overrides background,
- regression targets encoded for positives only; reg weight 1 for positives,
- empty GT set -> all labels 0.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from . import box_ops_jax
from .anchors import TaskAnchors
from .box_coders import GroundBox3dCoder

_NEG = -1e8


def assign_one_class(
    anchors: jnp.ndarray,  # [A, ndim]
    gt_boxes: jnp.ndarray,  # [G, ndim] padded
    gt_valid: jnp.ndarray,  # [G] bool: valid AND belongs to this class
    class_id: jnp.ndarray,  # scalar int (task-local, 1-based)
    matched_threshold: jnp.ndarray,
    unmatched_threshold: jnp.ndarray,
    vec_encode: bool = True,
):
    anchors_rbv = anchors[:, jnp.array([0, 1, 3, 4, anchors.shape[1] - 1])]
    gt_rbv = gt_boxes[:, jnp.array([0, 1, 3, 4, gt_boxes.shape[1] - 1])]
    S = box_ops_jax.nearest_iou_similarity(anchors_rbv, gt_rbv)  # [A, G]
    S = jnp.where(gt_valid[None, :], S, _NEG)

    a2g_argmax = jnp.argmax(S, axis=1)  # ties -> first (matches numpy)
    a2g_max = jnp.max(S, axis=1)
    g2a_max = jnp.max(S, axis=0)
    # GTs with zero best overlap (or invalid) never force-match
    g2a_ok = g2a_max > 0
    force = jnp.any((S == g2a_max[None, :]) & g2a_ok[None, :], axis=1)

    pos = a2g_max >= matched_threshold
    bg = a2g_max < unmatched_threshold

    labels = jnp.full(anchors.shape[0], -1, dtype=jnp.int32)
    labels = jnp.where(bg, 0, labels)
    labels = jnp.where(pos | force, class_id.astype(jnp.int32), labels)
    labels = jnp.where(jnp.any(gt_valid), labels, 0)

    matched_gt = jnp.nan_to_num(gt_boxes[a2g_argmax])
    targets = box_ops_jax.second_box_encode(matched_gt, anchors, encode_angle_to_vector=vec_encode)
    fg = labels > 0
    targets = jnp.where(fg[:, None], targets, 0.0)
    reg_weights = fg.astype(jnp.float32)
    return labels, targets, reg_weights


@dataclass
class DeviceTargetAssigner:
    """Batched multi-task assignment bound to static anchor bundles."""

    task_anchors: List[TaskAnchors]
    box_coder: GroundBox3dCoder

    def assign_task(self, task_idx: int, gt_boxes, gt_classes):
        """Single-sample assignment for one task.

        gt_boxes: [G, ndim] padded; gt_classes: [G] task-local 1-based
        (0 = padding / not in task). Returns interleaved flat
        labels [L*C*R], targets [L*C*R, code], reg_weights [L*C*R].
        """
        ta = self.task_anchors[task_idx]
        C, R = ta.num_classes, ta.num_rot
        anchors_by_class = jnp.asarray(ta.anchors_by_class)  # [C, A_c, ndim]
        class_ids = jnp.arange(1, C + 1)
        gt_valid = gt_classes[None, :] == class_ids[:, None]  # [C, G]

        labels, targets, rw = jax.vmap(
            lambda a, v, cid, mt, ut: assign_one_class(
                a, gt_boxes, v, cid, mt, ut, vec_encode=self.box_coder.vec_encode
            )
        )(
            anchors_by_class,
            gt_valid,
            class_ids,
            jnp.asarray(ta.matched_thresholds),
            jnp.asarray(ta.unmatched_thresholds),
        )
        # interleave [C, L*R(, code)] -> (L, C, R(, code)) flat
        L = int(np.prod(ta.feature_map_size))
        code = targets.shape[-1]
        labels = labels.reshape(C, L, R).transpose(1, 0, 2).reshape(-1)
        targets = targets.reshape(C, L, R, code).transpose(1, 0, 2, 3).reshape(-1, code)
        rw = rw.reshape(C, L, R).transpose(1, 0, 2).reshape(-1)
        return labels, targets, rw

    def assign_all(self, gt_boxes_by_task, gt_classes_by_task):
        """Batched assignment across tasks.

        gt_boxes_by_task: list per task of [B, G, ndim];
        gt_classes_by_task: list per task of [B, G].
        Returns (labels, reg_targets, reg_weights) lists per task with
        leading batch dims: [B, A], [B, A, code], [B, A].
        """
        out_labels, out_targets, out_rw = [], [], []
        for t in range(len(self.task_anchors)):
            f = jax.vmap(lambda b, c, t=t: self.assign_task(t, b, c))
            l, tg, w = f(gt_boxes_by_task[t], gt_classes_by_task[t])
            out_labels.append(l)
            out_targets.append(tg)
            out_rw.append(w)
        return out_labels, out_targets, out_rw
