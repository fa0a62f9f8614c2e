"""Lyft Level-5 evaluation score (kaggle 3D-detection metric).

Re-implementation of the reference's Lyft eval semantics
(det3d/datasets/lyft/eval.py:43-95 ``get_lyft_eval_result``): for each of 10
IoU thresholds (0.5 : 0.05 : 0.95), confidence-greedy match detections to
same-class GTs by 3D IoU in the LIDAR frame, then score

    S = mean over thresholds, frames of  TP / (TP + FP + FN)

with TP/FP/FN summed over classes within a frame. (The reference's in-repo
copy is actually unrunnable — it ships a leftover ``pdb.set_trace()`` at
eval.py:86 — so this module is the working replacement, validated against
hand-traced fixtures in tests/test_lyft_eval.py.)

Boxes are lidar-frame [N, >=7] (x, y, z, w, l, h, ..., yaw) with z = bottom
center (the project-wide convention, ops/rotated_iou.boxes_iou3d).
"""
from __future__ import annotations

from typing import Dict, List

import numpy as np


def _iou3d(pred: np.ndarray, gt: np.ndarray) -> np.ndarray:
    if len(pred) == 0 or len(gt) == 0:
        return np.zeros((len(pred), len(gt)))
    import jax.numpy as jnp

    from ..ops.rotated_iou import boxes_iou3d

    return np.asarray(boxes_iou3d(jnp.asarray(pred), jnp.asarray(gt)))


def _match_counts(iou: np.ndarray, scores: np.ndarray, thr: float):
    """Confidence-greedy matching (one GT per det). Returns (tp, fp, fn)."""
    n_pred, n_gt = iou.shape
    taken = np.zeros(n_gt, bool)
    tp = 0
    for pi in np.argsort(-scores):
        row = np.where(taken, -1.0, iou[pi])
        if n_gt and row.max() >= thr:
            taken[int(np.argmax(row))] = True
            tp += 1
    return tp, n_pred - tp, n_gt - tp


def lyft_eval(gt_frames: List[dict], pred_frames: List[dict],
              class_names: List[str]) -> Dict:
    """gt/pred_frames: per frame {boxes [N,>=7], names [N], (scores [N])}."""
    thresholds = np.arange(0.5, 1.0, 0.05)
    per_thr = np.zeros((len(thresholds), len(gt_frames)))
    for fi, (gt, pred) in enumerate(zip(gt_frames, pred_frames)):
        gnames = np.asarray(gt["names"])
        pnames = np.asarray(pred["names"])
        gboxes = np.asarray(gt["boxes"], np.float64).reshape(len(gnames), -1)
        pboxes = np.asarray(pred["boxes"], np.float64).reshape(len(pnames), -1)
        pscores = np.asarray(pred.get("scores", np.ones(len(pnames))))
        counts = np.zeros((len(thresholds), 3))
        for cls in class_names:
            gm, pm = gnames == cls, pnames == cls
            iou = _iou3d(pboxes[pm], gboxes[gm])
            for k, thr in enumerate(thresholds):
                counts[k] += _match_counts(iou, pscores[pm], thr)
        tp, fp, fn = counts[:, 0], counts[:, 1], counts[:, 2]
        denom = tp + fp + fn
        per_thr[:, fi] = np.where(denom > 0, tp / np.maximum(denom, 1), 0.0)
    score = float(per_thr.mean()) if per_thr.size else 0.0
    return {
        "lyft_score": score,
        "per_threshold": {f"{t:.2f}": float(per_thr[k].mean())
                          for k, t in enumerate(thresholds)},
    }
