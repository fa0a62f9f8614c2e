"""KITTI-style AP evaluation (BEV + 3D).

Compact native re-design of the reference's numba eval harness
(det3d/datasets/utils/kitti_object_eval_python): AP-40 over score thresholds
with rotated-BEV / 3D IoU matching (greedy by confidence per frame), per-class
IoU thresholds (Car 0.7, Pedestrian/Cyclist 0.5). Works on lidar-frame
[N, 9] boxes; difficulty binning is omitted (single 'overall' bin) — the
nuScenes devkit remains the primary metric oracle for this project.
"""
from __future__ import annotations

from typing import Dict, List

import numpy as np

from ..core import box_np_ops

IOU_THRESH = {"Car": 0.7, "car": 0.7}
DEFAULT_IOU = 0.5


def _bev_iou(boxes1: np.ndarray, boxes2: np.ndarray) -> np.ndarray:
    """Rotated BEV IoU via the host polygon clipper (exact)."""
    if len(boxes1) == 0 or len(boxes2) == 0:
        return np.zeros((len(boxes1), len(boxes2)))
    import jax.numpy as jnp

    from ..ops.rotated_iou import rotated_iou_matrix

    b1 = boxes1[:, [0, 1, 3, 4, 8]]
    b2 = boxes2[:, [0, 1, 3, 4, 8]]
    return np.asarray(rotated_iou_matrix(jnp.asarray(b1), jnp.asarray(b2)))


def _3d_iou(boxes1: np.ndarray, boxes2: np.ndarray) -> np.ndarray:
    if len(boxes1) == 0 or len(boxes2) == 0:
        return np.zeros((len(boxes1), len(boxes2)))
    import jax.numpy as jnp

    from ..ops.rotated_iou import boxes_iou3d

    return np.asarray(boxes_iou3d(jnp.asarray(boxes1), jnp.asarray(boxes2)))


def _ap40(matched_flags: np.ndarray, scores: np.ndarray, n_gt: int) -> float:
    """AP with 40 recall positions (KITTI 2019 metric)."""
    if n_gt == 0 or len(scores) == 0:
        return 0.0
    order = np.argsort(-scores)
    tp = matched_flags[order].astype(np.float64)
    fp = 1.0 - tp
    tp_cum, fp_cum = np.cumsum(tp), np.cumsum(fp)
    recall = tp_cum / n_gt
    precision = tp_cum / np.maximum(tp_cum + fp_cum, 1e-9)
    ap = 0.0
    for r in np.linspace(0.025, 1.0, 40):
        mask = recall >= r
        ap += (precision[mask].max() if mask.any() else 0.0) / 40
    return float(ap)


def kitti_eval(gt_frames: List[dict], pred_frames: List[dict], class_names: List[str]) -> Dict:
    """gt/pred_frames: per frame {boxes [N,9], names [N], (scores)}."""
    results = {}
    for cls in class_names:
        thr = IOU_THRESH.get(cls, DEFAULT_IOU)
        for metric, iou_fn in (("bev", _bev_iou), ("3d", _3d_iou)):
            all_scores, all_matched = [], []
            n_gt = 0
            for gt, pred in zip(gt_frames, pred_frames):
                gmask = np.asarray(gt["names"]) == cls
                pmask = np.asarray(pred["names"]) == cls
                gboxes = np.asarray(gt["boxes"])[gmask]
                pboxes = np.asarray(pred["boxes"])[pmask]
                pscores = np.asarray(pred["scores"])[pmask]
                n_gt += len(gboxes)
                if len(pboxes) == 0:
                    continue
                iou = iou_fn(pboxes, gboxes)
                matched = np.zeros(len(pboxes), bool)
                taken = np.zeros(len(gboxes), bool)
                for pi in np.argsort(-pscores):
                    if len(gboxes) == 0:
                        break
                    gi = int(np.argmax(np.where(taken, -1.0, iou[pi])))
                    if not taken[gi] and iou[pi, gi] >= thr:
                        matched[pi] = True
                        taken[gi] = True
                all_scores.append(pscores)
                all_matched.append(matched)
            scores = np.concatenate(all_scores) if all_scores else np.zeros(0)
            matched = np.concatenate(all_matched) if all_matched else np.zeros(0, bool)
            results[f"{cls}_{metric}_AP40"] = _ap40(matched, scores, n_gt)
    results["mAP_bev"] = float(np.mean([v for k, v in results.items() if k.endswith("bev_AP40")]))
    results["mAP_3d"] = float(np.mean([v for k, v in results.items() if k.endswith("3d_AP40")]))
    return {"results": results}
