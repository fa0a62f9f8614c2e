"""Shared predict-over-dataset + metric evaluation.

Used by the in-training val workflow (reference trainer.py:453 Trainer.val +
trainer.py:526 run with workflow [('train', N), ('val', 1)]) and by
tools/dist_test.py. Detections are gathered host-side per frame token; the
metric oracle is dataset.evaluation (nuScenes devkit when importable) plus a
kitti-style AP-40 sweep against the val infos' gt boxes, which is what makes
synthetic-data runs produce an assertable detection-quality number.
"""
from __future__ import annotations

import logging
from typing import Callable, Dict, Optional

import numpy as np


def predict_dataset(
    predict: Callable,
    params,
    batch_stats,
    loader,
    logger: Optional[logging.Logger] = None,
    log_every: int = 0,
) -> Dict[str, dict]:
    """Run the jitted predict step over a loader; returns token->detection."""
    detections: Dict[str, dict] = {}
    n_done = 0
    for batch in loader:
        # host-voxelized batches: skip the raw-point H2D payload entirely
        from ..ops.sparse_brick import host_plan_batch_keys

        feed_keys = (
            ("voxel_features", "voxel_coords", "voxel_valid")
            + host_plan_batch_keys(batch)
            if "voxel_features" in batch else ("points", "points_valid")
        )
        out = predict(params, batch_stats, {k: batch[k] for k in feed_keys if k in batch})
        out = {k: np.asarray(v) for k, v in out.items()}
        for i, md in enumerate(batch["metadata"]):
            token = md.get("token", str(n_done))
            if token in detections:
                continue  # padded repeat at the tail
            detections[token] = {
                "box3d_lidar": out["box3d_lidar"][i],
                "scores": out["scores"][i],
                "label_preds": out["label_preds"][i],
                "det_valid": out["det_valid"][i],
            }
            n_done += 1
        if logger is not None and log_every and n_done % log_every < len(batch["metadata"]):
            logger.info(f"scored {n_done} frames")
    return detections


def kitti_style_eval(dataset, detections: Dict[str, dict]) -> Dict[str, float]:
    """AP-40 BEV/3D vs the dataset infos' gt boxes (tokens aligned)."""
    from ..eval.kitti_eval import kitti_eval
    from ..eval.matched_iou import detections_to_frames, infos_to_frames

    labeled = [i for i in dataset.infos if i.get("gt_boxes") is not None]
    if not labeled:
        return {}
    gt_map = infos_to_frames(labeled)
    pred_map = detections_to_frames(detections, list(dataset.class_names))
    tokens = [t for t in gt_map if t in pred_map]
    if not tokens:
        return {}
    gt_frames = [gt_map[t] for t in tokens]
    pred_frames = [pred_map[t] for t in tokens]
    present = {str(n) for g in gt_frames for n in g["names"]}
    classes = [c for c in dataset.class_names if c in present] or list(dataset.class_names)
    return kitti_eval(gt_frames, pred_frames, classes)["results"]


def evaluate_dataset(
    predict: Callable,
    params,
    batch_stats,
    dataset,
    loader,
    output_dir: str,
    logger: Optional[logging.Logger] = None,
    testset: bool = False,
) -> Dict:
    """Predict + both metric paths; the reference's Trainer.val equivalent."""
    detections = predict_dataset(predict, params, batch_stats, loader, logger)
    result = dataset.evaluation(detections, output_dir=output_dir, testset=testset)
    if not testset:
        ap = kitti_style_eval(dataset, detections)
        if ap:
            result = dict(result or {})
            result["kitti_style"] = {
                k: round(float(v), 4) for k, v in ap.items() if k.startswith("mAP")
            }
    return result
