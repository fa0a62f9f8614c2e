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


def run_eval_cli(args) -> Dict:
    """Shared body of tools/test.py and tools/dist_test.py.

    The reference keeps two drivers (tools/test.py single-process vs
    tools/dist_test.py DDP, dist_test.py:61-186); JAX's single-program model
    collapses them — the mesh-sharded predict already shards frames over all
    local devices — so both CLIs delegate here. `args` needs: config,
    checkpoint, torch_init (optional), out, work_dir, batch_size, testset.
    """
    import os
    import pickle

    import jax
    import jax.random as jrandom

    from ..data import DataLoader, NuScenesDataset
    from ..models.builder import (build_detector, eval_test_cfg,
                                  loader_voxelize_cfg)
    from ..parallel.mesh import sharded_eval_predict
    from ..solver.optim import OneCycleSchedule, build_optimizer
    from ..utils import Config, get_root_logger
    from . import checkpoint as ckpt
    from .steps import create_train_state

    cfg = Config.fromfile(args.config)
    work_dir = args.work_dir or cfg.work_dir
    os.makedirs(work_dir, exist_ok=True)
    logger = get_root_logger(os.path.join(work_dir, "test.log"))

    bundle = build_detector(cfg, test_cfg=eval_test_cfg(cfg, logger))
    val = dict(cfg.data["val"])
    dataset = NuScenesDataset(
        info_path=val["info_path"],
        root_path=val.get("root_path", ""),
        nsweeps=val.get("nsweeps", 10),
        class_names=val.get("class_names"),
        pipeline=[dict(s) for s in val.get("pipeline", [])],
        tasks=[dict(t) for t in cfg.tasks],
        max_points=cfg.get("max_points", 300000),
        voxelize_host=loader_voxelize_cfg(cfg),
        test_mode=True,
    )
    batch_size = args.batch_size or cfg.data.get("samples_per_gpu", 2) * jax.device_count()
    loader = DataLoader(dataset, batch_size, shuffle=False, drop_last=False)

    optimizer = build_optimizer(OneCycleSchedule(total_steps=1))
    sample = next(iter(DataLoader(dataset, batch_size, shuffle=False)))
    state = create_train_state(bundle, optimizer, jrandom.PRNGKey(0), sample)
    if getattr(args, "torch_init", None):
        from ..models.convert_second import apply_torch_init

        impl = cfg["model"]["backbone"].get("impl", "gather")
        state = apply_torch_init(state, args.torch_init, impl, logger=logger)
        logger.info(f"initialized from converted torch checkpoint {args.torch_init}")
    elif args.checkpoint:
        state, meta = ckpt.load_checkpoint(args.checkpoint, state)
        logger.info(f"loaded checkpoint epoch {meta.get('epoch')}")
    else:
        raise SystemExit("one of --checkpoint / --torch_init is required")

    predict, mesh = sharded_eval_predict(bundle, logger)
    detections = predict_dataset(
        predict, state.params, state.batch_stats, loader, logger=logger,
        log_every=max(len(dataset) // 10, 1),
    )
    if args.out:
        with open(args.out, "wb") as f:
            pickle.dump(detections, f)
        logger.info(f"raw detections -> {args.out}")

    result = dataset.evaluation(detections, output_dir=work_dir, testset=args.testset)
    if not args.testset:
        ap = kitti_style_eval(dataset, detections)
        if ap:
            result = dict(result or {})
            result["kitti_style"] = {
                k: round(float(v), 4) for k, v in ap.items() if k.startswith("mAP")
            }
    logger.info(f"evaluation: {result}")
    return result


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
