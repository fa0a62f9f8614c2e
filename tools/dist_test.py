#!/usr/bin/env python
"""Evaluation driver (reference tools/dist_test.py:61-186).

Shards val frames over the device mesh via the batched predict step, gathers
per-frame detections, and runs dataset.evaluation (nuScenes devkit when
available; otherwise writes the submission json). The reference's per-rank
pickle all_gather collapses to jax process gather (single-program here).
"""
import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dal3d_tpu.utils.platform import setup_jax


def parse_args():
    p = argparse.ArgumentParser(description="Evaluate a detector")
    p.add_argument("config")
    p.add_argument("--checkpoint", required=True, help="work_dir with checkpoints")
    p.add_argument("--out", help="pkl file to dump raw detections")
    p.add_argument("--work_dir", default=None)
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--testset", action="store_true")
    p.add_argument("--cpu", action="store_true")
    return p.parse_args()


def main():
    args = parse_args()
    jax = setup_jax(force_cpu=args.cpu)
    import numpy as np

    from dal3d_tpu.data import DataLoader, NuScenesDataset
    from dal3d_tpu.models.builder import build_detector, host_voxelize_cfg
    from dal3d_tpu.runtime import checkpoint as ckpt
    from dal3d_tpu.runtime.steps import create_train_state
    from dal3d_tpu.solver.optim import OneCycleSchedule, build_optimizer
    from dal3d_tpu.utils import Config, get_root_logger

    cfg = Config.fromfile(args.config)
    work_dir = args.work_dir or cfg.work_dir
    os.makedirs(work_dir, exist_ok=True)
    logger = get_root_logger(os.path.join(work_dir, "test.log"))

    from dal3d_tpu.models.builder import eval_test_cfg

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
        voxelize_host=host_voxelize_cfg(cfg),
        test_mode=True,
    )
    batch_size = args.batch_size or cfg.data.get("samples_per_gpu", 2) * jax.device_count()
    loader = DataLoader(dataset, batch_size, shuffle=False, drop_last=False)

    optimizer = build_optimizer(OneCycleSchedule(total_steps=1))
    sample = next(iter(DataLoader(dataset, batch_size, shuffle=False)))
    import jax.random as jrandom

    state = create_train_state(bundle, optimizer, jrandom.PRNGKey(0), sample)
    state, meta = ckpt.load_checkpoint(args.checkpoint, state)
    logger.info(f"loaded checkpoint epoch {meta.get('epoch')}")
    from dal3d_tpu.parallel.mesh import sharded_eval_predict

    predict, mesh = sharded_eval_predict(bundle, logger)

    from dal3d_tpu.runtime.evaluation import predict_dataset

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
        from dal3d_tpu.runtime.evaluation import kitti_style_eval

        ap = kitti_style_eval(dataset, detections)
        if ap:
            result = dict(result or {})
            result["kitti_style"] = {
                k: round(float(v), 4) for k, v in ap.items() if k.startswith("mAP")
            }
    logger.info(f"evaluation: {result}")


if __name__ == "__main__":
    main()
