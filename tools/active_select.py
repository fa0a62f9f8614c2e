#!/usr/bin/env python
"""Active-learning selection driver.

CLI/flow parity with the reference tools/active_select.py:74-167:
- first round (buffer file missing): initialize {"0": []} and exit,
- otherwise: build detector + pool dataloader (val pipeline over the TRAIN
  pool infos), load checkpoint, build the selector, run selection, dump the
  updated buffer JSON + the selected infos subset pkl.

Model-based selectors score the pool through the jitted predict step (the
``estimate=True`` contract); scoring shards frames over the device mesh.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dal3d_tpu.utils.platform import setup_jax

MODEL_BASED = {
    "FeatureSelector", "EntropySelector", "BadgeSelector", "UWESelector",
    "PPALSelector", "SpatialFeatureSelector", "SpatialTemporalFeatureSelector",
}


def parse_args():
    p = argparse.ArgumentParser(description="Active-learning sample selection")
    p.add_argument("config", help="config file path")
    p.add_argument("--checkpoint", help="trained checkpoint work_dir (model-based selectors)")
    p.add_argument(
        "--force_random", action="store_true",
        help="override the configured selector with RandomSelector (seed round: "
        "the reference flow trains on a random seed buffer before the first "
        "model-based selection, README.md:34-75)",
    )
    p.add_argument("--seed", type=int, default=3407)
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--cpu", action="store_true")
    return p.parse_args()


def init_sample_dataset(buffer_file: str):
    from dal3d_tpu.utils.fileio import dump

    dump({"0": []}, buffer_file)


def main():
    args = parse_args()
    jax = setup_jax(force_cpu=args.cpu)
    import random

    import numpy as np

    from dal3d_tpu.utils import Config, get_root_logger

    random.seed(args.seed)
    np.random.seed(args.seed)

    cfg = Config.fromfile(args.config)
    logger = get_root_logger(None, cfg.get("log_level", "INFO"))
    sel_cfg = dict(cfg.selector)

    buffer_file = sel_cfg["buffer_file"]
    if not os.path.exists(buffer_file):
        init_sample_dataset(buffer_file)
        logger.info(f"initialized empty AL buffer at {buffer_file}; run round 0 training first")
        return

    if args.force_random:
        sel_cfg = {
            "type": "RandomSelector",
            **{k: sel_cfg[k] for k in (
                "budget", "buffer_file", "dump_file_name", "infos_origin",
                "cost_b", "cost_f",
            ) if k in sel_cfg},
        }

    selector_type = sel_cfg.get("type")
    score_fn = None
    dataloader = None
    if selector_type in MODEL_BASED and not (
        sel_cfg.get("pred_store_file") and os.path.exists(sel_cfg["pred_store_file"])
    ):
        from dal3d_tpu.data import DataLoader, NuScenesDataset
        from dal3d_tpu.models.builder import build_detector, loader_voxelize_cfg
        from dal3d_tpu.runtime import checkpoint as ckpt
        from dal3d_tpu.runtime.steps import create_train_state
        from dal3d_tpu.solver.optim import OneCycleSchedule, build_optimizer

        bundle = build_detector(cfg)
        # pool dataset: val pipeline, TRAIN pool infos (reference :122-123)
        val_data = dict(cfg.data["val"])
        dataset = NuScenesDataset(
            info_path=sel_cfg["infos_origin"],
            root_path=val_data.get("root_path", ""),
            nsweeps=val_data.get("nsweeps", 10),
            class_names=val_data.get("class_names"),
            pipeline=[dict(s) for s in val_data.get("pipeline", [])],
            tasks=[dict(t) for t in cfg.tasks],
            max_points=cfg.get("max_points", 300000),
            voxelize_host=loader_voxelize_cfg(cfg),
            test_mode=True,
        )
        batch_size = args.batch_size or cfg.data.get("samples_per_gpu", 2) * jax.device_count()
        loader = DataLoader(dataset, batch_size, shuffle=False, drop_last=False)
        optimizer = build_optimizer(OneCycleSchedule(total_steps=1))
        sample = next(iter(DataLoader(dataset, batch_size, shuffle=False)))
        import jax.random as jrandom

        state = create_train_state(bundle, optimizer, jrandom.PRNGKey(0), sample)
        assert args.checkpoint, "model-based selector needs --checkpoint"
        state, meta = ckpt.load_checkpoint(args.checkpoint, state)
        logger.info(f"loaded checkpoint epoch {meta.get('epoch')}")
        from dal3d_tpu.parallel.mesh import sharded_eval_predict

        predict, mesh = sharded_eval_predict(bundle, logger, what="pool scoring")

        def score_fn(batch):
            from dal3d_tpu.ops.sparse_brick import host_plan_batch_keys

            keys = (
                ("voxel_features", "voxel_coords", "voxel_valid")
                + host_plan_batch_keys(batch)
                if "voxel_features" in batch else ("points", "points_valid")
            )
            return predict(
                state.params, state.batch_stats,
                {k: batch[k] for k in keys if k in batch},
            )

        dataloader = loader

    from dal3d_tpu.selectors import build_selector

    selector = build_selector(
        sel_cfg, default_args=dict(detector=score_fn, dataloader=dataloader, logger=logger)
    )
    selector.select_samples()
    selector.dump_file()
    logger.info("selection complete")


if __name__ == "__main__":
    main()
