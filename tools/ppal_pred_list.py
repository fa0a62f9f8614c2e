#!/usr/bin/env python
"""Dump detector predictions on the labeled pool subset -> pred_list.pkl
(reference tools/ppal_pred_list.py:165). Consumed by tools/ppal_unc.py."""
import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dal3d_tpu.utils.platform import setup_jax


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--out", default="pred_list.pkl")
    p.add_argument("--info_path", default=None, help="pool infos (default: selector.infos_origin)")
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--augment", action="store_true",
                   help="apply the CALD test-time flip augmentation before scoring")
    return p.parse_args()


def main():
    args = parse_args()
    jax = setup_jax(force_cpu=args.cpu)
    import numpy as np

    from dal3d_tpu.data import DataLoader, NuScenesDataset
    from dal3d_tpu.models.builder import build_detector
    from dal3d_tpu.runtime import checkpoint as ckpt
    from dal3d_tpu.runtime.steps import create_train_state, make_predict_step
    from dal3d_tpu.solver.optim import OneCycleSchedule, build_optimizer
    from dal3d_tpu.utils import Config, get_root_logger

    cfg = Config.fromfile(args.config)
    logger = get_root_logger()
    bundle = build_detector(cfg)
    val = dict(cfg.data["val"])
    info_path = args.info_path or dict(cfg.selector)["infos_origin"]
    dataset = NuScenesDataset(
        info_path=info_path, root_path=val.get("root_path", ""),
        nsweeps=val.get("nsweeps", 10), class_names=val.get("class_names"),
        pipeline=[dict(s) for s in val.get("pipeline", [])],
        tasks=[dict(t) for t in cfg.tasks], max_points=cfg.get("max_points", 300000),
        voxelize_host=None,  # predict feeds (possibly flipped) raw points;
        # host voxels/brick plans would be computed and then unused
        test_mode=True,
    )
    batch_size = args.batch_size or cfg.data.get("samples_per_gpu", 2) * jax.device_count()
    loader = DataLoader(dataset, batch_size, shuffle=False, drop_last=False)
    optimizer = build_optimizer(OneCycleSchedule(total_steps=1))
    sample = next(iter(DataLoader(dataset, batch_size, shuffle=False)))
    state = create_train_state(bundle, optimizer, jax.random.PRNGKey(0), sample)
    state, meta = ckpt.load_checkpoint(args.checkpoint, state)
    logger.info(f"loaded checkpoint epoch {meta.get('epoch')}")
    predict = make_predict_step(bundle)

    preds = {}
    for batch in loader:
        pts = batch["points"]
        if args.augment:  # CALD consistency augmentation: y-flip
            pts = np.asarray(pts).copy()
            pts[..., 1] *= -1
        out = predict(state.params, state.batch_stats,
                      {"points": pts, "points_valid": batch["points_valid"]})
        out = {k: np.asarray(v) for k, v in out.items()}
        for i, md in enumerate(batch["metadata"]):
            token = md.get("token")
            if token in preds:
                continue
            det = {k: out[k][i] for k in ("box3d_lidar", "scores", "label_preds", "det_valid")}
            if args.augment:  # flip detections back for matching
                det["box3d_lidar"] = det["box3d_lidar"].copy()
                det["box3d_lidar"][:, 1] *= -1
                det["box3d_lidar"][:, 7] *= -1
                det["box3d_lidar"][:, 8] = -det["box3d_lidar"][:, 8] + np.pi
            preds[token] = det
        logger.info(f"scored {len(preds)}/{len(dataset)}")
    with open(args.out, "wb") as f:
        pickle.dump(preds, f)
    logger.info(f"predictions -> {args.out}")


if __name__ == "__main__":
    main()
