#!/usr/bin/env python
"""Offline lidar/detection visualizer (reference tools/lidar_visualize.py +
tools/debug_pred.py, det3d/visualization/): render frames of a dataset as
BEV + 3D + range-view PNGs, optionally overlaying detections — either from
a dumped pkl (tools/dist_test.py --out) or produced live from a checkpoint.
"""
import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dal3d_tpu.utils.platform import setup_jax


def parse_args():
    p = argparse.ArgumentParser(description="Visualize lidar frames + detections")
    p.add_argument("config")
    p.add_argument("--out_dir", default="work_dirs/vis")
    p.add_argument("--num", type=int, default=4, help="number of frames")
    p.add_argument("--split", default="val", choices=("train", "val"))
    p.add_argument("--detections", help="pkl of detections (dist_test --out)")
    p.add_argument("--checkpoint", help="run predict live from this work_dir")
    p.add_argument("--score_thresh", type=float, default=0.3)
    p.add_argument("--range_view", action="store_true", help="also render range images")
    p.add_argument("--cpu", action="store_true")
    return p.parse_args()


def main():
    args = parse_args()
    jax = setup_jax(force_cpu=args.cpu)
    import numpy as np

    from dal3d_tpu.data import DataLoader, NuScenesDataset
    from dal3d_tpu.models.builder import host_voxelize_cfg
    from dal3d_tpu.utils import Config
    from dal3d_tpu.visualization import detection_gallery, save_bev, save_scene
    from dal3d_tpu.visualization.vis3d import plot_range_image, _agg

    cfg = Config.fromfile(args.config)
    os.makedirs(args.out_dir, exist_ok=True)
    d = dict(cfg.data[args.split])
    dataset = NuScenesDataset(
        info_path=d["info_path"], root_path=d.get("root_path", ""),
        nsweeps=d.get("nsweeps", 10), class_names=d.get("class_names"),
        pipeline=[dict(s) for s in d.get("pipeline", [])],
        tasks=[dict(t) for t in cfg.tasks],
        max_points=cfg.get("max_points", 300000),
        voxelize_host=host_voxelize_cfg(cfg),
        test_mode=args.split == "val",
    )

    detections = {}
    if args.detections:
        with open(args.detections, "rb") as f:
            detections = pickle.load(f)
    predict = state = None
    if args.checkpoint:
        from dal3d_tpu.models.builder import build_detector
        from dal3d_tpu.runtime import checkpoint as ckpt
        from dal3d_tpu.runtime.steps import create_train_state, make_predict_step
        from dal3d_tpu.solver.optim import OneCycleSchedule, build_optimizer

        bundle = build_detector(cfg)
        loader = DataLoader(dataset, 1, shuffle=False)
        sample = next(iter(loader))
        state = create_train_state(
            bundle, build_optimizer(OneCycleSchedule(total_steps=1)),
            jax.random.PRNGKey(0), sample)
        state, _ = ckpt.load_checkpoint(args.checkpoint, state)
        predict = make_predict_step(bundle)

    rng_cfg = cfg.voxel_generator["range"]
    pc_range = (rng_cfg[0], rng_cfg[1], rng_cfg[3], rng_cfg[4])
    gallery = []
    for i, batch in enumerate(DataLoader(dataset, 1, shuffle=False)):
        if i >= args.num:
            break
        pts = np.asarray(batch["points"][0])[np.asarray(batch["points_valid"][0])]
        token = batch["metadata"][0].get("token", str(i))
        gt = None
        if "gt_boxes" in batch:
            gt = np.concatenate([np.asarray(g[0]) for g in batch["gt_boxes"]])
            cls = np.concatenate([np.asarray(c[0]) for c in batch["gt_classes"]])
            gt = gt[cls > 0]
        pred = None
        det = detections.get(token)
        if det is None and predict is not None:
            from dal3d_tpu.ops.sparse_brick import host_plan_batch_keys

            keys = (("voxel_features", "voxel_coords", "voxel_valid")
                    + host_plan_batch_keys(batch)
                    if "voxel_features" in batch else ("points", "points_valid"))
            out = predict(state.params, state.batch_stats,
                          {k: batch[k] for k in keys if k in batch})
            det = {k: np.asarray(v[0]) for k, v in out.items()
                   if k in ("box3d_lidar", "scores", "det_valid")}
        if det is not None:
            keep = np.asarray(det["det_valid"]).astype(bool) & (
                np.asarray(det["scores"]) >= args.score_thresh)
            pred = np.asarray(det["box3d_lidar"])[keep]

        save_bev(os.path.join(args.out_dir, f"{i:03d}_{token[:8]}_bev.png"),
                 pts, gt, pred, pc_range=pc_range)
        save_scene(os.path.join(args.out_dir, f"{i:03d}_{token[:8]}_3d.png"),
                   pts, gt, pred)
        if args.range_view:
            import matplotlib.pyplot as plt

            ax = plot_range_image(pts)
            ax.figure.savefig(
                os.path.join(args.out_dir, f"{i:03d}_{token[:8]}_range.png"),
                dpi=110, bbox_inches="tight")
            plt.close(ax.figure)
        gallery.append({"points": pts, "gt_boxes": gt, "pred_boxes": pred,
                        "title": token[:16]})
        print(f"frame {i} ({token[:16]}): {len(pts)} pts, "
              f"{0 if gt is None else len(gt)} gt, "
              f"{0 if pred is None else len(pred)} dets")

    if gallery:
        detection_gallery(os.path.join(args.out_dir, "gallery.png"), gallery,
                          pc_range=pc_range)
    print(f"wrote {args.out_dir} ({len(gallery)} frames)")


if __name__ == "__main__":
    main()
