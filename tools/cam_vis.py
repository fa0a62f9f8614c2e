#!/usr/bin/env python
"""Camera-view visual debugging (reference tools/cam_vis.py): project GT /
predicted 3D boxes into each camera image of multi-view frames and save a
per-frame grid PNG."""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dal3d_tpu.utils.platform import setup_jax


def parse_args():
    p = argparse.ArgumentParser(description="Project boxes into camera views")
    p.add_argument("config", help="a BEVFusion-style config with a camera pipeline")
    p.add_argument("--out_dir", default="work_dirs/cam_vis")
    p.add_argument("--num", type=int, default=2)
    p.add_argument("--split", default="train", choices=("train", "val"))
    p.add_argument("--cpu", action="store_true")
    return p.parse_args()


def main():
    args = parse_args()
    setup_jax(force_cpu=args.cpu)
    import numpy as np

    from dal3d_tpu.data import DataLoader, NuScenesDataset
    from dal3d_tpu.utils import Config
    from dal3d_tpu.visualization.vis3d import _agg, draw_boxes_on_image, GT_COLOR

    cfg = Config.fromfile(args.config)
    os.makedirs(args.out_dir, exist_ok=True)
    d = dict(cfg.data[args.split])
    dataset = NuScenesDataset(
        info_path=d["info_path"], root_path=d.get("root_path", ""),
        nsweeps=d.get("nsweeps", 1), class_names=d.get("class_names"),
        pipeline=[dict(s) for s in d.get("pipeline", [])],
        tasks=[dict(t) for t in cfg.tasks],
        max_points=cfg.get("max_points", 300000),
        voxelize_host=dict(cfg.voxel_generator),
        test_mode=args.split == "val",
    )
    plt = _agg()
    for i, batch in enumerate(DataLoader(dataset, 1, shuffle=False)):
        if i >= args.num:
            break
        if "images" not in batch:
            raise SystemExit("config's pipeline produces no camera images")
        imgs = np.asarray(batch["images"][0])  # [N, H, W, 3] normalized
        K = np.asarray(batch["camera_intrinsics"][0])
        R = np.asarray(batch["camera2lidar_rots"][0])
        t = np.asarray(batch["camera2lidar_trans"][0])
        gt = None
        if "gt_boxes" in batch:
            g = np.concatenate([np.asarray(x[0]) for x in batch["gt_boxes"]])
            c = np.concatenate([np.asarray(x[0]) for x in batch["gt_classes"]])
            gt = g[c > 0]
        n = imgs.shape[0]
        cols = min(n, 3)
        rows = -(-n // cols)
        fig, axes = plt.subplots(rows, cols, figsize=(6 * cols, 4 * rows), squeeze=False)
        # un-normalize for display (ImageNormalize mean/std)
        mean = np.array([0.485, 0.456, 0.406])
        std = np.array([0.229, 0.224, 0.225])
        for v in range(n):
            ax = axes[v // cols][v % cols]
            img = np.clip(imgs[v] * std + mean, 0, 1)
            draw_boxes_on_image(ax, img, gt, K[v], R[v], t[v], color=GT_COLOR)
            ax.set_axis_off()
            ax.set_title(f"cam {v}")
        token = batch["metadata"][0].get("token", str(i))
        out = os.path.join(args.out_dir, f"{i:03d}_{token[:8]}.png")
        fig.savefig(out, dpi=100, bbox_inches="tight")
        plt.close(fig)
        print(f"frame {i}: {n} views, {0 if gt is None else len(gt)} gt -> {out}")


if __name__ == "__main__":
    main()
