#!/usr/bin/env python
"""BEVFusion training driver (reference bevfusion/tools/train.py): lidar-only
stage-1 or camera+lidar stage-2 (--load_from the stage-1 checkpoint)."""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dal3d_tpu.utils.platform import setup_jax


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("--work_dir", default=None)
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--load_from", default=None)
    p.add_argument("--resume_from", default=None)
    p.add_argument("--swin_init", default=None,
                   help="flax-param npz from tools/convert_swin.py (pretrained camera backbone)")
    p.add_argument("--torch_init", default=None,
                   help="npz from tools/convert_bevfusion.py: warm-start the "
                        "whole model from a converted reference checkpoint")
    p.add_argument("--budget", type=str, default=None,
                   help="AL budget suffix: train on infos_*_{budget}.pkl "
                        "(written by tools/create_data.py --suffix)")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()
    jax = setup_jax(force_cpu=args.cpu)
    import numpy as np
    import jax.random as jrandom

    from dal3d_tpu.data import DataLoader, NuScenesDataset
    from dal3d_tpu.models.bevfusion import BEVFusion, TransFusionTestCfg
    from dal3d_tpu.ops.voxelize import VoxelConfig
    from dal3d_tpu.runtime import checkpoint as ckpt
    from dal3d_tpu.runtime.bevfusion_steps import (
        create_bevfusion_state, make_bevfusion_train_step,
    )
    from dal3d_tpu.solver.optim import OneCycleSchedule, build_optimizer
    from dal3d_tpu.utils import Config, get_root_logger

    cfg = Config.fromfile(args.config)
    work_dir = args.work_dir or cfg.work_dir
    os.makedirs(work_dir, exist_ok=True)
    logger = get_root_logger(os.path.join(work_dir, "train.log"))

    vg = cfg.voxel_generator
    vcfg = VoxelConfig(tuple(vg["range"]), tuple(vg["voxel_size"]),
                       int(vg["max_points_in_voxel"]), int(vg["max_voxel_num"]))
    mc = dict(cfg.model)
    model = BEVFusion(
        voxel_cfg=vcfg,
        with_camera=bool(mc.get("with_camera", False)),
        num_classes=int(mc.get("num_classes", 10)),
        num_proposals=int(mc.get("num_proposals", 200)),
        voxel_caps=tuple(mc.get("voxel_caps", (120000, 60000, 30000, 30000))),
        decoder_channels=tuple(mc.get("decoder_channels", (128, 256))),
        image_size=tuple(mc.get("image_size", (256, 704))),
        camera_out_channels=int(mc.get("camera_out_channels", 80)),
        with_map_seg=bool(mc.get("with_map_seg", False)),
    )
    tc = dict(cfg.test_cfg)
    test_cfg = TransFusionTestCfg(
        out_size_factor=int(tc.get("out_size_factor", 8)),
        voxel_size=tuple(tc.get("voxel_size", (0.075, 0.075))),
        pc_range=tuple(tc.get("pc_range", (-54.0, -54.0))),
        score_threshold=float(tc.get("score_threshold", 0.0)),
    )

    train_data = dict(cfg.data["train"])
    if args.budget is not None:
        ip = train_data["info_path"]
        ext = os.path.splitext(ip)[-1]
        train_data["info_path"] = ip.replace(ext, f"_{args.budget}{ext}")
        logger.info(f"AL budget {args.budget}: training on {train_data['info_path']}")
    dataset = NuScenesDataset(
        info_path=train_data["info_path"], root_path=train_data.get("root_path", ""),
        nsweeps=train_data.get("nsweeps", 10), class_names=train_data.get("class_names"),
        pipeline=[dict(s) for s in train_data.get("pipeline", [])],
        tasks=[dict(t) for t in cfg.tasks], max_points=cfg.get("max_points", 300000),
        voxelize_host=dict(cfg.voxel_generator),
    )
    batch_size = args.batch_size or cfg.data.get("samples_per_gpu", 2)
    # multi-chip: batch DP over the mesh 'data' axis (the reference trains
    # BEVFusion with torchpack dist-run DDP; here the mesh replaces NCCL)
    from dal3d_tpu.parallel.mesh import make_mesh, shard_batch

    mesh = make_mesh() if jax.device_count() > 1 else None
    if mesh is not None:
        batch_size = batch_size * int(mesh.shape["data"])
        logger.info(f"mesh {mesh.shape}: global batch {batch_size}")
    total_epochs = args.epochs or cfg.get("total_epochs", 20)
    steps = max(len(dataset) // batch_size, 1) * total_epochs
    lr = cfg.get("lr_config", {})
    optimizer = build_optimizer(
        OneCycleSchedule(lr_max=lr.get("lr_max", 1e-4), total_steps=steps),
        weight_decay=cfg.get("optimizer", {}).get("VALUE", {}).get("wd", 0.01),
    )

    def to_fusion_batch(b):
        import jax.numpy as jnp

        from dal3d_tpu.runtime.bevfusion_steps import CAMERA_KEYS

        keep = ("points", "points_valid", "voxel_features", "voxel_coords",
                "voxel_valid", "gt_masks_bev") + CAMERA_KEYS
        out = {k: jnp.asarray(v) for k, v in b.items() if k in keep}
        # fold per-task GTs into global-class arrays for the fusion head
        gts, cls = b["gt_boxes"], b["gt_classes"]
        offset = 0
        boxes, classes = [], []
        for t, (g, c) in enumerate(zip(gts, cls)):
            boxes.append(g)
            classes.append(np.where(c > 0, c + offset, 0))
            offset += int(cfg.tasks[t]["num_class"])
        out["gt_boxes"] = jnp.asarray(np.concatenate(boxes, axis=1))
        out["gt_classes"] = jnp.asarray(np.concatenate(classes, axis=1))
        return out

    sample = to_fusion_batch(next(iter(DataLoader(dataset, batch_size, shuffle=False))))
    state = create_bevfusion_state(model, optimizer, jrandom.PRNGKey(0), sample)
    step = make_bevfusion_train_step(model, optimizer, test_cfg)
    if args.resume_from:
        rd = args.resume_from if os.path.isdir(str(args.resume_from)) else work_dir
        state, meta = ckpt.load_checkpoint(rd, state)
        logger.info(f"resumed epoch {meta.get('epoch')} from {rd}")
    elif args.load_from:
        # stage-2 fusion warm-starts from the stage-1 lidar-only checkpoint:
        # a DIFFERENT module tree, so copy matching leaves (strict=False)
        state, n_copied, _ = ckpt.load_partial_params(args.load_from, state,
                                                      logger=logger)
        if n_copied == 0:
            raise SystemExit(f"--load_from {args.load_from}: no matching leaves")
        logger.info(f"warm-started from {args.load_from}")
    elif args.torch_init:
        from dal3d_tpu.models.bevfusion.convert_bevfusion import (
            apply_torch_init_bevfusion,
        )

        merged = apply_torch_init_bevfusion(
            {"params": state.params, "batch_stats": state.batch_stats},
            args.torch_init, logger)
        state = state.replace(params=merged["params"],
                              batch_stats=merged["batch_stats"])
        logger.info(f"warm-started from converted torch checkpoint {args.torch_init}")
    if args.swin_init:
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from convert_swin import load_swin_npz

        swin = load_swin_npz(args.swin_init)
        params = dict(state.params)
        assert "SwinTransformer_0" in params, "model has no camera branch"
        import jax.tree_util as jtu

        cur = params["SwinTransformer_0"]
        assert jtu.tree_structure(cur) == jtu.tree_structure(swin), (
            "converted Swin tree does not match the model (check depths/out_indices)"
        )
        params["SwinTransformer_0"] = jtu.tree_map(
            lambda a, b: b.astype(a.dtype).reshape(a.shape), cur, swin
        )
        state = state.replace(params=params)
        logger.info(f"camera backbone initialized from {args.swin_init}")

    import contextlib

    for epoch in range(total_epochs):
        for i, batch in enumerate(DataLoader(dataset, batch_size, shuffle=True, seed=epoch)):
            fb = to_fusion_batch(batch)
            if mesh is not None:
                fb = shard_batch(fb, mesh)
            with jax.set_mesh(mesh) if mesh is not None else contextlib.nullcontext():
                state, logs = step(state, fb)
            if (i + 1) % cfg.get("log_config", {}).get("interval", 5) == 0:
                logger.info(
                    f"Epoch [{epoch+1}][{i+1}] loss {float(logs['loss']):.4f} "
                    f"(cls {float(logs['cls_loss']):.3f} reg {float(logs['reg_loss']):.3f} "
                    f"hm {float(logs['heatmap_loss']):.3f} "
                    f"seg {float(logs.get('seg_loss', 0.0)):.3f}) "
                    f"matched {int(logs['num_matched'])}"
                )
        ckpt.save_checkpoint(work_dir, state, epoch + 1)
        logger.info(f"saved epoch {epoch+1}")
    logger.info("training done")


if __name__ == "__main__":
    main()
