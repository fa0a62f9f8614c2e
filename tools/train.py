#!/usr/bin/env python
"""Training driver.

CLI-compatible re-design of the reference tools/train.py:70-159: loads an
executable-python config, rewrites info/dbinfo paths with the AL budget suffix
(:125-132), builds the dataset (CBGS resampling at load), and runs the
OneCycle training workflow + optional val. Single program over the TPU mesh —
no torch.distributed launcher; multi-chip is the jax mesh.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dal3d_tpu.utils.platform import setup_jax


def parse_args():
    p = argparse.ArgumentParser(description="Train a detector")
    p.add_argument("config", help="config file path")
    p.add_argument("--work_dir", help="the dir to save logs and checkpoints")
    p.add_argument("--resume_from", help="checkpoint dir to resume from")
    p.add_argument("--load_from", help="checkpoint dir to warm-start weights from")
    p.add_argument("--torch_init", help="npz from tools/convert_second.py to "
                   "warm-start from a converted reference checkpoint")
    p.add_argument("--budget", type=str, default=None, help="AL budget suffix for info paths")
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--epochs", type=int, default=None, help="override total epochs")
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--cpu", action="store_true", help="force CPU backend")
    p.add_argument("--n_model", type=int, default=1, help="model-axis size of the device mesh")
    p.add_argument("--no_validate", action="store_true",
                   help="skip the workflow's val phases")
    return p.parse_args()


def main():
    args = parse_args()
    jax = setup_jax(force_cpu=args.cpu)
    import numpy as np

    from dal3d_tpu.data import DataLoader, NuScenesDataset
    from dal3d_tpu.models.builder import build_detector, loader_voxelize_cfg
    from dal3d_tpu.parallel.mesh import make_mesh
    from dal3d_tpu.runtime.trainer import Trainer
    from dal3d_tpu.solver.optim import OneCycleSchedule, build_optimizer
    from dal3d_tpu.utils import Config, get_root_logger

    cfg = Config.fromfile(args.config)
    if args.work_dir:
        cfg.work_dir = args.work_dir
    if args.seed is not None:
        np.random.seed(args.seed)
    os.makedirs(cfg.work_dir, exist_ok=True)
    logger = get_root_logger(os.path.join(cfg.work_dir, "train.log"), cfg.get("log_level", "INFO"))
    logger.info(f"devices: {jax.devices()}")

    # AL budget path rewriting (reference train.py:125-132)
    train_data = dict(cfg.data["train"])
    if args.budget is not None:
        ip = train_data["info_path"]
        ext = os.path.splitext(ip)[-1]
        train_data["info_path"] = ip.replace(ext, f"_{args.budget}{ext}")
        logger.info(f"AL budget {args.budget}: training on {train_data['info_path']}")
        db = cfg.train_preprocessor.get("db_sampler")
        if db:
            dbp = db["db_info_path"]
            db["db_info_path"] = dbp.replace(os.path.splitext(dbp)[-1], f"_{args.budget}{os.path.splitext(dbp)[-1]}")

    bundle = build_detector(cfg)
    from dal3d_tpu.data.dataset_factory import build_dataset

    # top-level dataset_type wins: configs assign it after `from _base import *`,
    # by which time data.train.type was already baked with the base's value
    train_data.pop("type", None)
    dataset_type = cfg.get("dataset_type", "NuScenesDataset")
    if dataset_type in ("NUSC_PART", "NuScenesPartialDataset"):
        # partial-label AL knobs live at config top level (reference
        # examples/active/cbgs_partial.py:315-316)
        for k in ("active_buffer", "active_flag", "sample_ratio", "label_fraction",
                  "partial_seed"):
            if cfg.get(k) is not None:
                train_data.setdefault(k, cfg[k])
    dataset = build_dataset(
        train_data,
        dataset_type=dataset_type,
        info_path=train_data["info_path"],
        root_path=train_data.get("root_path", ""),
        nsweeps=train_data.get("nsweeps", 10),
        class_names=train_data.get("class_names"),
        pipeline=[dict(s) for s in train_data.get("pipeline", [])],
        tasks=[dict(t) for t in cfg.tasks],
        max_points=cfg.get("max_points", 300000),
        voxelize_host=loader_voxelize_cfg(cfg),
    )
    logger.info(f"dataset: {len(dataset)} frames after CBGS resampling")

    batch_size = args.batch_size or cfg.data.get("samples_per_gpu", 2) * max(
        1, jax.device_count() // args.n_model
    )
    total_epochs = args.epochs or cfg.get("total_epochs", 20)
    steps_per_epoch = max(len(dataset) // batch_size, 1)

    lr_cfg = cfg.get("lr_config", {})
    one_cycle = OneCycleSchedule(
        lr_max=lr_cfg.get("lr_max", 0.002) * max(1, jax.device_count() // args.n_model),
        moms=tuple(lr_cfg.get("moms", (0.95, 0.85))),
        div_factor=lr_cfg.get("div_factor", 10.0),
        pct_start=lr_cfg.get("pct_start", 0.4),
        total_steps=steps_per_epoch * total_epochs,
    )
    optimizer = build_optimizer(
        one_cycle,
        weight_decay=cfg.get("optimizer", {}).get("VALUE", {}).get("wd", 0.01),
        grad_clip_norm=cfg.get("optimizer_config", {}).get("grad_clip", {}).get("max_norm", 35.0),
    )

    mesh = make_mesh(n_model=args.n_model) if jax.device_count() > 1 else None
    trainer_kw = dict(
        mesh=mesh, one_cycle_cfg=one_cycle, logger=logger,
        log_interval=cfg.get("log_config", {}).get("interval", 5),
        checkpoint_interval=cfg.get("checkpoint_config", {}).get("interval", 1),
    )
    est_cfg = cfg.get("estimator")
    if est_cfg:
        # dual-model partial-label pipeline (reference torchie/apis/
        # active_train.py:252: detector + box-quality Estimator co-training)
        import optax

        from dal3d_tpu.models.detectors.estimator import Estimator
        from dal3d_tpu.runtime.active_trainer import ActiveTrainer

        est_kw = {k: v for k, v in dict(est_cfg).items() if k != "type"}
        estimator = Estimator(**{k: tuple(v) if isinstance(v, list) else v
                                 for k, v in est_kw.items()})
        est_opt = optax.adam(float(cfg.get("estimator_lr", 1e-3)))
        trainer = ActiveTrainer(bundle, optimizer, estimator, est_opt,
                                cfg.work_dir, **trainer_kw)
        logger.info("ActiveTrainer: detector + estimator co-training")
    else:
        trainer = Trainer(bundle, optimizer, cfg.work_dir, **trainer_kw)

    def loader_fn(epoch):
        return DataLoader(dataset, batch_size, shuffle=True, seed=epoch)

    sample_batch = next(iter(DataLoader(dataset, batch_size, shuffle=False)))
    import jax.random as jrandom

    trainer.init_state(jrandom.PRNGKey(args.seed or 0), sample_batch)
    if est_cfg:
        trainer.init_estimator(jrandom.PRNGKey((args.seed or 0) + 1), sample_batch)
    if args.resume_from:
        # value may be a checkpoint dir; bare flags/other strings fall back
        # to resuming from work_dir
        import os as _os
        rd = args.resume_from if _os.path.isdir(str(args.resume_from)) else None
        trainer.resume(work_dir=rd)
    elif args.load_from:
        trainer.load_from(args.load_from)
    elif args.torch_init:
        from dal3d_tpu.models.convert_second import apply_torch_init

        impl = cfg["model"]["backbone"].get("impl", "gather")
        trainer.state = apply_torch_init(trainer.state, args.torch_init, impl,
                                         logger=logger)
        logger.info(f"warm-started from converted torch checkpoint {args.torch_init}")

    # in-training val workflow [('train', N), ('val', 1)] (reference
    # trainer.py:453,526): run the eval pass every N train epochs
    val_fn = None
    val_interval = None
    workflow = cfg.get("workflow")
    if not args.no_validate and workflow and any(w[0] == "val" for w in workflow):
        val_interval = next((int(n) for phase, n in workflow if phase == "train"), None)
        val_data = dict(cfg.data["val"])
        val_dataset = NuScenesDataset(
            info_path=val_data["info_path"],
            root_path=val_data.get("root_path", ""),
            nsweeps=val_data.get("nsweeps", 10),
            class_names=val_data.get("class_names"),
            pipeline=[dict(s) for s in val_data.get("pipeline", [])],
            tasks=[dict(t) for t in cfg.tasks],
            max_points=cfg.get("max_points", 300000),
            voxelize_host=loader_voxelize_cfg(cfg),
            test_mode=True,
        )

        def val_fn(trainer):
            from dal3d_tpu.runtime.evaluation import evaluate_dataset

            loader = DataLoader(val_dataset, batch_size, shuffle=False, drop_last=False)
            result = evaluate_dataset(
                trainer.predict_step, trainer.state.params, trainer.state.batch_stats,
                val_dataset, loader, cfg.work_dir, logger=logger,
            )
            logger.info(f"val epoch {trainer.epoch}: {result}")
            return result

    trainer.run(loader_fn, total_epochs, val_fn=val_fn, val_interval=val_interval)
    if est_cfg and getattr(trainer, "est_state", None) is not None:
        # separate estimator checkpoint (reference ActiveTrainer keeps its
        # own save path); flat npz, loaded by the partial-label selectors
        import numpy as np

        from dal3d_tpu.models.convert_second import flatten_tree

        est_path = os.path.join(cfg.work_dir, "estimator.npz")
        np.savez(est_path, **{k: np.asarray(v) for k, v in flatten_tree(
            jax.device_get(trainer.est_state.params)).items()})
        logger.info(f"saved estimator params -> {est_path}")
    logger.info("training done")


if __name__ == "__main__":
    main()
