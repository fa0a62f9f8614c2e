#!/usr/bin/env python
"""Cumulative in-jit stage timing of the full predict path at production
scale: pack -> backbone -> RPN -> head forward -> decode+topk -> NMS."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dal3d_tpu.utils.platform import setup_jax


def main():
    jax = setup_jax()
    import numpy as np
    import jax.numpy as jnp

    from dal3d_tpu.native import host_ops
    from dal3d_tpu.models.builder import build_detector
    from dal3d_tpu.runtime.steps import create_train_state
    from dal3d_tpu.solver.optim import OneCycleSchedule, build_optimizer
    from dal3d_tpu.utils import Config
    from dal3d_tpu.models.heads.mg_head import multi_group_predict
    from tools.microbench import _lidar_cloud

    cfg = Config.fromfile(os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "configs", "cbgs_spatial_temporal.py"))
    bundle = build_detector(cfg)

    B, M = 2, 60000
    rng = np.random.RandomState(0)
    P = 250_000
    pts = np.zeros((B, P, 5), np.float32)
    vf = np.zeros((B, M, 5), np.float32)
    vc = np.zeros((B, M, 3), np.int32)
    vv = np.zeros((B, M), bool)
    for b in range(B):
        p = _lidar_cloud(rng, P)
        pts[b, : len(p), :3] = p
        voxels, coords, npts = host_ops.points_to_voxel(
            pts[b], (0.1, 0.1, 0.2), (-51.2, -51.2, -5.0, 51.2, 51.2, 3.0), 10, M)
        n = voxels.shape[0]
        vf[b, :n] = voxels.sum(1) / np.maximum(npts, 1)[:, None]
        vc[b, :n] = coords
        vv[b, :n] = True
    batch = {
        "points": jnp.asarray(pts), "points_valid": jnp.ones((B, P), bool),
        "voxel_features": jnp.asarray(vf), "voxel_coords": jnp.asarray(vc),
        "voxel_valid": jnp.asarray(vv),
        "gt_boxes": [jnp.zeros((B, 8, 9)) + jnp.asarray([0, 0, 0, 1, 1, 1, 0, 0, 0.0])] * 6,
        "gt_classes": [jnp.zeros((B, 8), jnp.int32)] * 6,
    }
    opt = build_optimizer(OneCycleSchedule(total_steps=10))
    state = create_train_state(bundle, opt, jax.random.PRNGKey(0), batch)
    model = bundle.model

    # PLAN_HOST=1: feed the host brick-pack plan (loader-side in production)
    plan = None
    if os.environ.get("PLAN_HOST", "0") == "1":
        from dal3d_tpu.models.builder import build_host_sparse_plans, host_voxelize_cfg
        bp = (host_voxelize_cfg(cfg) or {}).get("brick")
        if bp:
            plan = {k: jnp.asarray(v) for k, v in build_host_sparse_plans(
                vc, vv, bundle.voxel_cfg.sparse_shape, bp).items()}
            print(f"host plan: {sorted(plan)} bw={bp['bw']} "
                  f"cap={bp['mb_cap']} spatial={bp['spatial']}")

    def upto(stage):
        def f(params, bstats, vfj, vcj, vvj):
            vtuple = (vfj, vcj, vvj) if plan is None else (vfj, vcj, vvj, plan)
            out = model.apply({"params": params, "batch_stats": bstats},
                              batch["points"], batch["points_valid"], False,
                              voxels=vtuple)
            if stage == "model":  # backbone + RPN + head convs
                return out["preds"][0]["box_preds"]
            if stage == "decode":
                # + decode + score-threshold + candidate top-k, stopping
                # before the IoU matrix / greedy NMS (so the decode->full
                # delta is exactly the NMS stage)
                dets = multi_group_predict(out["preds"], bundle.task_anchors,
                                           bundle.box_coder, bundle.test_cfg,
                                           stop_before_nms=True)
                return dets["cand_scores"]
            dets = multi_group_predict(out["preds"], bundle.task_anchors,
                                       bundle.box_coder, bundle.test_cfg)
            if stage == "full":
                return dets["scores"]
            return None
        return jax.jit(f)

    a = (state.params, state.batch_stats, batch["voxel_features"],
         batch["voxel_coords"], batch["voxel_valid"])
    prev = 0.0
    # "decode" = model + per-task decode/sigmoid/threshold with a k=1 top-k
    # (isolates the 1000-candidate top-k + IoU matrix + greedy NMS into the
    # model->full delta minus the decode delta)
    for stage in ("model", "decode", "full"):
        f = upto(stage)
        out = f(*a)
        float(jnp.asarray(out, jnp.float32).sum())
        t0 = time.perf_counter()
        n = 5
        for _ in range(n):
            out = f(*a)
        float(jnp.asarray(out, jnp.float32).sum())
        dt = (time.perf_counter() - t0) / n * 1e3
        print(f"upto {stage:8s} {dt:8.1f} ms  (+{dt - prev:6.1f})")
        prev = dt


if __name__ == "__main__":
    main()
