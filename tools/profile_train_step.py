#!/usr/bin/env python
"""Production-scale train-step timing on the real chip (B=2, 250k pts,
60k voxels, full CBGS model + on-device target assignment)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dal3d_tpu.utils.platform import setup_jax


def main():
    jax = setup_jax()
    import numpy as np
    import jax.numpy as jnp

    from dal3d_tpu.models.builder import build_detector
    from dal3d_tpu.native import host_ops
    from dal3d_tpu.runtime.steps import create_train_state, make_train_step
    from dal3d_tpu.solver.optim import OneCycleSchedule, build_optimizer
    from dal3d_tpu.utils import Config
    from tools.microbench import _lidar_cloud

    cfg = Config.fromfile(os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "configs", "cbgs_spatial_temporal.py"))
    # engine A/B without editing configs: IMPL=brick|banded|hybrid|gather
    impl = os.environ.get("IMPL")
    if impl:
        cfg["model"]["backbone"]["impl"] = impl
    bundle = build_detector(cfg)

    B, P, M = int(os.environ.get("B", 2)), 250_000, 60000
    rng = np.random.RandomState(0)
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
    gt = np.zeros((B, 8, 9), np.float32)
    gt[..., 3:6] = 1.0
    gt[:, 0] = [2, 3, -0.9, 2.0, 4.6, 1.7, 0, 0, 0.5]
    cls = np.zeros((B, 8), np.int32)
    cls[:, 0] = 1
    batch = {
        "points": jnp.asarray(pts), "points_valid": jnp.ones((B, P), bool),
        "voxel_features": jnp.asarray(vf), "voxel_coords": jnp.asarray(vc),
        "voxel_valid": jnp.asarray(vv),
        "gt_boxes": [jnp.asarray(gt)] * 6,
        "gt_classes": [jnp.asarray(cls)] * 6,
    }
    if os.environ.get("PLAN_HOST", "0") == "1":
        # host brick-pack plan (loader-side in production)
        from dal3d_tpu.models.builder import build_host_sparse_plans, host_voxelize_cfg
        bp = (host_voxelize_cfg(cfg) or {}).get("brick")
        if bp:
            plans = build_host_sparse_plans(
                vc, vv, bundle.voxel_cfg.sparse_shape, bp)
            for k, v in plans.items():
                batch[k] = jnp.asarray(v)
            print(f"host plan: {sorted(plans)} bw={bp['bw']} "
                  f"cap={bp['mb_cap']} spatial={bp['spatial']}")
    opt = build_optimizer(OneCycleSchedule(total_steps=100))
    state = create_train_state(bundle, opt, jax.random.PRNGKey(0), batch)
    step = make_train_step(bundle, opt)
    state, logs = step(state, batch)
    print("first step loss:", float(logs["loss"]))

    # ---- stage split: fwd-loss only / +backward / full step ----
    # (mirrors make_train_step's loss_fn; deltas = backward pass and
    # optimizer+param-update respectively)
    voxels = (batch["voxel_features"], batch["voxel_coords"], batch["voxel_valid"])
    if "brick_row" in batch:
        from dal3d_tpu.ops.sparse_brick import host_plan_batch_keys
        voxels = voxels + ({k: batch[k] for k in host_plan_batch_keys(batch)},)

    def loss_fn(params, bstats):
        out, _ = bundle.model.apply(
            {"params": params, "batch_stats": bstats},
            batch["points"], batch["points_valid"], True,
            voxels=voxels, mutable=["batch_stats"])
        from dal3d_tpu.models import multi_group_loss
        labels, targets, _ = bundle.assigner.assign_all(
            batch["gt_boxes"], batch["gt_classes"])
        logs = multi_group_loss(out["preds"], labels, targets,
                                bundle.num_classes, bundle.loss_cfg)
        return logs["loss"]

    import optax

    fwd = jax.jit(loss_fn)

    def grad_only(p, bs):
        # grads forced via global_norm so the whole backward is live
        loss, grads = jax.value_and_grad(loss_fn)(p, bs)
        return loss + optax.global_norm(grads) * 0

    def timeit(f, *a, n=5):
        out = f(*a)
        float(jnp.asarray(out, jnp.float32).sum()
              if hasattr(out, "sum") else jnp.asarray(out[1]["loss"]))
        t0 = time.perf_counter()
        for _ in range(n):
            out = f(*a)
        float(jnp.asarray(out, jnp.float32).sum()
              if hasattr(out, "sum") else jnp.asarray(out[1]["loss"]))
        return (time.perf_counter() - t0) / n * 1e3

    t_fwd = timeit(fwd, state.params, state.batch_stats)
    print(f"fwd loss only:      {t_fwd:6.0f} ms")

    t_bwd = timeit(jax.jit(grad_only), state.params, state.batch_stats)
    print(f"fwd+bwd:            {t_bwd:6.0f} ms  (bwd +{t_bwd - t_fwd:.0f})")

    n = 5
    t0 = time.perf_counter()
    for _ in range(n):
        state, logs = step(state, batch)
    float(logs["loss"])
    dt = (time.perf_counter() - t0) / n
    print(f"full step:          {dt*1e3:6.0f} ms  (optimizer/update +{dt*1e3 - t_bwd:.0f})")
    print(f"train step (B={B}): {dt*1e3:.0f} ms -> {B/dt:.2f} scans/s/chip training")


if __name__ == "__main__":
    main()
