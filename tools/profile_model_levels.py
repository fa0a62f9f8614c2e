#!/usr/bin/env python
"""Per-level model split of the production predict's backbone, host plans in.

Returns only ``middle[k].features`` from the jitted forward, so XLA
dead-code-eliminates every deeper level — here DCE is the *instrument*:
the delta between successive k is exactly one backbone stage, with the
host-plan feed identical to production (PLAN_HOST=1, default here). The
final stages add the dense reshape + RPN + head convs ("model", matching
tools/profile_predict.py's first stage).

Level map (banded/brick engines, models/backbones/scn.py):
  k=0  pack + L0 subm convs (+ds1 inside the L0 remat section)
  k=1  stage1 (ds + 4 subm convs at W/2)
  k=2  stage2 (W/4)
  k=3  stage3 (W/8)
"""
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
    from dal3d_tpu.runtime.steps import create_train_state
    from dal3d_tpu.solver.optim import OneCycleSchedule, build_optimizer
    from dal3d_tpu.utils import Config
    from tools.microbench import _lidar_cloud

    cfg = Config.fromfile(os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "configs", "cbgs_spatial_temporal.py"))
    impl = os.environ.get("IMPL")
    if impl:
        cfg["model"]["backbone"]["impl"] = impl
    bundle = build_detector(cfg)

    B, M, P = int(os.environ.get("PB_B", 2)), 60000, 250_000
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

    plan = None
    if os.environ.get("PLAN_HOST", "1") == "1":
        from dal3d_tpu.models.builder import build_host_sparse_plans, host_voxelize_cfg
        bp = (host_voxelize_cfg(cfg) or {}).get("brick")
        if bp:
            plan = {k: jnp.asarray(v) for k, v in build_host_sparse_plans(
                vc, vv, bundle.voxel_cfg.sparse_shape, bp).items()}
            print("host plans fed")

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

    def upto(k):
        def f(params, bstats, vfj, vcj, vvj):
            vtuple = (vfj, vcj, vvj) if plan is None else (vfj, vcj, vvj, plan)
            out = model.apply({"params": params, "batch_stats": bstats},
                              batch["points"], batch["points_valid"], False,
                              voxels=vtuple)
            if isinstance(k, int):
                m = out["middle"][k]
                feats = m.features if hasattr(m, "features") else (
                    m[0] if isinstance(m, tuple) else m)
                return jnp.asarray(feats, jnp.float32).sum()
            return out["preds"][0]["box_preds"]  # full model (matches profile_predict)
        return jax.jit(f)

    a = (state.params, state.batch_stats, batch["voxel_features"],
         batch["voxel_coords"], batch["voxel_valid"])
    prev = 0.0
    for k in (0, 1, 2, 3, "model"):
        f = upto(k)
        out = f(*a)
        float(jnp.asarray(out, jnp.float32).sum())
        n = 5
        t0 = time.perf_counter()
        for _ in range(n):
            out = f(*a)
        float(jnp.asarray(out, jnp.float32).sum())
        dt = (time.perf_counter() - t0) / n * 1e3
        print(f"upto {str(k):6s} {dt:8.1f} ms  (+{dt - prev:6.1f})")
        prev = dt


if __name__ == "__main__":
    main()
