#!/usr/bin/env python
"""Inference FPS harness (reference bevfusion/tools/benchmark.py:58-84):
warmup + timed loop over the jitted predict step with synthetic frames."""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dal3d_tpu.utils.platform import setup_jax


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("--batch_size", type=int, default=2)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--warmup", type=int, default=3)
    p.add_argument("--points", type=int, default=250000)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()
    jax = setup_jax(force_cpu=args.cpu)
    import numpy as np
    import jax.numpy as jnp

    from dal3d_tpu.models.builder import build_detector
    from dal3d_tpu.runtime.steps import create_train_state, make_predict_step
    from dal3d_tpu.solver.optim import OneCycleSchedule, build_optimizer
    from dal3d_tpu.utils import Config

    cfg = Config.fromfile(args.config)
    bundle = build_detector(cfg)
    B, P = args.batch_size, args.points
    rng = np.random.RandomState(0)
    pts = np.zeros((B, P, 5), np.float32)
    pts[..., 0] = rng.uniform(-50, 50, (B, P))
    pts[..., 1] = rng.uniform(-50, 50, (B, P))
    pts[..., 2] = rng.uniform(-4.9, 2.9, (B, P))
    batch = {
        "points": jnp.asarray(pts), "points_valid": jnp.ones((B, P), bool),
        "gt_boxes": [jnp.zeros((B, 4, 9)).at[..., 3:6].set(1.0)] * len(bundle.num_classes),
        "gt_classes": [jnp.zeros((B, 4), jnp.int32)] * len(bundle.num_classes),
    }
    opt = build_optimizer(OneCycleSchedule(total_steps=1))
    state = create_train_state(bundle, opt, jax.random.PRNGKey(0), batch)
    predict = make_predict_step(bundle)
    pb = {"points": batch["points"], "points_valid": batch["points_valid"]}
    for _ in range(args.warmup):
        out = predict(state.params, state.batch_stats, pb)
        float(out["scores"].sum())  # force fetch: block_until_ready is unreliable on relayed TPUs
    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = predict(state.params, state.batch_stats, pb)
        float(out["scores"].sum())
    dt = (time.perf_counter() - t0) / args.iters
    print(f"batch {B}: {dt*1e3:.1f} ms/iter -> {B/dt:.2f} scans/s")


if __name__ == "__main__":
    main()
