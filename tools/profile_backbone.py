#!/usr/bin/env python
"""Production-scale on-chip backbone timing per engine.

Builds a lidar-like 250k-point cloud (tools/microbench._lidar_cloud), host-
voxelizes it at production scale (0.1 m, (41,1024,1024), 60k voxels), and
times forward (and optionally forward+backward) of FPNSpMiddleResNetFHD for
the requested impl.

Usage: python tools/profile_backbone.py [brick|gather|hybrid] [--train] [--b N]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dal3d_tpu.utils.platform import setup_jax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("impl", nargs="?", default="brick")
    ap.add_argument("--train", action="store_true")
    ap.add_argument("--b", type=int, default=2)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()
    jax = setup_jax()
    import numpy as np
    import jax.numpy as jnp

    from dal3d_tpu.models.backbones.scn import FPNSpMiddleResNetFHD
    from dal3d_tpu.native import host_ops
    from dal3d_tpu.ops import sparse_backend as sp
    from tools.microbench import _lidar_cloud

    B, M = args.b, 60000
    rng = np.random.RandomState(0)
    vf = np.zeros((B, M, 5), np.float32)
    vc = np.zeros((B, M, 3), np.int32)
    vv = np.zeros((B, M), bool)
    for b in range(B):
        p = _lidar_cloud(rng)
        pts = np.concatenate([p, rng.rand(len(p), 2).astype(np.float32)], axis=1)
        voxels, coords, npts = host_ops.points_to_voxel(
            pts, (0.1, 0.1, 0.2), (-51.2, -51.2, -5.0, 51.2, 51.2, 3.0), 10, M
        )
        n = voxels.shape[0]
        vf[b, :n] = voxels.sum(1) / np.maximum(npts, 1)[:, None]
        vc[b, :n] = coords
        vv[b, :n] = True
        print(f"frame {b}: {len(p)} pts -> {n} voxels")

    shape = (41, 1024, 1024)
    sb = sp.from_voxels(jnp.asarray(vf), jnp.asarray(vc), jnp.asarray(vv), shape)
    model = FPNSpMiddleResNetFHD(
        num_input_features=5, impl=args.impl, dtype=args.dtype,
    )

    var = jax.jit(model.init, static_argnums=(2,))(jax.random.PRNGKey(0), sb, False)
    print("params initialized")

    if args.train:
        def step(params, sb):
            def loss(p):
                (dense, _), _ = model.apply(
                    {"params": p, "batch_stats": var["batch_stats"]}, sb, True,
                    mutable=["batch_stats"],
                )
                return jnp.sum(dense.astype(jnp.float32) ** 2)
            l, g = jax.value_and_grad(loss)(params)
            return l, jax.tree_util.tree_map(lambda x: jnp.abs(x).sum(), g)
        f = jax.jit(step)
        run = lambda: f(var["params"], sb)
        force = lambda out: float(out[0])
    else:
        f = jax.jit(lambda v, sb: model.apply(v, sb, False)[0], static_argnums=())
        run = lambda: f(var, sb)
        force = lambda out: float(out.sum())

    t0 = time.perf_counter()
    force(run())
    print(f"compile+first run: {time.perf_counter()-t0:.1f} s")
    t0 = time.perf_counter()
    for _ in range(args.iters):
        force(run())
    dt = (time.perf_counter() - t0) / args.iters
    mode = "train-step" if args.train else "forward"
    print(f"impl={args.impl} dtype={args.dtype} B={B} {mode}: {dt*1e3:.1f} ms "
          f"({B/dt:.2f} scans/s)")


if __name__ == "__main__":
    main()
