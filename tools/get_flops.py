#!/usr/bin/env python
"""Model complexity: parameter count + jaxpr-based FLOP estimate
(reference tools/get_flops.py:54)."""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dal3d_tpu.utils.platform import setup_jax


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("--batch_size", type=int, default=1)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()
    jax = setup_jax(force_cpu=args.cpu)
    import numpy as np
    import jax.numpy as jnp

    from dal3d_tpu.models.builder import build_detector
    from dal3d_tpu.utils import Config

    cfg = Config.fromfile(args.config)
    B, P = args.batch_size, cfg.get("max_points", 300000)
    if "BEVFusion" in str(cfg.get("model", {}).get("type", "")) or cfg.get("test_cfg", {}).get("out_size_factor"):
        # BEVFusion config (lidar-only complexity; the camera branch needs
        # image inputs and is covered by tools/benchmark.py)
        from dal3d_tpu.models.bevfusion import BEVFusion
        from dal3d_tpu.ops.voxelize import VoxelConfig

        vg = cfg.voxel_generator
        vcfg = VoxelConfig(tuple(vg["range"]), tuple(vg["voxel_size"]),
                           int(vg["max_points_in_voxel"]), int(vg["max_voxel_num"]))
        mc = dict(cfg.model)
        model = BEVFusion(
            voxel_cfg=vcfg, with_camera=False,
            num_proposals=int(mc.get("num_proposals", 200)),
            voxel_caps=tuple(mc.get("voxel_caps", (120000, 60000, 30000, 30000))),
            decoder_channels=tuple(mc.get("decoder_channels", (128, 256))),
        )
        batch = {"points": jnp.zeros((B, P, 5), jnp.float32),
                 "points_valid": jnp.ones((B, P), bool)}
        variables = jax.jit(model.init, static_argnums=(2,))(
            jax.random.PRNGKey(0), batch, False)
        n_params = sum(int(np.prod(x.shape))
                       for x in jax.tree_util.tree_leaves(variables["params"]))
        analysis = (
            jax.jit(lambda v, b: model.apply(v, b, False))
            .lower(variables, batch).compile().cost_analysis()
        )
    else:
        bundle = build_detector(cfg)
        pts = jnp.zeros((B, P, 5), jnp.float32)
        pv = jnp.ones((B, P), bool)
        variables = jax.jit(bundle.model.init, static_argnums=(3,))(
            jax.random.PRNGKey(0), pts, pv, False
        )
        n_params = sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(variables["params"]))
        analysis = (
            jax.jit(lambda v, p, m: bundle.model.apply(v, p, m, False))
            .lower(variables, pts, pv)
            .compile()
            .cost_analysis()
        )
    flops = analysis.get("flops", float("nan")) if analysis else float("nan")
    print(f"params: {n_params/1e6:.2f} M")
    print(f"forward flops (XLA cost analysis, batch {B}): {flops/1e9:.2f} GFLOP")


if __name__ == "__main__":
    main()
