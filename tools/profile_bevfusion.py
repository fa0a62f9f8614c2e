#!/usr/bin/env python
"""BEVFusion on-chip stage profile + FPS at production shapes.

Cumulative in-jit stage timing of the fusion predict path (reference FPS
harness: bevfusion/tools/benchmark.py:58-84; stage roles: Swin camera
encoder -> DepthLSS/bev_pool -> SparseEncoder -> ConvFuser -> SECOND/FPN
decoder -> TransFusion head + decode). Synthetic camera+lidar batch at the
production config's shapes (configs/bevfusion_cl.py: 6 cams 256x704,
0.075 m voxels over +/-54 m, 120k voxel cap, 200 proposals).

Cuts use BEVFusion.__call__(stop_at=...) so every cut tensor is a live
output (no dead-code elimination of the measured stages). Cumulative order
is lidar -> +camera -> +fuse -> +decoder -> full, so each delta is one
stage. BF_CAMERA=0 profiles the lidar-only stage-1 model instead.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dal3d_tpu.utils.platform import setup_jax


def build_batch(jax, B, P, n_cam, image_hw, with_camera, pc_range, seed=0,
                host_voxelize=None):
    import numpy as np
    import jax.numpy as jnp

    from tools.microbench import _lidar_cloud

    rng = np.random.RandomState(seed)
    pts = np.zeros((B, P, 5), np.float32)
    valid = np.zeros((B, P), bool)
    for b in range(B):
        p = _lidar_cloud(rng, P)
        # scale the cloud into the fusion range (+/-54 m)
        p[:, :2] *= pc_range / 51.2
        pts[b, : len(p), :3] = p
        pts[b, : len(p), 3] = rng.uniform(0, 255, len(p))
        valid[b, : len(p)] = True
    batch = {"points": jnp.asarray(pts), "points_valid": jnp.asarray(valid)}
    if host_voxelize is not None:
        # production feed: the loader host-voxelizes (native C++), the model
        # skips its on-device voxelizer (65% of the lidar branch on chip)
        from dal3d_tpu.native import host_ops

        vc = host_voxelize
        M = int(vc.max_voxel_num)
        vf = np.zeros((B, M, 5), np.float32)
        vcrd = np.zeros((B, M, 3), np.int32)
        vval = np.zeros((B, M), bool)
        for b in range(B):
            feats, coords, _ = host_ops.points_to_voxel_mean(
                pts[b][valid[b]], vc.voxel_size, vc.point_cloud_range,
                int(vc.max_points_in_voxel), M)
            n = feats.shape[0]
            vf[b, :n], vcrd[b, :n], vval[b, :n] = feats, coords, True
        batch.update({"voxel_features": jnp.asarray(vf),
                      "voxel_coords": jnp.asarray(vcrd),
                      "voxel_valid": jnp.asarray(vval)})
    if with_camera:
        iH, iW = image_hw
        intrins = np.tile(
            np.array([[560.0, 0, iW / 2], [0, 560.0, iH / 2], [0, 0, 1]], np.float32),
            (B, n_cam, 1, 1))
        rots = []
        for ci in range(n_cam):
            yaw = 2 * np.pi * ci / n_cam
            c, s = np.cos(yaw), np.sin(yaw)
            rots.append(np.array([[c, 0, s], [-s, 0, c], [0, -1, 0]], np.float32).T)
        batch.update({
            "images": jnp.asarray(rng.rand(B, n_cam, iH, iW, 3).astype(np.float32)),
            "depth_images": jnp.asarray(
                (rng.rand(B, n_cam, iH, iW, 1) * 40).astype(np.float32)),
            "camera2lidar_rots": jnp.asarray(np.tile(np.stack(rots), (B, 1, 1, 1))),
            "camera2lidar_trans": jnp.zeros((B, n_cam, 3), jnp.float32),
            "camera_intrinsics": jnp.asarray(intrins),
            "img_aug_rots": jnp.asarray(
                np.tile(np.eye(3, dtype=np.float32), (B, n_cam, 1, 1))),
            "img_aug_trans": jnp.zeros((B, n_cam, 3), jnp.float32),
        })
    return batch


def build_fusion(jax, with_camera: bool, B: int, P: int = 300000):
    """(model, test_cfg, batch) at the production config's shapes — shared
    with bench.py's bevfusion block."""
    from dal3d_tpu.models.bevfusion import BEVFusion, TransFusionTestCfg
    from dal3d_tpu.ops.voxelize import VoxelConfig
    from dal3d_tpu.utils import Config

    cfg = Config.fromfile(os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "configs",
        "bevfusion_cl.py" if with_camera else "bevfusion_lidar.py"))
    vg = cfg.voxel_generator
    vcfg = VoxelConfig(tuple(vg["range"]), tuple(vg["voxel_size"]),
                       int(vg["max_points_in_voxel"]), int(vg["max_voxel_num"]))
    mc = dict(cfg.model)
    model = BEVFusion(
        voxel_cfg=vcfg,
        with_camera=with_camera,
        num_classes=int(mc.get("num_classes", 10)),
        num_proposals=int(mc.get("num_proposals", 200)),
        voxel_caps=tuple(mc.get("voxel_caps", (120000, 60000, 30000, 30000))),
        image_size=tuple(mc.get("image_size", (256, 704))),
        camera_out_channels=int(mc.get("camera_out_channels", 80)),
    )
    tc = dict(cfg.test_cfg)
    test_cfg = TransFusionTestCfg(
        out_size_factor=int(tc.get("out_size_factor", 8)),
        voxel_size=tuple(tc.get("voxel_size", (0.075, 0.075))),
        pc_range=tuple(tc.get("pc_range", (-54.0, -54.0))),
        score_threshold=float(tc.get("score_threshold", 0.0)),
    )
    # host voxels by default (the production loader host-voxelizes; the
    # on-device voxelizer's 85M-cell compaction is 65% of the lidar branch);
    # BF_HOST_VOX=0 measures the raw-points path instead
    hv = vcfg if os.environ.get("BF_HOST_VOX", "1") == "1" else None
    batch = build_batch(jax, B, P, 6, tuple(mc.get("image_size", (256, 704))),
                        with_camera, pc_range=54.0, host_voxelize=hv)
    return model, test_cfg, batch


def main():
    jax = setup_jax()
    import jax.numpy as jnp

    from dal3d_tpu.models.bevfusion.transfusion import transfusion_decode

    with_camera = os.environ.get("BF_CAMERA", "1") == "1"
    B = int(os.environ.get("BF_B", 1))
    P = int(os.environ.get("BF_POINTS", 300000))
    model, test_cfg, batch = build_fusion(jax, with_camera, B, P)
    print(f"B={B} P={P} camera={with_camera} "
          f"image={model.image_size} caps={model.voxel_caps}")

    variables = jax.jit(model.init, static_argnums=(2,))(
        jax.random.PRNGKey(0), batch, False)
    params, bstats = variables["params"], variables.get("batch_stats", {})

    def upto(stage):
        def f(params, bstats, batch):
            out = model.apply({"params": params, "batch_stats": bstats},
                              batch, False, stop_at=stage)
            if stage:
                return sum(jnp.sum(v) for v in out.values() if v is not None)
            dets = transfusion_decode(out, test_cfg)
            return sum(jnp.sum(v) for k, v in dets.items())
        return jax.jit(f)

    stages = (["lidar"] if not with_camera
              else ["lidar", "camera", "fused", "decoder"]) + [""]
    prev = 0.0
    results = {}
    for stage in stages:
        f = upto(stage)
        t0 = time.perf_counter()
        out = f(params, bstats, batch)
        float(jnp.asarray(out, jnp.float32))
        compile_s = time.perf_counter() - t0
        n = 5
        t0 = time.perf_counter()
        for _ in range(n):
            out = f(params, bstats, batch)
        float(jnp.asarray(out, jnp.float32))
        dt = (time.perf_counter() - t0) / n * 1e3
        name = stage or "full"
        results[name] = dt
        print(f"upto {name:8s} {dt:8.1f} ms  (+{dt - prev:7.1f})  "
              f"[compile {compile_s:.0f}s]")
        prev = dt
    fps = B / (results["full"] / 1e3)
    print(f"BEVFUSION_FPS {fps:.2f} scans/s/chip "
          f"({'camera+lidar' if with_camera else 'lidar-only'})")


if __name__ == "__main__":
    main()
