#!/usr/bin/env python
"""Sweep the banded kernel's (band, bm) at production L0/L1 shapes on real
lidar-like rulebooks: per-conv wall time + out-of-band fraction. Informs the
band_widths/down_bands defaults in configs."""
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
    from dal3d_tpu.ops import sparse_brick as spb
    from dal3d_tpu.ops import banded as bd
    from tools.microbench import _lidar_cloud

    B, M = 2, 60000
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

    shape = (41, 1024, 1024)
    rngw = np.random.RandomState(1)

    # ---- build L0 (C=16) and L1 (C=32) brick batches once --------------------
    @jax.jit
    def build(vf, vc, vv):
        bb0 = spb.from_voxels(vf, vc, vv, shape, 16, 48000, spatial=True)
        g0 = spb.build_brick_grid(bb0)
        idx, hit, hidx, hhit = spb.subm_rulebook(bb0, 3, g0)
        # put C=16 features on the rows
        w0 = jnp.asarray(rngw.randn(27, 5, 16) * 0.1, jnp.bfloat16)
        x0 = spb.subm_conv(bb0, w0, (idx, hit, hidx, hhit))
        x1 = spb.downsample_conv(x0, jnp.asarray(rngw.randn(27, 16, 32) * 0.1, jnp.bfloat16),
                                 (3, 3, 3), (2, 2, 2), (1, 1, 1), 16, 17024)
        g1 = spb.build_brick_grid(x1)
        i1, h1, hi1, hh1 = spb.subm_rulebook(x1, 3, g1)
        return (x0.features, idx, hit, hidx, hhit,
                x1.features, i1, h1, hi1, hh1)

    (f0, idx0, hit0, hidx0, hhit0, f1, idx1, hit1, hidx1, hh1) = [
        jnp.asarray(a) for a in build(jnp.asarray(vf, jnp.bfloat16),
                                      jnp.asarray(vc), jnp.asarray(vv))]
    levels = {
        "L0(C16,M48000)": (f0, idx0, hit0, 16, 16, 48000),
        "L1(C32,M17024)": (f1, idx1, hit1, 16, 32, 17024),
    }
    for name, (feats, idx, hit, bw, C, Mb) in levels.items():
        w = jnp.asarray(rngw.randn(27, C, C) * 0.1, jnp.bfloat16)
        for band in (256, 384, 512, 768, 1024):
            for bm in (128, 256):
                if Mb % bm:
                    continue

                @jax.jit
                def run(feats, idx, hit, band=band, bm=bm):
                    plan = bd.make_band_plan(idx, hit, Mb, band, bm,
                                             fb_cap=1024, symmetric=True)
                    # time the conv-shaped kernel itself (the halo-pad call
                    # has the same structure and is covered by the chain tool)
                    bandw = spb._halo_band(9, 3, bw, w)
                    R2p = bd._pad128((bw + 2) * C)
                    if bandw.shape[1] != R2p:
                        bandw = jnp.pad(bandw, ((0, 0), (0, R2p - bandw.shape[1]), (0, 0)))
                    padded = jnp.pad(feats, ((0, 0), (0, 0), (0, R2p - feats.shape[-1])))
                    out = bd.banded_gather_matmul(padded, bandw, plan)
                    return out, plan.oob_count

                out, oob = run(feats, idx, hit)
                float(jnp.asarray(out, jnp.float32).sum())
                t0 = time.perf_counter()
                n = 8
                for _ in range(n):
                    out, oob = run(feats, idx, hit)
                s = float(jnp.asarray(out, jnp.float32).sum())
                dt = (time.perf_counter() - t0) / n * 1e3
                total = int(9 * Mb * B)
                o = int(np.asarray(oob).sum())
                print(f"{name} band={band:5d} bm={bm:3d}: {dt:7.2f} ms "
                      f"(plan+conv)  oob {o}/{total} = {100.0 * o / total:.2f}%",
                      flush=True)

    # plan-build alone at the best configs
    for name, (feats, idx, hit, bw, C, Mb) in levels.items():
        for band, bm in ((256, 256), (512, 256)):
            if Mb % bm:
                continue

            @jax.jit
            def planf(idx, hit, band=band, bm=bm):
                p = bd.make_band_plan(idx, hit, Mb, band, bm, fb_cap=1024,
                                      symmetric=True)
                return p.idx_k.sum() + p.fb_idx.sum() + p.starts.sum() + p.fb_rows.sum()

            float(planf(idx, hit))
            t0 = time.perf_counter()
            for _ in range(8):
                r = planf(idx, hit)
            float(r)
            dt = (time.perf_counter() - t0) / 8 * 1e3
            print(f"{name} plan band={band} bm={bm}: {dt:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
