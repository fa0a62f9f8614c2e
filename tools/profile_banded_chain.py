#!/usr/bin/env python
"""Cumulative in-jit stage timing of the BANDED backbone at production scale
(same harness as profile_brick_chain.py; successive-row deltas cancel the
per-call relay overhead). Knobs via env: BAND_W (subm bands per level),
DOWN_BAND, FB_CAP, BRICK_W, BRICK_CAPS."""
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
    from tools.microbench import _lidar_cloud

    B, M = int(os.environ.get("PB_B", 2)), 60000
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
    args = (jnp.asarray(vf, jnp.bfloat16), jnp.asarray(vc), jnp.asarray(vv))
    widths = tuple(int(v) for v in os.environ.get("BRICK_W", "16,16,8,4,4").split(","))
    caps = tuple(int(v) for v in os.environ.get(
        "BRICK_CAPS", "48000,17024,9984,6016,6016").split(","))
    bands = tuple(int(v) for v in os.environ.get("BAND_W", "768,512,512,512").split(","))
    dbands = tuple(int(v) for v in os.environ.get("DOWN_BAND", "2048,1024,512,512").split(","))
    fbc = int(os.environ.get("FB_CAP", 256))
    sym = os.environ.get("SYM", "0") == "1"
    bmv = int(os.environ.get("BM", 128))
    print("widths", widths, "caps", caps, "bands", bands, "dbands", dbands, "fb", fbc, "sym", sym, "bm", bmv)
    rngw = np.random.RandomState(1)

    def w(k, i, o):
        return jnp.asarray(rngw.randn(k, i, o) * 0.1, jnp.bfloat16)

    Ws = dict(
        stem=w(27, 5, 16), b1=w(27, 16, 16), b2=w(27, 16, 16), b3=w(27, 16, 16),
        b4=w(27, 16, 16), d1=w(27, 16, 32),
        s1a=w(27, 32, 32), s1b=w(27, 32, 32), s1c=w(27, 32, 32), s1d=w(27, 32, 32),
        d2=w(27, 32, 64),
        s2a=w(27, 64, 64), s2b=w(27, 64, 64), s2c=w(27, 64, 64), s2d=w(27, 64, 64),
        d3=w(27, 64, 128),
        s3a=w(27, 128, 128), s3b=w(27, 128, 128), s3c=w(27, 128, 128), s3d=w(27, 128, 128),
        d4=w(3, 128, 128),
    )

    def upto(stage):
        def f(vf, vc, vv):
            bb = spb.from_voxels(vf, vc, vv, shape, widths[0], caps[0], spatial=True)
            if stage == "pack":
                return bb.features
            grid = spb.build_brick_grid(bb)
            rb = spb.subm_rulebook_banded(bb, 3, grid, band=bands[0], fb_cap=fbc, symmetric=sym, bm=bmv)
            if stage == "plans":
                return bb.features + rb.conv_plan.starts.sum()
            x = spb.subm_conv(bb, Ws["stem"], rb)
            if stage == "conv1":
                return x.features
            for k in ("b1", "b2", "b3", "b4"):
                x = spb.subm_conv(x, Ws[k], rb)
            if stage == "l0convs":
                return x.features
            x = spb.downsample_conv_banded(
                x, Ws["d1"], (3, 3, 3), (2, 2, 2), (1, 1, 1), widths[1], caps[1],
                grid=grid, band=dbands[0], fb_cap=fbc * 2, symmetric_pad=sym, bm=bmv)
            if stage == "d1":
                return x.features
            grid1 = spb.build_brick_grid(x)
            rb1 = spb.subm_rulebook_banded(x, 3, grid1, band=bands[1], fb_cap=fbc, symmetric=sym, bm=bmv)
            for k in ("s1a", "s1b", "s1c", "s1d"):
                x = spb.subm_conv(x, Ws[k], rb1)
            if stage == "l1convs":
                return x.features
            x = spb.downsample_conv_banded(
                x, Ws["d2"], (3, 3, 3), (2, 2, 2), (1, 1, 1), widths[2], caps[2],
                grid=grid1, band=dbands[1], fb_cap=fbc * 2, symmetric_pad=sym, bm=bmv)
            if stage == "d2":
                return x.features
            grid2 = spb.build_brick_grid(x)
            rb2 = spb.subm_rulebook_banded(x, 3, grid2, band=bands[2], fb_cap=fbc, symmetric=sym, bm=bmv)
            for k in ("s2a", "s2b", "s2c", "s2d"):
                x = spb.subm_conv(x, Ws[k], rb2)
            if stage == "l2convs":
                return x.features
            x = spb.downsample_conv_banded(
                x, Ws["d3"], (3, 3, 3), (2, 2, 2), (0, 1, 1), widths[3], caps[3],
                grid=grid2, band=dbands[2], fb_cap=fbc * 2, symmetric_pad=sym, bm=bmv)
            grid3 = spb.build_brick_grid(x)
            rb3 = spb.subm_rulebook_banded(x, 3, grid3, band=bands[3], fb_cap=fbc, symmetric=sym, bm=bmv)
            for k in ("s3a", "s3b", "s3c", "s3d"):
                x = spb.subm_conv(x, Ws[k], rb3)
            if stage == "l3":
                return x.features
            x = spb.downsample_conv_banded(
                x, Ws["d4"], (3, 1, 1), (2, 1, 1), (0, 0, 0), widths[4], caps[4],
                grid=grid3, band=dbands[3], fb_cap=fbc * 2, symmetric_pad=sym, bm=bmv)
            d = spb.to_dense(x)
            return d

        return jax.jit(f)

    if os.environ.get("CHECK") == "1":
        def stats(vf, vc, vv):
            out = {}
            bb = spb.from_voxels(vf, vc, vv, shape, widths[0], caps[0], spatial=True)
            grid = spb.build_brick_grid(bb)
            rb = spb.subm_rulebook_banded(bb, 3, grid, band=bands[0], fb_cap=fbc, symmetric=sym, bm=bmv)
            out["L0conv"] = (rb.conv_plan.oob_count.sum(), rb.conv_plan.fb_covered.sum())
            out["L0pad"] = (rb.pad_plan.oob_count.sum(), rb.pad_plan.fb_covered.sum())
            x = spb.subm_conv(bb, Ws["stem"], rb)
            for k in ("b1", "b2", "b3", "b4"):
                x = spb.subm_conv(x, Ws[k], rb)
            dplan = spb.downsample_plan(x, (3, 3, 3), (2, 2, 2), (1, 1, 1), widths[1], caps[1], grid, spatial=True)
            from dal3d_tpu.ops.banded import make_band_plan
            cp = make_band_plan(dplan[1], dplan[2], caps[0], dbands[0], bmv, fbc * 2)
            out["d1conv"] = (cp.oob_count.sum(), cp.fb_covered.sum())
            x = spb.downsample_conv_banded(x, Ws["d1"], (3, 3, 3), (2, 2, 2), (1, 1, 1), widths[1], caps[1], grid=grid, band=dbands[0], fb_cap=fbc * 2, symmetric_pad=sym, bm=bmv)
            grid1 = spb.build_brick_grid(x)
            rb1 = spb.subm_rulebook_banded(x, 3, grid1, band=bands[1], fb_cap=fbc, symmetric=sym, bm=bmv)
            out["L1conv"] = (rb1.conv_plan.oob_count.sum(), rb1.conv_plan.fb_covered.sum())
            for k in ("s1a", "s1b", "s1c", "s1d"):
                x = spb.subm_conv(x, Ws[k], rb1)
            dk = {"d2": ((3, 3, 3), (2, 2, 2), (1, 1, 1), 2, 1),
                  "d3": ((3, 3, 3), (2, 2, 2), (0, 1, 1), 3, 2),
                  "d4": ((3, 1, 1), (2, 1, 1), (0, 0, 0), 4, 3)}
            subm_keys = {2: ("s2a", "s2b", "s2c", "s2d"), 3: ("s3a", "s3b", "s3c", "s3d")}
            gridl = grid1
            for name, (kk, ss, pp, lvl, dbi) in dk.items():
                dplan = spb.downsample_plan(x, kk, ss, pp, widths[lvl], caps[lvl], gridl, spatial=True)
                cp = make_band_plan(dplan[1], dplan[2], x.features.shape[1], min(dbands[dbi], (x.features.shape[1] // 16) * 16), bmv, fbc * 2)
                out[name + "conv"] = (cp.oob_count.sum(), cp.fb_covered.sum())
                x = spb.downsample_conv_banded(x, Ws[name], kk, ss, pp, widths[lvl], caps[lvl], grid=gridl, band=dbands[dbi], fb_cap=fbc * 2, symmetric_pad=sym, bm=bmv)
                gridl = spb.build_brick_grid(x)
                if lvl in (2, 3):
                    rbx = spb.subm_rulebook_banded(x, 3, gridl, band=bands[lvl], fb_cap=fbc, symmetric=sym, bm=bmv)
                    out[f"L{lvl}conv"] = (rbx.conv_plan.oob_count.sum(), rbx.conv_plan.fb_covered.sum())
                    for k in subm_keys[lvl]:
                        x = spb.subm_conv(x, Ws[k], rbx)
            return out
        st = jax.jit(stats)(*args)
        for k, (o, c) in st.items():
            print(f"CHECK {k}: oob={int(o)} fb_covered={int(c)}", flush=True)
        return

    prev = 0.0
    stages = os.environ.get(
        "STAGES", "pack,plans,conv1,l0convs,d1,l1convs,d2,l2convs,l3,all").split(",")
    for stage in stages:
        f = upto(stage)
        out = f(*args)
        float(jnp.asarray(out, jnp.float32).sum())
        t0 = time.perf_counter()
        n = 5
        for _ in range(n):
            out = f(*args)
        float(jnp.asarray(out, jnp.float32).sum())
        dt = (time.perf_counter() - t0) / n * 1e3
        print(f"upto {stage:10s} {dt:8.1f} ms  (+{dt - prev:6.1f})", flush=True)
        prev = dt


if __name__ == "__main__":
    main()
