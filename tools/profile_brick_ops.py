#!/usr/bin/env python
"""Per-op on-chip timing of the (halo) brick engine at production scale."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dal3d_tpu.utils.platform import setup_jax


def timeit(name, fn, force, n=5):
    out = fn()
    force(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    force(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:44s} {dt*1e3:8.2f} ms")
    return out


def main():
    jax = setup_jax()
    import numpy as np
    import jax.numpy as jnp

    from dal3d_tpu.native import host_ops
    from dal3d_tpu.ops import sparse_brick as spb
    from tools.microbench import _lidar_cloud

    B, M = 2, 60000
    BW = int(os.environ.get("BW", 16))
    CAP = int(os.environ.get("CAP", 48000))
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
    vf_j, vc_j, vv_j = jnp.asarray(vf, jnp.bfloat16), jnp.asarray(vc), jnp.asarray(vv)

    fsum = lambda bb: float(jnp.asarray(bb.features, jnp.float32).sum())
    gsum = lambda g: float(jnp.asarray(g, jnp.float32).sum())

    pack = jax.jit(lambda f, c, v: spb.from_voxels(f, c, v, shape, BW, CAP))
    bb = timeit(f"from_voxels (pack, bw{BW} cap{CAP})",
                lambda: pack(vf_j, vc_j, vv_j), fsum)
    print("  active bricks:", int((np.asarray(bb.brick_lin[0]) < bb.num_cells).sum()),
          int((np.asarray(bb.brick_lin[1]) < bb.num_cells).sum()))

    rb_fn = jax.jit(lambda bb: spb.subm_rulebook(bb, 3))
    rb = timeit("subm_rulebook L0 (9 taps + halo)", lambda: rb_fn(bb),
                lambda r: float(r[0].sum()))

    w16 = jnp.asarray(np.random.randn(27, 16, 16) * 0.1, jnp.bfloat16)
    w5_16 = jnp.asarray(np.random.randn(27, 5, 16) * 0.1, jnp.bfloat16)

    stem = jax.jit(lambda bb, w: spb.subm_conv(bb, w, rulebook=None, kernel_size=3))
    bb16 = timeit("stem subm 5->16 (incl rulebook)", lambda: stem(bb, w5_16), fsum)

    conv = jax.jit(lambda bb, rb, w: spb.subm_conv(bb, w, rulebook=rb, kernel_size=3))
    timeit("subm conv 16->16 (shared rulebook)", lambda: conv(bb16, rb, w16), fsum)

    idx, hit, hidx, hhit = rb
    pad_fn = jax.jit(lambda bb: spb._halo_pad(bb.features, bb.bw, hidx, hhit))
    padded = timeit("  halo_pad (2 narrow gathers + concat)",
                    lambda: pad_fn(bb16), gsum)

    go = jax.jit(lambda p: spb._gather_rows(p, idx, hit))
    g = timeit(f"  gather 9 x {CAP} padded rows",
               lambda: go(padded), gsum)

    Kzy = 9
    band = spb._halo_band(Kzy, 3, bb16.bw, w16)
    ein = jax.jit(lambda g, band: jnp.einsum(
        "bkmx,kxy->bmy",
        g.reshape(B, Kzy, CAP, (BW + 2) * 16), band,
        preferred_element_type=jnp.float32))
    timeit("  einsum band contraction", lambda: ein(g, band), gsum)

    # downsample L0 -> L1
    w_d1 = jnp.asarray(np.random.randn(27, 16, 32) * 0.1, jnp.bfloat16)
    OBW = int(os.environ.get("OBW", 16))
    OCAP = int(os.environ.get("OCAP", 17000))
    plan_fn = jax.jit(lambda bb: spb.downsample_plan(
        bb, (3, 3, 3), (2, 2, 2), (1, 1, 1), OBW, OCAP))
    plan = timeit("downsample_plan L0->L1", lambda: plan_fn(bb16),
                  lambda p: float(p[0].sum()))
    down = jax.jit(lambda bb, w: spb.downsample_conv(
        bb, w, (3, 3, 3), (2, 2, 2), (1, 1, 1), OBW, OCAP))
    timeit("downsample_conv L0->L1 (incl plan)", lambda: down(bb16, w_d1), fsum)


if __name__ == "__main__":
    main()
