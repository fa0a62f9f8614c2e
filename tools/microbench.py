#!/usr/bin/env python
"""On-chip microbenchmarks for the sparse-conv engine design.

Measures the facts the brick engine (ops/sparse_brick.py) is built on:
  gather   - XLA row-gather cost vs row width (8.3 ns/row claim, ROADMAP P1)
  bricks   - active-brick counts on lidar-like clouds at each backbone level
  compact  - occupancy-grid nonzero / maxpool costs for downsample planning

Usage: python tools/microbench.py gather|bricks|compact|all
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dal3d_tpu.utils.platform import setup_jax


def _timeit(fn, n=10):
    out = fn()
    float(out.sum()) if hasattr(out, "sum") else None  # force
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    float(out.sum()) if hasattr(out, "sum") else None
    return (time.perf_counter() - t0) / n


def bench_gather(jax):
    import jax.numpy as jnp
    import numpy as np

    rng = np.random.RandomState(0)
    B = 2
    for N, M, C in [
        (60000, 27 * 60000, 16),
        (60000, 27 * 60000, 128),
        (24000, 27 * 24000, 256),
        (24000, 27 * 24000, 512),
        (12000, 27 * 12000, 1024),
        (6000, 27 * 6000, 2048),
    ]:
        tbl = jnp.asarray(rng.rand(B, N, C), jnp.bfloat16)
        idx = jnp.asarray(rng.randint(0, N, (B, M, 1)), jnp.int32)

        @jax.jit
        def f(tbl, idx):
            g = jnp.take_along_axis(tbl, idx, axis=1)
            return g.sum(axis=(1, 2))  # reduce so we don't write K*M*C back

        dt = _timeit(lambda: f(tbl, idx))
        rows = B * M
        print(
            f"gather rows={rows/1e6:.2f}M width={C:4d}ch ({C*2:5d}B) "
            f"t={dt*1e3:7.2f} ms -> {dt/rows*1e9:6.2f} ns/row "
            f"({rows*C*2/dt/1e9:6.1f} GB/s)"
        )


def _lidar_cloud(rng, n_points=250_000):
    """Lidar-like cloud: radial ground rings + walls + vehicle clusters.

    Mimics a 10-sweep nuScenes accumulation: dense near-field ground,
    vertical structures, object clusters — the clustering statistics the
    brick caps are sized from.
    """
    import numpy as np

    pts = []
    # ground: 32 beams x sweeps, radial pattern -> rings; dense near ego
    n_ground = int(n_points * 0.55)
    az = rng.uniform(-np.pi, np.pi, n_ground)
    # ranges: concentrated near ego like 1/r ring density
    r = 2.0 + 48.0 * rng.power(2.2, n_ground)
    x, y = r * np.cos(az), r * np.sin(az)
    z = rng.normal(-1.8, 0.05, n_ground) + r * 0.003
    pts.append(np.stack([x, y, z], 1))
    # walls/buildings: vertical planes at random azimuth sectors
    n_wall = int(n_points * 0.3)
    nseg = 40
    seg = rng.randint(0, nseg, n_wall)
    saz = rng.uniform(-np.pi, np.pi, nseg)[seg] + rng.normal(0, 0.02, n_wall)
    sr = rng.uniform(8, 50, nseg)[seg] + rng.normal(0, 0.3, n_wall)
    x, y = sr * np.cos(saz), sr * np.sin(saz)
    z = rng.uniform(-1.8, 2.8, n_wall)
    pts.append(np.stack([x, y, z], 1))
    # vehicles/objects: boxes
    n_obj = n_points - n_ground - n_wall
    nobj = 25
    oc = rng.uniform(-45, 45, (nobj, 2))
    oi = rng.randint(0, nobj, n_obj)
    x = oc[oi, 0] + rng.uniform(-2.2, 2.2, n_obj)
    y = oc[oi, 1] + rng.uniform(-1.0, 1.0, n_obj)
    z = rng.uniform(-1.8, 0.2, n_obj)
    pts.append(np.stack([x, y, z], 1))
    p = np.concatenate(pts, 0).astype(np.float32)
    keep = (np.abs(p[:, 0]) < 51.2) & (np.abs(p[:, 1]) < 51.2) & (p[:, 2] > -5) & (p[:, 2] < 3)
    return p[keep]


def bench_bricks(jax):
    import numpy as np

    rng = np.random.RandomState(0)
    p = _lidar_cloud(rng)
    print(f"cloud: {len(p)} in-range points")
    # L0 voxel grid
    vox = np.unique(
        (
            np.floor((p - np.array([-51.2, -51.2, -5.0])) / np.array([0.1, 0.1, 0.2]))
        ).astype(np.int64),
        axis=0,
    )
    # cap 60k like production: keep lowest lin
    D, H, W = 41, 1024, 1024
    lin = (vox[:, 2] * H + vox[:, 1]) * W + vox[:, 0]
    lin = np.sort(lin)[:60000]
    print(f"L0 voxels: {len(lin)}")
    cur = lin
    shape = (D, H, W)
    for lvl in range(4):
        D_, H_, W_ = shape
        z, rem = cur // (H_ * W_), cur % (H_ * W_)
        y, x = rem // W_, rem % W_
        for bw in (8, 16, 32):
            bl = np.unique((z * H_ + y) * (W_ // bw) + x // bw)
            print(
                f"  L{lvl} grid={shape} voxels={len(cur)} bw={bw}: "
                f"bricks={len(bl)} ({len(cur)/max(len(bl),1):.2f} vox/brick)"
            )
        # downsample: stride 2 in all dims (approx; L3 differs but close enough)
        if lvl < 3:
            nshape = (D_ // 2 + 1, H_ // 2, W_ // 2)
            nz, ny, nx = z // 2, y // 2, x // 2
            cur = np.unique((nz * nshape[1] + ny) * nshape[2] + nx)
            # dilation: strided conv output set is the 3x3x3-dilated stride-2
            # image; approximate growth factor by dilating in xy by 1
            grow = []
            for dz in (0, 1):
                for dy in (-1, 0, 1):
                    for dx in (-1, 0, 1):
                        qz = np.clip(nz + dz, 0, nshape[0] - 1)
                        qy = np.clip(ny + dy, 0, nshape[1] - 1)
                        qx = np.clip(nx + dx, 0, nshape[2] - 1)
                        grow.append((qz * nshape[1] + qy) * nshape[2] + qx)
            cur = np.unique(np.concatenate(grow))
            shape = nshape


def bench_compact(jax):
    import jax.numpy as jnp
    import numpy as np

    rng = np.random.RandomState(0)
    for cells, cap in [(41 * 1024 * 64, 30000), (21 * 512 * 32, 20000), (2_700_000, 24000)]:
        occ = jnp.asarray(rng.rand(cells) < 0.01)

        @jax.jit
        def f(occ):
            return jnp.nonzero(occ, size=cap, fill_value=cells)[0].sum()

        dt = _timeit(lambda: f(occ))
        print(f"nonzero cells={cells/1e6:.2f}M cap={cap}: {dt*1e3:.2f} ms")
    # occupancy maxpool on full voxel grid
    occ = jnp.asarray(rng.rand(2, 41, 1024, 1024) < 0.0014, jnp.float32)

    @jax.jit
    def pool(o):
        import jax as _jax

        r = _jax.lax.reduce_window(
            o, -jnp.inf, _jax.lax.max, (1, 3, 3, 3), (1, 2, 2, 2), "SAME"
        )
        return r.sum()

    dt = _timeit(lambda: pool(occ))
    print(f"maxpool3 s2 on [2,41,1024,1024] f32: {dt*1e3:.2f} ms")


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    jax = setup_jax()
    print("devices:", jax.devices())
    if which in ("gather", "all"):
        bench_gather(jax)
    if which in ("bricks", "all"):
        bench_bricks(jax)
    if which in ("compact", "all"):
        bench_compact(jax)


if __name__ == "__main__":
    main()
