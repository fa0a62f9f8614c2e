#!/usr/bin/env python
"""On-chip Mosaic validation of the Pallas tiled rotated-IoU kernel.

Runs the real-lowering (non-interpret) Pallas kernel on the TPU at
production NMS shapes ([12, 1000] candidate sets, overlap-heavy), judges it
against the EXACT bitonic clipper computed on host CPU (sampled pairs), and
times it against the XLA Green's path it replaces. This is the chip gate
behind ops/pallas_iou.use_pallas's "auto" default.

Validated 2026-08-20 on v5e: pallas 6.1 ms vs xla 19.7 ms per [12,1000,1000]
batch; pallas max-err vs exact 4e-4 while the XLA Green's path degrades on
TPU (mean err 0.08 on overlapping pairs, 11% NMS decision flips at iou 0.2
among disagreeing pairs) — the kernel is both faster and MORE accurate than
the path it replaced, so parity here is judged vs exact, not vs XLA.
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

    from dal3d_tpu.ops.pallas_iou import rotated_iou_matrix_greens_pallas
    from dal3d_tpu.ops.rotated_iou_fast import (
        rotated_iou_matrix_fast,
        rotated_iou_matrix_greens,
    )

    assert jax.default_backend() == "tpu", jax.default_backend()

    TB, N = 12, 1000
    rng = np.random.RandomState(0)
    boxes = np.zeros((TB, N, 5), np.float32)
    boxes[..., :2] = rng.uniform(-50, 50, (TB, N, 2))
    boxes[..., 2:4] = rng.uniform(0.5, 8.0, (TB, N, 2))
    boxes[..., 4] = rng.uniform(-np.pi, np.pi, (TB, N))
    # force overlap-heavy rows: duplicate + jitter the first half. Dims are
    # clamped positive afterwards: the predict path only ever feeds
    # exp-decoded (positive) dims, and a negative width flips the corner
    # winding that the Green's formulation (both engines) assumes.
    boxes[:, N // 2:] = boxes[:, : N - N // 2] + rng.normal(
        0, 0.3, boxes[:, N // 2:].shape).astype(np.float32)
    boxes[..., 2:4] = np.maximum(boxes[..., 2:4], 0.1)
    b = jnp.asarray(boxes)

    pal = jax.jit(rotated_iou_matrix_greens_pallas)
    xla = jax.jit(jax.vmap(lambda x: rotated_iou_matrix_greens(x, x)))
    out_p = np.asarray(pal(b, b))
    out_x = np.asarray(xla(b))

    # accuracy vs the exact clipper, on host CPU, over a pair sample biased
    # toward overlap (where the clip degeneracies live)
    n_s = 3000
    prng = np.random.RandomState(1)
    gi = prng.randint(0, TB, n_s)
    ii = prng.randint(0, N, n_s)
    jj = np.where(prng.rand(n_s) < 0.7,
                  (ii + N // 2) % N,  # jittered-duplicate partner
                  prng.randint(0, N, n_s))
    cpu = jax.devices("cpu")[0]
    b1 = jnp.asarray(boxes[gi, ii][:, None, :], device=cpu)
    b2 = jnp.asarray(boxes[gi, jj][:, None, :], device=cpu)
    with jax.default_device(cpu):
        exact = np.asarray(jax.vmap(rotated_iou_matrix_fast)(b1, b2))[:, 0, 0]
    ep = np.abs(out_p[gi, ii, jj] - exact)
    ex = np.abs(out_x[gi, ii, jj] - exact)
    flips_p = ((out_p[gi, ii, jj] > 0.2) != (exact > 0.2)).mean()
    flips_x = ((out_x[gi, ii, jj] > 0.2) != (exact > 0.2)).mean()
    print(f"vs exact ({n_s} sampled pairs): "
          f"pallas max {ep.max():.2e} flips@0.2 {flips_p:.4f} | "
          f"xla max {ex.max():.2e} flips@0.2 {flips_x:.4f}")

    for name, fn, args in (("pallas", pal, (b, b)), ("xla", xla, (b,))):
        o = fn(*args)
        float(jnp.asarray(o).sum())  # force
        n = 10
        t0 = time.perf_counter()
        for _ in range(n):
            o = fn(*args)
        float(jnp.asarray(o).sum())
        dt = (time.perf_counter() - t0) / n * 1e3
        print(f"{name:7s} [12,1000,1000] iou matrix: {dt:7.2f} ms")

    ok = ep.max() < 5e-3 and flips_p == 0.0
    print("CHIP_PALLAS_IOU_" + ("OK" if ok else "MISMATCH"))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
