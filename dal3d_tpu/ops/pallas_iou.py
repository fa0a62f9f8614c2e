"""Pallas TPU kernel: tiled rotated-IoU matrix (Green's-theorem clipping).

The batched 12-way NMS (models/heads/mg_head.py stage 2) computes
[T*B, 1000, 1000] rotated-IoU matrices. The XLA Green's path
(ops.rotated_iou_fast.rotated_iou_matrix_greens) is numerically right but
materializes its [N, 4, M, 4] clip temporaries (num/den/t_at, ~64 MB each at
N=M=1000) through HBM — measured 17-22 ms of the 250 ms predict, ~10x off
the VPU roofline for the ~500 flops/pair the math needs (ROADMAP P3).

This kernel tiles the pair grid into [128, 128] blocks and keeps every
temporary in VMEM. Per box set it precomputes a 32-lane row record
(corners, edge vectors, clip planes, area — `_pack_rowdat`); a tile then
reads one [128, 32] row block (boxes i) and one [32, 128] column block
(boxes j, same record transposed) and loops the 4x4 (edge, plane) Cyrus-Beck
clip with pure [128, 128] broadcast arithmetic — no HBM traffic beyond the
two tiny operand blocks and the output tile.

Both clip directions (edges of i against planes of j and vice versa) come
out in [i, j] orientation directly, so no in-kernel transpose is needed.
Conventions (eps, boundary half-weighting, killed-by-parallel-plane) match
`rotated_iou_fast._matrix_contrib` exactly; parity is tested against it and
against the exact bitonic-clipping reference in interpret mode.

Replaces the role of the reference's rotated-IoU CUDA kernels
(det3d/ops/box2d_iou_rotated/src/box_iou_rotated_cuda.cu,
bevfusion/mmdet3d/ops/iou3d/src/iou3d_kernel.cu) on the NMS path.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from ..core.box_ops_jax import corners_2d

_EPS = 1e-4  # meters; identical to rotated_iou_fast._matrix_contrib
_BN = 128
_REC = 32  # row-record lanes (29 used, padded to 32)


def use_pallas() -> bool:
    """DAL3D_IOU picks the IoU-matrix backend; default "auto" = Pallas on
    real TPU, XLA elsewhere.

    Chip-validated 2026-08-20 (tools/chip_pallas_iou_check.py, v5e):
    the Mosaic lowering compiles and runs [12,1000,1000] in 6.1 ms vs the
    XLA Green's path's 19.7 ms, AND is the more accurate of the two on
    TPU — vs the exact bitonic clipper the kernel's error is <=4e-4 while
    the XLA path degrades on overlapping pairs (mean err 0.08, 11% NMS
    decision flips at iou 0.2 among disagreeing pairs; TPU lowers parts of
    the f32 clip chain at reduced precision, which the VMEM-resident kernel
    does not). DAL3D_IOU=xla|pallas|interpret overrides."""
    import os

    mode = os.environ.get("DAL3D_IOU", "auto")
    if mode in ("pallas", "interpret"):
        return True
    if mode == "auto":
        return jax.default_backend() == "tpu"
    return False


def _interpret() -> bool:
    import os

    return (
        os.environ.get("DAL3D_IOU") == "interpret"
        or jax.default_backend() != "tpu"
    )


def _pack_rowdat(boxes: jnp.ndarray) -> jnp.ndarray:
    """BEV boxes [G, N, 5] (x, y, w, l, yaw) -> row records [G, N, 32].

    Lanes: 0-3 p0x(e), 4-7 p0y(e), 8-11 dx(e), 12-15 dy(e),
           16-19 nx(p), 20-23 ny(p), 24-27 an(p), 28 area, 29-31 zero.
    Edges e run over the corner ring of corners_2d; planes p are the
    Cyrus-Beck inward-normal half-planes of the same ring (CW ring ->
    right-hand normal, as in rotated_iou_fast._clip_planes).
    """
    c = corners_2d(boxes)  # [G, N, 4, 2]
    d = jnp.roll(c, -1, axis=-2) - c
    elen = jnp.sqrt(jnp.maximum(jnp.sum(d * d, axis=-1), 1e-20))
    n = jnp.stack([d[..., 1], -d[..., 0]], axis=-1) / elen[..., None]
    an = jnp.sum(n * c, axis=-1)  # [G, N, 4]
    area = jnp.abs(boxes[..., 2] * boxes[..., 3])[..., None]  # [G, N, 1]
    rec = jnp.concatenate(
        [c[..., 0], c[..., 1], d[..., 0], d[..., 1], n[..., 0], n[..., 1],
         an, area], axis=-1,
    )  # [G, N, 29]
    return jnp.pad(rec, ((0, 0), (0, 0), (0, _REC - rec.shape[-1])))


def _clip_dir(p0x, p0y, dx, dy, nx, ny, an):
    """One clip direction on [128, 128] broadcast tiles.

    p0x/p0y/dx/dy: 4-tuples of edge operands; nx/ny/an: 4-tuples of plane
    operands. Each element broadcasts to [128, 128] (edge operands vary over
    one tile axis, plane operands over the other — the caller picks which).
    Returns the Green's boundary contribution sum_e w_e * cross(u_e, v_e).
    """
    contrib = jnp.zeros((_BN, _BN), jnp.float32)
    for e in range(4):
        t_lo = jnp.zeros((_BN, _BN), jnp.float32)
        t_hi = jnp.ones((_BN, _BN), jnp.float32)
        on_b = jnp.zeros((_BN, _BN), jnp.bool_)
        killed = jnp.zeros((_BN, _BN), jnp.bool_)
        for p in range(4):
            num = p0x[e] * nx[p] + p0y[e] * ny[p] - an[p]
            den = dx[e] * nx[p] + dy[e] * ny[p]
            par = jnp.abs(den) < _EPS
            t_at = -num / jnp.where(par, 1.0, den)
            entry = den > 0
            t_lo = jnp.maximum(t_lo, jnp.where(entry & ~par, t_at, 0.0))
            t_hi = jnp.minimum(t_hi, jnp.where(~entry & ~par, t_at, 1.0))
            on_b = on_b | (par & (jnp.abs(num) <= _EPS))
            killed = killed | (par & (num < -_EPS))
        weight = jnp.where(on_b, 0.5, 1.0)
        t_lo = jnp.clip(t_lo, 0.0, 1.0)
        t_hi = jnp.clip(t_hi, 0.0, 1.0)
        ok = (t_hi > t_lo) & ~killed
        ux = p0x[e] + t_lo * dx[e]
        uy = p0y[e] + t_lo * dy[e]
        vx = p0x[e] + t_hi * dx[e]
        vy = p0y[e] + t_hi * dy[e]
        cr = ux * vy - vx * uy
        contrib = contrib + jnp.where(ok, cr, 0.0) * weight
    return contrib


def _iou_kernel(row_ref, col_ref, o_ref):
    """row_ref [1, 128, 32] (boxes i), col_ref [1, 32, 128] (boxes j)."""
    r = row_ref[0]  # [128, 32]
    c = col_ref[0]  # [32, 128]

    def rcol(k):  # record lane k of the row block -> [128, 1] column operand
        return r[:, k:k + 1]

    def crow(k):  # record lane k of the col block -> [1, 128] row operand
        return c[k:k + 1, :]

    def quad(base, pick):
        return tuple(pick(base + k) for k in range(4))

    # direction 1: edges of i (rows) clipped to planes of j (cols)
    t1 = _clip_dir(quad(0, rcol), quad(4, rcol), quad(8, rcol), quad(12, rcol),
                   quad(16, crow), quad(20, crow), quad(24, crow))
    # direction 2: edges of j (cols) clipped to planes of i (rows)
    t2 = _clip_dir(quad(0, crow), quad(4, crow), quad(8, crow), quad(12, crow),
                   quad(16, rcol), quad(20, rcol), quad(24, rcol))
    inter = 0.5 * jnp.abs(t1 + t2)
    ai, aj = rcol(28), crow(28)
    # physical bound: inter <= min(areas) — same fp blow-up guard as
    # rotated_iou_fast.rotated_iou_matrix_greens (coincident-edge pairs)
    inter = jnp.minimum(inter, jnp.minimum(ai, aj))
    union = ai + aj - inter
    o_ref[0] = jnp.where(union > 0, inter / union, 0.0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _iou_pallas(rowdat: jnp.ndarray, coldat: jnp.ndarray,
                interpret: bool = False) -> jnp.ndarray:
    # interpret is a STATIC jit arg: baking _interpret() into the trace would
    # let a mode flip (DAL3D_IOU=interpret -> pallas) silently reuse the
    # cached executable of the other mode for identical shapes
    G, Np, _ = rowdat.shape
    Mp = coldat.shape[-1]
    return pl.pallas_call(
        _iou_kernel,
        grid=(G, Np // _BN, Mp // _BN),
        in_specs=[
            pl.BlockSpec((1, _BN, _REC), lambda g, i, j: (g, i, 0)),
            pl.BlockSpec((1, _REC, _BN), lambda g, i, j: (g, 0, j)),
        ],
        out_specs=pl.BlockSpec((1, _BN, _BN), lambda g, i, j: (g, i, j)),
        out_shape=jax.ShapeDtypeStruct((G, Np, Mp), jnp.float32),
        interpret=interpret,
    )(rowdat, coldat)


def rotated_iou_matrix_greens_pallas(
    boxes1: jnp.ndarray, boxes2: jnp.ndarray
) -> jnp.ndarray:
    """Batched rotated-IoU matrices [G, N, M] for BEV boxes [G, *, 5].

    Drop-in batched twin of rotated_iou_fast.rotated_iou_matrix_greens
    (vmapped), computed by the tiled VMEM kernel. N/M are padded to 128
    internally; padded (zero) boxes produce IoU 0 rows/columns.
    """
    G, N, _ = boxes1.shape
    M = boxes2.shape[1]
    pn, pm = (-N) % _BN, (-M) % _BN
    rowdat = _pack_rowdat(jnp.pad(boxes1.astype(jnp.float32),
                                  ((0, 0), (0, pn), (0, 0))))
    coldat = jnp.swapaxes(
        _pack_rowdat(jnp.pad(boxes2.astype(jnp.float32),
                             ((0, 0), (0, pm), (0, 0)))), 1, 2)
    return _iou_pallas(rowdat, coldat, interpret=_interpret())[:, :N, :M]


def rotated_iou_matrix_batched(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """[G, N, 5] x [G, M, 5] -> [G, N, M]: Pallas tile kernel on TPU, the
    XLA Green's path elsewhere (DAL3D_IOU=xla|pallas|interpret overrides)."""
    if use_pallas():
        return rotated_iou_matrix_greens_pallas(boxes1, boxes2)
    from .rotated_iou_fast import rotated_iou_matrix_greens

    return jax.vmap(rotated_iou_matrix_greens)(boxes1, boxes2)
