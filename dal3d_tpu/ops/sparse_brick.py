"""Brick-packed sparse 3D convolution engine (the round-2 performance engine).

Replaces spconv's per-voxel gather-GEMM-scatter (reference
bevfusion/mmdet3d/ops/spconv/ops.py:128 ``indice_conv``; external spconv
1.2.1 for det3d/models/backbones/scn.py) with a layout built around three
measured TPU facts (tools/microbench.py, tools/profile_brick_ops.py):

  1. XLA row-gather costs ~8.6 ns/row independent of row width up to ~512 B,
     then saturates at ~100 GB/s — per-voxel rows (32-256 B) waste the issue
     slots; ~0.5-1 KB rows are the sweet spot.
  2. Lidar voxels cluster along W (ground runs, walls): a 16-voxel W-run
     ("brick") holds 2-10+ active voxels depending on level, so brick rows
     cut the gathered-row count by that factor.
  3. Any tensor with a trailing dim < 128 lanes pads 4-8x in memory AND
     bandwidth — so features never appear as [..., w, C] with small C; they
     stay flat [Mb, bw*C] (lane-aligned) and the conv kernel's w-structure
     lives in a banded weight matrix contracted in ONE einsum.

Data model (static shapes end-to-end):
  features  [B, Mb, bw*C]   w-major flat rows (view [B, Mb, bw, C])
  brick_lin [B, Mb] int32   brick cell (z*H + y)*(W/bw) + x/bw, ascending,
                            sentinel = D*H*(W/bw) on padding rows
  vmask     [B, Mb, bw]     exact spconv per-voxel active mask

A 3x3x3 submanifold conv:
  - 27 row-gathers per output brick (9 (dz,dy) x 3 w-neighbor bricks)
  - ONE MXU contraction: Y = einsum('bkjmx,kjxy->bmy', gathered, W_band)
    where W_band [9, 3, bw*Cin, bw*Cout] scatters the [27, Cin, Cout]
    kernel onto w-banded blocks (built per call from params; a few MB).

Strided ("SparseConv3d") downsample: the output active-brick set is planned
with a reduce_window max over the dense *brick* occupancy grid (a
conservative brick-granular superset; no device sort, no giant nonzero);
exact per-voxel validity is produced by pushing vmask through the same
banded contraction. Ghosts are re-zeroed after every op, so numerics match
exact spconv semantics wherever capacities are not exceeded.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from .sparse import SparseBatch, _triple


@struct.dataclass
class BrickBatch:
    features: jnp.ndarray  # [B, Mb, bw*C]
    brick_lin: jnp.ndarray  # [B, Mb] int32, ascending, sentinel-padded
    vmask: jnp.ndarray  # [B, Mb, bw] bool
    shape: Tuple[int, int, int] = struct.field(pytree_node=False)  # voxel (D, H, W)
    bw: int = struct.field(pytree_node=False)

    @property
    def wb(self) -> int:
        return self.shape[2] // self.bw

    @property
    def num_cells(self) -> int:
        D, H, W = self.shape
        return D * H * self.wb

    @property
    def valid(self) -> jnp.ndarray:  # [B, Mb] brick-level validity
        return self.brick_lin < self.num_cells

    @property
    def channels(self) -> int:
        return self.features.shape[-1] // self.bw

    def feat4(self) -> jnp.ndarray:
        """[B, Mb, bw, C] view (for per-channel ops like BN)."""
        B, Mb, _ = self.features.shape
        return self.features.reshape(B, Mb, self.bw, self.channels)


def _decode(cell, H, Wb):
    z = cell // (H * Wb)
    rem = cell % (H * Wb)
    return z, rem // Wb, rem % Wb


def _grid_from_lin(brick_lin: jnp.ndarray, nbc: int, mb: int) -> jnp.ndarray:
    rows = jnp.arange(mb, dtype=jnp.int32)
    grid = jnp.full((nbc + 1,), -1, jnp.int32)
    grid = grid.at[jnp.minimum(brick_lin, nbc)].set(
        jnp.where(brick_lin < nbc, rows, -1), mode="drop"
    )
    return grid.at[nbc].set(-1)


def build_brick_grid(bb: BrickBatch) -> jnp.ndarray:
    """[B, nbc+1] int32 brick-cell -> row index."""
    return jax.vmap(lambda lin: _grid_from_lin(lin, bb.num_cells, lin.shape[0]))(bb.brick_lin)


def _neighbor_lookup(brick_lin, grid, deltas, shape_bricks):
    """idx/hit [B, Q, Mb] for brick-cell offsets ``deltas`` [Q, 3] (dz,dy,dwb)."""
    D, H, Wb = shape_bricks
    nbc = D * H * Wb
    deltas_j = jnp.asarray(deltas)

    def per_batch(lin, g):
        z, y, wb = _decode(lin, H, Wb)
        q = jnp.stack([z, y, wb], -1)[None, :, :] + deltas_j[:, None, :]
        inb = jnp.all((q >= 0) & (q < jnp.asarray([D, H, Wb])), axis=-1)
        inb = inb & (lin < nbc)[None, :]
        qcell = jnp.where(inb, (q[..., 0] * H + q[..., 1]) * Wb + q[..., 2], nbc)
        idx = g[qcell]
        return jnp.maximum(idx, 0), idx >= 0

    return jax.vmap(per_batch)(brick_lin, grid)


def _gather_rows(rows: jnp.ndarray, idx: jnp.ndarray, hit: jnp.ndarray):
    """rows [B, Mb, R], idx/hit [B, Q, M] -> [B, Q, M, R] (misses zero)."""
    B, Mb, R = rows.shape
    Q, M = idx.shape[1], idx.shape[2]
    tbl = jnp.concatenate([rows, jnp.zeros((B, 1, R), rows.dtype)], axis=1)
    safe = jnp.where(hit, idx, Mb).reshape(B, Q * M, 1)
    g = jnp.take_along_axis(tbl, safe, axis=1)
    return g.reshape(B, Q, M, R)


def _compact_cells(cells: jnp.ndarray, nbc: int, cap: int) -> jnp.ndarray:
    """Dedup + compact a cell list [N] (sentinel nbc = invalid) to [cap].

    Never scans the dense grid: a last-writer-wins scatter picks one
    representative per cell, then a cumsum over the (already compact) list
    assigns slots. Scanning the grid instead (jnp.nonzero) costs ~25 ms per
    1.3M cells on this TPU — the grid scatter is the only O(nbc) op here and
    it's a memset-speed write. Output order = first-appearance order of the
    input list (not ascending cell); nothing downstream needs sorted order.
    """
    N = cells.shape[0]
    iota = jax.lax.broadcasted_iota(jnp.int32, (N,), 0)
    grid = jnp.full((nbc + 1,), -1, jnp.int32).at[jnp.minimum(cells, nbc)].set(
        iota, mode="drop"
    )
    win = (grid[jnp.minimum(cells, nbc)] == iota) & (cells < nbc)
    pos = jnp.cumsum(win.astype(jnp.int32)) - 1
    pos = jnp.where(win, pos, cap)
    return jnp.full((cap + 1,), nbc, jnp.int32).at[jnp.minimum(pos, cap)].set(
        jnp.where(win, cells, nbc).astype(jnp.int32), mode="drop"
    )[:cap]


def _wb_span(kw: int, bw: int):
    """dwb offsets a subm kernel of w-extent kw needs at brick width bw."""
    hw = (kw - 1) // 2
    r = -(-hw // bw)  # ceil
    return list(range(-r, r + 1)) if hw > 0 else [0]


def _band_matrix(Kzy: int, kw: int, sw: int, pw: int, b0: int, nwb: int,
                 bw_in: int, obw: int, weights: jnp.ndarray) -> jnp.ndarray:
    """Banded weight matrix [Kzy, nwb, bw_in*Cin, obw*Cout] from a
    [Kzy*kw, Cin, Cout] kernel.

    Output main col p with w-tap dw reads the input voxel at window-relative
    position r = sw*p - pw + dw - b0*bw_in, i.e. brick jb = r // bw_in,
    column r - jb*bw_in. The [Cin, Cout] kernel block for (k_zy, dw) lands at
    band[k_zy, jb, (r - jb*bw_in)*Cin + ci, p*Cout + co]."""
    Cin, Cout = weights.shape[-2], weights.shape[-1]
    S = np.zeros((kw, nwb, bw_in, obw), np.float32)
    for dw in range(kw):
        for p in range(obw):
            r = sw * p - pw + dw - b0 * bw_in
            jb, j = r // bw_in, r % bw_in
            if 0 <= jb < nwb:
                S[dw, jb, j, p] = 1.0
    wk = weights.reshape(Kzy, kw, Cin, Cout)
    band = jnp.einsum("djwp,kdio->kjwipo", jnp.asarray(S, weights.dtype), wk)
    return band.reshape(Kzy, nwb, bw_in * Cin, obw * Cout)


def subm_rulebook(bb: BrickBatch, kernel_size, grid: jnp.ndarray | None = None):
    """(idx [B, Q, Mb], hit) with Q = kd*kh*nwb; Q-major order (dz, dy, dwb)."""
    kd, kh, kw = _triple(kernel_size)
    if grid is None:
        grid = build_brick_grid(bb)
    dzs = np.arange(kd) - (kd - 1) // 2
    dys = np.arange(kh) - (kh - 1) // 2
    dwbs = np.array(_wb_span(kw, bb.bw))
    deltas = np.stack(np.meshgrid(dzs, dys, dwbs, indexing="ij"), -1).reshape(-1, 3)
    return _neighbor_lookup(
        bb.brick_lin, grid, deltas, (bb.shape[0], bb.shape[1], bb.wb)
    )


def subm_conv(bb: BrickBatch, weights: jnp.ndarray, rulebook=None,
              kernel_size=3) -> BrickBatch:
    """Submanifold sparse conv. weights [kd*kh*kw, Cin, Cout] in kernel-
    position (z-major) order — interchangeable with the per-voxel engines."""
    kd, kh, kw = _triple(kernel_size)
    if rulebook is None:
        rulebook = subm_rulebook(bb, kernel_size)
    idx, hit = rulebook
    bw, C = bb.bw, bb.channels
    Cout = weights.shape[-1]
    B, Mb = bb.brick_lin.shape
    hw = (kw - 1) // 2
    dwbs = _wb_span(kw, bw)
    nwb = len(dwbs)
    Kzy = kd * kh

    g = _gather_rows(bb.features, idx, hit).reshape(B, Kzy, nwb, Mb, bw * C)
    # subm maps onto the downsample formulation with s=1, p=hw, first brick
    # dwbs[0]: r = p + dw - hw - dwbs[0]*bw
    band = _band_matrix(Kzy, kw, 1, hw, dwbs[0], nwb, bw, bw, weights)
    out = jnp.einsum("bkjmx,kjxy->bmy", g, band, preferred_element_type=jnp.float32)
    out = out.astype(bb.features.dtype)
    out = out * jnp.repeat(bb.vmask, Cout, axis=-1)  # zero ghosts
    return bb.replace(features=out)


def _out_dim(n: int, k: int, s: int, p: int) -> int:
    return (n + 2 * p - k) // s + 1


def downsample_plan(bb: BrickBatch, kernel_size, stride, padding, out_bw: int,
                    out_cap: int):
    """Plan a strided sparse conv in brick space. Returns
    (out_lin [B, Mo], idx [B, Q, Mo], hit, out_shape, meta)."""
    kd, kh, kw = _triple(kernel_size)
    sd, sh, sw = _triple(stride)
    pd, ph, pw = _triple(padding)
    D, H, W = bb.shape
    bw, Wb = bb.bw, bb.wb
    Do, Ho, Wo = _out_dim(D, kd, sd, pd), _out_dim(H, kh, sh, ph), _out_dim(W, kw, sw, pw)
    assert Wo % out_bw == 0, f"output W={Wo} not divisible by out_bw={out_bw}"
    assert (sw * out_bw) % bw == 0, (
        f"stride_w*out_bw ({sw}*{out_bw}) must be a multiple of input bw={bw}"
    )
    A = (sw * out_bw) // bw  # input-brick advance per output brick
    w_start, w_end = -pw, sw * (out_bw - 1) - pw + kw - 1
    b0 = w_start // bw  # floor
    nwb = (w_end // bw) - b0 + 1
    Wbo = Wo // out_bw
    nbc_out = Do * Ho * Wbo

    # --- output active bricks: candidate generation + list compaction ------
    # out brick (zo,yo,wbo) reads input bricks (sd*zo-pd+dz, sh*yo-ph+dy,
    # A*wbo+b0+j); inverting, each input brick feeds at most ceil(k/s)
    # outputs per dim — enumerate those candidates and dedup-compact.
    nz_c = -(-kd // sd)
    ny_c = -(-kh // sh)
    nw_c = -(-nwb // A)
    cand_offs = np.stack(
        np.meshgrid(np.arange(nz_c), np.arange(ny_c), np.arange(nw_c), indexing="ij"),
        -1,
    ).reshape(-1, 3)
    cand_j = jnp.asarray(cand_offs)
    nbc_in = bb.num_cells

    def out_actives(lin):
        zi, yi, wi = _decode(lin, H, Wb)
        zo = (zi + pd) // sd - cand_j[:, 0:1]
        yo = (yi + ph) // sh - cand_j[:, 1:2]
        wo = jnp.floor_divide(wi - b0, A) - cand_j[:, 2:3]
        okz = (zo >= 0) & (zo < Do) & (sd * zo - pd <= zi[None, :]) & (
            zi[None, :] <= sd * zo - pd + kd - 1
        )
        oky = (yo >= 0) & (yo < Ho) & (sh * yo - ph <= yi[None, :]) & (
            yi[None, :] <= sh * yo - ph + kh - 1
        )
        okw = (wo >= 0) & (wo < Wbo) & (A * wo + b0 <= wi[None, :]) & (
            wi[None, :] <= A * wo + b0 + nwb - 1
        )
        ok = okz & oky & okw & (lin < nbc_in)[None, :]
        cells = jnp.where(ok, (zo * Ho + yo) * Wbo + wo, nbc_out)
        return _compact_cells(cells.reshape(-1), nbc_out, out_cap)

    out_lin = jax.vmap(out_actives)(bb.brick_lin)

    # --- rulebook -----------------------------------------------------------
    grid = build_brick_grid(bb)
    taps = np.stack(
        np.meshgrid(np.arange(kd), np.arange(kh), np.arange(nwb), indexing="ij"), -1
    ).reshape(-1, 3)
    taps_j = jnp.asarray(taps)
    nbc_in = bb.num_cells

    def per_batch(olin, g):
        zo, yo, wbo = _decode(olin, Ho, Wbo)
        zi = sd * zo[None, :] - pd + taps_j[:, 0:1]
        yi = sh * yo[None, :] - ph + taps_j[:, 1:2]
        wi = A * wbo[None, :] + b0 + taps_j[:, 2:3]
        inb = (
            (zi >= 0) & (zi < D) & (yi >= 0) & (yi < H) & (wi >= 0) & (wi < Wb)
            & (olin < nbc_out)[None, :]
        )
        qcell = jnp.where(inb, (zi * H + yi) * Wb + wi, nbc_in)
        return g[qcell]

    idx = jax.vmap(per_batch)(out_lin, grid)
    meta = dict(kd=kd, kh=kh, kw=kw, sw=sw, pw=pw, b0=b0, nwb=nwb)
    return out_lin, jnp.maximum(idx, 0), idx >= 0, (Do, Ho, Wo), meta


def downsample_conv(bb: BrickBatch, weights: jnp.ndarray, kernel_size, stride,
                    padding, out_bw: int, out_cap: int, plan=None) -> BrickBatch:
    """Strided (non-submanifold) sparse conv; weights [kd*kh*kw, Cin, Cout]."""
    if plan is None:
        plan = downsample_plan(bb, kernel_size, stride, padding, out_bw, out_cap)
    out_lin, idx, hit, out_shape, meta = plan
    kd, kh, kw, sw, pw = meta["kd"], meta["kh"], meta["kw"], meta["sw"], meta["pw"]
    b0, nwb = meta["b0"], meta["nwb"]
    Kzy = kd * kh
    bw, C = bb.bw, bb.channels
    Cout = weights.shape[-1]
    B, Mo = out_lin.shape

    g = _gather_rows(bb.features, idx, hit).reshape(B, Kzy, nwb, Mo, bw * C)
    band = _band_matrix(Kzy, kw, sw, pw, b0, nwb, bw, out_bw, weights)
    out = jnp.einsum("bkjmx,kjxy->bmy", g, band, preferred_element_type=jnp.float32)

    # exact per-voxel validity: vmask through the same (unweighted) band
    gv = _gather_rows(bb.vmask.astype(jnp.float32), idx, hit).reshape(
        B, Kzy, nwb, Mo, bw
    )
    Sv = np.zeros((nwb, bw, out_bw), np.float32)
    for dw in range(kw):
        for p in range(out_bw):
            r = sw * p - pw + dw - b0 * bw
            jb, j = r // bw, r % bw
            if 0 <= jb < nwb:
                Sv[jb, j, p] = 1.0
    out_v = jnp.einsum("bkjmw,jwp->bmp", gv, jnp.asarray(Sv))
    Do, Ho, Wo = out_shape
    nbc_out = Do * Ho * (Wo // out_bw)
    vmask_out = (out_v > 0.0) & (out_lin < nbc_out)[..., None]

    out = out.astype(bb.features.dtype)
    out = out * jnp.repeat(vmask_out, Cout, axis=-1)
    return BrickBatch(
        features=out, brick_lin=out_lin, vmask=vmask_out, shape=out_shape, bw=out_bw,
    )


def from_voxels(features: jnp.ndarray, coords_zyx: jnp.ndarray, valid: jnp.ndarray,
                shape, bw: int, mb_cap: int) -> BrickBatch:
    """Voxelizer output (any row order) -> BrickBatch.

    features [B, N, C], coords_zyx [B, N, 3], valid [B, N]. Overflowing
    bricks (beyond mb_cap, ascending cell order) are dropped."""
    D, H, W = (int(s) for s in shape)
    assert W % bw == 0, f"W={W} not divisible by brick width {bw}"
    Wb = W // bw
    nbc = D * H * Wb
    B, N, C = features.shape

    z, y, x = coords_zyx[..., 0], coords_zyx[..., 1], coords_zyx[..., 2]
    cell = (z * H + y) * Wb + x // bw
    cell = jnp.where(valid, cell, nbc).astype(jnp.int32)
    wpos = (x % bw).astype(jnp.int32)

    def per_batch(cell, wpos, feat, vld):
        brick_lin = _compact_cells(cell, nbc, mb_cap)
        grid = _grid_from_lin(brick_lin, nbc, mb_cap)
        row = grid[cell]
        ok = (row >= 0) & vld
        tgt = jnp.where(ok, row * bw + wpos, mb_cap * bw).astype(jnp.int32)
        # validity rides along as an extra channel: one scatter, not two
        fv = jnp.concatenate(
            [jnp.where(vld[:, None], feat, 0.0), ok[:, None].astype(feat.dtype)], axis=-1
        )
        buf = jnp.zeros((mb_cap * bw + 1, C + 1), feat.dtype).at[tgt].set(
            fv, mode="drop"
        )[:-1].reshape(mb_cap, bw, C + 1)
        return buf[..., :C].reshape(mb_cap, bw * C), brick_lin, buf[..., C] > 0

    feats, lins, vmasks = jax.vmap(per_batch)(cell, wpos, features, valid)
    return BrickBatch(features=feats, brick_lin=lins, vmask=vmasks, shape=(D, H, W), bw=bw)


def to_dense(bb: BrickBatch) -> jnp.ndarray:
    """[B, H, W, C*D] BEV map with channel = c*D + d (matches the per-voxel
    engines' to_dense / reference scn.py:389-391)."""
    B, Mb, _ = bb.features.shape
    bw, C = bb.bw, bb.channels
    D, H, W = bb.shape
    Wb = bb.wb
    nbc = bb.num_cells
    feat = bb.features * jnp.repeat(bb.vmask, C, axis=-1)

    def per_batch(f, lin):
        dense = jnp.zeros((nbc + 1, bw * C), f.dtype).at[jnp.minimum(lin, nbc)].set(
            jnp.where((lin < nbc)[:, None], f, 0.0), mode="drop"
        )[:-1]
        dense = dense.reshape(D, H, Wb, bw, C).reshape(D, H, W, C)
        return dense.transpose(1, 2, 3, 0).reshape(H, W, C * D)

    return jax.vmap(per_batch)(feat, bb.brick_lin)


def to_sparse(bb: BrickBatch, n_cap: int) -> SparseBatch:
    """BrickBatch -> per-voxel SparseBatch (interop/tests; not on hot path)."""
    B, Mb, _ = bb.features.shape
    bw, C = bb.bw, bb.channels
    D, H, W = bb.shape
    Wb = bb.wb
    sentinel = D * H * W
    z, y, wb = _decode(bb.brick_lin, H, Wb)
    base = (z * H + y) * W + wb * bw
    vlin = base[..., None] + jnp.arange(bw)[None, None, :]
    vlin = jnp.where(bb.vmask & bb.valid[..., None], vlin, sentinel).astype(jnp.int32)
    order = jnp.argsort(vlin.reshape(B, -1), axis=-1)[:, :n_cap]
    lin_s = jnp.take_along_axis(vlin.reshape(B, -1), order, axis=-1)
    feat = bb.feat4().reshape(B, Mb * bw, C)
    feat_s = jnp.take_along_axis(feat, order[..., None], axis=1)
    feat_s = jnp.where((lin_s < sentinel)[..., None], feat_s, 0.0)
    return SparseBatch(features=feat_s, lin=lin_s, shape=(D, H, W))


def from_sparse(sb: SparseBatch, bw: int, mb_cap: int) -> BrickBatch:
    """Per-voxel SparseBatch -> BrickBatch."""
    D, H, W = sb.shape
    return from_voxels(sb.features, sb.coords(), sb.valid, (D, H, W), bw, mb_cap)
