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
  brick_lin [B, Mb] int32   brick cell (z*H + y)*(W/bw) + x/bw in
                            first-appearance order (NOT sorted); padding rows
                            carry the sentinel D*H*(W/bw)
  vmask     [B, Mb, bw]     exact spconv per-voxel active mask

A 3x3x3 submanifold conv (halo-padded formulation):
  - rows are first halo-padded to [Mb, (bw+2)*C] by splicing in the last/
    first column of the left/right w-neighbor brick (2 narrow C-wide
    gathers) — the w-halo then lives IN the row, so the conv needs only
    9 full-row gathers (the (dz,dy) neighbors), not 27 (9 x 3 w-bricks):
    2.5x fewer gathered rows on the row-issue-bound path.
  - ONE MXU contraction: Y = einsum('bkmx,kxy->bmy', gathered, W_band)
    where W_band [9, (bw+2)*Cin, bw*Cout] scatters the [27, Cin, Cout]
    kernel onto w-shifted blocks (built per call from params; a few MB).

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
from jax import ad_checkpoint
import jax.numpy as jnp
import numpy as np
from flax import struct

from .sparse import SparseBatch, _triple


def _name_plan(t):
    """Tag plan/rulebook tensors with the "sparse_plan" checkpoint name so
    remat'd backbone blocks SAVE them instead of rebuilding rulebooks,
    compactions, and dual-gathers in the backward pass (policy
    ``save_only_these_names("sparse_plan")`` in models/backbones/scn.py;
    everything upstream — grids, neighbor lookups — then DCEs out of the
    recompute graph). A no-op outside jax.checkpoint."""
    return jax.tree_util.tree_map(
        lambda x: ad_checkpoint.checkpoint_name(x, "sparse_plan"), t)


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


def _neighbor_lookup_window(brick_lin, grid, kd, kh, shape_bricks):
    """Window-gather twin of _neighbor_lookup for centered (dz, dy, 0)
    stencils: ONE lax.gather of a [kd, kh] grid window per output row (M
    start indices) instead of kd*kh scalar gathers (Q*M indices) — the
    rulebook build is index-issue-bound like every gather on this TPU
    (ROADMAP round-1 facts), so fewer indices is the whole game. Tap order
    matches subm_rulebook's z-major (dz, dy) deltas."""
    D, H, Wb = shape_bricks
    nbc = D * H * Wb
    pz, py = (kd - 1) // 2, (kh - 1) // 2

    def per_batch(lin, g):
        z, y, wb = _decode(lin, H, Wb)
        g3 = jnp.pad(g[:nbc].reshape(D, H, Wb),
                     ((pz, kd - 1 - pz), (py, kh - 1 - py), (0, 0)),
                     constant_values=-1)
        starts = jnp.stack([z, y, wb], -1)  # pad shifts the window origin
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2, 3), collapsed_slice_dims=(),
            start_index_map=(0, 1, 2))
        win = jax.lax.gather(g3, starts, dn, slice_sizes=(kd, kh, 1),
                             mode=jax.lax.GatherScatterMode.CLIP)
        idx = jnp.swapaxes(win.reshape(lin.shape[0], kd * kh), 0, 1)
        idx = jnp.where((lin < nbc)[None, :], idx, -1)
        return jnp.maximum(idx, 0), idx >= 0

    return jax.vmap(per_batch)(brick_lin, grid)


def _use_window_rulebook() -> bool:
    import os

    return os.environ.get("DAL3D_RB_WINDOW", "0") == "1"


def _gather_rows(rows: jnp.ndarray, idx: jnp.ndarray, hit: jnp.ndarray):
    """rows [B, Mb, R], idx/hit [B, Q, M] -> [B, Q, M, R] (misses zero)."""
    B, Mb, R = rows.shape
    Q, M = idx.shape[1], idx.shape[2]
    tbl = jnp.concatenate([rows, jnp.zeros((B, 1, R), rows.dtype)], axis=1)
    safe = jnp.where(hit, idx, Mb).reshape(B, Q * M, 1)
    g = jnp.take_along_axis(tbl, safe, axis=1)
    return g.reshape(B, Q, M, R)


def _gather_rows_m(rows: jnp.ndarray, idx: jnp.ndarray, hit: jnp.ndarray):
    """rows [B, Mb, R], idx/hit [B, Q, M] -> [B, M, Q*R] (m-major: row m is
    the concatenation of its Q gathered taps, so the conv collapses to ONE
    [B*M, Q*R] x [Q*R, out] matmul — better MXU shape than Q batched ones)."""
    B, Mb, R = rows.shape
    Q, M = idx.shape[1], idx.shape[2]
    tbl = jnp.concatenate([rows, jnp.zeros((B, 1, R), rows.dtype)], axis=1)
    safe = jnp.where(hit, idx, Mb)
    safe = jnp.swapaxes(safe, 1, 2).reshape(B, M * Q, 1)  # [B, M*Q, 1]
    g = jnp.take_along_axis(tbl, safe, axis=1)
    return g.reshape(B, M, Q * R)


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


def _rank_grid(occ: jnp.ndarray, H: int, WbD: int):
    """y-major rank per cell from a [H*WbD] 0/1 occupancy grid (row-parallel
    cumsum; the 1.6M-element 1-D device sort alternative costs ~30 s,
    ROADMAP.md)."""
    cum = jnp.cumsum(occ.reshape(H, WbD), axis=-1)
    base = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                            jnp.cumsum(cum[:, -1])[:-1].astype(jnp.int32)])
    return (base[:, None] + cum - 1).reshape(H * WbD)


def _compact_cells_spatial(cells: jnp.ndarray, nbc: int, cap: int,
                           shape_bricks: Tuple[int, int, int]) -> jnp.ndarray:
    """Dedup + compact a cell list [N] to [cap] in y-major spatial order.

    Output rows sorted by (y, x_brick, z): every (dz, dy, dx) brick neighbor
    then lies within ~(3 x bricks-per-y-row) rows — the bounded-displacement
    property the banded gather kernel (ops.banded) is built on.

    Three list passes only (the scalar-index accesses are what this op is
    bound by, ~7-15 ns each on this TPU): occupancy scatter, rank gather,
    slot scatter. Duplicate cells write identical values at every step, so
    no last-writer-wins dedup pass is needed.

    Capacity overflow drops the HIGHEST-(y,x,z) bricks (far +y edge),
    deterministically. Overflow is observable via brick_stats()."""
    D, H, Wb = shape_bricks
    valid = cells < nbc
    # z-major cell -> y-major key
    z = cells // (H * Wb)
    rem = cells % (H * Wb)
    y, wb = rem // Wb, rem % Wb
    ykey = jnp.where(valid, (y * Wb + wb) * D + z, nbc).astype(jnp.int32)
    occ = jnp.zeros((nbc + 1,), jnp.int32).at[ykey].set(1, mode="drop")[:nbc]
    pos_grid = _rank_grid(occ, H, Wb * D)
    pos = pos_grid[jnp.minimum(ykey, nbc - 1)]
    tgt = jnp.where(valid, jnp.minimum(pos, cap), cap)
    return jnp.full((cap + 1,), nbc, jnp.int32).at[tgt].set(
        jnp.where(valid, cells, nbc).astype(jnp.int32), mode="drop"
    )[:cap]


def brick_stats(cand: jnp.ndarray, nbc: int, cap: int = 0) -> jnp.ndarray:
    """Active-brick count of a candidate list (observability: count > cap
    means the compaction truncated — ADVICE r2: capacity overflow must be
    visible). ``cap`` is documentation-only (the comparison happens at the
    caller). Returns a scalar int32 per call."""
    N = cand.shape[0]
    iota = jax.lax.broadcasted_iota(jnp.int32, (N,), 0)
    grid = jnp.full((nbc + 1,), -1, jnp.int32).at[jnp.minimum(cand, nbc)].set(
        iota, mode="drop"
    )
    win = (grid[jnp.minimum(cand, nbc)] == iota) & (cand < nbc)
    return win.sum().astype(jnp.int32)


def _wb_span(kw: int, bw: int):
    """dwb offsets a subm kernel of w-extent kw needs at brick width bw."""
    hw = (kw - 1) // 2
    r = -(-hw // bw)  # ceil
    return list(range(-r, r + 1)) if hw > 0 else [0]


def halo_indices(bb: BrickBatch, grid: jnp.ndarray | None = None):
    """(idx [B, 2, Mb], hit): rows of the left/right w-neighbor bricks."""
    if grid is None:
        grid = build_brick_grid(bb)
    deltas = np.array([[0, 0, -1], [0, 0, 1]])
    return _neighbor_lookup(
        bb.brick_lin, grid, deltas, (bb.shape[0], bb.shape[1], bb.wb)
    )


def _halo_pad(rows: jnp.ndarray, bw: int, hidx: jnp.ndarray, hhit: jnp.ndarray):
    """rows [B, Mb, bw*C] -> [B, Mb, (bw+2)*C]: splice the last column of the
    left brick and the first column of the right brick into each row (2
    full-row gathers + slice — a narrow C-wide table would lane-pad 8x)."""
    B, Mb, R = rows.shape
    C = R // bw
    tbl = jnp.concatenate([rows, jnp.zeros((B, 1, R), rows.dtype)], axis=1)
    lrow = jnp.where(hhit[:, 0], hidx[:, 0], Mb)
    rrow = jnp.where(hhit[:, 1], hidx[:, 1], Mb)
    left = jnp.take_along_axis(tbl, lrow[..., None], axis=1)[..., R - C:]
    right = jnp.take_along_axis(tbl, rrow[..., None], axis=1)[..., :C]
    return jnp.concatenate([left, rows, right], axis=-1)


def _halo_band(Kzy: int, kw: int, bw: int, weights: jnp.ndarray) -> jnp.ndarray:
    """[Kzy, (bw+2)*Cin, bw*Cout] banded weights for halo-padded rows.

    Padded column j holds input voxel w = j-1 (j=0 left halo, j=bw+1 right
    halo); output col p with w-tap dw reads padded col p + dw - hw + 1."""
    Cin, Cout = weights.shape[-2], weights.shape[-1]
    hw = (kw - 1) // 2
    assert hw <= 1, f"halo formulation supports kw<=3, got {kw}"
    S = np.zeros((kw, bw + 2, bw), np.float32)
    for dw in range(kw):
        for p in range(bw):
            S[dw, p + dw - hw + 1, p] = 1.0
    wk = weights.reshape(Kzy, kw, Cin, Cout)
    band = jnp.einsum("dwp,kdio->kwipo", jnp.asarray(S, weights.dtype), wk)
    return band.reshape(Kzy, (bw + 2) * Cin, bw * Cout)


def subm_rulebook(bb: BrickBatch, kernel_size, grid: jnp.ndarray | None = None):
    """(idx [B, Kzy, Mb], hit, halo_idx [B, 2, Mb], halo_hit): the (dz, dy)
    neighbor rows plus the left/right halo rows (w-taps live in-row)."""
    kd, kh, _ = _triple(kernel_size)
    if grid is None:
        grid = build_brick_grid(bb)
    shape_bricks = (bb.shape[0], bb.shape[1], bb.wb)
    if _use_window_rulebook():
        idx, hit = _neighbor_lookup_window(bb.brick_lin, grid, kd, kh,
                                           shape_bricks)
    else:
        dzs = np.arange(kd) - (kd - 1) // 2
        dys = np.arange(kh) - (kh - 1) // 2
        deltas = np.stack(
            np.meshgrid(dzs, dys, np.zeros(1, np.int64), indexing="ij"), -1
        ).reshape(-1, 3)
        idx, hit = _neighbor_lookup(bb.brick_lin, grid, deltas, shape_bricks)
    hidx, hhit = halo_indices(bb, grid)
    return _name_plan((idx, hit, hidx, hhit))


@struct.dataclass
class BandedSubmRulebook:
    """Shared banded plans for all SubM convs at one level (ops.banded).

    conv_plan: 9-tap (dz, dy) gather over the halo-padded table.
    pad_plan:  3-tap [left, self, right] gather that builds the halo-padded
               table itself as a banded matmul (cheaper than 2 XLA row
               gathers per conv at production scale)."""

    conv_plan: object
    pad_plan: object


def _pad_wband_np(bw: int, C: int, with_valid: bool) -> np.ndarray:
    """[3, R_in, pad128(R_out)] selection weights for the halo-pad banded
    call. R_in = bw*C (+bw if with_valid), out layout = (bw+2)*C features
    (then bw+2 validity), zero-padded to a 128 lane multiple."""
    from .banded import _pad128

    Cv = C + (1 if with_valid else 0)
    r_in = bw * Cv if with_valid else bw * C
    r_out = (bw + 2) * Cv if with_valid else (bw + 2) * C
    W = np.zeros((3, r_in, _pad128(r_out)), np.float32)
    fb_in = bw * C if with_valid else None  # valid block base (input)
    fb_out = (bw + 2) * C if with_valid else None
    for c in range(C):
        W[0, (bw - 1) * C + c, c] = 1.0  # left halo <- left brick's last col
        W[2, c, (bw + 1) * C + c] = 1.0  # right halo <- right brick's first col
        for w in range(bw):
            W[1, w * C + c, (w + 1) * C + c] = 1.0
    if with_valid:
        W[0, fb_in + bw - 1, fb_out] = 1.0
        W[2, fb_in, fb_out + bw + 1] = 1.0
        for w in range(bw):
            W[1, fb_in + w, fb_out + 1 + w] = 1.0
    return W


def _subm_band_statics(kernel_size, Mb: int, band: int, mid_band: int, bm: int,
                       pad_band: int):
    """Static knob derivation of the banded subm plans — ONE place shared by
    the device build and the host-plan reconstruction (a drifted copy would
    make shipped plans silently wrong).

    Conv taps of one dy cluster around a common rank offset (~one y-row
    pitch apart between groups) — per-dy slabs are ~3x narrower than one
    slab covering all taps, and the onehot MXU cost scales with the sum of
    per-tap bands. The dy-center group holds the dz=+-1 taps (rank-adjacent
    under y-major order) plus the direct-read self tap; mid_band >= bm is
    required by the self-tap floor."""
    kd, kh, _ = _triple(kernel_size)
    groups = tuple(tuple(iz * kh + iy for iz in range(kd)) for iy in range(kh))
    mid = kh // 2 if kh % 2 else None
    gbands = tuple(
        min(max(mid_band, bm) if iy == mid else band, (Mb // 16) * 16)
        for iy in range(kh)
    )
    self_tap = (kd * kh) // 2 if kd % 2 and kh % 2 else None
    return dict(
        conv=dict(groups=groups, bands=gbands, bm=bm, self_tap=self_tap),
        pad=dict(groups=((0, 1, 2),), bands=(min(pad_band, (Mb // 16) * 16),),
                 bm=bm, self_tap=1),
    )


def subm_rulebook_banded(bb: BrickBatch, kernel_size, grid: jnp.ndarray | None = None,
                         band: int = 768, bm: int = 128, fb_cap: int = 256,
                         symmetric: bool = True, pad_band: int = 192,
                         mid_band: int = 160, rb=None, host_arrays=None):
    """Banded-engine subm rulebook: standard rulebook + BandPlans.

    symmetric=False (predict path) skips the dual-entry symmetrization —
    exact forward either way; only the reversed-tap d/dtable shortcut needs
    it, and asymmetric plans fall back to the XLA scatter-add backward.

    pad_band: slab width of the halo-pad plan. Measured on lidar clouds the
    left/right halo rows sit within |idx-m| <= 3 of their output row (they
    are spatially adjacent bricks under the y-major compaction), so a narrow
    slab suffices; wider entries go to the exact fallback.

    host_arrays: loader-shipped BandPlan arrays (data/sparse_plans.py,
    prefixes conv_/pad_) — the plans are then reassembled with the SAME
    static knobs instead of rebuilt; host plans are always built
    symmetric=True (exact for predict too, required for the train backward).
    """
    from .banded import BandPlan, band_plan_fields, make_band_plan

    B, Mb = bb.brick_lin.shape
    band = min(band, (Mb // 16) * 16)
    statics = _subm_band_statics(kernel_size, Mb, band, mid_band, bm, pad_band)
    if host_arrays is not None:
        plans = {}
        for part in ("conv", "pad"):
            arrs = {f: host_arrays[f"{part}_{f}"] for f in band_plan_fields()}
            plans[part] = BandPlan(**arrs, **statics[part], symmetric=True)
        return BandedSubmRulebook(conv_plan=plans["conv"], pad_plan=plans["pad"])

    idx, hit, hidx, hhit = (rb if rb is not None
                            else subm_rulebook(bb, kernel_size, grid))
    self_idx = jnp.broadcast_to(
        jax.lax.broadcasted_iota(jnp.int32, (1, 1, Mb), 2), (B, 1, Mb)
    )
    pidx = jnp.concatenate([hidx[:, :1], self_idx, hidx[:, 1:2]], axis=1)
    phit = jnp.concatenate(
        [hhit[:, :1], jnp.ones((B, 1, Mb), bool), hhit[:, 1:2]], axis=1
    )
    cs, ps = statics["conv"], statics["pad"]
    conv_plan = make_band_plan(idx, hit, Mb, bm=bm, fb_cap=fb_cap,
                               symmetric=symmetric, self_tap=cs["self_tap"],
                               groups=cs["groups"], group_bands=cs["bands"])
    pad_plan = make_band_plan(pidx, phit, Mb, ps["bands"][0], bm,
                              max(fb_cap // 2, 64), symmetric=symmetric,
                              self_tap=1)
    return BandedSubmRulebook(conv_plan=conv_plan, pad_plan=pad_plan)


def _subm_conv_banded(bb: BrickBatch, weights: jnp.ndarray,
                      rb: BandedSubmRulebook, kernel_size) -> BrickBatch:
    from .banded import _pad128, banded_gather_matmul

    kd, kh, kw = _triple(kernel_size)
    Kzy = kd * kh
    bw, C = bb.bw, bb.channels
    Cout = weights.shape[-1]
    dt = bb.features.dtype
    pad_w = jnp.asarray(_pad_wband_np(bw, C, with_valid=False), dt)
    padded = banded_gather_matmul(bb.features, pad_w, rb.pad_plan)
    band_w = _halo_band(Kzy, kw, bw, weights)  # [Kzy, (bw+2)C, bw*Cout]
    R2p = _pad128((bw + 2) * C)
    if band_w.shape[1] != R2p:
        band_w = jnp.pad(band_w, ((0, 0), (0, R2p - band_w.shape[1]), (0, 0)))
    out = banded_gather_matmul(padded, band_w, rb.conv_plan)
    out = out.astype(dt) * jnp.repeat(bb.vmask, Cout, axis=-1)
    return bb.replace(features=out)


def subm_conv(bb: BrickBatch, weights: jnp.ndarray, rulebook=None,
              kernel_size=3) -> BrickBatch:
    """Submanifold sparse conv. weights [kd*kh*kw, Cin, Cout] in kernel-
    position (z-major) order — interchangeable with the per-voxel engines."""
    kd, kh, kw = _triple(kernel_size)
    if isinstance(rulebook, BandedSubmRulebook):
        return _subm_conv_banded(bb, weights, rulebook, kernel_size)
    if rulebook is None:
        rulebook = subm_rulebook(bb, kernel_size)
    idx, hit, hidx, hhit = rulebook
    bw, C = bb.bw, bb.channels
    Cout = weights.shape[-1]
    B, Mb = bb.brick_lin.shape
    Kzy = kd * kh

    padded = _halo_pad(bb.features, bw, hidx, hhit)  # [B, Mb, (bw+2)*C]
    g = _gather_rows(padded, idx, hit)  # [B, Kzy, Mb, (bw+2)*C]
    band = _halo_band(Kzy, kw, bw, weights)
    out = jnp.einsum("bkmx,kxy->bmy", g, band, preferred_element_type=jnp.float32)
    out = out.astype(bb.features.dtype)
    out = out * jnp.repeat(bb.vmask, Cout, axis=-1)  # zero ghosts
    return bb.replace(features=out)


def _out_dim(n: int, k: int, s: int, p: int) -> int:
    return (n + 2 * p - k) // s + 1


def downsample_static_meta(shape, bw: int, kernel_size, stride, padding,
                           out_bw: int):
    """Static (shape-only) part of downsample_plan: (out_shape, meta).
    Shared with the host-plan path, which reconstructs device plan tuples
    from shipped arrays + this static meta."""
    kd, kh, kw = _triple(kernel_size)
    sd, sh, sw = _triple(stride)
    pd, ph, pw = _triple(padding)
    D, H, W = (int(s) for s in shape)
    Do, Ho, Wo = _out_dim(D, kd, sd, pd), _out_dim(H, kh, sh, ph), _out_dim(W, kw, sw, pw)
    assert Wo % out_bw == 0, f"output W={Wo} not divisible by out_bw={out_bw}"
    assert (sw * out_bw) % bw == 0, (
        f"stride_w*out_bw ({sw}*{out_bw}) must be a multiple of input bw={bw}"
    )
    w_start, w_end = -pw, sw * (out_bw - 1) - pw + kw - 1
    # (b0h, nwb_h): halo-padded bricks covering the window for the GATHER —
    # padded brick b spans voxels [b*bw - 1, b*bw + bw], so fewer bricks
    # (and so fewer gathered rows) cover the same [w_start, w_end]
    assert pw <= 1, f"halo downsample supports padding_w<=1, got {pw}"
    b0h = (w_start + 1) // bw  # floor; covers w_start via its left halo
    nwb_h = max(1, -(-(w_end - b0h * bw) // bw))
    meta = dict(kd=kd, kh=kh, kw=kw, sw=sw, pw=pw, b0h=b0h, nwb_h=nwb_h)
    return (Do, Ho, Wo), meta


def downsample_plan(bb: BrickBatch, kernel_size, stride, padding, out_bw: int,
                    out_cap: int, grid: jnp.ndarray | None = None,
                    spatial: bool = False):
    """Plan a strided sparse conv in brick space. Returns
    (out_lin [B, Mo], idx [B, Q, Mo], hit, out_shape, meta)."""
    kd, kh, kw = _triple(kernel_size)
    sd, sh, sw = _triple(stride)
    pd, ph, pw = _triple(padding)
    D, H, W = bb.shape
    bw, Wb = bb.bw, bb.wb
    (Do, Ho, Wo), meta_s = downsample_static_meta(
        bb.shape, bw, kernel_size, stride, padding, out_bw)
    A = (sw * out_bw) // bw  # input-brick advance per output brick
    w_start, w_end = -pw, sw * (out_bw - 1) - pw + kw - 1
    b0h, nwb_h = meta_s["b0h"], meta_s["nwb_h"]
    Wbo = Wo // out_bw
    nbc_out = Do * Ho * Wbo

    # --- output active bricks ---------------------------------------------
    # out brick (zo,yo,wbo) reads input bricks (sd*zo-pd+dz, sh*yo-ph+dy,
    # A*wbo+b0+j). The w window is EXTENDED by one output voxel each side
    # (b0e/nwbe): an output brick must also materialize when its halo voxel
    # (the edge voxel of the w-neighbor output brick) is active, for
    # downstream halo-padded gathers (same dilation rule as from_voxels,
    # expressed on the input set).
    w_start_e, w_end_e = -sw - pw, sw * out_bw - pw + kw - 1
    b0e = w_start_e // bw
    nwbe = (w_end_e // bw) - b0e + 1
    nbc_in = bb.num_cells
    if grid is None:
        grid = build_brick_grid(bb)

    if spatial:
        # Dense stencil: output occupancy = OR over the kd*kh*nwbe window
        # reads of the input occupancy grid — strided slices of a padded
        # grid, no candidate lists at all. Ranks come from the y-major
        # row-parallel cumsum; the only scalar-index pass left is the
        # nbc_out-sized slot scatter (the 8-candidates-per-input list this
        # replaces cost 5 passes x 8*Mb accesses).
        pz0 = max(0, pd)
        pz1 = max(0, sd * (Do - 1) - pd + kd - 1 - (D - 1))
        py0 = max(0, ph)
        py1 = max(0, sh * (Ho - 1) - ph + kh - 1 - (H - 1))
        pw0 = max(0, -b0e)
        pw1 = max(0, A * (Wbo - 1) + b0e + nwbe - 1 - (Wb - 1))

        def out_actives_dense(g):
            occ = (g[:nbc_in] >= 0).reshape(D, H, Wb)
            occ = jnp.pad(occ, ((pz0, pz1), (py0, py1), (pw0, pw1)))
            acc = None
            for dz in range(kd):
                for dy in range(kh):
                    for dwb in range(nwbe):
                        s = jax.lax.slice(
                            occ,
                            (pz0 - pd + dz, py0 - ph + dy, pw0 + b0e + dwb),
                            (pz0 - pd + dz + sd * (Do - 1) + 1,
                             py0 - ph + dy + sh * (Ho - 1) + 1,
                             pw0 + b0e + dwb + A * (Wbo - 1) + 1),
                            (sd, sh, A),
                        )
                        acc = s if acc is None else (acc | s)
            occ_y = acc.transpose(1, 2, 0).reshape(-1)  # ykey order
            pos = _rank_grid(occ_y.astype(jnp.int32), Ho, Wbo * Do)
            tgt = jnp.where(occ_y, jnp.minimum(pos, out_cap), out_cap)
            ky = jax.lax.broadcasted_iota(jnp.int32, (nbc_out,), 0)
            oky = jnp.full((out_cap + 1,), -1, jnp.int32).at[tgt].set(
                ky, mode="drop")[:out_cap]
            zz, rr = oky % Do, oky // Do
            return jnp.where(
                oky >= 0, (zz * Ho + rr // Wbo) * Wbo + rr % Wbo, nbc_out
            ).astype(jnp.int32)

        out_lin = jax.vmap(out_actives_dense)(grid)
    else:
        # first-appearance order: invert the window per input brick — each
        # feeds at most ceil(k/s) outputs per dim — and dedup-compact.
        nz_c = -(-kd // sd)
        ny_c = -(-kh // sh)
        nw_c = -(-nwbe // A)
        cand_offs = np.stack(
            np.meshgrid(np.arange(nz_c), np.arange(ny_c), np.arange(nw_c),
                        indexing="ij"), -1,
        ).reshape(-1, 3)
        cand_j = jnp.asarray(cand_offs)

        def out_actives(lin):
            zi, yi, wi = _decode(lin, H, Wb)
            zo = (zi + pd) // sd - cand_j[:, 0:1]
            yo = (yi + ph) // sh - cand_j[:, 1:2]
            wo = jnp.floor_divide(wi - b0e, A) - cand_j[:, 2:3]
            okz = (zo >= 0) & (zo < Do) & (sd * zo - pd <= zi[None, :]) & (
                zi[None, :] <= sd * zo - pd + kd - 1
            )
            oky = (yo >= 0) & (yo < Ho) & (sh * yo - ph <= yi[None, :]) & (
                yi[None, :] <= sh * yo - ph + kh - 1
            )
            okw = (wo >= 0) & (wo < Wbo) & (A * wo + b0e <= wi[None, :]) & (
                wi[None, :] <= A * wo + b0e + nwbe - 1
            )
            ok = okz & oky & okw & (lin < nbc_in)[None, :]
            cells = jnp.where(ok, (zo * Ho + yo) * Wbo + wo, nbc_out)
            return _compact_cells(cells.reshape(-1), nbc_out, out_cap)

        out_lin = jax.vmap(out_actives)(bb.brick_lin)

    # --- rulebook (halo-padded input bricks) -------------------------------
    taps = np.stack(
        np.meshgrid(np.arange(kd), np.arange(kh), np.arange(nwb_h), indexing="ij"), -1
    ).reshape(-1, 3)
    taps_j = jnp.asarray(taps)
    nbc_in = bb.num_cells

    def per_batch(olin, g):
        zo, yo, wbo = _decode(olin, Ho, Wbo)
        zi = sd * zo[None, :] - pd + taps_j[:, 0:1]
        yi = sh * yo[None, :] - ph + taps_j[:, 1:2]
        wi = A * wbo[None, :] + b0h + taps_j[:, 2:3]
        inb = (
            (zi >= 0) & (zi < D) & (yi >= 0) & (yi < H) & (wi >= 0) & (wi < Wb)
            & (olin < nbc_out)[None, :]
        )
        qcell = jnp.where(inb, (zi * H + yi) * Wb + wi, nbc_in)
        return g[qcell]

    idx = jax.vmap(per_batch)(out_lin, grid)
    hidx, hhit = halo_indices(bb, grid)
    meta = meta_s
    out_lin, idx_c, hit, hidx, hhit = _name_plan(
        (out_lin, jnp.maximum(idx, 0), idx >= 0, hidx, hhit))
    return out_lin, idx_c, hit, (Do, Ho, Wo), meta, hidx, hhit


def _down_tap(sw: int, pw: int, dw: int, p: int, b0h: int, nwb_h: int, bw: int):
    """(jb, col): covering halo-padded brick + padded column of input voxel
    r = sw*p - pw + dw. Padded brick b0h+jb spans [.. *bw - 1, .. *bw + bw]."""
    r = sw * p - pw + dw
    jb = min(max((r - b0h * bw) // bw, 0), nwb_h - 1)
    col = r - (b0h + jb) * bw + 1
    assert 0 <= col <= bw + 1, (r, jb, col)
    return jb, col


def downsample_conv(bb: BrickBatch, weights: jnp.ndarray, kernel_size, stride,
                    padding, out_bw: int, out_cap: int, plan=None,
                    grid: jnp.ndarray | None = None) -> BrickBatch:
    """Strided (non-submanifold) sparse conv; weights [kd*kh*kw, Cin, Cout]."""
    if plan is None:
        plan = downsample_plan(bb, kernel_size, stride, padding, out_bw, out_cap, grid)
    out_lin, idx, hit, out_shape, meta, hidx, hhit = plan
    kd, kh, kw, sw, pw = meta["kd"], meta["kh"], meta["kw"], meta["sw"], meta["pw"]
    b0h, nwb_h = meta["b0h"], meta["nwb_h"]
    Kzy = kd * kh
    bw, C = bb.bw, bb.channels
    Cin, Cout = weights.shape[-2], weights.shape[-1]
    B, Mo = out_lin.shape

    # ONE m-major gather carries features AND a validity segment per row
    # (the separate vmask gather would double the gathered-row count, and
    # rows are what this path is bound by); ONE combined matmul then yields
    # [conv output | per-voxel validity] — the validity block of the band is
    # the unweighted tap-indicator.
    R = bw * C
    R2 = (bw + 2) * (C + 1)
    rows_v = jnp.concatenate(
        [bb.features, bb.vmask.astype(bb.features.dtype)], axis=-1
    )  # [B, Mb, R + bw]
    B_, Mb = bb.brick_lin.shape
    tbl = jnp.concatenate([rows_v, jnp.zeros((B_, 1, R + bw), rows_v.dtype)], axis=1)
    lrow = jnp.where(hhit[:, 0], hidx[:, 0], Mb)
    rrow = jnp.where(hhit[:, 1], hidx[:, 1], Mb)
    left = jnp.take_along_axis(tbl, lrow[..., None], axis=1)
    right = jnp.take_along_axis(tbl, rrow[..., None], axis=1)
    padded = jnp.concatenate([
        left[..., R - C:R], bb.features, right[..., :C],      # (bw+2)*C feats
        left[..., R + bw - 1:], rows_v[..., R:], right[..., R:R + 1],  # bw+2 valid
    ], axis=-1)  # [B, Mb, R2]

    Q = idx.shape[1]  # Kzy * nwb_h
    g = _gather_rows_m(padded, idx, hit)  # [B, Mo, Q*R2]

    S = np.zeros((kw, nwb_h, bw + 2, out_bw), np.float32)
    for dw in range(kw):
        for p in range(out_bw):
            jb, col = _down_tap(sw, pw, dw, p, b0h, nwb_h, bw)
            S[dw, jb, col, p] = 1.0
    wk = weights.reshape(Kzy, kw, Cin, Cout)
    band_f = jnp.einsum("djwp,kdio->kjwipo", jnp.asarray(S, weights.dtype), wk)
    band_f = band_f.reshape(Kzy, nwb_h, (bw + 2) * Cin, out_bw * Cout)
    dt = weights.dtype
    top = jnp.concatenate(
        [band_f, jnp.zeros((Kzy, nwb_h, (bw + 2) * Cin, out_bw), dt)], axis=-1
    )
    bv = jnp.broadcast_to(
        jnp.asarray(S.sum(0), dt)[None], (Kzy, nwb_h, bw + 2, out_bw)
    )
    bot = jnp.concatenate(
        [jnp.zeros((Kzy, nwb_h, bw + 2, out_bw * Cout), dt), bv], axis=-1
    )
    bigband = jnp.concatenate([top, bot], axis=2).reshape(
        Q * R2, out_bw * Cout + out_bw
    )
    out_all = jnp.einsum("bmx,xy->bmy", g, bigband, preferred_element_type=jnp.float32)
    out = out_all[..., : out_bw * Cout]
    out_v = out_all[..., out_bw * Cout:]
    Do, Ho, Wo = out_shape
    nbc_out = Do * Ho * (Wo // out_bw)
    vmask_out = (out_v > 0.5) & (out_lin < nbc_out)[..., None]

    out = out.astype(bb.features.dtype)
    out = out * jnp.repeat(vmask_out, Cout, axis=-1)
    return BrickBatch(
        features=out, brick_lin=out_lin, vmask=vmask_out, shape=out_shape, bw=out_bw,
    )


def downsample_band_statics(Mb: int, band: int, bm: int, kd: int, kh: int,
                            nwb_h: int):
    """Static knobs of the banded strided-conv plans — shared by the device
    build and the host-plan reconstruction. Conv taps grouped by input dy:
    each dy row's taps (all dz, dwb) cluster around one rank offset; the
    dz/dwb jitter plus the ~(Mb_in/Mo)-scaled block span fit a slab far
    narrower than one covering all dy rows. Pad halo rows are adjacent
    (|idx-m| <= 3) so a narrow pad slab suffices."""
    cband = min(band, (Mb // 16) * 16)
    dgroups = tuple(
        tuple((iz * kh + iy) * nwb_h + iw
              for iz in range(kd) for iw in range(nwb_h))
        for iy in range(kh)
    )
    return dict(
        conv=dict(groups=dgroups, bands=(cband,) * kh, bm=bm, self_tap=None),
        pad=dict(groups=((0, 1, 2),), bands=(min(192, (Mb // 16) * 16),),
                 bm=bm, self_tap=1),
    )


def downsample_band_plans(plan, Mb: int, band: int, bm: int, fb_cap: int,
                          symmetric_pad: bool):
    """(pad_plan, conv_plan) of a banded strided conv from its downsample
    plan tuple — the device path builds them per call; the host pyramid
    (data/sparse_plans.py) runs this same function on CPU and ships the
    arrays."""
    from .banded import make_band_plan

    out_lin, idx, hit, out_shape, meta, hidx, hhit = plan
    B = out_lin.shape[0]
    statics = downsample_band_statics(Mb, band, bm, meta["kd"], meta["kh"],
                                      meta["nwb_h"])
    self_idx = jnp.broadcast_to(
        jax.lax.broadcasted_iota(jnp.int32, (1, 1, Mb), 2), (B, 1, Mb)
    )
    pidx = jnp.concatenate([hidx[:, :1], self_idx, hidx[:, 1:2]], axis=1)
    phit = jnp.concatenate(
        [hhit[:, :1], jnp.ones((B, 1, Mb), bool), hhit[:, 1:2]], axis=1
    )
    ps, cs = statics["pad"], statics["conv"]
    pad_plan = make_band_plan(pidx, phit, Mb, ps["bands"][0], bm,
                              max(fb_cap // 2, 64), symmetric=symmetric_pad,
                              self_tap=1)
    conv_plan = make_band_plan(idx, hit, Mb, bm=bm, fb_cap=fb_cap,
                               symmetric=False, groups=cs["groups"],
                               group_bands=cs["bands"])
    return pad_plan, conv_plan


def downsample_band_from_arrays(host_arrays, Mb: int, band: int, bm: int,
                                meta: dict):
    """Reassemble (pad_plan, conv_plan) from loader-shipped arrays with the
    same static knobs (host plans are built symmetric_pad=True)."""
    from .banded import BandPlan, band_plan_fields

    statics = downsample_band_statics(Mb, band, bm, meta["kd"], meta["kh"],
                                      meta["nwb_h"])
    plans = {}
    for part, sym in (("pad", True), ("conv", False)):
        arrs = {f: host_arrays[f"{part}_{f}"] for f in band_plan_fields()}
        plans[part] = BandPlan(**arrs, **statics[part], symmetric=sym)
    return plans["pad"], plans["conv"]


def downsample_conv_banded(bb: BrickBatch, weights: jnp.ndarray, kernel_size,
                           stride, padding, out_bw: int, out_cap: int,
                           band: int = 1024, bm: int = 128, fb_cap: int = 512,
                           plan=None, grid: jnp.ndarray | None = None,
                           symmetric_pad: bool = True,
                           band_arrays=None) -> BrickBatch:
    """Strided sparse conv on the banded engine: the combined
    [features | validity] halo-padded table is built by a 3-tap banded
    matmul, then the Q = kd*kh*nwb_h tap gather+conv runs as one banded
    kernel (exact out-of-band fallback; not tap-symmetric, so the d/dtable
    backward is an XLA scatter-add). band_arrays: loader-shipped BandPlan
    arrays (requires ``plan`` to be host-shipped too)."""
    from .banded import _pad128, banded_gather_matmul

    if plan is None:
        plan = downsample_plan(bb, kernel_size, stride, padding, out_bw, out_cap,
                               grid, spatial=True)
    out_lin, idx, hit, out_shape, meta, hidx, hhit = plan
    kd, kh, kw, sw, pw = meta["kd"], meta["kh"], meta["kw"], meta["sw"], meta["pw"]
    b0h, nwb_h = meta["b0h"], meta["nwb_h"]
    Kzy = kd * kh
    bw, C = bb.bw, bb.channels
    Cin, Cout = weights.shape[-2], weights.shape[-1]
    B, Mo = out_lin.shape
    Mb = bb.brick_lin.shape[1]
    dt = bb.features.dtype

    if band_arrays is not None:
        pad_plan, conv_plan = downsample_band_from_arrays(
            band_arrays, Mb, band, bm, meta)
    else:
        pad_plan, conv_plan = downsample_band_plans(
            plan, Mb, band, bm, fb_cap, symmetric_pad)
    rows_v = jnp.concatenate([bb.features, bb.vmask.astype(dt)], axis=-1)
    pad_w = jnp.asarray(_pad_wband_np(bw, C, with_valid=True), dt)
    padded = banded_gather_matmul(rows_v, pad_w, pad_plan)  # [B, Mb, R2p]

    # per-tap block-diagonal weights [Q, R2p, Routt]
    R2 = (bw + 2) * (C + 1)
    R2p = _pad128(R2)
    Routt = out_bw * Cout + out_bw
    S = np.zeros((kw, nwb_h, bw + 2, out_bw), np.float32)
    for dw in range(kw):
        for p in range(out_bw):
            jb, col = _down_tap(sw, pw, dw, p, b0h, nwb_h, bw)
            S[dw, jb, col, p] = 1.0
    wk = weights.reshape(Kzy, kw, Cin, Cout)
    band_f = jnp.einsum("djwp,kdio->kjwipo", jnp.asarray(S, weights.dtype), wk)
    band_f = band_f.reshape(Kzy, nwb_h, (bw + 2) * Cin, out_bw * Cout)
    bv = jnp.broadcast_to(
        jnp.asarray(S.sum(0), weights.dtype)[None], (Kzy, nwb_h, bw + 2, out_bw)
    )
    Q = Kzy * nwb_h
    wq = jnp.zeros((Kzy, nwb_h, R2p, Routt), weights.dtype)
    wq = wq.at[:, :, : (bw + 2) * Cin, : out_bw * Cout].set(band_f)
    wq = wq.at[:, :, (bw + 2) * Cin : R2, out_bw * Cout :].set(bv)
    wq = wq.reshape(Q, R2p, Routt)

    out_all = banded_gather_matmul(padded, wq, conv_plan)  # [B, Mo, Routt]
    out = out_all[..., : out_bw * Cout]
    out_v = out_all[..., out_bw * Cout:]
    Do, Ho, Wo = out_shape
    nbc_out = Do * Ho * (Wo // out_bw)
    vmask_out = (out_v.astype(jnp.float32) > 0.5) & (out_lin < nbc_out)[..., None]
    out = out.astype(dt) * jnp.repeat(vmask_out, Cout, axis=-1)
    return BrickBatch(
        features=out, brick_lin=out_lin, vmask=vmask_out, shape=out_shape, bw=out_bw,
    )


def _brick_candidates(coords_zyx: jnp.ndarray, valid: jnp.ndarray, shape, bw: int):
    """Candidate brick cells (incl. halo dilation) of a voxel list.

    Returns (cand [B, >=N], cell [B, N], wpos [B, N], nbc, Wb)."""
    D, H, W = (int(s) for s in shape)
    assert W % bw == 0, f"W={W} not divisible by brick width {bw}"
    Wb = W // bw
    nbc = D * H * Wb

    z, y, x = coords_zyx[..., 0], coords_zyx[..., 1], coords_zyx[..., 2]
    cell = (z * H + y) * Wb + x // bw
    cell = jnp.where(valid, cell, nbc).astype(jnp.int32)
    wpos = (x % bw).astype(jnp.int32)
    # halo dilation: a brick whose halo column holds an active voxel must be
    # materialized (vmask-empty) so the halo-padded gathers can read it —
    # exactly the bricks adjacent to voxels sitting on a brick edge. A voxel
    # sits on at most ONE edge (bw >= 2), so a single merged dilation column
    # suffices — candidate-list passes are the pack cost.
    if bw >= 2:
        dil = jnp.where(
            valid & (wpos == 0) & (x // bw > 0), cell - 1,
            jnp.where(valid & (wpos == bw - 1) & (x // bw < Wb - 1), cell + 1, nbc),
        )
        cand = jnp.concatenate([cell, dil.astype(jnp.int32)], -1)
    else:  # bw == 1: a voxel is both edges at once
        dil_l = jnp.where(valid & (x // bw > 0), cell - 1, nbc)
        dil_r = jnp.where(valid & (x // bw < Wb - 1), cell + 1, nbc)
        cand = jnp.concatenate(
            [cell, dil_l.astype(jnp.int32), dil_r.astype(jnp.int32)], -1)
    return cand, cell, wpos, nbc, Wb


def count_active_bricks(coords_zyx: jnp.ndarray, valid: jnp.ndarray, shape,
                        bw: int) -> jnp.ndarray:
    """TRUE (uncapped) active-brick count [B] a from_voxels pack would need —
    capacity observability (ADVICE r2): compare against mb_cap to detect
    silent truncation before/while training."""
    cand, _, _, nbc, _ = _brick_candidates(coords_zyx, valid, shape, bw)
    return jax.vmap(lambda c: brick_stats(c, nbc))(cand)


# batch keys of a host-computed sparse plan pyramid (data/sparse_plans.py):
# L0 pack + per-level subm rulebooks (9 conv taps + 2 halo, -1 = miss) and
# strided-downsample plans; consumed by models/backbones/scn.py
HOST_PLAN_KEYS = (
    "brick_row", "brick_lin",
    "rb0", "ds1_lin", "ds1_idx",
    "rb1", "ds2_lin", "ds2_idx",
    "rb2", "ds3_lin", "ds3_idx",
    "rb3", "ds4_lin", "ds4_idx",
)
# banded engine additionally ships BandPlan arrays under "bp_<plan>_<field>"
# keys (bp_rb{0..3}_{conv,pad}_*, bp_ds{1..4}_{conv,pad}_*)
HOST_PLAN_PREFIX = "bp_"


def host_plan_batch_keys(batch) -> tuple:
    """The host-plan keys present in a batch/example dict (pyramid + banded)."""
    return tuple(k for k in batch
                 if k in HOST_PLAN_KEYS or k.startswith(HOST_PLAN_PREFIX))


def plan_subdict(plan: dict, prefix: str):
    """Strip-prefix sub-dict of a plan dict, or None when absent."""
    d = {k[len(prefix):]: v for k, v in plan.items() if k.startswith(prefix)}
    return d or None


def pack_host_rulebook(rulebook) -> jnp.ndarray:
    """subm_rulebook tuple -> one [B, 11, Mb] int32 array (-1 = miss):
    rows 0-8 the (dz, dy) conv taps, 9/10 the left/right halo rows."""
    idx, hit, hidx, hhit = rulebook
    return jnp.concatenate(
        [jnp.where(hit, idx, -1), jnp.where(hhit, hidx, -1)], axis=1
    ).astype(jnp.int32)


def unpack_host_rulebook(rb: jnp.ndarray):
    """[B, 11, Mb] int32 -> the (idx, hit, hidx, hhit) subm_rulebook tuple."""
    idx, hidx = rb[:, :9], rb[:, 9:]
    return (jnp.maximum(idx, 0), idx >= 0, jnp.maximum(hidx, 0), hidx >= 0)


def host_downsample_plan(bb: BrickBatch, kernel_size, stride, padding,
                         out_bw: int, ds_lin: jnp.ndarray, ds_idx: jnp.ndarray,
                         rb: jnp.ndarray):
    """Reassemble a downsample_plan tuple from host-shipped arrays: the
    dynamic parts (output bricks ds_lin, rulebook ds_idx with -1 = miss, and
    the input level's halo rows from its packed rulebook ``rb``) plus the
    static meta recomputed from shapes."""
    out_shape, meta = downsample_static_meta(
        bb.shape, bb.bw, kernel_size, stride, padding, out_bw)
    _, _, hidx, hhit = unpack_host_rulebook(rb)
    return (ds_lin, jnp.maximum(ds_idx, 0), ds_idx >= 0, out_shape, meta,
            hidx, hhit)


def pack_plan_arrays(coords_zyx: jnp.ndarray, valid: jnp.ndarray, shape,
                     bw: int, mb_cap: int, spatial: bool = False):
    """Plan-only twin of from_voxels: (brick_lin [B, Mb], row [B, N]).

    row is each voxel's target brick row (-1 = invalid/dropped). Exactly the
    compaction + grid + row-assignment from_voxels performs, minus the
    feature scatter — the host pyramid-plan path (data/sparse_plans.py) runs
    this on the CPU backend so loader plans are bit-identical to the device
    pack by construction."""
    D, H, W = (int(s) for s in shape)
    cand, cell, _, nbc, Wb = _brick_candidates(coords_zyx, valid, shape, bw)

    def per_batch(cand_b, cell_b, vld):
        if spatial:
            lin = _compact_cells_spatial(cand_b, nbc, mb_cap, (D, H, Wb))
        else:
            lin = _compact_cells(cand_b, nbc, mb_cap)
        grid = _grid_from_lin(lin, nbc, mb_cap)
        row = grid[cell_b]
        return lin, jnp.where(vld & (row >= 0), row, -1).astype(jnp.int32)

    return jax.vmap(per_batch)(cand, cell, valid)


def from_voxels(features: jnp.ndarray, coords_zyx: jnp.ndarray, valid: jnp.ndarray,
                shape, bw: int, mb_cap: int, spatial: bool = False) -> BrickBatch:
    """Voxelizer output (any row order) -> BrickBatch.

    features [B, N, C], coords_zyx [B, N, 3], valid [B, N]. Beyond mb_cap
    the LATEST-appearing bricks in the candidate list are dropped (first-
    appearance compaction order, not cell order). spatial=True compacts in
    y-major order instead (required by the banded engine, ops.banded)."""
    D, H, W = (int(s) for s in shape)
    B, N, C = features.shape
    cand, cell, wpos, nbc, Wb = _brick_candidates(coords_zyx, valid, shape, bw)

    def per_batch(cand, cell, wpos, feat, vld):
        if spatial:
            brick_lin = _compact_cells_spatial(cand, nbc, mb_cap, (D, H, Wb))
        else:
            brick_lin = _compact_cells(cand, nbc, mb_cap)
        grid = _grid_from_lin(brick_lin, nbc, mb_cap)
        row = grid[cell]
        ok = (row >= 0) & vld
        # row-wise scatter-ADD into the final w-major layout: each voxel's
        # update row is its (C+1) features placed at column wpos*(C+1) (via a
        # one-hot outer product); voxels of one brick occupy disjoint column
        # slices, so the adds compose the row. A per-voxel scatter into a
        # [mb_cap*bw, C+1] buffer instead lane-pads (C+1)->128 and memsets
        # ~400 MB; this buffer is [mb_cap, bw*(C+1)] = a few MB, aligned.
        fv = jnp.concatenate(
            [jnp.where(ok[:, None], feat, 0.0), ok[:, None].astype(feat.dtype)], axis=-1
        )  # [N, C+1]
        onehot = jax.nn.one_hot(wpos, bw, dtype=feat.dtype)  # [N, bw]
        updates = (onehot[:, :, None] * fv[:, None, :]).reshape(-1, bw * (C + 1))
        tgt = jnp.where(ok, row, mb_cap).astype(jnp.int32)
        buf = jnp.zeros((mb_cap + 1, bw * (C + 1)), feat.dtype).at[tgt].add(
            updates, mode="drop"
        )[:-1].reshape(mb_cap, bw, C + 1)
        return buf[..., :C].reshape(mb_cap, bw * C), brick_lin, buf[..., C] > 0

    feats, lins, vmasks = jax.vmap(per_batch)(cand, cell, wpos, features, valid)
    return BrickBatch(features=feats, brick_lin=lins, vmask=vmasks, shape=(D, H, W), bw=bw)


def from_voxels_planned(features: jnp.ndarray, coords_zyx: jnp.ndarray,
                        valid: jnp.ndarray, shape, bw: int,
                        row: jnp.ndarray, brick_lin: jnp.ndarray) -> BrickBatch:
    """from_voxels with a host-precomputed pack plan (native
    host_ops.brick_pack_plan): ``row`` [B, N] is each voxel's target brick
    row (-1 = dropped), ``brick_lin`` [B, Mb] the active brick cells in the
    plan's order. Skips the on-device compaction/grid scalar-index passes
    (~10 ms of the measured 18.5 ms pack at B=2) and keeps only the
    differentiable feature scatter-add — bit-identical to from_voxels when
    the plan was built with the matching (bw, mb_cap, spatial) knobs.

    The plan is loader work overlapped with device compute, the same
    division of labor as the reference's CPU data workers (reference
    det3d/datasets/pipelines/preprocess.py Voxelization)."""
    D, H, W = (int(s) for s in shape)
    assert W % bw == 0, f"W={W} not divisible by brick width {bw}"
    B, N, C = features.shape
    mb_cap = brick_lin.shape[1]
    wpos = (coords_zyx[..., 2] % bw).astype(jnp.int32)

    def per_batch(row_b, wpos_b, feat, vld):
        ok = (row_b >= 0) & vld
        fv = jnp.concatenate(
            [jnp.where(ok[:, None], feat, 0.0), ok[:, None].astype(feat.dtype)], axis=-1
        )
        onehot = jax.nn.one_hot(wpos_b, bw, dtype=feat.dtype)
        updates = (onehot[:, :, None] * fv[:, None, :]).reshape(-1, bw * (C + 1))
        tgt = jnp.where(ok, row_b, mb_cap).astype(jnp.int32)
        buf = jnp.zeros((mb_cap + 1, bw * (C + 1)), feat.dtype).at[tgt].add(
            updates, mode="drop"
        )[:-1].reshape(mb_cap, bw, C + 1)
        return buf[..., :C].reshape(mb_cap, bw * C), buf[..., C] > 0

    feats, vmasks = jax.vmap(per_batch)(row, wpos, features, valid)
    return BrickBatch(features=feats, brick_lin=brick_lin, vmask=vmasks,
                      shape=(D, H, W), bw=bw)


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


def from_sparse(sb: SparseBatch, bw: int, mb_cap: int,
                spatial: bool = False) -> BrickBatch:
    """Per-voxel SparseBatch -> BrickBatch."""
    D, H, W = sb.shape
    return from_voxels(sb.features, sb.coords(), sb.valid, (D, H, W), bw, mb_cap,
                       spatial=spatial)
