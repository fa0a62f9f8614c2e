"""Banded one-hot MXU gather for the brick sparse-conv engine.

The round-2 brick engine's floor is XLA's row gather: ~13-19 ns/row at
production shapes, both issue- and byte-bound (ROADMAP.md round-2 facts).
This module replaces the gather+einsum hot path with a Pallas kernel that
exploits a structural property the engine can *create*: when active bricks
are compacted in y-major spatial order (sparse_brick._compact_cells_spatial),
every rulebook index of an output row m lands within a few hundred rows of m
(measured: p99 within-block spread 609 rows at L0 on lidar-like clouds, <400
at L1+). The kernel then:

  1. DMAs one [band, R] slab of the feature table into VMEM per 128-row
     output block (double-buffered, sequential => full HBM bandwidth),
  2. builds a {0,1} selection matrix per kernel tap by comparing a lane iota
     against (idx - block_start)  — misses and out-of-band rows match nothing,
  3. gathers via MXU:  rows_q = onehot_q @ slab  (~1.3 ns/row vs 13-19), and
  4. applies the banded conv weights in the same kernel:
     out += rows_q @ wband[q], accumulating f32 across taps.

Out-of-band entries (capacity: statistically rare, but possible on dense
scenes) are EXACT, not dropped: make_band_plan compacts them into per-tap
fallback lists applied by apply_fallback as a small XLA gather+scatter, and
reports their count for observability.

Replaces the gather-GEMM role of spconv's reordering+GEMM CUDA path
(reference bevfusion/mmdet3d/ops/spconv/src/reordering.cu, indice_conv in
ops.py:128) with an MXU-native structure that has no reference counterpart.

Gradients: banded_conv is a custom_vjp. d/dtable re-uses the same kernel
with reversed taps + transposed weights (submanifold rulebooks are
centrally symmetric, and make_band_plan symmetrizes the out-of-band mask so
primal and dual entry sets coincide); d/dwband uses a second kernel that
accumulates onehot-gathered activations against the cotangent. Callers whose
rulebooks are NOT symmetric (strided downsample) pass symmetric=False to get
an XLA scatter-add backward instead.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
from jax import ad_checkpoint
import jax.numpy as jnp
import numpy as np
from flax import struct
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = np.int32(2**30)


def _pad128(n: int) -> int:
    return ((n + 127) // 128) * 128


def use_pallas() -> bool:
    """Pallas path only on real TPU; CPU (tests, multichip dryrun) uses the
    XLA reference. Override with DAL3D_BANDED=xla|pallas|interpret."""
    import os

    mode = os.environ.get("DAL3D_BANDED", "auto")
    if mode == "xla":
        return False
    if mode in ("pallas", "interpret"):
        return True
    return jax.default_backend() == "tpu"


def _interpret() -> bool:
    import os

    return (
        os.environ.get("DAL3D_BANDED") == "interpret"
        or jax.default_backend() != "tpu"
    )


@struct.dataclass
class BandPlan:
    """Banded-gather execution plan for one rulebook (shared across convs).

    idx_k:   [B, Q, M] int32 — table row per (tap, out-row); -1 = no
             contribution from the kernel (miss OR out-of-band).
    starts:  [B, G, nb] int32 — 16-aligned slab start row per (tap group,
             128-row block), clamped to [0, Mb-band_g]. Taps are statically
             partitioned into ``groups``: taps of one group cluster around a
             common rank offset (e.g. all dz taps of one dy row of a subm
             stencil), so each group's slab can be far narrower than one
             slab covering every tap — the onehot matmul cost scales with
             sum_q band_{g(q)}.
    fb_idx:  [B, Q, K] int32 — table rows of out-of-band entries (Mb = pad).
    fb_rows: [B, Q, K] int32 — output rows of those entries (M = pad).
    oob_count: [B] int32 — total out-of-band entries.
    fb_covered: [B] int32 — out-of-band entries the fallback lists actually
             hold; oob_count > fb_covered means the correction is truncated
             (rare: the chunked compaction covers the first NCH=2*K//G
             128-row chunks containing oob entries per tap, capacity K each)
             — observable, loggable.
    """

    idx_k: jnp.ndarray
    starts: jnp.ndarray
    fb_idx: jnp.ndarray
    fb_rows: jnp.ndarray
    oob_count: jnp.ndarray
    fb_covered: jnp.ndarray
    groups: Tuple[Tuple[int, ...], ...] = struct.field(pytree_node=False)
    bands: Tuple[int, ...] = struct.field(pytree_node=False)
    bm: int = struct.field(pytree_node=False)
    symmetric: bool = struct.field(pytree_node=False, default=False)
    # tap whose idx is the identity (subm center / pad self): the kernel
    # reads the block's own rows straight from the slab instead of building
    # an onehot matmul — saves band*R MACs/row on that tap. None = generic.
    self_tap: int | None = struct.field(pytree_node=False, default=None)

    @property
    def band(self) -> int:  # legacy single-group accessor
        assert len(self.bands) == 1
        return self.bands[0]


def band_plan_fields():
    """Array (pytree) fields of BandPlan, in declaration order — the host
    plan pyramid ships exactly these per plan (static fields are
    reconstructed from the shared knob helpers in ops/sparse_brick.py)."""
    return ("idx_k", "starts", "fb_idx", "fb_rows", "oob_count", "fb_covered")


def band_plan_arrays(plan: "BandPlan", prefix: str = ""):
    """{prefix+field: array} serialization of a BandPlan's dynamic leaves."""
    return {prefix + f: getattr(plan, f) for f in band_plan_fields()}


def _group_maps(groups, bands, Q):
    """(g_of_q [Q], band_of_q [Q], slab offsets [G], sum_bands)."""
    g_of_q = np.full((Q,), -1, np.int64)
    for g, taps in enumerate(groups):
        for q in taps:
            g_of_q[q] = g
    assert (g_of_q >= 0).all(), f"groups {groups} do not cover all {Q} taps"
    band_of_q = np.asarray([bands[g] for g in g_of_q])
    offs = np.concatenate([[0], np.cumsum(np.asarray(bands))])
    return g_of_q, band_of_q, offs[:-1], int(offs[-1])


def make_band_plan(idx: jnp.ndarray, hit: jnp.ndarray, Mb: int,
                   band: int | None = None, bm: int = 128, fb_cap: int = 256,
                   symmetric: bool = False,
                   self_tap: int | None = None,
                   groups: Tuple[Tuple[int, ...], ...] | None = None,
                   group_bands: Tuple[int, ...] | None = None) -> BandPlan:
    """Build a BandPlan from a rulebook (idx [B, Q, M], hit same).

    groups/group_bands partition the Q taps into statically-known clusters,
    each with its own slab start and width; ``band`` alone is the
    single-group legacy form. symmetric=True additionally marks (q, m)
    out-of-band whenever its dual entry (rev(q), idx[q, m]) is — required
    for the reversed-tap backward of submanifold convs (M must equal Mb).
    Pass it only for plans that will be differentiated: the dual lookup is a
    full-rulebook gather (~13 ns/row), one of the two dominant plan costs;
    predict-path plans skip it (forward exactness never depends on it — the
    kernel and fallback use the same oob mask either way).
    """
    B, Q, M = idx.shape
    assert M % bm == 0, (M, bm)
    # the dw kernel's widened-window clamp floors group starts to
    # (Mb - max_band) & ~15; an unaligned Mb would silently drop the top
    # Mb % 16 in-band rows from the weight-gradient accumulation
    assert Mb % 16 == 0, f"banded table capacity Mb={Mb} must be 16-aligned"
    if groups is None:
        assert band is not None
        groups = (tuple(range(Q)),)
        group_bands = (band,)
    groups = tuple(tuple(t) for t in groups)
    group_bands = tuple(int(b) for b in group_bands)
    for bg in group_bands:
        assert bg % 16 == 0 and Mb >= bg, (bg, Mb)
    g_of_q, band_of_q, _, _ = _group_maps(groups, group_bands, Q)
    nb = M // bm
    safe = jnp.where(hit, idx, _BIG).reshape(B, Q, nb, bm)
    starts_g = []
    for g, (taps, bg) in enumerate(zip(groups, group_bands)):
        bmin = jnp.min(safe[:, list(taps)], axis=(1, 3))  # [B, nb]
        st = jnp.where(bmin >= _BIG, 0, bmin)
        st = jnp.clip(st, 0, Mb - bg) & ~15
        if self_tap is not None and self_tap in taps:
            # the self-tap direct read needs the block's own rows fully
            # inside its group's slab: start in [m0 + bm - band, m0];
            # entries pushed below the raised floor become out-of-band
            # (handled exactly by the fallback).
            assert M == Mb and bg >= bm, (M, Mb, bg, bm)
            m0 = np.arange(nb, dtype=np.int32) * bm
            lo = np.minimum((np.maximum(m0 + bm - bg, 0) + 15) & ~15, Mb - bg)
            st = jnp.minimum(jnp.maximum(st, lo[None, :]), m0[None, :])
        starts_g.append(st)
    starts = jnp.stack(starts_g, axis=1).astype(jnp.int32)  # [B, G, nb]
    starts_q = starts[:, g_of_q]  # [B, Q, nb] (static tap->group take)
    rel = idx.reshape(B, Q, nb, bm) - starts_q[..., None]
    band_q = jnp.asarray(band_of_q, jnp.int32)[None, :, None, None]
    oob = (hit.reshape(B, Q, nb, bm) & ((rel < 0) | (rel >= band_q))).reshape(B, Q, M)
    if symmetric:
        assert M == Mb, "symmetric band plans require M == Mb (subm rulebooks)"
        # dual of (q, m): (rev(q), r=idx[q, m]); symmetrize so both the
        # forward and the reversed-tap backward mask the same entry set
        oobp = jnp.concatenate([oob, jnp.zeros((B, Q, 1), bool)], axis=-1)
        safe_r = jnp.where(hit, idx, M)
        rev = np.arange(Q)[::-1].copy()  # static gather, not lax.rev
        dual = jnp.take_along_axis(oobp[:, rev], safe_r, axis=-1)
        oob = oob | (hit & dual)
    idx_k = jnp.where(hit & ~oob, idx, -1).astype(jnp.int32)
    oob_count = oob.sum(axis=(1, 2)).astype(jnp.int32)

    # Compact out-of-band entries per tap to [K] WITHOUT a full-rulebook
    # scatter (B*Q*M updates at ~15 ns each used to cost more than the conv
    # kernel itself). Two-level chunked compaction: (1) pick the first NCH
    # 128-row chunks containing oob entries via a tiny nc-sized scatter,
    # (2) gather those chunks (contiguous slices) and compact within the
    # NCH*G candidate window. Entries beyond the NCH covered chunks (or the
    # K cap) are dropped — fb_covered reports exactly how many made it.
    G = 128
    assert M % G == 0
    nc = M // G
    NCH = min(nc, max(2, 2 * fb_cap // G))
    m_iota = jax.lax.broadcasted_iota(jnp.int32, (B, Q, M), 2)
    oobc = oob.reshape(B, Q, nc, G)
    cnt = oobc.sum(-1)  # [B, Q, nc]
    has = cnt > 0
    cpos = jnp.cumsum(has.astype(jnp.int32), axis=-1) - 1  # chunk rank
    tgt = jnp.where(has, jnp.minimum(cpos, NCH), NCH)

    def pick(tgt_q, c_iota):
        out = jnp.full((NCH + 1,), nc, jnp.int32)
        return out.at[tgt_q].set(c_iota, mode="drop")[:NCH]

    c_iota = jax.lax.broadcasted_iota(jnp.int32, (B, Q, nc), 2)
    sel = jax.vmap(jax.vmap(pick))(tgt, c_iota)  # [B, Q, NCH] chunk ids (nc = none)
    cov_q = jnp.minimum(jnp.where(cpos < NCH, cnt, 0).sum(-1), fb_cap)  # [B, Q]
    covered = cov_q.sum(-1).astype(jnp.int32)

    def gat(arr_q, sel_q, fill):
        a = jnp.concatenate([arr_q.reshape(nc, G),
                             jnp.full((1, G), fill, arr_q.dtype)], 0)
        return a[sel_q].reshape(NCH * G)

    oob_w = jax.vmap(jax.vmap(gat, in_axes=(0, 0, None)), in_axes=(0, 0, None))(
        oob, sel, False)
    idx_w = jax.vmap(jax.vmap(gat, in_axes=(0, 0, None)), in_axes=(0, 0, None))(
        idx.astype(jnp.int32), sel, np.int32(0))
    m_w = jax.vmap(jax.vmap(gat, in_axes=(0, 0, None)), in_axes=(0, 0, None))(
        m_iota, sel, np.int32(M))

    pos = jnp.cumsum(oob_w.astype(jnp.int32), axis=-1) - 1
    pos = jnp.where(oob_w, jnp.minimum(pos, fb_cap), fb_cap)

    def compact(pos_q, oob_q, val_q, fill):
        out = jnp.full((fb_cap + 1,), fill, jnp.int32)
        return out.at[pos_q].set(jnp.where(oob_q, val_q, fill), mode="drop")[:fb_cap]

    fb_idx = jax.vmap(jax.vmap(compact, in_axes=(0, 0, 0, None)),
                      in_axes=(0, 0, 0, None))(pos, oob_w, idx_w, Mb)
    fb_rows = jax.vmap(jax.vmap(compact, in_axes=(0, 0, 0, None)),
                       in_axes=(0, 0, 0, None))(pos, oob_w, m_w, M)
    plan = BandPlan(idx_k=idx_k, starts=starts, fb_idx=fb_idx,
                    fb_rows=fb_rows, oob_count=oob_count, fb_covered=covered,
                    groups=groups, bands=group_bands, bm=bm,
                    symmetric=symmetric, self_tap=self_tap)
    # Tag the plan tensors so remat'd blocks can SAVE them instead of
    # rebuilding rulebooks/compactions/dual-gathers in the backward pass
    # (policy save_only_these_names("sparse_plan") in models/backbones/scn.py;
    # everything upstream — grids, neighbor lookups — then DCEs out of the
    # recompute graph). A no-op outside jax.checkpoint.
    return jax.tree_util.tree_map(
        lambda x: ad_checkpoint.checkpoint_name(x, "sparse_plan"), plan)


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------


def _fwd_kernel(Q, groups, bands, R, Rout, bm, dtype, self_tap=None):
    g_of_q, band_of_q, offs, _ = _group_maps(groups, bands, Q)
    G = len(groups)

    def kernel(starts_ref, idx_ref, table_ref, w_ref, out_ref, slab, sem):
        b, i = pl.program_id(0), pl.program_id(1)
        nb = pl.num_programs(1)
        cur = i % 2

        def start_dmas(blk, buf):
            for g in range(G):
                sg = pl.multiple_of(starts_ref[b, g, blk], 16)
                pltpu.make_async_copy(
                    table_ref.at[b, pl.ds(sg, bands[g])],
                    slab.at[buf, pl.ds(offs[g], bands[g])],
                    sem.at[buf, g],
                ).start()

        @pl.when(i == 0)
        def _():
            start_dmas(0, 0)

        @pl.when(i + 1 < nb)
        def _():
            start_dmas(i + 1, (i + 1) % 2)

        for g in range(G):
            sg = pl.multiple_of(starts_ref[b, g, i], 16)
            pltpu.make_async_copy(
                table_ref.at[b, pl.ds(sg, bands[g])],
                slab.at[cur, pl.ds(offs[g], bands[g])],
                sem.at[cur, g],
            ).wait()
        acc = jnp.zeros((bm, Rout), jnp.float32)
        for q in range(Q):
            g = g_of_q[q]
            band_q = int(band_of_q[q])
            start = pl.multiple_of(starts_ref[b, g, i], 16)
            if q == self_tap:
                # identity tap: the block's own rows sit at offset m0-start
                # in its group's slab (guaranteed by make_band_plan's start
                # floor); mask ghost/oob rows via the plan's idx_k sign.
                off = pl.multiple_of(i * bm - start + offs[g], 16)
                rows = slab[cur, pl.ds(off, bm)]
                # minor-dim insert must happen on the 32-bit index vector
                # (Mosaic restriction), not on a bf16 mask
                gth = jnp.where(idx_ref[0, q, :][:, None] >= 0, rows, 0)
            else:
                tbl = slab[cur, offs[g]:offs[g] + band_q]
                col = jax.lax.broadcasted_iota(jnp.int32, (bm, band_q), 1)
                rel = idx_ref[0, q, :] - start
                oh = (col == rel[:, None]).astype(dtype)
                gth = jnp.dot(oh, tbl, preferred_element_type=jnp.float32).astype(dtype)
            acc = acc + jnp.dot(gth, w_ref[q], preferred_element_type=jnp.float32)
        out_ref[0] = acc.astype(out_ref.dtype)

    return kernel


def _dw_kernel(Q, band, R, Rout, bm, dtype):
    """grid (Q, nb): accumulate dw[q] += (onehot_q @ slab)^T @ g over blocks.

    Output block [1, R, Rout] revisited across the inner nb dim (consecutive),
    slab re-DMA'd per (q, i) — backward-only cost. ``band`` is the max group
    band; per-tap starts come pre-clamped to [0, Mb-band], which keeps every
    in-band entry of narrower groups inside the widened window.
    """

    def kernel(starts_ref, idx_ref, table_ref, g_ref, dw_ref, slab, acc, sem):
        b = 0  # batch folded by caller loop
        q, i = pl.program_id(0), pl.program_id(1)
        nb = pl.num_programs(1)
        start = pl.multiple_of(starts_ref[b, q, i], 16)
        dma = pltpu.make_async_copy(
            table_ref.at[b, pl.ds(start, band)], slab.at[0], sem.at[0]
        )
        dma.start()
        col = jax.lax.broadcasted_iota(jnp.int32, (bm, band), 1)
        rel = idx_ref[0, 0, :] - start
        dma.wait()
        oh = (col == rel[:, None]).astype(dtype)
        g = jnp.dot(oh, slab[0], preferred_element_type=jnp.float32).astype(dtype)

        @pl.when(i == 0)
        def _():
            acc[...] = jnp.zeros_like(acc)

        acc[...] += jax.lax.dot_general(
            g, g_ref[0],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        @pl.when(i == nb - 1)
        def _():
            dw_ref[0] = acc[...].astype(dw_ref.dtype)

    return kernel


@functools.partial(jax.jit, static_argnames=("groups", "bands", "bm", "self_tap"))
def _banded_fwd_pallas(table, idx_k, starts, wband, groups, bands, bm,
                       self_tap=None):
    B, Mb, R = table.shape
    _, Q, M = idx_k.shape
    Rout = wband.shape[-1]
    nb = M // bm
    G = len(groups)
    _, _, _, sum_bands = _group_maps(groups, bands, Q)
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, nb),
        in_specs=[
            pl.BlockSpec((1, Q, bm), lambda b, i, s: (b, 0, i)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bm, Rout), lambda b, i, s: (b, i, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, sum_bands, R), table.dtype),
            pltpu.SemaphoreType.DMA((2, G)),
        ],
    )
    # scoped-VMEM budget: resident weights (Q*R*Rout) + the double-buffered
    # band slabs (2*sum_bands*R) exceed the 16 MB default on the widest
    # downsample (ds1 train: 8.85 + 9.44 MB); v5e has 128 MB VMEM, so lift
    # the per-kernel cap to what this call actually needs plus margin
    itemsize = jnp.dtype(table.dtype).itemsize
    # 25% + 4 MB headroom on top of the nominal buffer sum: Mosaic pads each
    # buffer to (8,128) tiles and adds spill slots the nominal count misses —
    # measured 23.27M actual vs 19.85M nominal on the ds1 train kernel in a
    # no-remat graph (v5e VMEM is 128 MB; generous caps are free)
    need = (Q * R * Rout + 2 * sum_bands * R) * itemsize \
        + bm * (Q + Rout * 4 + R * itemsize)
    need = int(need * 1.25) + (4 << 20)
    return pl.pallas_call(
        _fwd_kernel(Q, groups, bands, R, Rout, bm, table.dtype, self_tap),
        grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((B, M, Rout), table.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=max(need, 16 * 1024 * 1024)),
        interpret=_interpret(),
    )(starts, idx_k, table, wband)


@functools.partial(jax.jit, static_argnames=("groups", "bands", "bm"))
def _banded_dw_pallas(table, idx_k, starts, g, groups, bands, bm):
    """dw[q] = sum_{b,m in-band} table[b, idx_k[b,q,m]]^T @ g[b,m]."""
    B, Mb, R = table.shape
    _, Q, M = idx_k.shape
    Rout = g.shape[-1]
    nb = M // bm
    g_of_q, _, _, _ = _group_maps(groups, bands, Q)
    band = max(bands)
    starts_q = jnp.minimum(starts[:, g_of_q], Mb - band) & ~15  # [B, Q, nb]

    def one_batch(table_b, idx_b, starts_b, g_b):
        # idx ships as [Q, 1, M] so the per-tap block (1, 1, bm) is a legal
        # TPU block shape (second-to-last block dim == array dim 1; a
        # [1, Q, M] layout with block (1, 1, bm) fails Mosaic's
        # divisible-by-8-or-full constraint for any Q > 1)
        gs = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(Q, nb),
            in_specs=[
                pl.BlockSpec((1, 1, bm), lambda q, i, s: (q, 0, i)),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((1, bm, Rout), lambda q, i, s: (0, i, 0)),
            ],
            out_specs=pl.BlockSpec((1, R, Rout), lambda q, i, s: (q, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((1, band, R), table.dtype),
                pltpu.VMEM((R, Rout), jnp.float32),
                pltpu.SemaphoreType.DMA((1,)),
            ],
        )
        return pl.pallas_call(
            _dw_kernel(Q, band, R, Rout, bm, table.dtype),
            grid_spec=gs,
            out_shape=jax.ShapeDtypeStruct((Q, R, Rout), jnp.float32),
            interpret=_interpret(),
        )(starts_b[None], idx_b[:, None], table_b[None], g_b[None])

    dw = jax.vmap(one_batch)(table, idx_k, starts_q, g)  # [B, Q, R, Rout]
    return dw.sum(0)


def _banded_fwd_xla(table, idx_k, wband):
    """Reference path: plain masked gather + einsum (also the CPU path)."""
    B, Mb, R = table.shape
    tbl = jnp.concatenate([table, jnp.zeros((B, 1, R), table.dtype)], axis=1)
    safe = jnp.where(idx_k >= 0, idx_k, Mb)
    Q, M = idx_k.shape[1], idx_k.shape[2]
    g = jnp.take_along_axis(tbl, safe.reshape(B, Q * M, 1), axis=1)
    g = g.reshape(B, Q, M, R)
    return jnp.einsum(
        "bqmr,qro->bmo", g, wband.astype(table.dtype),
        preferred_element_type=jnp.float32,
    ).astype(table.dtype)


# ---------------------------------------------------------------------------
# public op (custom vjp)
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def banded_conv(table, idx_k, starts, wband, groups, bands, bm, symmetric,
                self_tap=None):
    """out[b, m] = sum_{q: idx_k[b,q,m] >= 0} table[b, idx_k[b,q,m]] @ wband[q].

    table [B, Mb, R] (R multiple of 128), idx_k/starts from make_band_plan,
    wband [Q, R, Rout] (Rout multiple of 128). All in-kernel contributions
    are in-band by construction of idx_k; out-of-band entries are applied
    separately via apply_fallback.
    """
    if use_pallas():
        return _banded_fwd_pallas(table, idx_k, starts, wband, groups, bands,
                                  bm, self_tap)
    return _banded_fwd_xla(table, idx_k, wband)


def _banded_conv_fwd(table, idx_k, starts, wband, groups, bands, bm, symmetric,
                     self_tap):
    out = banded_conv(table, idx_k, starts, wband, groups, bands, bm,
                      symmetric, self_tap)
    return out, (table, idx_k, starts, wband)


def _banded_conv_bwd(groups, bands, bm, symmetric, self_tap, res, g):
    table, idx_k, starts, wband = res
    B, Mb, R = table.shape
    Q = wband.shape[0]
    g = g.astype(table.dtype)
    if symmetric:
        # dual gather: same idx/starts/groups, weights reversed + transposed
        # (centered stencils keep the self tap fixed under reversal)
        assert self_tap is None or Q - 1 - self_tap == self_tap, (Q, self_tap)
        rev = np.arange(Q)[::-1].copy()
        w_dual = jnp.transpose(wband[rev], (0, 2, 1))
        dtable = banded_conv(g, idx_k, starts, w_dual, groups, bands, bm,
                             symmetric, self_tap)
    else:
        # XLA scatter-add: dtable[r] += g[m] @ w[q]^T over valid entries
        gw = jnp.einsum("bmo,qro->bqmr", g, wband.astype(g.dtype),
                        preferred_element_type=jnp.float32).astype(table.dtype)
        M = idx_k.shape[-1]
        safe = jnp.where(idx_k >= 0, idx_k, Mb)

        def scat(gw_b, safe_b):
            buf = jnp.zeros((Mb + 1, R), jnp.float32)
            buf = buf.at[safe_b.reshape(Q * M)].add(
                gw_b.reshape(Q * M, R), mode="drop"
            )
            return buf[:Mb]

        dtable = jax.vmap(scat)(gw, safe).astype(table.dtype)
    if use_pallas():
        dw = _banded_dw_pallas(table, idx_k, starts, g, groups, bands, bm)
    else:
        tbl = jnp.concatenate([table, jnp.zeros((B, 1, R), table.dtype)], axis=1)
        M = idx_k.shape[-1]
        safe = jnp.where(idx_k >= 0, idx_k, Mb)
        gat = jnp.take_along_axis(tbl, safe.reshape(B, Q * M, 1), axis=1)
        gat = gat.reshape(B, Q, M, R)
        dw = jnp.einsum("bqmr,bmo->qro", gat, g, preferred_element_type=jnp.float32)
    zi = np.zeros(idx_k.shape, jax.dtypes.float0)
    zs = np.zeros(starts.shape, jax.dtypes.float0)
    return dtable, zi, zs, dw.astype(wband.dtype)


banded_conv.defvjp(_banded_conv_fwd, _banded_conv_bwd)


def apply_fallback(out, table, wband, plan: BandPlan):
    """Add the out-of-band contributions: out[b, fb_rows] += table[b, fb_idx] @ w[q].

    Differentiable XLA gather+scatter over the (small) fallback lists.
    No full-table copies: padding fill rows (fb_idx = Mb, fb_rows = M) are
    handled by gather mode="fill" and scatter mode="drop" — concatenating a
    dump row used to copy the whole 37 MB table AND output per call, which
    cost more than the conv kernel itself."""
    B, M, Rout = out.shape
    Q, K = plan.fb_idx.shape[1], plan.fb_idx.shape[2]
    rows = jnp.take_along_axis(
        table, plan.fb_idx.reshape(B, Q * K, 1), axis=1,
        mode="fill", fill_value=0,
    ).reshape(B, Q, K, -1)
    contrib = jnp.einsum("bqkr,qro->bqko", rows, wband.astype(rows.dtype),
                         preferred_element_type=jnp.float32).astype(out.dtype)

    def scat(out_b, rows_b, contrib_b):
        return out_b.at[rows_b.reshape(Q * K)].add(
            contrib_b.reshape(Q * K, Rout), mode="drop"
        )

    return jax.vmap(scat)(out, plan.fb_rows, contrib)


def banded_gather_matmul(table, wband, plan: BandPlan):
    """Full banded op: kernel (in-band) + exact fallback (out-of-band).

    table [B, Mb, R] with R ANY width (padded to 128 internally),
    wband [Q, R, Rout] — returns [B, M, Rout] (Rout as given)."""
    B, Mb, R = table.shape
    Q, _, Rout = wband.shape
    Rp, Routp = _pad128(R), _pad128(Rout)
    tpad = jnp.pad(table, ((0, 0), (0, 0), (0, Rp - R))) if Rp != R else table
    wpad = wband
    if Rp != R or Routp != Rout:
        wpad = jnp.pad(wband, ((0, 0), (0, Rp - R), (0, Routp - Rout)))
    out = banded_conv(tpad, plan.idx_k, plan.starts, wpad, plan.groups,
                      plan.bands, plan.bm, plan.symmetric, plan.self_tap)
    out = apply_fallback(out, tpad, wpad, plan)
    return out[..., :Rout]
