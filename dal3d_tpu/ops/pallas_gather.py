"""Pallas TPU row-gather kernels (sparse-conv hot path).

XLA's row gather on this runtime costs ~17-50 ns/row regardless of row width
(ROADMAP.md P1); a sparse conv layer issues K*M of them, so the SECOND
backbone forward is ~95% gathers. These kernels instead drive the DMA engine
directly: rulebook index tiles stream through SMEM (BlockSpec-pipelined),
each grid step issues per-row HBM->VMEM copies with up to ``INFLIGHT``
outstanding, then (fused variant) contracts the gathered tile on the MXU,
accumulating over kernel offsets into a VMEM accumulator.

Miss handling: callers pre-fold the ``hit`` mask by pointing misses at a
zeroed padding row (features are passed as [N+1, C] with row N all-zero) —
no in-kernel masking needed.

Channel padding: Mosaic requires DMA slices 128-aligned along the lane dim,
so the feature table (and the weights' Cin) are zero-padded to a multiple of
128. Per-row DMAs are latency-bound, not byte-bound, at these widths, and the
MXU contracts 128 lanes regardless — the padding is effectively free.

Forward-only: training keeps the XLA gather (its backward is a scatter-add
XLA already handles); see ops.sparse.gather_gemm for the dispatch.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INFLIGHT = 16  # outstanding per-row DMAs; bounded by the semaphore array


def _gather_tile(idx_ref, tbl_ref, rows, sems, BM):
    """Issue BM per-row copies tbl[idx[r]] -> rows[r], windowed pipeline."""

    def start(r):
        pltpu.make_async_copy(
            tbl_ref.at[idx_ref[r]], rows.at[r], sems.at[r % INFLIGHT]
        ).start()

    def wait(r):
        pltpu.make_async_copy(
            tbl_ref.at[idx_ref[r]], rows.at[r], sems.at[r % INFLIGHT]
        ).wait()

    def warm(r, c):
        start(r)
        return c

    def step(r, c):
        @pl.when(r + INFLIGHT < BM)
        def _():
            start(r + INFLIGHT)

        wait(r)
        return c

    jax.lax.fori_loop(0, min(INFLIGHT, BM), warm, 0)
    jax.lax.fori_loop(0, BM, step, 0)


@functools.partial(jax.jit, static_argnames=("block_m", "interpret"))
def gather_rows(table: jnp.ndarray, idx: jnp.ndarray, block_m: int = 512,
                interpret: bool = False) -> jnp.ndarray:
    """table [N, C], idx [M] int32 -> table[idx] [M, C]. M % block_m == 0."""
    N, C = table.shape
    M = idx.shape[0]
    assert M % block_m == 0, (M, block_m)
    Cp = max(128, ((C + 127) // 128) * 128)
    if Cp != C:
        table = jnp.pad(table, ((0, 0), (0, Cp - C)))

    def kernel(idx_ref, tbl_ref, out_ref, rows, sems):
        _gather_tile(idx_ref, tbl_ref, rows, sems, block_m)
        out_ref[...] = rows[...]

    return pl.pallas_call(
        kernel,
        grid=(M // block_m,),
        in_specs=[
            pl.BlockSpec((block_m,), lambda t: (t,), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        ],
        out_specs=pl.BlockSpec((block_m, Cp), lambda t: (t, 0)),
        scratch_shapes=[
            pltpu.VMEM((block_m, Cp), table.dtype),
            pltpu.SemaphoreType.DMA((INFLIGHT,)),
        ],
        out_shape=jax.ShapeDtypeStruct((M, Cp), table.dtype),
        interpret=interpret,
    )(idx.astype(jnp.int32), table)[:, :C]


@functools.partial(jax.jit, static_argnames=("block_m", "interpret"))
def gather_gemm_pallas(features: jnp.ndarray, idx: jnp.ndarray, hit: jnp.ndarray,
                       weights: jnp.ndarray, block_m: int = 1024,
                       interpret: bool = False) -> jnp.ndarray:
    """Fused sparse-conv compute (ops.sparse.gather_gemm semantics):
    features [B, N, Cin], idx/hit [B, K, M], weights [K, Cin, Cout]
    -> [B, M, Cout], out[b,m] = sum_k hit * features[b, idx[b,k,m]] @ W[k].
    """
    B, N, Cin = features.shape
    K, _, Cout = weights.shape
    M = idx.shape[-1]
    # fold the miss mask: misses gather the zeroed padding row N
    tbl = jnp.concatenate([features, jnp.zeros((B, 1, Cin), features.dtype)], axis=1)
    idx = jnp.where(hit, idx, N).astype(jnp.int32)
    pad = (-M) % block_m
    if pad:
        idx = jnp.pad(idx, ((0, 0), (0, 0), (0, pad)), constant_values=N)
    Mp = M + pad
    # 128-lane alignment for the per-row DMA slices
    Cp = max(128, ((Cin + 127) // 128) * 128)
    if Cp != Cin:
        tbl = jnp.pad(tbl, ((0, 0), (0, 0), (0, Cp - Cin)))
    w = weights.astype(features.dtype)
    if Cp != Cin:
        w = jnp.pad(w, ((0, 0), (0, Cp - Cin), (0, 0)))

    def kernel(idx_ref, tbl_ref, w_ref, out_ref, rows, acc, sems):
        b, k = pl.program_id(0), pl.program_id(2)
        _gather_tile(idx_ref.at[0, 0], tbl_ref.at[b], rows, sems, block_m)
        part = jnp.dot(rows[...], w_ref[0], preferred_element_type=jnp.float32)

        @pl.when(k == 0)
        def _():
            acc[...] = part

        @pl.when(k > 0)
        def _():
            acc[...] += part

        @pl.when(k == pl.num_programs(2) - 1)
        def _():
            out_ref[0] = acc[...].astype(out_ref.dtype)

    out = pl.pallas_call(
        kernel,
        grid=(B, Mp // block_m, K),
        in_specs=[
            pl.BlockSpec((1, 1, block_m), lambda b, t, k: (b, k, t),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),  # features stay in HBM
            pl.BlockSpec((1, Cp, Cout), lambda b, t, k: (k, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_m, Cout), lambda b, t, k: (b, t, 0)),
        scratch_shapes=[
            pltpu.VMEM((block_m, Cp), features.dtype),
            pltpu.VMEM((block_m, Cout), jnp.float32),
            pltpu.SemaphoreType.DMA((INFLIGHT,)),
        ],
        out_shape=jax.ShapeDtypeStruct((B, Mp, Cout), features.dtype),
        interpret=interpret,
    )(idx, tbl, w)
    return out[:, :M]
