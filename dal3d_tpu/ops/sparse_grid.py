"""Sort-free sparse conv engine: dense index grids in HBM.

The searchsorted engine (ops.sparse) is algorithmically clean but leans on
XLA sort, which on this TPU runtime is pathologically slow (~30 s for 1.6M
int32 — measured; sorts are effectively forbidden). This engine replaces
every sort with scatter/gather against a dense per-level index grid:

- build once per level: ``grid[cell] = row index`` (int32, [D*H*W+1], -1
  empty). L0 at (41,1024,1024) costs 172 MB/batch-elem — afforded by HBM and
  rebuilt per step in ~memset time.
- submanifold rulebook: neighbor row = ``grid[lin + Δlin]`` (bounds-checked)
  — one gather, no search.
- strided downsample: mark candidate output cells in a dense [Do*Ho*Wo] bool
  grid (scatter), compact with ``jnp.nonzero(size=cap)`` (cumsum-based, no
  sort; yields ascending cell order), then rulebook via input-grid gathers.

The active set is NOT kept sorted (no invariant needed); padding rows carry
``lin == D*H*W``. Compute (gather-GEMM-accumulate) is shared with ops.sparse.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .sparse import SparseBatch, _kernel_offsets, _triple, gather_gemm


def build_index_grid(sb: SparseBatch) -> jnp.ndarray:
    """[B, D*H*W+1] int32: cell -> row index, -1 if empty (sentinel cell stays -1)."""
    D, H, W = sb.shape
    cells = D * H * W
    N = sb.lin.shape[1]

    def per_batch(lin):
        grid = jnp.full((cells + 1,), -1, jnp.int32)
        rows = jnp.arange(N, dtype=jnp.int32)
        safe = jnp.where(lin < cells, lin, cells)
        grid = grid.at[safe].set(jnp.where(lin < cells, rows, -1), mode="drop")
        return grid.at[cells].set(-1)

    return jax.vmap(per_batch)(sb.lin)


def _delta_lins(kernel_size, shape) -> Tuple[np.ndarray, np.ndarray]:
    """Per-offset (dz,dy,dx) and their linear deltas for a given grid shape."""
    D, H, W = shape
    offs = _kernel_offsets(kernel_size)
    center = (np.array(_triple(kernel_size)) - 1) // 2
    deltas = offs - center
    dlin = (deltas[:, 0] * H + deltas[:, 1]) * W + deltas[:, 2]
    return deltas, dlin


def subm_rulebook(sb: SparseBatch, kernel_size, grid: jnp.ndarray | None = None):
    """(idx [B,K,N], hit [B,K,N]) via index-grid gathers."""
    D, H, W = sb.shape
    cells = D * H * W
    if grid is None:
        grid = build_index_grid(sb)
    deltas, dlin = _delta_lins(kernel_size, sb.shape)
    deltas_j = jnp.asarray(deltas)
    dlin_j = jnp.asarray(dlin)

    def per_batch(lin, g):
        c = jnp.stack([lin // (H * W), (lin % (H * W)) // W, lin % W], axis=-1)  # [N,3]
        q = c[None, :, :] + deltas_j[:, None, :]  # [K,N,3]
        inb = jnp.all((q >= 0) & (q < jnp.asarray([D, H, W])), axis=-1)
        inb = inb & (lin < cells)[None, :]
        qlin = jnp.where(inb, lin[None, :] + dlin_j[:, None], cells)
        idx = g[qlin]  # [K,N]
        hit = idx >= 0
        return jnp.maximum(idx, 0), hit

    return jax.vmap(per_batch)(sb.lin, grid)


def downsample_plan(sb: SparseBatch, kernel_size, stride, padding, out_cap: int,
                    grid: jnp.ndarray | None = None):
    """Sort-free strided-conv plan. Returns (out_lin [B,M] ascending cell
    order, idx [B,K,M], hit [B,K,M], out_shape)."""
    D, H, W = sb.shape
    cells = D * H * W
    kd, kh, kw = _triple(kernel_size)
    sd, sh, sw = _triple(stride)
    pd, ph, pw = _triple(padding)
    Do = (D + 2 * pd - kd) // sd + 1
    Ho = (H + 2 * ph - kh) // sh + 1
    Wo = (W + 2 * pw - kw) // sw + 1
    out_cells = Do * Ho * Wo
    if grid is None:
        grid = build_index_grid(sb)
    offs = jnp.asarray(_kernel_offsets(kernel_size))
    stride_v = jnp.asarray([sd, sh, sw])
    pad_v = jnp.asarray([pd, ph, pw])
    out_dims = jnp.asarray([Do, Ho, Wo])

    def per_batch(lin, g):
        c = jnp.stack([lin // (H * W), (lin % (H * W)) // W, lin % W], axis=-1)  # [N,3]
        num = c[:, None, :] + pad_v[None, None, :] - offs[None, :, :]  # [N,K,3]
        div_ok = (num % stride_v[None, None, :]) == 0
        o = num // stride_v[None, None, :]
        inb = (o >= 0) & (o < out_dims[None, None, :])
        ok = jnp.all(div_ok & inb, axis=-1) & (lin < cells)[:, None]
        olin = (o[..., 0] * Ho + o[..., 1]) * Wo + o[..., 2]
        olin = jnp.where(ok, olin, out_cells).astype(jnp.int32)
        occ = jnp.zeros((out_cells + 1,), bool).at[olin.reshape(-1)].set(True, mode="drop")
        out_lin = jnp.nonzero(occ[:out_cells], size=out_cap, fill_value=out_cells)[0].astype(
            jnp.int32
        )

        oc = jnp.stack(
            [out_lin // (Ho * Wo), (out_lin % (Ho * Wo)) // Wo, out_lin % Wo], axis=-1
        )
        ic = oc[None, :, :] * stride_v[None, None, :] - pad_v[None, None, :] + offs[:, None, :]
        iinb = jnp.all((ic >= 0) & (ic < jnp.asarray([D, H, W])), axis=-1)
        iinb = iinb & (out_lin < out_cells)[None, :]
        ilin = jnp.where(
            iinb, (ic[..., 0] * H + ic[..., 1]) * W + ic[..., 2], cells
        )
        idx = g[ilin]
        hit = idx >= 0
        return out_lin, jnp.maximum(idx, 0), hit

    out_lin, idx, hit = jax.vmap(per_batch)(sb.lin, grid)
    return out_lin, idx, hit, (Do, Ho, Wo)


def subm_conv(sb: SparseBatch, weights, rulebook=None, kernel_size=3) -> SparseBatch:
    if rulebook is None:
        rulebook = subm_rulebook(sb, kernel_size)
    idx, hit = rulebook
    out = gather_gemm(sb.features, idx, hit, weights)
    out = jnp.where(sb.valid[..., None], out, 0.0)
    return SparseBatch(features=out, lin=sb.lin, shape=sb.shape)


def sparse_conv_downsample(sb: SparseBatch, weights, kernel_size, stride, padding,
                           out_cap: int, grid=None) -> SparseBatch:
    out_lin, idx, hit, out_shape = downsample_plan(
        sb, kernel_size, stride, padding, out_cap, grid
    )
    out = gather_gemm(sb.features, idx, hit, weights)
    out = jnp.where((out_lin < np.prod(out_shape))[..., None], out, 0.0)
    return SparseBatch(features=out, lin=out_lin, shape=out_shape)


def from_voxels(features, coords_zyx, valid, shape) -> SparseBatch:
    """Voxelizer output -> SparseBatch (any row order; no sorting needed)."""
    D, H, W = (int(s) for s in shape)
    sentinel = D * H * W
    lin = (coords_zyx[..., 0] * H + coords_zyx[..., 1]) * W + coords_zyx[..., 2]
    lin = jnp.where(valid, lin, sentinel).astype(jnp.int32)
    feats = jnp.where(valid[..., None], features, 0.0)
    return SparseBatch(features=feats, lin=lin, shape=(D, H, W))
