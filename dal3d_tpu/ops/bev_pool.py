"""LSS camera-to-BEV pooling.

The reference's custom CUDA kernel (bevfusion/mmdet3d/ops/bev_pool/ — the
">40x faster BEV pooling" of the BEVFusion paper) sorts camera frustum points
by BEV-voxel rank and interval-sums them. On TPU the same reduction is a
single native scatter-add (XLA handles the memory coalescing; and device
sorts are pathologically slow on this runtime anyway), fused by XLA into the
surrounding program.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def bev_pool(
    feats: jnp.ndarray,  # [Np, C] flattened frustum features
    coords: jnp.ndarray,  # [Np, 3] int32 (ix, iy, iz) BEV/voxel coords
    valid: jnp.ndarray,  # [Np] bool (in-grid)
    nx: int,
    ny: int,
    nz: int,
) -> jnp.ndarray:
    """Scatter-add into a dense [nz, ny, nx, C] BEV volume (single sample)."""
    C = feats.shape[-1]
    cells = nz * ny * nx
    lin = (coords[:, 2] * ny + coords[:, 1]) * nx + coords[:, 0]
    lin = jnp.where(valid, lin, cells)
    out = jnp.zeros((cells + 1, C), feats.dtype).at[lin].add(
        jnp.where(valid[:, None], feats, 0.0), mode="drop"
    )
    return out[:cells].reshape(nz, ny, nx, C)


def bev_pool_batched(feats, coords, valid, nx: int, ny: int, nz: int) -> jnp.ndarray:
    """[B, Np, C] -> [B, ny, nx, C*nz] (z collapsed into channels like the
    reference's final ``torch.cat(x.unbind(dim=2), 1)``)."""
    vol = jax.vmap(lambda f, c, v: bev_pool(f, c, v, nx, ny, nz))(feats, coords, valid)
    B = vol.shape[0]
    # [B, nz, ny, nx, C] -> [B, ny, nx, nz*C] with channel = z*C + c
    return vol.transpose(0, 2, 3, 1, 4).reshape(B, ny, nx, -1)
