"""Dense-compute sparse-semantics 3D convolution.

Measured on the target TPU: XLA row gathers cost ~17-50 ns/row regardless of
dtype or formulation, making gather-GEMM sparse conv ~55 ms/layer at CBGS
scale while the MXU sits idle. At SECOND's densities (60k active of 43M cells,
0.14%) the *dense* 3D convolution of the whole grid is only ~600 GFLOP — a few
ms of MXU time — so on TPU the winning sparse-conv strategy is:

    scatter voxels into a dense [D, H, W, C] grid ONCE, then express every
    SubM / strided sparse conv as a dense ``lax.conv_general_dilated``
    masked by an occupancy grid that propagates exactly like spconv's
    active sets (SubM: occupancy unchanged; strided: any-input-in-window).

Semantics match the gather engine exactly (unit-tested): inactive cells stay
hard-zero, so masked batch-norm statistics and residual adds are unchanged.
bf16 activations halve the HBM traffic (the actual bound).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from .sparse import SparseBatch, _triple


def to_dense_grid(sb: SparseBatch) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """SparseBatch -> (dense [B, D, H, W, C], occupancy [B, D, H, W]).

    Occupancy is channel-FREE: any [*, 1]-shaped tensor materializes with a
    128-lane layout on this TPU (5.6 GB at L1 scale); broadcasts happen
    inline at use sites instead."""
    B, N, C = sb.features.shape
    D, H, W = sb.shape
    cells = D * H * W
    flat = jnp.where(sb.valid, sb.lin, cells)

    def one(feat, fl, val):
        dense = jnp.zeros((cells + 1, C), feat.dtype).at[fl].set(feat, mode="drop")[:cells]
        occ = jnp.zeros((cells + 1,), feat.dtype).at[fl].set(
            val.astype(feat.dtype), mode="drop"
        )[:cells]
        return dense.reshape(D, H, W, C), occ.reshape(D, H, W)

    return jax.vmap(one)(sb.features, flat, sb.valid)


def _conv3d_depth_sliced(x, w5, stride, padding):
    """3D conv as kd depth-plane-sliced 2D convs.

    XLA's NDHWC 3D conv lowers pathologically on this TPU runtime (L0 fails
    to compile; L1 runs 40x off roofline), so the depth axis is folded into
    the batch: for each kernel depth offset take a static strided slice of
    depth planes and run a standard NHWC 2D conv, summing the kd terms.
    x [B, D, H, W, C]; w5 [kd, kh, kw, Cin, Cout].
    """
    B, D, H, W, C = x.shape
    kd, kh, kw = w5.shape[:3]
    sd, sh, sw = _triple(stride)
    pd, ph, pw = _triple(padding)
    Do = (D + 2 * pd - kd) // sd + 1
    xpad = jnp.pad(x, ((0, 0), (pd, pd), (0, 0), (0, 0), (0, 0)))
    out = None
    for k in range(kd):
        planes = jax.lax.slice_in_dim(xpad, k, k + (Do - 1) * sd + 1, sd, axis=1)
        # all operands share x.dtype (mixed f32 accumulation breaks the
        # conv transpose dtype check in backward; the MXU accumulates f32
        # internally regardless)
        y = jax.lax.conv_general_dilated(
            planes.reshape(B * Do, H, W, C), w5[k].astype(x.dtype),
            (sh, sw), [(ph, ph), (pw, pw)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        out = y if out is None else out + y
    Ho = (H + 2 * ph - kh) // sh + 1
    Wo = (W + 2 * pw - kw) // sw + 1
    return out.reshape(B, Do, Ho, Wo, -1).astype(x.dtype)


def subm_conv_dense(
    x: jnp.ndarray,  # [B, D, H, W, C]
    occ: jnp.ndarray,  # [B, D, H, W]
    weights: jnp.ndarray,  # [K, Cin, Cout] (kernel-offset-major, matches gather engine)
    kernel_size=3,
) -> jnp.ndarray:
    """Submanifold conv: dense conv masked to the input active set."""
    kd, kh, kw = _triple(kernel_size)
    w = weights.reshape(kd, kh, kw, weights.shape[1], weights.shape[2])
    out = _conv3d_depth_sliced(x, w, (1, 1, 1), (kd // 2, kh // 2, kw // 2))
    return out * occ[..., None].astype(out.dtype)


def dilate_occupancy(occ: jnp.ndarray, kernel_size, stride, padding) -> jnp.ndarray:
    """occ [B, D, H, W] -> dilated/strided occupancy (any input in window).

    Shifted-slice maximums — a C=1 convolution (or any [*, 1] tensor) gets
    lane-padded 1->128 by the TPU layout engine (~5.6 GB at L1).
    """
    kd, kh, kw = _triple(kernel_size)
    sd, sh, sw = _triple(stride)
    pd, ph, pw = _triple(padding)
    o = occ
    B, D, H, W = o.shape
    op = jnp.pad(o, ((0, 0), (pd, pd), (ph, ph), (pw, pw)))
    Do = (D + 2 * pd - kd) // sd + 1
    Ho = (H + 2 * ph - kh) // sh + 1
    Wo = (W + 2 * pw - kw) // sw + 1
    out = None
    for dz in range(kd):
        for dy in range(kh):
            for dx in range(kw):
                sl = op[:, dz : dz + (Do - 1) * sd + 1 : sd,
                        dy : dy + (Ho - 1) * sh + 1 : sh,
                        dx : dx + (Wo - 1) * sw + 1 : sw]
                out = sl if out is None else jnp.maximum(out, sl)
    return (out > 0).astype(occ.dtype)


def sparse_conv_down_dense(
    x: jnp.ndarray,
    occ: jnp.ndarray,
    weights: jnp.ndarray,  # [K, Cin, Cout]
    kernel_size, stride, padding,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Strided sparse conv: dense strided conv + occupancy dilation
    (output active iff any input in its receptive field — exact spconv
    output-set semantics). Returns (out, occ_out)."""
    kd, kh, kw = _triple(kernel_size)
    w = weights.reshape(kd, kh, kw, weights.shape[1], weights.shape[2])
    out = _conv3d_depth_sliced(x, w, stride, padding)
    occ_out = dilate_occupancy(occ, kernel_size, stride, padding)
    return out * occ_out[..., None].astype(out.dtype), occ_out


def masked_mean_var(x: jnp.ndarray, occ: jnp.ndarray):
    """Batch-norm statistics over active cells only (f32). occ [B,D,H,W]."""
    m = occ[..., None].astype(jnp.float32)
    cnt = jnp.maximum(m.sum(), 1.0)
    xf = x.astype(jnp.float32)
    mean = (xf * m).sum(axis=tuple(range(x.ndim - 1))) / cnt
    var = (jnp.square(xf - mean) * m).sum(axis=tuple(range(x.ndim - 1))) / cnt
    return mean, var
