"""Sparse 3D convolution engine — TPU-native replacement for spconv.

The reference SECOND backbone runs on the external spconv 1.2.1 CUDA library
(rulebook hash tables + gather-GEMM-scatter kernels; consumed at
det3d/models/backbones/scn.py:4,17 and vendored at
bevfusion/mmdet3d/ops/spconv). This module re-designs it for XLA:

- A sparse tensor is a **fixed-capacity batched struct**: features [B, N, C],
  linearized coords [B, N] (sorted ascending, sentinel-padded), validity
  implied by ``lin < sentinel``. Static shapes end-to-end — the whole backbone
  is one XLA program.
- Neighbor lookup is **binary search over the sorted coord array**
  (jnp.searchsorted) instead of GPU hash tables: O(K·N·logN) with no giant
  dense index grid in HBM.
- Submanifold conv: per kernel offset, gather neighbor features -> matmul on
  the MXU -> accumulate (lax.scan over offsets keeps peak memory at one
  gathered block).
- Strided sparse conv: output active set = jnp.unique of all valid
  (i + pad - δ)/stride candidates (exact spconv output-set semantics), then
  the same gather-GEMM-accumulate against input sites.

Caps: each level carries a static max-active-sites cap; overflow truncates
deterministically (lowest linear index first, like the sorted order).
"""
from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct


def _triple(x) -> Tuple[int, int, int]:
    if isinstance(x, (tuple, list)):
        assert len(x) == 3
        return tuple(int(v) for v in x)
    return (int(x),) * 3


@struct.dataclass
class SparseBatch:
    """Batched sparse tensor with static capacity.

    lin is sorted ascending per batch element; padding slots hold
    ``sentinel = D*H*W`` and zero features.
    """

    features: jnp.ndarray  # [B, N, C]
    lin: jnp.ndarray  # [B, N] int32
    shape: Tuple[int, int, int] = struct.field(pytree_node=False)  # (D, H, W)

    @property
    def sentinel(self) -> int:
        D, H, W = self.shape
        return D * H * W

    @property
    def valid(self) -> jnp.ndarray:
        return self.lin < self.sentinel

    def coords(self) -> jnp.ndarray:
        """[B, N, 3] (z, y, x); padding slots decode to garbage (mask first)."""
        D, H, W = self.shape
        z = self.lin // (H * W)
        rem = self.lin % (H * W)
        return jnp.stack([z, rem // W, rem % W], axis=-1)


def from_voxels(features: jnp.ndarray, coords_zyx: jnp.ndarray, valid: jnp.ndarray, shape) -> SparseBatch:
    """Build a SparseBatch from voxelizer output (any voxel order).

    features [B, N, C], coords_zyx [B, N, 3], valid [B, N].
    """
    D, H, W = (int(s) for s in shape)
    sentinel = D * H * W
    lin = (coords_zyx[..., 0] * H + coords_zyx[..., 1]) * W + coords_zyx[..., 2]
    lin = jnp.where(valid, lin, sentinel).astype(jnp.int32)
    order = jnp.argsort(lin, axis=-1)
    lin_s = jnp.take_along_axis(lin, order, axis=-1)
    feat_s = jnp.take_along_axis(features, order[..., None], axis=1)
    feat_s = jnp.where((lin_s < sentinel)[..., None], feat_s, 0.0)
    return SparseBatch(features=feat_s, lin=lin_s, shape=(D, H, W))


def _kernel_offsets(kernel_size) -> np.ndarray:
    kd, kh, kw = _triple(kernel_size)
    offs = np.stack(
        np.meshgrid(np.arange(kd), np.arange(kh), np.arange(kw), indexing="ij"), axis=-1
    ).reshape(-1, 3)
    return offs  # [K, 3] in (z, y, x), kernel-position order (weight index order)


def _lookup(lin_sorted: jnp.ndarray, queries: jnp.ndarray, sentinel: int):
    """Binary-search lookup. lin_sorted [N] asc; queries [Q] ->
    (idx [Q] int32 position in the sparse array, hit [Q] bool)."""
    pos = jnp.searchsorted(lin_sorted, queries, side="left", method="sort").astype(jnp.int32)
    pos = jnp.minimum(pos, lin_sorted.shape[0] - 1)
    hit = (lin_sorted[pos] == queries) & (queries < sentinel)
    return pos, hit


def subm_rulebook(sb: SparseBatch, kernel_size) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Rulebook for submanifold conv (output sites == input sites).

    Returns (idx [B, K, N], hit [B, K, N]): for each output site and kernel
    offset, the input-array position to gather (and whether it exists).
    Shared across all SubM convs with the same kernel at this level
    (spconv's ``indice_key`` reuse).
    """
    D, H, W = sb.shape
    sentinel = sb.sentinel
    offs = _kernel_offsets(kernel_size)
    center = (np.array(_triple(kernel_size)) - 1) // 2
    deltas = offs - center  # [K, 3]

    def per_batch(lin):
        c = jnp.stack([lin // (H * W), (lin % (H * W)) // W, lin % W], axis=-1)  # [N,3]
        q = c[None, :, :] + jnp.asarray(deltas)[:, None, :]  # [K, N, 3]
        inb = jnp.all((q >= 0) & (q < jnp.asarray([D, H, W])), axis=-1)
        qlin = (q[..., 0] * H + q[..., 1]) * W + q[..., 2]
        qlin = jnp.where(inb & (lin < sentinel)[None, :], qlin, sentinel)
        idx, hit = _lookup(lin, qlin.reshape(-1), sentinel)
        K = deltas.shape[0]
        return idx.reshape(K, -1), hit.reshape(K, -1)

    return jax.vmap(per_batch)(sb.lin)


def gather_gemm(features: jnp.ndarray, idx: jnp.ndarray, hit: jnp.ndarray, weights: jnp.ndarray):
    """Core sparse conv compute: features [B, N, Cin], idx/hit [B, K, M],
    weights [K, Cin, Cout] -> [B, M, Cout].

    One flat [B, K*M] gather + a single MXU contraction over (K, Cin).
    (A lax.scan over offsets has equal forward cost — gathers are row-bound —
    but its backward stacks per-step cotangents, ~600 MB at L0 scale.)

    The miss mask is folded into the gather by appending a zero row to the
    table and pointing misses at it — the [B, K*M, Cin] gathered intermediate
    (hundreds of MB at L0) is consumed by the einsum directly instead of
    round-tripping through a ``where`` (measured ~4 ms/conv at L0).
    """
    B, N, Cin = features.shape
    K, _, Cout = weights.shape
    M = idx.shape[-1]
    tbl = jnp.concatenate([features, jnp.zeros((B, 1, Cin), features.dtype)], axis=1)
    safe_idx = jnp.where(hit, idx, N).reshape(B, K * M, 1)
    g = jnp.take_along_axis(tbl, safe_idx, axis=1)  # [B, K*M, Cin]; misses hit the zero row
    g = g.reshape(B, K, M, Cin)
    out = jnp.einsum("bkmc,kcd->bmd", g, weights, preferred_element_type=jnp.float32)
    return out.astype(features.dtype)


def subm_conv(sb: SparseBatch, weights: jnp.ndarray, rulebook=None, kernel_size=3) -> SparseBatch:
    """Submanifold sparse conv. weights [K, Cin, Cout]."""
    if rulebook is None:
        rulebook = subm_rulebook(sb, kernel_size)
    idx, hit = rulebook
    out = gather_gemm(sb.features, idx, hit, weights)
    out = jnp.where(sb.valid[..., None], out, 0.0)
    return SparseBatch(features=out, lin=sb.lin, shape=sb.shape)


def downsample_plan(sb: SparseBatch, kernel_size, stride, padding, out_cap: int):
    """Plan a strided sparse conv: output active set + gather rulebook.

    Exact spconv output-set semantics: output site o is active iff
    s*o - p + δ hits an active input for some kernel offset δ.
    Returns (out_lin [B, M], idx [B, K, M], hit [B, K, M], out_shape).
    """
    D, H, W = sb.shape
    kd, kh, kw = _triple(kernel_size)
    sd, sh, sw = _triple(stride)
    pd, ph, pw = _triple(padding)
    Do = (D + 2 * pd - kd) // sd + 1
    Ho = (H + 2 * ph - kh) // sh + 1
    Wo = (W + 2 * pw - kw) // sw + 1
    out_sent = Do * Ho * Wo
    offs = jnp.asarray(_kernel_offsets(kernel_size))  # [K,3]
    stride_v = jnp.asarray([sd, sh, sw])
    pad_v = jnp.asarray([pd, ph, pw])
    out_dims = jnp.asarray([Do, Ho, Wo])

    def per_batch(lin):
        sentinel = D * H * W
        c = jnp.stack([lin // (H * W), (lin % (H * W)) // W, lin % W], axis=-1)  # [N,3]
        # candidates: o = (i + p - δ) / s where divisible & in range
        num = c[:, None, :] + pad_v[None, None, :] - offs[None, :, :]  # [N,K,3]
        div_ok = (num % stride_v[None, None, :]) == 0
        o = num // stride_v[None, None, :]
        inb = (o >= 0) & (o < out_dims[None, None, :])
        ok = jnp.all(div_ok & inb, axis=-1) & (lin < sentinel)[:, None]
        olin = (o[..., 0] * Ho + o[..., 1]) * Wo + o[..., 2]
        olin = jnp.where(ok, olin, out_sent).astype(jnp.int32)
        out_lin = jnp.unique(olin.reshape(-1), size=out_cap, fill_value=out_sent)

        # rulebook: input site for each (output, δ): i = s*o - p + δ
        oc = jnp.stack(
            [out_lin // (Ho * Wo), (out_lin % (Ho * Wo)) // Wo, out_lin % Wo], axis=-1
        )
        ic = oc[None, :, :] * stride_v[None, None, :] - pad_v[None, None, :] + offs[:, None, :]
        iinb = jnp.all((ic >= 0) & (ic < jnp.asarray([D, H, W])), axis=-1)
        ilin = (ic[..., 0] * H + ic[..., 1]) * W + ic[..., 2]
        ilin = jnp.where(iinb & (out_lin < out_sent)[None, :], ilin, sentinel)
        K = offs.shape[0]
        idx, hit = _lookup(lin, ilin.reshape(-1), sentinel)
        return out_lin, idx.reshape(K, -1), hit.reshape(K, -1)

    out_lin, idx, hit = jax.vmap(per_batch)(sb.lin)
    return out_lin, idx, hit, (Do, Ho, Wo)


def sparse_conv_downsample(
    sb: SparseBatch, weights: jnp.ndarray, kernel_size, stride, padding, out_cap: int,
    grid=None,
) -> SparseBatch:
    """Strided (non-submanifold) sparse conv. weights [K, Cin, Cout]."""
    out_lin, idx, hit, out_shape = downsample_plan(sb, kernel_size, stride, padding, out_cap)
    out = gather_gemm(sb.features, idx, hit, weights)
    out = jnp.where((out_lin < np.prod(out_shape))[..., None], out, 0.0)
    return SparseBatch(features=out, lin=out_lin, shape=out_shape)


def to_dense(sb: SparseBatch) -> jnp.ndarray:
    """Scatter into a dense NHWC map: [B, H, W, C*D] with channel = c*D + d
    (matches the reference's N,C*D,H,W reshape at scn.py:389-391, transposed
    to TPU-friendly NHWC)."""
    B, N, C = sb.features.shape
    D, H, W = sb.shape
    flat = jnp.where(sb.valid, sb.lin, D * H * W)

    def per_batch(feat, flat_idx):
        dense = jnp.zeros((D * H * W + 1, C), feat.dtype).at[flat_idx].set(feat, mode="drop")
        dense = dense[:-1].reshape(D, H, W, C)
        return dense.transpose(1, 2, 3, 0).reshape(H, W, C * D)

    return jax.vmap(per_batch)(sb.features, flat)
