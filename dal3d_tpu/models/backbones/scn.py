"""SECOND sparse middle backbone — flax re-design of the reference's
spconv-based SpMiddleResNetFHD / FPNSpMiddleResNetFHD
(det3d/models/backbones/scn.py:316-457).

Channel plan (matches reference):
  stem SubM(cin->16) -> 2x SparseBasicBlock(16) -> SparseConv s2 (16->32)
  -> 2x block(32) -> s2 (32->64)
  -> 2x block(64) -> s2 pad(0,1,1) (64->128)
  -> 2x block(128) -> k(3,1,1) s(2,1,1) (128->128)
  -> dense [B, H/8, W/8, 128*2]

SubM rulebooks are built once per level and shared across all SubM convs at
that level (spconv's ``indice_key`` reuse). The FPN variant returns the four
post-downsample sparse tensors (consumed by the active-learning feature
selectors, reference scn.py:376-392).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ...ops import sparse_backend as sp
from ..layers import MaskedBatchNorm, SparseConvDown, SubMConv
from ..registry import BACKBONES


class SparseBasicBlock(nn.Module):
    """Residual block of two SubM 3x3x3 convs (reference scn.py:54-97)."""

    planes: int

    @nn.compact
    def __call__(self, x: sp.SparseBatch, rulebook, train: bool) -> sp.SparseBatch:
        identity = x.features
        out = SubMConv(self.planes, use_bias=True)(x, rulebook)
        f = MaskedBatchNorm()(out.features, out.valid, train)
        f = nn.relu(f)
        out = out.replace(features=f)
        out = SubMConv(self.planes, use_bias=True)(out, rulebook)
        f = MaskedBatchNorm()(out.features, out.valid, train)
        f = nn.relu(f + identity)
        f = jnp.where(out.valid[..., None], f, 0.0)
        return out.replace(features=f)


class _Stage(nn.Module):
    """N basic blocks at the current level, then a strided downsample."""

    planes: int
    out_planes: int
    num_blocks: int
    down_kernel: Tuple[int, int, int]
    down_stride: Tuple[int, int, int]
    down_padding: Tuple[int, int, int]
    out_cap: int

    @nn.compact
    def __call__(self, x: sp.SparseBatch, train: bool) -> sp.SparseBatch:
        if self.num_blocks > 0:
            rb = sp.subm_rulebook(x, 3)
            for _ in range(self.num_blocks):
                x = SparseBasicBlock(self.planes)(x, rb, train)
        x = SparseConvDown(
            self.out_planes,
            kernel_size=self.down_kernel,
            stride=self.down_stride,
            padding=self.down_padding,
            out_cap=self.out_cap,
            use_bias=False,
        )(x)
        f = MaskedBatchNorm()(x.features, x.valid, train)
        return x.replace(features=nn.relu(f))


class FPNSpMiddleResNetFHD(nn.Module):
    """Sparse backbone returning (dense BEV map, 4 intermediate sparse tensors).

    voxel_caps: static per-level active-site capacities after each downsample.
    """

    num_input_features: int = 5
    voxel_caps: Sequence[int] = (60000, 60000, 30000, 30000)
    ds_factor: int = 8

    @nn.compact
    def __call__(self, sb: sp.SparseBatch, train: bool = False):
        # stem at level 0 (shares the level-0 rulebook with the first blocks)
        rb0 = sp.subm_rulebook(sb, 3)
        x = SubMConv(16, use_bias=False)(sb, rb0)
        f = MaskedBatchNorm()(x.features, x.valid, train)
        x = x.replace(features=nn.relu(f))
        x = SparseBasicBlock(16)(x, rb0, train)
        x = SparseBasicBlock(16)(x, rb0, train)
        x = SparseConvDown(32, (3, 3, 3), (2, 2, 2), (1, 1, 1), self.voxel_caps[0], use_bias=False)(x)
        f = MaskedBatchNorm()(x.features, x.valid, train)
        x = x.replace(features=nn.relu(f))
        middle = [x]

        x = _Stage(32, 64, 2, (3, 3, 3), (2, 2, 2), (1, 1, 1), self.voxel_caps[1])(x, train)
        middle.append(x)
        x = _Stage(64, 128, 2, (3, 3, 3), (2, 2, 2), (0, 1, 1), self.voxel_caps[2])(x, train)
        middle.append(x)
        x = _Stage(128, 128, 2, (3, 1, 1), (2, 1, 1), (0, 0, 0), self.voxel_caps[3])(x, train)
        middle.append(x)

        dense = sp.to_dense(x)  # [B, H/8, W/8, 128*D]
        return dense, middle


@BACKBONES.register_module
class SpMiddleResNetFHD(nn.Module):
    """Non-FPN variant: dense map only (reference scn.py:396-457)."""

    num_input_features: int = 5
    voxel_caps: Sequence[int] = (60000, 60000, 30000, 30000)
    ds_factor: int = 8

    @nn.compact
    def __call__(self, sb: sp.SparseBatch, train: bool = False):
        dense, _ = FPNSpMiddleResNetFHD(
            num_input_features=self.num_input_features,
            voxel_caps=self.voxel_caps,
            ds_factor=self.ds_factor,
        )(sb, train)
        return dense


BACKBONES.register_module(FPNSpMiddleResNetFHD)
