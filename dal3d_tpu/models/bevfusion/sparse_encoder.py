"""BEVFusion lidar branch: SparseEncoder on the grid sparse-conv engine.

Re-design of bevfusion/mmdet3d/models/backbones/sparse_encoder.py:11-218
(vendored-spconv based): channel plan [[16,16,32],[32,32,64],[64,64,128],
[128,128]] over sparse_shape [41, 1440, 1440] (voxelnet_0p075), SubM blocks
per stage with strided downsamples between, final (3,1,1)/(2,1,1) depth
squash and dense [B, H/8, W/8, 128*2] output.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ...ops import sparse_backend as sp
from ..layers import MaskedBatchNorm, SparseConvDown, SubMConv
from ..registry import BACKBONES


@BACKBONES.register_module
class SparseEncoder(nn.Module):
    in_channels: int = 5
    encoder_channels: Tuple[Tuple[int, ...], ...] = (
        (16, 16, 32), (32, 32, 64), (64, 64, 128), (128, 128)
    )
    voxel_caps: Sequence[int] = (120000, 60000, 30000, 30000)

    @nn.compact
    def __call__(self, sb: sp.SparseBatch, train: bool = False):
        # stem
        rb = sp.subm_rulebook(sb, 3)
        x = SubMConv(self.encoder_channels[0][0], use_bias=False)(sb, rb)
        f = MaskedBatchNorm()(x.features, x.valid, train)
        x = x.replace(features=nn.relu(f))

        n_stage = len(self.encoder_channels)
        for i, chans in enumerate(self.encoder_channels):
            if i > 0:
                rb = sp.subm_rulebook(x, 3)
            for c in chans[:-1]:
                x = SubMConv(c, use_bias=True)(x, rb)
                f = MaskedBatchNorm()(x.features, x.valid, train)
                x = x.replace(features=nn.relu(f))
            last = chans[-1]
            if i < n_stage - 1:
                pad = (1, 1, 1) if i < 2 else (0, 1, 1)
                x = SparseConvDown(last, (3, 3, 3), (2, 2, 2), pad,
                                   self.voxel_caps[i], use_bias=False)(x)
            else:
                x = SparseConvDown(last, (3, 1, 1), (2, 1, 1), (0, 0, 0),
                                   self.voxel_caps[i], use_bias=False)(x)
            f = MaskedBatchNorm()(x.features, x.valid, train)
            x = x.replace(features=nn.relu(f))
        return sp.to_dense(x)
