"""BEVFusion lidar branch: SparseEncoder on the grid sparse-conv engine.

Re-design of bevfusion/mmdet3d/models/backbones/sparse_encoder.py:11-218
(vendored-spconv based, block_type="basicblock"): conv_input SubM stem,
four encoder stages over channels [[16,16,32],[32,32,64],[64,64,128],
[128,128]] — each of stages 1-3 is 2 residual SparseBasicBlocks
(mmdet3d/ops/sparse_block.py:62-110, mmcv BasicBlock: bias-free convs)
followed by a strided SparseConv3d downsample (stage-3 z-padding 0, config
encoder_paddings [1,1,0] in the reference's (x,y,z) dim order = our
(0,1,1) zyx); stage 4 is 2 blocks with no downsample — then the conv_out
z-squash (reference kernel (1,1,3) stride (1,1,2) over xyz = our (3,1,1)/
(2,1,1)) and a dense [B, H/8, W/8, 128*2] NHWC output (channel = c*D + d,
ops/sparse.py to_dense, matching the reference's N,C*D,H,W reshape at
sparse_encoder.py:126-130).

Layout note: the reference's vendored voxelizer emits (x, y, z) coords
(ops/voxel/src/voxelization_cuda.cu:37-59, no axis reversal) over
sparse_shape [1440, 1440, 41], so its BEV map is [B, C*D, X, Y]; ours
keeps the Det3D (z, y, x) convention -> [B, Y, X, C*D]. The checkpoint
converter transposes conv kernels' spatial axes accordingly.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ...ops import sparse_backend as sp
from ..backbones.scn import SparseBasicBlock
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
        # conv_input: SubM stem + BN + ReLU
        rb = sp.subm_rulebook(sb, 3)
        x = SubMConv(self.encoder_channels[0][0], use_bias=False)(sb, rb)
        f = MaskedBatchNorm()(x.features, x.valid, train)
        x = x.replace(features=nn.relu(f))

        n_stage = len(self.encoder_channels)
        for i, chans in enumerate(self.encoder_channels):
            if i > 0:
                rb = sp.subm_rulebook(x, 3)
            last_is_down = i < n_stage - 1
            blocks = chans[:-1] if last_is_down else chans
            for c in blocks:
                x = SparseBasicBlock(c, use_bias=False)(x, rb, train)
            if last_is_down:
                pad = (1, 1, 1) if i < 2 else (0, 1, 1)
                x = SparseConvDown(chans[-1], (3, 3, 3), (2, 2, 2), pad,
                                   self.voxel_caps[i], use_bias=False)(x)
                f = MaskedBatchNorm()(x.features, x.valid, train)
                x = x.replace(features=nn.relu(f))
        # conv_out: z-squash to D=2
        x = SparseConvDown(self.encoder_channels[-1][-1], (3, 1, 1), (2, 1, 1),
                           (0, 0, 0), self.voxel_caps[-1], use_bias=False)(x)
        f = MaskedBatchNorm()(x.features, x.valid, train)
        x = x.replace(features=nn.relu(f))
        return sp.to_dense(x)
