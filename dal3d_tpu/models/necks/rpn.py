"""Dense BEV RPN neck (reference: det3d/models/necks/rpn.py:23-159).

Conv blocks (strides 1, 2) + transpose-conv upsamples, concatenated to the
512-channel BEV map the multi-group head consumes. NHWC layout (TPU-native);
all convs bias-free + BN(eps 1e-3, torch-momentum 0.01) + ReLU, matching the
reference's block structure exactly (ZeroPad+Conv3x3 stem per block, then
``layer_num`` 3x3 convs).
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..layers import BatchNorm2d, kaiming_conv_init
from ..registry import NECKS
from ...parallel.mesh import bev_constraint


@NECKS.register_module
class RPN(nn.Module):
    layer_nums: Sequence[int] = (5, 5)
    ds_layer_strides: Sequence[int] = (1, 2)
    ds_num_filters: Sequence[int] = (128, 256)
    us_layer_strides: Sequence[int] = (1, 2)
    us_num_filters: Sequence[int] = (256, 256)
    num_input_features: int = 256
    dtype: str = "float32"  # compute dtype (bf16 halves activation HBM)

    @property
    def downsample_factor(self):
        factor = int(np.prod(self.ds_layer_strides))
        if len(self.us_layer_strides) > 0:
            factor /= self.us_layer_strides[-1]
        return factor

    @nn.compact
    def __call__(self, x, train: bool = False):
        cdt = jnp.dtype(self.dtype)
        # model-axis spatial partitioning: rows of the BEV map shard over the
        # ambient mesh's 'model' axis; XLA SPMD halo-exchanges the conv edges
        x = bev_constraint(x.astype(cdt))
        upsample_start_idx = len(self.layer_nums) - len(self.us_layer_strides)
        ups = []
        for i, layer_num in enumerate(self.layer_nums):
            stride = self.ds_layer_strides[i]
            planes = self.ds_num_filters[i]
            x = nn.Conv(
                planes, (3, 3), strides=(stride, stride), padding=1, use_bias=False,
                kernel_init=kaiming_conv_init(), dtype=cdt,
            )(x)
            x = nn.relu(BatchNorm2d()(x, train))
            for _ in range(layer_num):
                x = nn.Conv(
                    planes, (3, 3), padding=1, use_bias=False,
                    kernel_init=kaiming_conv_init(), dtype=cdt,
                )(x)
                x = nn.relu(BatchNorm2d()(x, train))
            if i - upsample_start_idx >= 0:
                us = self.us_layer_strides[i - upsample_start_idx]
                filters = self.us_num_filters[i - upsample_start_idx]
                if us > 1:
                    u = nn.ConvTranspose(
                        filters, (us, us), strides=(us, us), padding="VALID", use_bias=False,
                        kernel_init=kaiming_conv_init(), dtype=cdt,
                    )(x)
                else:
                    k = int(np.round(1 / us))
                    u = nn.Conv(
                        filters, (k, k), strides=(k, k), use_bias=False,
                        kernel_init=kaiming_conv_init(), dtype=cdt,
                    )(x)
                u = nn.relu(BatchNorm2d()(u, train))
                ups.append(u)
        if ups:
            x = jnp.concatenate(ups, axis=-1)
        return bev_constraint(x.astype(jnp.float32))
