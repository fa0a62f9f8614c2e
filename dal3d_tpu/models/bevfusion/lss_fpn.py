"""GeneralizedLSSFPN camera neck (reference bevfusion/mmdet3d/models/necks/
generalized_lss.py): top-down pathway where each level concatenates its
lateral input with the upsampled coarser level before the lateral 1x1 and
3x3 fpn convs. NHWC."""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..layers import BatchNorm2d, kaiming_conv_init
from ..registry import NECKS


def _upsample2x(x):
    B, H, W, C = x.shape
    return jax.image.resize(x, (B, H * 2, W * 2, C), method="bilinear")


@NECKS.register_module
class GeneralizedLSSFPN(nn.Module):
    out_channels: int = 256
    num_outs: int = 2

    @nn.compact
    def __call__(self, inputs: Sequence[jnp.ndarray], train: bool = False):
        # top-down: start from the coarsest
        n = len(inputs)
        feats = list(inputs)
        outs = [None] * n
        prev = feats[-1]
        outs[-1] = prev
        for i in range(n - 2, -1, -1):
            up = _upsample2x(outs[i + 1])
            # crop/pad to match
            H, W = feats[i].shape[1:3]
            up = up[:, :H, :W]
            cat = jnp.concatenate([feats[i], up], axis=-1)
            lat = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                          kernel_init=kaiming_conv_init())(cat)
            lat = nn.relu(BatchNorm2d()(lat, train))
            out = nn.Conv(self.out_channels, (3, 3), padding=1, use_bias=False,
                          kernel_init=kaiming_conv_init())(lat)
            outs[i] = nn.relu(BatchNorm2d()(out, train))
        return outs[: self.num_outs]
