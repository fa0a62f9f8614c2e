"""Dense SECOND BEV decoder + SECONDFPN neck + ConvFuser (BEVFusion shared
decoder; reference bevfusion/mmdet3d/models/backbones/second.py:14-80,
necks/second.py SECONDFPN, fusers/conv.py ConvFuser)."""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..layers import BatchNorm2d, kaiming_conv_init
from ..registry import BACKBONES, NECKS


@BACKBONES.register_module
class SECOND(nn.Module):
    out_channels: Sequence[int] = (128, 256)
    layer_nums: Sequence[int] = (5, 5)
    layer_strides: Sequence[int] = (1, 2)

    @nn.compact
    def __call__(self, x, train: bool = False):
        outs = []
        for i, n in enumerate(self.layer_nums):
            x = nn.Conv(self.out_channels[i], (3, 3), strides=(self.layer_strides[i],) * 2,
                        padding=1, use_bias=False, kernel_init=kaiming_conv_init())(x)
            x = nn.relu(BatchNorm2d()(x, train))
            for _ in range(n):
                x = nn.Conv(self.out_channels[i], (3, 3), padding=1, use_bias=False,
                            kernel_init=kaiming_conv_init())(x)
                x = nn.relu(BatchNorm2d()(x, train))
            outs.append(x)
        return outs


@NECKS.register_module
class SECONDFPN(nn.Module):
    out_channels: Sequence[int] = (256, 256)
    upsample_strides: Sequence[int] = (1, 2)

    @nn.compact
    def __call__(self, xs, train: bool = False):
        ups = []
        for i, x in enumerate(xs):
            s = self.upsample_strides[i]
            if s > 1:
                u = nn.ConvTranspose(self.out_channels[i], (s, s), strides=(s, s),
                                     padding="VALID", use_bias=False,
                                     kernel_init=kaiming_conv_init())(x)
            else:
                u = nn.Conv(self.out_channels[i], (1, 1), use_bias=False,
                            kernel_init=kaiming_conv_init())(x)
            ups.append(nn.relu(BatchNorm2d()(u, train)))
        return jnp.concatenate(ups, axis=-1)


class ConvFuser(nn.Module):
    """concat(camera, lidar) -> 3x3 conv -> out (reference fusers/conv.py)."""

    out_channels: int = 256

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], train: bool = False):
        x = jnp.concatenate(feats, axis=-1)
        x = nn.Conv(self.out_channels, (3, 3), padding=1, use_bias=False,
                    kernel_init=kaiming_conv_init())(x)
        return nn.relu(BatchNorm2d()(x, train))
