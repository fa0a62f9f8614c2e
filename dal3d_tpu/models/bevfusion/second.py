"""Dense SECOND BEV decoder + SECONDFPN neck + ConvFuser (BEVFusion shared
decoder; reference bevfusion/mmdet3d/models/backbones/second.py:14-80,
necks/second.py SECONDFPN, fusers/conv.py ConvFuser)."""
from __future__ import annotations

from typing import Sequence

import jax
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


class AddFuser(nn.Module):
    """Per-modality 3x3 conv+BN+ReLU, then weighted sum (reference
    fusers/add.py). ``dropout`` zeroes one random modality per train step
    with that probability (branch dropout regularizer); the weighted mean is
    renormalized over the surviving modalities as in the reference."""

    out_channels: int = 256
    dropout: float = 0.0

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], train: bool = False):
        outs = []
        for f in feats:
            x = nn.Conv(self.out_channels, (3, 3), padding=1, use_bias=False,
                        kernel_init=kaiming_conv_init())(f)
            outs.append(nn.relu(BatchNorm2d()(x, train)))
        n = len(outs)
        weights = jnp.ones((n,), jnp.float32)
        if train and self.dropout > 0 and n > 1:
            rng = self.make_rng("dropout")
            r_drop, r_pick = jax.random.split(rng)
            do = jax.random.uniform(r_drop) < self.dropout
            victim = jax.random.randint(r_pick, (), 0, n)
            weights = jnp.where(
                do & (jnp.arange(n) == victim), 0.0, 1.0
            )
        stacked = jnp.stack(outs, axis=0)
        w = weights.reshape((n,) + (1,) * (stacked.ndim - 1))
        return (stacked * w).sum(0) / weights.sum()
