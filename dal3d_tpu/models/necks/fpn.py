"""Standard image FPN (reference det3d/models/necks/fpn.py:11 — registered by
the reference but unused by the active configs; provided for parity)."""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..layers import kaiming_conv_init
from ..registry import NECKS


@NECKS.register_module
class FPN(nn.Module):
    out_channels: int = 256
    num_outs: int = 4

    @nn.compact
    def __call__(self, inputs: Sequence[jnp.ndarray], train: bool = False):
        laterals = [
            nn.Conv(self.out_channels, (1, 1), kernel_init=kaiming_conv_init())(x)
            for x in inputs
        ]
        for i in range(len(laterals) - 1, 0, -1):
            B, H, W, C = laterals[i - 1].shape
            up = jax.image.resize(laterals[i], (B, H, W, C), method="nearest")
            laterals[i - 1] = laterals[i - 1] + up
        outs = [
            nn.Conv(self.out_channels, (3, 3), padding=1, kernel_init=kaiming_conv_init())(l)
            for l in laterals
        ]
        return outs[: self.num_outs]
