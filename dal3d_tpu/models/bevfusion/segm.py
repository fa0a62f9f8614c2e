"""BEV map-segmentation head (reference bevfusion/mmdet3d/models/heads/segm/
vanilla.py:1-138): conv stack on the fused BEV map predicting per-class
rasterized map masks, trained with sigmoid BCE."""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..layers import BatchNorm2d, kaiming_conv_init
from ..losses.losses import sigmoid_cross_entropy_with_logits
from ..registry import HEADS


@HEADS.register_module
class BEVSegmentationHead(nn.Module):
    classes: Sequence[str] = ("drivable_area", "ped_crossing", "walkway",
                              "stop_line", "carpark_area", "divider")
    hidden: int = 128
    num_convs: int = 3

    @nn.compact
    def __call__(self, bev, train: bool = False):
        x = bev
        for _ in range(self.num_convs):
            x = nn.Conv(self.hidden, (3, 3), padding=1, use_bias=False,
                        kernel_init=kaiming_conv_init())(x)
            x = nn.relu(BatchNorm2d()(x, train))
        return nn.Conv(len(self.classes), (1, 1), kernel_init=kaiming_conv_init())(x)


def bev_segmentation_loss(logits: jnp.ndarray, targets: jnp.ndarray):
    """logits/targets [B, H, W, C] -> mean BCE per class + total."""
    bce = sigmoid_cross_entropy_with_logits(logits, targets)
    per_class = bce.mean(axis=(0, 1, 2))
    return {"loss": per_class.sum(), "per_class": per_class}


def bev_segmentation_miou(logits: jnp.ndarray, targets: jnp.ndarray, thresh: float = 0.5):
    pred = jax.nn.sigmoid(logits) > thresh
    tgt = targets > 0.5
    inter = (pred & tgt).sum(axis=(0, 1, 2))
    union = (pred | tgt).sum(axis=(0, 1, 2))
    return jnp.where(union > 0, inter / union, 0.0)
