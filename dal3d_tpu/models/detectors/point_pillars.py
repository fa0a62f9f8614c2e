"""PointPillars detector (reference det3d/models/detectors/point_pillars.py:6):
points -> pillarize -> PillarFeatureNet -> PointPillarsScatter BEV canvas ->
RPN -> MultiGroupHead. Same fixed-shape batch contract as FPNVoxelNet."""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops.voxelize import VoxelConfig
from ..heads.mg_head import MultiGroupHead
from ..necks.rpn import RPN
from ..readers.pillar_encoder import PillarFeatureNet, PointPillarsScatter, pillarize
from ..registry import DETECTORS


@DETECTORS.register_module
class PointPillars(nn.Module):
    voxel_cfg: VoxelConfig
    num_classes: Sequence[int] = (1,)
    code_size: int = 10
    num_input_features: int = 4
    pfn_filters: Tuple[int, ...] = (64,)
    rpn_layer_nums: Tuple[int, ...] = (3, 5, 5)
    rpn_ds_strides: Tuple[int, ...] = (2, 2, 2)
    rpn_ds_filters: Tuple[int, ...] = (64, 128, 256)
    rpn_us_strides: Tuple[int, ...] = (1, 2, 4)
    rpn_us_filters: Tuple[int, ...] = (128, 128, 128)

    @nn.compact
    def __call__(self, points, points_valid, train: bool = False):
        cfg = self.voxel_cfg
        nx, ny, _ = cfg.grid_size
        ok, pid, coords, pvalid = jax.vmap(lambda p, v: pillarize(p, v, cfg))(
            points, points_valid
        )
        pf = PillarFeatureNet(
            num_input_features=self.num_input_features,
            num_filters=self.pfn_filters,
            voxel_size=cfg.voxel_size[:2],
            pc_range=cfg.point_cloud_range[:2],
        )(points, ok, pid, coords, pvalid, train)
        canvas = PointPillarsScatter(self.pfn_filters[-1])(pf, coords, pvalid, nx, ny)
        neck = RPN(
            layer_nums=self.rpn_layer_nums,
            ds_layer_strides=self.rpn_ds_strides,
            ds_num_filters=self.rpn_ds_filters,
            us_layer_strides=self.rpn_us_strides,
            us_num_filters=self.rpn_us_filters,
            num_input_features=self.pfn_filters[-1],
        )(canvas, train)
        preds = MultiGroupHead(num_classes=tuple(self.num_classes), code_size=self.code_size)(neck)
        return {"preds": preds, "embedding": neck.mean(axis=(1, 2)), "neck_feat": neck}
