"""VoxelNet / FPNVoxelNet detectors (reference: det3d/models/detectors/
voxelnet.py:8-118, single_stage.py:9).

TPU-first design: the jitted forward consumes **padded raw points**
[B, P, F] + validity and performs voxelize -> mean-VFE -> sparse backbone ->
RPN -> multi-group head as ONE XLA program (the reference splits voxelization
into CPU dataloader workers). The ``estimate`` contract of the reference
(voxelnet.py:113-118, consumed by every model-based AL selector per
SURVEY.md A.9) maps to the returned ``embedding`` (global-avg-pooled neck
output, [B, 512]) and ``middle`` sparse pyramid.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops import sparse_backend as sp
from ...ops.voxelize import VoxelConfig, voxelize_mean, voxelize_mean_grid
from ..backbones.scn import FPNSpMiddleResNetFHD
from ..heads.mg_head import MultiGroupHead
from ..necks.rpn import RPN
from ..registry import DETECTORS


@DETECTORS.register_module
class FPNVoxelNet(nn.Module):
    voxel_cfg: VoxelConfig
    num_classes: Sequence[int] = (1, 2, 2, 1, 2, 2)
    code_size: int = 10
    num_input_features: int = 5
    voxel_caps: Tuple[int, ...] = (60000, 60000, 30000, 30000)
    # RPN config (reference cbgs config values)
    rpn_layer_nums: Tuple[int, ...] = (5, 5)
    rpn_ds_strides: Tuple[int, ...] = (1, 2)
    rpn_ds_filters: Tuple[int, ...] = (128, 256)
    rpn_us_strides: Tuple[int, ...] = (1, 2)
    rpn_us_filters: Tuple[int, ...] = (256, 256)
    return_middle: bool = True
    # dense-grid voxelizer (no device sorts; see ops.voxelize.voxelize_mean_grid)
    sort_free_voxelize: bool = True
    # backbone compute dtype ("bfloat16" for the bandwidth-bound sparse path)
    backbone_dtype: str = "float32"
    # "brick" (W-run packing), "banded" (brick + MXU one-hot gather kernel),
    # "hybrid", "dense", or "gather"
    backbone_impl: str = "gather"
    brick_widths: Tuple[int, ...] = (16, 16, 8, 4, 4)
    brick_caps: Tuple[int, ...] = (48000, 17000, 10000, 6000, 6000)
    # banded-engine knobs (impl="banded"; see FPNSpMiddleResNetFHD)
    band_widths: Tuple[int, ...] = (768, 512, 512, 512, 512)
    down_bands: Tuple[int, ...] = (2048, 1024, 512, 512)
    band_fb_cap: int = 256
    banded_caps: Tuple[int, ...] = (48000, 17024, 9984, 6016, 6016)

    @nn.compact
    def __call__(self, points: jnp.ndarray, points_valid: jnp.ndarray, train: bool = False,
                 voxels=None):
        """voxels: optional (features [B,M,F], coords [B,M,3] zyx, valid [B,M])
        from the host voxelizer; device voxelization runs otherwise. A 4-tuple
        additionally carries the host sparse-plan dict (data/sparse_plans.py
        keys, at minimum brick_row/brick_lin), consumed by the brick/banded
        engines."""
        cfg = self.voxel_cfg
        plan = None
        if voxels is not None:
            if len(voxels) == 4:
                vf, vc, vv, plan = voxels
            else:
                vf, vc, vv = voxels
        else:
            vox_fn = voxelize_mean_grid if self.sort_free_voxelize else voxelize_mean
            vox = jax.vmap(lambda p, v: vox_fn(p, v, cfg))(points, points_valid)
            vf, vc, vv = vox["features"], vox["coordinates"], vox["voxel_valid"]
        if self.backbone_impl in ("brick", "banded"):
            # brick engine packs straight from (unordered) voxel lists — the
            # sorted SparseBatch build (argsort over max_voxel_num) is skipped
            sb = (vf, vc, vv, tuple(cfg.sparse_shape))
            if plan:
                sb = sb + (plan,)
        else:
            sb = sp.from_voxels(vf, vc, vv, cfg.sparse_shape)
        dense, middle = FPNSpMiddleResNetFHD(
            num_input_features=self.num_input_features, voxel_caps=self.voxel_caps,
            dtype=self.backbone_dtype, impl=self.backbone_impl,
            brick_widths=self.brick_widths, brick_caps=self.brick_caps,
            band_widths=self.band_widths, down_bands=self.down_bands,
            band_fb_cap=self.band_fb_cap, banded_caps=self.banded_caps,
        )(sb, train)
        # same knob as the backbone (scn.py): RPN activations at B=2 are
        # ~0.4 GB — storing beats recomputing on a 16 GB chip
        import os

        RematRPN = (RPN if os.environ.get("DAL3D_REMAT", "0") == "0"
                    else nn.remat(RPN, static_argnums=(2,)))
        neck = RematRPN(
            layer_nums=self.rpn_layer_nums,
            ds_layer_strides=self.rpn_ds_strides,
            ds_num_filters=self.rpn_ds_filters,
            us_layer_strides=self.rpn_us_strides,
            us_num_filters=self.rpn_us_filters,
            num_input_features=dense.shape[-1],
            dtype=self.backbone_dtype,
            name="RPN_0",
        )(dense, train)
        preds = MultiGroupHead(num_classes=tuple(self.num_classes), code_size=self.code_size)(neck)
        out = {
            "preds": preds,
            "embedding": neck.mean(axis=(1, 2)),  # [B, 512] selector embedding
        }
        if self.return_middle:
            out["middle"] = middle
            out["neck_feat"] = neck
        return out


@DETECTORS.register_module
class VoxelNet(FPNVoxelNet):
    """Alias without the middle-feature outputs (reference voxelnet.py:8)."""

    return_middle: bool = False
