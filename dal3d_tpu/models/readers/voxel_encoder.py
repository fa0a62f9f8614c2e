"""Voxel feature readers.

- VoxelFeatureExtractorV3 (reference det3d/models/readers/voxel_encoder.py:
  198-210): per-voxel masked mean of raw point features. In this framework the
  mean is fused directly into the voxelizer (ops.voxelize.voxelize_mean), so
  the reader is an identity on the fused path; the standalone module exists
  for the [M, K, F] voxels-tensor path (and for VFE/pillar variants).
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from ..registry import READERS


@READERS.register_module
class VoxelFeatureExtractorV3(nn.Module):
    num_input_features: int = 5

    @nn.compact
    def __call__(self, voxels: jnp.ndarray, num_points: jnp.ndarray) -> jnp.ndarray:
        """voxels [..., K, F], num_points [...] -> [..., F] masked mean."""
        K = voxels.shape[-2]
        mask = jnp.arange(K)[None, :] < num_points.reshape(-1, 1)
        mask = mask.reshape(*num_points.shape, K, 1)
        s = (voxels * mask).sum(axis=-2)
        return s / jnp.maximum(num_points, 1)[..., None].astype(voxels.dtype)
