"""PointPillars pillar encoder + BEV scatter.

Re-design of det3d/models/readers/pillar_encoder.py:61-200 (PillarFeatureNet +
PointPillarsScatter). TPU-first restructuring: instead of materializing the
ragged [M, K, F] pillar tensor and max-pooling over K, the per-point pipeline
runs flat — decorate each point with cluster-mean and pillar-center offsets
(two scatter/gather passes), apply the PFN linear+BN+ReLU pointwise, then
scatter-max into pillar features. No sorts, no K dimension, permutation
invariant (identical math to the reference's masked max over pillar points
when no per-pillar point cap binds).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops.voxelize import VoxelConfig
from ..layers import MaskedBatchNorm
from ..registry import BACKBONES, READERS


@READERS.register_module
class PillarFeatureNet(nn.Module):
    num_input_features: int = 4
    num_filters: Sequence[int] = (64,)
    with_distance: bool = False
    voxel_size: Tuple[float, float] = (0.2, 0.2)
    pc_range: Tuple[float, float] = (0.0, -40.0)

    @nn.compact
    def __call__(
        self,
        points: jnp.ndarray,  # [B, P, F]
        point_ok: jnp.ndarray,  # [B, P] in-grid validity
        pillar_of_point: jnp.ndarray,  # [B, P] pillar id (M = overflow/park)
        pillar_coords: jnp.ndarray,  # [B, M, 3] (z=0, y, x)
        pillar_valid: jnp.ndarray,  # [B, M]
        train: bool = False,
    ) -> jnp.ndarray:
        """Returns pillar features [B, M, num_filters[-1]]."""
        B, P, F = points.shape
        M = pillar_coords.shape[1]
        okf = point_ok.astype(points.dtype)[..., None]

        def seg_mean(vals):  # [B, P, C] -> [B, M, C] masked mean per pillar
            def one(v, pid, ok):
                s = jnp.zeros((M + 1, v.shape[-1]), v.dtype).at[pid].add(
                    v * ok, mode="drop"
                )[:M]
                c = jnp.zeros((M + 1,), v.dtype).at[pid].add(ok[..., 0], mode="drop")[:M]
                return s / jnp.maximum(c, 1.0)[:, None]

            return jax.vmap(one)(vals, pillar_of_point, okf)

        mean_xyz = seg_mean(points[..., :3])  # [B, M, 3]
        f_cluster = points[..., :3] - jnp.take_along_axis(
            mean_xyz, jnp.minimum(pillar_of_point, M - 1)[..., None], axis=1
        )
        px = pillar_coords[..., 2].astype(points.dtype) * self.voxel_size[0] + (
            self.voxel_size[0] / 2 + self.pc_range[0]
        )
        py = pillar_coords[..., 1].astype(points.dtype) * self.voxel_size[1] + (
            self.voxel_size[1] / 2 + self.pc_range[1]
        )
        centers = jnp.stack([px, py], axis=-1)  # [B, M, 2]
        f_center = points[..., :2] - jnp.take_along_axis(
            centers, jnp.minimum(pillar_of_point, M - 1)[..., None], axis=1
        )
        feats = [points, f_cluster, f_center]
        if self.with_distance:
            feats.append(jnp.linalg.norm(points[..., :3], axis=-1, keepdims=True))
        x = jnp.concatenate(feats, axis=-1) * okf

        for i, out_f in enumerate(self.num_filters):
            x = nn.Dense(out_f, use_bias=False)(x)
            x = MaskedBatchNorm()(x, point_ok, train)
            x = nn.relu(x)
        # scatter-max into pillars
        def seg_max(v, pid, ok):
            neg = jnp.full((M + 1, v.shape[-1]), -1e9, v.dtype)
            out = neg.at[jnp.where(ok[..., 0] > 0, pid, M)].max(v, mode="drop")[:M]
            return jnp.where(out <= -1e9, 0.0, out)

        pooled = jax.vmap(seg_max)(x, pillar_of_point, okf)
        return jnp.where(pillar_valid[..., None], pooled, 0.0)


@BACKBONES.register_module
class PointPillarsScatter(nn.Module):
    """Pillar features -> dense BEV canvas [B, ny, nx, C]
    (reference pillar_encoder.py:159-200, NHWC)."""

    num_input_features: int = 64

    @nn.compact
    def __call__(self, pillar_feats, pillar_coords, pillar_valid, nx: int, ny: int):
        B, M, C = pillar_feats.shape
        lin = pillar_coords[..., 1] * nx + pillar_coords[..., 2]
        lin = jnp.where(pillar_valid, lin, nx * ny)

        def one(f, l):
            return jnp.zeros((nx * ny + 1, C), f.dtype).at[l].set(f, mode="drop")[:-1]

        canvas = jax.vmap(one)(pillar_feats, lin)
        return canvas.reshape(B, ny, nx, C)


def pillarize(points: jnp.ndarray, valid: jnp.ndarray, cfg: VoxelConfig):
    """Sort-free point->pillar assignment (z collapsed): returns
    (point_ok [P], pillar_of_point [P], pillar_coords [M,3], pillar_valid [M])."""
    M = cfg.max_voxel_num
    nx, ny, _ = cfg.grid_size
    cells = nx * ny
    r0 = jnp.asarray(cfg.point_cloud_range[:3], points.dtype)
    vs = jnp.asarray(cfg.voxel_size, points.dtype)
    cx = jnp.floor((points[:, 0] - r0[0]) / vs[0]).astype(jnp.int32)
    cy = jnp.floor((points[:, 1] - r0[1]) / vs[1]).astype(jnp.int32)
    zmin, zmax = cfg.point_cloud_range[2], cfg.point_cloud_range[5]
    ok = (
        valid
        & (cx >= 0) & (cx < nx) & (cy >= 0) & (cy < ny)
        & (points[:, 2] >= zmin) & (points[:, 2] < zmax)
        & jnp.all(jnp.isfinite(points[:, :3]), axis=1)
    )
    lin = jnp.where(ok, cy * nx + cx, cells)
    occ = jnp.zeros((cells + 1,), bool).at[lin].set(True, mode="drop")
    cell_list = jnp.nonzero(occ[:cells], size=M, fill_value=cells)[0].astype(jnp.int32)
    pillar_of_cell = jnp.full((cells + 1,), M, jnp.int32).at[cell_list].set(
        jnp.arange(M, dtype=jnp.int32), mode="drop"
    ).at[cells].set(M)
    pid = pillar_of_cell[lin]
    coords = jnp.stack(
        [jnp.zeros_like(cell_list), cell_list // nx, cell_list % nx], axis=1
    )
    pillar_valid = cell_list < cells
    return ok & (pid < M), pid, coords, pillar_valid
