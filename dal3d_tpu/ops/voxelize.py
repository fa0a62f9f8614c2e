"""Fixed-shape on-device voxelization.

TPU-native re-design of the reference's CPU/numba hard voxelizer
(det3d/ops/point_cloud/point_cloud_ops.py:213-299 `points_to_voxel_new`,
driven by det3d/core/input/voxel_generator.py:6). Exact semantics preserved:

- floor-quantize (xyz - range_min) / voxel_size, drop out-of-grid points,
- voxel output order = order of each voxel's first point arrival,
- truncate to ``max_voxels`` voxels (keeping the first-appearing ones),
- cap ``max_points`` per voxel keeping first arrivals,
- coordinates stored reversed as (z, y, x) (reverse_index=True).

But instead of a sequential hash loop it is a sort + segment pass with fully
static shapes: points arrive as a padded [P, F] array with a validity mask, and
everything runs under jit (sort -> run-length segments -> scatter), so the
whole voxelize->encode->backbone chain is one XLA program with no host sync.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class VoxelConfig:
    point_cloud_range: Tuple[float, ...]  # (x0, y0, z0, x1, y1, z1)
    voxel_size: Tuple[float, ...]  # (vx, vy, vz)
    max_points_in_voxel: int = 10
    max_voxel_num: int = 60000

    @property
    def grid_size(self) -> Tuple[int, int, int]:
        """(Nx, Ny, Nz) — reference rounds (range/voxel_size)."""
        r = np.asarray(self.point_cloud_range)
        vs = np.asarray(self.voxel_size)
        g = np.round((r[3:] - r[:3]) / vs).astype(np.int64)
        return int(g[0]), int(g[1]), int(g[2])

    @property
    def sparse_shape(self) -> Tuple[int, int, int]:
        """(D, H, W) backbone input shape = grid[::-1] + (1, 0, 0)
        (reference: det3d/models/backbones/scn.py:373-375)."""
        nx, ny, nz = self.grid_size
        return nz + 1, ny, nx


def _voxel_index(points: jnp.ndarray, valid: jnp.ndarray, cfg: VoxelConfig):
    """Shared indexing pass.

    Returns per-point (sorted by voxel, stable):
      new_id: final voxel index per sorted point (first-appearance order),
      slot: index of the point within its voxel (arrival order),
      order: permutation mapping sorted position -> original point index,
      and per-voxel: coords [M, 3] (z, y, x), num_points [M], voxel_valid [M].
    """
    P = points.shape[0]
    M = cfg.max_voxel_num
    nx, ny, nz = cfg.grid_size
    r0 = jnp.asarray(cfg.point_cloud_range[:3], points.dtype)
    vs = jnp.asarray(cfg.voxel_size, points.dtype)

    c = jnp.floor((points[:, :3] - r0) / vs).astype(jnp.int32)  # (ix, iy, iz)
    in_grid = jnp.all((c >= 0) & (c < jnp.asarray([nx, ny, nz])), axis=1)
    # NaN coords cast to 0 on TPU (implementation-defined) — guard explicitly
    finite = jnp.all(jnp.isfinite(points[:, :3]), axis=1)
    ok = valid & in_grid & finite

    # grid linear index fits int32 (largest grid here: 41*1024*1024 ≈ 4.4e7)
    lin = (c[:, 2] * ny + c[:, 1]) * nx + c[:, 0]
    sentinel = jnp.int32(nx * ny * nz + 1)
    lin = jnp.where(ok, lin, sentinel)

    order = jnp.argsort(lin, stable=True)  # invalid points go last
    lin_s = lin[order]
    ok_s = ok[order]

    pos = jnp.arange(P)
    start = jnp.concatenate([jnp.array([True]), lin_s[1:] != lin_s[:-1]])
    start = start & ok_s
    run_id = jnp.cumsum(start.astype(jnp.int32)) - 1  # [P] voxel rank in lin order
    run_id = jnp.where(ok_s, run_id, M + 1)  # park invalid
    seg_start_pos = jax.lax.cummax(jnp.where(start, pos, -1), axis=0)
    slot = pos - seg_start_pos  # arrival index within voxel

    # first-appearance order: first original point index per (lin-ordered) voxel
    # (stable sort keeps arrival order within each run)
    first_idx = jnp.full((P + 2,), P + 1, dtype=jnp.int32)
    first_idx = first_idx.at[jnp.where(ok_s, run_id, P + 1)].min(order.astype(jnp.int32))
    # rank runs by first appearance
    appear_order = jnp.argsort(first_idx[: P + 1], stable=True)  # run ids sorted by first idx
    new_of_run = jnp.zeros((P + 2,), jnp.int32).at[appear_order].set(jnp.arange(P + 1, dtype=jnp.int32))
    new_id = new_of_run[jnp.minimum(run_id, P + 1)]  # [P] final voxel id per sorted point
    new_id = jnp.where(ok_s & (new_id < M), new_id, M)  # truncate to max_voxels; park at M

    # per-voxel outputs
    c_s = c[order]
    zyx = jnp.stack([c_s[:, 2], c_s[:, 1], c_s[:, 0]], axis=1)
    coords = jnp.zeros((M + 1, 3), jnp.int32).at[new_id].max(zyx, mode="drop")
    counts = jnp.zeros((M + 1,), jnp.int32).at[new_id].add(1, mode="drop")
    voxel_valid = counts[:M] > 0
    num_points = jnp.minimum(counts[:M], cfg.max_points_in_voxel)
    return new_id, slot, order, coords[:M], num_points, voxel_valid


def voxelize(points: jnp.ndarray, valid: jnp.ndarray, cfg: VoxelConfig):
    """Full voxel tensors (for PillarFeatureNet-style encoders).

    points [P, F] padded, valid [P] -> dict with
      voxels [M, max_points, F], num_points [M], coordinates [M, 3] (z,y,x),
      voxel_valid [M], num_voxels scalar.
    """
    M, K = cfg.max_voxel_num, cfg.max_points_in_voxel
    new_id, slot, order, coords, num_points, voxel_valid = _voxel_index(points, valid, cfg)
    pts_s = points[order]
    keep = (slot < K) & (new_id < M)
    flat = jnp.where(keep, new_id * K + slot, M * K)
    voxels = (
        jnp.zeros((M * K + 1, points.shape[1]), points.dtype).at[flat].set(pts_s, mode="drop")
    )[: M * K].reshape(M, K, points.shape[1])
    return {
        "voxels": voxels,
        "num_points": num_points,
        "coordinates": coords,
        "voxel_valid": voxel_valid,
        "num_voxels": voxel_valid.sum(),
    }


def voxelize_mean(points: jnp.ndarray, valid: jnp.ndarray, cfg: VoxelConfig):
    """Fused voxelize + per-voxel mean (VoxelFeatureExtractorV3 path).

    Skips materializing the [M, max_points, F] tensor: the mean over each
    voxel's first ``max_points`` arrivals is a capped segment-sum. Returns
    dict with features [M, F], coordinates [M, 3], voxel_valid [M].
    """
    M, K = cfg.max_voxel_num, cfg.max_points_in_voxel
    new_id, slot, order, coords, num_points, voxel_valid = _voxel_index(points, valid, cfg)
    pts_s = points[order]
    keep = (slot < K) & (new_id < M)
    tgt = jnp.where(keep, new_id, M)
    feat_sum = jnp.zeros((M + 1, points.shape[1]), points.dtype).at[tgt].add(
        jnp.where(keep[:, None], pts_s, 0.0), mode="drop"
    )[:M]
    denom = jnp.maximum(num_points, 1).astype(points.dtype)
    features = feat_sum / denom[:, None]
    return {
        "features": features,
        "num_points": num_points,
        "coordinates": coords,
        "voxel_valid": voxel_valid,
        "num_voxels": voxel_valid.sum(),
    }


def voxelize_mean_grid(points: jnp.ndarray, valid: jnp.ndarray, cfg: VoxelConfig):
    """Sort-free voxelize + per-voxel mean via a dense cell grid.

    The sort-based path (:func:`voxelize_mean`) replicates reference ordering
    exactly but XLA sort is pathologically slow on some TPU runtimes; this
    variant uses scatter/nonzero only. Behavioral deviations (documented):
    voxel order is ascending cell index (not first-appearance) — affects only
    which voxels drop when exceeding ``max_voxel_num`` — and the mean runs
    over ALL points in a voxel rather than the first ``max_points_in_voxel``.
    """
    M = cfg.max_voxel_num
    nx, ny, nz = cfg.grid_size
    cells = nx * ny * nz
    r0 = jnp.asarray(cfg.point_cloud_range[:3], points.dtype)
    vs = jnp.asarray(cfg.voxel_size, points.dtype)

    c = jnp.floor((points[:, :3] - r0) / vs).astype(jnp.int32)
    in_grid = jnp.all((c >= 0) & (c < jnp.asarray([nx, ny, nz])), axis=1)
    finite = jnp.all(jnp.isfinite(points[:, :3]), axis=1)
    ok = valid & in_grid & finite
    lin = (c[:, 2] * ny + c[:, 1]) * nx + c[:, 0]
    lin = jnp.where(ok, lin, cells)

    occ = jnp.zeros((cells + 1,), bool).at[lin].set(True, mode="drop")
    cell_list = jnp.nonzero(occ[:cells], size=M, fill_value=cells)[0].astype(jnp.int32)
    vox_of_cell = jnp.full((cells + 1,), M, jnp.int32).at[cell_list].set(
        jnp.arange(M, dtype=jnp.int32), mode="drop"
    ).at[cells].set(M)
    vid = vox_of_cell[lin]  # [P], M for dropped/overflow points

    F = points.shape[1]
    feat_sum = jnp.zeros((M + 1, F), points.dtype).at[vid].add(
        jnp.where(ok[:, None], points, 0.0), mode="drop"
    )[:M]
    count = jnp.zeros((M + 1,), jnp.int32).at[vid].add(ok.astype(jnp.int32), mode="drop")[:M]
    features = feat_sum / jnp.maximum(count, 1)[:, None].astype(points.dtype)
    voxel_valid = (count > 0) & (cell_list < cells)
    z = cell_list // (nx * ny)
    rem = cell_list % (nx * ny)
    coords = jnp.stack([z, rem // nx, rem % nx], axis=1)
    return {
        "features": features,
        "num_points": count,
        "coordinates": coords,
        "voxel_valid": voxel_valid,
        "num_voxels": voxel_valid.sum(),
    }


def dynamic_scatter(points: jnp.ndarray, valid: jnp.ndarray, cfg: VoxelConfig,
                    reduce: str = "mean"):
    """DynamicScatter (reference bevfusion/mmdet3d/ops/voxel/scatter_points):
    per-voxel mean or max of point features, sort-free dense-grid path.
    Returns dict(features [M, F], coordinates [M, 3], voxel_valid [M])."""
    if reduce == "mean":
        return voxelize_mean_grid(points, valid, cfg)
    assert reduce == "max"
    M = cfg.max_voxel_num
    nx, ny, nz = cfg.grid_size
    cells = nx * ny * nz
    r0 = jnp.asarray(cfg.point_cloud_range[:3], points.dtype)
    vs = jnp.asarray(cfg.voxel_size, points.dtype)
    c = jnp.floor((points[:, :3] - r0) / vs).astype(jnp.int32)
    ok = (
        valid
        & jnp.all((c >= 0) & (c < jnp.asarray([nx, ny, nz])), axis=1)
        & jnp.all(jnp.isfinite(points[:, :3]), axis=1)
    )
    lin = jnp.where(ok, (c[:, 2] * ny + c[:, 1]) * nx + c[:, 0], cells)
    occ = jnp.zeros((cells + 1,), bool).at[lin].set(True, mode="drop")
    cell_list = jnp.nonzero(occ[:cells], size=M, fill_value=cells)[0].astype(jnp.int32)
    vox_of_cell = jnp.full((cells + 1,), M, jnp.int32).at[cell_list].set(
        jnp.arange(M, dtype=jnp.int32), mode="drop"
    ).at[cells].set(M)
    vid = jnp.where(ok, vox_of_cell[lin], M)
    F = points.shape[1]
    neg = jnp.full((M + 1, F), -jnp.inf, points.dtype)
    fmax = neg.at[vid].max(jnp.where(ok[:, None], points, -jnp.inf), mode="drop")[:M]
    voxel_valid = cell_list < cells
    fmax = jnp.where(jnp.isfinite(fmax), fmax, 0.0)
    z = cell_list // (nx * ny)
    rem = cell_list % (nx * ny)
    coords = jnp.stack([z, rem // nx, rem % nx], axis=1)
    return {"features": fmax, "coordinates": coords, "voxel_valid": voxel_valid,
            "num_voxels": voxel_valid.sum()}
