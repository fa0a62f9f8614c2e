"""Host (numpy) voxelizer — test oracle + offline data prep.

Implements the same semantics as the reference's numba voxelizer
(det3d/ops/point_cloud/point_cloud_ops.py:213-299 via
det3d/core/input/voxel_generator.py:6): first-appearance voxel ordering,
max_voxels truncation, first-K points per voxel, (z,y,x) coordinates.

The production path is the on-device ``dal3d_tpu.ops.voxelize``; this host
version exists for tests and for non-jit tooling.
"""
from __future__ import annotations

import numpy as np


class VoxelGenerator:
    def __init__(self, voxel_size, point_cloud_range, max_num_points, max_voxels=20000):
        point_cloud_range = np.array(point_cloud_range, dtype=np.float32)
        voxel_size = np.array(voxel_size, dtype=np.float32)
        grid_size = (point_cloud_range[3:] - point_cloud_range[:3]) / voxel_size
        grid_size = np.round(grid_size).astype(np.int64)

        self._voxel_size = voxel_size
        self._point_cloud_range = point_cloud_range
        self._max_num_points = max_num_points
        self._max_voxels = max_voxels
        self._grid_size = grid_size

    @property
    def voxel_size(self):
        return self._voxel_size

    @property
    def max_num_points_per_voxel(self):
        return self._max_num_points

    @property
    def point_cloud_range(self):
        return self._point_cloud_range

    @property
    def grid_size(self):
        return self._grid_size

    def generate(self, points, max_voxels=None):
        return points_to_voxel(
            points,
            self._voxel_size,
            self._point_cloud_range,
            self._max_num_points,
            max_voxels or self._max_voxels,
        )


def points_to_voxel(points, voxel_size, point_cloud_range, max_points=35, max_voxels=20000):
    """points [P, F] -> (voxels [M, max_points, F], coords [M, 3] (z,y,x),
    num_points_per_voxel [M]) with M = number of kept voxels."""
    points = np.asarray(points)
    voxel_size = np.asarray(voxel_size, dtype=points.dtype)
    pc_range = np.asarray(point_cloud_range, dtype=points.dtype)
    grid_size = np.round((pc_range[3:] - pc_range[:3]) / voxel_size).astype(np.int64)
    nx, ny, nz = int(grid_size[0]), int(grid_size[1]), int(grid_size[2])

    c = np.floor((points[:, :3] - pc_range[:3]) / voxel_size).astype(np.int64)
    ok = np.all((c >= 0) & (c < grid_size), axis=1)
    idx = np.flatnonzero(ok)
    c = c[idx]
    lin = (c[:, 2] * ny + c[:, 1]) * nx + c[:, 0]

    # first-appearance unique ordering
    _, first_pos, inverse = np.unique(lin, return_index=True, return_inverse=True)
    order = np.argsort(np.argsort(first_pos))  # rank of each unique by first pos
    vox_of_point = order[inverse]
    n_unique = first_pos.shape[0]
    n_keep = min(n_unique, max_voxels)

    voxels = np.zeros((n_keep, max_points, points.shape[1]), dtype=points.dtype)
    coords = np.zeros((n_keep, 3), dtype=np.int32)
    num_points = np.zeros((n_keep,), dtype=np.int32)
    for j, (p, v) in enumerate(zip(idx, vox_of_point)):
        if v >= n_keep:
            continue
        n = num_points[v]
        if n == 0:
            coords[v] = (c[j, 2], c[j, 1], c[j, 0])
        if n < max_points:
            voxels[v, n] = points[p]
            num_points[v] = n + 1
    return voxels, coords, num_points
