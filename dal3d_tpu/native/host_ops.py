"""ctypes bindings for the native host ops, with numpy fallbacks.

Replaces the reference's pybind11/torch-extension host kernels
(det3d/ops/point_cloud/point_cloud_ops.cc, det3d/ops/nms/nms.cc, numba
box_collision_test). Auto-builds on first use when a toolchain is present.
"""
from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "libdal3d_host.so")
    if not os.path.exists(path):
        try:
            from .build import build

            build(verbose=False)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None
    i64, i32, f32p, i32p, u8p = (
        ctypes.c_int64, ctypes.c_int32,
        np.ctypeslib.ndpointer(np.float32, flags="C"),
        np.ctypeslib.ndpointer(np.int32, flags="C"),
        np.ctypeslib.ndpointer(np.uint8, flags="C"),
    )
    lib.points_to_voxel.restype = ctypes.c_int
    lib.points_to_voxel.argtypes = [f32p, i64, i32, f32p, f32p, i32p, i32, i32, f32p, i32p, i32p]
    if hasattr(lib, "points_to_voxel_mean_mt"):  # stale pre-r3 build lacks it
        lib.points_to_voxel_mean_mt.restype = ctypes.c_int
        lib.points_to_voxel_mean_mt.argtypes = [
            f32p, i64, i32, f32p, f32p, i32p, i32, i32, i32, i32,
            ctypes.c_void_p, i32p, i32p,
        ]
    if hasattr(lib, "brick_pack_plan"):  # stale pre-r3.2 build lacks it
        lib.brick_pack_plan.restype = ctypes.c_int
        lib.brick_pack_plan.argtypes = [
            i32p, i64, ctypes.c_void_p, i32, i32, i32, i32, i32, i32, i32p, i32p,
        ]
    lib.box_collision_test.restype = None
    lib.box_collision_test.argtypes = [f32p, i64, f32p, i64, u8p]
    lib.rotate_nms_cpu.restype = None
    lib.rotate_nms_cpu.argtypes = [f32p, i64, ctypes.c_float, u8p]
    lib.kcenter_greedy.restype = ctypes.c_int
    lib.kcenter_greedy.argtypes = [f32p, i64, f32p, ctypes.c_float, f32p, i32, u8p, i32p, i32]
    _LIB = lib
    return _LIB


def available() -> bool:
    return _load() is not None


def points_to_voxel(points, voxel_size, point_cloud_range, max_points, max_voxels):
    """Native hard voxelizer; same contract as core.voxel_generator.points_to_voxel."""
    lib = _load()
    if lib is None:
        from ..core.voxel_generator import points_to_voxel as np_impl

        return np_impl(points, voxel_size, point_cloud_range, max_points, max_voxels)
    points = np.ascontiguousarray(points, np.float32)
    vs = np.ascontiguousarray(voxel_size, np.float32)
    pcr = np.asarray(point_cloud_range, np.float32)
    grid = np.round((pcr[3:] - pcr[:3]) / vs).astype(np.int32)
    voxels = np.zeros((max_voxels, max_points, points.shape[1]), np.float32)
    coords = np.zeros((max_voxels, 3), np.int32)
    npv = np.zeros((max_voxels,), np.int32)
    n = lib.points_to_voxel(
        points, points.shape[0], points.shape[1], vs,
        np.ascontiguousarray(pcr[:3]), np.ascontiguousarray(grid),
        max_points, max_voxels, voxels, coords, npv,
    )
    return voxels[:n], coords[:n], npv[:n]


def points_to_voxel_mean(points, voxel_size, point_cloud_range, max_points,
                         max_voxels, n_threads: int = 0, bf16: bool = False):
    """Parallel mean voxelizer: (mean_features [n, F], coords zyx [n, 3],
    num_points [n]) with EXACT sequential semantics (first-appearance voxel
    order + truncation, mean over each voxel's first max_points points).

    bf16=True returns mean features as ml_dtypes.bfloat16 (half H2D payload).
    n_threads 0 = the process's usable core count (sched_getaffinity — C++
    hardware_concurrency overreports under cgroup CPU limits and would pick
    the 3-phase merge path on a 1-core box where the single-pass path is
    2x faster). Falls back to the sequential path + host mean when the
    native lib is unavailable."""
    lib = _load()
    if n_threads <= 0:
        try:
            n_threads = len(os.sched_getaffinity(0))
        except AttributeError:  # non-linux
            n_threads = os.cpu_count() or 1
    points = np.ascontiguousarray(points, np.float32)
    if lib is None or not hasattr(lib, "points_to_voxel_mean_mt"):
        voxels, coords, npv = points_to_voxel(
            points, voxel_size, point_cloud_range, max_points, max_voxels)
        mean = voxels.sum(1) / np.maximum(npv, 1)[:, None]
        if bf16:
            import ml_dtypes

            mean = mean.astype(ml_dtypes.bfloat16)
        return mean, coords, npv
    vs = np.ascontiguousarray(voxel_size, np.float32)
    pcr = np.asarray(point_cloud_range, np.float32)
    grid = np.round((pcr[3:] - pcr[:3]) / vs).astype(np.int32)
    F = points.shape[1]
    if bf16:
        mean = np.zeros((max_voxels, F), np.uint16)
    else:
        mean = np.zeros((max_voxels, F), np.float32)
    coords = np.zeros((max_voxels, 3), np.int32)
    npv = np.zeros((max_voxels,), np.int32)
    n = lib.points_to_voxel_mean_mt(
        points, points.shape[0], F, vs, np.ascontiguousarray(pcr[:3]),
        np.ascontiguousarray(grid), max_points, max_voxels,
        int(n_threads), 1 if bf16 else 0,
        mean.ctypes.data_as(ctypes.c_void_p), coords, npv,
    )
    if bf16:
        import ml_dtypes

        mean = mean.view(ml_dtypes.bfloat16)
    return mean[:n], coords[:n], npv[:n]


def _brick_pack_plan_np(coords, valid, D, H, W, bw, mb_cap, spatial):
    """Numpy fallback mirroring the C++ (and the device _compact_cells*)."""
    Wb = W // bw
    nbc = D * H * Wb
    z, y, x = coords[:, 0].astype(np.int64), coords[:, 1], coords[:, 2]
    cell = (z * H + y) * Wb + x // bw
    cell = np.where(valid, cell, -1)
    cand = [cell[valid]]
    wpos, xb = x % bw, x // bw
    if bw >= 2:
        left = valid & (wpos == 0) & (xb > 0)
        right = valid & (wpos == bw - 1) & (xb < Wb - 1)
        dil = np.where(left, cell - 1, np.where(right, cell + 1, -1))
        cand.append(dil[dil >= 0])
    else:
        cand.append((cell - 1)[valid & (xb > 0)])
        cand.append((cell + 1)[valid & (xb < Wb - 1)])
    cand = np.concatenate(cand)
    # device _compact_cells compacts in LAST-appearance order (last-writer-
    # wins representative scatter); unique over the reversed list gives it
    uniq, ridx = np.unique(cand[::-1], return_index=True)
    if spatial:
        ykey = ((uniq % (H * Wb)) // Wb * Wb + uniq % Wb) * D + uniq // (H * Wb)
        order = np.argsort(ykey, kind="stable")
    else:
        last = len(cand) - 1 - ridx
        order = np.argsort(last, kind="stable")
    uniq = uniq[order]
    true_count = len(uniq)
    kept = uniq[:mb_cap]
    brick_lin = np.full((mb_cap,), nbc, np.int32)
    brick_lin[: len(kept)] = kept
    rank = {int(c): r for r, c in enumerate(kept)}
    row = np.array([rank.get(int(c), -1) if c >= 0 else -1 for c in cell], np.int32)
    return brick_lin, row, true_count


def brick_pack_plan(coords, shape, bw: int, mb_cap: int, spatial: bool,
                    valid=None):
    """Plan the L0 brick pack on host (ops/sparse_brick.from_voxels_planned).

    coords [n, 3] int32 zyx; shape (D, H, W). Returns (brick_lin [mb_cap]
    int32, row [n] int32 with -1 = dropped, true_brick_count). true count >
    mb_cap means the capacity truncated (count_active_bricks contract)."""
    coords = np.ascontiguousarray(coords, np.int32)
    n = coords.shape[0]
    D, H, W = (int(s) for s in shape)
    lib = _load()
    if lib is None or not hasattr(lib, "brick_pack_plan"):
        v = np.ones((n,), bool) if valid is None else np.asarray(valid, bool)
        return _brick_pack_plan_np(coords, v, D, H, W, bw, mb_cap, spatial)
    vptr = None
    if valid is not None:
        vbuf = np.ascontiguousarray(np.asarray(valid), np.uint8)
        vptr = vbuf.ctypes.data_as(ctypes.c_void_p)
    brick_lin = np.zeros((mb_cap,), np.int32)
    row = np.zeros((n,), np.int32)
    count = lib.brick_pack_plan(
        coords, n, vptr, D, H, W, int(bw), int(mb_cap), 1 if spatial else 0,
        brick_lin, row,
    )
    return brick_lin, row, int(count)


def box_collision_test(corners_a, corners_b):
    lib = _load()
    if lib is None:
        from ..data.sampler import box_collision_test as np_impl

        return np_impl(corners_a, corners_b)
    a = np.ascontiguousarray(corners_a, np.float32)
    b = np.ascontiguousarray(corners_b, np.float32)
    out = np.zeros((a.shape[0] * b.shape[0],), np.uint8)
    lib.box_collision_test(a, a.shape[0], b, b.shape[0], out)
    return out.reshape(a.shape[0], b.shape[0]).astype(bool)


def rotate_nms_cpu(corners_sorted, iou_threshold: float):
    """corners [n,4,2] in descending-score order -> keep bool [n]."""
    lib = _load()
    c = np.ascontiguousarray(corners_sorted, np.float32)
    n = c.shape[0]
    if lib is None:
        raise RuntimeError("native lib unavailable; use ops.nms.rotate_nms on device")
    keep = np.zeros((n,), np.uint8)
    lib.rotate_nms_cpu(c, n, float(iou_threshold), keep)
    return keep.astype(bool)


def kcenter_greedy(dist, frame_costs, budget, init_fps, first_idx, already, max_select):
    lib = _load()
    if lib is None:
        from ..ops.kcenter import kcenter_numpy

        sel, cost = kcenter_numpy(dist, frame_costs, budget, init_fps, first_idx, already)
        return sel
    d = np.ascontiguousarray(dist, np.float32)
    sel = np.zeros((max_select,), np.int32)
    n = lib.kcenter_greedy(
        d, d.shape[0], np.ascontiguousarray(frame_costs, np.float32), float(budget),
        np.ascontiguousarray(init_fps, np.float32), int(first_idx),
        np.ascontiguousarray(already, np.uint8).astype(np.uint8), sel, int(max_select),
    )
    return sel[:n].tolist()
