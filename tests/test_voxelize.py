"""Device voxelizer vs host oracle parity."""
import numpy as np
import jax.numpy as jnp

from dal3d_tpu.core.voxel_generator import points_to_voxel
from dal3d_tpu.ops.voxelize import VoxelConfig, voxelize, voxelize_mean

CFG = VoxelConfig(
    point_cloud_range=(-10.0, -10.0, -2.0, 10.0, 10.0, 2.0),
    voxel_size=(0.5, 0.5, 0.5),
    max_points_in_voxel=5,
    max_voxel_num=200,
)


def make_points(n=800, seed=0, frac_out=0.1):
    rng = np.random.RandomState(seed)
    pts = rng.uniform(-9.9, 9.9, (n, 5)).astype(np.float32)
    pts[:, 2] = rng.uniform(-1.9, 1.9, n)
    k = int(n * frac_out)
    pts[:k, 0] = 50.0  # out of range
    rng.shuffle(pts)
    return pts


def test_grid_and_sparse_shape():
    assert CFG.grid_size == (40, 40, 8)
    assert CFG.sparse_shape == (9, 40, 40)


def test_voxelize_matches_host():
    pts = make_points(600, seed=1)
    P = 1024
    padded = np.zeros((P, 5), np.float32)
    padded[: len(pts)] = pts
    valid = np.zeros(P, bool)
    valid[: len(pts)] = True

    out = voxelize(jnp.asarray(padded), jnp.asarray(valid), CFG)
    ref_voxels, ref_coords, ref_num = points_to_voxel(
        pts, CFG.voxel_size, CFG.point_cloud_range, CFG.max_points_in_voxel, CFG.max_voxel_num
    )
    n = ref_coords.shape[0]
    assert int(out["num_voxels"]) == n
    np.testing.assert_array_equal(np.asarray(out["coordinates"])[:n], ref_coords)
    np.testing.assert_array_equal(np.asarray(out["num_points"])[:n], ref_num)
    np.testing.assert_allclose(np.asarray(out["voxels"])[:n], ref_voxels, atol=1e-6)
    # padding region must be empty
    assert not np.asarray(out["voxel_valid"])[n:].any()


def test_voxelize_mean_matches_dense():
    pts = make_points(600, seed=2)
    P = 1024
    padded = np.zeros((P, 5), np.float32)
    padded[: len(pts)] = pts
    valid = np.zeros(P, bool)
    valid[: len(pts)] = True

    dense = voxelize(jnp.asarray(padded), jnp.asarray(valid), CFG)
    fused = voxelize_mean(jnp.asarray(padded), jnp.asarray(valid), CFG)
    n = int(dense["num_voxels"])
    v = np.asarray(dense["voxels"])[:n]
    npts = np.asarray(dense["num_points"])[:n]
    ref_mean = v.sum(1) / np.maximum(npts, 1)[:, None]
    np.testing.assert_allclose(np.asarray(fused["features"])[:n], ref_mean, rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(
        np.asarray(fused["coordinates"])[:n], np.asarray(dense["coordinates"])[:n]
    )


def test_voxelize_truncation():
    cfg = VoxelConfig(CFG.point_cloud_range, CFG.voxel_size, 5, max_voxel_num=16)
    pts = make_points(600, seed=3)
    P = 1024
    padded = np.zeros((P, 5), np.float32)
    padded[: len(pts)] = pts
    valid = np.zeros(P, bool)
    valid[: len(pts)] = True
    out = voxelize(jnp.asarray(padded), jnp.asarray(valid), cfg)
    ref_voxels, ref_coords, ref_num = points_to_voxel(
        pts, cfg.voxel_size, cfg.point_cloud_range, 5, 16
    )
    assert int(out["num_voxels"]) == 16
    np.testing.assert_array_equal(np.asarray(out["coordinates"]), ref_coords)
    np.testing.assert_allclose(np.asarray(out["voxels"]), ref_voxels, atol=1e-6)
