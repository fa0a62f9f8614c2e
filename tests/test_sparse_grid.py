"""Grid (sort-free) sparse engine vs the searchsorted engine (oracle)."""
import numpy as np
import jax.numpy as jnp

from dal3d_tpu.ops import sparse as sps
from dal3d_tpu.ops import sparse_grid as spg
from dal3d_tpu.ops.voxelize import VoxelConfig, voxelize_mean, voxelize_mean_grid

D, H, W = 6, 10, 12
CIN, COUT = 4, 5


def make_sparse(batch=2, n_active=40, cap=64, seed=0):
    rng = np.random.RandomState(seed)
    feats = np.zeros((batch, cap, CIN), np.float32)
    coords = np.zeros((batch, cap, 3), np.int32)
    valid = np.zeros((batch, cap), bool)
    for b in range(batch):
        lin = rng.choice(D * H * W, size=n_active, replace=False)
        coords[b, :n_active] = np.stack([lin // (H * W), (lin // W) % H, lin % W], axis=1)
        feats[b, :n_active] = rng.randn(n_active, CIN)
        valid[b, :n_active] = True
    a = sps.from_voxels(jnp.asarray(feats), jnp.asarray(coords), jnp.asarray(valid), (D, H, W))
    g = spg.from_voxels(jnp.asarray(feats), jnp.asarray(coords), jnp.asarray(valid), (D, H, W))
    return a, g


def to_dense_map(sb):
    """Canonical dense map for order-independent comparison."""
    return np.asarray(sps.to_dense(sb))


def test_subm_conv_engines_agree():
    a, g = make_sparse()
    rng = np.random.RandomState(1)
    w = jnp.asarray(rng.randn(27, CIN, COUT).astype(np.float32) * 0.1)
    out_a = sps.subm_conv(a, w)
    out_g = spg.subm_conv(g, w)
    np.testing.assert_allclose(to_dense_map(out_g), to_dense_map(out_a), rtol=1e-4, atol=1e-5)


def test_downsample_engines_agree():
    a, g = make_sparse(seed=3)
    rng = np.random.RandomState(2)
    w = jnp.asarray(rng.randn(27, CIN, COUT).astype(np.float32) * 0.1)
    out_a = sps.sparse_conv_downsample(a, w, 3, 2, 1, out_cap=64)
    out_g = spg.sparse_conv_downsample(g, w, 3, 2, 1, out_cap=64)
    assert out_a.shape == out_g.shape
    np.testing.assert_allclose(to_dense_map(out_g), to_dense_map(out_a), rtol=1e-4, atol=1e-5)
    # active sets identical (both engines emit ascending cell order)
    la, lg = np.asarray(out_a.lin), np.asarray(out_g.lin)
    va, vg = np.asarray(out_a.valid), np.asarray(out_g.valid)
    for b in range(2):
        assert set(la[b][va[b]].tolist()) == set(lg[b][vg[b]].tolist())


def test_asymmetric_downsample_engines_agree():
    a, g = make_sparse(seed=4)
    rng = np.random.RandomState(5)
    w = jnp.asarray(rng.randn(3, CIN, COUT).astype(np.float32) * 0.1)
    out_a = sps.sparse_conv_downsample(a, w, (3, 1, 1), (2, 1, 1), (0, 0, 0), out_cap=64)
    out_g = spg.sparse_conv_downsample(g, w, (3, 1, 1), (2, 1, 1), (0, 0, 0), out_cap=64)
    np.testing.assert_allclose(to_dense_map(out_g), to_dense_map(out_a), rtol=1e-4, atol=1e-5)


def test_grid_reuse_across_subm_convs():
    a, g = make_sparse(seed=6)
    grid = spg.build_index_grid(g)
    rb = spg.subm_rulebook(g, 3, grid=grid)
    rb2 = spg.subm_rulebook(g, 3)
    np.testing.assert_array_equal(np.asarray(rb[1]), np.asarray(rb2[1]))


def test_voxelize_mean_grid_matches_sorted_when_uncapped():
    cfg = VoxelConfig((-10.0, -10.0, -2.0, 10.0, 10.0, 2.0), (0.5, 0.5, 0.5),
                      max_points_in_voxel=64, max_voxel_num=600)
    rng = np.random.RandomState(0)
    pts = rng.uniform(-9.9, 9.9, (500, 5)).astype(np.float32)
    pts[:, 2] = rng.uniform(-1.9, 1.9, 500)
    P = 512
    padded = np.zeros((P, 5), np.float32)
    padded[:500] = pts
    valid = np.zeros(P, bool)
    valid[:500] = True
    a = voxelize_mean(jnp.asarray(padded), jnp.asarray(valid), cfg)
    b = voxelize_mean_grid(jnp.asarray(padded), jnp.asarray(valid), cfg)
    assert int(a["num_voxels"]) == int(b["num_voxels"])
    # compare as {coord: feature} maps (orders differ by design)
    fa = {tuple(c): f for c, f, v in zip(np.asarray(a["coordinates"]), np.asarray(a["features"]), np.asarray(a["voxel_valid"])) if v}
    fb = {tuple(c): f for c, f, v in zip(np.asarray(b["coordinates"]), np.asarray(b["features"]), np.asarray(b["voxel_valid"])) if v}
    assert fa.keys() == fb.keys()
    for k in fa:
        np.testing.assert_allclose(fb[k], fa[k], rtol=1e-5, atol=1e-5)
