"""Brick-packed sparse conv engine vs the searchsorted oracle engine.

Both engines implement exact spconv active-set semantics; on scenes where no
capacity truncates, their dense outputs must match bit-for-bit (same
[K, Cin, Cout] weights)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dal3d_tpu.ops import sparse as sps
from dal3d_tpu.ops import sparse_brick as spb


def _random_scene(rng, B=2, N=150, shape=(6, 16, 32), C=4, cluster=True):
    D, H, W = shape
    feats = np.zeros((B, N, C), np.float32)
    coords = np.zeros((B, N, 3), np.int64)
    valid = np.zeros((B, N), bool)
    for b in range(B):
        n = rng.randint(N // 2, N)
        if cluster:
            # runs along W (lidar-like) + scatter
            pts = []
            while len(pts) < n:
                z, y, x0 = rng.randint(D), rng.randint(H), rng.randint(W)
                run = rng.randint(1, 6)
                for dx in range(run):
                    if x0 + dx < W:
                        pts.append((z, y, x0 + dx))
            pts = list(dict.fromkeys(pts))[:n]
        else:
            pts = {(rng.randint(D), rng.randint(H), rng.randint(W)) for _ in range(n)}
            pts = list(pts)
        n = len(pts)
        coords[b, :n] = np.array(pts)
        feats[b, :n] = rng.randn(n, C)
        valid[b, :n] = True
    return jnp.asarray(feats), jnp.asarray(coords), jnp.asarray(valid)


def _dense_from_sparse(sb):
    return np.asarray(sps.to_dense(sb))


def _dense_from_brick(bb):
    return np.asarray(spb.to_dense(bb))


@pytest.mark.parametrize("bw", [4, 8])
def test_subm_conv_matches_oracle(bw):
    rng = np.random.RandomState(0)
    shape = (6, 16, 32)
    C, Cout = 4, 6
    feats, coords, valid = _random_scene(rng, shape=shape, C=C)
    w = jnp.asarray(rng.randn(27, C, Cout).astype(np.float32)) * 0.2

    sb = sps.from_voxels(feats, coords, valid, shape)
    ref = _dense_from_sparse(sps.subm_conv(sb, w, kernel_size=3))

    bb = spb.from_voxels(feats, coords, valid, shape, bw=bw, mb_cap=400)
    got = _dense_from_brick(spb.subm_conv(bb, w, kernel_size=3))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_subm_rulebook_reuse_two_convs():
    rng = np.random.RandomState(1)
    shape = (4, 8, 16)
    feats, coords, valid = _random_scene(rng, B=1, N=60, shape=shape, C=3)
    w1 = jnp.asarray(rng.randn(27, 3, 5).astype(np.float32)) * 0.3
    w2 = jnp.asarray(rng.randn(27, 5, 4).astype(np.float32)) * 0.3

    sb = sps.from_voxels(feats, coords, valid, shape)
    ref = _dense_from_sparse(sps.subm_conv(sps.subm_conv(sb, w1), w2))

    bb = spb.from_voxels(feats, coords, valid, shape, bw=4, mb_cap=200)
    rb = spb.subm_rulebook(bb, 3)
    got = _dense_from_brick(spb.subm_conv(spb.subm_conv(bb, w1, rb), w2, rb))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize(
    "kernel,stride,padding,out_bw",
    [
        ((3, 3, 3), (2, 2, 2), (1, 1, 1), 4),
        ((3, 3, 3), (2, 2, 2), (0, 1, 1), 4),
        ((3, 1, 1), (2, 1, 1), (0, 0, 0), 8),
    ],
)
def test_downsample_matches_oracle(kernel, stride, padding, out_bw):
    rng = np.random.RandomState(2)
    shape = (7, 16, 32)
    C, Cout = 4, 5
    feats, coords, valid = _random_scene(rng, shape=shape, C=C)
    K = int(np.prod(kernel))
    w = jnp.asarray(rng.randn(K, C, Cout).astype(np.float32)) * 0.2

    sb = sps.from_voxels(feats, coords, valid, shape)
    ref_sb = sps.sparse_conv_downsample(sb, w, kernel, stride, padding, out_cap=2000)
    ref = _dense_from_sparse(ref_sb)

    bb = spb.from_voxels(feats, coords, valid, shape, bw=8, mb_cap=400)
    out = spb.downsample_conv(bb, w, kernel, stride, padding, out_bw=out_bw, out_cap=600)
    got = _dense_from_brick(out)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)

    # active sets agree at voxel level (brick plan is a superset at brick
    # granularity; vmask must reproduce the exact spconv output set)
    ref_active = np.zeros(ref.shape[:3], bool).reshape(-1)
    D, H, W = ref_sb.shape
    lin = np.asarray(ref_sb.lin)
    got_sp = spb.to_sparse(out, n_cap=2000)
    for b in range(lin.shape[0]):
        ref_set = set(lin[b][lin[b] < D * H * W].tolist())
        got_set = set(
            np.asarray(got_sp.lin[b])[np.asarray(got_sp.valid[b])].tolist()
        )
        assert got_set == ref_set


def test_uniform_scatter_scene():
    """Non-clustered voxels (worst case for bricks) still match."""
    rng = np.random.RandomState(3)
    shape = (5, 8, 24)
    feats, coords, valid = _random_scene(rng, B=1, N=80, shape=shape, C=3, cluster=False)
    w = jnp.asarray(rng.randn(27, 3, 3).astype(np.float32)) * 0.2
    sb = sps.from_voxels(feats, coords, valid, shape)
    ref = _dense_from_sparse(sps.subm_conv(sb, w))
    bb = spb.from_voxels(feats, coords, valid, shape, bw=8, mb_cap=200)
    got = _dense_from_brick(spb.subm_conv(bb, w))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_gradients_flow():
    rng = np.random.RandomState(4)
    shape = (4, 8, 16)
    feats, coords, valid = _random_scene(rng, B=1, N=50, shape=shape, C=3)
    w = jnp.asarray(rng.randn(27, 3, 4).astype(np.float32)) * 0.3
    bb = spb.from_voxels(feats, coords, valid, shape, bw=4, mb_cap=150)

    w_down = jnp.asarray(rng.randn(27, 4, 4).astype(np.float32)) * 0.2

    def loss(w):
        out = spb.subm_conv(bb, w)
        down = spb.downsample_conv(
            out, w_down, (3, 3, 3), (2, 2, 2), (1, 1, 1), out_bw=4, out_cap=100
        )
        return jnp.sum(down.features ** 2)

    g = jax.grad(loss)(w)
    assert np.isfinite(np.asarray(g)).all() and float(jnp.abs(g).sum()) > 0


def test_window_rulebook_matches_scalar():
    """The one-gather-per-row window rulebook (DAL3D_RB_WINDOW=1) produces
    bit-identical idx/hit to the per-tap scalar lookup, for the full 3x3
    stencil and the asymmetric stage-3 (3,1,1) kernel."""
    import os

    rng = np.random.RandomState(7)
    f, c, v = _random_scene(rng, B=2, N=200, shape=(6, 16, 32))
    bb = spb.from_voxels(f, c, v, (6, 16, 32), bw=8, mb_cap=256, spatial=True)
    grid = spb.build_brick_grid(bb)
    prev = os.environ.get("DAL3D_RB_WINDOW")
    try:
        for k in (3, (3, 1, 1)):
            os.environ["DAL3D_RB_WINDOW"] = "0"
            i0, h0, _, _ = spb.subm_rulebook(bb, k, grid)
            os.environ["DAL3D_RB_WINDOW"] = "1"
            i1, h1, _, _ = spb.subm_rulebook(bb, k, grid)
            np.testing.assert_array_equal(np.asarray(h0), np.asarray(h1))
            np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    finally:
        if prev is None:
            os.environ.pop("DAL3D_RB_WINDOW", None)
        else:
            os.environ["DAL3D_RB_WINDOW"] = prev
