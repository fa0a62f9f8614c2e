"""Sparse conv engine vs dense XLA conv oracle."""
import numpy as np
import jax
import jax.numpy as jnp

from dal3d_tpu.ops import sparse as sp

D, H, W = 6, 10, 12
CIN, COUT = 4, 5


def make_sparse(batch=2, n_active=40, cap=64, seed=0):
    rng = np.random.RandomState(seed)
    feats = np.zeros((batch, cap, CIN), np.float32)
    coords = np.zeros((batch, cap, 3), np.int32)
    valid = np.zeros((batch, cap), bool)
    for b in range(batch):
        lin = rng.choice(D * H * W, size=n_active, replace=False)
        c = np.stack([lin // (H * W), (lin // W) % H, lin % W], axis=1)
        coords[b, :n_active] = c
        feats[b, :n_active] = rng.randn(n_active, CIN)
        valid[b, :n_active] = True
    sb = sp.from_voxels(jnp.asarray(feats), jnp.asarray(coords), jnp.asarray(valid), (D, H, W))
    return sb, feats, coords, valid


def dense_from_sparse(feats, coords, valid):
    B = feats.shape[0]
    dense = np.zeros((B, D, H, W, CIN), np.float32)
    for b in range(B):
        for i in np.flatnonzero(valid[b]):
            z, y, x = coords[b, i]
            dense[b, z, y, x] = feats[b, i]
    return dense


def dense_conv(dense, w_kkkio, stride, padding):
    return np.asarray(
        jax.lax.conv_general_dilated(
            jnp.asarray(dense),
            jnp.asarray(w_kkkio),
            window_strides=stride,
            padding=[(p, p) for p in padding],
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )
    )


def test_subm_conv_matches_dense_at_active_sites():
    sb, feats, coords, valid = make_sparse()
    rng = np.random.RandomState(1)
    w = rng.randn(3, 3, 3, CIN, COUT).astype(np.float32) * 0.1
    out = sp.subm_conv(sb, jnp.asarray(w.reshape(27, CIN, COUT)))
    ref = dense_conv(dense_from_sparse(feats, coords, valid), w, (1, 1, 1), (1, 1, 1))
    out_np = np.asarray(out.features)
    lin = np.asarray(out.lin)
    vmask = np.asarray(out.valid)
    for b in range(2):
        for i in np.flatnonzero(vmask[b]):
            z, y, x = lin[b, i] // (H * W), (lin[b, i] // W) % H, lin[b, i] % W
            np.testing.assert_allclose(out_np[b, i], ref[b, z, y, x], rtol=1e-4, atol=1e-4)


def test_subm_conv_1x1():
    sb, feats, coords, valid = make_sparse(seed=3)
    rng = np.random.RandomState(2)
    w = rng.randn(1, CIN, COUT).astype(np.float32)
    out = sp.subm_conv(sb, jnp.asarray(w), kernel_size=1)
    ref = np.asarray(sb.features) @ w[0]
    np.testing.assert_allclose(np.asarray(out.features), ref * np.asarray(sb.valid)[..., None], rtol=1e-4, atol=1e-5)


def test_downsample_active_set_and_values():
    sb, feats, coords, valid = make_sparse(seed=4)
    rng = np.random.RandomState(5)
    w = rng.randn(3, 3, 3, CIN, COUT).astype(np.float32) * 0.1
    out = sp.sparse_conv_downsample(
        sb, jnp.asarray(w.reshape(27, CIN, COUT)), 3, 2, 1, out_cap=64
    )
    Do, Ho, Wo = out.shape
    assert (Do, Ho, Wo) == ((D + 2 - 3) // 2 + 1, (H + 2 - 3) // 2 + 1, (W + 2 - 3) // 2 + 1)
    ref = dense_conv(dense_from_sparse(feats, coords, valid), w, (2, 2, 2), (1, 1, 1))

    # reference active set: any active input within the receptive field
    dense_occ = dense_from_sparse(np.ones_like(feats), coords, valid).max(-1)
    occ_ref = dense_conv(dense_occ[..., None], np.ones((3, 3, 3, 1, 1), np.float32), (2, 2, 2), (1, 1, 1))[..., 0] > 0

    lin = np.asarray(out.lin)
    vmask = np.asarray(out.valid)
    out_np = np.asarray(out.features)
    for b in range(2):
        active = set()
        for i in np.flatnonzero(vmask[b]):
            l = lin[b, i]
            z, y, x = l // (Ho * Wo), (l // Wo) % Ho, l % Wo
            active.add((z, y, x))
            np.testing.assert_allclose(out_np[b, i], ref[b, z, y, x], rtol=1e-4, atol=1e-4)
        expected = {tuple(c) for c in np.argwhere(occ_ref[b])}
        assert active == expected


def test_downsample_asymmetric_kernel():
    """The backbone's last layer: kernel (3,1,1), stride (2,1,1), pad 0."""
    sb, feats, coords, valid = make_sparse(seed=6)
    rng = np.random.RandomState(7)
    w = rng.randn(3, 1, 1, CIN, COUT).astype(np.float32) * 0.1
    out = sp.sparse_conv_downsample(
        sb, jnp.asarray(w.reshape(3, CIN, COUT)), (3, 1, 1), (2, 1, 1), (0, 0, 0), out_cap=64
    )
    ref = dense_conv(dense_from_sparse(feats, coords, valid), w, (2, 1, 1), (0, 0, 0))
    lin = np.asarray(out.lin)
    Do, Ho, Wo = out.shape
    assert (Do, Ho, Wo) == ((D - 3) // 2 + 1, H, W)
    for b in range(2):
        for i in np.flatnonzero(np.asarray(out.valid)[b]):
            l = lin[b, i]
            z, y, x = l // (Ho * Wo), (l // Wo) % Ho, l % Wo
            np.testing.assert_allclose(np.asarray(out.features)[b, i], ref[b, z, y, x], rtol=1e-4, atol=1e-4)


def test_to_dense_roundtrip():
    sb, feats, coords, valid = make_sparse(seed=8)
    dense = np.asarray(sp.to_dense(sb))
    assert dense.shape == (2, H, W, CIN * D)
    ref = dense_from_sparse(feats, coords, valid)  # [B,D,H,W,C]
    # channel layout: c*D + d
    ref_hwcd = ref.transpose(0, 2, 3, 4, 1).reshape(2, H, W, CIN * D)
    np.testing.assert_allclose(dense, ref_hwcd, atol=1e-6)


def test_rulebook_reuse_and_grad():
    sb, *_ = make_sparse(seed=9)
    rb = sp.subm_rulebook(sb, 3)
    rng = np.random.RandomState(10)
    w1 = jnp.asarray(rng.randn(27, CIN, CIN).astype(np.float32) * 0.1)

    def loss(w):
        out = sp.subm_conv(sb, w, rulebook=rb)
        out2 = sp.subm_conv(out, w, rulebook=rb)  # indice_key reuse
        return (out2.features ** 2).sum()

    g = jax.grad(loss)(w1)
    assert np.isfinite(np.asarray(g)).all() and np.abs(np.asarray(g)).sum() > 0
