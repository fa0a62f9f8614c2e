"""Banded MXU gather engine (ops.banded + sparse_brick banded paths).

On CPU the banded ops dispatch to the XLA reference path; the Pallas kernel
itself is exercised in interpret mode. Numerics contract: the banded engine
must match the plain brick engine (which matches the searchsorted oracle,
test_sparse_brick) wherever capacities don't truncate."""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dal3d_tpu.ops import banded as bd
from dal3d_tpu.ops import sparse as sps
from dal3d_tpu.ops import sparse_brick as spb

from test_sparse_brick import _random_scene


def _mk_rulebook(rng, B, Q, M, Mb, spread, miss_p=0.3):
    m = np.arange(M)
    center = (m * Mb) // M
    idx = np.clip(center[None, :] + rng.randint(-spread, spread + 1, (Q, M)), 0, Mb - 1)
    idx = np.tile(idx[None], (B, 1, 1))
    hit = rng.rand(B, Q, M) >= miss_p
    return jnp.asarray(idx.astype(np.int32)), jnp.asarray(hit)


def _ref(table, idx, hit, wband):
    t, w = np.asarray(table, np.float32), np.asarray(wband, np.float32)
    i, h = np.asarray(idx), np.asarray(hit)
    B, Mb, R = t.shape
    Q, M = i.shape[1], i.shape[2]
    out = np.zeros((B, M, w.shape[-1]), np.float32)
    for b in range(B):
        for q in range(Q):
            rows = np.where(h[b, q][:, None], t[b][i[b, q]], 0.0)
            out[b] += rows @ w[q]
    return out


def test_band_plan_fallback_exact():
    """Kernel (xla path) + fallback == full gather even with a too-small band."""
    rng = np.random.RandomState(0)
    B, Q, M, Mb, R, Rout = 2, 5, 384, 384, 128, 128
    idx, hit = _mk_rulebook(rng, B, Q, M, Mb, spread=120)
    table = jnp.asarray(rng.randn(B, Mb, R).astype(np.float32))
    wband = jnp.asarray((rng.randn(Q, R, Rout) * 0.1).astype(np.float32))
    for band in (128, 256, 384):
        plan = bd.make_band_plan(idx, hit, Mb, band=band, fb_cap=2048)
        out = bd.banded_gather_matmul(table, wband, plan)
        np.testing.assert_allclose(np.asarray(out), _ref(table, idx, hit, wband),
                                   rtol=1e-4, atol=1e-4)


def test_band_plan_symmetric_consistency():
    """Symmetric plans mask dual pairs together; fallback keeps exactness."""
    rng = np.random.RandomState(1)
    B, M = 1, 256
    Mb = M
    # a real symmetric rulebook: taps (d, -d) pairs via neighbor structure
    Q = 3
    idx = np.stack([
        np.clip(np.arange(M) - 3, 0, M - 1),
        np.arange(M),
        np.clip(np.arange(M) + 3, 0, M - 1),
    ])[None]
    hit = np.ones((B, Q, M), bool)
    hit[0, 0, :3] = False
    hit[0, 2, -3:] = False
    idx, hit = jnp.asarray(idx.astype(np.int32)), jnp.asarray(hit)
    table = jnp.asarray(rng.randn(B, Mb, 128).astype(np.float32))
    wband = jnp.asarray((rng.randn(Q, 128, 128) * 0.1).astype(np.float32))
    plan = bd.make_band_plan(idx, hit, Mb, band=128, fb_cap=1024, symmetric=True)
    out = bd.banded_gather_matmul(table, wband, plan)
    np.testing.assert_allclose(np.asarray(out), _ref(table, idx, hit, wband),
                               rtol=1e-4, atol=1e-4)


def test_banded_grad_matches_reference():
    """custom_vjp (symmetric dual path + fallback grads) == autodiff of the
    dense reference."""
    rng = np.random.RandomState(2)
    B, M = 1, 256
    Mb = M
    Q = 3
    idx = np.stack([
        np.clip(np.arange(M) - 2, 0, M - 1),
        np.arange(M),
        np.clip(np.arange(M) + 2, 0, M - 1),
    ])[None]
    hit = np.ones((B, Q, M), bool)
    hit[0, 0, :2] = False
    hit[0, 2, -2:] = False
    idxj, hitj = jnp.asarray(idx.astype(np.int32)), jnp.asarray(hit)
    table = jnp.asarray(rng.randn(B, Mb, 128).astype(np.float32))
    wband = jnp.asarray((rng.randn(Q, 128, 128) * 0.1).astype(np.float32))
    # small band forces both the kernel and fallback paths into the grad
    plan = bd.make_band_plan(idxj, hitj, Mb, band=128, fb_cap=1024, symmetric=True)

    def loss_banded(t, w):
        return jnp.sum(jnp.sin(bd.banded_gather_matmul(t, w, plan)))

    def loss_ref(t, w):
        tn = jnp.concatenate([t, jnp.zeros((B, 1, 128), t.dtype)], 1)
        safe = jnp.where(hitj, idxj, Mb)
        g = jnp.take_along_axis(tn, safe.reshape(B, Q * M, 1), axis=1).reshape(B, Q, M, 128)
        return jnp.sum(jnp.sin(jnp.einsum("bqmr,qro->bmo", g, w)))

    gt, gw = jax.grad(loss_banded, argnums=(0, 1))(table, wband)
    rt, rw = jax.grad(loss_ref, argnums=(0, 1))(table, wband)
    np.testing.assert_allclose(np.asarray(gt), np.asarray(rt), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(rw), rtol=1e-4, atol=1e-4)


def test_grouped_band_plan_exact():
    """Per-group slabs: taps clustered around distinct centers fit narrow
    per-group bands; kernel + fallback == full reference, and the grouped
    plan needs no wider-band fallback than a single band covering the whole
    tap spread."""
    rng = np.random.RandomState(11)
    B, M = 2, 512
    Mb = M
    # 6 taps in 3 clusters: centers -160, 0, +160 with +-20 jitter
    m = np.arange(M)
    idx = np.stack([
        np.clip(m - 160 + rng.randint(-20, 21, M), 0, Mb - 1),
        np.clip(m - 158 + rng.randint(-20, 21, M), 0, Mb - 1),
        np.clip(m + rng.randint(-20, 21, M), 0, Mb - 1),
        np.clip(m + 2 + rng.randint(-20, 21, M), 0, Mb - 1),
        np.clip(m + 160 + rng.randint(-20, 21, M), 0, Mb - 1),
        np.clip(m + 162 + rng.randint(-20, 21, M), 0, Mb - 1),
    ])
    idx = np.tile(idx[None], (B, 1, 1)).astype(np.int32)
    hit = rng.rand(B, 6, M) >= 0.3
    idxj, hitj = jnp.asarray(idx), jnp.asarray(hit)
    table = jnp.asarray(rng.randn(B, Mb, 128).astype(np.float32))
    wband = jnp.asarray((rng.randn(6, 128, 128) * 0.1).astype(np.float32))
    groups = ((0, 1), (2, 3), (4, 5))
    plan = bd.make_band_plan(idxj, hitj, Mb, bm=128, fb_cap=512,
                             groups=groups, group_bands=(192, 192, 192))
    assert plan.starts.shape == (B, 3, M // 128)
    # narrow per-group bands cover the jitter; nothing leaks to the fallback
    assert int(plan.oob_count.sum()) == 0
    out = bd.banded_gather_matmul(table, wband, plan)
    np.testing.assert_allclose(np.asarray(out), _ref(table, idxj, hitj, wband),
                               rtol=1e-4, atol=1e-4)
    # the Mosaic kernel (interpret) agrees with the XLA path
    os.environ["DAL3D_BANDED"] = "interpret"
    try:
        got = bd._banded_fwd_pallas(table, plan.idx_k, plan.starts, wband,
                                    plan.groups, plan.bands, plan.bm)
        dw_got = bd._banded_dw_pallas(table, plan.idx_k, plan.starts,
                                      out, plan.groups, plan.bands, plan.bm)
    finally:
        del os.environ["DAL3D_BANDED"]
    ref_k = bd._banded_fwd_xla(table, plan.idx_k, wband)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref_k),
                               rtol=1e-4, atol=1e-4)
    tn, gn, ik = np.asarray(table), np.asarray(out), np.asarray(plan.idx_k)
    dw_ref = np.zeros((6, 128, 128), np.float32)
    for b in range(B):
        for q in range(6):
            rows = np.where((ik[b, q] >= 0)[:, None], tn[b][np.maximum(ik[b, q], 0)], 0.0)
            dw_ref[q] += rows.T @ gn[b]
    np.testing.assert_allclose(np.asarray(dw_got), dw_ref, rtol=1e-3, atol=1e-3)


def test_oob_count_observable():
    rng = np.random.RandomState(3)
    B, Q, M, Mb = 1, 4, 256, 256
    idx, hit = _mk_rulebook(rng, B, Q, M, Mb, spread=200)
    plan = bd.make_band_plan(idx, hit, Mb, band=64, fb_cap=4096)
    assert int(plan.oob_count.sum()) > 0
    plan_wide = bd.make_band_plan(idx, hit, Mb, band=256, fb_cap=64)
    assert int(plan_wide.oob_count.sum()) <= int(plan.oob_count.sum())


def test_spatial_compaction_order_and_set():
    """_compact_cells_spatial: same dedup set as _compact_cells, y-major order."""
    rng = np.random.RandomState(4)
    D, H, Wb = 4, 8, 6
    nbc = D * H * Wb
    cells = rng.randint(0, nbc, 300).astype(np.int32)
    cells[::7] = nbc  # sentinels
    cap = 256
    got = np.asarray(spb._compact_cells_spatial(jnp.asarray(cells), nbc, cap, (D, H, Wb)))
    ref = np.asarray(spb._compact_cells(jnp.asarray(cells), nbc, cap))
    got_set = set(got[got < nbc].tolist())
    ref_set = set(ref[ref < nbc].tolist())
    assert got_set == ref_set
    # y-major sortedness
    act = got[got < nbc]
    z, rem = act // (H * Wb), act % (H * Wb)
    y, wb = rem // Wb, rem % Wb
    keys = (y * Wb + wb) * D + z
    assert np.all(np.diff(keys) > 0)


@pytest.mark.parametrize("bw", [4, 8])
def test_banded_subm_conv_matches_oracle(bw):
    rng = np.random.RandomState(5)
    shape = (6, 16, 32)
    C, Cout = 4, 6
    feats, coords, valid = _random_scene(rng, shape=shape, C=C)
    w = jnp.asarray(rng.randn(27, C, Cout).astype(np.float32)) * 0.2

    sb = sps.from_voxels(feats, coords, valid, shape)
    ref = np.asarray(sps.to_dense(sps.subm_conv(sb, w, kernel_size=3)))

    bb = spb.from_voxels(feats, coords, valid, shape, bw=bw, mb_cap=384, spatial=True)
    rb = spb.subm_rulebook_banded(bb, 3, band=128, fb_cap=512)
    got = np.asarray(spb.to_dense(spb.subm_conv(bb, w, rulebook=rb)))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_banded_downsample_matches_oracle():
    rng = np.random.RandomState(6)
    shape = (6, 16, 32)
    C, Cout = 4, 6
    feats, coords, valid = _random_scene(rng, shape=shape, C=C)
    w = jnp.asarray(rng.randn(27, C, Cout).astype(np.float32)) * 0.2

    sb = sps.from_voxels(feats, coords, valid, shape)
    ref = np.asarray(sps.to_dense(sps.sparse_conv_downsample(
        sb, w, (3, 3, 3), (2, 2, 2), (1, 1, 1), 256)))

    bb = spb.from_voxels(feats, coords, valid, shape, bw=4, mb_cap=384, spatial=True)
    got = np.asarray(spb.to_dense(spb.downsample_conv_banded(
        bb, w, (3, 3, 3), (2, 2, 2), (1, 1, 1), out_bw=4, out_cap=256,
        band=128, fb_cap=1024)))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_banded_backbone_matches_brick():
    """Full FPN backbone: impl='banded' == impl='brick' (f32, CPU/XLA path)."""
    from dal3d_tpu.models.backbones.scn import FPNSpMiddleResNetFHD

    rng = np.random.RandomState(7)
    shape = (41, 32, 32)
    feats, coords, valid = _random_scene(rng, B=1, N=200, shape=shape, C=5)
    sb = sps.from_voxels(feats, coords, valid, shape)

    kw = dict(
        num_input_features=5,
        brick_widths=(8, 8, 8, 4, 4),
        brick_caps=(1536, 1536, 768, 384, 384),
        banded_caps=(1536, 1536, 768, 384, 384),
        band_widths=(256, 256, 128, 128, 128),
        down_bands=(512, 256, 128, 128),
        band_fb_cap=2048,
    )
    mb = FPNSpMiddleResNetFHD(impl="brick", **kw)
    vb = mb.init(jax.random.PRNGKey(0), sb, False)
    dense_b, _ = mb.apply(vb, sb, False)

    mg = FPNSpMiddleResNetFHD(impl="banded", **kw)
    dense_g, _ = mg.apply(vb, sb, False)
    np.testing.assert_allclose(np.asarray(dense_g), np.asarray(dense_b),
                               rtol=1e-3, atol=1e-3)


def test_banded_chain_matches_oracle_and_brick():
    """Three-level chain (subm -> down 16->16 -> subm -> down 16->8) at
    production brick widths: banded == brick == per-voxel oracle EXACTLY when
    capacities don't truncate.

    Regression for a round-3 misdiagnosis: with under-sized out_cap the two
    engines drop DIFFERENT bricks (first-appearance vs y-major spatial order)
    and diverge from each other AND the oracle — an observable capacity
    overflow (brick_stats), not an engine bug."""
    rng = np.random.RandomState(0)
    shape = (16, 256, 256)
    C = 5
    pts = []
    while len(pts) < 400:
        z, y, x0 = rng.randint(6), rng.randint(256), rng.randint(256)
        for dx in range(rng.randint(1, 8)):
            if x0 + dx < 256:
                pts.append((z, y, x0 + dx))
    pts = list(dict.fromkeys(pts))[:400]
    n = len(pts)
    coords = np.zeros((1, 400, 3), np.int64)
    coords[0, :n] = np.array(pts)
    feats = np.zeros((1, 400, C), np.float32)
    feats[0, :n] = rng.randn(n, C)
    valid = np.zeros((1, 400), bool)
    valid[0, :n] = True
    feats, coords, valid = jnp.asarray(feats), jnp.asarray(coords), jnp.asarray(valid)

    w1 = jnp.asarray(rng.randn(27, C, 8).astype(np.float32)) * 0.2
    w2 = jnp.asarray(rng.randn(27, 8, 8).astype(np.float32)) * 0.2
    w3 = jnp.asarray(rng.randn(27, 8, 8).astype(np.float32)) * 0.2
    w4 = jnp.asarray(rng.randn(27, 8, 8).astype(np.float32)) * 0.2
    caps = (2048, 2048, 2048)

    def chain_brick():
        bb = spb.from_voxels(feats, coords, valid, shape, bw=16, mb_cap=caps[0])
        o = spb.subm_conv(bb, w1, spb.subm_rulebook(bb, 3))
        d = spb.downsample_conv(o, w2, (3, 3, 3), (2, 2, 2), (1, 1, 1),
                                out_bw=16, out_cap=caps[1])
        o2 = spb.subm_conv(d, w3, spb.subm_rulebook(d, 3))
        return o2, spb.downsample_conv(o2, w4, (3, 3, 3), (2, 2, 2), (1, 1, 1),
                                       out_bw=8, out_cap=caps[2])

    def chain_banded():
        bb = spb.from_voxels(feats, coords, valid, shape, bw=16, mb_cap=caps[0],
                             spatial=True)
        o = spb.subm_conv(bb, w1, spb.subm_rulebook_banded(bb, 3, band=768, fb_cap=512))
        d = spb.downsample_conv_banded(o, w2, (3, 3, 3), (2, 2, 2), (1, 1, 1),
                                       out_bw=16, out_cap=caps[1], band=768, fb_cap=2048)
        o2 = spb.subm_conv(d, w3, spb.subm_rulebook_banded(d, 3, band=512, fb_cap=512))
        return o2, spb.downsample_conv_banded(o2, w4, (3, 3, 3), (2, 2, 2), (1, 1, 1),
                                              out_bw=8, out_cap=caps[2], band=512,
                                              fb_cap=2048)

    o2b, out_b = chain_brick()
    o2g, out_g = chain_banded()
    # per-voxel oracle on the (identical) L1 input of the final downsample
    sb_in = spb.to_sparse(o2g, n_cap=8192)
    oracle = np.asarray(sps.to_dense(sps.sparse_conv_downsample(
        sb_in, w4, (3, 3, 3), (2, 2, 2), (1, 1, 1), 4096)))
    A = np.asarray(spb.to_dense(out_b))
    G = np.asarray(spb.to_dense(out_g))
    np.testing.assert_allclose(G, oracle, rtol=0, atol=1e-4)
    np.testing.assert_allclose(A, G, rtol=0, atol=1e-4)


def test_pallas_kernel_interpret_matches_xla():
    """The actual Mosaic kernel (interpret mode) == the XLA reference path."""
    rng = np.random.RandomState(8)
    B, Q, M, Mb, R, Rout, band = 2, 3, 256, 256, 128, 128, 128
    idx, hit = _mk_rulebook(rng, B, Q, M, Mb, spread=40)
    table = jnp.asarray(rng.randn(B, Mb, R).astype(np.float32))
    wband = jnp.asarray((rng.randn(Q, R, Rout) * 0.1).astype(np.float32))
    plan = bd.make_band_plan(idx, hit, Mb, band=band, fb_cap=512)
    ref = bd._banded_fwd_xla(table, plan.idx_k, wband)
    os.environ["DAL3D_BANDED"] = "interpret"
    try:
        got = bd._banded_fwd_pallas(table, plan.idx_k, plan.starts, wband,
                                    plan.groups, plan.bands, plan.bm)
        dw_got = bd._banded_dw_pallas(table, plan.idx_k, plan.starts,
                                      ref, plan.groups, plan.bands, plan.bm)
    finally:
        del os.environ["DAL3D_BANDED"]
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4)
    # dw reference
    tn = np.asarray(table)
    gn = np.asarray(ref)
    ik = np.asarray(plan.idx_k)
    dw_ref = np.zeros((Q, R, Rout), np.float32)
    for b in range(B):
        for q in range(Q):
            rows = np.where((ik[b, q] >= 0)[:, None], tn[b][np.maximum(ik[b, q], 0)], 0.0)
            dw_ref[q] += rows.T @ gn[b]
    np.testing.assert_allclose(np.asarray(dw_got), dw_ref, rtol=1e-3, atol=1e-3)


def test_pallas_kernel_self_tap_matches_xla():
    """self_tap direct slab read (interpret mode) == XLA path == full ref,
    including rows the raised start floor pushes into the fallback."""
    rng = np.random.RandomState(9)
    B, Q, M, Mb, R, Rout, band = 2, 3, 512, 512, 128, 128, 160
    idx, hit = _mk_rulebook(rng, B, Q, M, Mb, spread=60)
    iota = jnp.broadcast_to(jnp.arange(M, dtype=jnp.int32), (B, M))
    idx = idx.at[:, 1, :].set(iota)       # tap 1 = identity (self)
    hit = hit.at[:, 1, :].set(True)
    table = jnp.asarray(rng.randn(B, Mb, R).astype(np.float32))
    wband = jnp.asarray((rng.randn(Q, R, Rout) * 0.1).astype(np.float32))
    plan = bd.make_band_plan(idx, hit, Mb, band=band, fb_cap=1024, self_tap=1)
    assert plan.self_tap == 1
    # start floor: every block's own rows inside its slab
    st = np.asarray(plan.starts)[:, 0]  # single group
    m0 = np.arange(M // plan.bm) * plan.bm
    assert (st >= np.maximum(m0 + plan.bm - band, 0)[None, :] - 0).all()
    assert (st <= m0[None, :]).all()
    ref_full = _ref(table, idx, hit, wband)
    out_full = bd.banded_gather_matmul(table, wband, plan)  # xla kernel + fb
    np.testing.assert_allclose(np.asarray(out_full), ref_full, rtol=1e-4, atol=1e-4)
    os.environ["DAL3D_BANDED"] = "interpret"
    try:
        got = bd._banded_fwd_pallas(table, plan.idx_k, plan.starts, wband,
                                    plan.groups, plan.bands, plan.bm,
                                    self_tap=1)
    finally:
        del os.environ["DAL3D_BANDED"]
    ref_kernel = bd._banded_fwd_xla(table, plan.idx_k, wband)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref_kernel),
                               rtol=1e-4, atol=1e-4)
