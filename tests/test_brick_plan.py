"""Host brick-pack plan (native brick_pack_plan + from_voxels_planned).

Contract: from_voxels_planned(host plan) must be BIT-IDENTICAL to the
on-device from_voxels for the same (bw, mb_cap, spatial) knobs — packing
order, halo dilation, vmask, capacity-drop rule included. The C++ op and its
numpy fallback must agree with each other and report the true brick count
(count_active_bricks contract)."""
import numpy as np
import pytest

import jax.numpy as jnp

from dal3d_tpu.native import host_ops
from dal3d_tpu.native.host_ops import _brick_pack_plan_np
from dal3d_tpu.ops import sparse_brick as spb


def _random_voxels(rng, n, D, H, W, clustered=True):
    """Lidar-ish clustered voxel coords (unique), zyx int32."""
    if clustered:
        nc = max(n // 40, 1)
        cz = rng.randint(0, D, nc)
        cy = rng.randint(0, H, nc)
        cx = rng.randint(0, W, nc)
        k = rng.randint(0, nc, n)
        z = np.clip(cz[k] + rng.randint(-1, 2, n), 0, D - 1)
        y = np.clip(cy[k] + rng.randint(-3, 4, n), 0, H - 1)
        x = np.clip(cx[k] + rng.randint(-6, 7, n), 0, W - 1)
    else:
        z = rng.randint(0, D, n)
        y = rng.randint(0, H, n)
        x = rng.randint(0, W, n)
    coords = np.stack([z, y, x], -1).astype(np.int32)
    coords = np.unique(coords, axis=0)
    rng.shuffle(coords)
    return coords


@pytest.mark.parametrize("spatial", [False, True])
@pytest.mark.parametrize("bw", [1, 4])
def test_host_plan_matches_device_pack(spatial, bw):
    rng = np.random.RandomState(0 if spatial else 1)
    D, H, W = 8, 32, 32
    mb_cap = 1024
    B, N = 2, 500
    vf = np.zeros((B, N, 3), np.float32)
    vc = np.zeros((B, N, 3), np.int32)
    vv = np.zeros((B, N), bool)
    rows = np.full((B, N), -1, np.int32)
    lins = np.zeros((B, mb_cap), np.int32)
    for b in range(B):
        c = _random_voxels(rng, N, D, H, W)[: N - 17]  # some padding slots
        n = len(c)
        vc[b, :n] = c
        vf[b, :n] = rng.randn(n, 3).astype(np.float32)
        vv[b, :n] = True
        lin, row, cnt = host_ops.brick_pack_plan(
            vc[b], (D, H, W), bw, mb_cap, spatial, valid=vv[b])
        rows[b], lins[b] = row, lin
        assert cnt == int(np.asarray(spb.count_active_bricks(
            jnp.asarray(vc[b])[None], jnp.asarray(vv[b])[None], (D, H, W), bw))[0])
    want = spb.from_voxels(jnp.asarray(vf), jnp.asarray(vc), jnp.asarray(vv),
                           (D, H, W), bw=bw, mb_cap=mb_cap, spatial=spatial)
    got = spb.from_voxels_planned(jnp.asarray(vf), jnp.asarray(vc), jnp.asarray(vv),
                                  (D, H, W), bw=bw,
                                  row=jnp.asarray(rows), brick_lin=jnp.asarray(lins))
    np.testing.assert_array_equal(np.asarray(got.brick_lin), np.asarray(want.brick_lin))
    np.testing.assert_array_equal(np.asarray(got.vmask), np.asarray(want.vmask))
    np.testing.assert_array_equal(np.asarray(got.features), np.asarray(want.features))


@pytest.mark.parametrize("spatial", [False, True])
def test_host_plan_capacity_drop_matches_device(spatial):
    """Overflowing mb_cap drops the same bricks as the device compaction."""
    rng = np.random.RandomState(2)
    D, H, W = 4, 24, 24
    bw, mb_cap = 4, 64  # force overflow
    c = _random_voxels(rng, 600, D, H, W, clustered=False)
    n = len(c)
    vf = rng.randn(1, n, 2).astype(np.float32)
    vv = np.ones((1, n), bool)
    lin, row, cnt = host_ops.brick_pack_plan(c, (D, H, W), bw, mb_cap, spatial)
    assert cnt > mb_cap  # truncation occurred and is reported
    want = spb.from_voxels(jnp.asarray(vf), jnp.asarray(c)[None], jnp.asarray(vv),
                           (D, H, W), bw=bw, mb_cap=mb_cap, spatial=spatial)
    got = spb.from_voxels_planned(jnp.asarray(vf), jnp.asarray(c)[None], jnp.asarray(vv),
                                  (D, H, W), bw=bw,
                                  row=jnp.asarray(row)[None],
                                  brick_lin=jnp.asarray(lin)[None])
    np.testing.assert_array_equal(np.asarray(got.brick_lin), np.asarray(want.brick_lin))
    np.testing.assert_array_equal(np.asarray(got.vmask), np.asarray(want.vmask))
    np.testing.assert_array_equal(np.asarray(got.features), np.asarray(want.features))


@pytest.mark.parametrize("spatial", [False, True])
@pytest.mark.parametrize("bw", [1, 4])
def test_cpp_matches_numpy_fallback(spatial, bw):
    rng = np.random.RandomState(3)
    D, H, W = 6, 16, 16
    c = _random_voxels(rng, 300, D, H, W)
    v = np.ones((len(c),), bool)
    v[::7] = False
    mb_cap = 256
    lin_c, row_c, cnt_c = host_ops.brick_pack_plan(c, (D, H, W), bw, mb_cap,
                                                   spatial, valid=v)
    lin_n, row_n, cnt_n = _brick_pack_plan_np(c, v, D, H, W, bw, mb_cap, spatial)
    assert cnt_c == cnt_n
    np.testing.assert_array_equal(lin_c, lin_n)
    np.testing.assert_array_equal(row_c, row_n)


def test_planned_pack_through_model_forward():
    """The plan flows through the detector seam (voxels 5-tuple) and produces
    the same forward outputs as the unplanned brick path."""
    import jax

    import __graft_entry__ as ge
    from dal3d_tpu.models import FPNVoxelNet

    bundle, batch = ge._tiny_setup(batch=1)
    m = bundle.model
    model = FPNVoxelNet(
        voxel_cfg=m.voxel_cfg, num_classes=m.num_classes,
        voxel_caps=m.voxel_caps, rpn_ds_filters=m.rpn_ds_filters,
        rpn_us_filters=m.rpn_us_filters, backbone_impl="brick",
        brick_widths=(4, 4, 2, 1, 1), brick_caps=(2048, 1024, 512, 256, 256),
    )
    # host voxelize + plan
    from dal3d_tpu.native import host_ops as ho

    cfg = m.voxel_cfg
    pts = np.asarray(batch["points"][0])
    feats, coords, npts = ho.points_to_voxel_mean(
        pts, cfg.voxel_size, cfg.point_cloud_range, cfg.max_points_in_voxel,
        cfg.max_voxel_num)
    M = cfg.max_voxel_num
    vf = np.zeros((1, M, pts.shape[1]), np.float32)
    vc = np.zeros((1, M, 3), np.int32)
    vv = np.zeros((1, M), bool)
    n = len(feats)
    vf[0, :n], vc[0, :n], vv[0, :n] = feats, coords, True
    lin, row, cnt = ho.brick_pack_plan(vc[0], cfg.sparse_shape, 4, 2048, False,
                                       valid=vv[0])
    rows = np.where(vv, np.pad(row, (0, 0))[None], -1).astype(np.int32)

    variables = jax.jit(model.init, static_argnums=(3,))(
        jax.random.PRNGKey(0), batch["points"][:1], batch["points_valid"][:1], False)
    va = (jnp.asarray(vf), jnp.asarray(vc), jnp.asarray(vv))
    out_plain = model.apply(variables, batch["points"][:1],
                            batch["points_valid"][:1], False, voxels=va)
    plan = {"brick_row": jnp.asarray(rows), "brick_lin": jnp.asarray(lin)[None]}
    out_plan = model.apply(
        variables, batch["points"][:1], batch["points_valid"][:1], False,
        voxels=va + (plan,))
    np.testing.assert_array_equal(np.asarray(out_plain["embedding"]),
                                  np.asarray(out_plan["embedding"]))


@pytest.mark.parametrize("impl", ["brick", "banded"])
def test_full_pyramid_plan_through_model_forward(impl):
    """The FULL host plan pyramid (pack + per-level rulebooks + downsample
    plans, data/sparse_plans.py) produces bit-identical forward outputs to
    the all-on-device plan path, for both brick engines."""
    import jax

    import __graft_entry__ as ge
    from dal3d_tpu.data.sparse_plans import compute_sparse_plans
    from dal3d_tpu.models import FPNVoxelNet
    from dal3d_tpu.models.backbones.scn import brick_level_widths, l0_brick_knobs
    from dal3d_tpu.native import host_ops as ho

    widths = (4, 4, 2, 1, 1)
    caps = (2048, 1024, 512, 256, 256)
    bundle, batch = ge._tiny_setup(batch=2)
    m = bundle.model
    kwargs = dict(
        voxel_cfg=m.voxel_cfg, num_classes=m.num_classes,
        voxel_caps=m.voxel_caps, rpn_ds_filters=m.rpn_ds_filters,
        rpn_us_filters=m.rpn_us_filters, backbone_impl=impl,
        brick_widths=widths)
    kwargs["banded_caps" if impl == "banded" else "brick_caps"] = caps
    model = FPNVoxelNet(**kwargs)

    cfg = m.voxel_cfg
    B = 2
    M = cfg.max_voxel_num
    vf = np.zeros((B, M, 5), np.float32)
    vc = np.zeros((B, M, 3), np.int32)
    vv = np.zeros((B, M), bool)
    for b in range(B):
        pts = np.asarray(batch["points"][b])
        feats, coords, npts = ho.points_to_voxel_mean(
            pts, cfg.voxel_size, cfg.point_cloud_range, cfg.max_points_in_voxel, M)
        n = len(feats)
        vf[b, :n], vc[b, :n], vv[b, :n] = feats, coords, True

    bcfg = dict(impl=impl, brick_widths=widths)
    bcfg["banded_caps" if impl == "banded" else "brick_caps"] = caps
    knobs = l0_brick_knobs(bcfg, cfg.sparse_shape[2])
    plans = compute_sparse_plans(vc, vv, cfg.sparse_shape, knobs["widths"],
                                 knobs["caps"], knobs["spatial"],
                                 banded_knobs=knobs.get("banded_knobs"))
    assert plans is not None
    assert set(spb.HOST_PLAN_KEYS) <= set(plans)
    if impl == "banded":
        # BandPlans shipped too: subm conv/pad + strided conv/pad per level
        assert "bp_rb0_conv_idx_k" in plans and "bp_ds4_pad_starts" in plans
    else:
        assert not any(k.startswith("bp_") for k in plans)

    variables = jax.jit(model.init, static_argnums=(3,))(
        jax.random.PRNGKey(0), batch["points"], batch["points_valid"], False)
    va = (jnp.asarray(vf), jnp.asarray(vc), jnp.asarray(vv))
    out_plain = model.apply(variables, batch["points"], batch["points_valid"],
                            False, voxels=va)
    out_plan = model.apply(
        variables, batch["points"], batch["points_valid"], False,
        voxels=va + ({k: jnp.asarray(v) for k, v in plans.items()},))
    np.testing.assert_array_equal(np.asarray(out_plain["embedding"]),
                                  np.asarray(out_plan["embedding"]))
    np.testing.assert_array_equal(
        np.asarray(out_plain["preds"][0]["box_preds"]),
        np.asarray(out_plan["preds"][0]["box_preds"]))


def test_brick_plan_batch_shards_over_mesh():
    """The planned-pack batch keys survive shard_batch on a multi-device mesh
    (a rank-0 per-example scalar here used to crash device_put with
    PartitionSpec('data')) and the sharded planned pack equals single-device."""
    import jax

    from dal3d_tpu.parallel.mesh import make_mesh, shard_batch

    rng = np.random.RandomState(5)
    D, H, W, bw, mb_cap = 4, 16, 16, 4, 128
    B, N = 8, 120
    vf = rng.randn(B, N, 2).astype(np.float32)
    vc = np.zeros((B, N, 3), np.int32)
    vv = np.ones((B, N), bool)
    rows = np.zeros((B, N), np.int32)
    lins = np.zeros((B, mb_cap), np.int32)
    for b in range(B):
        vc[b] = _random_voxels(rng, 4 * N, D, H, W, clustered=False)[:N]
        lins[b], rows[b], _ = host_ops.brick_pack_plan(
            vc[b], (D, H, W), bw, mb_cap, True, valid=vv[b])
    batch = {"voxel_features": jnp.asarray(vf), "voxel_coords": jnp.asarray(vc),
             "voxel_valid": jnp.asarray(vv), "brick_row": jnp.asarray(rows),
             "brick_lin": jnp.asarray(lins)}
    mesh = make_mesh(n_data=4, n_model=2)
    sharded = shard_batch(batch, mesh)  # must not raise on any key

    def pack(b):
        bb = spb.from_voxels_planned(
            b["voxel_features"], b["voxel_coords"], b["voxel_valid"],
            (D, H, W), bw=bw, row=b["brick_row"], brick_lin=b["brick_lin"])
        return bb.features

    with jax.set_mesh(mesh):
        got = np.asarray(jax.jit(pack)(sharded))
    want = np.asarray(pack(batch))
    np.testing.assert_array_equal(got, want)
