"""Brick-capacity observability report (runtime/capacity.py, ADVICE r2)."""
import logging
import types

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dal3d_tpu.ops.voxelize import VoxelConfig
from dal3d_tpu.models import FPNVoxelNet
from dal3d_tpu.runtime.capacity import brick_capacity_report, log_capacity_report

VCFG = VoxelConfig(
    point_cloud_range=(-8.0, -8.0, -3.0, 8.0, 8.0, 1.0),
    voxel_size=(0.25, 0.25, 0.1),
    max_points_in_voxel=5,
    max_voxel_num=2000,
)


def _voxel_batch(B=2, n=600, seed=0):
    rng = np.random.RandomState(seed)
    D, H, W = VCFG.sparse_shape
    vf = np.zeros((B, 2000, 5), np.float32)
    vc = np.zeros((B, 2000, 3), np.int32)
    vv = np.zeros((B, 2000), bool)
    for b in range(B):
        # unique voxel coords clustered in y-rows (lidar-ish)
        lin = rng.choice(D * H * W, n, replace=False)
        z, r = lin // (H * W), lin % (H * W)
        y, x = r // W, r % W
        vc[b, :n] = np.stack([z, y, x], -1)
        vf[b, :n] = rng.randn(n, 5)
        vv[b, :n] = True
    return {
        "voxel_features": jnp.asarray(vf),
        "voxel_coords": jnp.asarray(vc),
        "voxel_valid": jnp.asarray(vv),
    }


def _bundle(caps):
    model = FPNVoxelNet(
        voxel_cfg=VCFG, num_classes=(1,), backbone_impl="brick",
        brick_caps=caps, rpn_ds_filters=(32, 64), rpn_us_filters=(64, 64),
    )
    batch = _voxel_batch()
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((2, 1, 5), jnp.float32), jnp.zeros((2, 1), bool), False,
        voxels=(batch["voxel_features"], batch["voxel_coords"],
                batch["voxel_valid"]),
    )
    bundle = types.SimpleNamespace(model=model)
    return bundle, variables["params"], variables.get("batch_stats", {}), batch


@pytest.mark.slow
def test_capacity_report_ok_and_saturated():
    bundle, params, bstats, batch = _bundle(caps=(4096, 4096, 2048, 2048, 2048))
    rows = brick_capacity_report(bundle, params, bstats, batch)
    assert len(rows) == 5, rows
    assert all(r["active"] > 0 for r in rows), rows
    assert not any(r["saturated"] for r in rows), rows
    # true L0 demand: at least the 600 distinct voxels' bricks... bounded by
    # candidates; must be <= cap here and > 0
    assert rows[0]["active"] <= 4096

    # starved caps: L0's true count exceeds the cap -> saturated
    bundle2, params2, bstats2, batch2 = _bundle(caps=(128, 128, 128, 128, 128))
    rows2 = brick_capacity_report(bundle2, params2, bstats2, batch2)
    assert rows2[0]["saturated"], rows2
    # L0 reports TRUE demand (uncapped): strictly above the cap
    assert rows2[0]["active"] > 128


@pytest.mark.slow
def test_log_capacity_report_warns(caplog):
    bundle, params, bstats, batch = _bundle(caps=(128, 128, 128, 128, 128))
    trainer = types.SimpleNamespace(
        bundle=bundle,
        state=types.SimpleNamespace(params=params, batch_stats=bstats),
        logger=logging.getLogger("dal3d.test_capacity"),
    )
    with caplog.at_level(logging.WARNING, logger="dal3d.test_capacity"):
        log_capacity_report(trainer, batch)
    assert any("SATURATED" in r.message for r in caplog.records)


def test_report_skips_non_brick():
    model = FPNVoxelNet(voxel_cfg=VCFG, num_classes=(1,), backbone_impl="gather")
    bundle = types.SimpleNamespace(model=model)
    assert brick_capacity_report(bundle, {}, {}, _voxel_batch()) == []
    assert brick_capacity_report(
        types.SimpleNamespace(model=model), {}, {}, {"points": None}) == []
