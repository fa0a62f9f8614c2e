"""bf16 backbone: numerical closeness to f32 + grad flow."""
import numpy as np
import jax
import jax.numpy as jnp

from dal3d_tpu.ops.voxelize import VoxelConfig
from dal3d_tpu.models import FPNVoxelNet
import pytest

pytestmark = pytest.mark.slow

VCFG = VoxelConfig(
    point_cloud_range=(-8.0, -8.0, -3.0, 8.0, 8.0, 1.0),
    voxel_size=(0.5, 0.5, 0.1),
    max_points_in_voxel=5,
    max_voxel_num=1000,
)


def test_bf16_backbone_close_to_f32():
    kw = dict(voxel_cfg=VCFG, num_classes=(1,), voxel_caps=(1000, 500, 250, 250),
              rpn_ds_filters=(32, 64), rpn_us_filters=(32, 32))
    m32 = FPNVoxelNet(**kw, backbone_dtype="float32")
    m16 = FPNVoxelNet(**kw, backbone_dtype="bfloat16")
    rng = np.random.RandomState(0)
    B, P = 1, 1024
    pts = np.zeros((B, P, 5), np.float32)
    pts[..., :2] = rng.uniform(-7.9, 7.9, (B, P, 2))
    pts[..., 2] = rng.uniform(-2.9, 0.9, (B, P))
    pv = jnp.ones((B, P), bool)
    var = m32.init(jax.random.PRNGKey(0), jnp.asarray(pts), pv, False)
    out32 = m32.apply(var, jnp.asarray(pts), pv, False)
    out16 = m16.apply(var, jnp.asarray(pts), pv, False)  # same params
    e32, e16 = np.asarray(out32["embedding"]), np.asarray(out16["embedding"])
    assert e16.dtype == np.float32  # dense head path stays f32
    denom = np.abs(e32).mean() + 1e-6
    assert np.abs(e32 - e16).mean() / denom < 0.1  # bf16-level agreement

    def loss(params):
        o = m16.apply({"params": params, "batch_stats": var["batch_stats"]},
                      jnp.asarray(pts), pv, False)
        return (o["embedding"] ** 2).sum()

    g = jax.grad(loss)(var["params"])
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert sum(float(np.abs(np.asarray(l)).sum()) for l in leaves) > 0
