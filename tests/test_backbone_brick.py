"""Full-backbone parity: impl='brick' vs impl='gather' on the same params.

The brick engine must be numerically interchangeable (eval mode) with the
per-voxel gather engine on scenes where no capacity truncates."""
import numpy as np
import pytest

pytestmark = pytest.mark.slow
import jax
import jax.numpy as jnp

from dal3d_tpu.models.backbones.scn import FPNSpMiddleResNetFHD
from dal3d_tpu.ops import sparse_backend as sp


def _scene(rng, B=2, N=220, shape=(41, 32, 32), C=5):
    D, H, W = shape
    feats = np.zeros((B, N, C), np.float32)
    coords = np.zeros((B, N, 3), np.int64)
    valid = np.zeros((B, N), bool)
    for b in range(B):
        n = rng.randint(N - 60, N)
        pts = []
        while len(pts) < n:
            z, y, x0 = rng.randint(D), rng.randint(H), rng.randint(W)
            for dx in range(rng.randint(1, 5)):
                if x0 + dx < W:
                    pts.append((z, y, x0 + dx))
        pts = list(dict.fromkeys(pts))[:n]
        coords[b, : len(pts)] = np.array(pts)
        feats[b, : len(pts)] = rng.randn(len(pts), C)
        valid[b, : len(pts)] = True
    return jnp.asarray(feats), jnp.asarray(coords), jnp.asarray(valid)


def _remap_brick_to_gather(tree):
    """brick param tree nests the L0 section under 'l0'; gather inlines it."""
    out = dict(tree)
    l0 = out.pop("l0")
    for k, v in l0.items():
        out[k] = v
    return out


def test_backbone_brick_matches_gather_eval():
    rng = np.random.RandomState(0)
    shape = (41, 32, 32)
    feats, coords, valid = _scene(rng, shape=shape)
    sb = sp.from_voxels(feats, coords, valid, shape)

    kw = dict(
        num_input_features=5,
        voxel_caps=(4000, 4000, 2000, 2000),
        brick_widths=(8, 8, 8, 4, 4),
        brick_caps=(1500, 1500, 800, 400, 400),
    )
    brick = FPNSpMiddleResNetFHD(impl="brick", **kw)
    gather = FPNSpMiddleResNetFHD(impl="gather", **kw)

    var_b = brick.init(jax.random.PRNGKey(0), sb, False)
    var_g = {
        "params": _remap_brick_to_gather(var_b["params"]),
        "batch_stats": _remap_brick_to_gather(var_b["batch_stats"]),
    }

    dense_b, mid_b = brick.apply(var_b, sb, False)
    dense_g, mid_g = gather.apply(var_g, sb, False)

    assert dense_b.shape == dense_g.shape
    np.testing.assert_allclose(np.asarray(dense_b), np.asarray(dense_g), rtol=2e-3, atol=2e-3)
    assert len(mid_b) == 4


def test_backbone_brick_train_grads():
    rng = np.random.RandomState(1)
    shape = (41, 32, 32)
    feats, coords, valid = _scene(rng, B=1, N=120, shape=shape)
    sb = sp.from_voxels(feats, coords, valid, shape)
    model = FPNSpMiddleResNetFHD(
        impl="brick", num_input_features=5,
        brick_widths=(8, 8, 8, 4, 4), brick_caps=(800, 800, 400, 200, 200),
    )
    var = model.init(jax.random.PRNGKey(0), sb, True)

    def loss(params):
        (dense, _), _ = model.apply(
            {"params": params, "batch_stats": var["batch_stats"]}, sb, True,
            mutable=["batch_stats"],
        )
        return jnp.sum(dense ** 2)

    g = jax.grad(loss)(var["params"])
    flat = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(x)).all() for x in flat)
    assert sum(float(jnp.abs(x).sum()) for x in flat) > 0
