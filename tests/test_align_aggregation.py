"""align_aggregation ops vs numpy oracles (reference det3d/ops/
align_aggregation: CUDA correlation + alignfeature kernels)."""
import numpy as np
import jax
import jax.numpy as jnp

from dal3d_tpu.ops.align_aggregation import (
    AlignFeatureAggregation, align_feature, local_correlation,
)


def _np_correlation(f1, f2, patch):
    B, H, W, C = f1.shape
    r = patch // 2
    out = np.zeros((B, H, W, patch * patch), np.float32)
    f2p = np.pad(f2, ((0, 0), (r, r), (r, r), (0, 0)))
    for o, (dy, dx) in enumerate((dy, dx) for dy in range(patch) for dx in range(patch)):
        out[..., o] = (f1 * f2p[:, dy:dy + H, dx:dx + W]).sum(-1)
    return out


def test_local_correlation_matches_oracle():
    rng = np.random.RandomState(0)
    f1 = rng.randn(2, 6, 7, 5).astype(np.float32)
    f2 = rng.randn(2, 6, 7, 5).astype(np.float32)
    got = np.asarray(local_correlation(jnp.asarray(f1), jnp.asarray(f2), 3))
    np.testing.assert_allclose(got, _np_correlation(f1, f2, 3), rtol=1e-5, atol=1e-5)


def test_align_feature_matches_oracle():
    rng = np.random.RandomState(1)
    feat = rng.randn(1, 5, 5, 4).astype(np.float32)
    w = rng.rand(1, 5, 5, 9).astype(np.float32)
    got = np.asarray(align_feature(jnp.asarray(feat), jnp.asarray(w), 3))
    r, H, W = 1, 5, 5
    fp = np.pad(feat, ((0, 0), (r, r), (r, r), (0, 0)))
    ref = np.zeros_like(feat)
    for o, (dy, dx) in enumerate((dy, dx) for dy in range(3) for dx in range(3)):
        ref += w[..., o:o + 1] * fp[:, dy:dy + H, dx:dx + W]
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_align_feature_aggregation_module():
    rng = np.random.RandomState(2)
    sel = jnp.asarray(rng.randn(1, 8, 8, 16).astype(np.float32))
    cur = jnp.asarray(rng.randn(1, 8, 8, 16).astype(np.float32))
    m = AlignFeatureAggregation(num_channel=16, neighbor=3)
    var = m.init(jax.random.PRNGKey(0), sel, cur)
    out = m.apply(var, sel, cur)
    assert out.shape == (1, 8, 8, 16)
    assert np.isfinite(np.asarray(out)).all()
    # identical inputs with uniform weights blend to the input itself only
    # when alignment is identity-dominant; at least check self-consistency:
    out2 = m.apply(var, cur, cur)
    assert np.isfinite(np.asarray(out2)).all()
