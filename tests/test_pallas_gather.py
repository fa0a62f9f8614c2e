"""Pallas row-gather / fused gather-GEMM kernels (interpret mode on CPU;
the same kernels compile and validate on the real chip — measured round-1:
correct, but 28.5 ns/row vs XLA's 8.3 ns/row, see ROADMAP.md P1)."""
import numpy as np
import jax
import jax.numpy as jnp

from dal3d_tpu.ops.pallas_gather import gather_gemm_pallas, gather_rows
from dal3d_tpu.ops.sparse import gather_gemm
import pytest

pytestmark = pytest.mark.slow


def test_gather_rows_matches_take():
    rng = np.random.RandomState(0)
    N, C, M = 1000, 16, 2048
    tbl = rng.randn(N, C).astype(np.float32)
    idx = rng.randint(0, N, M).astype(np.int32)
    out = gather_rows(jnp.asarray(tbl), jnp.asarray(idx), interpret=True)
    np.testing.assert_array_equal(np.asarray(out), tbl[idx])


def test_gather_gemm_pallas_matches_xla():
    rng = np.random.RandomState(1)
    B, N, Cin, K, M, Cout = 2, 600, 16, 5, 1500, 32  # M not tile-aligned
    feats = rng.randn(B, N, Cin).astype(np.float32)
    idx = rng.randint(0, N, (B, K, M)).astype(np.int32)
    hit = rng.rand(B, K, M) > 0.4
    w = (rng.randn(K, Cin, Cout) * 0.1).astype(np.float32)
    out = gather_gemm_pallas(
        jnp.asarray(feats), jnp.asarray(idx), jnp.asarray(hit), jnp.asarray(w),
        block_m=512, interpret=True,
    )
    ref = gather_gemm(jnp.asarray(feats), jnp.asarray(idx), jnp.asarray(hit), jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)
