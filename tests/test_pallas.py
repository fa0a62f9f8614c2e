"""Pallas kernels vs jnp oracles (interpret mode on CPU)."""
import numpy as np
import jax.numpy as jnp

from dal3d_tpu.ops.distance import pairwise_l1, pairwise_l2
from dal3d_tpu.ops.pallas_distance import pairwise_l1_pallas, pairwise_l2_pallas
import pytest

pytestmark = pytest.mark.slow


def test_pallas_l1_matches():
    rng = np.random.RandomState(0)
    x = rng.randn(300, 96).astype(np.float32)
    y = rng.randn(200, 96).astype(np.float32)
    ref = np.asarray(pairwise_l1(jnp.asarray(x), jnp.asarray(y)))
    got = np.asarray(pairwise_l1_pallas(jnp.asarray(x), jnp.asarray(y), interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_pallas_l2_matches():
    rng = np.random.RandomState(1)
    x = rng.randn(260, 128).astype(np.float32)
    y = rng.randn(260, 128).astype(np.float32)
    ref = np.asarray(pairwise_l2(jnp.asarray(x), jnp.asarray(y)))
    got = np.asarray(pairwise_l2_pallas(jnp.asarray(x), jnp.asarray(y), interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-3)


def test_pallas_l1_large_c():
    rng = np.random.RandomState(2)
    x = rng.randn(64, 512).astype(np.float32)
    ref = np.asarray(pairwise_l1(jnp.asarray(x), jnp.asarray(x)))
    got = np.asarray(pairwise_l1_pallas(jnp.asarray(x), jnp.asarray(x), interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)
