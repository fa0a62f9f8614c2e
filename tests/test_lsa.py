"""On-device Jonker-Volgenant assignment vs the scipy oracle.

Reference behavior: bevfusion mmdet3d/core/bbox/assigners/
hungarian_assigner.py:120-124 (scipy.optimize.linear_sum_assignment on the
matching cost). Our solver must reach the identical optimal total cost.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment as sp_lsa

from dal3d_tpu.ops.lsa import linear_sum_assignment


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_matches_scipy_optimal_cost(seed):
    rng = np.random.RandomState(seed)
    f = jax.jit(linear_sum_assignment)
    for _ in range(8):
        G = rng.randint(1, 40)
        P = rng.randint(G, 250)
        c = rng.randn(G, P).astype(np.float32) * rng.uniform(0.1, 100)
        col = np.asarray(f(jnp.asarray(c)))
        assert len(set(col.tolist())) == G  # distinct columns
        r, cc = sp_lsa(c)
        np.testing.assert_allclose(
            c[np.arange(G), col].sum(), c[r, cc].sum(), rtol=1e-5
        )


def test_square_and_degenerate():
    f = jax.jit(linear_sum_assignment)
    # square identity-ish problem: diagonal is cheapest
    c = np.full((4, 4), 10.0, np.float32) - 9 * np.eye(4, dtype=np.float32)
    np.testing.assert_array_equal(np.asarray(f(jnp.asarray(c))), np.arange(4))
    # single row picks the argmin column
    c1 = np.array([[3.0, 1.0, 2.0]], np.float32)
    assert int(f(jnp.asarray(c1))[0]) == 1


def test_constant_padding_rows_do_not_perturb_valid_rows():
    rng = np.random.RandomState(7)
    c = rng.randn(6, 50).astype(np.float32)
    padded = np.concatenate([c, np.full((4, 50), 1e6, np.float32)])
    col_small = np.asarray(linear_sum_assignment(jnp.asarray(c)))
    col_pad = np.asarray(linear_sum_assignment(jnp.asarray(padded)))[:6]
    np.testing.assert_allclose(
        c[np.arange(6), col_pad].sum(), c[np.arange(6), col_small].sum(), rtol=1e-5
    )


def test_more_rows_than_columns():
    rng = np.random.RandomState(11)
    f = jax.jit(linear_sum_assignment)
    for _ in range(10):
        G = rng.randint(5, 60)
        P = rng.randint(1, G)
        c = rng.randn(G, P).astype(np.float32) * 10
        col = np.asarray(f(jnp.asarray(c)))
        matched = col >= 0
        assert matched.sum() == P  # min(G, P) pairs, like scipy
        assert len(set(col[matched].tolist())) == P
        r, cc = sp_lsa(c)
        np.testing.assert_allclose(
            c[matched, col[matched]].sum(), c[r, cc].sum(), rtol=1e-5
        )


def test_vmap_batched():
    rng = np.random.RandomState(3)
    cb = rng.randn(4, 16, 120).astype(np.float32)
    colb = np.asarray(jax.jit(jax.vmap(linear_sum_assignment))(jnp.asarray(cb)))
    for b in range(4):
        r, cc = sp_lsa(cb[b])
        np.testing.assert_allclose(
            cb[b][np.arange(16), colb[b]].sum(), cb[b][r, cc].sum(), rtol=1e-5
        )
