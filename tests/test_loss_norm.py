"""Loss-weight normalization matrix (reference mg_head.py:535-578
LossNormType) — each flavor against a hand-computed tiny oracle."""
import numpy as np
import jax.numpy as jnp

from dal3d_tpu.models.losses.losses import prepare_loss_weights

# labels: 2 positives (cls 1,2), 3 negatives, 1 ignore -> cared=5
LAB = jnp.asarray([[1, 2, 0, 0, 0, -1]])
PW, NW = 1.0, 2.0
RAW_CLS = np.array([[1.0, 1.0, 2.0, 2.0, 2.0, 0.0]])
RAW_REG = np.array([[1.0, 1.0, 0.0, 0.0, 0.0, 0.0]])


def _got(norm_type):
    c, r, cared = prepare_loss_weights(LAB, PW, NW, norm_type)
    np.testing.assert_array_equal(np.asarray(cared), [[1, 1, 1, 1, 1, 0]])
    return np.asarray(c), np.asarray(r)


def test_norm_by_num_positives():
    c, r = _got("norm_by_num_positives")
    np.testing.assert_allclose(c, RAW_CLS / 2.0)
    np.testing.assert_allclose(r, RAW_REG / 2.0)


def test_norm_by_num_examples():
    c, r = _got("norm_by_num_examples")
    np.testing.assert_allclose(c, RAW_CLS / 5.0)  # cared count
    np.testing.assert_allclose(r, RAW_REG / 2.0)  # positives count


def test_norm_by_num_pos_neg():
    c, r = _got("norm_by_num_pos_neg")
    # per-anchor: positives / num_pos(2), negatives / num_neg(3), ignore / 1
    want_c = np.array([[0.5, 0.5, 2 / 3, 2 / 3, 2 / 3, 0.0]])
    np.testing.assert_allclose(c, want_c, rtol=1e-6)
    np.testing.assert_allclose(r, RAW_REG / 2.0)


def test_dont_norm():
    c, r = _got("dont_norm")
    np.testing.assert_allclose(c, RAW_CLS)  # cls untouched (ghm)
    np.testing.assert_allclose(r, RAW_REG / 2.0)


def test_no_positives_clamps():
    lab = jnp.asarray([[0, 0, -1]])
    for nt in ("norm_by_num_positives", "norm_by_num_examples",
               "norm_by_num_pos_neg", "dont_norm"):
        c, r, _ = prepare_loss_weights(lab, PW, NW, nt)
        assert np.isfinite(np.asarray(c)).all() and np.isfinite(np.asarray(r)).all()


def test_unknown_type_raises():
    import pytest

    with pytest.raises(ValueError):
        prepare_loss_weights(LAB, PW, NW, "bogus")
