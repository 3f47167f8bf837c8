"""FWHT / SRHT kernel tests (the reference has none for rla/srht.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.linalg import hadamard

from rla4mor_tpu.ops.fwht import fwht, hadamard_matrix, srht, srht_rows


@pytest.mark.parametrize("d", [0, 1, 2, 3, 5, 8, 9, 11])
def test_fwht_matches_hadamard(d):
    n = 1 << d
    x = np.random.RandomState(d).normal(size=(4, n))
    ref = x @ hadamard(n).T / 2 ** (d / 2)
    got = np.asarray(fwht(jnp.asarray(x)))
    assert np.allclose(ref, got, atol=1e-12)


def test_fwht_involution():
    x = np.random.RandomState(1).normal(size=(3, 256))
    y = np.asarray(fwht(fwht(jnp.asarray(x))))
    assert np.allclose(x, y, atol=1e-12)


def test_fwht_isometry():
    x = np.random.RandomState(2).normal(size=(5, 512))
    y = np.asarray(fwht(jnp.asarray(x)))
    assert np.allclose(
        np.linalg.norm(x, axis=1), np.linalg.norm(y, axis=1), rtol=1e-12
    )


def test_hadamard_matrix_sylvester():
    for d in range(5):
        assert np.allclose(np.asarray(hadamard_matrix(d)), hadamard(1 << d))


@pytest.mark.parametrize("n", [64, 100, 257])
def test_srht_apply_equals_rows(n):
    """Matrix-free apply == explicit matrix (the reference's two paths
    disagree for non-power-of-two n — rla/srht.py:171 vs embeddings.py:208;
    ours must agree always)."""
    k = 31
    key = jax.random.key(3)
    x = np.random.RandomState(4).normal(size=(6, n))
    y = np.asarray(srht(jnp.asarray(x), k, key))
    R = np.asarray(srht_rows(key, n, k))
    assert R.shape == (k, n)
    assert np.allclose(y, x @ R.T, atol=1e-12)


def test_srht_seed_determinism():
    key = jax.random.key(7)
    x = jnp.asarray(np.random.RandomState(5).normal(size=(2, 128)))
    y1 = np.asarray(srht(x, 17, key))
    y2 = np.asarray(srht(x, 17, jax.random.key(7)))
    assert np.array_equal(y1, y2)
    y3 = np.asarray(srht(x, 17, jax.random.key(8)))
    assert not np.allclose(y1, y3)


def test_srht_norm_preservation_statistics():
    """E ||S x||^2 = ||x||^2; check concentration with a large sketch."""
    key = jax.random.key(11)
    x = np.random.RandomState(6).normal(size=(1000,))
    y = np.asarray(srht(jnp.asarray(x), 4000, key))
    ratio = np.linalg.norm(y) / np.linalg.norm(x)
    assert abs(ratio - 1.0) < 0.05


def test_srht_jit():
    key = jax.random.key(0)
    f = jax.jit(lambda x: srht(x, 16, key))
    x = jnp.asarray(np.random.RandomState(7).normal(size=(3, 200)))
    assert np.allclose(np.asarray(f(x)), np.asarray(srht(x, 16, key)))
