"""Fused Pallas SRHT kernel: interpret-mode equivalence with the XLA path
(real-TPU execution is exercised by bench.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import jax.experimental.pallas as pl

import rla4mor_tpu.ops.srht_pallas as sp
from rla4mor_tpu.ops.fwht import srht


@pytest.fixture
def interpret_pallas(monkeypatch):
    orig = pl.pallas_call

    def patched(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    monkeypatch.setattr(sp.pl, "pallas_call", patched)


@pytest.mark.parametrize("m,d,k", [(5, 10, 64), (3, 13, 200), (9, 16, 150)])
def test_pallas_matches_xla(interpret_pallas, m, d, k):
    key = jax.random.key(7)
    x = jnp.asarray(
        np.random.RandomState(d).normal(size=(m, 1 << d)), dtype=jnp.float32
    )
    y1 = np.asarray(sp.srht_pallas(x, k, key))
    y2 = np.asarray(srht(x, k, key))
    assert y1.shape == (m, k)
    rel = np.abs(y1 - y2).max() / np.abs(y2).max()
    assert rel < 1e-5


def test_hadamard_rows_helper():
    from scipy.linalg import hadamard

    H = hadamard(64)
    sel = jnp.asarray([0, 5, 17, 63])
    rows = np.asarray(sp._hadamard_rows(sel, 64, jnp.float32))
    assert np.array_equal(rows, H[np.asarray(sel)])


def test_split_pqr():
    for d in (10, 12, 16, 20, 24):
        dp, dq, dr = sp._split_pqr(d)
        assert dp + dq + dr == d
        assert dr <= 12 and dq <= 8
        assert dp >= 0
    assert sp._split_pqr(24) == (5, 8, 11)


def test_onepass_xla_matches_srht():
    import jax.numpy as jnp
    from rla4mor_tpu.ops.srht_pallas import srht_onepass_xla

    key = jax.random.key(3)
    m, d, k = 4, 14, 120
    x = jnp.asarray(
        np.random.RandomState(1).normal(size=(m, 1 << d)), dtype=jnp.float32
    )
    y1 = np.asarray(srht_onepass_xla(x, k, key))
    y2 = np.asarray(srht(x, k, key))
    assert np.abs(y1 - y2).max() / np.abs(y2).max() < 1e-5
