"""Property-based tests (hypothesis) for the affine calculus and kernels.

These check algebraic identities on randomized shapes/values — the class
of bug oracle tests with fixed shapes can miss (broadcasting, conjugation,
axis mixups)."""

import jax
import jax.numpy as jnp
import numpy as np
from hypothesis import given, settings, strategies as st

from rla4mor_tpu.core import AffineDense, ProjectionCoefficient, project
from rla4mor_tpu.ops.fwht import fwht, srht, srht_rows

common = dict(deadline=None, max_examples=15)


def _aff(seed, T, k, m):
    rng = np.random.RandomState(seed)
    return AffineDense(
        jnp.asarray(rng.normal(size=(T, k, m))),
        tuple(ProjectionCoefficient("p", i) for i in range(T)),
    )


@settings(**common)
@given(st.integers(1, 4), st.integers(1, 9), st.integers(1, 9),
       st.integers(0, 10_000))
def test_affine_adjoint_identity(T, k, m, seed):
    """<A(mu) x, y> == <x, A(mu)^H y> for all shapes."""
    op = _aff(seed, T, k, m)
    rng = np.random.RandomState(seed + 1)
    mu = {"p": jnp.asarray(rng.uniform(size=T))}
    x = jnp.asarray(rng.normal(size=m))
    y = jnp.asarray(rng.normal(size=k))
    lhs = float(jnp.vdot(op.apply(x, mu), y))
    rhs = float(jnp.vdot(x, op.apply_adjoint(y, mu)))
    assert np.isclose(lhs, rhs, rtol=1e-10, atol=1e-12)


@settings(**common)
@given(st.integers(1, 3), st.integers(2, 8), st.integers(2, 8),
       st.integers(1, 6), st.integers(1, 6), st.integers(0, 10_000))
def test_project_composition_identity(T, k, m, kv, kw, seed):
    """project(op, V, W).assemble == V^H op(mu) W for random bases."""
    op = _aff(seed, T, k, m)
    rng = np.random.RandomState(seed + 2)
    mu = {"p": jnp.asarray(rng.uniform(size=T))}
    V = rng.normal(size=(k, kv))
    W = rng.normal(size=(m, kw))
    got = np.asarray(project(op, jnp.asarray(V), jnp.asarray(W)).assemble(mu))
    want = V.T @ np.asarray(op.assemble(mu)) @ W
    assert np.allclose(got, want, atol=1e-10)


@settings(**common)
@given(st.integers(1, 9), st.integers(0, 10_000))
def test_fwht_parseval(d, seed):
    """Normalized FWHT preserves l2 norms (Parseval)."""
    n = 1 << d
    x = np.random.RandomState(seed).normal(size=(2, n))
    y = np.asarray(fwht(jnp.asarray(x)))
    assert np.allclose(np.linalg.norm(x, axis=1), np.linalg.norm(y, axis=1),
                       rtol=1e-10)


@settings(**common)
@given(st.integers(3, 200), st.integers(1, 64), st.integers(0, 10_000))
def test_srht_linear_and_matrix_consistent(n, k, seed):
    """SRHT is linear and equals its explicit matrix for any (n, k)."""
    key = jax.random.key(seed)
    rng = np.random.RandomState(seed)
    x = rng.normal(size=(2, n))
    a = 1.7
    y1 = np.asarray(srht(jnp.asarray(a * x), k, key))
    y2 = a * np.asarray(srht(jnp.asarray(x), k, key))
    assert np.allclose(y1, y2, rtol=1e-9, atol=1e-12)
    R = np.asarray(srht_rows(key, n, k))
    assert np.allclose(np.asarray(srht(jnp.asarray(x), k, key)), x @ R.T,
                       atol=1e-10)


@settings(**common)
@given(st.integers(0, 9000), st.integers(1, 9000), st.integers(0, 10_000))
def test_gaussian_cols_any_offset_is_canonical_slice(c0, width, seed):
    """ANY (c0, width) strip — aligned, sub-tile, tile-crossing — is a
    literal slice of the canonical Gaussian (covering-tile general path;
    fuzzes the round-2 alignment fix)."""
    from rla4mor_tpu.ops.seeding import gaussian_cols_unscaled, gaussian_rows

    key = jax.random.key(seed)
    k = 16
    full = np.asarray(gaussian_rows(key, c0 + width, 0, k, jnp.float64))
    strip = np.asarray(
        gaussian_cols_unscaled(key, k, c0, width, jnp.float64)
    )
    assert np.array_equal(strip, full[:, c0:c0 + width])
