"""Randomized range finder / randomized SVD (core/rsvd.py).

Oracle pattern: exact dense SVD / the method-of-snapshots ``pod`` on the
same matrices (CPU f64 via conftest).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rla4mor_tpu.core import Product, pod
from rla4mor_tpu.core.rsvd import (
    pod_randomized,
    range_finder,
    range_finder_adaptive,
    rsvd,
)


def _decaying(n, m, decay=0.5, seed=0, dtype=np.float64):
    """Matrix with geometrically decaying spectrum (known exact SVD)."""
    rng = np.random.default_rng(seed)
    r = min(n, m)
    U = np.linalg.qr(rng.standard_normal((n, r)))[0]
    V = np.linalg.qr(rng.standard_normal((m, r)))[0]
    s = decay ** np.arange(r)
    if np.issubdtype(dtype, np.complexfloating):
        U = np.linalg.qr(
            rng.standard_normal((n, r)) + 1j * rng.standard_normal((n, r))
        )[0]
        V = np.linalg.qr(
            rng.standard_normal((m, r)) + 1j * rng.standard_normal((m, r))
        )[0]
    return jnp.asarray((U * s) @ V.conj().T, dtype), s


def test_rsvd_matches_exact_svd():
    X, s_true = _decaying(200, 60)
    U, s, V = rsvd(X, rank=10, power_iters=2, seed=3)
    assert s.shape == (10,)
    np.testing.assert_allclose(np.asarray(s), s_true[:10], rtol=1e-9)
    # orthonormal factors, and the rank-10 approximation is near-optimal
    np.testing.assert_allclose(
        np.asarray(U.conj().T @ U), np.eye(10), atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(V.conj().T @ V), np.eye(10), atol=1e-12
    )
    err = np.linalg.norm(np.asarray(X - (U * s) @ V.conj().T), 2)
    opt = s_true[10]
    assert err <= 1.05 * opt + 1e-12


def test_rsvd_product_weighted_matches_pod():
    n, m, r = 80, 25, 25
    X, _ = _decaying(n, m, decay=0.7, seed=1)
    rng = np.random.default_rng(5)
    A = rng.standard_normal((n, n))
    R = Product.from_dense(A @ A.T + n * np.eye(n))
    U, s, _ = rsvd(X, rank=8, power_iters=3, product=R, seed=2)
    # R-orthonormal modes
    np.testing.assert_allclose(
        np.asarray(R.inner(U)), np.eye(8), atol=1e-10
    )
    # R-weighted singular values match the method of snapshots
    _, s_pod = pod(X, product=R, modes=8, rtol=None)
    np.testing.assert_allclose(np.asarray(s), np.asarray(s_pod)[:8],
                               rtol=1e-8)


def test_pod_randomized_contract_matches_pod():
    # exact rank-5 matrix: both PODs recover the same subspace + svals
    rng = np.random.default_rng(7)
    B = jnp.asarray(rng.standard_normal((120, 5)))
    C = jnp.asarray(rng.standard_normal((5, 40)))
    X = B @ C
    # rtol=1e-8 truncation works for the Gram-free rsvd; the
    # method-of-snapshots oracle needs rtol above its ~sqrt(eps) Gram
    # noise floor (pod docstring) to truncate at the same rank
    M_r, s_r = pod_randomized(X, modes=10, rtol=1e-8, seed=4)
    M_p, s_p = pod(X, modes=10, rtol=1e-6)
    assert M_r.shape[1] == 5 == M_p.shape[1]
    np.testing.assert_allclose(np.asarray(s_r), np.asarray(s_p)[: len(s_r)],
                               rtol=1e-6)
    # same subspace: projector difference is tiny
    Pr = np.asarray(M_r @ M_r.T)
    Pp = np.asarray(M_p @ M_p.T)
    assert np.linalg.norm(Pr - Pp, 2) < 1e-8


def test_rsvd_jits_l2_path():
    X, _ = _decaying(64, 24, seed=9)

    @jax.jit
    def f(X):
        return rsvd(X, rank=6, power_iters=1, seed=11)

    U1, s1, V1 = f(X)
    U2, s2, V2 = rsvd(X, rank=6, power_iters=1, seed=11)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(U1), np.asarray(U2), atol=1e-12)
    np.testing.assert_allclose(np.asarray(V1), np.asarray(V2), atol=1e-12)


def test_range_finder_adaptive_certifies():
    X, _ = _decaying(150, 80, decay=0.6, seed=13)
    tol = 1e-6
    Q, bound = range_finder_adaptive(X, tol=tol, block=6, seed=17)
    assert bound <= tol
    true = np.linalg.norm(
        np.asarray(X - Q @ (Q.conj().T @ X)), 2
    )
    assert true <= bound  # the probe bound really is an upper bound here
    # and the basis is not absurdly oversized: spectrum hits tol by ~28
    assert Q.shape[1] <= 48


def test_range_finder_adaptive_max_rank_stops():
    X, _ = _decaying(60, 30, decay=0.95, seed=19)  # slow decay
    Q, bound = range_finder_adaptive(X, tol=1e-14, block=8, max_rank=16,
                                     seed=23)
    assert Q.shape[1] == 16
    np.testing.assert_allclose(
        np.asarray(Q.conj().T @ Q), np.eye(16), atol=1e-10
    )


def test_rsvd_complex():
    X, s_true = _decaying(90, 40, decay=0.5, seed=29, dtype=np.complex128)
    U, s, V = rsvd(X, rank=7, power_iters=2, seed=31)
    assert U.dtype == X.dtype and V.dtype == X.dtype
    np.testing.assert_allclose(np.asarray(s), s_true[:7], rtol=1e-9)
    np.testing.assert_allclose(
        np.asarray(U.conj().T @ U), np.eye(7), atol=1e-12
    )
    err = np.linalg.norm(np.asarray(X - (U * s) @ V.conj().T), 2)
    assert err <= 1.05 * s_true[7] + 1e-12


def test_pod_greedy_randomized_pod_runs():
    # smoke: the pod_method="randomized" wiring produces a working ROM
    from rla4mor_tpu.models import (
        InstationaryReductor,
        instationary_thermal_block,
        pod_greedy,
    )
    from rla4mor_tpu.ops.embeddings import GaussianEmbedding

    fom = instationary_thermal_block(grid_shape=(2, 2), num_intervals=8,
                                     nt=6)
    emb = GaussianEmbedding.make(fom.solution_dim, range_dim=40, seed=0)
    red = InstationaryReductor(fom, embedding=emb, log_level=30)
    mus = fom.parameter_space.sample_randomly(5, key=3)
    rom, hist = pod_greedy(fom, red, mus, max_extensions=4,
                           pod_method="randomized", log_level=30)
    mu = mus[1]
    rec = red.reconstruct(rom.solve(mu))
    tr = fom.solve(mu)
    rel = float(jnp.linalg.norm(rec - tr) / jnp.linalg.norm(tr))
    assert rel < 0.2
