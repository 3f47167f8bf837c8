"""Complex-valued problems through the full stack (the reference supports
complex128 throughout: c16 numba signatures rla/srht.py:14,39, a=2 factors
in the oblivious-dimension bounds rla/embeddings.py:243)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sps

from rla4mor_tpu.core import (
    AffineOp,
    DenseOp,
    HostSparseOp,
    ParameterSpace,
    Product,
    ProjectionCoefficient,
    gram_schmidt,
)
from rla4mor_tpu.models import StationaryFOM
from rla4mor_tpu.mor import SketchedReductor
from rla4mor_tpu.ops import GaussianEmbedding, SrhtEmbedding, gaussian_dim


def _complex_fom(n=80, seed=0):
    """A(mu) = A0 + mu_0 A1 with Hermitian positive definite terms."""
    rng = np.random.RandomState(seed)

    def hpd(scale):
        M = rng.normal(size=(n, n)) + 1j * rng.normal(size=(n, n))
        return sps.csr_matrix(M @ M.conj().T / n + scale * np.eye(n))

    A0, A1 = hpd(3.0), hpd(1.0)
    b = rng.normal(size=(n, 1)) + 1j * rng.normal(size=(n, 1))
    op = AffineOp(
        (HostSparseOp(A0), HostSparseOp(A1)),
        (ProjectionCoefficient("p", 0), ProjectionCoefficient("p", 1)),
    )
    rhs = AffineOp((DenseOp(jnp.asarray(b)),))
    space = ParameterSpace.make({"p": 2}, 0.5, 2.0)
    return StationaryFOM(op, rhs, parameter_space=space), (A0, A1, b)


def test_complex_fom_solve():
    fom, (A0, A1, b) = _complex_fom()
    mu = {"p": jnp.asarray([1.3, 0.7])}
    u = np.asarray(fom.solve(mu))
    A = 1.3 * A0 + 0.7 * A1
    assert np.linalg.norm(A @ u - b[:, 0]) < 1e-10


def test_complex_gram_schmidt():
    rng = np.random.RandomState(1)
    U = jnp.asarray(rng.normal(size=(40, 6)) + 1j * rng.normal(size=(40, 6)))
    Q, R = gram_schmidt(U, return_R=True)
    G = np.asarray(Q).conj().T @ np.asarray(Q)
    assert np.allclose(G, np.eye(6), atol=1e-10)
    assert np.allclose(np.asarray(Q) @ np.asarray(R), np.asarray(U), atol=1e-10)


@pytest.mark.parametrize("emb_cls", [GaussianEmbedding, SrhtEmbedding])
def test_complex_embedding_apply(emb_cls):
    rng = np.random.RandomState(2)
    n, k = 64, 20
    e = emb_cls.make(n, range_dim=k, seed=4)
    x = jnp.asarray(rng.normal(size=(n, 3)) + 1j * rng.normal(size=(n, 3)))
    y = np.asarray(e.apply(x))
    M = np.asarray(e.matrix())
    assert np.allclose(y, M @ np.asarray(x), atol=1e-10)
    assert y.dtype == np.complex128


def test_complex_sketched_reductor():
    fom, (A0, A1, b) = _complex_fom()
    n = fom.solution_dim
    theta = GaussianEmbedding.make(n, range_dim=60, seed=5)
    red = SketchedReductor(fom, embedding_primal=theta, orthonormalize=True)
    mus = fom.parameter_space.sample_randomly(6, key=0)
    red.extend_basis(fom.solve_many(mus))
    rom = red.reduce(seed=6)

    mu = fom.parameter_space.sample_randomly(1, key=1)[0]
    y = np.asarray(rom.solve(mu))
    u_rom = np.asarray(red.rb) @ y
    u_fom = np.asarray(fom.solve(mu))
    rel = np.linalg.norm(u_rom - u_fom) / np.linalg.norm(u_fom)
    assert rel < 5e-2
    est = float(rom.estimate_error(mu))
    A = float(np.asarray(mu["p"])[0]) * A0 + float(np.asarray(mu["p"])[1]) * A1
    res = np.linalg.norm(A @ u_rom - b[:, 0])
    # estimator ~ l2 residual norm up to embedding distortion
    assert 0.2 * res < est < 5 * res + 1e-12


def test_complex_oblivious_dim():
    assert gaussian_dim(0.5, 1e-3, 8, complex_dtype=True) > gaussian_dim(
        0.5, 1e-3, 8, complex_dtype=False
    )


def test_helmholtz_end_to_end():
    """Damped Helmholtz (REAL matrices, COMPLEX parametric coefficient —
    the round-2 _cast_theta case) through the full sketched stack:
    assemble == dense oracle, minres ROM accurate across resonances,
    sketched estimator brackets the true Riesz residual."""
    from rla4mor_tpu.models import helmholtz_fom

    fom = helmholtz_fom(num_intervals=16, wavenumber_range=(2.0, 10.0),
                        damping=0.5)
    Ru = fom.h1_0_product
    mu = {"wavenumber": jnp.asarray([7.3])}

    # assembly: complex coefficient must not be truncated
    A = fom.assemble_sparse(mu).toarray()
    K = fom.operator.terms[0].S.toarray()
    M = fom.operator.terms[1].S.toarray()
    k = 7.3
    assert np.allclose(A, K + (-(k ** 2) + 0.5j * k) * M, atol=1e-12)
    u = np.asarray(fom.solve(mu))
    assert np.iscomplexobj(u)
    assert np.linalg.norm(A @ u - np.asarray(fom.assemble_rhs(mu))) < 1e-10

    # sketched minres RB over the wavenumber sweep
    from rla4mor_tpu.mor import SketchedReductor

    theta_emb = GaussianEmbedding.make(
        fom.solution_dim, sqrt_product=Ru.sqrt, range_dim=220, seed=2,
        complex_dtype=True,
    )
    phi = GaussianEmbedding.make(220, range_dim=120, seed=33)
    red = SketchedReductor(fom, embedding_primal=theta_emb,
                           embedding_online=phi, product=Ru,
                           orthonormalize=True, projection="minres",
                           log_level=30)
    mus = fom.parameter_space.sample_randomly(10, key=4)
    red.extend_basis(fom.solve_many(mus))
    rom = red.reduce(seed=9)
    for mu_t in fom.parameter_space.sample_randomly(3, key=8):
        u_t = np.asarray(fom.solve(mu_t))
        u_r = np.asarray(red.rb) @ np.asarray(rom.solve(mu_t))
        rel = float(Ru.norm(jnp.asarray(u_t - u_r))) / float(
            Ru.norm(jnp.asarray(u_t)))
        assert rel < 5e-2, rel
        est = float(np.asarray(rom.estimate_error(mu_t)))
        r = fom.assemble_sparse(mu_t) @ u_r - np.asarray(
            fom.assemble_rhs(mu_t))
        true_res = float(np.sqrt(np.real(
            np.vdot(r, np.asarray(Ru.inv.apply(jnp.asarray(r)))))))
        assert 0.3 * true_res < est < 3.0 * true_res, (est, true_res)
