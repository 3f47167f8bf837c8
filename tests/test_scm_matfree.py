"""Matrix-free SCM (mor/scm_matfree.py): LOBPCG oracle equality and
matrix-free == dense SCM on the stencil thermal block.

Oracle pattern (reference preconditioners/tests.py style): the device
LOBPCG must match dense generalized ``eigh``; the matrix-free SCM must
match the dense :class:`ScmHermitian` built from identity-densified
stencil terms restricted to interior nodes (the established stencil
oracle mapping, tests/test_stencil_advection.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.linalg as sla

from rla4mor_tpu.mor.scm import ScmHermitian
from rla4mor_tpu.mor.scm_matfree import (
    MatrixFreeScmCoercivity,
    lobpcg_gen,
    spectral_interval,
)


@pytest.fixture(scope="module")
def random_pencil():
    rng = np.random.RandomState(0)
    n = 120
    Q = sla.qr(rng.standard_normal((n, n)))[0]
    R = Q @ np.diag(rng.uniform(0.5, 50, n)) @ Q.T
    T = rng.standard_normal((n, n))
    T = 0.5 * (T + T.T)
    return jnp.asarray(T), jnp.asarray(R), sla.eigh(T, R, eigvals_only=True)


def test_lobpcg_gen_matches_dense(random_pencil):
    """Smallest-k eigenpairs == dense eigh; enclosure radii tiny and on
    the safe side."""
    Tj, Rj, truth = random_pencil
    n = Tj.shape[0]
    dinv = 1.0 / jnp.diag(Rj)
    res = lobpcg_gen(
        lambda U: Tj @ U, lambda U: Rj @ U, n, k=2, block=4,
        precond=lambda U: U * dinv[:, None], iters=400, tol=1e-10,
    )
    assert res.converged
    np.testing.assert_allclose(res.values, truth[:2], rtol=1e-9,
                               atol=1e-11)
    assert np.all(res.radii < 1e-7)
    # enclosure is on the safe side of the truth
    assert res.values[0] - res.radii[0] <= truth[0] + 1e-12
    # Ritz vectors are R-orthonormal eigenvectors: residual check
    X = np.asarray(res.vectors)
    r = np.asarray(Tj) @ X - np.asarray(Rj) @ X * res.values[None, :]
    assert np.linalg.norm(r, axis=0).max() < 1e-7


def test_spectral_interval_encloses(random_pencil):
    Tj, Rj, truth = random_pencil
    n = Tj.shape[0]
    dinv = 1.0 / jnp.diag(Rj)
    lo, hi, lo_res, hi_res = spectral_interval(
        lambda U: Tj @ U, lambda U: Rj @ U, n, block=4,
        precond=lambda U: U * dinv[:, None], iters=400, tol=1e-10,
    )
    assert lo <= truth[0] <= truth[-1] <= hi
    assert abs(lo - truth[0]) < 1e-8 and abs(hi - truth[-1]) < 1e-8


def _interior_densify(fom):
    """Dense (sym term matrices, R) restricted to interior nodes — the
    stencil-oracle mapping."""
    from rla4mor_tpu.models.stencil import interior_mask

    aff = fom.affine_operator()
    n = aff.source_dim
    eye = jnp.eye(n, dtype=jnp.float64)
    interior = np.flatnonzero(
        np.asarray(interior_mask(fom.n_nodes, jnp.float64)).reshape(-1)
    )
    ix = np.ix_(interior, interior)
    terms = []
    for t in aff.terms:
        T = np.asarray(t.apply(eye))
        TH = np.asarray(t.apply_adjoint(eye))
        terms.append((0.5 * (T + TH.conj().T))[ix])
    R = np.zeros((n, n))
    for j in range(n):
        g = np.zeros(n)
        g[j] = 1.0
        R[:, j] = np.asarray(
            fom.product_apply(jnp.asarray(g).reshape(fom.solution_shape))
        ).reshape(-1)
    return terms, R[ix], aff, interior


@pytest.fixture(scope="module")
def stencil_pair():
    """(matrix-free SCM over the stencil FOM, dense SCM over the
    interior-restricted densification, shared theta_fn, mus)."""
    from rla4mor_tpu.models.stencil import StencilThermalBlock

    fom = StencilThermalBlock(grid_shape=(2, 2), num_intervals=32,
                              dtype=jnp.float64)
    terms_d, R_d, aff, interior = _interior_densify(fom)

    from rla4mor_tpu.core.parameters import eval_coefficients

    coeffs = tuple(aff.coefficients)

    def theta_fn(mu):
        return np.asarray(eval_coefficients(coeffs, mu), np.float64)

    dense = ScmHermitian(terms_d, theta_fn, R_d)
    mf = MatrixFreeScmCoercivity(fom, tol=1e-10, iters=500, log_level=30)

    rng = np.random.RandomState(7)
    mus = [{"diffusion": jnp.asarray(rng.uniform(0.1, 1.0, 4))}
           for _ in range(10)]
    return mf, dense, mus


def test_matrixfree_box_equals_dense(stencil_pair):
    """Per-term spectral boxes match the dense generalized eigh to 1e-8
    and enclose it (safe side)."""
    mf, dense, _ = stencil_pair
    for (mlo, mhi), (dlo, dhi) in zip(mf.box, dense.box):
        assert abs(mlo - dlo) < 1e-8 and abs(mhi - dhi) < 1e-8
        assert mlo <= dlo + 1e-12 and mhi >= dhi - 1e-12


def test_matrixfree_alpha_exact_equals_dense(stencil_pair):
    """Anchor eigensolves match dense (value to 1e-8, y* to 1e-6) and
    err on the safe side."""
    mf, dense, mus = stencil_pair
    for mu in mus[:3]:
        a_mf, y_mf = mf.alpha_exact(mu)
        a_d, y_d = dense.alpha_exact(mu)
        assert abs(a_mf - a_d) < 1e-8
        assert a_mf <= a_d + 1e-12  # safe side
        # y* need not match when the minimal eigenvalue is degenerate —
        # but both must satisfy theta . y* >= alpha (membership in Y)
        th = dense._theta(mu)
        assert th @ y_mf >= a_d - 1e-10
        np.testing.assert_allclose(th @ y_mf, th @ y_d, atol=1e-8)


def test_matrixfree_scm_bounds_equal_dense(stencil_pair):
    """After fitting BOTH on the same anchors: lower/upper bounds match
    the dense SCM to 1e-7, and rigor holds against the dense truth."""
    mf, dense, mus = stencil_pair
    # identical anchor sets (bypass greedy to avoid tie-breaking noise)
    for mu in mus[:4]:
        mf.add_anchor(mu)
        dense.add_anchor(mu)
    for mu in mus[4:]:
        lb_m, ub_m = mf.lower(mu), mf.upper(mu)
        lb_d, ub_d = dense.lower(mu), dense.upper(mu)
        assert abs(lb_m - lb_d) < 1e-7, (lb_m, lb_d)
        assert abs(ub_m - ub_d) < 1e-7, (ub_m, ub_d)
        # rigor vs dense truth: LB <= alpha_true <= UB
        a_true, _ = dense.alpha_exact(mu)
        assert lb_m <= a_true + 1e-9
        assert ub_m >= a_true - 1e-9
        # min-theta is sharp for this family: alpha_true = min(theta)
        assert abs(a_true - float(np.min(dense._theta(mu)))) < 1e-9


def test_matrixfree_scm_greedy_fit_certifies(stencil_pair):
    """The inherited greedy fit certifies the gap on a fresh instance
    and the result is a positive coercivity lower bound usable as a
    ``coercivity`` callable (mor.bounds protocol)."""
    from rla4mor_tpu.models.stencil import StencilThermalBlock

    fom = StencilThermalBlock(grid_shape=(2, 2), num_intervals=32,
                              dtype=jnp.float64)
    mf = MatrixFreeScmCoercivity(fom, tol=1e-9, iters=500, log_level=30)
    rng = np.random.RandomState(11)
    train = [{"diffusion": jnp.asarray(rng.uniform(0.1, 1.0, 4))}
             for _ in range(12)]
    hist = mf.fit(train, tol=0.1, max_anchors=10)
    assert hist["max_gap"][-1] <= 0.1
    for mu in train[:4]:
        lb = mf(mu)  # __call__ = lower
        assert 0 < lb <= float(np.min(np.asarray(mu["diffusion"]))) + 1e-8


def test_matrixfree_scm_advection_diffusion():
    """Non-SPD family: sym A(mu) = eps K (advection is anti-symmetric),
    so alpha_true = eps in the K-metric. The matrix-free SCM must
    certify it: LB <= eps <= UB, LB > 0 after one anchor."""
    from rla4mor_tpu.models.stencil_advection import StencilAdvectionDiffusion

    fom = StencilAdvectionDiffusion(num_intervals=32, dtype=jnp.float64)
    mf = MatrixFreeScmCoercivity(fom, tol=1e-9, iters=500, log_level=30)
    mf.add_anchor({"eps": jnp.asarray([0.3]),
                   "velocity": jnp.asarray([0.5, -0.5])})
    for eps in (0.05, 0.4, 1.0):
        mu = {"eps": jnp.asarray([eps]),
              "velocity": jnp.asarray([0.7, 0.2])}
        lb, ub = mf.lower(mu), mf.upper(mu)
        assert lb <= eps * (1 + 1e-8) + 1e-10
        assert ub >= eps * (1 - 1e-8) - 1e-10
        assert lb > 0
        assert abs(lb - eps) < 1e-6  # sharp here: boxes pin K to [1,1]


def test_lobpcg_refuses_silently_truncated_dtype():
    """Without x64 a requested f64 would silently run in f32 and the
    f32-evaluated Bauer-Fike radii can UNDERESTIMATE the enclosure
    (measured on TPU: 2.5e-5 reported vs 7.9e-5 honest) — the guard
    must refuse before any work."""
    import jax

    with jax.enable_x64(False):
        with pytest.raises(ValueError, match="enable_x64"):
            lobpcg_gen(lambda U: U, lambda U: U, 8, dtype=jnp.float64)


def test_two_stage_solver_matches_dense(random_pencil):
    """lobpcg_gen_two_stage (f32 warm start + scoped-x64 f64 polish, the
    TPU recipe) reaches the same eigenpair/enclosure quality as the
    plain f64 solve."""
    from rla4mor_tpu.mor.scm_matfree import lobpcg_gen_two_stage

    Tj, Rj, truth = random_pencil
    n = Tj.shape[0]
    dinv = 1.0 / jnp.diag(Rj)
    res = lobpcg_gen_two_stage(
        lambda U: Tj.astype(U.dtype) @ U, lambda U: Rj.astype(U.dtype) @ U,
        n, k=1, block=4, precond=lambda U: U * dinv.astype(U.dtype)[:, None],
        iters=400, tol=1e-10, f32_iters=60,
    )
    assert res.converged
    np.testing.assert_allclose(res.values, truth[:1], rtol=1e-9, atol=1e-11)
    assert res.radii[0] < 1e-7
    assert res.values[0] - res.radii[0] <= truth[0] + 1e-12


def test_radius_rsolve_guard_refuses_unconverged():
    """An inexact Bauer-Fike R-solve LOWER-bounds ||r||_{R^-1}
    (Cauchy-Schwarz) — an invalid enclosure. lobpcg_gen must refuse when
    the radius CG cannot converge, and identity_R must bypass the solve
    exactly when R = I."""
    rng = np.random.RandomState(3)
    n = 60
    Q = sla.qr(rng.standard_normal((n, n)))[0]
    # ill-conditioned R so a 1-iteration CG cannot converge
    R = Q @ np.diag(np.geomspace(1e-6, 1.0, n)) @ Q.T
    T = rng.standard_normal((n, n))
    T = jnp.asarray(0.5 * (T + T.T))
    Rj = jnp.asarray(R)
    with pytest.raises(ValueError, match="Bauer-Fike R-solve"):
        lobpcg_gen(lambda U: T @ U, lambda U: Rj @ U, n, iters=3,
                   tol=1e-10, rsolve_maxiter=1)
    # identity metric: exact radii with zero inner iterations
    res = lobpcg_gen(lambda U: T @ U, lambda U: U, n, iters=300,
                     tol=1e-10, identity_R=True, rsolve_maxiter=0)
    truth = sla.eigh(np.asarray(T), eigvals_only=True)
    np.testing.assert_allclose(res.values, truth[:1], rtol=1e-9, atol=1e-10)
    assert res.radii[0] < 1e-7


def test_l2_interior_scm_advection_oracle():
    """The pod-scale certification recipe (large_scale_demo --bounds):
    l2-metric two-stage SCM over the advection family. sym A(mu) =
    eps K with the advection terms exactly anti-symmetric (boxes pin to
    [0, 0]), so alpha_l2(mu) = eps * lambda_min(K, I | interior); the LP
    must certify it sharply and on the safe side."""
    from rla4mor_tpu.models.stencil import interior_mask
    from rla4mor_tpu.models.stencil_advection import (
        StencilAdvectionDiffusion,
    )
    from rla4mor_tpu.mor.scm_matfree import l2_interior_scm

    fom = StencilAdvectionDiffusion(num_intervals=16, dtype=jnp.float64)
    mu_ref = {"eps": jnp.asarray([1.0]), "velocity": jnp.asarray([0.0, 0.0])}
    scm = l2_interior_scm(fom, mu_ref, two_stage=True, tol=1e-9,
                          iters=400, log_level=30)
    for lo, hi in scm.box[1:]:
        assert lo == 0.0 and hi == 0.0  # advection syms vanish exactly
    scm.add_anchor(mu_ref)

    # dense oracle: lambda_min(K, I) on interior nodes
    n = fom.n_nodes ** 2
    eye = np.eye(n)
    K = np.column_stack([
        np.asarray(fom.apply_term(
            0, jnp.asarray(eye[:, j]).reshape(fom.solution_shape)
        )).reshape(-1) for j in range(n)
    ])
    interior = np.flatnonzero(
        np.asarray(interior_mask(fom.n_nodes, jnp.float64)).reshape(-1)
    )
    Ki = K[np.ix_(interior, interior)]
    lam = sla.eigh(0.5 * (Ki + Ki.T), eigvals_only=True)[0]
    for eps in (0.05, 0.4, 1.0):
        mu = {"eps": jnp.asarray([eps]),
              "velocity": jnp.asarray([0.7, -0.3])}
        lb = scm.lower(mu)
        assert lb <= eps * lam + 1e-10          # safe
        assert abs(lb - eps * lam) < 1e-7 * lam  # sharp (enclosure radius)
        assert lb > 0
