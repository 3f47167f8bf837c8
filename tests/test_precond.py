"""Oracle tests of the preconditioner machinery (BASELINE config 3).

Mirror of the reference's five oracle tests (preconditioners/tests.py:
test_hs_estimators :31, test_galerkin :60, test_residual :101,
test_galerkin_stable :151, test_residual_stable :193): every sketched
quantity is recomputed by direct dense composition. Seeded throughout
(the reference's tests are unseeded / flaky by tolerance)."""

import jax.numpy as jnp
import numpy as np
import pytest

from rla4mor_tpu.core import (
    HostLUInverse,
    Product,
    estimate_image,
    gram_schmidt,
)
from rla4mor_tpu.models import ThermalBlockFOM
from rla4mor_tpu.ops import (
    BlockGaussianEmbedding,
    GaussianEmbedding,
    VectorizedEmbedding,
)
from rla4mor_tpu.precond import PreconditionedReductor

K = 10  # embedding dimension for the HS estimators


class Setup:
    def __init__(self):
        fom = ThermalBlockFOM((2, 2), 12)
        self.fom = fom
        n = fom.solution_dim
        self.Ru = fom.h1_0_product
        Qu = self.Ru.sqrt
        space = fom.parameter_space

        mus = space.sample_randomly(10, key=0)
        U = fom.solve_many(mus)
        self.u_basis = gram_schmidt(U, product=self.Ru)
        r = self.u_basis.shape[1]
        self.r = r

        self.n_precond = 3
        self.mu_precond = space.sample_randomly(self.n_precond, key=1)
        self.P_ops = [
            HostLUInverse(fom.assemble_sparse(mu)) for mu in self.mu_precond
        ]

        def vec_emb(k_omega, k_sigma, seed):
            inner = BlockGaussianEmbedding.make(
                k_omega * k_sigma, range_dim=K, seed=seed, max_block_size=32
            )
            return VectorizedEmbedding(embedding=inner, rows=k_omega, cols=k_sigma)

        self.sigma = {
            "u_u": GaussianEmbedding.make(n, sqrt_product=Qu, range_dim=K, seed=10),
            "u_ur": GaussianEmbedding.make(n, sqrt_product=Qu, range_dim=K, seed=11),
            "ur_ur": GaussianEmbedding.make(r, range_dim=K, seed=12),
        }
        self.omega = {
            "u_u": BlockGaussianEmbedding.make(
                n, sqrt_product=Qu, range_dim=K, seed=20, max_block_size=2
            ),
            "u_ur": GaussianEmbedding.make(r, range_dim=K, seed=21),
            "ur_ur": GaussianEmbedding.make(r, range_dim=K, seed=22),
        }
        self.gamma = {
            "u_u": vec_emb(K, K, 30),
            "u_ur": vec_emb(K, K, 31),
            "ur_ur": vec_emb(K, K, 32),
        }
        self.theta = GaussianEmbedding.make(
            n, sqrt_product=Qu, range_dim=200, seed=40
        )
        self.intermediate_bases = {
            "lhs": estimate_image(
                (fom.operator,), (), self.u_basis, product=self.Ru
            ),
            "rhs": estimate_image((), (fom.rhs,), None, product=self.Ru),
        }

    def make_reductor(self, stable):
        s = self
        red = PreconditionedReductor(
            fom=s.fom,
            reduced_basis=s.u_basis,
            source_bases={"u_ur": None, "ur_ur": s.u_basis, "u_u": None},
            range_bases={"u_ur": s.u_basis, "ur_ur": s.u_basis, "u_u": None},
            source_embeddings=s.sigma,
            range_embeddings=s.omega,
            vec_embeddings=s.gamma,
            residual_embedding=s.theta,
            intermediate_bases=s.intermediate_bases if stable else None,
            product=s.Ru,
            stable_galerkin=stable,
            log_level=30,
        )
        for mu, P in zip(s.mu_precond, s.P_ops):
            red.add_preconditioner(P, mu=mu)
        return red

    # dense hand tools ------------------------------------------------------
    def A_dense(self, mu):
        return self.fom.assemble_sparse(mu).toarray()

    def P_apply(self, X, y):
        X = jnp.asarray(X)
        out = 0.0
        for yi, P in zip(np.asarray(y), self.P_ops):
            out = out + yi * np.asarray(P.apply(X))
        return out

    def mu_p(self, key_mu=5, key_y=6):
        mu = self.fom.parameter_space.sample_randomly(1, key=key_mu)[0]
        y = np.random.RandomState(key_y).normal(size=self.n_precond)
        return {**mu, "precond": jnp.asarray(y)}


@pytest.fixture(scope="module")
def setup():
    return Setup()


@pytest.fixture(scope="module")
def reductor(setup):
    return setup.make_reductor(stable=False)


@pytest.fixture(scope="module")
def reductor_stable(setup):
    return setup.make_reductor(stable=True)


def _hand_hs(setup, key, mu_p):
    """Gamma vec(RangeMap((P A(mu) - I) SourceCols)) by direct composition."""
    s = setup
    A = s.A_dense(mu_p)
    y = mu_p["precond"]
    if key == "u_u":
        X = np.asarray(s.Ru.inv.apply(s.sigma["u_u"].source_array()))
        EX = s.P_apply(A @ X, y) - X
        Z = np.asarray(s.omega["u_u"].apply(jnp.asarray(EX)))
    elif key == "u_ur":
        X = np.asarray(s.Ru.inv.apply(s.sigma["u_ur"].source_array()))
        EX = s.P_apply(A @ X, y) - X
        RuEX = np.asarray(s.Ru.op.apply(jnp.asarray(EX)))
        Z = np.asarray(s.omega["u_ur"].matrix()) @ (
            np.asarray(s.u_basis).T @ RuEX
        )
    elif key == "ur_ur":
        X = np.asarray(s.u_basis) @ np.asarray(s.sigma["ur_ur"].matrix()).T
        EX = s.P_apply(A @ X, y) - X
        RuEX = np.asarray(s.Ru.op.apply(jnp.asarray(EX)))
        Z = np.asarray(s.omega["ur_ur"].matrix()) @ (
            np.asarray(s.u_basis).T @ RuEX
        )
    c = np.asarray(s.gamma[key].apply_matrix(jnp.asarray(Z)))
    return np.linalg.norm(c)


@pytest.mark.parametrize("key", ["u_u", "u_ur", "ur_ur"])
def test_hs_estimators(setup, reductor, key):
    mu_p = setup.mu_p()
    n_hand = _hand_hs(setup, key, mu_p)
    n_red = float(reductor._estimate_hs(mu_p, key))
    assert np.isclose(n_hand, n_red, rtol=1e-9)


def test_hs_weighted_key(setup, reductor):
    mu_p = setup.mu_p()
    spec = [("u_u", 0.7), ("ur_ur", 2.0)]
    n_red = float(reductor._estimate_hs(mu_p, spec))
    want = np.sqrt(
        0.49 * _hand_hs(setup, "u_u", mu_p) ** 2
        + 4.0 * _hand_hs(setup, "ur_ur", mu_p) ** 2
    )
    assert np.isclose(n_red, want, rtol=1e-9)


def _hand_galerkin(setup, mu_p):
    s = setup
    A = s.A_dense(mu_p)
    b = np.asarray(s.fom.assemble_rhs(mu_p))
    y = mu_p["precond"]
    Un = np.asarray(s.u_basis)
    PA_U = s.P_apply(A @ Un, y)
    Pb = s.P_apply(b[:, None], y)[:, 0]
    B = Un.T @ np.asarray(s.Ru.op.apply(jnp.asarray(PA_U)))
    f = Un.T @ np.asarray(s.Ru.op.apply(jnp.asarray(Pb)))
    return B, f


@pytest.mark.parametrize("stable", [False, True])
def test_galerkin(setup, reductor, reductor_stable, stable):
    red = reductor_stable if stable else reductor
    mu_p = setup.mu_p(key_mu=7, key_y=8)
    B, f = _hand_galerkin(setup, mu_p)
    Bp, fp = red.assemble_rom_system(mu_p)
    assert np.allclose(np.asarray(Bp), B, atol=1e-9)
    assert np.allclose(np.asarray(fp), f, atol=1e-9)


@pytest.mark.parametrize("stable", [False, True])
def test_residual(setup, reductor, reductor_stable, stable):
    """Hand: || theta( P(y) (A u_rom - b) ) || == rom.estimate_error."""
    red = reductor_stable if stable else reductor
    s = setup
    mu_p = setup.mu_p(key_mu=9, key_y=10)
    B, f = _hand_galerkin(setup, mu_p)
    a = np.linalg.solve(B, f)
    u = np.asarray(s.u_basis) @ a
    A = s.A_dense(mu_p)
    b = np.asarray(s.fom.assemble_rhs(mu_p))
    res = s.P_apply((A @ u - b)[:, None], mu_p["precond"])[:, 0]
    rnorm = np.linalg.norm(np.asarray(s.theta.apply(jnp.asarray(res))))
    prnorm = float(red.prom.rom.estimate_error(mu_p))
    assert np.isclose(prnorm, rnorm, rtol=1e-9)


def test_minimize_hs_at_interpolation_point(setup, reductor):
    """At mu = mu_i (a direction's parameter) the minimizer should pick
    ~e_i and the HS estimate should be ~0 (P_i = A(mu_i)^-1 exactly)."""
    mu = setup.mu_precond[0]
    mu_p, rnorm = reductor.minimize_hs_estimator(mu, "u_u")
    y = np.asarray(mu_p["precond"])
    assert abs(y[0] - 1.0) < 1e-6
    assert np.abs(y[1:]).max() < 1e-6
    assert float(rnorm) < 1e-8


def test_preconditioned_solve_accuracy(setup, reductor):
    """Preconditioned Galerkin solve ~= classical Galerkin solution."""
    s = setup
    mu = s.fom.parameter_space.sample_randomly(1, key=33)[0]
    u_red, mu_p = reductor.solve(mu, "u_u")
    u = np.asarray(s.u_basis) @ np.asarray(u_red)
    # classical Galerkin oracle
    A = s.A_dense(mu)
    b = np.asarray(s.fom.assemble_rhs(mu))
    Un = np.asarray(s.u_basis)
    y_g = np.linalg.solve(Un.T @ A @ Un, Un.T @ b)
    u_g = Un @ y_g
    rel = float(s.Ru.norm(jnp.asarray(u - u_g))) / float(
        s.Ru.norm(jnp.asarray(u_g))
    )
    assert rel < 5e-2  # preconditioned projection close to Galerkin


def test_quasi_optimality_runs(setup, reductor):
    mu = setup.fom.parameter_space.sample_randomly(1, key=44)[0]
    mu_p, _ = reductor.minimize_hs_estimator(mu, [("u_ur", 1.0), ("ur_ur", 1.0)])
    q = float(reductor.estimate_quasi_optimality(mu_p))
    # >= 1 when defined, inf when the bound is undefined (never 0: an
    # undefined bound must not look like a perfect one)
    assert q >= 1.0 or np.isinf(q)


def test_stable_equals_naive(setup, reductor, reductor_stable):
    """Stable factored assembly == naive expansion (same math, fewer terms;
    reference preconditioned_rom.py:45-47,133-135)."""
    mu_p = setup.mu_p(key_mu=55, key_y=56)
    B1, f1 = reductor.assemble_rom_system(mu_p)
    B2, f2 = reductor_stable.assemble_rom_system(mu_p)
    assert np.allclose(np.asarray(B1), np.asarray(B2), atol=1e-9)
    assert np.allclose(np.asarray(f1), np.asarray(f2), atol=1e-9)
    e1 = float(reductor.prom.rom.estimate_error(mu_p))
    e2 = float(reductor_stable.prom.rom.estimate_error(mu_p))
    assert np.isclose(e1, e2, rtol=1e-8)


def test_factored_rom_output(setup, reductor_stable):
    """Stable-mode FactoredROM carries the projected output functional."""
    s = setup
    mu_p = s.mu_p(key_mu=77, key_y=78)
    rom = reductor_stable.prom.rom
    y = rom.solve(mu_p)
    out = np.asarray(rom.output_functional.apply(y, mu_p)).item()
    u = np.asarray(s.u_basis) @ np.asarray(y)
    want = np.asarray(s.fom.output_functional.apply(jnp.asarray(u), mu_p)).item()
    assert abs(out - want) < 1e-9


@pytest.mark.parametrize("stable", [False, True])
def test_solve_batch_equals_per_mu(setup, reductor, reductor_stable, stable):
    """One jitted vmapped online stage == the per-mu Python loop
    (VERDICT r2 item 5; reference preconditioned_reductor.py:361-441 is
    per-mu)."""
    from rla4mor_tpu.core import mu_stack

    red = reductor_stable if stable else reductor
    mus = setup.fom.parameter_space.sample_randomly(5, key=77)
    for key in ("u_u", [("u_ur", 1.0), ("ur_ur", 0.5)]):
        us, ys, rnorms = red.solve_batch(mu_stack(mus), key)
        assert us.shape[0] == len(mus) and ys.shape == (len(mus), 3)
        for i, mu in enumerate(mus):
            mu_p, rn = red.minimize_hs_estimator(mu, key)
            u, mu_p2 = red.solve(mu, key)
            np.testing.assert_allclose(
                np.asarray(ys[i]), np.asarray(mu_p["precond"]),
                rtol=1e-9, atol=1e-11,
            )
            np.testing.assert_allclose(
                np.asarray(rnorms[i]), np.asarray(rn), rtol=1e-9, atol=1e-12
            )
            np.testing.assert_allclose(
                np.asarray(us[i]), np.asarray(u), rtol=1e-8, atol=1e-10
            )
