"""Matrix-free advection-diffusion stencil family + device BiCGStab:
oracle-pinned to the host-assembled AdvectionDiffusionFOM, and the
generalized (non-SPD, minres) sharded greedy step."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from rla4mor_tpu.models import AdvectionDiffusionFOM, StencilAdvectionDiffusion


def _grid_vec(nx, rng):
    u = np.zeros((nx + 1, nx + 1))
    u[1:-1, 1:-1] = rng.standard_normal((nx - 1, nx - 1))
    return u


def test_stencil_advection_matches_host_fom():
    """apply/apply_term/rhs equal the host sparse FOM entry-for-entry on
    interior nodes (models/advection_diffusion.py is the oracle)."""
    nx = 12
    host = AdvectionDiffusionFOM(num_intervals=nx)
    dev = StencilAdvectionDiffusion(nx, dtype=jnp.float64)
    rng = np.random.RandomState(0)
    u = _grid_vec(nx, rng)
    ui = u.reshape(-1)[host.interior]

    for t in range(3):
        T = host.operator.terms[t].S.toarray()
        want = T @ ui
        got = np.asarray(
            dev.apply_term(t, jnp.asarray(u))
        ).reshape(-1)[host.interior]
        assert np.allclose(got, want, atol=1e-12), t

    for mu in host.sample_parameters(3, key=5):
        A = host.assemble_sparse(mu)
        want = A @ ui
        got = np.asarray(dev.apply(mu, jnp.asarray(u)))
        # ring stays zero
        assert np.abs(got[0]).max() == 0 and np.abs(got[:, -1]).max() == 0
        assert np.allclose(got.reshape(-1)[host.interior], want, atol=1e-12)

    rhs_host = np.asarray(host.assemble_rhs(host.sample_parameters(1)[0]))
    rhs_dev = np.asarray(dev.rhs()).reshape(-1)[host.interior]
    assert np.allclose(rhs_dev, rhs_host.reshape(-1), atol=1e-14)


def test_bicgstab_nonsymmetric_small():
    """Device BiCGStab == dense solve on a random nonsymmetric
    diagonally dominant system."""
    from rla4mor_tpu.core.solvers import bicgstab

    rng = np.random.RandomState(1)
    n = 24
    A = rng.standard_normal((n, n)) + n * np.eye(n)
    b = rng.standard_normal(n)
    res = jax.jit(
        lambda bb: bicgstab(lambda x: jnp.asarray(A) @ x, bb,
                            tol=1e-13, maxiter=500)
    )(jnp.asarray(b))
    want = np.linalg.solve(A, b)
    assert np.allclose(np.asarray(res.x), want, atol=1e-9)
    assert float(res.residual_norm) < 1e-11


def test_bicgstab_f32_breakdown_guard():
    """f32 exact-convergence breakdown (identity system converges at the
    half step, so vdot(t, t) == 0) must return the solution — the old
    1e-300 guard underflowed to zero in f32 and the solver silently
    returned all-NaN 'converged' (review finding)."""
    from rla4mor_tpu.core.solvers import bicgstab

    b = jnp.ones(8, jnp.float32)
    res = bicgstab(lambda x: x, b, tol=1e-6, maxiter=50)
    assert np.allclose(np.asarray(res.x), 1.0)
    assert np.isfinite(float(res.residual_norm))


def test_bicgstab_solve_matches_host_lu():
    """Full matrix-free solve (Jacobi-preconditioned BiCGStab) equals the
    host SuperLU solution of the assembled system."""
    nx = 12
    host = AdvectionDiffusionFOM(num_intervals=nx)
    dev = StencilAdvectionDiffusion(nx, dtype=jnp.float64)
    for mu in host.sample_parameters(2, key=9):
        u_dev = np.asarray(jax.jit(
            lambda m: dev.solve_bicgstab(m, tol=1e-13, maxiter=3000)
        )(mu))
        u_host = np.asarray(host.solve(mu)).reshape(-1)
        got = u_dev.reshape(-1)[host.interior]
        assert np.allclose(got, u_host, atol=1e-9)


def test_sharded_greedy_step_advection_minres():
    """The generalized sharded greedy runs the NON-SPD family end-to-end
    on the CPU mesh: BiCGStab FOM solves, srht sketch, minres sketched
    projection; first basis column is the canonical sketch of the
    snapshot, estimates improve with the second extension."""
    from rla4mor_tpu.core import mu_stack
    from rla4mor_tpu.ops.fwht import srht
    from rla4mor_tpu.parallel import make_sharded_greedy_step

    devices = np.array(jax.devices()[:8]).reshape(4, 2)
    mesh = Mesh(devices, ("dof", "mu"))
    fom = StencilAdvectionDiffusion(15, dtype=jnp.float64)
    key = jax.random.key(0)
    k = 32
    state0, step = make_sharded_greedy_step(
        fom, mesh, key, k=k, r_max=4, cg_tol=1e-12, cg_maxiter=2000,
        sketch="srht", projection="minres",
    )
    batch = mu_stack(fom.sample_parameters(8, key=2))
    with mesh:
        jit_step = jax.jit(step)
        state, est1, u = jit_step(
            state0, fom.sample_parameters(1, key=11)[0], batch
        )
        state, est2, _ = jit_step(
            state, fom.sample_parameters(1, key=12)[0], batch
        )
    assert int(state.ncols) == 2
    est1, est2 = np.asarray(est1), np.asarray(est2)
    assert np.all(np.isfinite(est1)) and np.all(np.isfinite(est2))
    assert np.median(est2) < np.median(est1)

    su = np.asarray(srht(np.asarray(u).reshape(-1), k,
                         jax.random.fold_in(key, 0)))
    want = su / np.linalg.norm(su)
    assert np.abs(np.asarray(state.srb[:, 0]) - want).max() < 1e-10


def test_instationary_advection_matches_dense():
    """Non-SPD parabolic: InstationaryStencilFOM over the advection-
    diffusion stencil (warm-started BiCGStab per implicit step) == a
    dense implicit-Euler oracle assembled from the same operators; term
    LinOps are exact adjoint pairs (K symmetric, C anti-symmetric)."""
    from rla4mor_tpu.models import InstationaryStencilFOM
    from rla4mor_tpu.models.stencil import interior_mask, mass_apply

    N, nt, T = 8, 8, 0.25
    fom = StencilAdvectionDiffusion(N, dtype=jnp.float64)
    dev = InstationaryStencilFOM(fom, T=T, nt=nt)
    mu = fom.sample_parameters(1, key=3)[0]
    traj = np.asarray(dev.solve(mu, tol=1e-13, maxiter=2000))

    interior = np.flatnonzero(
        np.asarray(interior_mask(fom.n_nodes, jnp.float64)).reshape(-1)
    )
    shape = fom.solution_shape

    def dense(apply_fn):
        cols = []
        for j in interior:
            e = np.zeros(fom.n_nodes ** 2)
            e[j] = 1.0
            cols.append(np.asarray(
                apply_fn(jnp.asarray(e.reshape(shape)))
            ).reshape(-1)[interior])
        return np.stack(cols, 1)

    A = dense(lambda g: fom.apply(mu, g))
    M = dense(lambda g: mass_apply(g, fom.h))
    b = np.asarray(fom.rhs()).reshape(-1)[interior]
    u = np.zeros(interior.size)
    out = [u]
    for _ in range(nt):
        u = np.linalg.solve(M + dev.dt * A, M @ u + dev.dt * b)
        out.append(u)
    want = np.stack(out, 1)
    got = traj.reshape(-1, nt + 1)[interior]
    assert np.abs(got - want).max() < 1e-10 * np.abs(want).max()

    # adjoint structure of the term LinOps
    op = fom.affine_operator()
    eye = jnp.eye(fom.n_nodes ** 2)
    for t, term in enumerate(op.terms):
        At = np.asarray(term.apply(eye))
        AtH = np.asarray(term.H.apply(eye))
        assert np.allclose(AtH, At.T, atol=1e-14), t
        if t > 0:  # central-difference advection is anti-symmetric
            assert np.allclose(At.T, -At, atol=1e-14), t


def test_pod_greedy_on_advection_stencil():
    """POD-greedy over the non-SPD parabolic stencil FOM end-to-end
    (BiCGStab time loop + AdvectionTermOp affine view): estimates decay
    and the ROM is accurate at a held-out parameter."""
    from rla4mor_tpu.models import (
        InstationaryReductor, InstationaryStencilFOM, pod_greedy,
    )
    from rla4mor_tpu.ops import GaussianEmbedding

    fom = StencilAdvectionDiffusion(8, dtype=jnp.float64)
    dev = InstationaryStencilFOM(fom, T=0.25, nt=8)
    view = dev.as_reductor_fom(tol=1e-11, maxiter=2000)
    theta = GaussianEmbedding.make(view.solution_dim, range_dim=80, seed=2)
    red = InstationaryReductor(view, embedding=theta, log_level=30)
    train = fom.sample_parameters(8, key=7)
    rom, hist = pod_greedy(view, red, train, max_extensions=6, pad_to=12,
                           modes_per_extension=2, log_level=30)
    est = hist["max_estimates"]
    assert est[-1] < 0.1 * est[0]

    mu_t = fom.sample_parameters(1, key=9)[0]
    rec = np.asarray(red.reconstruct(rom.solve(mu_t)))
    truth = np.asarray(view.solve(mu_t))
    rel = np.linalg.norm(rec - truth) / np.linalg.norm(truth)
    assert rel < 0.02, rel


def test_advection_term_apply_adjoint():
    """apply_adjoint on the flat term LinOps matches the dense adjoint
    (regression: the FlatGridOp base aliases apply_adjoint = apply,
    which is sign-wrong for the anti-symmetric advection terms)."""
    fom = StencilAdvectionDiffusion(6, dtype=jnp.float64)
    eye = jnp.eye(fom.n_nodes ** 2)
    for t in range(3):
        term = fom.term_linop(t)
        A = np.asarray(term.apply(eye))
        got = np.asarray(term.apply_adjoint(eye))
        assert np.allclose(got, A.conj().T, atol=1e-14), t


def test_bicgstab_overflow_breakdown_returns_finite():
    """An f32 rho-breakdown (rhat perpendicular to A rhat: skew operator)
    overflows the omega quotient to NaN; the solver must freeze the last
    FINITE iterate and exit instead of returning an all-NaN 'converged'
    x (observed with Jacobi-BiCGStab on the 1M-DoF advection family)."""
    from rla4mor_tpu.core.solvers import bicgstab

    A = jnp.asarray([[0.0, 1.0], [-1.0, 0.0]], jnp.float32)  # skew
    b = jnp.asarray([1.0, 0.0], jnp.float32)  # b perp A b => rho breakdown
    res = bicgstab(lambda v: A @ v, b, tol=1e-10, maxiter=100)
    assert np.all(np.isfinite(np.asarray(res.x)))
    assert np.isfinite(float(res.residual_norm))
    assert int(res.iters) == 100  # breakdown forces the maxiter exit


def test_advection_kappa_is_precond_hook_not_operator():
    """kappa() exposes the SPD diffusion part for MG preconditioning;
    the parabolic wrapper must NOT mistake it for the full operator
    (the advection terms would silently vanish)."""
    from rla4mor_tpu.models.instationary_stencil import (
        InstationaryStencilFOM,
    )

    st = StencilAdvectionDiffusion(num_intervals=8, dtype=jnp.float64)
    assert st.kappa_is_full_operator is False
    dev = InstationaryStencilFOM(st, T=0.1, nt=4)
    mu = {"eps": jnp.asarray([0.3]), "velocity": jnp.asarray([0.9, -0.7])}
    A_mu, kappa = dev._make_stiff(mu)
    assert kappa is None  # falls back to the full affine apply
    u = jnp.asarray(
        np.random.RandomState(0).standard_normal(st.solution_shape)
    )
    np.testing.assert_allclose(
        np.asarray(A_mu(u)), np.asarray(st.apply(mu, u)), rtol=0, atol=0
    )
    # the MG hook itself: kappa(mu) == eps on every element
    np.testing.assert_allclose(np.asarray(st.kappa(mu)), 0.3)
