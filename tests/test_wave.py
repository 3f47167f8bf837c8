"""Second-order-in-time (wave) models: Newmark oracle, energy
conservation, ROM convergence, sketched indicator, POD-greedy reuse.

Beyond-reference functionality (the reference is stationary-only; the
parabolic analog is tests/test_instationary.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sps

from rla4mor_tpu.core.orthonormalize import pod
from rla4mor_tpu.models import (
    WaveReductor,
    pod_greedy,
    wave_thermal_block,
)
from rla4mor_tpu.ops import GaussianEmbedding


@pytest.fixture(scope="module")
def wfom():
    return wave_thermal_block((2, 2), 10, T=1.0, nt=40)


def test_newmark_matches_dense_oracle_and_conserves_energy(wfom):
    """Trapezoidal Newmark (beta=1/4, gamma=1/2): trajectory matches a
    dense oracle to machine precision, and with f = 0 the discrete
    energy E_k = (v^T M v + u^T A u)/2 is conserved exactly — the
    scheme-defining property."""
    mu = wfom.parameter_space.sample_randomly(1, key=0)[0]
    traj, vel = wfom.solve(mu, return_velocity=True)
    traj, vel = np.asarray(traj), np.asarray(vel)

    A = wfom._assemble_A(mu).toarray()
    M = sps.csc_matrix(wfom.mass.S).toarray()
    dt, beta, gamma = wfom.dt, wfom.beta, wfom.gamma
    b = wfom.assemble_rhs(mu)
    u = np.asarray(wfom.u0)
    v = np.zeros_like(u)
    a = np.linalg.solve(M, b - A @ u)
    S = M + beta * dt * dt * A
    us = [u]
    for _ in range(wfom.nt):
        u_star = u + dt * v + dt * dt * (0.5 - beta) * a
        v_star = v + dt * (1.0 - gamma) * a
        a = np.linalg.solve(S, b - A @ u_star)
        u = u_star + beta * dt * dt * a
        v = v_star + gamma * dt * a
        us.append(u)
    want = np.stack(us, 1)
    assert np.abs(traj - want).max() < 1e-12

    E = [0.5 * (vel[:, k] @ (M @ vel[:, k]))
         + 0.5 * (traj[:, k] @ (A @ traj[:, k]))
         for k in range(wfom.nt + 1)]
    assert (max(E) - min(E)) / E[0] < 1e-12


def test_newmark_second_order_in_time():
    """Trapezoidal Newmark converges at second order: halving dt
    quarters the error against a fine reference."""
    mu = {"diffusion": jnp.asarray([0.4, 1.0, 0.7, 1.3])}

    def final(nt):
        f = wave_thermal_block((2, 2), 8, T=1.0, nt=nt)
        return np.asarray(f.solve(mu))[:, -1]

    ref = final(1024)
    e1 = np.linalg.norm(final(32) - ref)
    e2 = np.linalg.norm(final(64) - ref)
    assert 3.3 < e1 / e2 < 4.7, e1 / e2


def test_rom_exact_basis_reproduces(wfom):
    """A trajectory-spanning basis reproduces the FOM trajectory and the
    sketched indicator is ~0 there; the dense-affine ROM jits and vmaps
    over parameter batches."""
    from rla4mor_tpu.core.parameters import mu_stack

    Ru = wfom.products["h1_0"]
    emb = GaussianEmbedding.make(wfom.solution_dim, sqrt_product=Ru.sqrt,
                                 range_dim=120, seed=2)
    mu = wfom.parameter_space.sample_randomly(1, key=0)[0]
    traj = np.asarray(wfom.solve(mu))
    red = WaveReductor(wfom, embedding=emb, product=Ru, log_level=30)
    modes, _ = pod(jnp.asarray(traj), product=Ru, rtol=1e-12)
    red.extend_basis(modes)
    rom = red.reduce()
    tr_r, eta = rom.solve(mu, return_estimate=True)
    rec = np.asarray(red.reconstruct(tr_r))
    assert np.abs(rec - traj).max() < 1e-10
    assert float(eta) < 1e-10

    batch = mu_stack(wfom.parameter_space.sample_randomly(4, key=8))
    etas = jax.jit(jax.vmap(rom.estimate_error))(batch)
    assert etas.shape == (4,) and bool(jnp.all(jnp.isfinite(etas)))


def test_pod_greedy_on_wave(wfom):
    """models.pod_greedy drives the wave reductor unchanged (protocol
    compatibility): estimates decay and the held-out ROM is accurate;
    padded run selects identically with one compile."""
    Ru = wfom.products["h1_0"]

    def run(pad_to):
        emb = GaussianEmbedding.make(
            wfom.solution_dim, sqrt_product=Ru.sqrt, range_dim=120, seed=2
        )
        red = WaveReductor(wfom, embedding=emb, product=Ru, log_level=30)
        train = wfom.parameter_space.sample_randomly(8, key=3)
        rom, hist = pod_greedy(wfom, red, train, max_extensions=6,
                               modes_per_extension=3, pad_to=pad_to,
                               log_level=30)
        return red, rom, hist

    red, rom, hist = run(None)
    est = hist["max_estimates"]
    assert est[-1] < 0.5 * est[0]
    mu_t = wfom.parameter_space.sample_randomly(1, key=9)[0]
    rec = np.asarray(red.reconstruct(rom.solve(mu_t)))
    truth = np.asarray(wfom.solve(mu_t))
    rel = np.linalg.norm(rec - truth) / np.linalg.norm(truth)
    assert rel < 0.08, rel

    _, _, hist_p = run(18)
    assert np.allclose(hist["max_estimates"], hist_p["max_estimates"],
                       rtol=1e-9)


def test_padded_reduce_equals_unpadded(wfom):
    Ru = wfom.products["h1_0"]
    emb = GaussianEmbedding.make(wfom.solution_dim, sqrt_product=Ru.sqrt,
                                 range_dim=120, seed=2)
    red = WaveReductor(wfom, embedding=emb, product=Ru, log_level=30)
    mu = wfom.parameter_space.sample_randomly(1, key=0)[0]
    modes, _ = pod(wfom.solve(mu), product=Ru, modes=5)
    red.extend_basis(modes)
    rom = red.reduce()
    rom_p = red.reduce(pad_to=9)
    mu_t = wfom.parameter_space.sample_randomly(1, key=4)[0]
    t1, e1 = rom.solve(mu_t, return_estimate=True)
    t2, e2 = rom_p.solve(mu_t, return_estimate=True)
    assert t2.shape[0] == 9
    assert np.allclose(np.asarray(t2[5:]), 0.0)
    assert np.allclose(np.asarray(t2[:5]), np.asarray(t1), atol=1e-12)
    assert np.isclose(float(e2), float(e1), rtol=1e-10)


def test_wave_stencil_matches_dense_and_pod_greedy():
    """Device-native Newmark (warm-started CG inside one scan) == a
    dense Newmark oracle on the interior nodes; MG preconditioning gives
    the same trajectory; the flat reductor view drives pod_greedy to an
    accurate held-out ROM."""
    from rla4mor_tpu.models import WaveStencilFOM
    from rla4mor_tpu.models.stencil import (
        StencilThermalBlock, interior_mask, mass_apply,
    )

    N, nt = 8, 12
    st = StencilThermalBlock((2, 2), N, dtype=jnp.float64)
    dev = WaveStencilFOM(st, T=0.5, nt=nt)
    mu = dev.parameter_space.sample_randomly(1, key=3)[0]
    traj = np.asarray(dev.solve(mu, tol=1e-13, maxiter=1000))
    assert traj.shape == (*st.solution_shape, nt + 1)

    interior = np.flatnonzero(
        np.asarray(interior_mask(st.n_nodes, jnp.float64)).reshape(-1)
    )
    shape = st.solution_shape

    def dense(fn):
        cols = []
        for j in interior:
            e = np.zeros(st.n_nodes ** 2)
            e[j] = 1.0
            cols.append(np.asarray(
                fn(jnp.asarray(e.reshape(shape)))
            ).reshape(-1)[interior])
        return np.stack(cols, 1)

    A = dense(lambda g: st.apply(mu, g))
    M = dense(lambda g: mass_apply(g, st.h))
    b = np.asarray(st.rhs()).reshape(-1)[interior]
    dt, beta, gamma = dev.dt, dev.beta, dev.gamma
    u = np.zeros(interior.size)
    v = np.zeros_like(u)
    a = np.linalg.solve(M, b - A @ u)
    S = M + beta * dt * dt * A
    us = [u]
    for _ in range(nt):
        u_star = u + dt * v + dt * dt * (0.5 - beta) * a
        v_star = v + dt * (1.0 - gamma) * a
        a = np.linalg.solve(S, b - A @ u_star)
        u = u_star + beta * dt * dt * a
        v = v_star + gamma * dt * a
        us.append(u)
    want = np.stack(us, 1)
    got = traj.reshape(-1, nt + 1)[interior]
    assert np.abs(got - want).max() < 1e-10 * np.abs(want).max()

    traj_mg = np.asarray(dev.solve(mu, tol=1e-13, maxiter=200,
                                   precond="mg"))
    assert np.abs(traj_mg - traj).max() < 1e-10 * np.abs(want).max()

    view = dev.as_reductor_fom(tol=1e-11, maxiter=1000)
    emb = GaussianEmbedding.make(view.solution_dim, range_dim=80, seed=2)
    red = WaveReductor(view, embedding=emb, log_level=30)
    train = view.parameter_space.sample_randomly(8, key=7)
    rom, hist = pod_greedy(view, red, train, max_extensions=6,
                           modes_per_extension=3, log_level=30)
    est = hist["max_estimates"]
    assert est[-1] < 0.5 * est[0]
    mu_t = view.parameter_space.sample_randomly(1, key=9)[0]
    rec = np.asarray(red.reconstruct(rom.solve(mu_t)))
    truth = np.asarray(view.solve(mu_t))
    assert np.linalg.norm(rec - truth) / np.linalg.norm(truth) < 0.05


def test_wave_stencil_3d_and_nonspd():
    """The rank-generic backend carries over: 3-D thermal block (lumped
    mass hooks) and the non-SPD advection-diffusion family (BiCGStab
    acceleration solves) both run the Newmark scan with finite,
    boundary-zero trajectories; 3-D matches its dense oracle."""
    from rla4mor_tpu.models import (
        StencilAdvectionDiffusion, StencilThermalBlock3D, WaveStencilFOM,
    )
    from rla4mor_tpu.models.stencil3d import interior_mask3

    st3 = StencilThermalBlock3D((2, 2, 2), 4, dtype=jnp.float64)
    dev3 = WaveStencilFOM(st3, T=0.25, nt=6)
    mu3 = dev3.parameter_space.sample_randomly(1, key=3)[0]
    traj3 = np.asarray(dev3.solve(mu3, tol=1e-13, maxiter=500))
    assert traj3.shape == (*st3.solution_shape, 7)

    interior = np.flatnonzero(
        np.asarray(interior_mask3(st3.n_nodes, jnp.float64)).reshape(-1)
    )
    shape = st3.solution_shape

    def dense(fn):
        cols = []
        for j in interior:
            e = np.zeros(st3.n_dof)
            e[j] = 1.0
            cols.append(np.asarray(
                fn(jnp.asarray(e.reshape(shape)))
            ).reshape(-1)[interior])
        return np.stack(cols, 1)

    A = dense(lambda g: st3.apply(mu3, g))
    M = st3.h ** 3 * np.eye(interior.size)   # lumped
    b = np.asarray(st3.rhs()).reshape(-1)[interior]
    dt, beta, gamma = dev3.dt, dev3.beta, dev3.gamma
    u = np.zeros(interior.size)
    v = np.zeros_like(u)
    a = np.linalg.solve(M, b - A @ u)
    S = M + beta * dt * dt * A
    us = [u]
    for _ in range(dev3.nt):
        u_star = u + dt * v + dt * dt * (0.5 - beta) * a
        v_star = v + dt * (1.0 - gamma) * a
        a = np.linalg.solve(S, b - A @ u_star)
        u = u_star + beta * dt * dt * a
        v = v_star + gamma * dt * a
        us.append(u)
    want = np.stack(us, 1)
    got = traj3.reshape(-1, dev3.nt + 1)[interior]
    assert np.abs(got - want).max() < 1e-9 * np.abs(want).max()
    bdry = np.setdiff1d(np.arange(st3.n_dof), interior)
    assert np.abs(traj3.reshape(-1, dev3.nt + 1)[bdry]).max() == 0.0

    adv = StencilAdvectionDiffusion(8, dtype=jnp.float64)
    deva = WaveStencilFOM(adv, T=0.25, nt=6)
    mua = adv.sample_parameters(1, key=3)[0]
    traja = np.asarray(deva.solve(mua, tol=1e-12, maxiter=2000))
    assert np.all(np.isfinite(traja)) and np.abs(traja).max() > 0
