"""Semilinear (nonlinear-in-state) stack: FOM Newton-CG, POD-DEIM ROM,
certified monotone error bound (models/semilinear.py +
mor/semilinear_reductor.py).

Oracle strategy (SURVEY §4 pattern): dense numpy Newton as the FOM
oracle; dense lambda_min for the coercivity anchor in the containment
test; bound CONTAINMENT + DEIM-residual exactness + training-point
reproduction as the theorem-shaped assertions.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rla4mor_tpu.models.semilinear import (
    NONLINEARITIES,
    SemilinearStencilFOM,
)
from rla4mor_tpu.mor.semilinear_reductor import SemilinearReductor
from rla4mor_tpu.core.orthonormalize import pod
from rla4mor_tpu.core.parameters import mu_stack


def make_fom(num_intervals=12, reaction_scale=50.0, nonlinearity="cubic",
             grid_shape=(2, 2)):
    return SemilinearStencilFOM(
        grid_shape=grid_shape, num_intervals=num_intervals,
        dtype=jnp.float64, nonlinearity=nonlinearity,
        reaction_scale=reaction_scale,
    )


@pytest.fixture(scope="module")
def fom22():
    return make_fom(num_intervals=12)


@pytest.fixture(scope="module")
def fom11():
    # 2-parameter family (1 diffusion scalar + reaction): fast manifold
    # decay for the convergence/greedy assertions
    return make_fom(num_intervals=12, grid_shape=(1, 1))


@pytest.fixture(scope="module")
def mus22(fom22):
    return fom22.sample_parameters(8, key=3)


@pytest.fixture(scope="module")
def snaps22(fom22, mus22):
    return jnp.stack(
        [fom22.solve_newton(m).reshape(-1) for m in mus22], axis=1)


def dense_terms(fom):
    n = fom.n_dof
    I = jnp.eye(n, dtype=jnp.float64)
    return np.stack([
        np.asarray(fom.linear.term_linop(b).apply(I))
        for b in range(fom.linear.n_terms)
    ])


def dense_newton_oracle(fom, mu, A_terms, tol=1e-13):
    """Plain dense numpy Newton on the interior DoFs."""
    theta = np.asarray(mu["diffusion"], np.float64)
    Amu = np.tensordot(theta, A_terms, axes=1)
    ml = np.asarray(fom.mass_lumped_diag().reshape(-1))
    mask = ml > 0
    c = float(fom.reaction(mu))
    f = np.asarray(fom.rhs().reshape(-1))
    g, dg = (lambda u: np.asarray(fom.g(jnp.asarray(u))),
             lambda u: np.asarray(fom.dg(jnp.asarray(u))))
    u = np.zeros(fom.n_dof)
    Ai = Amu[np.ix_(mask, mask)]
    for _ in range(50):
        F = Ai @ u[mask] + c * ml[mask] * g(u[mask]) - f[mask]
        if np.linalg.norm(F) <= tol * np.linalg.norm(f[mask]):
            break
        J = Ai + np.diag(c * ml[mask] * dg(u[mask]))
        u[mask] -= np.linalg.solve(J, F)
    return u


def test_newton_matches_dense_oracle(fom22, mus22):
    A_terms = dense_terms(fom22)
    for mu in mus22[:3]:
        u_dev = np.asarray(fom22.solve_newton(mu).reshape(-1))
        u_ref = dense_newton_oracle(fom22, mu, A_terms)
        assert np.linalg.norm(u_dev - u_ref) <= 1e-8 * np.linalg.norm(u_ref)


@pytest.mark.parametrize("nl", sorted(NONLINEARITIES))
def test_all_nonlinearities_converge(nl):
    fom = make_fom(num_intervals=10, nonlinearity=nl, reaction_scale=30.0)
    mu = fom.sample_parameters(1, key=5)[0]
    u = fom.solve_newton(mu)
    rn = float(jnp.linalg.norm(fom.residual(mu, u)))
    fn = float(jnp.linalg.norm(fom.rhs()))
    assert rn <= 1e-8 * fn
    # nonlinearity actually matters: solution differs from the linear one
    u_lin = fom.linear.solve_cg(mu, tol=1e-12, maxiter=4000)
    assert float(jnp.linalg.norm(u - u_lin)) > 1e-4 * float(
        jnp.linalg.norm(u_lin))


def test_monotone_bound_contains_error(fom22, mus22, snaps22):
    """||u - V a||_2 <= estimate / lambda_min(sym A(mu)): the theorem
    the whole certified tier rests on (monotone g => strong
    monotonicity with the LINEAR coercivity constant)."""
    fom = fom22
    A_terms = dense_terms(fom)
    red = SemilinearReductor(fom)
    # deliberately coarse ROM so the error is macroscopic
    rom = red.fit(None, snapshots=snaps22[:, :5], modes=3, deim_modes=4,
                  n_reserve=2)
    V, _ = pod(snaps22[:, :5], modes=3)
    ml = np.asarray(fom.mass_lumped_diag().reshape(-1))
    mask = ml > 0
    for j, mu in enumerate(mus22[5:]):
        theta = np.asarray(mu["diffusion"], np.float64)
        Amu = np.tensordot(theta, A_terms, axes=1)[np.ix_(mask, mask)]
        alpha = float(np.linalg.eigvalsh(0.5 * (Amu + Amu.T))[0])
        a = rom.solve(mu)
        ur = np.asarray(V @ a)
        u = np.asarray(snaps22[:, 5 + j])
        err = np.linalg.norm(u - ur)
        bound = float(rom.estimate_error(mu, a)) / alpha
        assert err <= bound * (1 + 1e-10)
        assert bound <= 50 * err  # effectivity sanity


def test_estimator_is_exact_deim_residual_norm(fom22, mus22, snaps22):
    """The Gram estimator (include_deim=False) computes EXACTLY the l2
    norm of the hyperreduced residual
    f - A(mu) V a - c M_L U S g((V a)[pts]) — verified against the
    explicitly assembled vector."""
    fom = fom22
    red = SemilinearReductor(fom)
    rom = red.fit(None, snapshots=snaps22[:, :5], modes=3, deim_modes=4,
                  n_reserve=2)
    V, _ = pod(snaps22[:, :5], modes=3)
    f = np.asarray(fom.rhs().reshape(-1))
    mu = mus22[6]
    a = rom.solve(mu)
    ur = np.asarray(V @ a)
    Aur = np.asarray(fom.apply_linear(
        mu, jnp.asarray(ur).reshape(fom.solution_shape)).reshape(-1))
    c = float(fom.reaction(mu))
    g_pts = np.asarray(fom.g(rom.Pv @ a))
    # M_L U S columns are what the reductor stored; rebuild from W's
    # factors: the estimator's last columns are exactly M_L @ U @ S, so
    # reconstruct the DEIM nonlinear term from the FULL field instead:
    # interpolate g through the stored points via the ROM pieces.
    # rom.W = V^T (M_L U S); the full-order columns are not kept in the
    # ROM, so assemble them the same way the reductor does.
    from rla4mor_tpu.mor.eim import deim

    G = fom.g(snaps22[:, :5])
    interp_full = deim(G, modes=4, rtol=None)
    interp = interp_full.truncate(2, 2)
    m = interp.n_terms
    U_act = np.asarray(interp.basis[:, :m])
    S_inv = np.linalg.inv(np.asarray(interp.interp_matrix[:m, :m]))
    ml = np.asarray(fom.mass_lumped_diag().reshape(-1))
    nl_deim = c * (ml[:, None] * (U_act @ S_inv)) @ g_pts[:m]
    r_deim = f - Aur - nl_deim
    est = float(rom.estimate_error(mu, a, include_deim=False))
    assert abs(est - np.linalg.norm(r_deim)) <= 1e-9 * max(est, 1e-14)
    # the reserve indicator only ADDS
    assert float(rom.estimate_error(mu, a)) >= est


def test_deim_exact_on_training_parameter(fom22, mus22, snaps22):
    """Training mu, basis spans the snapshots, full DEIM: the ROM
    reproduces the FOM snapshot to solver tolerance."""
    fom = fom22
    mus = mus22[:4]
    red = SemilinearReductor(fom)
    rom = red.fit(None, snapshots=snaps22[:, :4], pod_rtol=1e-13,
                  deim_rtol=1e-14, n_reserve=0)
    V, _ = pod(snaps22[:, :4], rtol=1e-13)
    mu = mus[2]
    a = rom.solve(mu)
    ur = np.asarray(V @ a)
    u = np.asarray(snaps22[:, 2])
    assert np.linalg.norm(ur - u) <= 1e-7 * np.linalg.norm(u)
    assert float(rom.estimate_error(mu, a)) <= 1e-7


def test_rom_error_decreases_with_rank(fom11):
    fom = fom11
    mus = fom.sample_parameters(12, key=23)
    red = SemilinearReductor(fom)
    mu_t = mus[11]
    S = jnp.stack([fom.solve_newton(m).reshape(-1) for m in mus[:11]],
                  axis=1)
    u = np.asarray(fom.solve_newton(mu_t).reshape(-1))
    errs = []
    for r in (1, 3, 6):
        rom = red.fit(None, snapshots=S, modes=r, deim_rtol=1e-13,
                      n_reserve=0)
        V, _ = pod(S, modes=r)
        errs.append(np.linalg.norm(u - np.asarray(V @ rom.solve(mu_t))))
    assert errs[2] < 0.05 * errs[0]
    assert errs[2] <= 1e-4 * np.linalg.norm(u)


def test_sketched_estimator_within_distortion(fom22, mus22, snaps22):
    from rla4mor_tpu.ops.embeddings import SrhtEmbedding

    fom = fom22
    emb = SrhtEmbedding.make(fom.n_dof, range_dim=192, seed=4)
    rom_g = SemilinearReductor(fom).fit(
        None, snapshots=snaps22[:, :5], modes=3, deim_modes=4, n_reserve=0)
    rom_s = SemilinearReductor(fom, embedding=emb).fit(
        None, snapshots=snaps22[:, :5], modes=3, deim_modes=4, n_reserve=0)
    for mu in mus22[5:]:
        e_g = float(rom_g.estimate_error(mu))
        e_s = float(rom_s.estimate_error(mu))
        assert abs(e_s - e_g) <= 0.5 * e_g  # k=192 oblivious distortion


def test_online_stage_jits_and_vmaps(fom22, mus22, snaps22):
    rom = SemilinearReductor(fom22).fit(
        None, snapshots=snaps22[:, :4], modes=3, deim_modes=3, n_reserve=0)
    batched = mu_stack(mus22[4:])
    a_b, e_b = jax.jit(rom.solve_and_estimate_batch)(batched)
    for i, mu in enumerate(mus22[4:]):
        np.testing.assert_allclose(
            np.asarray(a_b[i]), np.asarray(rom.solve(mu)),
            rtol=1e-9, atol=1e-12)
        np.testing.assert_allclose(
            float(e_b[i]), float(rom.estimate_error(mu)), rtol=1e-7)


def test_imex_matches_dense_oracle(fom22, mus22):
    """IMEX FOM scan == dense numpy IMEX loop (consistent mass,
    lumped reaction)."""
    from rla4mor_tpu.models.semilinear import SemilinearInstationaryFOM
    from rla4mor_tpu.models.stencil import mass_apply

    fom = fom22
    ifom = SemilinearInstationaryFOM(fom, T=0.5, nt=16)
    mu = mus22[1]
    traj = np.asarray(ifom.solve_flat(mu, tol=1e-12))
    n = fom.n_dof
    I = jnp.eye(n, dtype=jnp.float64)
    A = np.tensordot(
        np.asarray(mu["diffusion"], np.float64), dense_terms(fom), axes=1)
    M = np.stack([
        np.asarray(mass_apply(
            np.asarray(I[:, j]).reshape(fom.solution_shape),
            fom.h).reshape(-1))
        for j in range(n)], axis=1)
    ml = np.asarray(fom.mass_lumped_diag().reshape(-1))
    mask = ml > 0
    c = float(fom.reaction(mu))
    f = np.asarray(fom.rhs().reshape(-1))
    dt = ifom.dt
    g = lambda u: np.asarray(fom.g(jnp.asarray(u)))  # noqa: E731
    Bm = (M + dt * A)[np.ix_(mask, mask)]
    u = np.zeros(n)
    for k in range(ifom.nt):
        rhs = (M @ u)[mask] + dt * (f[mask] - c * ml[mask] * g(u[mask]))
        un = np.zeros(n)
        un[mask] = np.linalg.solve(Bm, rhs)
        u = un
        err = np.linalg.norm(u - traj[:, k + 1])
        assert err <= 1e-8 * max(np.linalg.norm(u), 1e-12), (k, err)


def test_instationary_rom_reproduces_training_trajectory(fom22, mus22):
    from rla4mor_tpu.models.semilinear import SemilinearInstationaryFOM

    fom = fom22
    ifom = SemilinearInstationaryFOM(fom, T=0.5, nt=12)
    red = SemilinearReductor(fom)
    rom = red.fit_instationary(ifom, mus22[:3], pod_rtol=1e-11,
                               deim_rtol=1e-11, n_reserve=2)
    V = np.asarray(red.last_basis)
    mu = mus22[1]
    rec = V @ np.asarray(rom.solve(mu))
    truth = np.asarray(ifom.solve_flat(mu))
    assert (np.linalg.norm(rec - truth)
            <= 1e-6 * np.linalg.norm(truth))
    # indicator ~ solver roundoff on a reproduced trajectory
    assert float(rom.estimate_error(mu)) <= 1e-5
    # output trajectory consistent with the FOM's
    s_rom = np.asarray(rom.output_trajectory(rom.solve(mu)))
    s_fom = np.asarray(ifom.output_trajectory(ifom.solve(mu)))
    np.testing.assert_allclose(s_rom, s_fom, atol=1e-8)


def test_instationary_indicator_tracks_error(fom22, mus22):
    from rla4mor_tpu.models.semilinear import SemilinearInstationaryFOM

    fom = fom22
    ifom = SemilinearInstationaryFOM(fom, T=0.5, nt=12)
    red = SemilinearReductor(fom)
    # coarse ROM: indicator must be nonzero and shrink as the basis grows
    rom_c = red.fit_instationary(ifom, mus22[:3], modes=3, deim_modes=4,
                                 n_reserve=2)
    rom_f = red.fit_instationary(ifom, mus22[:3], modes=12, deim_modes=8,
                                 n_reserve=2)
    mu = mus22[6]
    e_c = float(rom_c.estimate_error(mu))
    e_f = float(rom_f.estimate_error(mu))
    assert e_c > 0 and e_f < e_c
    # jit + vmap over a batch
    batched = mu_stack(mus22[5:])
    trajs = jax.jit(rom_c.solve_batch)(batched)
    for i, m in enumerate(mus22[5:]):
        np.testing.assert_allclose(
            np.asarray(trajs[i]), np.asarray(rom_c.solve(m)),
            rtol=1e-8, atol=1e-11)


def test_certified_uq_over_semilinear_rom(fom22, mus22, snaps22):
    """certified_moments dispatches on the hyperreduced semilinear ROM
    and its bias bound contains the TRUE sampled output bias (dense
    lambda_min coercivity, exact l2 output dual norm h^2 sqrt(n))."""
    from rla4mor_tpu.mor.optimize import ConstantDualNorm
    from rla4mor_tpu.mor.uq import certified_moments, sample_mu_batched
    from rla4mor_tpu.core.parameters import mu_unstack

    fom = fom22
    A_terms = dense_terms(fom)
    ml = np.asarray(fom.mass_lumped_diag().reshape(-1))
    mask = ml > 0

    def alpha_dense(mu):
        theta = np.asarray(mu["diffusion"], np.float64)
        Amu = np.tensordot(theta, A_terms, axes=1)[np.ix_(mask, mask)]
        return float(np.linalg.eigvalsh(0.5 * (Amu + Amu.T))[0])

    # jittable conservative coercivity: min-theta against a dense anchor
    # at mu = 1 (theta in [0.1, 1] => alpha(mu) >= min_b theta_b * alpha(1))
    ones = {"diffusion": jnp.ones(4, jnp.float64),
            "reaction": jnp.ones(1, jnp.float64)}
    alpha1 = alpha_dense(ones)

    def coerc(mu):
        return jnp.min(jnp.asarray(mu["diffusion"])) * alpha1

    rom = SemilinearReductor(fom).fit(
        None, snapshots=snaps22[:, :5], modes=3, deim_modes=4, n_reserve=2)
    dual = ConstantDualNorm(fom.h * fom.h * np.sqrt(fom.n_dof))
    n_s = 24
    res = certified_moments(rom, fom.parameter_space, coerc, dual,
                            n=n_s, method="halton", batch=n_s, key=0)
    # replicate the sample set and compute the FOM truth
    mus_b = sample_mu_batched(fom.parameter_space, n_s, key=0,
                              method="halton", offset=0)
    s_fom = []
    for mu in mu_unstack(mus_b):
        u = fom.solve_newton(mu)
        s_fom.append(float(fom.output(u)))
    true_bias = abs(res.mean - float(np.mean(s_fom)))
    assert true_bias <= res.bias_bound * (1 + 1e-9)
    assert res.bias_bound <= 1.0  # not vacuous at this scale


def test_semilinear_rom_roundtrip(tmp_path, fom22, mus22, snaps22):
    """save_rom/load_rom ship both semilinear ROM kinds standalone."""
    from rla4mor_tpu.models.semilinear import SemilinearInstationaryFOM
    from rla4mor_tpu.mor.serialization import load_rom, save_rom

    fom = fom22
    mu = mus22[6]
    rom = SemilinearReductor(fom).fit(
        None, snapshots=snaps22[:, :5], modes=3, deim_modes=4, n_reserve=2)
    p = tmp_path / "sl.npz"
    save_rom(rom, p)
    rom2 = load_rom(p)
    np.testing.assert_allclose(np.asarray(rom2.solve(mu)),
                               np.asarray(rom.solve(mu)), rtol=1e-12)
    np.testing.assert_allclose(float(rom2.estimate_error(mu)),
                               float(rom.estimate_error(mu)), rtol=1e-12)

    ifom = SemilinearInstationaryFOM(fom, T=0.5, nt=8)
    prom = SemilinearReductor(fom).fit_instationary(
        ifom, mus22[:2], modes=6, deim_modes=5, n_reserve=2)
    p2 = tmp_path / "sl_inst.npz"
    save_rom(prom, p2)
    prom2 = load_rom(p2)
    np.testing.assert_allclose(np.asarray(prom2.solve(mu)),
                               np.asarray(prom.solve(mu)), rtol=1e-12)
    np.testing.assert_allclose(float(prom2.estimate_error(mu)),
                               float(prom.estimate_error(mu)), rtol=1e-12)


def test_greedy_drives_indicator_down(fom11):
    fom = fom11
    mus = fom.sample_parameters(12, key=37)
    red = SemilinearReductor(fom)
    rom, hist = red.greedy(mus, n_steps=5, deim_rtol=1e-13, n_reserve=2)
    assert len(hist) >= 3
    assert hist[-1] < 0.05 * hist[0]
    # certified variant runs too (explicit positive l2 anchor: smoke)
    from rla4mor_tpu.mor.bounds import MinThetaCoercivity

    coerc = MinThetaCoercivity(fom, mus[0], alpha_ref=1e-3)
    rom2, hist2 = red.greedy(mus[:6], n_steps=2, coercivity=coerc)
    assert rom2 is not None and len(hist2) >= 1


def test_certified_parabolic_bound_contains_error():
    """Round-5 theorem (VERDICT r4 missing #3): the monotone IMEX
    composition upgrades the space-time residual indicator to a RIGOROUS
    final-time state-error bound. Oracle: exact dense IMEX recursion
    (dense consistent mass + dense solve per step), dense lambda_min
    coercivity.

    Moderate reaction here: the bound's Groenwall factor
    ``exp(c L T / m_lo)`` is intrinsic to EXPLICIT reaction treatment —
    at fom22's reaction_scale=50 the window check honestly refuses
    (covered by the flag test below); at c ~ 2 the dissipation wins and
    the bound is tight."""
    from rla4mor_tpu.models.semilinear import SemilinearInstationaryFOM

    fom = make_fom(num_intervals=12, reaction_scale=2.0)
    mus22 = fom.sample_parameters(8, key=3)
    ifom = SemilinearInstationaryFOM(fom, T=0.5, nt=12)
    red = SemilinearReductor(fom)
    # rich enough that the residual fits through the bootstrap window
    # at c ~ 1-2 (the window closes when c h^2 L(U_r+m) reaches alpha)
    rom = red.fit_instationary(ifom, mus22, modes=14, deim_modes=10,
                               n_reserve=2)
    assert np.isfinite(rom.v_row_sup) and rom.v_row_sup > 0
    V = np.asarray(red.last_basis)
    A_terms = dense_terms(fom)
    ml = np.asarray(fom.mass_lumped_diag().reshape(-1))
    mask = ml > 0
    n = fom.n_dof
    # dense consistent mass from the apply
    I = jnp.eye(n, dtype=jnp.float64)
    M = np.asarray(jax.vmap(
        lambda col: ifom._mass_apply(
            col.reshape(fom.solution_shape)).reshape(-1),
        in_axes=1, out_axes=1)(I))
    f = np.asarray(fom.rhs().reshape(-1))
    dt = ifom.dt
    g = lambda u: np.asarray(fom.g(jnp.asarray(u)))  # noqa: E731

    for j, mu in enumerate(fom.sample_parameters(2, key=11)):
        theta = np.asarray(mu["diffusion"], np.float64)
        Amu = np.tensordot(theta, A_terms, axes=1)
        Ai = Amu[np.ix_(mask, mask)]
        alpha = float(np.linalg.eigvalsh(0.5 * (Ai + Ai.T))[0])
        c = float(fom.reaction(mu))

        # exact dense IMEX oracle on the interior
        Mi = M[np.ix_(mask, mask)]
        B = Mi + dt * Ai
        u = np.zeros(n)
        traj_fom = [u.copy()]
        for _ in range(ifom.nt):
            rhs = Mi @ u[mask] + dt * (f[mask]
                                       - c * ml[mask] * g(u[mask]))
            u = np.zeros(n)
            u[mask] = np.linalg.solve(B, rhs)
            traj_fom.append(u.copy())
        traj_fom = np.stack(traj_fom, axis=1)      # (n, nt + 1)

        traj = rom.solve(mu)
        bound, info = rom.certified_error_bound(
            mu, lambda m, _a=alpha: jnp.asarray(_a), traj=traj)
        assert bool(info["certified"]), info
        err_T = np.linalg.norm(traj_fom[:, -1] - V @ np.asarray(traj)[:, -1])
        assert err_T <= float(bound) * (1 + 1e-8), (err_T, float(bound))
        # effectivity sanity: rigorous, not vacuous
        assert float(bound) <= 1e4 * max(err_T, 1e-12), (err_T, float(bound))


def test_certified_parabolic_bound_flags_failed_bootstrap(fom22, mus22):
    """A margin too small for the actual error makes the bootstrap
    window inconsistent: the bound must go INF with certified=False —
    never a silently invalid finite number."""
    from rla4mor_tpu.models.semilinear import SemilinearInstationaryFOM

    fom = fom22
    ifom = SemilinearInstationaryFOM(fom, T=0.5, nt=12)
    red = SemilinearReductor(fom)
    rom = red.fit_instationary(ifom, mus22[:3], modes=2, deim_modes=3,
                               n_reserve=1)
    mu = mus22[6]
    bound, info = rom.certified_error_bound(
        mu, lambda m: jnp.asarray(1e-3), margin=1e-14)
    assert not bool(info["certified"])
    assert np.isinf(float(bound))


def test_certified_parabolic_bound_requires_v_row_sup(fom22, mus22):
    from rla4mor_tpu.models.semilinear import SemilinearInstationaryFOM
    from rla4mor_tpu.mor.semilinear_reductor import (
        SemilinearInstationaryROM,
    )

    fom = fom22
    ifom = SemilinearInstationaryFOM(fom, T=0.5, nt=8)
    red = SemilinearReductor(fom)
    rom = red.fit_instationary(ifom, mus22[:2], modes=2, deim_modes=3,
                               n_reserve=1)
    legacy = SemilinearInstationaryROM(
        rom.lhs, rom.M_hat, rom.rhs_hat, rom.W, rom.Pv, rom.output_row,
        rom.error_estimator, rom.nonlinearity, rom.reaction_scale,
        rom.nt, rom.dt)  # v_row_sup defaults NaN (round-4 files)
    with pytest.raises(ValueError, match="v_row_sup"):
        legacy.certified_error_bound(mus22[5], lambda m: jnp.asarray(1.0))
    # explicit override works
    b, info = legacy.certified_error_bound(
        mus22[5], lambda m: jnp.asarray(1e-2), v_row_sup=rom.v_row_sup)
    assert np.isfinite(float(b)) or not bool(info["certified"])


def test_newton_mg_preconditioner_matches_jacobi(fom22, mus22):
    """cg_precond='mg' (V-cycle on the linear stiffness — the pod-scale
    f32 recipe, benchmarks/semilinear_tpu.py) reproduces the Jacobi-CG
    Newton solution with a fraction of the inner iterations."""
    fom = make_fom(num_intervals=32)  # power of two for the V-cycle
    mu = fom.sample_parameters(2, key=3)[1]
    uj = fom.solve_newton(mu, newton_tol=1e-10, cg_tol=1e-12,
                          cg_maxiter=4000)
    um = fom.solve_newton(mu, newton_tol=1e-10, cg_tol=1e-12,
                          cg_maxiter=200, cg_precond="mg")
    np.testing.assert_allclose(np.asarray(um), np.asarray(uj), atol=1e-11)
    res = float(jnp.linalg.norm(fom.residual(mu, um))
                / jnp.linalg.norm(fom.rhs()))
    assert res < 1e-10
    with pytest.raises(ValueError, match="cg_precond"):
        fom.solve_newton(mu, cg_precond="bogus")


def test_newton_stagnation_stop(fom22, mus22):
    """Round-5: an f32 pod-scale iterate can never signal newton_tol ~
    1e-6 (its TRUE residual is floored at ~eps_f32 * lam_max * ||u|| /
    ||f||, PERF.md round-5) — solve_newton stops on stagnation instead
    of burning max_newton full Newton-CG iterations.

    f64 at this size: tol reached first, iters small, stagnation guard
    does not trigger early (solution unchanged vs a huge budget).
    f32: iteration count must stop well short of an absurd budget, and
    the returned iterate still matches the f64 solution to ~the f32
    floor."""
    mu = mus22[2]
    u64, it64 = fom22.solve_newton(mu, newton_tol=1e-10,
                                   return_iters=True)
    assert int(it64) <= 12
    res64 = float(jnp.linalg.norm(fom22.residual(mu, u64))
                  / jnp.linalg.norm(fom22.rhs()))
    assert res64 < 1e-10

    f32 = SemilinearStencilFOM(
        grid_shape=(2, 2), num_intervals=12, dtype=jnp.float32,
        nonlinearity="cubic", reaction_scale=50.0)
    mu32 = jax.tree.map(lambda x: x.astype(jnp.float32), mu)
    # unreachable tol + absurd budget: without the stagnation stop this
    # would burn all 500 iterations
    u32, it32 = f32.solve_newton(mu32, newton_tol=1e-14, max_newton=500,
                                 cg_tol=1e-7, cg_maxiter=2000,
                                 return_iters=True)
    assert int(it32) <= 20, int(it32)
    err = float(jnp.linalg.norm(u32.astype(jnp.float64) - u64)
                / jnp.linalg.norm(u64))
    assert err < 1e-5, err
