"""Goal-oriented parabolic MOR (models/instationary_primal_dual.py):
discrete-adjoint identity, dual-corrected outputs, output indicator,
goal-oriented POD-greedy.

Beyond-reference (the reference is stationary-only with no output error
control); parabolic analog of tests/test_primal_dual.py."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rla4mor_tpu.core.affine import AffineDense
from rla4mor_tpu.core.orthonormalize import pod
from rla4mor_tpu.core.parameters import ONE, mu_stack
from rla4mor_tpu.models import (
    InstationaryPrimalDualReductor,
    instationary_thermal_block,
    output_pod_greedy,
    solve_dual,
)
from rla4mor_tpu.ops import GaussianEmbedding


@pytest.fixture(scope="module")
def pfom():
    """Parabolic thermal block with a NON-compliant localized output
    (mean over the lower-left 3x3 interior patch) — with the default
    compliant output (l = b) the dual span nearly equals the primal span
    and the correction is invisible; the localized output exposes it."""
    fom = instationary_thermal_block((2, 2), 8, T=0.5, nt=10)
    nx = 8
    w = np.zeros((nx - 1, nx - 1))
    w[:3, :3] = 1.0
    fom.output_functional = AffineDense(
        jnp.asarray(w.reshape(1, 1, -1) / w.sum()), (ONE,)
    )
    return fom


@pytest.fixture(scope="module")
def emb(pfom):
    Ru = pfom.products["h1_0"]
    return GaussianEmbedding.make(
        pfom.solution_dim, sqrt_product=Ru.sqrt, range_dim=120, seed=3
    )


def s_of(pfom, traj, mu):
    return float(np.asarray(
        pfom.output_functional.apply(jnp.asarray(traj), mu)
    )[0, -1])


def test_discrete_adjoint_identity(pfom):
    """The discrete adjoint satisfies the summation-by-parts identity:
    with the zero 'ROM' trajectory (u0 = 0), every step residual is
    dt*b, so s(mu) = sum_k z_k^H (dt b) EXACTLY."""
    mu = pfom.parameter_space.sample_randomly(1, key=2)[0]
    traj = pfom.solve(mu)
    s = s_of(pfom, traj, mu)
    z = np.asarray(solve_dual(pfom, mu))     # (n, nt)
    b = pfom.assemble_rhs(mu)
    s_dual = float(pfom.dt * np.sum(z.conj() * b[:, None]))
    assert abs(s - s_dual) < 1e-12 * max(1.0, abs(s))


def test_correction_exact_in_either_limit(pfom, emb):
    """s - s_c = sum (z - Z zeta)^H r_k: machine-zero when the dual basis
    spans the exact adjoint trajectory (any primal basis) and when the
    primal basis spans the exact trajectory (any dual basis)."""
    Ru = pfom.products["h1_0"]
    mu = pfom.parameter_space.sample_randomly(1, key=5)[0]
    traj = pfom.solve(mu)
    ztraj = solve_dual(pfom, mu)
    s = s_of(pfom, traj, mu)

    red = InstationaryPrimalDualReductor(pfom, embedding=emb, product=Ru,
                                         log_level=30)
    modes_p, _ = pod(traj, product=Ru, modes=2)
    red.extend_primal(modes_p)
    red.extend_dual(ztraj)
    rom = red.reduce()
    s_plain = float(rom.output_plain(mu))
    s_c, eta = rom.output_corrected(mu)
    assert abs(s_plain - s) > 1e-8        # the coarse primal IS wrong
    assert abs(float(s_c) - s) < 1e-12    # ... and the correction fixes it
    assert float(eta) < 1e-12             # dual residual is zero

    red2 = InstationaryPrimalDualReductor(pfom, embedding=emb, product=Ru,
                                          log_level=30)
    red2.extend_primal(traj[:, 1:])       # spans the trajectory (u0 = 0)
    modes_z, _ = pod(ztraj, product=Ru, modes=2)
    red2.extend_dual(modes_z)
    rom2 = red2.reduce()
    s_c2, eta2 = rom2.output_corrected(mu)
    assert abs(float(s_c2) - s) < 1e-12   # primal residual is zero


def test_corrected_output_beats_plain(pfom, emb):
    """Generic bases: the dual correction reduces the output error by
    >= 10x on the non-compliant output, and eta_s tracks |s - s_c|
    within a factor of 50."""
    Ru = pfom.products["h1_0"]
    mu = pfom.parameter_space.sample_randomly(1, key=5)[0]
    s = s_of(pfom, pfom.solve(mu), mu)

    red = InstationaryPrimalDualReductor(pfom, embedding=emb, product=Ru,
                                         log_level=30)
    for m in pfom.parameter_space.sample_randomly(3, key=1):
        red.extend(m, modes_per_extension=2)
    rom = red.reduce()
    err_plain = abs(float(rom.output_plain(mu)) - s)
    s_c, eta = rom.output_corrected(mu)
    err_corr = abs(float(s_c) - s)
    assert err_corr < 0.1 * err_plain, (err_corr, err_plain)
    assert err_corr / 50 <= float(eta) <= 50 * max(err_corr, 1e-14)

    # one jittable/vmappable call
    batch = mu_stack(pfom.parameter_space.sample_randomly(4, key=8))
    sc, etas = jax.jit(jax.vmap(rom.output_corrected))(batch)
    assert sc.shape == (4,) and bool(jnp.all(jnp.isfinite(etas)))


def test_output_pod_greedy(pfom, emb):
    """Goal-oriented POD-greedy: output indicators decay by >= 50x and
    the final corrected output is accurate at a held-out parameter."""
    Ru = pfom.products["h1_0"]
    red = InstationaryPrimalDualReductor(pfom, embedding=emb, product=Ru,
                                         log_level=30)
    train = pfom.parameter_space.sample_randomly(8, key=7)
    rom, hist = output_pod_greedy(pfom, red, train, max_extensions=5,
                                  modes_per_extension=2, log_level=30)
    ind = hist["max_indicators"]
    assert ind[-1] < 0.02 * ind[0]

    mu_t = pfom.parameter_space.sample_randomly(1, key=5)[0]
    s = s_of(pfom, pfom.solve(mu_t), mu_t)
    s_c, eta = rom.output_corrected(mu_t)
    assert abs(float(s_c) - s) < 1e-4 * max(1.0, abs(s))
    assert abs(float(s_c) - s) <= 50 * float(eta)


def test_multi_term_output_rejected_and_crank_nicolson(pfom, emb):
    """Multi-output functionals are rejected; the machinery works for
    Crank-Nicolson (time_theta=0.5) with exact dual-limit correction."""
    Ru = pfom.products["h1_0"]
    bad = instationary_thermal_block((2, 2), 6, T=0.5, nt=4)
    bad.output_functional = AffineDense(
        jnp.ones((1, 2, bad.solution_dim)), (ONE,)
    )
    with pytest.raises(AssertionError, match="single outputs"):
        InstationaryPrimalDualReductor(bad, embedding=None, log_level=30)

    cn = instationary_thermal_block((2, 2), 8, T=0.5, nt=10,
                                    time_theta=0.5)
    cn.output_functional = pfom.output_functional
    mu = cn.parameter_space.sample_randomly(1, key=5)[0]
    traj = cn.solve(mu)
    s = s_of(cn, traj, mu)
    red = InstationaryPrimalDualReductor(cn, embedding=emb, product=Ru,
                                         log_level=30)
    modes_p, _ = pod(traj, product=Ru, modes=2)
    red.extend_primal(modes_p)
    red.extend_dual(solve_dual(cn, mu))
    rom = red.reduce()
    s_c, _ = rom.output_corrected(mu)
    assert abs(float(rom.output_plain(mu)) - s) > 1e-8
    assert abs(float(s_c) - s) < 1e-12


def test_padded_reduce_equals_unpadded(pfom, emb):
    """pad_to/pad_dual_to fix all shapes; the dead primal columns and
    dead dual block are exactly inert, so corrected output and indicator
    equal the live-size ROM's; output_pod_greedy(pad_to=...) selects the
    same mus with one compile."""
    Ru = pfom.products["h1_0"]
    red = InstationaryPrimalDualReductor(pfom, embedding=emb, product=Ru,
                                         log_level=30)
    for m in pfom.parameter_space.sample_randomly(2, key=1):
        red.extend(m, modes_per_extension=2)
    rom = red.reduce()
    rom_p = red.reduce(pad_to=red.primal.basis_size + 3,
                       pad_dual_to=red.dual_basis_size + 2)
    mu = pfom.parameter_space.sample_randomly(1, key=5)[0]
    s1, e1 = rom.output_corrected(mu)
    s2, e2 = rom_p.output_corrected(mu)
    assert np.isclose(float(s2), float(s1), rtol=1e-12)
    assert np.isclose(float(e2), float(e1), rtol=1e-10)

    def run(pad):
        r = InstationaryPrimalDualReductor(pfom, embedding=emb,
                                           product=Ru, log_level=30)
        train = pfom.parameter_space.sample_randomly(6, key=7)
        return output_pod_greedy(pfom, r, train, max_extensions=3,
                                 modes_per_extension=2, pad_to=pad,
                                 log_level=30)
    _, h_a = run(None)
    _, h_b = run(6)
    assert np.allclose(h_a["max_indicators"], h_b["max_indicators"],
                       rtol=1e-9)

    # embedding-less reductor is rejected by the greedy (silent-stop guard)
    bare = InstationaryPrimalDualReductor(pfom, embedding=None,
                                          product=Ru, log_level=30)
    with pytest.raises(AssertionError, match="embeddings"):
        output_pod_greedy(pfom, bare,
                          pfom.parameter_space.sample_randomly(2, key=1),
                          max_extensions=2, log_level=30)


def test_time_integrated_output(pfom, emb):
    """output_kind='integral' (right-endpoint quadrature s = dt sum l^H
    u_k): the distributed-source adjoint makes the correction exact in
    the dual limit, beats plain Galerkin on generic bases, the indicator
    tracks, and the kind round-trips through save_rom."""
    from rla4mor_tpu.mor import load_rom, save_rom

    Ru = pfom.products["h1_0"]
    mu = pfom.parameter_space.sample_randomly(1, key=5)[0]
    traj = pfom.solve(mu)
    outs = np.asarray(pfom.output_functional.apply(traj, mu))[0]
    s_int = pfom.dt * outs[1:].sum()

    red = InstationaryPrimalDualReductor(
        pfom, embedding=emb, product=Ru, output_kind="integral",
        log_level=30,
    )
    modes_p, _ = pod(traj, product=Ru, modes=2)
    red.extend_primal(modes_p)
    red.extend_dual(solve_dual(pfom, mu, output_kind="integral"))
    rom = red.reduce()
    assert abs(float(rom.output_plain(mu)) - s_int) > 1e-7
    s_c, eta = rom.output_corrected(mu)
    assert abs(float(s_c) - s_int) < 1e-12
    assert float(eta) < 1e-12

    red2 = InstationaryPrimalDualReductor(
        pfom, embedding=emb, product=Ru, output_kind="integral",
        log_level=30,
    )
    for m in pfom.parameter_space.sample_randomly(3, key=1):
        red2.extend(m, modes_per_extension=2)
    rom2 = red2.reduce()
    err_plain = abs(float(rom2.output_plain(mu)) - s_int)
    s_c2, eta2 = rom2.output_corrected(mu)
    err_corr = abs(float(s_c2) - s_int)
    assert err_corr < 0.1 * err_plain
    assert err_corr / 50 <= float(eta2) <= 50 * max(err_corr, 1e-14)

    import tempfile
    with tempfile.TemporaryDirectory() as td:
        p = f"{td}/rom.npz"
        save_rom(rom2, p)
        rom3 = load_rom(p)
        assert rom3.output_kind == "integral"
        s3, e3 = rom3.output_corrected(mu)
        assert float(s3) == float(s_c2) and float(e3) == float(eta2)

    with pytest.raises(ValueError, match="output_kind"):
        InstationaryPrimalDualReductor(pfom, embedding=emb,
                                       output_kind="mean", log_level=30)
