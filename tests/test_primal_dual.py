"""Primal-dual corrected outputs (mor/primal_dual.py): dual-weighted
residual correction is quadratically accurate; the residual-product
indicator tracks the corrected-output error. Uses the NONSYMMETRIC
advection-diffusion FOM so the dual problem actually differs from the
primal."""

import jax
import jax.numpy as jnp
import numpy as np

from rla4mor_tpu.models import AdvectionDiffusionFOM
from rla4mor_tpu.mor import PrimalDualReductor, dual_fom
from rla4mor_tpu.ops import GaussianEmbedding


def _setup(k=200, n_snap=6):
    fom = AdvectionDiffusionFOM(num_intervals=24)
    Ru = fom.h1_0_product
    theta = GaussianEmbedding.make(
        fom.solution_dim, sqrt_product=Ru.sqrt, range_dim=k, seed=0
    )
    phi = GaussianEmbedding.make(k, range_dim=100, seed=100)
    red = PrimalDualReductor(fom, embedding_primal=theta,
                             embedding_online=phi, product=Ru, log_level=30)
    mus = fom.sample_parameters(n_snap, key=1)
    for mu in mus:
        red.extend(mu)
    return fom, red


def test_dual_fom_is_the_adjoint():
    fom = AdvectionDiffusionFOM(num_intervals=12)
    dfom = dual_fom(fom)
    mu = fom.sample_parameters(1, key=0)[0]
    A = fom.assemble_sparse(mu).toarray()
    Ad = dfom.assemble_sparse(mu).toarray()
    assert np.allclose(Ad, A.conj().T, atol=1e-13)
    # dual rhs = c^H
    c = np.asarray(fom.output_functional.assemble(mu))  # (1, n)
    bd = np.asarray(dfom.assemble_rhs(mu))
    assert np.allclose(bd, c.conj().T[:, 0], atol=1e-14)


def test_correction_term_wiring_is_exact():
    """The online correction equals the dense z_r^H (b - A V u_r) for the
    ROM's own reduced solutions — validates the offline projections and
    the sign/conjugation independently of basis quality."""
    fom, red = _setup(n_snap=4)
    rom = red.reduce(seed=7)
    mu = fom.sample_parameters(1, key=9)[0]
    u_r = np.asarray(rom.rom_pr.solve(mu))
    z_r = np.asarray(rom.rom_du.solve(mu))
    s_plain = float(np.asarray(rom.output_plain(mu)))
    s_corr, _ = rom.output_corrected(mu)
    V, Z = np.asarray(red.primal.rb), np.asarray(red.dual.rb)
    A = fom.assemble_sparse(mu).toarray()
    b = np.asarray(fom.assemble_rhs(mu))
    corr_dense = (Z @ z_r) @ (b - A @ (V @ u_r))
    assert np.isclose(float(np.asarray(s_corr)) - s_plain, corr_dense,
                      rtol=1e-9, atol=1e-13)


def test_exact_dual_limit_and_indicator():
    """With the EXACT dual solution z(mu_t) in the dual basis the
    corrected output is exact up to the sketched-Galerkin perturbation,
    while the plain output error is orders larger; the residual-product
    indicator is finite/positive and larger for the coarse dual."""
    fom, red = _setup(n_snap=3)
    mu_t = fom.sample_parameters(1, key=9)[0]
    rom0 = red.reduce(seed=7)
    u = np.asarray(fom.solve(mu_t))
    s_true = float(np.asarray(fom.output_functional.apply(
        jnp.asarray(u), mu_t))[0])
    e_corr0 = abs(float(np.asarray(rom0.output_corrected(mu_t)[0])) - s_true)

    red.extend_dual(red.fom_dual.solve(mu_t), mu=mu_t)  # exact dual in span
    rom = red.reduce(seed=7)
    s_plain = float(np.asarray(rom.output_plain(mu_t)))
    s_corr, eta = rom.output_corrected(mu_t)
    e_plain = abs(s_plain - s_true)
    e_corr = abs(float(np.asarray(s_corr)) - s_true)
    assert e_corr < 0.1 * e_plain, (e_corr, e_plain)
    assert e_corr < e_corr0
    assert np.isfinite(float(np.asarray(eta))) and float(np.asarray(eta)) > 0


def test_corrected_output_jits_and_vmaps():
    from rla4mor_tpu.core.parameters import mu_stack

    fom, red = _setup(n_snap=4)
    rom = red.reduce(seed=3)
    mus_t = fom.sample_parameters(5, key=4)
    batch = mu_stack(mus_t)
    s_b, eta_b = jax.jit(jax.vmap(rom.output_corrected))(batch)
    assert s_b.shape == (5,) and eta_b.shape == (5,)
    s0, eta0 = rom.output_corrected(mus_t[0])
    assert np.isclose(float(s_b[0]), float(np.asarray(s0)), rtol=1e-10)
    assert np.isclose(float(eta_b[0]), float(np.asarray(eta0)), rtol=1e-10)


def test_output_greedy():
    """Goal-oriented greedy: indicator decays; the final corrected output
    is accurate on held-out parameters."""
    from rla4mor_tpu.mor import output_greedy

    fom = AdvectionDiffusionFOM(num_intervals=20)
    Ru = fom.h1_0_product
    theta = GaussianEmbedding.make(
        fom.solution_dim, sqrt_product=Ru.sqrt, range_dim=200, seed=0
    )
    phi = GaussianEmbedding.make(200, range_dim=100, seed=100)
    red = PrimalDualReductor(fom, embedding_primal=theta,
                             embedding_online=phi, product=Ru, log_level=30)
    train = fom.sample_parameters(20, key=3)
    rom, hist = output_greedy(fom, red, train, max_extensions=7,
                              log_level=30)
    ind = hist["max_indicators"]
    assert ind[-1] < 0.2 * ind[0]
    rel_errs = []
    for mu in fom.sample_parameters(4, key=11):
        u = np.asarray(fom.solve(mu))
        s_true = float(np.asarray(fom.output_functional.apply(
            jnp.asarray(u), mu))[0])
        s_c, _ = rom.output_corrected(mu)
        rel_errs.append(abs(float(np.asarray(s_c)) - s_true)
                        / max(abs(s_true), 1e-300))
    assert max(rel_errs) < 5e-3, rel_errs
