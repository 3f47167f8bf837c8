"""Classical (unsketched) RB reductor: exact estimator oracle + greedy,
and agreement with the identity-embedding sketched reductor."""

import jax.numpy as jnp
import numpy as np

from rla4mor_tpu.mor import ClassicalReductor, rb_greedy


def test_exact_residual_estimator(thermal_fom):
    fom = thermal_fom
    Ru = fom.h1_0_product
    red = ClassicalReductor(fom, product=Ru)
    mus = fom.parameter_space.sample_randomly(6, key=0)
    red.extend_basis(fom.solve_many(mus))
    rom = red.reduce()

    mu = fom.parameter_space.sample_randomly(1, key=5)[0]
    y = np.asarray(rom.solve(mu))
    u = np.asarray(red.rb) @ y
    A = fom.assemble_sparse(mu)
    b = np.asarray(fom.assemble_rhs(mu))
    r = A @ u - b
    want = float(np.sqrt(r @ np.asarray(Ru.inv.apply(jnp.asarray(r)))))
    got = float(rom.estimate_error(mu))
    assert abs(got - want) < 1e-9 * max(1.0, want)


def test_matches_galerkin_oracle(thermal_fom):
    fom = thermal_fom
    Ru = fom.h1_0_product
    red = ClassicalReductor(fom, product=Ru, orthonormalize=False)
    mus = fom.parameter_space.sample_randomly(5, key=1)
    U = fom.solve_many(mus)
    red.extend_basis(U)
    rom = red.reduce()
    mu = fom.parameter_space.sample_randomly(1, key=6)[0]
    A = np.asarray(fom.assemble_sparse(mu).toarray())
    b = np.asarray(fom.assemble_rhs(mu))
    Un = np.asarray(U)
    y_oracle = np.linalg.solve(Un.T @ A @ Un, Un.T @ b)
    assert np.allclose(np.asarray(rom.solve(mu)), y_oracle, atol=1e-9)


def test_classical_greedy_and_interp_exactness(thermal_fom):
    fom = thermal_fom
    Ru = fom.h1_0_product
    red = ClassicalReductor(fom, product=Ru)
    training = fom.parameter_space.sample_randomly(20, key=2)
    result = rb_greedy(fom, red, training, max_extensions=6)
    assert red.basis_size == 6
    assert result.max_estimates[-1] < result.max_estimates[0]
    # estimator is ~0 at a selected (interpolated) parameter
    mu_sel = result.selected_mus[0]
    rom = result.rom
    assert float(rom.estimate_error(mu_sel)) < 1e-8
