"""Nonsymmetric advection-diffusion FOM + sketched minres ROM."""

import jax.numpy as jnp
import numpy as np

from rla4mor_tpu.models import AdvectionDiffusionFOM
from rla4mor_tpu.mor import SketchedReductor
from rla4mor_tpu.ops import GaussianEmbedding


def test_fom_solve_and_nonsymmetry():
    fom = AdvectionDiffusionFOM(16)
    mu = {"eps": jnp.asarray([0.2]), "velocity": jnp.asarray([0.8, -0.4])}
    A = fom.assemble_sparse(mu)
    assert np.abs((A - A.T).toarray()).max() > 1e-3  # genuinely nonsymmetric
    u = fom.solve(mu)
    assert float(fom.residual_norm(u, mu)) < 1e-12
    # pure diffusion limit matches the Poisson solution shape
    mu0 = {"eps": jnp.asarray([1.0]), "velocity": jnp.asarray([0.0, 0.0])}
    u0 = np.asarray(fom.solve(mu0))
    assert abs(u0.max() - 0.0737) < 3e-3


def test_advection_skew_symmetric_interior():
    """Central-difference advection is skew-symmetric on interior nodes."""
    fom = AdvectionDiffusionFOM(12)
    for t in (1, 2):
        C = fom.operator.terms[t].S.toarray()
        assert np.abs(C + C.T).max() < 1e-12


def test_sketched_minres_on_nonsymmetric():
    fom = AdvectionDiffusionFOM(16)
    Ru = fom.h1_0_product
    theta = GaussianEmbedding.make(
        fom.solution_dim, sqrt_product=Ru.sqrt, range_dim=180, seed=2
    )
    phi = GaussianEmbedding.make(180, range_dim=90, seed=3)
    red = SketchedReductor(
        fom, embedding_primal=theta, embedding_online=phi, product=Ru,
        projection="minres",
    )
    mus = fom.sample_parameters(25, key=0)
    red.extend_basis(fom.solve_many(mus))
    rom = red.reduce(seed=(5, 6))

    test_mus = fom.sample_parameters(3, key=1)
    for mu in test_mus:
        u_fom = np.asarray(fom.solve(mu))
        u_rom = np.asarray(red.rb) @ np.asarray(rom.solve(mu))
        rel = float(Ru.norm(jnp.asarray(u_fom - u_rom))) / float(
            Ru.norm(jnp.asarray(u_fom))
        )
        # advection-dominated manifold (eps down to 0.05) decays slowly
        assert rel < 1e-1
        # estimator brackets the true Riesz residual of the ROM solution
        # (sketch distortion bounds; a constant/garbage estimator fails)
        est = float(rom.estimate_error(mu))
        r = np.asarray(fom.assemble_sparse(mu) @ (
            np.asarray(red.rb) @ np.asarray(rom.solve(mu))
        )) - np.asarray(fom.assemble_rhs(mu))
        true_res = float(np.sqrt(r @ np.asarray(
            Ru.inv.apply(jnp.asarray(r)))))
        assert 0.3 * true_res < est < 3.0 * true_res
