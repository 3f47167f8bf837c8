"""Instationary (parabolic) models: implicit-Euler FOM oracle, Galerkin
ROM convergence, sketched space-time residual estimator, POD-greedy.

Beyond-reference functionality (the reference is stationary-only); modeled
on pyMOR's InstationaryModel workflow."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sps

from rla4mor_tpu.models import (
    InstationaryReductor,
    instationary_thermal_block,
    pod_greedy,
)
from rla4mor_tpu.ops import GaussianEmbedding


@pytest.fixture(scope="module")
def pfom():
    return instationary_thermal_block((2, 2), 12, T=0.5, nt=20)


def test_implicit_euler_matches_dense_oracle(pfom):
    mu = pfom.parameter_space.sample_randomly(1, key=0)[0]
    traj = np.asarray(pfom.solve(mu))
    A = pfom._assemble_A(mu).toarray()
    M = sps.csc_matrix(pfom.mass.S).toarray()
    b = pfom.assemble_rhs(mu)
    u = np.zeros(A.shape[0])
    out = [u]
    for _ in range(pfom.nt):
        u = np.linalg.solve(M + pfom.dt * A, M @ u + pfom.dt * b)
        out.append(u)
    assert np.abs(traj - np.stack(out, 1)).max() < 1e-12


def test_rom_converges_with_basis_size(pfom):
    """Galerkin ROM trajectory error decreases as POD basis grows."""
    from rla4mor_tpu.core.orthonormalize import pod

    Ru = pfom.products["h1_0"]
    mus = pfom.parameter_space.sample_randomly(6, key=1)
    snaps = jnp.concatenate([pfom.solve(m) for m in mus], axis=1)
    mu_t = pfom.parameter_space.sample_randomly(1, key=2)[0]
    tr_f = pfom.solve(mu_t)

    errs = []
    for r in (2, 6, 12):
        modes, _ = pod(snaps, product=Ru, modes=r)
        red = InstationaryReductor(pfom, product=Ru, log_level=30)
        red.extend_basis(modes)
        rom = red.reduce()
        rec = red.reconstruct(rom.solve(mu_t))
        errs.append(float(jnp.linalg.norm(rec - tr_f) /
                          jnp.linalg.norm(tr_f)))
    assert errs[2] < errs[1] < errs[0]
    assert errs[2] < 2e-2


def test_estimator_tracks_error(pfom):
    """Sketched space-time residual estimate decreases with basis size and
    vanishes (to sketch accuracy) when the solution manifold is captured."""
    from rla4mor_tpu.core.orthonormalize import pod

    Ru = pfom.products["h1_0"]
    theta = GaussianEmbedding.make(
        pfom.solution_dim, sqrt_product=Ru.sqrt, range_dim=100, seed=3
    )
    mus = pfom.parameter_space.sample_randomly(6, key=3)
    snaps = jnp.concatenate([pfom.solve(m) for m in mus], axis=1)
    mu_t = pfom.parameter_space.sample_randomly(1, key=4)[0]

    ests = []
    for r in (2, 8, 20):
        modes, _ = pod(snaps, product=Ru, modes=r)
        red = InstationaryReductor(pfom, embedding=theta, product=Ru,
                                   log_level=30)
        red.extend_basis(modes)
        rom = red.reduce()
        ests.append(float(rom.estimate_error(mu_t)))
    assert ests[2] < ests[1] < ests[0]


def test_pod_greedy(pfom):
    """POD-greedy: estimates decay and the final ROM is accurate at an
    unseen test parameter; the sweep is one jitted vmap per iteration."""
    Ru = pfom.products["h1_0"]
    theta = GaussianEmbedding.make(
        pfom.solution_dim, sqrt_product=Ru.sqrt, range_dim=80, seed=5
    )
    red = InstationaryReductor(pfom, embedding=theta, product=Ru,
                               log_level=30)
    train = pfom.parameter_space.sample_randomly(15, key=6)
    rom, hist = pod_greedy(pfom, red, train, max_extensions=8, log_level=30)
    est = hist["max_estimates"]
    assert est[-1] < 0.5 * est[0]

    mu_t = pfom.parameter_space.sample_randomly(1, key=7)[0]
    rec = red.reconstruct(rom.solve(mu_t))
    tr_f = pfom.solve(mu_t)
    rel = float(jnp.linalg.norm(rec - tr_f) / jnp.linalg.norm(tr_f))
    assert rel < 0.1

    # batched estimation vmaps (used inside the greedy sweep)
    from rla4mor_tpu.core.parameters import mu_stack

    batch = mu_stack(pfom.parameter_space.sample_randomly(4, key=8))
    ests = jax.jit(jax.vmap(rom.estimate_error))(batch)
    assert ests.shape == (4,) and bool(jnp.all(jnp.isfinite(ests)))
