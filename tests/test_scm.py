"""Successive constraint method (mor/scm.py): rigor and tightness.

Oracle pattern (reference preconditioners/tests.py style): every SCM
bound is checked against the dense generalized-eigenvalue / SVD truth.
"""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.linalg as sla
import scipy.sparse as sps

from rla4mor_tpu.mor import ScmCoercivity, ScmInfSup
from rla4mor_tpu.mor.bounds import InfSupLowerBound


def _alpha_true(fom, R, mu):
    A = np.asarray(fom.assemble_sparse(mu).toarray())
    A = 0.5 * (A + A.conj().T)
    return float(sla.eigh(A, R, subset_by_index=[0, 0],
                          eigvals_only=True)[0])


def _beta_true(fom, Q, mu):
    A = np.asarray(fom.assemble_sparse(mu).toarray())
    B = np.linalg.solve(Q.conj().T, A)
    B = np.linalg.solve(Q.T, B.T).T
    return float(np.linalg.svd(B, compute_uv=False)[-1])


def test_scm_coercivity_thermal_block(thermal_fom):
    """Fit on a training grid, then: LB <= alpha_true <= UB on unseen
    mus (rigor), LB > 0, and the certified gap holds on the training
    set."""
    fom = thermal_fom
    Ru = fom.h1_0_product
    R = np.asarray(Ru.op.S.toarray())

    scm = ScmCoercivity(fom, product=Ru)
    train = fom.parameter_space.sample_randomly(24, key=0)
    hist = scm.fit(train, tol=0.1, max_anchors=20)
    assert hist["n_anchors"] <= 20
    assert hist["max_gap"][-1] <= 0.1

    # certified on the training set
    for mu in train[:6]:
        lb, ub = scm.lower(mu), scm.upper(mu)
        assert 0 < lb <= ub * (1 + 1e-12)
        assert lb >= (1 - 0.1) * ub - 1e-14

    # rigor on unseen parameters
    test = fom.parameter_space.sample_randomly(6, key=99)
    for mu in test:
        a = _alpha_true(fom, R, mu)
        lb, ub = scm.lower(mu), scm.upper(mu)
        assert lb <= a * (1 + 1e-9), (lb, a)
        assert ub >= a * (1 - 1e-9), (ub, a)
        assert lb > 0


def test_scm_coercivity_certified_tightness(thermal_fom):
    """Certified tightness: on every training mu the fit guarantees
    LB >= (1 - tol) * UB, and UB >= alpha_true, hence
    LB >= (1 - tol) * alpha_true. (Note min-theta is already SHARP for
    this parametrically coercive family — SCM's value is matching it
    within tol here while also covering indefinite/non-coercive
    families, where min-theta does not apply at all.)"""
    fom = thermal_fom
    Ru = fom.h1_0_product
    R = np.asarray(Ru.op.S.toarray())
    tol = 0.05
    scm = ScmCoercivity(fom, product=Ru)
    train = fom.parameter_space.sample_randomly(24, key=0)
    scm.fit(train, tol=tol)

    for mu in train[:8]:
        lb = scm.lower(mu)
        a = _alpha_true(fom, R, mu)
        assert lb >= (1 - tol) * a * (1 - 1e-9), (lb, a)


def test_scm_infsup_helmholtz():
    """Complex-coefficient squared-form SCM on the damped Helmholtz
    family: beta_LB <= true sigma_min everywhere (rigor), positive and
    certified after fit, and positive FAR from anchors where the Weyl
    SCM-lite bound has gone nonpositive."""
    from rla4mor_tpu.models import helmholtz_fom

    fom = helmholtz_fom(num_intervals=12, wavenumber_range=(2.0, 6.0),
                        damping=0.5)
    Ru = fom.h1_0_product
    Qd = np.asarray(Ru.sqrt.S.toarray() if hasattr(Ru.sqrt, "S")
                    else Ru.sqrt.matrix())

    scm = ScmInfSup(fom, product=Ru)
    train = [{"wavenumber": jnp.asarray([w])}
             for w in np.linspace(2.0, 6.0, 16)]
    hist = scm.fit(train, tol=0.2, max_anchors=14)
    assert hist["max_gap"][-1] <= 0.2

    rng = np.random.RandomState(3)
    for w in rng.uniform(2.0, 6.0, size=5):
        mu = {"wavenumber": jnp.asarray([w])}
        blb = scm.lower(mu)
        bt = _beta_true(fom, Qd, mu)
        assert blb <= bt * (1 + 1e-8) + 1e-12, (w, blb, bt)
        assert blb > 0

    # the Weyl bound with a SINGLE far anchor is nonpositive at w=6 while
    # the SCM (same single anchor + box) stays a valid bound
    one_ref = [{"wavenumber": jnp.asarray([2.0])}]
    weyl = InfSupLowerBound(fom, one_ref, product=Ru)
    far = {"wavenumber": jnp.asarray([6.0])}
    assert float(np.asarray(weyl(far))) <= 0
    scm1 = ScmInfSup(fom, product=Ru)
    scm1.scm.add_anchor(one_ref[0])
    assert scm1.lower(far) <= _beta_true(fom, Qd, far) * (1 + 1e-8)


def test_scm_infsup_certified_error_bound():
    """ScmInfSup drops into inf_sup_error_bound: with the exact residual
    estimator the certified bound dominates the true R-norm error."""
    from rla4mor_tpu.models import helmholtz_fom
    from rla4mor_tpu.mor import SketchedReductor, inf_sup_error_bound
    from rla4mor_tpu.ops import IdentityEmbedding

    fom = helmholtz_fom(num_intervals=12, wavenumber_range=(2.0, 6.0),
                        damping=0.5)
    Ru = fom.h1_0_product
    n = fom.solution_dim

    scm = ScmInfSup(fom, product=Ru)
    train = [{"wavenumber": jnp.asarray([w])}
             for w in np.linspace(2.0, 6.0, 16)]
    scm.fit(train, tol=0.2, max_anchors=14)

    theta = IdentityEmbedding(n, sqrt_product=Ru.sqrt)
    red = SketchedReductor(fom, embedding_primal=theta, product=Ru,
                           orthonormalize=True, projection="galerkin",
                           log_level=30)
    mus = fom.parameter_space.sample_randomly(6, key=3)
    red.extend_basis(fom.solve_many(mus))
    rom = red.reduce(seed=5)

    for w in (2.7, 4.9):
        mu = {"wavenumber": jnp.asarray([w])}
        u = jnp.asarray(fom.solve(mu))
        u_r = rom.solve(mu)
        err = float(Ru.norm(u - red.rb @ u_r))
        bnd = float(np.asarray(inf_sup_error_bound(rom, mu, scm, u_r=u_r)))
        assert np.isfinite(bnd)
        assert err <= bnd * (1 + 1e-9), (w, err, bnd)


def test_scm_certified_parabolic_bound():
    """ScmCoercivity consumes the parabolic FOM (same .operator
    protocol) and composes with parabolic_error_bound — an SCM-certified
    final-time bound that dominates the true M-norm error and sits in
    the same ballpark as min-theta (tightness at held-out mus depends on
    the anchor set; rigor does not); pod_greedy(coercivity=scm) runs via
    tabulate (the LP is host-eager, not jittable)."""
    from rla4mor_tpu.core.orthonormalize import pod
    from rla4mor_tpu.models import (
        InstationaryReductor, instationary_thermal_block, pod_greedy,
    )
    from rla4mor_tpu.mor import (
        MinThetaCoercivity, ScmCoercivity, parabolic_error_bound,
    )
    from rla4mor_tpu.ops import GaussianEmbedding

    pfom = instationary_thermal_block((2, 2), 8, T=0.5, nt=10)
    Ru = pfom.products["h1_0"]
    emb = GaussianEmbedding.make(pfom.solution_dim, sqrt_product=Ru.sqrt,
                                 range_dim=120, seed=3)
    red = InstationaryReductor(pfom, embedding=emb, product=Ru,
                               log_level=30)
    for mu in pfom.parameter_space.sample_randomly(2, key=1):
        modes, _ = pod(pfom.solve(mu), product=Ru, rtol=1e-6)
        red.extend_basis(modes[:, :4])
    rom = red.reduce()

    scm = ScmCoercivity(pfom, product=Ru)
    scm.fit(pfom.parameter_space.sample_randomly(12, key=4), tol=0.2)
    mt = MinThetaCoercivity(pfom, {"diffusion": jnp.full(4, 0.55)},
                            product=Ru)

    mu_t = pfom.parameter_space.sample_randomly(1, key=9)[0]
    rec = np.asarray(red.reconstruct(rom.solve(mu_t)))
    e = rec - np.asarray(pfom.solve(mu_t))
    M = sps.csc_matrix(pfom.mass.S).toarray()
    err_final = float(np.sqrt(e[:, -1] @ (M @ e[:, -1])))
    b_scm = float(parabolic_error_bound(rom, mu_t, scm))
    b_mt = float(parabolic_error_bound(rom, mu_t, mt))
    assert err_final <= b_scm
    assert err_final <= b_mt
    assert b_scm <= 2.0 * b_mt, (b_scm, b_mt)  # same ballpark

    # certified greedy via tabulate
    red2 = InstationaryReductor(pfom, embedding=emb, product=Ru,
                                log_level=30)
    _, hist = pod_greedy(pfom, red2,
                         pfom.parameter_space.sample_randomly(6, key=7),
                         max_extensions=3, coercivity=scm, log_level=30)
    assert all(np.isfinite(hist["max_estimates"]))
