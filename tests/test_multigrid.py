"""Geometric multigrid preconditioner tests."""

import jax
import jax.numpy as jnp
import numpy as np

from rla4mor_tpu.core.solvers import cg
from rla4mor_tpu.models.multigrid import (
    coarsen_kappa,
    make_vcycle,
    prolong_bilinear,
    restrict_full_weighting,
)
from rla4mor_tpu.models.stencil import StencilThermalBlock, interior_mask
from rla4mor_tpu.models import ThermalBlockFOM


def test_transfer_adjointness(rng):
    """Full-weighting restriction == bilinear prolongation^T / 4."""
    n_fine = 17
    nc = 9
    r = jnp.asarray(rng.normal(size=(n_fine, n_fine))) * interior_mask(n_fine, jnp.float64)
    e = jnp.asarray(rng.normal(size=(nc, nc))) * interior_mask(nc, jnp.float64)
    lhs = float(jnp.vdot(restrict_full_weighting(r), e))
    rhs = float(jnp.vdot(r, prolong_bilinear(e, n_fine))) / 4.0
    assert np.isclose(lhs, rhs, rtol=1e-12)


def test_coarsen_kappa():
    k = jnp.arange(16.0).reshape(4, 4)
    kc = np.asarray(coarsen_kappa(k))
    assert kc.shape == (2, 2)
    assert np.isclose(kc[0, 0], np.mean([0, 1, 4, 5]))


def test_mg_cg_correct_and_faster():
    st = StencilThermalBlock((2, 2), 64, dtype=jnp.float64)
    mu = {"diffusion": jnp.asarray([0.3, 1.0, 2.0, 0.7])}
    b = st.rhs()
    diag = st.jacobi_diag(mu)
    r_j = cg(lambda u: st.apply(mu, u), b, precond=lambda r: r / diag,
             tol=1e-11, maxiter=10000)
    vc = make_vcycle(st.kappa(mu))
    r_m = cg(lambda u: st.apply(mu, u), b, precond=vc, tol=1e-11, maxiter=500)
    assert np.abs(np.asarray(r_j.x) - np.asarray(r_m.x)).max() < 1e-9
    assert int(r_m.iters) < int(r_j.iters) / 2

    # matches the assembled direct solve
    fom = ThermalBlockFOM((2, 2), 64)
    want = np.asarray(fom.solve(mu))
    got = np.asarray(r_m.x).reshape(-1)[fom.interior]
    assert np.allclose(got, want, atol=1e-8)


def test_mg_solve_cg_interface():
    st = StencilThermalBlock((2, 2), 32, dtype=jnp.float64)
    mu = {"diffusion": jnp.asarray([0.5, 1.5, 0.8, 1.1])}
    u1 = jax.jit(lambda m: st.solve_cg(m, tol=1e-11, maxiter=400,
                                       precond="mg"))(mu)
    u2 = st.solve_cg(mu, tol=1e-11, maxiter=5000, precond="jacobi")
    assert np.abs(np.asarray(u1) - np.asarray(u2)).max() < 1e-9


def test_traced_transfer_matrices_match_numpy_oracle():
    """Iota-built 1-D transfer factors (used under trace, so pod-scale
    programs carry no (nf, nc) literals) reproduce the explicit numpy
    stencil rows exactly."""
    from rla4mor_tpu.models.multigrid import (
        _prolong_1d,
        _prolong_1d_np,
        _restrict_1d,
        _restrict_1d_np,
    )

    for n_fine in (5, 9, 17, 65):
        R = np.asarray(_restrict_1d(n_fine, jnp.float64))
        P = np.asarray(_prolong_1d(n_fine, jnp.float64))
        assert np.array_equal(R, _restrict_1d_np(n_fine, "float64"))
        assert np.array_equal(P, _prolong_1d_np(n_fine, "float64"))
