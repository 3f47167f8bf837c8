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
    # the estimate drops by an order of magnitude (r=20 of ~300 snapshot
    # columns; measured ratio ~17x) — guards constant-offset estimators
    # that would still pass the monotone check
    assert ests[2] < 0.1 * ests[0]


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


def test_reduce_padded_equals_unpadded(pfom):
    """pad_to fixes all ROM shapes; dead coordinates stay zero, so the
    trajectory and estimate equal the live-size ROM exactly."""
    Ru = pfom.products["h1_0"]
    theta = GaussianEmbedding.make(
        pfom.solution_dim, sqrt_product=Ru.sqrt, range_dim=80, seed=5
    )
    red = InstationaryReductor(pfom, embedding=theta, product=Ru,
                               log_level=30)
    mus = pfom.parameter_space.sample_randomly(3, key=9)
    for mu in mus[:2]:
        traj = pfom.solve(mu)
        from rla4mor_tpu.core.orthonormalize import pod
        modes, _ = pod(red.project_trajectory(traj), product=Ru, modes=2)
        red.extend_basis(modes)
    r = red.basis_size
    rom = red.reduce()
    rom_p = red.reduce(pad_to=r + 5)

    mu = mus[2]
    t1, e1 = rom.solve(mu, return_estimate=True)
    t2, e2 = rom_p.solve(mu, return_estimate=True)
    assert t2.shape[0] == r + 5
    assert np.allclose(np.asarray(t2[r:]), 0.0)          # dead coords stay 0
    assert np.allclose(np.asarray(t2[:r]), np.asarray(t1), atol=1e-12)
    assert np.isclose(float(e2), float(e1), rtol=1e-12)


def test_pod_greedy_padded_matches_plain(pfom):
    """pad_to changes compilation strategy only: same selected mus, same
    estimate trajectory."""
    Ru = pfom.products["h1_0"]

    def run(pad_to):
        theta = GaussianEmbedding.make(
            pfom.solution_dim, sqrt_product=Ru.sqrt, range_dim=80, seed=5
        )
        red = InstationaryReductor(pfom, embedding=theta, product=Ru,
                                   log_level=30)
        train = pfom.parameter_space.sample_randomly(10, key=16)
        return pod_greedy(pfom, red, train, max_extensions=5,
                          pad_to=pad_to, log_level=30)

    rom_a, hist_a = run(None)
    rom_b, hist_b = run(8)
    assert [tuple(np.asarray(m["diffusion"])) for m in hist_a["selected_mus"]] == \
        [tuple(np.asarray(m["diffusion"])) for m in hist_b["selected_mus"]]
    assert np.allclose(hist_a["max_estimates"], hist_b["max_estimates"],
                       rtol=1e-10)
    assert rom_b.dim == rom_a.dim  # final ROM handed back unpadded


def test_mass_apply_matches_assembled():
    """Gather-form consistent Q1 mass stencil == the scipy-assembled
    l2 product (same interior-index mapping as the stiffness test)."""
    from rla4mor_tpu.models import ThermalBlockFOM
    from rla4mor_tpu.models.stencil import mass_apply, mass_diag

    nx = 12
    fom = ThermalBlockFOM((2, 2), nx)
    rngl = np.random.RandomState(3)
    u_int = rngl.normal(size=fom.solution_dim)
    grid = np.zeros((nx + 1) * (nx + 1))
    grid[fom.interior] = u_int
    grid = jnp.asarray(grid.reshape(nx + 1, nx + 1))
    want = fom.l2_product.op.S @ u_int
    got = np.asarray(mass_apply(grid, 1.0 / nx)).reshape(-1)[fom.interior]
    assert np.allclose(got, want, atol=1e-12)
    d = np.asarray(mass_diag(nx + 1, 1.0 / nx, jnp.float64)).reshape(-1)
    assert np.allclose(d[fom.interior], fom.l2_product.op.S.diagonal(),
                       atol=1e-14)


def test_instationary_stencil_matches_host_lu():
    """Device-native implicit-Euler trajectory (CG per step inside one
    scan) == the host-LU InstationaryFOM on the same mesh; the
    mass-shifted MG preconditioner gives the same trajectory."""
    from rla4mor_tpu.models import (
        InstationaryStencilFOM, instationary_thermal_block,
    )
    from rla4mor_tpu.models.stencil import StencilThermalBlock

    nx, nt = 16, 10
    host = instationary_thermal_block((2, 2), nx, T=0.5, nt=nt)
    st = StencilThermalBlock((2, 2), nx, dtype=jnp.float64)
    dev = InstationaryStencilFOM(st, T=0.5, nt=nt)
    mu = host.parameter_space.sample_randomly(1, key=4)[0]

    traj_host = np.asarray(host.solve(mu))  # (n_int, nt+1)
    traj_dev = np.asarray(dev.solve(mu, tol=1e-12, maxiter=500))
    # map grid trajectory to interior indices
    from rla4mor_tpu.models import ThermalBlockFOM

    interior = ThermalBlockFOM((2, 2), nx).interior
    flat = traj_dev.reshape(-1, traj_dev.shape[-1])[interior]
    scale = np.abs(traj_host).max()
    assert np.abs(flat - traj_host).max() < 1e-8 * scale

    traj_mg = np.asarray(dev.solve(mu, tol=1e-12, maxiter=200, precond="mg"))
    assert np.abs(traj_mg - traj_dev).max() < 1e-8 * scale

    # store_every subsamples consistently
    traj_s = np.asarray(dev.solve(mu, tol=1e-12, maxiter=500, store_every=5))
    assert traj_s.shape[-1] == nt // 5 + 1
    assert np.abs(traj_s[:, :, 1] - traj_dev[:, :, 5]).max() < 1e-10 * scale


def test_pod_greedy_on_device_stencil_fom():
    """Big-n path end-to-end: POD-greedy drives the device-native
    parabolic stencil FOM through InstationaryReductor (estimates decay;
    final ROM trajectory accurate against the device FOM truth)."""
    from rla4mor_tpu.models import (
        InstationaryReductor, InstationaryStencilFOM, pod_greedy,
    )
    from rla4mor_tpu.models.stencil import StencilThermalBlock
    from rla4mor_tpu.ops import GaussianEmbedding

    st = StencilThermalBlock((2, 2), 16, dtype=jnp.float64)
    dev = InstationaryStencilFOM(st, T=0.5, nt=10)
    view = dev.as_reductor_fom(tol=1e-11, maxiter=500)
    theta = GaussianEmbedding.make(view.solution_dim, range_dim=80, seed=2)
    red = InstationaryReductor(view, embedding=theta, log_level=30)
    train = view.parameter_space.sample_randomly(8, key=7)
    rom, hist = pod_greedy(view, red, train, max_extensions=5,
                           pad_to=6, log_level=30)
    est = hist["max_estimates"]
    assert est[-1] < est[0]

    mu_t = view.parameter_space.sample_randomly(1, key=9)[0]
    rec = red.reconstruct(rom.solve(mu_t))
    truth = np.asarray(view.solve(mu_t))
    rel = np.linalg.norm(rec - truth) / np.linalg.norm(truth)
    assert rel < 0.1


def test_crank_nicolson_second_order():
    """time_theta=0.5 (Crank-Nicolson) converges at second order in time
    while implicit Euler is first order — error ratios vs a fine
    reference when nt doubles: ~4 for CN, ~2 for IE. Device stencil CN
    matches host CN."""
    from rla4mor_tpu.models import (
        InstationaryStencilFOM, ThermalBlockFOM, instationary_thermal_block,
    )
    from rla4mor_tpu.models.stencil import StencilThermalBlock

    nx, T = 12, 0.25
    mu = {"diffusion": jnp.asarray([0.4, 1.0, 0.7, 1.3])}

    def final(theta, nt):
        f = instationary_thermal_block((2, 2), nx, T=T, nt=nt,
                                       time_theta=theta)
        return np.asarray(f.solve(mu))[:, -1]

    ref = final(0.5, 512)  # fine CN reference

    def err(theta, nt):
        return np.linalg.norm(final(theta, nt) - ref)

    r_cn = err(0.5, 8) / err(0.5, 16)
    r_ie = err(1.0, 8) / err(1.0, 16)
    assert r_cn > 3.4, r_cn            # at least second order
    assert 1.6 < r_ie < 2.8, r_ie      # first order
    assert r_cn > 1.5 * r_ie           # and clearly faster than IE

    # device stencil CN == host CN
    st = StencilThermalBlock((2, 2), nx, dtype=jnp.float64)
    dev = InstationaryStencilFOM(st, T=T, nt=16, time_theta=0.5)
    traj_dev = np.asarray(dev.solve(mu, tol=1e-12, maxiter=500))
    interior = ThermalBlockFOM((2, 2), nx).interior
    flat = traj_dev.reshape(-1, traj_dev.shape[-1])[interior]
    host = instationary_thermal_block((2, 2), nx, T=T, nt=16,
                                      time_theta=0.5)
    traj_host = np.asarray(host.solve(mu))
    assert np.abs(flat - traj_host).max() < 1e-8 * np.abs(traj_host).max()


def test_rom_crank_nicolson_matches_fom():
    """CN ROM with a trajectory-spanning basis reproduces the CN FOM
    trajectory; the theta-residual estimator is near zero there."""
    from rla4mor_tpu.models import (
        InstationaryReductor, instationary_thermal_block,
    )
    from rla4mor_tpu.core.orthonormalize import pod

    pfom = instationary_thermal_block((2, 2), 10, T=0.5, nt=12,
                                      time_theta=0.5)
    Ru = pfom.products["h1_0"]
    theta_emb = GaussianEmbedding.make(
        pfom.solution_dim, sqrt_product=Ru.sqrt, range_dim=60, seed=2
    )
    mu = pfom.parameter_space.sample_randomly(1, key=1)[0]
    traj = pfom.solve(mu)
    modes, _ = pod(traj, product=Ru, rtol=1e-12)
    red = InstationaryReductor(pfom, embedding=theta_emb, product=Ru,
                               log_level=30)
    red.extend_basis(modes)
    rom = red.reduce()
    assert rom.time_theta == 0.5
    traj_r, eta = rom.solve(mu, return_estimate=True)
    rec = np.asarray(red.reconstruct(traj_r))
    assert np.abs(rec - np.asarray(traj)).max() < 1e-8
    assert float(eta) < 1e-7


def test_instationary_stencil_3d_matches_dense():
    """3-D parabolic stencil FOM (lumped mass + matrix-free CG inside one
    scan) == a dense implicit-Euler oracle assembled from the same
    operators on the interior nodes."""
    from rla4mor_tpu.models import InstationaryStencilFOM
    from rla4mor_tpu.models.stencil3d import (
        StencilThermalBlock3D, interior_mask3,
    )

    N, nt, T = 4, 8, 0.25
    st = StencilThermalBlock3D((2, 2, 2), N, dtype=jnp.float64)
    dev = InstationaryStencilFOM(st, T=T, nt=nt)
    mu = dev.parameter_space.sample_randomly(1, key=3)[0]
    traj = np.asarray(dev.solve(mu, tol=1e-13, maxiter=500))
    assert traj.shape == (*st.solution_shape, nt + 1)

    interior = np.flatnonzero(
        np.asarray(interior_mask3(st.n_nodes, jnp.float64)).reshape(-1)
    )
    n_int = interior.size
    shape = st.solution_shape
    cols = []
    for j in interior:
        e = np.zeros(st.n_dof)
        e[j] = 1.0
        cols.append(np.asarray(
            st.apply(mu, jnp.asarray(e.reshape(shape)))
        ).reshape(-1)[interior])
    A = np.stack(cols, axis=1)
    M = st.h ** 3 * np.eye(n_int)
    b = np.asarray(st.rhs()).reshape(-1)[interior]
    u = np.zeros(n_int)
    out = [u]
    for _ in range(nt):
        u = np.linalg.solve(M + dev.dt * A, M @ u + dev.dt * b)
        out.append(u)
    want = np.stack(out, axis=1)
    got = traj.reshape(-1, nt + 1)[interior]
    assert np.abs(got - want).max() < 1e-9 * np.abs(want).max()

    # boundary shell stays exactly zero
    bdry = np.setdiff1d(np.arange(st.n_dof), interior)
    assert np.abs(traj.reshape(-1, nt + 1)[bdry]).max() == 0.0


def test_pod_greedy_on_3d_stencil_fom():
    """POD-greedy over the 3-D parabolic stencil FOM end-to-end (the
    rank-generic as_reductor_fom view: affine 3-D term LinOps + lumped
    mass)."""
    from rla4mor_tpu.models import (
        InstationaryReductor, InstationaryStencilFOM, pod_greedy,
    )
    from rla4mor_tpu.models.stencil3d import StencilThermalBlock3D

    st = StencilThermalBlock3D((2, 2, 2), 4, dtype=jnp.float64)
    dev = InstationaryStencilFOM(st, T=0.25, nt=8)
    view = dev.as_reductor_fom(tol=1e-11, maxiter=500)
    assert view.solution_dim == st.n_dof
    theta = GaussianEmbedding.make(view.solution_dim, range_dim=100, seed=2)
    red = InstationaryReductor(view, embedding=theta, log_level=30)
    train = view.parameter_space.sample_randomly(8, key=7)
    rom, hist = pod_greedy(view, red, train, max_extensions=8, pad_to=16,
                           modes_per_extension=2, log_level=30)
    est = hist["max_estimates"]
    assert est[-1] < est[0]

    mu_t = view.parameter_space.sample_randomly(1, key=9)[0]
    rec = red.reconstruct(rom.solve(mu_t))
    truth = np.asarray(view.solve(mu_t))
    rel = np.linalg.norm(rec - truth) / np.linalg.norm(truth)
    assert rel < 0.06


def test_parabolic_error_bound_certified():
    """Grepl-Patera parabolic bound: eta/sqrt(alpha_LB) dominates the
    true final-time M-norm error and eta/alpha_LB the theta-averaged
    space-time R-norm error, for implicit Euler AND Crank-Nicolson, at
    tight effectivity; theta < 1/2 is rejected."""
    from rla4mor_tpu.core.orthonormalize import pod
    from rla4mor_tpu.models import instationary_thermal_block
    from rla4mor_tpu.mor import MinThetaCoercivity, parabolic_error_bound

    mu_ref = {"diffusion": jnp.full(4, 0.55)}
    emb = None

    def check(theta):
        nonlocal emb
        pfom = instationary_thermal_block((2, 2), 10, T=0.5, nt=12,
                                          time_theta=theta)
        Ru = pfom.products["h1_0"]
        if emb is None:
            emb = GaussianEmbedding.make(
                pfom.solution_dim, sqrt_product=Ru.sqrt, range_dim=150,
                seed=3,
            )
        red = InstationaryReductor(pfom, embedding=emb, product=Ru,
                                   log_level=30)
        for mu in pfom.parameter_space.sample_randomly(2, key=1):
            modes, _ = pod(pfom.solve(mu), product=Ru, rtol=1e-6)
            red.extend_basis(modes[:, :4])
        rom = red.reduce()
        alpha = MinThetaCoercivity(pfom, mu_ref, product=Ru)
        mu_t = pfom.parameter_space.sample_randomly(1, key=9)[0]

        rec = np.asarray(red.reconstruct(rom.solve(mu_t)))
        e = rec - np.asarray(pfom.solve(mu_t))
        M = sps.csc_matrix(pfom.mass.S).toarray()
        err_final = float(np.sqrt(e[:, -1] @ (M @ e[:, -1])))
        eth = theta * e[:, 1:] + (1.0 - theta) * e[:, :-1]
        err_st = float(np.sqrt(pfom.dt * np.sum(
            np.asarray(Ru.norm(jnp.asarray(eth))) ** 2
        )))
        b_final = float(parabolic_error_bound(rom, mu_t, alpha))
        b_st = float(parabolic_error_bound(rom, mu_t, alpha,
                                           kind="spacetime"))
        # certified (the sketch's 1+-eps distortion is well inside the
        # observed 1.4-3.7x effectivity margin), and not vacuous
        assert err_final <= b_final <= 50 * err_final, (theta, b_final)
        assert err_st <= b_st <= 50 * err_st, (theta, b_st)
        return rom, alpha

    check(1.0)            # implicit Euler
    rom, alpha = check(0.5)  # Crank-Nicolson

    mu_t = {"diffusion": jnp.asarray([0.3, 0.8, 0.5, 1.0])}
    rom.time_theta = 0.25  # plain attribute; restore below
    try:
        with pytest.raises(ValueError, match="time_theta"):
            parabolic_error_bound(rom, mu_t, alpha)
    finally:
        rom.time_theta = 0.5
    with pytest.raises(ValueError, match="kind"):
        parabolic_error_bound(rom, mu_t, alpha, kind="l2")


def test_pod_greedy_certified(pfom):
    """coercivity= upgrades the sweep scores to certified final-time
    bounds eta/sqrt(alpha_LB): the greedy runs to completion on them and
    the final ROM's certified bound dominates the true final-time M-norm
    error at the training mus; theta < 1/2 is rejected up front."""
    from rla4mor_tpu.mor import MinThetaCoercivity, parabolic_error_bound

    Ru = pfom.products["h1_0"]
    mu_ref = {"diffusion": jnp.full(4, 0.55)}
    alpha = MinThetaCoercivity(pfom, mu_ref, product=Ru)
    train = pfom.parameter_space.sample_randomly(10, key=6)

    def run(coer):
        theta = GaussianEmbedding.make(
            pfom.solution_dim, sqrt_product=Ru.sqrt, range_dim=80, seed=5
        )
        red = InstationaryReductor(pfom, embedding=theta, product=Ru,
                                   log_level=30)
        rom, hist = pod_greedy(pfom, red, train, max_extensions=5,
                               coercivity=coer, log_level=30)
        return red, rom, hist

    red_c, rom_c, hist_c = run(alpha)
    assert all(np.isfinite(hist_c["max_estimates"]))

    # certified bound dominates the true error on the training set
    for mu in train[:3]:
        rec = np.asarray(red_c.reconstruct(rom_c.solve(mu)))
        e = rec - np.asarray(pfom.solve(mu))
        M = sps.csc_matrix(pfom.mass.S).toarray()
        err_final = float(np.sqrt(e[:, -1] @ (M @ e[:, -1])))
        bnd = float(parabolic_error_bound(rom_c, mu, alpha))
        assert err_final <= bnd * (1 + 1e-9), (err_final, bnd)

    # theta < 1/2 rejected up front
    pf_bad = instationary_thermal_block((2, 2), 6, T=0.5, nt=4,
                                        time_theta=0.4)
    emb = GaussianEmbedding.make(pf_bad.solution_dim, range_dim=20, seed=1)
    red_bad = InstationaryReductor(pf_bad, embedding=emb, log_level=30)
    with pytest.raises(ValueError, match="time_theta"):
        pod_greedy(pf_bad, red_bad,
                   pf_bad.parameter_space.sample_randomly(2, key=1),
                   max_extensions=2, coercivity=alpha, log_level=30)


def test_pod_greedy_rejects_nonpositive_coercivity(pfom):
    """A coercivity lower bound that is not positive on the training set
    fails loudly (sqrt would flow NaN into the argmax, silently pinning
    the greedy to one mu forever)."""
    Ru = pfom.products["h1_0"]
    emb = GaussianEmbedding.make(pfom.solution_dim, sqrt_product=Ru.sqrt,
                                 range_dim=40, seed=2)
    red = InstationaryReductor(pfom, embedding=emb, product=Ru,
                               log_level=30)
    train = pfom.parameter_space.sample_randomly(3, key=2)

    def bad_alpha(mu):
        return jnp.sum(mu["diffusion"]) * 0.0 - 1.0

    with pytest.raises(ValueError, match="not\\s+positive"):
        pod_greedy(pfom, red, train, max_extensions=2,
                   coercivity=bad_alpha, log_level=30)


def test_mean_value_output_rejects_nonuniform():
    """_mean_value_output derives the affine output row by linearity
    from output(ones); a non-uniform-weight functional must be rejected
    by the one-hot probe, not silently averaged."""
    from rla4mor_tpu.models.instationary_stencil import _mean_value_output

    class _St:
        dtype = jnp.float64

        def output(self, u):
            w = jnp.arange(1.0, 17.0).reshape(4, 4)
            return jnp.sum(w * u)

    class _Fom:
        stencil = _St()
        solution_shape = (4, 4)

    with pytest.raises(NotImplementedError, match="uniform-weight"):
        _mean_value_output(_Fom())

    # a homogeneous NONLINEAR output (sum(u^2)/n) passes any single
    # one-hot weight check exactly; the homogeneity probe must catch it
    class _StSq:
        dtype = jnp.float64

        def output(self, u):
            return jnp.sum(u * u) / 16.0

    class _FomSq:
        stencil = _StSq()
        solution_shape = (4, 4)

    with pytest.raises(NotImplementedError, match="uniform-weight"):
        _mean_value_output(_FomSq())


def test_flat_view_output_functional():
    """The stencil flat views expose the family's lumped-integral output
    as an affine row: it matches st.output column-wise on trajectories,
    survives reduction (rom.output), and the 3-D/wave views agree with
    their h^d scaling."""
    from rla4mor_tpu.core.orthonormalize import pod
    from rla4mor_tpu.models import (
        InstationaryReductor, InstationaryStencilFOM, WaveStencilFOM,
    )
    from rla4mor_tpu.models.stencil import StencilThermalBlock
    from rla4mor_tpu.models.stencil3d import StencilThermalBlock3D

    st = StencilThermalBlock((2, 2), 10, dtype=jnp.float64)
    dev = InstationaryStencilFOM(st, T=0.25, nt=6)
    view = dev.as_reductor_fom(tol=1e-11, maxiter=500)
    mu = dev.parameter_space.sample_randomly(1, key=1)[0]
    traj = view.solve(mu)
    got = np.asarray(view.output_functional.apply(traj, mu))[0]
    want = np.array([float(st.output(traj[:, k].reshape(st.solution_shape)))
                     for k in range(traj.shape[1])])
    assert np.allclose(got, want, atol=1e-14)

    red = InstationaryReductor(view, log_level=30)
    modes, _ = pod(traj, rtol=1e-12)
    red.extend_basis(modes)
    rom = red.reduce()
    s = np.asarray(rom.output(rom.solve(mu), mu))[0]
    assert np.allclose(s, want, atol=1e-9)

    st3 = StencilThermalBlock3D((2, 2, 2), 4, dtype=jnp.float64)
    v3 = InstationaryStencilFOM(st3, T=0.25, nt=2).as_reductor_fom(
        tol=1e-10, maxiter=200)
    assert np.isclose(
        float(v3.output_functional.stack[0, 0, 0]), st3.h ** 3)

    wv = WaveStencilFOM(st, T=0.25, nt=2).as_reductor_fom(
        tol=1e-10, maxiter=200)
    assert np.isclose(
        float(wv.output_functional.stack[0, 0, 0]), st.h ** 2)
