"""Complex-valued problems through the full stack (the reference supports
complex128 throughout: c16 numba signatures rla/srht.py:14,39, a=2 factors
in the oblivious-dimension bounds rla/embeddings.py:243)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sps

from rla4mor_tpu.core import (
    AffineOp,
    DenseOp,
    HostSparseOp,
    ParameterSpace,
    Product,
    ProjectionCoefficient,
    gram_schmidt,
)
from rla4mor_tpu.models import StationaryFOM
from rla4mor_tpu.mor import SketchedReductor
from rla4mor_tpu.ops import GaussianEmbedding, SrhtEmbedding, gaussian_dim


def _complex_fom(n=80, seed=0):
    """A(mu) = A0 + mu_0 A1 with Hermitian positive definite terms."""
    rng = np.random.RandomState(seed)

    def hpd(scale):
        M = rng.normal(size=(n, n)) + 1j * rng.normal(size=(n, n))
        return sps.csr_matrix(M @ M.conj().T / n + scale * np.eye(n))

    A0, A1 = hpd(3.0), hpd(1.0)
    b = rng.normal(size=(n, 1)) + 1j * rng.normal(size=(n, 1))
    op = AffineOp(
        (HostSparseOp(A0), HostSparseOp(A1)),
        (ProjectionCoefficient("p", 0), ProjectionCoefficient("p", 1)),
    )
    rhs = AffineOp((DenseOp(jnp.asarray(b)),))
    space = ParameterSpace.make({"p": 2}, 0.5, 2.0)
    return StationaryFOM(op, rhs, parameter_space=space), (A0, A1, b)


def test_complex_fom_solve():
    fom, (A0, A1, b) = _complex_fom()
    mu = {"p": jnp.asarray([1.3, 0.7])}
    u = np.asarray(fom.solve(mu))
    A = 1.3 * A0 + 0.7 * A1
    assert np.linalg.norm(A @ u - b[:, 0]) < 1e-10


def test_complex_gram_schmidt():
    rng = np.random.RandomState(1)
    U = jnp.asarray(rng.normal(size=(40, 6)) + 1j * rng.normal(size=(40, 6)))
    Q, R = gram_schmidt(U, return_R=True)
    G = np.asarray(Q).conj().T @ np.asarray(Q)
    assert np.allclose(G, np.eye(6), atol=1e-10)
    assert np.allclose(np.asarray(Q) @ np.asarray(R), np.asarray(U), atol=1e-10)


@pytest.mark.parametrize("emb_cls", [GaussianEmbedding, SrhtEmbedding])
def test_complex_embedding_apply(emb_cls):
    rng = np.random.RandomState(2)
    n, k = 64, 20
    e = emb_cls.make(n, range_dim=k, seed=4)
    x = jnp.asarray(rng.normal(size=(n, 3)) + 1j * rng.normal(size=(n, 3)))
    y = np.asarray(e.apply(x))
    M = np.asarray(e.matrix())
    assert np.allclose(y, M @ np.asarray(x), atol=1e-10)
    assert y.dtype == np.complex128


def test_complex_sketched_reductor():
    fom, (A0, A1, b) = _complex_fom()
    n = fom.solution_dim
    theta = GaussianEmbedding.make(n, range_dim=60, seed=5)
    red = SketchedReductor(fom, embedding_primal=theta, orthonormalize=True)
    mus = fom.parameter_space.sample_randomly(6, key=0)
    red.extend_basis(fom.solve_many(mus))
    rom = red.reduce(seed=6)

    mu = fom.parameter_space.sample_randomly(1, key=1)[0]
    y = np.asarray(rom.solve(mu))
    u_rom = np.asarray(red.rb) @ y
    u_fom = np.asarray(fom.solve(mu))
    rel = np.linalg.norm(u_rom - u_fom) / np.linalg.norm(u_fom)
    assert rel < 5e-2
    est = float(rom.estimate_error(mu))
    A = float(np.asarray(mu["p"])[0]) * A0 + float(np.asarray(mu["p"])[1]) * A1
    res = np.linalg.norm(A @ u_rom - b[:, 0])
    # estimator ~ l2 residual norm up to embedding distortion
    assert 0.2 * res < est < 5 * res + 1e-12


def test_complex_oblivious_dim():
    assert gaussian_dim(0.5, 1e-3, 8, complex_dtype=True) > gaussian_dim(
        0.5, 1e-3, 8, complex_dtype=False
    )


def test_helmholtz_end_to_end():
    """Damped Helmholtz (REAL matrices, COMPLEX parametric coefficient —
    the round-2 _cast_theta case) through the full sketched stack:
    assemble == dense oracle, minres ROM accurate across resonances,
    sketched estimator brackets the true Riesz residual."""
    from rla4mor_tpu.models import helmholtz_fom

    fom = helmholtz_fom(num_intervals=16, wavenumber_range=(2.0, 10.0),
                        damping=0.5)
    Ru = fom.h1_0_product
    mu = {"wavenumber": jnp.asarray([7.3])}

    # assembly: complex coefficient must not be truncated
    A = fom.assemble_sparse(mu).toarray()
    K = fom.operator.terms[0].S.toarray()
    M = fom.operator.terms[1].S.toarray()
    k = 7.3
    assert np.allclose(A, K + (-(k ** 2) + 0.5j * k) * M, atol=1e-12)
    u = np.asarray(fom.solve(mu))
    assert np.iscomplexobj(u)
    assert np.linalg.norm(A @ u - np.asarray(fom.assemble_rhs(mu))) < 1e-10

    # sketched minres RB over the wavenumber sweep
    from rla4mor_tpu.mor import SketchedReductor

    theta_emb = GaussianEmbedding.make(
        fom.solution_dim, sqrt_product=Ru.sqrt, range_dim=220, seed=2,
        complex_dtype=True,
    )
    phi = GaussianEmbedding.make(220, range_dim=120, seed=33)
    red = SketchedReductor(fom, embedding_primal=theta_emb,
                           embedding_online=phi, product=Ru,
                           orthonormalize=True, projection="minres",
                           log_level=30)
    mus = fom.parameter_space.sample_randomly(10, key=4)
    red.extend_basis(fom.solve_many(mus))
    rom = red.reduce(seed=9)
    for mu_t in fom.parameter_space.sample_randomly(3, key=8):
        u_t = np.asarray(fom.solve(mu_t))
        u_r = np.asarray(red.rb) @ np.asarray(rom.solve(mu_t))
        rel = float(Ru.norm(jnp.asarray(u_t - u_r))) / float(
            Ru.norm(jnp.asarray(u_t)))
        assert rel < 5e-2, rel
        est = float(np.asarray(rom.estimate_error(mu_t)))
        r = fom.assemble_sparse(mu_t) @ u_r - np.asarray(
            fom.assemble_rhs(mu_t))
        true_res = float(np.sqrt(np.real(
            np.vdot(r, np.asarray(Ru.inv.apply(jnp.asarray(r)))))))
        assert 0.3 * true_res < est < 3.0 * true_res, (est, true_res)


# ------------------------------------------------ complex-entry embeddings
def test_complex_entry_embeddings(rng):
    """complex_dtype=True draws a genuinely complex Omega (VERDICT r2
    missing #1; the reference's dtype option, rla/embeddings.py:30-33):
    apply == matrix, blocked/streamed variants name the SAME operator."""
    from rla4mor_tpu.ops import (
        BlockGaussianEmbedding,
        RademacherEmbedding,
    )
    from rla4mor_tpu.ops.embeddings import StreamedGaussianEmbedding

    n, k = 60, 24
    g = GaussianEmbedding.make(n, range_dim=k, seed=5, complex_dtype=True)
    M = np.asarray(g.matrix())
    assert np.iscomplexobj(M) and np.abs(M.imag).max() > 0
    # isometry in expectation: E |entry|^2 = 1/k
    assert abs(np.mean(np.abs(M) ** 2) * k - 1.0) < 0.15
    u = jnp.asarray(rng.normal(size=(n, 3)) + 1j * rng.normal(size=(n, 3)))
    np.testing.assert_allclose(
        np.asarray(g.apply(u)), M @ np.asarray(u), rtol=1e-10, atol=1e-12
    )
    # block/streamed variants are slices of the same canonical Omega
    bg = BlockGaussianEmbedding.make(
        n, range_dim=k, seed=5, max_block_size=7, complex_dtype=True
    )
    np.testing.assert_allclose(
        np.asarray(bg.random_matrix()), np.asarray(g.random_matrix()),
        rtol=1e-12, atol=1e-14,
    )
    st = StreamedGaussianEmbedding.make(
        n, range_dim=k, seed=5, block_cols=4096, complex_dtype=True
    )
    uc = u.astype(jnp.complex128)
    np.testing.assert_allclose(
        np.asarray(st.apply(uc)), np.asarray(g.apply(uc)),
        rtol=1e-10, atol=1e-12,
    )
    # complex Rademacher: |entry| = 1/sqrt(k) exactly
    r = RademacherEmbedding.make(n, range_dim=k, seed=6, complex_dtype=True)
    Mr = np.asarray(r.random_matrix())
    assert np.iscomplexobj(Mr)
    np.testing.assert_allclose(np.abs(Mr), 1.0 / np.sqrt(k), rtol=1e-12)


def test_complex_lars_real_stacking(rng):
    """Complex LARS via R^2n stacking: host == device, final OLS point ==
    complex least squares (reference recovery maps are dtype-agnostic,
    inverse_problems/recovery_map.py:101-144)."""
    from rla4mor_tpu.estim import (
        lars_weighted_path_complex,
        lars_weighted_path_complex_jax,
    )

    m, K = 30, 8
    D = rng.normal(size=(m, K)) + 1j * rng.normal(size=(m, K))
    x = rng.normal(size=m) + 1j * rng.normal(size=m)
    path, alphas = lars_weighted_path_complex(D, x, ols=True)
    assert np.iscomplexobj(np.asarray(path))
    # final (full-support) OLS point solves the complex LS problem
    sol, *_ = np.linalg.lstsq(D, x, rcond=None)
    np.testing.assert_allclose(np.asarray(path)[:, -1], sol, atol=1e-8)
    pj, aj, steps = lars_weighted_path_complex_jax(
        jnp.asarray(D), jnp.asarray(x), ols=True, max_steps=60
    )
    L = min(path.shape[1], int(steps))
    np.testing.assert_allclose(
        np.asarray(pj)[:, :L], np.asarray(path)[:, :L], atol=1e-8
    )


def _helmholtz_setup():
    from rla4mor_tpu.models import helmholtz_fom

    fom = helmholtz_fom(num_intervals=16, wavenumber_range=(2.0, 8.0),
                        damping=0.5)
    Ru = fom.h1_0_product
    n = fom.solution_dim
    rngl = np.random.RandomState(7)
    rows = rngl.choice(n, size=30, replace=False)
    Wd = np.zeros((n, 30))
    Wd[rows, np.arange(30)] = 1.0
    W = np.asarray(Ru.inv.apply(jnp.asarray(Wd)))
    W = gram_schmidt(jnp.asarray(W), product=Ru)
    return fom, Ru, W


def test_complex_pbdw_helmholtz():
    """PBDW on complex Helmholtz states (VERDICT r2 item 4): a state in
    span(V) is recovered exactly; out-of-span states improve with V."""
    from rla4mor_tpu.estim import PbdwRecoveryMap

    fom, Ru, W = _helmholtz_setup()
    mus = fom.parameter_space.sample_randomly(6, key=1)
    V = gram_schmidt(fom.solve_many(mus), product=Ru)
    assert np.iscomplexobj(np.asarray(V))
    rm = PbdwRecoveryMap(V, W, product=Ru, log_level=30)
    u_true = np.asarray(V)[:, 2]
    w = np.asarray(Ru.inner(W, jnp.asarray(u_true))).reshape(-1)
    assert np.iscomplexobj(w)
    u_rec = np.asarray(rm.solve(jnp.asarray(w)))
    assert float(Ru.norm(jnp.asarray(u_rec - u_true))) < 1e-8

    # unseen parameter: recovery error well below the state norm
    mu_t = {"wavenumber": jnp.asarray([5.3])}
    u_t = jnp.asarray(fom.solve(mu_t))
    w_t = Ru.inner(W, u_t).reshape(-1)
    u_r = jnp.asarray(rm.solve(w_t))
    rel = float(Ru.norm(u_t - u_r)) / float(Ru.norm(u_t))
    assert rel < 0.3, rel


def test_complex_dictionary_recovery_helmholtz():
    """Dictionary recovery of complex Helmholtz states: stacked-LARS path
    + manifold-distance selection; batched device program == per-column
    (VERDICT r2 item 4 'Done' criterion)."""
    from rla4mor_tpu.core import ChainOp, compose, materialize, project
    from rla4mor_tpu.estim import DicRecoveryMap, ResidualDistanceDiscrete

    fom, Ru, W = _helmholtz_setup()
    mus_train = fom.parameter_space.sample_randomly(24, key=3)
    u_train = fom.solve_many(mus_train)
    V_dic = np.asarray(u_train) / np.asarray(Ru.norm(u_train))[None, :]
    X = jnp.concatenate([jnp.asarray(V_dic), W], axis=1)

    S = GaussianEmbedding.make(
        fom.solution_dim, sqrt_product=Ru.sqrt, range_dim=96, seed=11,
        complex_dtype=True,
    )
    chain = ChainOp((S, Ru.inv))
    lhs = project(compose(chain, fom.operator), None, X)
    rhs = materialize(compose(chain, fom.rhs))
    mdist = ResidualDistanceDiscrete(lhs, rhs, mus_train)

    rm = DicRecoveryMap(jnp.asarray(V_dic), W, product=Ru,
                        manifold_distance=mdist, log_level=30)

    mus_test = fom.parameter_space.sample_randomly(3, key=9)
    u_test = fom.solve_many(mus_test)
    obs = Ru.inner(W, u_test)
    u_rec = np.asarray(rm.solve(obs))
    assert np.iscomplexobj(u_rec)
    rel = np.asarray(Ru.norm(jnp.asarray(u_rec - np.asarray(u_test)))) \
        / np.asarray(Ru.norm(u_test))
    assert rel.max() < 0.5 and rel.min() < 0.1, rel

    # batched == per-column (the batched program routes through the
    # complex stacked LARS)
    v_b = np.asarray(rm.compute_state_batched(obs, max_steps=32))
    for i in range(obs.shape[1]):
        v_i = np.asarray(rm._state_single(obs[:, i], max_steps=32))
        np.testing.assert_allclose(v_b[:, i], v_i, rtol=1e-8, atol=1e-10)


def test_batched_recovery_real_dict_complex_obs():
    """Real dictionary + COMPLEX observations must route the batched
    device program through the stacked LARS exactly like
    ``compute_state_path`` (round-3 review: ``_batched_fn`` keyed off the
    cross-gramian alone, so the real homotopy's while_loop rejected the
    complex carry and the preferred entry point crashed where the
    per-column one worked)."""
    from rla4mor_tpu.core.affine import AffineDense
    from rla4mor_tpu.estim import DicRecoveryMap, ResidualDistanceDiscrete

    rng = np.random.RandomState(7)
    n, nv, m = 40, 6, 8
    V, _ = np.linalg.qr(rng.normal(size=(n, nv)))
    W, _ = np.linalg.qr(rng.normal(size=(n, m)))
    mus = [
        {"p": jnp.asarray(rng.uniform(0.5, 2.0, size=2))} for _ in range(4)
    ]
    coeffs = (ProjectionCoefficient("p", 0), ProjectionCoefficient("p", 1))
    lhs = AffineDense(jnp.asarray(rng.normal(size=(2, 12, nv + m))), coeffs)
    rhs = AffineDense(jnp.asarray(rng.normal(size=(2, 12, 1))), coeffs)
    md = ResidualDistanceDiscrete(lhs, rhs, mus)
    rm = DicRecoveryMap(jnp.asarray(V), jnp.asarray(W),
                        manifold_distance=md, log_level=30)
    w = jnp.asarray(rng.normal(size=(m, 3)) + 1j * rng.normal(size=(m, 3)))
    v_b = np.asarray(rm.compute_state(w, max_steps=40))  # batched route
    assert np.iscomplexobj(v_b) and v_b.shape == (nv, 3)
    for i in range(3):
        v_i = np.asarray(rm._state_single(w[:, i], max_steps=40))
        np.testing.assert_allclose(v_b[:, i], v_i, rtol=1e-8, atol=1e-10)


def test_complex_parabolic_end_to_end():
    """Complex parabolic MOR (lossy medium: A(mu) + i*gamma*M): the host
    FOM time loop runs at the promoted complex dtype and matches a dense
    oracle; POD-greedy + the sketched estimator run unchanged; the
    goal-oriented discrete-adjoint correction is exact in the dual
    limit with a complex operator."""
    from rla4mor_tpu.core.affine import AffineOp
    from rla4mor_tpu.core.linops import HostSparseOp
    from rla4mor_tpu.core.orthonormalize import pod
    from rla4mor_tpu.core.parameters import ONE
    from rla4mor_tpu.models import (
        InstationaryFOM,
        InstationaryPrimalDualReductor,
        InstationaryReductor,
        instationary_thermal_block,
        pod_greedy,
        solve_dual,
    )

    base = instationary_thermal_block((2, 2), 8, T=0.5, nt=8)
    Mmat = sps.csc_matrix(base.mass.S)
    op = AffineOp(
        tuple(base.operator.terms)
        + (HostSparseOp(sps.csr_matrix(2.0j * Mmat)),),
        tuple(base.operator.coefficients) + (ONE,),
    )
    pfom = InstationaryFOM(
        operator=op, rhs=base.rhs, mass=base.mass, T=base.T, nt=base.nt,
        output_functional=base.output_functional, products=base.products,
        parameter_space=base.parameter_space,
    )
    mu = pfom.parameter_space.sample_randomly(1, key=0)[0]
    traj = np.asarray(pfom.solve(mu))
    assert np.iscomplexobj(traj) and np.abs(traj.imag).max() > 1e-6

    # dense implicit-Euler oracle
    A = pfom._assemble_A(mu).toarray()
    M = Mmat.toarray()
    b = pfom.assemble_rhs(mu)
    u = np.zeros(A.shape[0], complex)
    out = [u]
    for _ in range(pfom.nt):
        u = np.linalg.solve(M + pfom.dt * A, M @ u + pfom.dt * b)
        out.append(u)
    assert np.abs(traj - np.stack(out, 1)).max() < 1e-12

    # POD-greedy with the sketched space-time estimator
    Ru = pfom.products["h1_0"]
    emb = GaussianEmbedding.make(pfom.solution_dim, sqrt_product=Ru.sqrt,
                                 range_dim=80, seed=5)
    red = InstationaryReductor(pfom, embedding=emb, product=Ru,
                               log_level=30)
    train = pfom.parameter_space.sample_randomly(8, key=1)
    rom, hist = pod_greedy(pfom, red, train, max_extensions=7,
                           modes_per_extension=2, log_level=30)
    est = hist["max_estimates"]
    assert est[-1] < est[0]
    mu_t = pfom.parameter_space.sample_randomly(1, key=9)[0]
    rec = np.asarray(red.reconstruct(rom.solve(mu_t)))
    tr = np.asarray(pfom.solve(mu_t))
    assert np.linalg.norm(rec - tr) / np.linalg.norm(tr) < 0.05

    # goal-oriented correction, exact dual limit (complex adjoint: the
    # conj-transposed recursion + conj coefficients)
    traj_mu = pfom.solve(mu)
    s = complex(np.asarray(
        pfom.output_functional.apply(traj_mu, mu))[0, -1])
    red_pd = InstationaryPrimalDualReductor(pfom, embedding=emb,
                                            product=Ru, log_level=30)
    modes_p, _ = pod(traj_mu, product=Ru, modes=2)
    red_pd.extend_primal(modes_p)
    red_pd.extend_dual(solve_dual(pfom, mu))
    rom_pd = red_pd.reduce()
    s_plain = complex(rom_pd.output_plain(mu))
    s_c, _ = rom_pd.output_corrected(mu)
    assert abs(s_plain - s) > 1e-8
    assert abs(complex(s_c) - s) < 1e-12


def test_helmholtz_group_lars_beats_real_stacking():
    """VERDICT r3 item 9 'done' criterion: at EQUAL path length the
    rotation-invariant group (modulus-penalty) complex homotopy recovers
    Helmholtz states at least as well as the real-stacking reduction —
    here: machine precision vs 1e-5..1e-3 at 12 path points (the group
    path activates whole atoms, so the per-point OLS debias lands on the
    true complex support immediately)."""
    from rla4mor_tpu.core import ChainOp, compose, materialize, project
    from rla4mor_tpu.estim import DicRecoveryMap, ResidualDistanceDiscrete

    fom, Ru, W = _helmholtz_setup()
    mus_train = fom.parameter_space.sample_randomly(24, key=3)
    u_train = fom.solve_many(mus_train)
    V_dic = np.asarray(u_train) / np.asarray(Ru.norm(u_train))[None, :]
    X = jnp.concatenate([jnp.asarray(V_dic), W], axis=1)
    S = GaussianEmbedding.make(
        fom.solution_dim, sqrt_product=Ru.sqrt, range_dim=96, seed=11,
        complex_dtype=True,
    )
    chain = ChainOp((S, Ru.inv))
    lhs = project(compose(chain, fom.operator), None, X)
    rhs = materialize(compose(chain, fom.rhs))
    mdist = ResidualDistanceDiscrete(lhs, rhs, mus_train)
    rm = DicRecoveryMap(jnp.asarray(V_dic), W, product=Ru,
                        manifold_distance=mdist, log_level=30)

    mus_test = fom.parameter_space.sample_randomly(3, key=9)
    u_test = fom.solve_many(mus_test)
    obs = Ru.inner(W, u_test)
    P = 12
    best = {}
    for mode in ("group", "stacked"):
        errs = []
        for i in range(obs.shape[1]):
            u, _ = rm.solve_path(obs[:, i], max_steps=P,
                                 complex_mode=mode)
            ut = jnp.asarray(np.asarray(u_test)[:, i])
            rel = np.asarray(Ru.norm(u - ut[:, None])) \
                / float(Ru.norm(ut))
            errs.append(float(rel.min()))
        best[mode] = np.asarray(errs)
    assert bool(np.all(best["group"] <= best["stacked"] * 1.01 + 1e-12)), \
        (best["group"], best["stacked"])
    # and the group path is not just "not worse" — it closes the problem
    assert best["group"].max() < 1e-10
