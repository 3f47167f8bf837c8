"""Oracle tests of the sketched RB reductor (BASELINE configs 1-2).

Pattern mirrors the reference test strategy (preconditioners/tests.py):
the machinery under test is recomputed by direct dense composition and must
agree to tight tolerance (the BASELINE demands <=1e-10 vs reference ROM
outputs; here vs our own dense oracles, seeded and deterministic).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rla4mor_tpu.mor import SketchedReductor, rb_greedy
from rla4mor_tpu.ops import GaussianEmbedding, IdentityEmbedding, SrhtEmbedding


def _setup(fom, emb_cls, k=150, seed=1, orthonormalize=False, projection="galerkin",
           k_online=60):
    Ru = fom.h1_0_product
    theta = emb_cls.make(
        fom.solution_dim, sqrt_product=Ru.sqrt, range_dim=k, seed=seed
    )
    phi = GaussianEmbedding.make(k, range_dim=k_online, seed=seed + 100)
    red = SketchedReductor(
        fom,
        embedding_primal=theta,
        embedding_online=phi,
        product=Ru,
        orthonormalize=orthonormalize,
        projection=projection,
    )
    return red, theta


def _snapshots(fom, count=8, key=0):
    mus = fom.parameter_space.sample_randomly(count, key=key)
    U = fom.solve_many(mus)
    return mus, U


@pytest.mark.parametrize("emb_cls", [GaussianEmbedding, SrhtEmbedding])
def test_sketched_galerkin_system_oracle(thermal_fom, emb_cls):
    """Reductor's reduced system == hand-composed (Theta V)^H Theta R^-1 A(mu) V."""
    fom = thermal_fom
    red, theta = _setup(fom, emb_cls, orthonormalize=False)
    mus, U = _snapshots(fom)
    red.extend_basis(U)
    rom = red.reduce(seed=5)

    mu = fom.parameter_space.sample_randomly(1, key=99)[0]
    T = np.asarray(theta.matrix())  # (k, n)
    Rinv = fom.h1_0_product.inv
    A = np.asarray(fom.assemble_sparse(mu).toarray())
    b = np.asarray(fom.assemble_rhs(mu))
    Un = np.asarray(U)
    SV = T @ Un
    S_res = T @ np.asarray(Rinv.apply(jnp.asarray(A @ Un)))
    s_rhs = T @ np.asarray(Rinv.apply(jnp.asarray(b)))

    lhs_oracle = SV.conj().T @ S_res
    rhs_oracle = SV.conj().T @ s_rhs
    assert np.allclose(np.asarray(rom.lhs.assemble(mu)), lhs_oracle, atol=1e-10)
    assert np.allclose(np.asarray(rom.rhs.assemble_vec(mu)), rhs_oracle, atol=1e-10)

    # error estimator == || Phi Theta R^-1 (A V y - b) ||
    y = np.asarray(rom.solve(mu))
    Phi = np.asarray(red.embedding_online.with_seed(5).matrix())
    est_oracle = np.linalg.norm(Phi @ (S_res @ y - s_rhs))
    est = float(rom.estimate_error(mu))
    assert abs(est - est_oracle) < 1e-10 * max(1.0, est_oracle)


def test_identity_embedding_equals_classical_galerkin(thermal_fom):
    """With Theta = Q (IdentityEmbedding) the sketched Galerkin ROM equals
    the classical R-Galerkin ROM and the estimator is the exact Riesz
    residual norm."""
    fom = thermal_fom
    Ru = fom.h1_0_product
    theta = IdentityEmbedding(fom.solution_dim, Ru.sqrt)
    red = SketchedReductor(
        fom, embedding_primal=theta, product=Ru, orthonormalize=False
    )
    mus, U = _snapshots(fom, count=6)
    red.extend_basis(U)
    rom = red.reduce()

    mu = fom.parameter_space.sample_randomly(1, key=7)[0]
    A = np.asarray(fom.assemble_sparse(mu).toarray())
    b = np.asarray(fom.assemble_rhs(mu))
    Un = np.asarray(U)
    # classical Galerkin: (V^H A V) y = V^H b
    y_classic = np.linalg.solve(Un.T @ A @ Un, Un.T @ b)
    y = np.asarray(rom.solve(mu))
    assert np.allclose(y, y_classic, atol=1e-9)

    # estimator == || A V y - b ||_{R^-1}
    r = A @ Un @ y - b
    Rinv_r = np.asarray(Ru.inv.apply(jnp.asarray(r)))
    want = np.sqrt(r @ Rinv_r)
    est = float(rom.estimate_error(mu))
    assert abs(est - want) < 1e-9 * max(1.0, want)


def test_orthonormalization_invariance(thermal_fom):
    """Orthonormalizing in sketch space must not change the ROM solution in
    the full space (change of basis only), and srb must be orthonormal."""
    fom = thermal_fom
    mus, U = _snapshots(fom, count=6)
    mu = fom.parameter_space.sample_randomly(1, key=42)[0]

    red_plain, _ = _setup(fom, GaussianEmbedding, orthonormalize=False)
    red_orth, _ = _setup(fom, GaussianEmbedding, orthonormalize=True)
    red_plain.extend_basis(U)
    red_orth.extend_basis(U)

    srb = np.asarray(red_orth.srb)
    assert np.allclose(srb.T @ srb, np.eye(srb.shape[1]), atol=1e-9)

    rom_p = red_plain.reduce(seed=3)
    rom_o = red_orth.reduce(seed=3)
    up = np.asarray(red_plain.rb) @ np.asarray(rom_p.solve(mu))
    uo = np.asarray(red_orth.rb) @ np.asarray(rom_o.solve(mu))
    assert np.allclose(up, uo, atol=1e-8)
    # estimators agree too (same residual operator in different basis)
    assert np.isclose(
        float(rom_p.estimate_error(mu)), float(rom_o.estimate_error(mu)),
        rtol=1e-8,
    )


def test_minres_oracle(thermal_fom):
    """minres ROM: y = argmin || Phi1 Theta R^-1 (A V y - b) ||, estimator
    uses the independent Phi2 sketch (reference _reduce_minres,
    mor/sketched_reductor.py:170-187)."""
    fom = thermal_fom
    red, theta = _setup(fom, GaussianEmbedding, orthonormalize=False,
                        projection="minres", k_online=80)
    mus, U = _snapshots(fom, count=6)
    red.extend_basis(U)
    rom = red.reduce(seed=(11, 12))
    assert rom.ls

    mu = fom.parameter_space.sample_randomly(1, key=13)[0]
    T = np.asarray(theta.matrix())
    Rinv = fom.h1_0_product.inv
    A = np.asarray(fom.assemble_sparse(mu).toarray())
    b = np.asarray(fom.assemble_rhs(mu))
    Un = np.asarray(U)
    S_res = T @ np.asarray(Rinv.apply(jnp.asarray(A @ Un)))
    s_rhs = T @ np.asarray(Rinv.apply(jnp.asarray(b)))
    P1 = np.asarray(red.embedding_online.with_seed(11).matrix())
    y_oracle, *_ = np.linalg.lstsq(P1 @ S_res, P1 @ s_rhs, rcond=None)
    y = np.asarray(rom.solve(mu))
    assert np.allclose(y, y_oracle, atol=1e-8)

    P2 = np.asarray(red.embedding_online.with_seed(12).matrix())
    est_oracle = np.linalg.norm(P2 @ (S_res @ y - s_rhs))
    assert abs(float(rom.estimate_error(mu)) - est_oracle) < 1e-10


def test_incremental_extension_matches_batch(thermal_fom):
    """Extending one snapshot at a time == extending all at once."""
    fom = thermal_fom
    mus, U = _snapshots(fom, count=5)
    mu = fom.parameter_space.sample_randomly(1, key=21)[0]

    red_b, _ = _setup(fom, GaussianEmbedding, orthonormalize=True)
    red_b.extend_basis(U)
    red_i, _ = _setup(fom, GaussianEmbedding, orthonormalize=True)
    for j in range(U.shape[1]):
        red_i.extend_basis(U[:, j])

    rom_b = red_b.reduce(seed=2)
    rom_i = red_i.reduce(seed=2)
    ub = np.asarray(red_b.rb) @ np.asarray(rom_b.solve(mu))
    ui = np.asarray(red_i.rb) @ np.asarray(rom_i.solve(mu))
    assert np.allclose(ub, ui, atol=1e-8)


def test_rom_accuracy_and_estimator_effectivity(thermal_fom):
    """ROM error decays and the sketched estimator tracks the true Riesz
    residual norm within the embedding distortion."""
    fom = thermal_fom
    Ru = fom.h1_0_product
    red, _ = _setup(fom, GaussianEmbedding, k=200, orthonormalize=True)
    mus, U = _snapshots(fom, count=10, key=3)
    red.extend_basis(U)
    rom = red.reduce(seed=4)

    test_mus = fom.parameter_space.sample_randomly(5, key=77)
    for mu in test_mus:
        u_fom = np.asarray(fom.solve(mu))
        y = np.asarray(rom.solve(mu))
        u_rom = np.asarray(red.rb) @ y
        err = float(Ru.norm(jnp.asarray(u_fom - u_rom)))
        unorm = float(Ru.norm(jnp.asarray(u_fom)))
        assert err < 1e-2 * unorm  # 10 snapshots on a 4-param problem
        # estimator vs true residual norm (Riesz): within 50% distortion
        A = fom.assemble_sparse(mu)
        b = np.asarray(fom.assemble_rhs(mu))
        r = A @ u_rom - b
        true_res = float(
            np.sqrt(r @ np.asarray(Ru.inv.apply(jnp.asarray(r))))
        )
        est = float(rom.estimate_error(mu))
        if true_res > 1e-12:
            assert 0.4 * true_res < est < 2.5 * true_res


def test_greedy(thermal_fom):
    fom = thermal_fom
    red, _ = _setup(fom, GaussianEmbedding, k=200, orthonormalize=True)
    training = fom.parameter_space.sample_randomly(30, key=5)
    result = rb_greedy(fom, red, training, max_extensions=8)
    assert red.basis_size == 8
    # greedy estimates decrease overall
    assert result.max_estimates[-1] < result.max_estimates[0]
    # resulting ROM is accurate on the training set
    mu = training[3]
    u_fom = np.asarray(fom.solve(mu))
    u_rom = np.asarray(red.rb) @ np.asarray(result.rom.solve(mu))
    Ru = fom.h1_0_product
    rel = float(Ru.norm(jnp.asarray(u_fom - u_rom))) / float(
        Ru.norm(jnp.asarray(u_fom))
    )
    assert rel < 5e-2


def test_output_functional_projection(thermal_fom):
    fom = thermal_fom
    red, _ = _setup(fom, GaussianEmbedding, orthonormalize=True)
    mus, U = _snapshots(fom, count=6)
    red.extend_basis(U)
    rom = red.reduce(seed=9)
    mu = fom.parameter_space.sample_randomly(1, key=31)[0]
    y = rom.solve(mu)
    s_rom = np.asarray(rom.output(y, mu)).item()
    u = red.rb @ jnp.asarray(y)
    s_direct = np.asarray(fom.output_functional.apply(u, mu)).item()
    assert abs(s_rom - s_direct) < 1e-10


def test_greedy_minres_srht(thermal_fom):
    """Greedy with SRHT primal sketch + minres projection (BASELINE config 2
    combined with the minres path)."""
    fom = thermal_fom
    red, _ = _setup(fom, SrhtEmbedding, k=220, orthonormalize=True,
                    projection="minres", k_online=100)
    training = fom.parameter_space.sample_randomly(25, key=8)
    result = rb_greedy(fom, red, training, max_extensions=7)
    assert red.basis_size == 7
    assert result.max_estimates[-1] < result.max_estimates[0]
    mu = training[5]
    u_fom = np.asarray(fom.solve(mu))
    u_rom = np.asarray(red.rb) @ np.asarray(result.rom.solve(mu))
    Ru = fom.h1_0_product
    rel = float(Ru.norm(jnp.asarray(u_fom - u_rom))) / float(
        Ru.norm(jnp.asarray(u_fom))
    )
    assert rel < 1e-1


def test_extend_basis_blocked(thermal_fom):
    fom = thermal_fom
    mus, U = _snapshots(fom, count=6)
    red_a, _ = _setup(fom, GaussianEmbedding, orthonormalize=True)
    red_b, _ = _setup(fom, GaussianEmbedding, orthonormalize=True)
    red_a.extend_basis(U)
    red_b.extend_basis_blocked(U, max_block_size=2)
    mu = fom.parameter_space.sample_randomly(1, key=50)[0]
    ua = np.asarray(red_a.rb) @ np.asarray(red_a.reduce(seed=1).solve(mu))
    ub = np.asarray(red_b.rb) @ np.asarray(red_b.reduce(seed=1).solve(mu))
    assert np.allclose(ua, ub, atol=1e-8)


def test_padded_greedy_matches_plain(thermal_fom):
    """rb_greedy_padded (single-compile sweep) selects the same parameters
    and estimates as the retracing rb_greedy."""
    from rla4mor_tpu.mor import rb_greedy_padded

    fom = thermal_fom
    training = fom.parameter_space.sample_randomly(20, key=6)

    red_a, _ = _setup(fom, GaussianEmbedding, k=150, orthonormalize=True)
    res_a = rb_greedy(fom, red_a, training, max_extensions=6, online_seed=40)
    red_b, _ = _setup(fom, GaussianEmbedding, k=150, orthonormalize=True)
    res_b = rb_greedy_padded(fom, red_b, training, max_extensions=6,
                             online_seed=40)

    assert len(res_a.selected_mus) == len(res_b.selected_mus)
    for ma, mb in zip(res_a.selected_mus, res_b.selected_mus):
        assert np.allclose(np.asarray(ma["diffusion"]),
                           np.asarray(mb["diffusion"]))
    assert np.allclose(res_a.max_estimates, res_b.max_estimates, rtol=1e-8)


def test_padded_greedy_minres_matches_plain(thermal_fom):
    from rla4mor_tpu.mor import rb_greedy_padded

    fom = thermal_fom
    training = fom.parameter_space.sample_randomly(15, key=7)
    red_a, _ = _setup(fom, GaussianEmbedding, k=150, orthonormalize=True,
                      projection="minres", k_online=90)
    res_a = rb_greedy(fom, red_a, training, max_extensions=5, online_seed=60)
    red_b, _ = _setup(fom, GaussianEmbedding, k=150, orthonormalize=True,
                      projection="minres", k_online=90)
    res_b = rb_greedy_padded(fom, red_b, training, max_extensions=5,
                             online_seed=60)
    assert len(res_a.selected_mus) == len(res_b.selected_mus)
    for ma, mb in zip(res_a.selected_mus, res_b.selected_mus):
        assert np.allclose(np.asarray(ma["diffusion"]),
                           np.asarray(mb["diffusion"]))
    assert np.allclose(res_a.max_estimates, res_b.max_estimates, rtol=1e-7)


def test_empty_basis_reduce_classical_fallback(thermal_fom):
    """VERDICT missing #2: reduce() on an empty basis falls back to the
    classical residual reductor (reference mor/sketched_reductor.py:189-208)
    — the ROM estimates ||b(mu)||_{R^-1} instead of raising."""
    from rla4mor_tpu.core.affine import materialize
    from rla4mor_tpu.core.parameters import eval_coefficients

    fom = thermal_fom
    red, _ = _setup(fom, GaussianEmbedding)
    rom = red.reduce(seed=0)
    mu = fom.parameter_space.sample_randomly(1, key=11)[0]
    u = rom.solve(mu)
    assert u.shape == (0,)
    est = float(rom.error_estimator.estimate_error(u, mu))

    Ru = fom.h1_0_product
    bm = materialize(fom.rhs)
    th = eval_coefficients(bm.coefficients, mu)
    bvec = jnp.einsum("t,tnl->nl", th, bm.stack)[:, 0]
    oracle = float(jnp.sqrt(bvec @ jnp.asarray(Ru.inv.apply(bvec))))
    assert abs(est - oracle) < 1e-8 * oracle


def test_extend_basis_streamed_matches_batch(thermal_fom):
    """Streaming an iterator of column blocks == one batch extension
    (generator never materializes the snapshot matrix)."""
    fom = thermal_fom
    _, U = _snapshots(fom, count=6, key=21)

    red_a, _ = _setup(fom, GaussianEmbedding, orthonormalize=True)
    red_a.extend_basis_streamed(
        (U[:, i:i + 2] for i in range(0, 6, 2))
    )
    red_b, _ = _setup(fom, GaussianEmbedding, orthonormalize=True)
    for i in range(0, 6, 2):
        red_b.extend_basis(U[:, i:i + 2])
    assert np.abs(np.asarray(red_a.srb) - np.asarray(red_b.srb)).max() < 1e-12
    rom_a = red_a.reduce(seed=9)
    rom_b = red_b.reduce(seed=9)
    mu = fom.parameter_space.sample_randomly(1, key=22)[0]
    assert np.allclose(np.asarray(rom_a.solve(mu)), np.asarray(rom_b.solve(mu)))


def test_padded_append_skips_dependent_columns():
    """A snapshot already (numerically) in the basis is skipped — ncols
    stays put, the state is untouched, and the masked systems remain
    nonsingular (review round-2: previously the noise column was
    normalized by ~1/eps into the residual stack)."""
    import jax.numpy as jnp

    from rla4mor_tpu.mor.padded_reductor import PaddedSketchedReductor
    from rla4mor_tpu.models import ThermalBlockFOM
    from rla4mor_tpu.ops import GaussianEmbedding

    fom = ThermalBlockFOM((2, 2), 8)
    Ru = fom.h1_0_product
    theta = GaussianEmbedding.make(fom.solution_dim, sqrt_product=Ru.sqrt,
                                   range_dim=60, seed=0)
    red = PaddedSketchedReductor(fom, embedding_primal=theta, product=Ru,
                                 r_max=4, log_level=30)
    mu = fom.parameter_space.sample_randomly(1, key=0)[0]
    u = fom.solve(mu)
    red.extend_basis(u, mu=mu)
    srb1 = np.asarray(red.state.srb).copy()  # state buffers are donated
    assert red.basis_size == 1
    red.extend_basis(u, mu=mu)          # exact duplicate
    assert red.basis_size == 1
    assert np.allclose(np.asarray(red.state.srb), srb1)
    red.extend_basis(1.0000001 * u)     # numerically dependent
    assert red.basis_size == 1
    # a genuinely new direction still appends
    mu2 = fom.parameter_space.sample_randomly(1, key=1)[0]
    red.extend_basis(fom.solve(mu2), mu=mu2)
    assert red.basis_size == 2
    rom = red.reduce(seed=3)
    est = np.asarray(rom.estimate_error(mu))
    assert np.isfinite(est)


def test_greedy_strong(thermal_fom):
    """Strong greedy drives the TRUE training error down; reusing the
    precomputed snapshots must give the same trajectory as letting the
    driver solve them itself."""
    from rla4mor_tpu.mor import rb_greedy_strong

    fom = thermal_fom
    red, _ = _setup(fom, GaussianEmbedding, k=200, orthonormalize=True)
    training = fom.parameter_space.sample_randomly(20, key=11)
    U = fom.solve_many(list(training))
    result = rb_greedy_strong(fom, red, training, max_extensions=6,
                              snapshots=U, log_level=30)
    assert red.basis_size == 6
    assert result.max_estimates[-1] < result.max_estimates[0]
    # the reported max TRUE error matches an independent recomputation
    Ru = fom.h1_0_product
    rom = result.rom
    errs = []
    for i, mu in enumerate(training):
        u_rom = red.rb @ jnp.asarray(rom.solve(mu))
        errs.append(float(Ru.norm(jnp.asarray(U[:, i]) - u_rom)))
    # last sweep ran before the final extension, so just check the final
    # rom beats the last recorded max estimate on the training set
    assert max(errs) <= result.max_estimates[-1] * 1.5

    # same trajectory when the driver computes snapshots itself
    red2, _ = _setup(fom, GaussianEmbedding, k=200, orthonormalize=True)
    result2 = rb_greedy_strong(fom, red2, training, max_extensions=6,
                               log_level=30)
    assert [tuple(np.asarray(m["diffusion"])) for m in
            result2.selected_mus] == [
        tuple(np.asarray(m["diffusion"])) for m in result.selected_mus
    ]
    assert np.allclose(result2.max_estimates, result.max_estimates)


def test_reduce_adaptive_refreshes_online_sketch(thermal_fom):
    """A deliberately undersized online sketch (k_online=4) fails the
    two-independent-draw cross-check and is doubled until certified; the
    accepted size persists on the reductor. A comfortable sketch passes
    in one round."""
    from rla4mor_tpu.core.parameters import mu_stack

    fom = thermal_fom
    red, _ = _setup(fom, GaussianEmbedding, k=160, orthonormalize=True,
                    k_online=4)
    mus, U = _snapshots(fom, count=5)
    red.extend_basis(U)
    mus_b = mu_stack(fom.parameter_space.sample_randomly(20, key=77))

    rom, info = red.reduce_adaptive(mus_b, seed=5, tol=0.15, max_rounds=6)
    assert info["certified"]
    assert info["online_dim"] > 4            # it actually grew
    assert red.embedding_online.range_dim == info["online_dim"]  # persists
    assert info["max_rel_dev"] <= 0.15
    # the certified estimator still brackets the true residual
    mu = mus[0]
    est = float(np.asarray(rom.estimate_error(mu)))
    assert np.isfinite(est)

    red2, _ = _setup(fom, GaussianEmbedding, k=160, orthonormalize=True,
                     k_online=150)
    mus2, U2 = _snapshots(fom, count=5)
    red2.extend_basis(U2)
    _, info2 = red2.reduce_adaptive(mus_b, seed=5, tol=0.15, max_rounds=6)
    assert info2["certified"] and info2["rounds"] == 1
    assert red2.embedding_online.range_dim == 150


def test_reduce_adaptive_rounds_exhausted_keeps_state(thermal_fom):
    """Review round-2: when rounds run out uncertified, embedding_online
    must stay at the size that produced the returned ROM (no final
    untested doubling)."""
    fom = thermal_fom
    red, _ = _setup(fom, GaussianEmbedding, k=160, orthonormalize=True,
                    k_online=4)
    from rla4mor_tpu.core.parameters import mu_stack

    mus, U = _snapshots(fom, count=4)
    red.extend_basis(U)
    mus_b = mu_stack(fom.parameter_space.sample_randomly(10, key=5))
    rom, info = red.reduce_adaptive(mus_b, seed=1, tol=1e-12, max_rounds=2)
    assert not info["certified"]
    assert red.embedding_online.range_dim == info["online_dim"]


def test_min_theta_error_bound(thermal_fom):
    """Min-theta coercivity turns the sketched residual estimate into a
    TRUE R-norm error bound on the (parametrically coercive) thermal
    block: bound >= true error on every test mu, with sane effectivity;
    alpha_LB is jittable/vmappable."""
    from rla4mor_tpu.core.parameters import mu_stack
    from rla4mor_tpu.mor import MinThetaCoercivity, error_bound

    fom = thermal_fom
    Ru = fom.h1_0_product
    red, _ = _setup(fom, GaussianEmbedding, k=200, orthonormalize=True)
    mus, U = _snapshots(fom, count=5)
    red.extend_basis(U)
    rom = red.reduce(seed=3)

    mu_ref = {"diffusion": jnp.ones(4)}
    coer = MinThetaCoercivity(fom, mu_ref, product=Ru)
    assert coer.alpha_ref > 0

    test_mus = fom.parameter_space.sample_randomly(6, key=13)
    for mu in test_mus:
        u = jnp.asarray(fom.solve(mu))
        u_r = rom.solve(mu)
        err = float(Ru.norm(u - red.rb @ u_r))
        bnd = float(np.asarray(error_bound(rom, mu, coer, u_r=u_r)))
        # rigorous up to sketch distortion: allow 10% slack
        assert err <= 1.1 * bnd, (err, bnd)
        if err > 1e-10:
            assert bnd / err < 500  # sane effectivity

    # jit + vmap over a batch
    batch = mu_stack(test_mus)
    bnds = jax.jit(jax.vmap(lambda m: error_bound(rom, m, coer)))(batch)
    assert bnds.shape == (6,) and bool(jnp.all(jnp.isfinite(bnds)))


def test_inf_sup_lower_bound_helmholtz():
    """SCM-lite inf-sup lower bound on the (non-coercive) damped
    Helmholtz family (VERDICT r2 item 6): beta_LB(mu) <= true
    sigma_min(Q^-H A(mu) Q^-1) everywhere, and with an exact-residual
    estimator the certified bound >= true R-norm error."""
    from rla4mor_tpu.models import helmholtz_fom
    from rla4mor_tpu.mor import InfSupLowerBound, inf_sup_error_bound

    fom = helmholtz_fom(num_intervals=16, wavenumber_range=(2.0, 6.0),
                        damping=0.5)
    Ru = fom.h1_0_product
    n = fom.solution_dim

    refs_w = np.linspace(2.25, 5.75, 8)
    mu_refs = [{"wavenumber": jnp.asarray([w])} for w in refs_w]
    infsup = InfSupLowerBound(fom, mu_refs, product=Ru)
    assert bool(jnp.all(infsup.betas > 0))
    assert bool(jnp.all(infsup.gammas > 0))

    # rigor: beta_LB <= true inf-sup constant, everywhere
    Qd = np.asarray(Ru.sqrt.S.toarray() if hasattr(Ru.sqrt, "S")
                    else Ru.sqrt.matrix())

    def true_beta(mu):
        Ad = np.asarray(fom.assemble_sparse(mu).toarray())
        B = np.linalg.solve(Qd.conj().T, Ad)
        B = np.linalg.solve(Qd.T, B.T).T
        return np.linalg.svd(B, compute_uv=False)[-1]

    rng = np.random.RandomState(0)
    for w in rng.uniform(2.0, 6.0, size=4):
        mu = {"wavenumber": jnp.asarray([w])}
        blb = float(np.asarray(infsup(mu)))
        assert blb <= true_beta(mu) * (1 + 1e-9) + 1e-12, (w, blb)
    # at a reference, the bound recovers (at least) that reference's beta
    assert float(infsup(mu_refs[2])) >= float(infsup.betas[2]) - 1e-12

    # certified error bound with the EXACT residual estimator
    theta = IdentityEmbedding(n, sqrt_product=Ru.sqrt)
    red = SketchedReductor(fom, embedding_primal=theta, product=Ru,
                           orthonormalize=True, projection="galerkin",
                           log_level=30)
    mus = fom.parameter_space.sample_randomly(8, key=3)
    red.extend_basis(fom.solve_many(mus))
    rom = red.reduce()

    n_finite = 0
    for w in np.concatenate([refs_w + 0.1, [4.0, 5.0]]):
        mu = {"wavenumber": jnp.asarray([float(w)])}
        u = jnp.asarray(fom.solve(mu))
        u_r = rom.solve(mu)
        err = float(Ru.norm(u - red.rb @ u_r))
        bnd = float(np.asarray(inf_sup_error_bound(rom, mu, infsup, u_r=u_r)))
        if np.isfinite(bnd):
            n_finite += 1
            assert err <= bnd * (1 + 1e-8) + 1e-12, (w, err, bnd)
    assert n_finite >= 6  # the bound is usable, not vacuous

    # jit + vmap over a parameter batch
    from rla4mor_tpu.core.parameters import mu_stack

    batch = mu_stack([{"wavenumber": jnp.asarray([w])}
                      for w in refs_w + 0.05])
    bnds = jax.jit(jax.vmap(lambda m: inf_sup_error_bound(rom, m, infsup)))(
        batch)
    assert bnds.shape == (8,)
    assert int(jnp.sum(jnp.isfinite(bnds))) >= 6


def test_truncation_rtol_drops_dependent_columns(thermal_fom):
    """truncation_rtol > 0 restores the reference's pyMOR vector-removal
    semantics (reference mor/sketched_reductor.py:94 inherits
    gram_schmidt's rtol): duplicated snapshots are DROPPED from the
    sketched state instead of becoming noise columns, the change of
    basis stays consistent across srb / rb / residual / output, and the
    emitted ROM still solves accurately."""
    fom = thermal_fom
    red, _ = _setup(fom, GaussianEmbedding, orthonormalize=False)
    red.orthonormalize = True
    red.truncation_rtol = 1e-8
    mus, U = _snapshots(fom, count=5)
    # 5 genuine snapshots + 3 exact duplicates, interleaved mus
    Udup = jnp.concatenate([U, U[:, :3]], axis=1)
    mus_dup = list(mus) + list(mus[:3])
    for j, mu in enumerate(mus_dup):
        red.extend_basis(Udup[:, j], mu=mu)
    assert red.basis_size == 5
    assert len(red.mu_basis) == 5
    # consistency of every transformed container
    assert red.rb.shape[1] == 5
    assert red.residual_lhs.stack.shape[-1] == 5
    np.testing.assert_allclose(
        np.asarray(red.srb.conj().T @ red.srb), np.eye(5), atol=1e-10
    )
    rom = red.reduce(seed=7)
    # Galerkin is exact at a training mu (the snapshot is in the kept
    # span) — the truncated change of basis must preserve that
    mu = mus[0]
    u_rom = red.rb @ rom.solve(mu)
    u_ref = jnp.asarray(fom.solve(mu))
    rel = float(jnp.linalg.norm(u_rom - u_ref) / jnp.linalg.norm(u_ref))
    est = float(rom.estimate_error(mu))
    assert np.isfinite(est)
    assert rel < 1e-8

    # default (rtol=0) keeps the reference-kept behavior: all 8 columns
    red0, _ = _setup(fom, GaussianEmbedding, orthonormalize=False)
    red0.orthonormalize = True
    red0.extend_basis(Udup)
    assert red0.basis_size == 8


def test_truncate_basis_fixed_rank(thermal_fom):
    """truncate_basis(r) keeps the FIRST r orthonormal columns, pushes
    the restriction consistently through every container, and the
    truncated ROM == a ROM trained on just the first r snapshots
    (the leading subspace is identical under ordered Gram-Schmidt)."""
    fom = thermal_fom
    red, _ = _setup(fom, GaussianEmbedding, orthonormalize=True)
    mus, U = _snapshots(fom, count=8)
    red.extend_basis(U)
    assert red.basis_size == 8
    red.truncate_basis(5)
    assert red.basis_size == 5
    assert red.rb.shape[1] == 5
    assert red.residual_lhs.stack.shape[-1] == 5
    np.testing.assert_allclose(
        np.asarray(red.srb.conj().T @ red.srb), np.eye(5), atol=1e-10
    )

    red5, _ = _setup(fom, GaussianEmbedding, orthonormalize=True)
    red5.extend_basis(U[:, :5])
    rom_t = red.reduce(seed=3)
    rom_5 = red5.reduce(seed=3)
    mu = fom.parameter_space.sample_randomly(1, key=42)[0]
    np.testing.assert_allclose(np.asarray(rom_t.solve(mu)),
                               np.asarray(rom_5.solve(mu)),
                               rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(float(rom_t.estimate_error(mu)),
                               float(rom_5.estimate_error(mu)),
                               rtol=1e-8)

    # no-op and validation paths
    red.truncate_basis(99)
    assert red.basis_size == 5
    with pytest.raises(ValueError, match="negative"):
        red.truncate_basis(-1)
