"""Checkpoint/resume of the sketched reductor state."""

import jax.numpy as jnp
import numpy as np
import pytest

from rla4mor_tpu.mor import (
    SketchedReductor,
    load_reductor_state,
    save_reductor,
)
from rla4mor_tpu.ops import GaussianEmbedding


def test_reductor_roundtrip(thermal_fom, tmp_path):
    fom = thermal_fom
    Ru = fom.h1_0_product
    theta = GaussianEmbedding.make(
        fom.solution_dim, sqrt_product=Ru.sqrt, range_dim=120, seed=3
    )
    phi = GaussianEmbedding.make(120, range_dim=60, seed=4)

    def fresh():
        return SketchedReductor(
            fom, embedding_primal=theta, embedding_online=phi, product=Ru
        )

    red = fresh()
    mus = fom.parameter_space.sample_randomly(5, key=0)
    red.extend_basis(fom.solve_many(mus), mu=None)
    red.mu_basis = mus

    path = tmp_path / "red.npz"
    save_reductor(red, path)

    red2 = fresh()
    load_reductor_state(red2, path)
    assert np.array_equal(np.asarray(red.srb), np.asarray(red2.srb))
    assert np.array_equal(np.asarray(red.rb), np.asarray(red2.rb))
    assert red.residual_lhs.coefficients == red2.residual_lhs.coefficients
    assert np.array_equal(
        np.asarray(red.residual_lhs.stack), np.asarray(red2.residual_lhs.stack)
    )
    assert len(red2.mu_basis) == 5

    mu = fom.parameter_space.sample_randomly(1, key=9)[0]
    rom1 = red.reduce(seed=11)
    rom2 = red2.reduce(seed=11)
    assert np.allclose(np.asarray(rom1.solve(mu)), np.asarray(rom2.solve(mu)))
    assert np.isclose(
        float(rom1.estimate_error(mu)), float(rom2.estimate_error(mu))
    )


def test_scipy_linear_operator_adapter(thermal_fom):
    import scipy.sparse.linalg as spla

    from rla4mor_tpu.core import HostLUInverse, ScipyLinearOperator

    fom = thermal_fom
    mu = fom.parameter_space.sample_randomly(1, key=1)[0]
    A = fom.assemble_sparse(mu)
    b = np.asarray(fom.assemble_rhs(mu))
    P = ScipyLinearOperator(HostLUInverse(A))
    x, info = spla.gmres(A, b, M=P, rtol=1e-10, maxiter=20)
    assert info == 0
    assert np.linalg.norm(A @ x - b) < 1e-8 * np.linalg.norm(b)


def test_instationary_reductor_roundtrip(tmp_path):
    """POD-greedy resume: save rb + embedding seed, restore into a fresh
    reductor, identical ROM estimates; mismatched seed refuses."""
    import pytest

    from rla4mor_tpu.models import (
        InstationaryReductor, instationary_thermal_block,
    )
    from rla4mor_tpu.mor import (
        load_instationary_reductor_state, save_instationary_reductor,
    )
    from rla4mor_tpu.ops import GaussianEmbedding

    pfom = instationary_thermal_block((2, 2), 12, nt=20)
    Ru = pfom.products["h1_0"]
    theta = GaussianEmbedding.make(
        pfom.solution_dim, sqrt_product=Ru.sqrt, range_dim=60, seed=4
    )
    red = InstationaryReductor(pfom, embedding=theta, product=Ru,
                               log_level=30)
    mu = pfom.parameter_space.sample_randomly(1, key=0)[0]
    from rla4mor_tpu.core.orthonormalize import pod
    traj = pfom.solve(mu)
    modes, _ = pod(red.project_trajectory(traj), product=Ru, modes=3)
    red.extend_basis(modes)
    path = tmp_path / "ired.npz"
    save_instationary_reductor(red, path)

    red2 = InstationaryReductor(pfom, embedding=theta, product=Ru,
                                log_level=30)
    load_instationary_reductor_state(red2, path)
    mu_t = pfom.parameter_space.sample_randomly(1, key=1)[0]
    e1 = float(red.reduce().estimate_error(mu_t))
    e2 = float(red2.reduce().estimate_error(mu_t))
    assert np.isclose(e1, e2, rtol=1e-12)

    bad = InstationaryReductor(
        pfom, embedding=theta.with_seed(9), product=Ru, log_level=30
    )
    with pytest.raises(ValueError, match="seed"):
        load_instationary_reductor_state(bad, path)


def test_padded_reductor_roundtrip(tmp_path, thermal_fom):
    """No-retrace offline resume: save mid-greedy padded state, restore
    into a fresh PaddedSketchedReductor, continue extending, identical
    ROM; seed mismatch refuses."""
    import pytest

    from rla4mor_tpu.mor import (
        PaddedSketchedReductor, load_padded_reductor_state,
        save_padded_reductor,
    )
    from rla4mor_tpu.ops import GaussianEmbedding

    fom = thermal_fom
    Ru = fom.h1_0_product

    def make(seed=0):
        theta = GaussianEmbedding.make(
            fom.solution_dim, sqrt_product=Ru.sqrt, range_dim=80, seed=seed
        )
        return PaddedSketchedReductor(fom, embedding_primal=theta,
                                      product=Ru, r_max=5, log_level=30)

    red = make()
    mus = fom.parameter_space.sample_randomly(3, key=2)
    for mu in mus[:2]:
        red.extend_basis(fom.solve(mu), mu=mu)
    path = tmp_path / "pad.npz"
    save_padded_reductor(red, path)

    red2 = make()
    load_padded_reductor_state(red2, path)
    assert red2.basis_size == 2
    for r in (red, red2):
        r.extend_basis(fom.solve(mus[2]), mu=mus[2])
    mu_t = fom.parameter_space.sample_randomly(1, key=3)[0]
    u1 = np.asarray(red.reduce(seed=7).solve(mu_t))
    u2 = np.asarray(red2.reduce(seed=7).solve(mu_t))
    assert np.allclose(u1, u2, atol=1e-12)
    assert [tuple(np.asarray(a["diffusion"])) for a in red2.mu_basis] == \
        [tuple(np.asarray(a["diffusion"])) for a in red.mu_basis]

    with pytest.raises(ValueError, match="seed_primal"):
        load_padded_reductor_state(make(seed=5), path)


def test_plain_loader_refuses_wrong_seed_and_fingerprint(thermal_fom, tmp_path):
    """Review round-2: the PLAIN loader must guard seeds (it stored them
    but never checked); and structurally-different same-seed embeddings
    (fingerprint) must refuse too."""
    import pytest

    from rla4mor_tpu.mor import (
        SketchedReductor, load_reductor_state, save_reductor,
    )
    from rla4mor_tpu.ops import GaussianEmbedding, SrhtEmbedding

    fom = thermal_fom
    Ru = fom.h1_0_product

    def make(emb_cls=GaussianEmbedding, seed=0):
        theta = emb_cls.make(fom.solution_dim, sqrt_product=Ru.sqrt,
                             range_dim=64, seed=seed)
        return SketchedReductor(fom, embedding_primal=theta, product=Ru,
                                log_level=30)

    red = make()
    mu = fom.parameter_space.sample_randomly(1, key=0)[0]
    red.extend_basis(fom.solve(mu), mu=mu)
    path = tmp_path / "plain_guard.npz"
    save_reductor(red, path)

    with pytest.raises(ValueError, match="seed_primal"):
        load_reductor_state(make(seed=3), path)
    with pytest.raises(ValueError, match="does not match"):
        load_reductor_state(make(emb_cls=SrhtEmbedding), path)
    # matching construction loads fine
    red2 = make()
    load_reductor_state(red2, path)
    assert red2.basis_size == 1


def test_eim_interpolant_roundtrip(tmp_path):
    """save/load of the EIM offline stage: all fields, both EIM
    (triangular, reserve) and DEIM (dense) variants."""
    import numpy as np

    from rla4mor_tpu.mor import (
        deim,
        eim_greedy,
        load_eim_interpolant,
        save_eim_interpolant,
    )

    rng = np.random.default_rng(0)
    x = np.linspace(0, 1, 300)
    G = jnp.asarray(np.stack(
        [1 + 9 * np.exp(-((x - c) ** 2) / (2 * w * w))
         for c, w in rng.uniform((0.25, 0.08), (0.75, 0.25), (40, 2))],
        axis=1,
    ))
    for interp in (eim_greedy(G, tol=1e-6, reserve=3), deim(G, modes=10)):
        path = tmp_path / "eim.npz"
        save_eim_interpolant(interp, path)
        back = load_eim_interpolant(path)
        assert back.triangular == interp.triangular
        assert back.n_terms == interp.n_terms
        assert back.n_reserve == interp.n_reserve
        assert back.snapshot_ids == interp.snapshot_ids
        assert back.sup_errors == interp.sup_errors
        np.testing.assert_array_equal(np.asarray(back.points),
                                      np.asarray(interp.points))
        np.testing.assert_array_equal(np.asarray(back.basis),
                                      np.asarray(interp.basis))
        H = G[:, ::3]
        np.testing.assert_allclose(np.asarray(back.interpolate(H)),
                                   np.asarray(interp.interpolate(H)),
                                   atol=1e-14)


def test_primal_dual_reductor_roundtrip(tmp_path):
    """Goal-oriented parabolic reductor checkpoint: both bases + both
    embedding seeds round-trip; the resumed reductor's corrected output
    and indicator are bit-identical; a wrong dual seed is rejected."""
    from rla4mor_tpu.models import (
        InstationaryPrimalDualReductor, instationary_thermal_block,
    )
    from rla4mor_tpu.mor import (
        load_primal_dual_reductor_state, save_primal_dual_reductor,
    )
    from rla4mor_tpu.ops import GaussianEmbedding

    pfom = instationary_thermal_block((2, 2), 6, T=0.5, nt=6)
    Ru = pfom.products["h1_0"]
    emb = GaussianEmbedding.make(pfom.solution_dim, sqrt_product=Ru.sqrt,
                                 range_dim=60, seed=4)
    red = InstationaryPrimalDualReductor(pfom, embedding=emb, product=Ru,
                                         log_level=30)
    for m in pfom.parameter_space.sample_randomly(2, key=1):
        red.extend(m, modes_per_extension=2)
    path = tmp_path / "pd.npz"
    save_primal_dual_reductor(red, path)

    red2 = InstationaryPrimalDualReductor(pfom, embedding=emb, product=Ru,
                                          log_level=30)
    load_primal_dual_reductor_state(red2, path)
    assert np.array_equal(np.asarray(red2.primal.rb), np.asarray(red.primal.rb))
    assert np.array_equal(np.asarray(red2.rb_dual), np.asarray(red.rb_dual))
    mu = pfom.parameter_space.sample_randomly(1, key=9)[0]
    s1, e1 = red.reduce().output_corrected(mu)
    s2, e2 = red2.reduce().output_corrected(mu)
    assert float(s1) == float(s2) and float(e1) == float(e2)

    # wrong dual embedding seed -> rejected
    red3 = InstationaryPrimalDualReductor(
        pfom, embedding=emb, embedding_dual=emb.with_seed(999),
        product=Ru, log_level=30,
    )
    with pytest.raises(ValueError, match="seed_embedding_dual"):
        load_primal_dual_reductor_state(red3, path)

    # output_kind mismatch -> rejected (rb_dual holds POD modes of a
    # different adjoint problem)
    red4 = InstationaryPrimalDualReductor(
        pfom, embedding=emb, product=Ru, output_kind="integral",
        log_level=30,
    )
    with pytest.raises(ValueError, match="output_kind"):
        load_primal_dual_reductor_state(red4, path)


def test_wave_reductor_roundtrip(tmp_path):
    """Wave reductor checkpoint: basis + embedding seed round-trip, ROM
    trajectory and indicator bit-identical."""
    from rla4mor_tpu.core.orthonormalize import pod
    from rla4mor_tpu.models import WaveReductor, wave_thermal_block
    from rla4mor_tpu.mor import load_wave_reductor_state, save_wave_reductor
    from rla4mor_tpu.ops import GaussianEmbedding

    fom = wave_thermal_block((2, 2), 8, T=0.5, nt=10)
    Ru = fom.products["h1_0"]
    emb = GaussianEmbedding.make(fom.solution_dim, sqrt_product=Ru.sqrt,
                                 range_dim=60, seed=4)
    red = WaveReductor(fom, embedding=emb, product=Ru, log_level=30)
    mu = fom.parameter_space.sample_randomly(1, key=0)[0]
    modes, _ = pod(fom.solve(mu), product=Ru, modes=4)
    red.extend_basis(modes)
    path = tmp_path / "wave.npz"
    save_wave_reductor(red, path)

    red2 = WaveReductor(fom, embedding=emb, product=Ru, log_level=30)
    load_wave_reductor_state(red2, path)
    mu_t = fom.parameter_space.sample_randomly(1, key=9)[0]
    t1, e1 = red.reduce().solve(mu_t, return_estimate=True)
    t2, e2 = red2.reduce().solve(mu_t, return_estimate=True)
    assert np.array_equal(np.asarray(t1), np.asarray(t2))
    assert float(e1) == float(e2)


def test_standalone_rom_roundtrip(thermal_fom, tmp_path):
    """save_rom/load_rom ships trained ROMs with no FOM/reductor in the
    runtime: stationary (incl. estimator + ls flag), parabolic, and wave
    ROMs round-trip with bit-identical solves/estimates/outputs."""
    from rla4mor_tpu.core.orthonormalize import pod
    from rla4mor_tpu.models import (
        InstationaryReductor, WaveReductor, instationary_thermal_block,
        wave_thermal_block,
    )
    from rla4mor_tpu.mor import load_rom, save_rom

    # stationary
    fom = thermal_fom
    Ru = fom.h1_0_product
    theta = GaussianEmbedding.make(fom.solution_dim, sqrt_product=Ru.sqrt,
                                   range_dim=80, seed=3)
    red = SketchedReductor(fom, embedding_primal=theta, product=Ru,
                           log_level=30)
    mus = fom.parameter_space.sample_randomly(3, key=0)
    red.extend_basis(fom.solve_many(mus), mu=None)
    rom = red.reduce(seed=5)
    p = tmp_path / "rom_s.npz"
    save_rom(rom, p)
    rom2 = load_rom(p)
    mu = fom.parameter_space.sample_randomly(1, key=9)[0]
    assert np.array_equal(np.asarray(rom.solve(mu)),
                          np.asarray(rom2.solve(mu)))
    u = rom.solve(mu)
    assert float(rom.error_estimator.estimate_error(u, mu)) == \
        float(rom2.error_estimator.estimate_error(u, mu))

    # parabolic
    pfom = instationary_thermal_block((2, 2), 8, T=0.5, nt=8)
    Rp = pfom.products["h1_0"]
    emb = GaussianEmbedding.make(pfom.solution_dim, sqrt_product=Rp.sqrt,
                                 range_dim=60, seed=4)
    ired = InstationaryReductor(pfom, embedding=emb, product=Rp,
                                log_level=30)
    mu_p = pfom.parameter_space.sample_randomly(1, key=1)[0]
    modes, _ = pod(pfom.solve(mu_p), product=Rp, modes=4)
    ired.extend_basis(modes)
    irom = ired.reduce()
    p2 = tmp_path / "rom_i.npz"
    save_rom(irom, p2)
    irom2 = load_rom(p2)
    t1, e1 = irom.solve(mu_p, return_estimate=True)
    t2, e2 = irom2.solve(mu_p, return_estimate=True)
    assert np.array_equal(np.asarray(t1), np.asarray(t2))
    assert float(e1) == float(e2)
    assert np.array_equal(np.asarray(irom.output(t1, mu_p)),
                          np.asarray(irom2.output(t2, mu_p)))

    # wave
    wfom = wave_thermal_block((2, 2), 8, T=0.5, nt=8)
    Rw = wfom.products["h1_0"]
    embw = GaussianEmbedding.make(wfom.solution_dim, sqrt_product=Rw.sqrt,
                                  range_dim=60, seed=6)
    wred = WaveReductor(wfom, embedding=embw, product=Rw, log_level=30)
    mu_w = wfom.parameter_space.sample_randomly(1, key=2)[0]
    wmodes, _ = pod(wfom.solve(mu_w), product=Rw, modes=4)
    wred.extend_basis(wmodes)
    wrom = wred.reduce()
    p3 = tmp_path / "rom_w.npz"
    save_rom(wrom, p3)
    wrom2 = load_rom(p3)
    t1, e1 = wrom.solve(mu_w, return_estimate=True)
    t2, e2 = wrom2.solve(mu_w, return_estimate=True)
    assert np.array_equal(np.asarray(t1), np.asarray(t2))
    assert float(e1) == float(e2)

    with pytest.raises(TypeError, match="unsupported ROM"):
        save_rom(object(), tmp_path / "bad.npz")


def test_corrected_output_rom_roundtrip(thermal_fom, tmp_path):
    """The goal-oriented composites ship too: stationary
    CorrectedOutputROM and the parabolic discrete-adjoint ROM round-trip
    with bit-identical corrected outputs + indicators."""
    from rla4mor_tpu.core.affine import AffineDense
    from rla4mor_tpu.core.orthonormalize import pod
    from rla4mor_tpu.core.parameters import ONE
    from rla4mor_tpu.models import (
        InstationaryPrimalDualReductor, instationary_thermal_block,
    )
    from rla4mor_tpu.mor import PrimalDualReductor, load_rom, save_rom

    fom = thermal_fom
    Ru = fom.h1_0_product
    theta = GaussianEmbedding.make(fom.solution_dim, sqrt_product=Ru.sqrt,
                                   range_dim=80, seed=3)
    pd = PrimalDualReductor(fom, embedding_primal=theta, product=Ru,
                            log_level=30)
    for mu in fom.parameter_space.sample_randomly(2, key=0):
        pd.extend(mu)
    rom = pd.reduce(seed=5)
    p = tmp_path / "rom_pd.npz"
    save_rom(rom, p)
    rom2 = load_rom(p)
    mu = fom.parameter_space.sample_randomly(1, key=9)[0]
    s1, e1 = rom.output_corrected(mu)
    s2, e2 = rom2.output_corrected(mu)
    assert float(s1) == float(s2) and float(e1) == float(e2)

    pfom = instationary_thermal_block((2, 2), 8, T=0.5, nt=8)
    nx = 8
    w = np.zeros((nx - 1, nx - 1))
    w[:3, :3] = 1.0
    pfom.output_functional = AffineDense(
        jnp.asarray(w.reshape(1, 1, -1) / w.sum()), (ONE,)
    )
    Rp = pfom.products["h1_0"]
    emb = GaussianEmbedding.make(pfom.solution_dim, sqrt_product=Rp.sqrt,
                                 range_dim=60, seed=4)
    ipd = InstationaryPrimalDualReductor(pfom, embedding=emb, product=Rp,
                                         log_level=30)
    for mu_i in pfom.parameter_space.sample_randomly(2, key=1):
        ipd.extend(mu_i, modes_per_extension=2)
    irom = ipd.reduce()
    p2 = tmp_path / "rom_ipd.npz"
    save_rom(irom, p2)
    irom2 = load_rom(p2)
    mu_t = pfom.parameter_space.sample_randomly(1, key=5)[0]
    s1, e1 = irom.output_corrected(mu_t)
    s2, e2 = irom2.output_corrected(mu_t)
    assert float(s1) == float(s2) and float(e1) == float(e2)
