"""Certified UQ over the parameter box (mor/uq.py).

Oracle pattern: the batched estimators are recomputed by direct per-sample
evaluation; bias bounds are checked against a FOM Monte Carlo on the SAME
samples (with the exact identity-Q sketch the certificates are theorems,
so |E s_fom - E s_rom| <= bias_bound must hold sample-for-sample).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from rla4mor_tpu.core.parameters import mu_unstack
from rla4mor_tpu.mor import (
    MinThetaCoercivity,
    OutputDualNorm,
    SketchedReductor,
    certified_moments,
    exceedance_probability,
    sample_mu_batched,
)
from rla4mor_tpu.ops import IdentityEmbedding


@pytest.fixture(scope="module")
def setup(thermal_fom):
    fom = thermal_fom
    Ru = fom.h1_0_product
    theta = IdentityEmbedding(fom.solution_dim, sqrt_product=Ru.sqrt)
    red = SketchedReductor(
        fom, embedding_primal=theta,
        embedding_online=IdentityEmbedding(theta.range_dim),
        product=Ru, orthonormalize=True,
    )
    mus = fom.parameter_space.sample_randomly(5, key=3)
    red.extend_basis(fom.solve_many(mus))
    rom = red.reduce()
    alpha = MinThetaCoercivity(fom, {"diffusion": jnp.full((4,), 1.0)})
    dual = OutputDualNorm(fom, product=Ru)
    return fom, rom, alpha, dual


def test_sample_mu_batched_shapes_and_determinism(thermal_fom):
    space = thermal_fom.parameter_space
    for method in ("mc", "halton"):
        a = sample_mu_batched(space, 16, key=5, method=method)
        b = sample_mu_batched(space, 16, key=5, method=method)
        assert a["diffusion"].shape == (16, 4)
        assert np.allclose(np.asarray(a["diffusion"]),
                           np.asarray(b["diffusion"]))
        arr = np.asarray(a["diffusion"])
        assert arr.min() >= space.low and arr.max() <= space.high
    # offset streams the same sequence: [0:8]+[8:16] == [0:16]
    full = np.asarray(
        sample_mu_batched(space, 16, key=7, method="halton")["diffusion"]
    )
    tail = np.asarray(
        sample_mu_batched(space, 8, key=7, method="halton", offset=8)[
            "diffusion"]
    )
    assert np.allclose(full[8:], tail)


def test_certified_moments_vs_fom_monte_carlo(setup):
    """ROM moments on n samples agree with a direct FOM evaluation of the
    SAME samples within the certified bias bounds (+ tiny slack for the
    f64 arithmetic)."""
    fom, rom, alpha, dual = setup
    space = fom.parameter_space
    n = 64
    res = certified_moments(
        rom, space, alpha, dual, n=n, key=11, method="mc", batch=32
    )
    assert res.n == n and res.method == "mc"

    mus = sample_mu_batched(space, n, key=11, method="mc")
    s_fom = np.array([
        float(fom.output(fom.solve(mu), mu).reshape(-1)[0])
        for mu in mu_unstack(mus)
    ])
    mean_fom = s_fom.mean()
    var_fom = s_fom.var(ddof=1)
    assert abs(mean_fom - res.mean) <= res.bias_bound + 1e-12
    assert abs(var_fom - res.std ** 2) <= res.var_bias_bound + 1e-12
    assert res.mc_stderr > 0


def test_certified_moments_batch_invariance(setup):
    """Streaming in batches must not change the estimate (same sequence)."""
    fom, rom, alpha, dual = setup
    space = fom.parameter_space
    a = certified_moments(rom, space, alpha, dual, n=48, key=2, batch=48)
    b = certified_moments(rom, space, alpha, dual, n=48, key=2, batch=16)
    assert abs(a.mean - b.mean) <= 1e-12 * max(1.0, abs(a.mean))
    assert abs(a.std - b.std) <= 1e-12
    assert abs(a.bias_bound - b.bias_bound) <= 1e-14


def test_halton_moments_converge_faster_is_not_asserted_but_runs(setup):
    fom, rom, alpha, dual = setup
    res = certified_moments(
        rom, fom.parameter_space, alpha, dual, n=128, key=3, method="halton"
    )
    assert np.isnan(res.mc_stderr)  # iid stderr has no meaning for QMC
    assert np.isfinite(res.mean) and res.std >= 0


def test_exceedance_bracket_contains_fom_probability(setup):
    fom, rom, alpha, dual = setup
    space = fom.parameter_space
    n = 64
    # median-ish threshold so both sides are populated
    probe = certified_moments(rom, space, alpha, dual, n=32, key=4)
    c = probe.mean
    res = exceedance_probability(
        rom, space, alpha, dual, threshold=c, n=n, key=13, batch=32
    )
    assert 0.0 <= res.p_lo <= res.p_nominal <= res.p_hi <= 1.0

    mus = sample_mu_batched(space, n, key=13, method="mc")
    s_fom = np.array([
        float(fom.output(fom.solve(mu), mu).reshape(-1)[0])
        for mu in mu_unstack(mus)
    ])
    p_emp = float((s_fom > c).mean())
    assert res.p_lo - 1e-12 <= p_emp <= res.p_hi + 1e-12


def test_sobol_additive_linear(thermal_fom):
    """Additive J = sum c_i x_i under independent uniforms: S_i = T_i =
    c_i^2 var(x_i) / sum c_j^2 var(x_j) (equal var here), exactly."""
    import jax.numpy as jnp

    from rla4mor_tpu.mor import sobol_indices

    space = thermal_fom.parameter_space
    c = jnp.asarray([1.0, 2.0, 3.0, 4.0])
    res = sobol_indices(lambda x: jnp.sum(c * x), space, n=2048, key=1)
    exact = np.asarray(c) ** 2 / float((c @ c))
    assert np.max(np.abs(res.first - exact)) <= 0.02
    assert np.max(np.abs(res.total - exact)) <= 0.02
    assert res.names == ("diffusion[0]", "diffusion[1]", "diffusion[2]",
                         "diffusion[3]")


def test_sobol_pure_interaction():
    """J = x0 * x1 on [0,1]^2: S_i = 3/7, T_i = 4/7 (classic closed form:
    V = 7/144, V_i = 1/48, VT_i = V - V_j = 4/7 V)."""
    import jax.numpy as jnp

    from rla4mor_tpu.core.parameters import ParameterSpace
    from rla4mor_tpu.mor import sobol_indices

    space = ParameterSpace.make({"p": 2}, 0.0, 1.0)
    res = sobol_indices(lambda x: x[0] * x[1], space, n=4096, key=2)
    assert np.max(np.abs(res.first - 3.0 / 7.0)) <= 0.03
    assert np.max(np.abs(res.total - 4.0 / 7.0)) <= 0.03
    # interaction shows up as T_i - S_i > 0
    assert np.all(res.total - res.first > 0.05)


def test_sobol_on_the_rom(setup):
    """Smoke + structure on the thermal-block ROM output: indices are in
    [0,1] (up to MC error), totals dominate firsts, and the symmetric
    2x2 block structure makes all four parameters comparably important."""
    from rla4mor_tpu.mor import sobol_indices
    from rla4mor_tpu.mor.optimize import make_objective

    fom, rom, _, _ = setup
    space = fom.parameter_space
    res = sobol_indices(make_objective(rom, space), space, n=512, key=3)
    assert np.all(res.first >= -0.05) and np.all(res.first <= 1.05)
    assert np.all(res.total >= res.first - 0.05)
    assert res.variance > 0
    assert res.first.min() >= 0.1 * res.first.max() - 0.05


def test_enrichment_tightens_the_bracket(setup, thermal_fom):
    """The certificate gap p_hi - p_lo is a model-quality measure: a
    richer basis must shrink it (independently of n)."""
    fom, rom5, alpha, dual = setup
    space = fom.parameter_space
    Ru = fom.h1_0_product
    theta = IdentityEmbedding(fom.solution_dim, sqrt_product=Ru.sqrt)
    red = SketchedReductor(
        fom, embedding_primal=theta,
        embedding_online=IdentityEmbedding(theta.range_dim),
        product=Ru, orthonormalize=True,
    )
    mus = space.sample_randomly(25, key=3)
    red.extend_basis(fom.solve_many(mus))
    rom25 = red.reduce()

    probe = certified_moments(rom25, space, alpha, dual, n=32, key=4)
    kw = dict(threshold=probe.mean, n=64, key=13, batch=32)
    gap5 = exceedance_probability(rom5, space, alpha, dual, **kw)
    gap25 = exceedance_probability(rom25, space, alpha, dual, **kw)
    assert gap25.p_hi - gap25.p_lo < gap5.p_hi - gap5.p_lo
    assert gap25.p_hi - gap25.p_lo <= 0.25


def _coarse_rom(thermal_fom, n_snapshots):
    fom = thermal_fom
    Ru = fom.h1_0_product
    theta = IdentityEmbedding(fom.solution_dim, sqrt_product=Ru.sqrt)
    red = SketchedReductor(
        fom, embedding_primal=theta,
        embedding_online=IdentityEmbedding(theta.range_dim),
        product=Ru, orthonormalize=True,
    )
    mus = fom.parameter_space.sample_randomly(n_snapshots, key=3)
    red.extend_basis(fom.solve_many(mus))
    return red.reduce()


def _fom_sobol_reference(fom, space, n, key, method, center):
    """The SAME pick-freeze estimators evaluated on FOM outputs (the
    quantity the certified brackets must contain)."""
    from rla4mor_tpu.mor.uq import _mu_from_flat, _pick_freeze_points

    d = space.dim()
    A, B = _pick_freeze_points(space, n, key, method)

    def f(X):
        return np.array([
            float(np.asarray(fom.output(fom.solve(mu), mu)).reshape(-1)[0])
            for mu in mu_unstack(_mu_from_flat(space, X))
        ])

    gA = f(A) - center
    gB = f(B) - center
    g_all = np.concatenate([gA, gB])
    V = float(np.mean(g_all ** 2) - np.mean(g_all) ** 2)
    S = np.zeros(d)
    T = np.zeros(d)
    for i in range(d):
        gABi = f(np.asarray(A.at[:, i].set(B[:, i]))) - center
        S[i] = float(np.mean(gB * (gABi - gA))) / V
        T[i] = 0.5 * float(np.mean((gA - gABi) ** 2)) / V
    return S, T, V


def test_certified_sobol_brackets_contain_fom(setup, thermal_fom):
    """Deliberately coarse ROM: the FOM-side pick-freeze estimators (same
    design, same center) lie inside the certified brackets, and the
    brackets tighten monotonically under basis enrichment."""
    from rla4mor_tpu.mor import certified_sobol_indices

    fom, _, alpha, dual = setup
    space = fom.parameter_space
    n = 48

    # TOO coarse (2 snapshots): certificates swamp the variance — the
    # result must declare itself uncertified, not emit garbage brackets
    rom_bad = _coarse_rom(thermal_fom, 2)
    res_bad = certified_sobol_indices(rom_bad, space, alpha, dual, n=n,
                                      key=21, method="halton", batch=64)
    assert not res_bad.certified
    assert np.all(np.isinf(res_bad.first_lo))

    rom2 = _coarse_rom(thermal_fom, 8)
    res2 = certified_sobol_indices(rom2, space, alpha, dual, n=n, key=21,
                                   method="halton", batch=64)
    assert res2.certified
    S_fom, T_fom, V_fom = _fom_sobol_reference(
        fom, space, n, 21, "halton", res2.center)
    eps = 1e-10
    assert np.all(res2.first_lo - eps <= S_fom)
    assert np.all(S_fom <= res2.first_hi + eps)
    assert np.all(res2.total_lo - eps <= T_fom)
    assert np.all(T_fom <= res2.total_hi + eps)
    assert res2.var_lo - eps <= V_fom <= res2.var_hi + eps
    # nominal values sit inside their own brackets
    assert np.all(res2.first_lo - eps <= res2.first)
    assert np.all(res2.first <= res2.first_hi + eps)

    rom8 = _coarse_rom(thermal_fom, 14)
    res8 = certified_sobol_indices(rom8, space, alpha, dual, n=n, key=21,
                                   method="halton", batch=64)
    assert res8.certified
    # enrichment tightens EVERY bracket
    assert np.all(res8.first_hi - res8.first_lo
                  < res2.first_hi - res2.first_lo + eps)
    assert np.all(res8.total_hi - res8.total_lo
                  < res2.total_hi - res2.total_lo + eps)
    assert res8.var_hi - res8.var_lo < res2.var_hi - res2.var_lo


def test_certified_sobol_nominal_matches_plain(setup):
    """Nominal values of the certified estimator == sobol_indices (same
    design, same key) to fixed-center-vs-empirical-mean MC noise."""
    from rla4mor_tpu.mor import certified_sobol_indices, sobol_indices
    from rla4mor_tpu.mor.optimize import make_objective

    fom, rom, alpha, dual = setup
    space = fom.parameter_space
    res_c = certified_sobol_indices(rom, space, alpha, dual, n=512, key=5)
    res_p = sobol_indices(make_objective(rom, space), space, n=512, key=5)
    np.testing.assert_allclose(res_c.first, res_p.first, atol=5e-2)
    np.testing.assert_allclose(res_c.total, res_p.total, atol=5e-2)


def test_sketch_refresh_wiring(thermal_fom):
    """A deliberately tiny online sketch (k_online=2) passed through
    ``reductor=`` either gets refreshed (online_dim grows) or the result
    visibly carries certified=False — never a silent trust."""
    from rla4mor_tpu.mor import MinThetaCoercivity, OutputDualNorm
    from rla4mor_tpu.ops import GaussianEmbedding

    fom = thermal_fom
    Ru = fom.h1_0_product
    theta = GaussianEmbedding.make(fom.solution_dim, sqrt_product=Ru.sqrt,
                                   range_dim=120, seed=0)
    red = SketchedReductor(
        fom, embedding_primal=theta,
        embedding_online=GaussianEmbedding.make(
            theta.range_dim, range_dim=2, seed=1),
        product=Ru, orthonormalize=True,
    )
    mus = fom.parameter_space.sample_randomly(5, key=3)
    red.extend_basis(fom.solve_many(mus))
    rom = red.reduce()
    alpha = MinThetaCoercivity(fom, {"diffusion": jnp.full((4,), 1.0)})
    dual = OutputDualNorm(fom, product=Ru)

    res = certified_moments(rom, fom.parameter_space, alpha, dual, n=32,
                            key=7, batch=32, reductor=red)
    assert res.sketch_info is not None
    info = res.sketch_info
    assert info["online_dim"] > 2 or not info["certified"]
    # without reductor= nothing is reported (the old silent behavior is
    # at least explicit now)
    res0 = certified_moments(rom, fom.parameter_space, alpha, dual, n=8,
                             key=7, batch=8)
    assert res0.sketch_info is None


# ---------------------------------------------------------------------------
# Parabolic certified UQ composition (VERDICT r3 item 10)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def parabolic_setup():
    """Goal-oriented parabolic composite (implicit Euler, non-compliant
    localized output) with the exact identity-Q estimator, deliberately
    coarse bases so certificates are visibly nonzero."""
    from rla4mor_tpu.core.affine import AffineDense
    from rla4mor_tpu.core.parameters import ONE
    from rla4mor_tpu.models import (
        InstationaryPrimalDualReductor,
        instationary_thermal_block,
    )

    fom = instationary_thermal_block((2, 2), 8, T=0.5, nt=10)
    nx = 8
    w = np.zeros((nx - 1, nx - 1))
    w[:3, :3] = 1.0
    fom.output_functional = AffineDense(
        jnp.asarray(w.reshape(1, 1, -1) / w.sum()), (ONE,)
    )
    Ru = fom.products["h1_0"]
    emb = IdentityEmbedding(fom.solution_dim, sqrt_product=Ru.sqrt)
    red = InstationaryPrimalDualReductor(fom, embedding=emb, product=Ru,
                                         log_level=30)
    for m in fom.parameter_space.sample_randomly(3, key=1):
        red.extend(m, modes_per_extension=2)
    rom = red.reduce()
    alpha = MinThetaCoercivity(fom, {"diffusion": jnp.full((4,), 1.0)},
                               product=Ru)
    return fom, rom, alpha


def _s_fom_final(fom, mu):
    traj = fom.solve(mu)
    return float(np.asarray(
        fom.output_functional.apply(jnp.asarray(traj), mu))[0, -1])


def test_parabolic_output_bound_is_rigorous(parabolic_setup):
    """|s_fom(T) - s_c| <= eta_pr * eta_du / alpha_LB at every sampled mu
    (exact estimator => theorem, like the stationary exact-sketch test)."""
    from rla4mor_tpu.mor import parabolic_output_error_bound

    fom, rom, alpha = parabolic_setup
    for key in range(8):
        mu = fom.parameter_space.sample_randomly(1, key=key)[0]
        s_c, eta_s = parabolic_output_error_bound(rom, mu, alpha)
        err = abs(float(s_c) - _s_fom_final(fom, mu))
        assert err <= float(eta_s) * (1 + 1e-12), (key, err, float(eta_s))
        assert float(eta_s) > 0  # coarse basis: certificate is live


def test_parabolic_output_bound_refuses_crank_nicolson():
    """The product bound's derivation needs the adjoint pairing states to
    be the dual theta-averages — only implicit Euler qualifies."""
    from rla4mor_tpu.models import (
        InstationaryPrimalDualReductor,
        instationary_thermal_block,
    )
    from rla4mor_tpu.mor import parabolic_output_error_bound

    fom = instationary_thermal_block((2, 2), 6, T=0.5, nt=8,
                                     time_theta=0.5)
    Ru = fom.products["h1_0"]
    emb = IdentityEmbedding(fom.solution_dim, sqrt_product=Ru.sqrt)
    red = InstationaryPrimalDualReductor(fom, embedding=emb, product=Ru,
                                         log_level=30)
    red.extend(fom.parameter_space.sample_randomly(1, key=0)[0])
    rom = red.reduce()
    alpha = MinThetaCoercivity(fom, {"diffusion": jnp.full((4,), 1.0)},
                               product=Ru)
    mu = fom.parameter_space.sample_randomly(1, key=1)[0]
    with pytest.raises(ValueError, match="implicit Euler"):
        parabolic_output_error_bound(rom, mu, alpha)


def test_parabolic_certified_moments_bias_bound(parabolic_setup):
    """certified_moments over the parabolic composite: the certified bias
    bound contains the TRUE sampled ROM-vs-FOM output bias."""
    fom, rom, alpha = parabolic_setup
    space = fom.parameter_space
    n = 24
    res = certified_moments(rom, space, alpha, dual_norm=None, n=n, key=11,
                            batch=n)
    mus = sample_mu_batched(space, n, key=11, method="mc")
    s_fom = np.array([_s_fom_final(fom, mu) for mu in mu_unstack(mus)])
    s_rom = np.array([
        float(np.real(rom.output_corrected(mu)[0]))
        for mu in mu_unstack(mus)
    ])
    assert abs(res.mean - s_rom.mean()) <= 1e-10  # same samples, same mean
    true_bias = abs(s_fom.mean() - s_rom.mean())
    assert true_bias <= res.bias_bound * (1 + 1e-12)
    assert res.bias_bound > 0


def test_parabolic_exceedance_bracket_contains_fom(parabolic_setup):
    """The deterministic exceedance bracket holds sample-for-sample for
    the parabolic final-time output (VERDICT r3 item 10 'done' check)."""
    fom, rom, alpha = parabolic_setup
    space = fom.parameter_space
    n = 24
    probe = certified_moments(rom, space, alpha, dual_norm=None, n=8,
                              key=4, batch=8)
    c = probe.mean
    res = exceedance_probability(rom, space, alpha, dual_norm=None,
                                 threshold=c, n=n, key=13, batch=n)
    assert 0.0 <= res.p_lo <= res.p_nominal <= res.p_hi <= 1.0
    mus = sample_mu_batched(space, n, key=13, method="mc")
    s_fom = np.array([_s_fom_final(fom, mu) for mu in mu_unstack(mus)])
    p_emp = float((s_fom > c).mean())
    assert res.p_lo - 1e-12 <= p_emp <= res.p_hi + 1e-12
    # coarse basis: the bracket must be informative but not vacuous
    assert res.p_hi - res.p_lo < 1.0


def test_certified_moments_sharded_matches_unsharded(setup):
    """The mu-sharded data-parallel path (sharding=NamedSharding over a
    'mu' mesh axis) computes the SAME moments and certificates as the
    single-device path — sharding is a layout annotation, not a
    different algorithm."""
    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    fom, rom, alpha, dual = setup
    space = fom.parameter_space
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("mu",))
    sh = NamedSharding(mesh, P("mu", None))
    kw = dict(n=64, key=9, batch=32)
    plain = certified_moments(rom, space, alpha, dual, **kw)
    with mesh:
        sharded = certified_moments(rom, space, alpha, dual,
                                    sharding=sh, **kw)
    for f in ("mean", "std", "bias_bound", "var_bias_bound", "mean_eta"):
        a, b = getattr(plain, f), getattr(sharded, f)
        assert abs(a - b) <= 1e-12 * max(1.0, abs(a)), (f, a, b)
    t = plain.mean + plain.std
    pe = exceedance_probability(rom, space, alpha, dual, threshold=t, **kw)
    with mesh:
        se = exceedance_probability(rom, space, alpha, dual, threshold=t,
                                    sharding=sh, **kw)
    assert (pe.p_lo, pe.p_hi, pe.p_nominal) == (se.p_lo, se.p_hi,
                                                se.p_nominal)


# ---------------------------------------------------------------------------
# Round-5: TOTAL intervals — bias + distribution-free sampling confidence
# (VERDICT r4 weak #4)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def fom_truth(setup):
    """Independent large-MC reference of E s_fom / the s_fom sample set
    (key disjoint from every small-run key below)."""
    fom, _, _, _ = setup
    space = fom.parameter_space
    n_ref = 512
    mus = sample_mu_batched(space, n_ref, key=101, method="mc")
    s_fom = np.array([
        float(fom.output(fom.solve(mu), mu).reshape(-1)[0])
        for mu in mu_unstack(mus)
    ])
    return s_fom


def test_total_interval_contains_fom_truth_small_n(setup, fom_truth):
    """At deliberately small n the sampling noise dominates the certified
    bias bound; the empirical-Bernstein total interval must still contain
    the (independently estimated) FOM truth — every term quantified."""
    fom, rom, alpha, dual = setup
    space = fom.parameter_space
    truth = float(fom_truth.mean())

    # generous a-priori ROM output range (10 sigma around a probe mean)
    probe = certified_moments(rom, space, alpha, dual, n=256, key=9)
    half = 10.0 * max(probe.std, 1e-6)
    rng = (probe.mean - half, probe.mean + half)

    res = certified_moments(rom, space, alpha, dual, n=32, key=5,
                            method="mc", batch=32, output_range=rng,
                            delta=0.05)
    assert np.isfinite(res.conf_term)
    assert res.conf_term > res.bias_bound  # small n: sampling dominates
    assert res.delta == 0.05
    assert res.total_lo <= truth <= res.total_hi
    # informative: much narrower than the declared range
    assert (res.total_hi - res.total_lo) < (rng[1] - rng[0])

    # without output_range the total interval is explicitly unquantified
    res2 = certified_moments(rom, space, alpha, dual, n=32, key=5,
                             method="mc", batch=32)
    assert np.isnan(res2.conf_term) and np.isnan(res2.total_lo)


def test_total_interval_rqmc_replicates(setup, fom_truth):
    """Randomized-QMC replicates: M independently scrambled Halton
    sequences give iid replicate means — finite conf_term +
    replicate_stderr; unreplicated QMC stays explicitly NaN."""
    fom, rom, alpha, dual = setup
    space = fom.parameter_space
    truth = float(fom_truth.mean())
    probe = certified_moments(rom, space, alpha, dual, n=256, key=9)
    half = 10.0 * max(probe.std, 1e-6)
    rng = (probe.mean - half, probe.mean + half)

    res = certified_moments(rom, space, alpha, dual, n=128, key=21,
                            method="halton", replicates=4,
                            output_range=rng, delta=0.05)
    assert res.n == 128
    assert np.isfinite(res.conf_term)
    assert np.isfinite(res.replicate_stderr)
    assert res.total_lo <= truth <= res.total_hi
    assert np.isnan(res.mc_stderr)  # still not an iid estimate

    un = certified_moments(rom, space, alpha, dual, n=128, key=21,
                           method="halton", output_range=rng)
    assert np.isnan(un.conf_term) and np.isnan(un.total_lo)


def test_output_range_violation_raises(setup):
    """A declared range the samples escape must fail LOUDLY (the
    distribution-free bound would be silently invalid)."""
    fom, rom, alpha, dual = setup
    with pytest.raises(ValueError, match="output_range"):
        certified_moments(rom, fom.parameter_space, alpha, dual, n=16,
                          key=5, output_range=(0.0, 1e-300))


def test_exceedance_total_interval(setup, fom_truth):
    """The [0,1]-Hoeffding total bracket contains the true exceedance
    probability (reference: the independent FOM sweep) — for free, no
    user input."""
    fom, rom, alpha, dual = setup
    space = fom.parameter_space
    c = float(np.median(fom_truth))
    res = exceedance_probability(rom, space, alpha, dual, threshold=c,
                                 n=64, key=13, batch=32, delta=0.05)
    assert np.isfinite(res.conf_term) and res.conf_term > 0
    assert 0.0 <= res.p_lo_total <= res.p_hi_total <= 1.0
    p_true = float((fom_truth > c).mean())  # 512-sample reference
    # reference p has its own stderr ~ 0.022 << the Hoeffding width 0.17
    assert res.p_lo_total - 0.07 <= p_true <= res.p_hi_total + 0.07

    qmc = exceedance_probability(rom, space, alpha, dual, threshold=c,
                                 n=64, key=13, method="halton", batch=32)
    assert np.isnan(qmc.conf_term) and np.isnan(qmc.p_lo_total)
