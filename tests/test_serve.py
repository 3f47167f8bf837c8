"""Online serving (rla4mor_tpu.serve): one jitted batched program per
ROM kind, zero-recompile hot swap, batch-size padding.

Oracle pattern: serve_batch's results must equal the per-mu online calls
the ROM classes already expose (themselves oracle-tested elsewhere)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rla4mor_tpu.core import mu_stack
from rla4mor_tpu.mor import SketchedReductor
from rla4mor_tpu.ops import GaussianEmbedding
from rla4mor_tpu.serve import evaluate_batch, pad_batch, serve_batch


def _stationary_rom(fom, seed=0, k=120, n_snapshots=6):
    Ru = fom.h1_0_product
    theta = GaussianEmbedding.make(
        fom.solution_dim, sqrt_product=Ru.sqrt, range_dim=k, seed=seed
    )
    red = SketchedReductor(fom, embedding_primal=theta, product=Ru)
    mus = fom.parameter_space.sample_randomly(n_snapshots, key=seed)
    red.extend_basis(fom.solve_many(mus))
    return red.reduce(seed=seed + 1)


def test_serve_stationary_matches_direct(thermal_fom):
    """serve_batch == the ROM's own solve/estimate/output per mu."""
    rom = _stationary_rom(thermal_fom)
    mus = mu_stack(thermal_fom.parameter_space.sample_randomly(5, key=3))
    out = serve_batch(rom, mus)
    assert set(out) == {"u", "estimate", "output"}

    direct_u = rom.solve_batch(mus)
    np.testing.assert_allclose(np.asarray(out["u"]), np.asarray(direct_u),
                               rtol=1e-12, atol=1e-14)
    for i in range(5):
        mu = jax.tree.map(lambda x: x[i], mus)
        np.testing.assert_allclose(
            float(out["estimate"][i]), float(rom.estimate_error(mu)),
            rtol=1e-10)
        np.testing.assert_allclose(
            np.asarray(out["output"][i]),
            np.asarray(rom.output(rom.solve(mu), mu)), rtol=1e-10)


def test_serve_hot_swap_no_recompile(thermal_fom):
    """A re-reduced ROM with the same reduced dimensions is served by the
    already-compiled executable (the zero-recompile model refresh,
    serve.py:82-87).

    Compiles are counted by TRACING a fresh local jit of the same
    ``evaluate_batch``: jax traces exactly once per new (pytree structure,
    shapes) key, so the counter is immune to global jit-cache eviction by
    other tests (the old ``serve_batch._cache_size()`` assertion read 0
    after a long suite and passed vacuously). A retrace — which is what a
    closed-over ROM, an evicted executable, or a shape-keyed rom leaf
    would cause — fails the == 1 assertions loudly."""
    from rla4mor_tpu.serve import evaluate_batch as _evaluate_batch

    rom1 = _stationary_rom(thermal_fom, seed=0)
    rom2 = _stationary_rom(thermal_fom, seed=42)  # same shapes, new model
    mus = mu_stack(thermal_fom.parameter_space.sample_randomly(4, key=9))

    traces = {"n": 0}

    def counting(rom, mus_batched):
        traces["n"] += 1
        return _evaluate_batch(rom, mus_batched)

    served = jax.jit(counting)

    out1 = served(rom1, mus)
    jax.block_until_ready(out1)
    assert traces["n"] == 1  # mechanism is live — a 0 here is a bug
    out2 = served(rom2, mus)
    jax.block_until_ready(out2)
    assert traces["n"] == 1  # hot swap: same program, no retrace
    # and it genuinely served the NEW model
    assert not np.allclose(np.asarray(out1["u"]), np.asarray(out2["u"]))
    # the swapped ROM is served CORRECTLY, not just differently
    np.testing.assert_allclose(np.asarray(out2["u"]),
                               np.asarray(rom2.solve_batch(mus)),
                               rtol=1e-12, atol=1e-14)

    # a different batch size IS a new program
    mus8, _ = pad_batch(mus, 8)
    jax.block_until_ready(served(rom1, mus8))
    assert traces["n"] == 2
    # ... and serving either ROM at the new size reuses it
    jax.block_until_ready(served(rom2, mus8))
    assert traces["n"] == 2


def test_serve_instationary_and_wave():
    """Time-dependent ROM kinds route through solve(return_estimate=True)
    and emit trajectory + estimate + output."""
    from rla4mor_tpu.models import (
        InstationaryReductor,
        WaveReductor,
        instationary_thermal_block,
        pod_greedy,
        wave_thermal_block,
    )

    pfom = instationary_thermal_block((2, 2), 6, T=0.5, nt=5)
    Ru = pfom.products["h1_0"]
    emb = GaussianEmbedding.make(pfom.solution_dim, sqrt_product=Ru.sqrt,
                                 range_dim=50, seed=4)
    red = InstationaryReductor(pfom, embedding=emb, product=Ru,
                               log_level=30)
    train = pfom.parameter_space.sample_randomly(3, key=5)
    rom, _hist = pod_greedy(pfom, red, train, max_extensions=2,
                            log_level=30)
    mus = mu_stack(pfom.parameter_space.sample_randomly(3, key=6))
    out = serve_batch(rom, mus)
    assert {"u", "estimate"} <= set(out)
    for i in range(3):
        mu = jax.tree.map(lambda x: x[i], mus)
        np.testing.assert_allclose(np.asarray(out["u"][i]),
                                   np.asarray(rom.solve(mu)),
                                   rtol=1e-12, atol=1e-14)
        np.testing.assert_allclose(float(out["estimate"][i]),
                                   float(rom.estimate_error(mu)),
                                   rtol=1e-10)

    wfom = wave_thermal_block((2, 2), 6, T=0.5, nt=5)
    Rw = wfom.products["h1_0"]
    wemb = GaussianEmbedding.make(wfom.solution_dim, sqrt_product=Rw.sqrt,
                                  range_dim=50, seed=7)
    wred = WaveReductor(wfom, embedding=wemb, product=Rw, log_level=30)
    wrom, _ = pod_greedy(wfom, wred, wfom.parameter_space.sample_randomly(
        2, key=8), max_extensions=2, log_level=30)
    wmus = mu_stack(wfom.parameter_space.sample_randomly(2, key=9))
    wout = serve_batch(wrom, wmus)
    assert "u" in wout and "estimate" in wout
    mu0 = jax.tree.map(lambda x: x[0], wmus)
    np.testing.assert_allclose(np.asarray(wout["u"][0]),
                               np.asarray(wrom.solve(mu0)),
                               rtol=1e-12, atol=1e-14)


def test_serve_corrected_output():
    """Goal-oriented composites serve (corrected output, indicator)."""
    from rla4mor_tpu.models import (
        InstationaryPrimalDualReductor,
        instationary_thermal_block,
    )

    pfom = instationary_thermal_block((2, 2), 6, T=0.5, nt=5)
    Ru = pfom.products["h1_0"]
    emb = GaussianEmbedding.make(pfom.solution_dim, sqrt_product=Ru.sqrt,
                                 range_dim=50, seed=4)
    red = InstationaryPrimalDualReductor(pfom, embedding=emb, product=Ru,
                                         log_level=30)
    for m in pfom.parameter_space.sample_randomly(2, key=1):
        red.extend(m, modes_per_extension=2)
    rom = red.reduce()
    mus = mu_stack(pfom.parameter_space.sample_randomly(3, key=2))
    out = serve_batch(rom, mus)
    assert set(out) == {"output", "estimate"}
    for i in range(3):
        mu = jax.tree.map(lambda x: x[i], mus)
        s, eta = rom.output_corrected(mu)
        np.testing.assert_allclose(complex(out["output"][i]), complex(s),
                                   rtol=1e-10)
        np.testing.assert_allclose(float(out["estimate"][i]), float(eta),
                                   rtol=1e-10)


def test_pad_batch(thermal_fom):
    """Edge-mode padding: first n rows identical, pad rows = last
    request, n_valid returned; oversized batches are rejected."""
    mus = mu_stack(thermal_fom.parameter_space.sample_randomly(3, key=1))
    padded, n = pad_batch(mus, 8)
    assert n == 3
    for leaf, pleaf in zip(jax.tree.leaves(mus), jax.tree.leaves(padded)):
        assert pleaf.shape[0] == 8
        np.testing.assert_array_equal(np.asarray(pleaf[:3]),
                                      np.asarray(leaf))
        np.testing.assert_array_equal(
            np.asarray(pleaf[3:]),
            np.tile(np.asarray(leaf[-1:]), (5, 1)))
    same, n_same = pad_batch(mus, 3)
    assert n_same == 3 and same is mus
    with pytest.raises(ValueError, match="exceed"):
        pad_batch(mus, 2)

    # padded batches serve cleanly and the valid prefix matches unpadded
    rom = _stationary_rom(thermal_fom)
    out_p = evaluate_batch(rom, padded)
    out = evaluate_batch(rom, mus)
    np.testing.assert_allclose(np.asarray(out_p["u"][:3]),
                               np.asarray(out["u"]), rtol=1e-12,
                               atol=1e-14)


def test_serve_batch_sharded_matches_unsharded(thermal_fom):
    """Data-parallel serving over an 8-device 'mu' mesh == unsharded
    serve_batch, and non-multiple batches are rejected."""
    from rla4mor_tpu.parallel import make_mesh
    from rla4mor_tpu.serve import serve_batch_sharded

    rom = _stationary_rom(thermal_fom)
    mesh = make_mesh(8, ("mu",))
    mus = mu_stack(thermal_fom.parameter_space.sample_randomly(16, key=11))
    out_s = serve_batch_sharded(rom, mus, mesh)
    out = serve_batch(rom, mus)
    for key in out:
        np.testing.assert_allclose(np.asarray(out_s[key]),
                                   np.asarray(out[key]),
                                   rtol=1e-12, atol=1e-14)
    # the batch really is sharded over the mesh
    assert len(out_s["u"].sharding.device_set) == 8

    bad = mu_stack(thermal_fom.parameter_space.sample_randomly(5, key=12))
    with pytest.raises(ValueError, match="multiple"):
        serve_batch_sharded(rom, bad, mesh)
