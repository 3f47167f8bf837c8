"""bf16 offline mode: accuracy envelope of low-precision snapshot sketching.

VERDICT r2 item 2 "Done" criterion: a test pins the accuracy envelope of
the bf16-input offline stage vs the full-precision one on the thermal
block.  bfloat16 has a 7-bit mantissa (eps = 2^-7 ~ 7.8e-3), so storing /
sketching snapshots at bf16 perturbs them by ~4e-3 relative; downstream:

* unconverged error estimates (est >> floor) agree to a few percent,
* converged estimates bottom out at an O(eps_bf16) RELATIVE noise floor
  instead of machine zero — fine for greedy selection and 2-3-digit
  certification, never for 1e-10 bounds (the docstring of
  ``SketchedReductor(offline_dtype=...)`` says exactly this).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rla4mor_tpu.core.linops import CastInputOp
from rla4mor_tpu.mor import SketchedReductor, rb_greedy
from rla4mor_tpu.ops import GaussianEmbedding, SrhtEmbedding

BF16_EPS = 2.0 ** -7


def _reductor(fom, offline_dtype=None, k=150, seed=1):
    Ru = fom.h1_0_product
    theta = SrhtEmbedding.make(
        fom.solution_dim, sqrt_product=Ru.sqrt, range_dim=k, seed=seed
    )
    phi = GaussianEmbedding.make(k, range_dim=60, seed=seed + 100)
    return SketchedReductor(
        fom, embedding_primal=theta, embedding_online=phi, product=Ru,
        orthonormalize=True, offline_dtype=offline_dtype, log_level=30,
    )


def test_cast_input_op(rng):
    g = GaussianEmbedding.make(64, range_dim=24, seed=3)
    op = CastInputOp(g, jnp.bfloat16)
    x = jnp.asarray(rng.normal(size=(64, 5)))
    y = np.asarray(op.apply(x))
    assert y.dtype == np.float32
    y_ref = np.asarray(g.apply(x.astype(jnp.bfloat16)))
    np.testing.assert_allclose(y, y_ref.astype(np.float32), rtol=1e-6)
    # the cast is the only error source: vs full precision it is O(eps)
    y_full = np.asarray(g.apply(x))
    rel = np.linalg.norm(y - y_full) / np.linalg.norm(y_full)
    assert rel < 4 * BF16_EPS, rel
    # complex inputs pass through uncast (no complex bf16)
    xc = x.astype(jnp.complex128) * (1 + 0.5j)
    yc = np.asarray(op.apply(xc))
    assert np.iscomplexobj(yc)
    np.testing.assert_allclose(yc, np.asarray(g.apply(xc)), rtol=1e-10)


def test_bf16_offline_estimator_envelope(thermal_fom):
    """Same seeds, same snapshots: bf16-offline estimates track the
    full-precision ones to a few percent while the ROM is unconverged, and
    the bf16 state (srb, residual stacks) is f32."""
    fom = thermal_fom
    mus_train = fom.parameter_space.sample_randomly(6, key=0)
    U = fom.solve_many(mus_train)

    red_hi = _reductor(fom)
    red_lo = _reductor(fom, offline_dtype=jnp.bfloat16)
    for red in (red_hi, red_lo):
        red.extend_basis(U[:, :3])

    assert red_lo.rb.dtype == jnp.bfloat16
    assert red_lo.srb.dtype == jnp.float32
    assert red_lo.residual_lhs.stack.dtype == jnp.float32

    rom_hi = red_hi.reduce(seed=7)
    rom_lo = red_lo.reduce(seed=7)

    mus_test = fom.parameter_space.sample_randomly(12, key=5)
    for mu in mus_test:
        e_hi = float(rom_hi.estimate_error(mu))
        e_lo = float(rom_lo.estimate_error(mu))
        # unconverged regime: estimates are O(1), must agree to a few %
        if e_hi > 0.05:
            assert abs(e_lo - e_hi) / e_hi < 8 * BF16_EPS, (mu, e_hi, e_lo)


def test_bf16_offline_noise_floor(thermal_fom):
    """A snapshot IN the basis: full precision certifies ~0 error, bf16
    bottoms out at the documented O(eps_bf16) relative floor."""
    fom = thermal_fom
    mus_train = fom.parameter_space.sample_randomly(4, key=1)
    U = fom.solve_many(mus_train)

    red_hi = _reductor(fom)
    red_lo = _reductor(fom, offline_dtype=jnp.bfloat16)
    for red in (red_hi, red_lo):
        red.extend_basis(U)
    rom_hi = red_hi.reduce(seed=3)
    rom_lo = red_lo.reduce(seed=3)

    mu = mus_train[2]
    u_norm = float(fom.h1_0_product.norm(U[:, 2]))
    e_hi = float(rom_hi.estimate_error(mu))
    e_lo = float(rom_lo.estimate_error(mu))
    assert e_hi < 1e-8 * u_norm
    # the bf16 floor: far above exact zero, but bounded by O(eps)*||u||
    assert e_lo < 30 * BF16_EPS * u_norm, (e_lo, u_norm)


def test_bf16_offline_greedy_decays(thermal_fom):
    """Greedy driven entirely through the bf16 offline stage still selects
    useful snapshots: max estimate decays until it hits the documented
    bf16 noise floor (~eps_bf16 * ||u||, measured plateau ~0.024 on this
    problem), and reconstruct() lifts through the bf16 basis."""
    fom = thermal_fom
    red = _reductor(fom, offline_dtype=jnp.bfloat16)
    mus_train = fom.parameter_space.sample_randomly(40, key=2)
    result = rb_greedy(fom, red, mus_train, max_extensions=8,
                       online_seed=11, log_level=30)
    ests = np.asarray(result.max_estimates)
    assert ests[-1] < 0.2 * ests[0], ests       # genuine decay ...
    assert ests[-1] < 4 * BF16_EPS, ests        # ... down to the floor

    rom = red.reduce(seed=13)
    mu = mus_train[0]
    u = np.asarray(fom.solve(mu)).ravel()
    u_rb = np.asarray(red.reconstruct(rom.solve(mu))).ravel()
    rel = np.linalg.norm(u - u_rb) / np.linalg.norm(u)
    assert rel < 0.05, rel


def test_srht_out_dtype_keeps_f32_accumulator(rng):
    """Round-3 review: the one-pass kernels cast their f32 accumulator
    back to the bf16 input dtype, so the offline mode paid an avoidable
    extra 2^-9 output rounding. ``apply_random(..., out_dtype=f32)`` must
    emit the accumulator directly — strictly closer to the f64 oracle of
    the SAME quantized input than the round-tripped bf16 result."""
    from rla4mor_tpu.ops.fwht import srht

    n, m, k = 4096, 5, 96
    S = SrhtEmbedding.make(n, range_dim=k, seed=3)
    x = jnp.asarray(rng.normal(size=(n, m)))
    xb = x.astype(jnp.bfloat16)

    # blocked (kernel) path
    Xb = S.to_blocked(xb)
    out_f32 = np.asarray(S.apply_random(Xb, out_dtype=jnp.float32))
    out_bf = np.asarray(S.apply_random(Xb)).astype(np.float32)
    assert out_f32.dtype == np.float32
    oracle = np.asarray(srht(xb.astype(jnp.float64).T, k, S.key).T)
    err_f32 = np.abs(out_f32 - oracle).max()
    err_bf = np.abs(out_bf - oracle).max()
    assert err_f32 < 1e-5, err_f32          # f32-level, not bf16-level
    assert err_bf > 16 * err_f32, (err_bf, err_f32)  # old path: 2^-9 floor

    # small-n 2-D path upcasts through the 3-pass FWHT
    out2 = np.asarray(S.apply_random(xb, out_dtype=jnp.float32))
    assert out2.dtype == np.float32
    assert np.abs(out2 - oracle).max() < 1e-5

    # complex input never loses its imaginary part to a real out_dtype
    xc = x.astype(jnp.complex128) * (1 + 0.25j)
    outc = np.asarray(S.apply_random(xc, out_dtype=jnp.float32))
    assert np.iscomplexobj(outc)


def test_cast_input_op_requests_f32_output(rng):
    """CastInputOp(SRHT, bf16) emits the kernel accumulator: vs the f64
    oracle of the quantized input it sits at f32 error, not bf16."""
    from rla4mor_tpu.ops.fwht import srht

    n, k = 4096, 64
    S = SrhtEmbedding.make(n, range_dim=k, seed=11)
    op = CastInputOp(S, jnp.bfloat16)
    x = jnp.asarray(rng.normal(size=(n, 4)))
    y = np.asarray(op.apply(x))
    assert y.dtype == np.float32
    oracle = np.asarray(
        srht(x.astype(jnp.bfloat16).astype(jnp.float64).T, k, S.key).T
    )
    assert np.abs(y - oracle).max() < 1e-5


def test_kernel_precision_complex64_is_highest():
    """Round-3 review: complex64 fell into the f32 HIGH branch despite the
    documented 'f64/complex inputs sketch at HIGHEST' contract."""
    S = SrhtEmbedding.make(256, range_dim=32, seed=0)
    hi = jax.lax.Precision.HIGHEST
    assert S._kernel_precision(jnp.complex64) is hi
    assert S._kernel_precision(jnp.complex128) is hi
    assert S._kernel_precision(jnp.float64) is hi
    assert S._kernel_precision(jnp.float32) is jax.lax.Precision.HIGH
    assert S._kernel_precision(jnp.bfloat16) is jax.lax.Precision.DEFAULT
