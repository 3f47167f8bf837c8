"""Weak greedy reduced-basis construction driven by the sketched estimator.

The reference leaves the greedy loop to user scripts (SURVEY §3.1 "user
script (greedy loop)"); here it is a first-class driver. TPU-native detail:
each iteration solves the current ROM and evaluates the sketched error
estimator for the *entire* training set in one vmapped jit call (the
reference assembles and solves per-mu in Python).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from rla4mor_tpu.core.parameters import Mu, mu_stack
from rla4mor_tpu.mor.sketched_reductor import SketchedReductor
from rla4mor_tpu.utils.logger import get_logger


@dataclass
class GreedyResult:
    rom: object
    selected_mus: List[Mu] = field(default_factory=list)
    max_estimates: List[float] = field(default_factory=list)
    extension_times: List[float] = field(default_factory=list)
    iterations: int = 0


def rb_greedy(
    fom,
    reductor: SketchedReductor,
    training_set: Sequence[Mu],
    max_extensions: int = 20,
    atol: float = 0.0,
    rtol: float = 0.0,
    online_seed: int = 0,
    log_level: int = 20,
) -> GreedyResult:
    """Weak greedy: extend with the FOM solution at the worst-estimated mu."""
    logger = get_logger("mor.greedy", log_level)
    result = GreedyResult(rom=None)
    mus_batched = mu_stack(list(training_set))

    # bootstrap: largest rhs norm (all thetas equal for mu-independent rhs,
    # so simply take the first sample)
    mu0 = training_set[0]
    t0 = time.perf_counter()
    reductor.extend_basis(fom.solve(mu0), mu=mu0)
    result.extension_times.append(time.perf_counter() - t0)
    result.selected_mus.append(mu0)

    first_max = None
    for it in range(1, max_extensions):
        rom = reductor.reduce(seed=online_seed + it)
        _, estimates = jax.jit(rom.solve_and_estimate_batch)(mus_batched)
        estimates = np.asarray(estimates)
        imax = int(np.argmax(estimates))
        emax = float(estimates[imax])
        result.max_estimates.append(emax)
        if first_max is None:
            first_max = emax
        logger.info("greedy it=%d basis=%d max_est=%.3e", it,
                    reductor.basis_size, emax)
        if emax <= atol or (rtol and emax <= rtol * first_max):
            logger.info("greedy converged")
            result.rom = rom
            result.iterations = it
            return result
        mu = training_set[imax]
        t0 = time.perf_counter()
        reductor.extend_basis(fom.solve(mu), mu=mu)
        result.extension_times.append(time.perf_counter() - t0)
        result.selected_mus.append(mu)

    result.rom = reductor.reduce(seed=online_seed + max_extensions)
    result.iterations = max_extensions
    return result


def rb_greedy_strong(
    fom,
    reductor: SketchedReductor,
    training_set: Sequence[Mu],
    max_extensions: int = 20,
    atol: float = 0.0,
    rtol: float = 0.0,
    relative: bool = False,
    online_seed: int = 0,
    log_level: int = 20,
    snapshots=None,
) -> GreedyResult:
    """Strong greedy: select by the TRUE model error against precomputed
    training snapshots (pyMOR's ``rb_greedy(use_error_estimator=False)``
    analog; the reference leaves greedy loops to user scripts entirely,
    SURVEY §3.1).

    All training FOM solutions are computed (or passed via ``snapshots``,
    an (n, len(training_set)) column matrix) up front, so this is the
    small-training-set tool; use :func:`rb_greedy` /
    :func:`rb_greedy_no_retrace` when only estimates are affordable.
    Per iteration ONE jitted vmapped (ROM solve + lift + R-norm error)
    sweep runs over the whole snapshot batch; the selected snapshot is
    reused for the extension (no second FOM solve). Requires
    ``save_rb=True`` on the reductor (the lift needs the stored basis).
    """
    assert reductor.save_rb, "strong greedy lifts errors: needs save_rb=True"
    logger = get_logger("mor.greedy", log_level)
    result = GreedyResult(rom=None)
    mus_batched = mu_stack(list(training_set))
    product = reductor.product

    if snapshots is None:
        snapshots = fom.solve_many(list(training_set))
    U = jnp.asarray(snapshots)
    assert U.shape[1] == len(training_set)
    if relative:
        norms = np.asarray(product.norm(U))
        # dtype-aware floor: a 1e-300 literal underflows to 0 in f32
        denom = np.maximum(norms, np.finfo(norms.dtype).tiny)
    else:
        denom = np.ones(U.shape[1])

    @jax.jit
    def lift_batch(rom, rb, mus):
        """Batched ROM solve + lift to FOM space (the R-norm runs outside:
        products may wrap host sparse operators)."""
        return rb @ rom.solve_batch(mus).T  # (n, M)

    mu0 = training_set[0]
    t0 = time.perf_counter()
    reductor.extend_basis(U[:, 0], mu=mu0)
    result.extension_times.append(time.perf_counter() - t0)
    result.selected_mus.append(mu0)

    first_max = None
    for it in range(1, max_extensions):
        rom = reductor.reduce(seed=online_seed + it)
        diff = U - lift_batch(rom, reductor.rb, mus_batched)
        errors = np.asarray(product.norm(diff)) / denom
        imax = int(np.argmax(errors))
        emax = float(errors[imax])
        result.max_estimates.append(emax)
        if first_max is None:
            first_max = emax
        logger.info("greedy(strong) it=%d basis=%d max_err=%.3e", it,
                    reductor.basis_size, emax)
        if emax <= atol or (rtol and emax <= rtol * first_max):
            logger.info("greedy converged")
            result.rom = rom
            result.iterations = it
            return result
        mu = training_set[imax]
        t0 = time.perf_counter()
        reductor.extend_basis(U[:, imax], mu=mu)
        result.extension_times.append(time.perf_counter() - t0)
        result.selected_mus.append(mu)

    result.rom = reductor.reduce(seed=online_seed + max_extensions)
    result.iterations = max_extensions
    return result


def rb_greedy_padded(
    fom,
    reductor: SketchedReductor,
    training_set: Sequence[Mu],
    max_extensions: int = 20,
    atol: float = 0.0,
    rtol: float = 0.0,
    online_seed: int = 0,
    log_level: int = 20,
) -> GreedyResult:
    """Weak greedy with a no-retrace error sweep (SURVEY §7 hard part 5).

    The sketched state is padded to ``max_extensions`` columns with a fill
    counter, so the jitted (solve + sketched-estimate) sweep over the
    training batch compiles ONCE — on a remote-compile TPU platform the
    per-basis-size retracing of :func:`rb_greedy` dominates offline time.
    Supports both projections: masked square solve (galerkin) or masked
    min-norm least squares (minres; zeroed pad columns yield zero
    coefficients under the SVD solve).
    """
    import jax.numpy as jnp

    from rla4mor_tpu.mor.padded_reductor import build_masked_sweep

    minres = reductor.projection == "minres"
    logger = get_logger("mor.greedy", log_level)
    result = GreedyResult(rom=None)
    mus_batched = mu_stack(list(training_set))
    r_max = max_extensions
    k = reductor.embedding_primal.range_dim

    def padded_state():
        r = reductor.basis_size
        srb_pad = jnp.zeros((k, r_max), reductor.srb.dtype)
        srb_pad = srb_pad.at[:, :r].set(reductor.srb)
        T = reductor.residual_lhs.n_terms
        lhs_pad = jnp.zeros((T, k, r_max), reductor.residual_lhs.stack.dtype)
        lhs_pad = lhs_pad.at[:, :, :r].set(reductor.residual_lhs.stack)
        return srb_pad, lhs_pad

    # bootstrap
    mu0 = training_set[0]
    t0 = time.perf_counter()
    reductor.extend_basis(fom.solve(mu0), mu=mu0)
    result.extension_times.append(time.perf_counter() - t0)
    result.selected_mus.append(mu0)

    # residual_rhs exists only after the bootstrap extension
    sweep = build_masked_sweep(
        r_max, minres, reductor.fom.operator.coefficients,
        reductor.residual_rhs.coefficients,
    )

    first_max = None
    for it in range(1, max_extensions):
        srb_pad, lhs_pad = padded_state()
        rhs_stack = reductor.residual_rhs.stack[:, :, 0]
        # same seed schedule as rb_greedy / reduce(): galerkin draws one
        # online sketch per iteration, minres a (seed, seed+1) pair
        seed1 = online_seed + it
        phi1 = jnp.asarray(
            reductor.embedding_online.with_seed(seed1).matrix()
        ).astype(srb_pad.dtype)
        if minres:
            phi2 = jnp.asarray(
                reductor.embedding_online.with_seed(seed1 + 1).matrix()
            ).astype(srb_pad.dtype)
        else:
            phi2 = phi1
        estimates = np.asarray(
            sweep(srb_pad, lhs_pad, rhs_stack, phi1, phi2,
                  jnp.asarray(reductor.basis_size), mus_batched)
        )
        imax = int(np.argmax(estimates))
        emax = float(estimates[imax])
        result.max_estimates.append(emax)
        if first_max is None:
            first_max = emax
        logger.info("greedy(padded) it=%d basis=%d max_est=%.3e", it,
                    reductor.basis_size, emax)
        if emax <= atol or (rtol and emax <= rtol * first_max):
            break
        mu = training_set[imax]
        t0 = time.perf_counter()
        reductor.extend_basis(fom.solve(mu), mu=mu)
        result.extension_times.append(time.perf_counter() - t0)
        result.selected_mus.append(mu)

    result.rom = reductor.reduce(seed=online_seed + max_extensions)
    result.iterations = len(result.selected_mus)
    return result
