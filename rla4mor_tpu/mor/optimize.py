"""Certified ROM-based parameter optimization.

The reference framework's online stage is evaluation-only (greedy loops in
user scripts, reference mor/sketched_reductor.py; no optimizer anywhere in
/root/reference). This module adds the classic downstream application of a
certified reduced model: minimize an output functional

    J(mu) = objective(s(u_r(mu)), mu),   A(mu) u = b(mu),  s = C(mu) u

over the box parameter space, TPU-native end to end:

* **Exact gradients via autodiff through the reduced solve.** ``jax.grad``
  of ``StationaryROM.solve`` differentiates ``jnp.linalg.solve``, whose
  transpose rule IS the discrete adjoint equation — one extra r x r solve
  per gradient, not r forward solves and no hand-derived adjoint (the
  pyMOR stack the reference builds on ships a hand-written
  ``output_d_mu``; here the chain rule through the affine coefficient
  functionals is mechanical).
* **Batched multi-start.** All starting points run one jitted
  ``vmap``-of-``lax.scan`` projected-gradient program — S optimizers cost
  one program on the MXU, not S Python loops.
* **Certification.** ``|J_fom - J_rom| <= ||l(mu)||_{R^-1} * eta(mu) /
  alpha_LB(mu)`` combines the sketched residual estimator with a
  coercivity lower bound (:class:`~rla4mor_tpu.mor.bounds.MinThetaCoercivity`)
  and the exact affine Gram of the output functional's Riesz
  representatives. :func:`certified_minimize` wraps the optimizer in the
  standard enrich-at-the-optimum loop: optimize on the ROM, certify the
  candidate, extend the basis with one FOM solve there if the certificate
  is too loose, repeat — FOM solves are spent only where the optimizer
  actually goes.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from rla4mor_tpu.core.affine import AffineDense
from rla4mor_tpu.core.parameters import Mu, ParameterSpace, eval_coefficients
from rla4mor_tpu.core.products import Product
from rla4mor_tpu.mor.bounds import error_bound
from rla4mor_tpu.utils.logger import get_logger


# ---------------------------------------------------------------------------
# Objective construction
# ---------------------------------------------------------------------------


def make_objective(
    rom,
    space: ParameterSpace,
    objective: Optional[Callable] = None,
    component: int = 0,
):
    """Scalar function ``J(x)`` of the FLAT parameter vector ``x``.

    ``objective(s, mu)`` maps the output vector ``s = C(mu) u_r`` (and
    ``mu``) to a real scalar; default = ``Re s[component]``. The returned
    function is pure and jit/grad/vmap-safe (``ParameterSpace.parse`` is
    traced slicing).
    """
    if objective is None:
        def objective(s, mu):  # noqa: ARG001 - uniform signature
            return jnp.real(jnp.asarray(s).reshape(-1)[component])

    def J(x):
        mu = space.parse(x)
        u = rom.solve(mu)
        return objective(rom.output(u, mu), mu)

    return J


def output_gradient(rom, space: ParameterSpace, objective=None, component=0):
    """``(value, grad)`` of the reduced output w.r.t. the flat parameter
    vector — autodiff through the reduced solve (adjoint-exact)."""
    return jax.value_and_grad(
        make_objective(rom, space, objective, component)
    )


# ---------------------------------------------------------------------------
# Box-constrained multi-start projected gradient (one jitted program)
# ---------------------------------------------------------------------------


@dataclass
class MinimizeResult:
    x: jax.Array            # (d,) best final iterate
    value: float            # J(x)
    stationarity: float     # ||x - P(x - grad)||_2 at the best iterate
    xs: jax.Array           # (S, d) all final iterates
    values: jax.Array       # (S,)
    iterations: int


def minimize_scalar(
    J: Callable,
    space: ParameterSpace,
    n_starts: int = 8,
    iters: int = 100,
    key: jax.Array | int = 0,
    step0: float = 1.0,
    sigma: float = 1e-4,
    x0: Optional[jax.Array] = None,
) -> MinimizeResult:
    """Minimize a jittable scalar ``J(x)`` of the FLAT parameter vector
    over the box ``[space.low, space.high]^d``.

    Projected gradient with Armijo backtracking (sufficient decrease
    ``J(x+) <= J(x) - (sigma/t) ||x - x+||^2``), step doubled after each
    accepted iterate. All ``n_starts`` starts (uniform draws + the box
    midpoint; rows of ``x0`` override) advance together in one jitted
    ``vmap(lax.scan)`` program. Any differentiable reduced quantity
    works as ``J`` — e.g. ``lambda x: rom.output_corrected(
    space.parse(x))[0]`` for a goal-oriented primal-dual ROM, or a
    final-time parabolic output (autodiff flows through ``lax.scan``).
    """
    d = space.dim()
    lo = jnp.asarray(space.low, jnp.result_type(float))
    hi = jnp.asarray(space.high, jnp.result_type(float))
    if x0 is not None:
        starts = jnp.atleast_2d(jnp.asarray(x0, lo.dtype))
        assert starts.shape[1] == d
    else:
        if isinstance(key, int):
            key = jax.random.key(key)
        starts = jax.random.uniform(
            key, (max(int(n_starts), 1), d), minval=lo, maxval=hi,
            dtype=lo.dtype,
        )
        starts = starts.at[0].set(jnp.full((d,), 0.5 * (lo + hi), lo.dtype))

    vg = jax.value_and_grad(J)
    proj = lambda z: jnp.clip(z, lo, hi)  # noqa: E731
    t_max = jnp.asarray(max(step0, 1.0) * 1024.0, lo.dtype)
    t_min = jnp.asarray(1e-14, lo.dtype)

    def pgd(x_init):
        def body(carry, _):
            x, t = carry
            f0, g = vg(x)

            def trial(tt):
                xn = proj(x - tt * g)
                return xn, J(xn)

            xn, fn = trial(t)

            def need_backtrack(st):
                tt, xn, fn = st
                decrease = f0 - fn
                required = (sigma / tt) * jnp.sum((x - xn) ** 2)
                return (decrease < required) & (tt > t_min)

            def backtrack(st):
                tt = st[0] * 0.5
                xn, fn = trial(tt)
                return (tt, xn, fn)

            t, xn, fn = jax.lax.while_loop(
                need_backtrack, backtrack, (t, xn, fn)
            )
            accept = fn <= f0
            x1 = jnp.where(accept, xn, x)
            t1 = jnp.where(accept, jnp.minimum(2.0 * t, t_max), t)
            return (x1, t1), None

        (x_fin, _), _ = jax.lax.scan(
            body, (x_init, jnp.asarray(step0, lo.dtype)), None, length=iters
        )
        f_fin, g_fin = vg(x_fin)
        stat = jnp.linalg.norm(x_fin - proj(x_fin - g_fin))
        return x_fin, f_fin, stat

    xs, values, stats = jax.jit(jax.vmap(pgd))(starts)
    # NaN lanes (e.g. a singular reduced system at some iterate) must not
    # win the argmin; if EVERY start diverged, fail loudly.
    finite = jnp.where(jnp.isnan(values), jnp.inf, values)
    if not bool(jnp.isfinite(finite).any()):
        raise FloatingPointError(
            "minimize_scalar: the objective evaluated to NaN/inf at every "
            "start's final iterate — the model is singular over the box"
        )
    best = int(jnp.argmin(finite))
    return MinimizeResult(
        x=xs[best],
        value=float(values[best]),
        stationarity=float(stats[best]),
        xs=xs,
        values=values,
        iterations=int(iters),
    )


def minimize_output(
    rom,
    space: ParameterSpace,
    objective: Optional[Callable] = None,
    component: int = 0,
    **kwargs,
) -> MinimizeResult:
    """Minimize the reduced output over the box — :func:`minimize_scalar`
    on :func:`make_objective`; see there for the optimizer options."""
    return minimize_scalar(
        make_objective(rom, space, objective, component), space, **kwargs
    )


# ---------------------------------------------------------------------------
# Output error certification
# ---------------------------------------------------------------------------


class OutputDualNorm:
    """Exact ``||l(mu)||_{R^-1}`` for one row of an affine output functional.

    ``l(mu) = sum_t theta_t(mu) c_t`` (row ``component`` of each term of
    ``fom.output_functional``); the T x T Gram ``G_ts = c_t R^-1 c_s^H`` of
    the Riesz representatives is precomputed once on host (T is tiny), so
    evaluation ``sqrt(theta^H G theta)`` is jittable/vmappable. Combined
    with a state bound it certifies ``|s(u) - s(u_r)| <= ||l|| * ||e||_R``.
    """

    def __init__(self, fom, product: Product, component: int = 0):
        of = fom.output_functional
        assert of is not None, "FOM has no output functional"
        if isinstance(of, AffineDense):
            rows = [np.asarray(of.stack[t])[component]
                    for t in range(of.stack.shape[0])]
            coeffs = of.coefficients
        else:  # AffineOp with host/dense terms
            rows = [np.asarray(term.matrix())[component] for term in of.terms]
            coeffs = of.coefficients
        self.coefficients = tuple(coeffs)
        C = np.stack(rows, axis=0)  # (T, n)
        Q = np.asarray(product.riesz(jnp.asarray(C.conj().T)))  # (n, T)
        self.G = jnp.asarray(C @ Q)  # (T, T), Hermitian PSD

    def __call__(self, mu: Mu) -> jax.Array:
        theta = jnp.asarray(eval_coefficients(self.coefficients, mu))
        q = jnp.real(theta.conj() @ (self.G @ theta))
        return jnp.sqrt(jnp.maximum(q, 0.0))


class ConstantDualNorm:
    """mu-independent ``||l||_{R^-1}`` as a jittable callable — for FOMs
    whose output functional is a fixed vector with a known dual norm
    (e.g. the stencil families' lumped mean-value output ``l = h^d 1``
    has ``||l||_2 = h^d sqrt(n)`` exactly, and the sharded-greedy ROM's
    residual estimator is an l2 norm, so R = I is the consistent pick).
    Drop-in for :class:`OutputDualNorm` wherever only ``__call__`` is
    used (``output_error_bound``, ``mor.uq``)."""

    def __init__(self, value: float):
        self.value = float(value)
        assert self.value >= 0.0

    def __call__(self, mu: Mu) -> jax.Array:
        return jnp.asarray(self.value)


def output_error_bound(rom, mu: Mu, coercivity, dual_norm: OutputDualNorm,
                       u_r=None) -> jax.Array:
    """Certified (up to sketch distortion) output error bound
    ``||l(mu)||_{R^-1} * eta(mu) / alpha_LB(mu)``. Jittable, vmappable."""
    return dual_norm(mu) * error_bound(rom, mu, coercivity, u_r)


# ---------------------------------------------------------------------------
# Certified optimization: optimize on the ROM, enrich at the optimum
# ---------------------------------------------------------------------------


@dataclass
class CertifiedOptimum:
    mu: Mu
    x: jax.Array
    value: float                 # reduced output at mu
    bound: float                 # certified |J_fom - value| bound at mu
    converged: bool
    n_enrichments: int
    history: List[dict] = field(default_factory=list)
    stability_certified: bool = True  # the coercivity's own offline
                                      # defense verdict (matrix-free SCM
                                      # restart agreement; see mor/uq.py)


def certified_minimize(
    fom,
    reductor,
    coercivity,
    tol: float,
    space: Optional[ParameterSpace] = None,
    objective: Optional[Callable] = None,
    component: int = 0,
    max_enrichments: int = 20,
    seed: int = 0,
    log_level: int = 20,
    **minimize_kwargs,
) -> CertifiedOptimum:
    """Minimize the reduced output; certify the FOM output AT the result.

    The guarantee is local: on success the FOM output at the returned
    parameter satisfies ``|J_fom(mu*) - value| <= tol`` (the certificate is
    :func:`output_error_bound` at the candidate). Global optimality is
    heuristic — multi-start PGD explores the box but nothing certifies that
    no better FOM minimizer exists elsewhere. For certificate-gated step
    acceptance with trust-region radius management (fewer FOM solves, same
    local guarantee), see :func:`trust_region_minimize`.

    Loop: reduce -> multi-start PGD on the ROM -> certify the candidate
    optimum with :func:`output_error_bound` -> if the certificate exceeds
    ``tol``, spend ONE FOM solve there (`extend_basis`) and repeat —
    FOM work concentrates where the optimizer goes instead of a global
    greedy over a training set.

    ``objective`` must be the default output component for the certificate
    to apply verbatim (a custom objective reuses the optimizer but the
    bound still certifies the output COMPONENT, not the composite).
    """
    space = space or fom.parameter_space
    logger = get_logger("mor.optimize", log_level)
    dual = OutputDualNorm(fom, product=reductor.product, component=component)
    history: List[dict] = []

    if reductor.basis_size == 0:
        mu0 = space.parse(
            jnp.full((space.dim(),), 0.5 * (space.low + space.high))
        )
        logger.info("empty basis: seeding with one FOM solve at the midpoint")
        reductor.extend_basis(fom.solve(mu0), mu=mu0)

    n_enrich = 0
    for round_idx in range(max_enrichments + 1):
        rom = reductor.reduce(seed=seed + 17 * round_idx)
        res = minimize_output(
            rom, space, objective=objective, component=component,
            key=seed + round_idx, **minimize_kwargs,
        )
        mu = space.parse(res.x)
        bound = float(output_error_bound(rom, mu, coercivity, dual))
        history.append(
            {"round": round_idx, "basis_size": reductor.basis_size,
             "value": res.value, "bound": bound,
             "stationarity": res.stationarity}
        )
        logger.info(
            "round %d: r=%d J=%.6e bound=%.3e stat=%.2e",
            round_idx, reductor.basis_size, res.value, bound,
            res.stationarity,
        )
        if bound <= tol:
            return CertifiedOptimum(
                mu=mu, x=res.x, value=res.value, bound=bound,
                converged=True, n_enrichments=n_enrich, history=history,
                stability_certified=bool(
                    getattr(coercivity, "certified", True)),
            )
        if round_idx == max_enrichments:
            break
        reductor.extend_basis(fom.solve(mu), mu=mu)
        n_enrich += 1

    return CertifiedOptimum(
        mu=mu, x=res.x, value=res.value, bound=bound,
        converged=False, n_enrichments=n_enrich, history=history,
        stability_certified=bool(getattr(coercivity, "certified", True)),
    )


# ---------------------------------------------------------------------------
# Trust-region RB optimization: certificate-gated steps, radius management
# ---------------------------------------------------------------------------


@dataclass
class TrustRegionResult:
    mu: Mu
    x: jax.Array
    value: float                 # reduced output at mu
    bound: float                 # certified |J_fom(mu) - value| at mu
    converged: bool
    n_fom_solves: int            # FOM solves spent (== basis enrichments)
    n_steps: int                 # accepted TR steps
    history: List[dict] = field(default_factory=list)
    stability_certified: bool = True  # see CertifiedOptimum


def _tr_subproblem(rom, space, dual, coercivity, objective, component,
                   j_floor, iters=40, sigma=1e-4):
    """One jitted TR subproblem: projected-gradient descent on the
    reduced objective from ``x0``, every step gated by the RELATIVE
    certificate ``eta_s(x) <= delta * (|J(x)| + j_floor)`` (backtrack
    until inside the trust region; ``delta = inf`` disables the gate).
    Returns ``(x, J(x), eta_s(x), stationarity, boundary_hit)``."""
    J = make_objective(rom, space, objective, component)

    def eta_s(x):
        mu = space.parse(x)
        return output_error_bound(rom, mu, coercivity, dual)

    lo = jnp.asarray(space.low, jnp.result_type(float))
    hi = jnp.asarray(space.high, jnp.result_type(float))
    proj = lambda z: jnp.clip(z, lo, hi)  # noqa: E731
    vg = jax.value_and_grad(J)
    t_min = 1e-14

    def rel(en, fn):
        return en / (jnp.abs(fn) + j_floor)

    def run(x0, delta):
        def body(carry, _):
            x, t, f0 = carry
            _, g = vg(x)

            def trial(tt):
                xn = proj(x - tt * g)
                return xn, J(xn), eta_s(xn)

            xn, fn, en = trial(t)

            def bad(st):
                tt, xn, fn, en = st
                decrease_ok = (f0 - fn) >= (sigma / tt) * jnp.sum(
                    (x - xn) ** 2)
                return (~decrease_ok | (rel(en, fn) > delta)) & (tt > t_min)

            def backtrack(st):
                tt = st[0] * 0.5
                xn, fn, en = trial(tt)
                return (tt, xn, fn, en)

            t, xn, fn, en = jax.lax.while_loop(
                bad, backtrack, (t, xn, fn, en))
            ok = (fn <= f0) & (rel(en, fn) <= delta)
            x1 = jnp.where(ok, xn, x)
            f1 = jnp.where(ok, fn, f0)
            t1 = jnp.where(ok, 2.0 * t, t)
            return (x1, t1, f1), None

        f0 = J(x0)
        (x, _, f), _ = jax.lax.scan(
            body, (x0, jnp.asarray(1.0, lo.dtype), f0), None, length=iters)
        e = eta_s(x)
        _, g = vg(x)
        stat = jnp.linalg.norm(x - proj(x - g))
        return x, f, e, stat, rel(e, f) >= 0.75 * delta

    return jax.jit(run), J, eta_s


def trust_region_minimize(
    fom,
    reductor,
    coercivity,
    tol: float,
    space: Optional[ParameterSpace] = None,
    objective: Optional[Callable] = None,
    component: int = 0,
    max_fom_solves: int = 20,
    max_steps: int = 60,
    sub_iters: int = 40,
    delta0: float = 0.1,
    gtol: float = 1e-8,
    j_floor: Optional[float] = None,
    seed: int = 0,
    log_level: int = 20,
) -> TrustRegionResult:
    """Certified trust-region RB optimization (Qian/Grepl/Veroy/Willcox
    pattern): minimize the FOM output with FOM solves spent ONLY when a
    step cannot be certified from the ROM alone.

    The trust region is the set where the RELATIVE output certificate is
    small, ``{x : eta_s(x) / (|J(x)| + j_floor) <= delta}`` — enriching
    the basis enlarges it for free.  Each iteration solves a
    projected-gradient subproblem gated by that constraint
    (:func:`_tr_subproblem`); the trial point ``x_t`` is then judged:

    * **certified decrease** — ``J_rom(x_t) + eta_s(x_t) <
      J_rom(x_k) - eta_s(x_k)`` proves the TRUE objective decreased:
      accept with ZERO FOM work, expand ``delta`` when the subproblem
      pressed the boundary;
    * **gate-choked** — the subproblem could not move at all because the
      certificate is already too loose AT the iterate: spend one FOM
      solve at ``x_k`` itself (the snapshot collapses the certificate
      there to machine zero) and re-solve — never declare convergence
      off a choked subproblem;
    * otherwise spend ONE FOM solve at ``x_t``: the snapshot both
      settles the actual-vs-predicted ratio ``rho`` (accept/reject +
      radius update, classic TR rules) and enriches the basis there.

    Terminates when the iterate is first-order stationary for the ROM
    (``gtol``) AND its ABSOLUTE certificate is below ``tol`` — the same
    local guarantee as :func:`certified_minimize` (``|J_fom(mu*) -
    value| <= tol``; global optimality remains heuristic), typically at
    a fraction of the FOM solves (comparison: tests/test_optimize.py).

    ``coercivity`` must be jittable (e.g.
    :class:`~rla4mor_tpu.mor.bounds.MinThetaCoercivity`); for an SCM
    bound, pass its min-theta-style jittable surrogate or tabulate.
    ``j_floor`` regularizes the relative certificate near ``J = 0``
    (default ``max(tol, 1e-12 * (1 + |J(x_0)|))``).
    """
    space = space or fom.parameter_space
    logger = get_logger("mor.optimize.tr", log_level)
    dual = OutputDualNorm(fom, product=reductor.product, component=component)
    history: List[dict] = []

    n_fom = 0

    def enrich(mu):
        nonlocal n_fom
        u = fom.solve(mu)
        n_fom += 1
        reductor.extend_basis(u, mu=mu)
        s = fom.output_functional.apply(u, mu)
        if objective is None:
            return float(jnp.real(jnp.asarray(s).reshape(-1)[component]))
        return float(objective(s, mu))

    x_k = jnp.full((space.dim(),),
                   0.5 * (space.low + space.high),
                   jnp.result_type(float))
    if reductor.basis_size == 0:
        enrich(space.parse(x_k))

    def rebuild():
        rom = reductor.reduce(seed=seed + n_fom)
        return _tr_subproblem(
            rom, space, dual, coercivity, objective, component,
            j_floor_, iters=sub_iters)

    # j_floor needs one J evaluation; bootstrap with the unreduced output
    # scale at the midpoint (cheap: r x r solve on the current ROM).
    rom0 = reductor.reduce(seed=seed)
    f_boot = float(make_objective(rom0, space, objective, component)(x_k))
    j_floor_ = (float(j_floor) if j_floor is not None
                else max(tol, 1e-12 * (1.0 + abs(f_boot))))

    sub, J, eta_fn = rebuild()
    f_k = float(J(x_k))
    e_k = float(eta_fn(x_k))
    delta = float(delta0)
    n_steps = 0
    pred_tiny = 1e-14

    for it in range(max_steps):
        x_t, f_t, e_t, stat, boundary = sub(x_k, jnp.asarray(delta))
        f_t, e_t, stat = float(f_t), float(e_t), float(stat)
        pred = f_k - f_t
        moved = float(jnp.linalg.norm(x_t - x_k)) > 0.0
        entry = {"it": it, "J": f_t, "eta": e_t, "delta": delta,
                 "pred": pred, "basis_size": reductor.basis_size}

        if not moved or pred <= pred_tiny * max(abs(f_k), 1.0):
            # subproblem made no progress from x_k
            if stat <= gtol and e_k <= tol:
                history.append(entry)
                logger.info(
                    "converged: J=%.6e bound=%.3e fom_solves=%d steps=%d",
                    f_k, e_k, n_fom, n_steps)
                return TrustRegionResult(
                    mu=space.parse(x_k), x=x_k, value=f_k, bound=e_k,
                    converged=True, n_fom_solves=n_fom, n_steps=n_steps,
                    history=history, stability_certified=bool(
                        getattr(coercivity, "certified", True)))
            # gate-choked (certificate loose at the iterate) or ROM-
            # stationary with a loose certificate: enrich AT x_k, which
            # collapses eta there, and retry — NOT convergence.
            enrich(space.parse(x_k))
            sub, J, eta_fn = rebuild()
            f_k, e_k = float(J(x_k)), float(eta_fn(x_k))
            entry.update({"action": "enrich_at_iterate",
                          "fom_solves": n_fom})
            history.append(entry)
            logger.info(
                "it %d: choked/stationary-but-loose -> FOM solve #%d at "
                "iterate, J=%.6e eta=%.2e", it, n_fom, f_k, e_k)
            if n_fom >= max_fom_solves:
                break
            continue

        certified_dec = (f_t + e_t) < (f_k - e_k)
        entry["certified_step"] = bool(certified_dec)
        if certified_dec:
            x_k, f_k, e_k = x_t, f_t, e_t
            n_steps += 1
            if bool(boundary):
                delta = min(2.0 * delta, 1e6)
            entry["action"] = "certified_accept"
            logger.info("it %d: certified step J=%.6e eta=%.2e delta=%.2e",
                        it, f_k, e_k, delta)
        else:
            # uncertified decrease: one FOM solve at the trial point —
            # judge the step (classic rho test) AND enrich the basis
            mu_t = space.parse(x_t)
            f_true = enrich(mu_t)
            rho = (f_k - f_true) / pred
            accept = rho >= 0.1
            if accept:
                x_k = x_t
                n_steps += 1
                if rho >= 0.75 and bool(boundary):
                    delta = min(2.0 * delta, 1e6)
            else:
                delta = 0.5 * delta
            sub, J, eta_fn = rebuild()
            f_k, e_k = float(J(x_k)), float(eta_fn(x_k))
            entry.update({"action": "fom_judged", "rho": rho,
                          "accepted": bool(accept), "fom_solves": n_fom})
            logger.info(
                "it %d: FOM solve #%d rho=%.2f %s J=%.6e eta=%.2e "
                "delta=%.2e", it, n_fom, rho,
                "accept" if accept else "reject", f_k, e_k, delta)
            if n_fom >= max_fom_solves:
                history.append(entry)
                break
        history.append(entry)

    mu = space.parse(x_k)
    converged = e_k <= tol
    return TrustRegionResult(
        mu=mu, x=x_k, value=f_k, bound=e_k, converged=converged,
        n_fom_solves=n_fom, n_steps=n_steps, history=history,
        stability_certified=bool(getattr(coercivity, "certified", True)))
