"""Device-side iterative solvers (lax control flow, jittable).

The reference does all FOM solves through host sparse direct factorizations
(SuperLU/UMFPACK, utilities/factorization.py). Those remain available on
host (core/linops.py); this module provides the TPU-native path: matrix-free
preconditioned CG with static-shape ``lax.while_loop``, usable inside jit /
shard_map for very large DoF counts (SURVEY §7 hard part 2).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax


class CGResult(NamedTuple):
    x: jax.Array
    iters: jax.Array
    residual_norm: jax.Array


def cg(
    matvec: Callable,
    b: jax.Array,
    x0: Optional[jax.Array] = None,
    precond: Optional[Callable] = None,
    tol: float = 1e-8,
    maxiter: int = 1000,
) -> CGResult:
    """Preconditioned conjugate gradients for SPD ``matvec``.

    Static shapes and a ``lax.while_loop`` — compiles once and runs fully on
    device; ``matvec``/``precond`` may contain collectives when the operand
    is sharded (used by parallel/).
    """
    if x0 is None:
        x0 = jnp.zeros_like(b)
    M = precond if precond is not None else (lambda r: r)

    bnorm = jnp.linalg.norm(b)
    r0 = b - matvec(x0)
    z0 = M(r0)
    p0 = z0
    rz0 = jnp.vdot(r0, z0).real
    # dtype-aware breakdown floor: a literal like 1e-300 UNDERFLOWS TO
    # ZERO in f32, turning the guard into a divide-by-zero (review
    # finding; reproduced as silent all-NaN returns)
    tiny = float(jnp.finfo(r0.dtype).tiny)

    def cond(state):
        _, r, _, _, k = state
        return jnp.logical_and(
            jnp.linalg.norm(r) > tol * jnp.maximum(bnorm, 1e-30), k < maxiter
        )

    def body(state):
        x, r, p, rz, k = state
        Ap = matvec(p)
        alpha = rz / jnp.maximum(jnp.vdot(p, Ap).real, tiny)
        x = x + alpha * p
        r = r - alpha * Ap
        z = M(r)
        rz_new = jnp.vdot(r, z).real
        beta = rz_new / jnp.maximum(rz, tiny)
        p = z + beta * p
        return (x, r, p, rz_new, k + 1)

    x, r, _, _, k = lax.while_loop(cond, body, (x0, r0, p0, rz0, jnp.asarray(0)))
    return CGResult(x, k, jnp.linalg.norm(r))


def bicgstab(
    matvec: Callable,
    b: jax.Array,
    x0: Optional[jax.Array] = None,
    precond: Optional[Callable] = None,
    tol: float = 1e-8,
    maxiter: int = 1000,
) -> CGResult:
    """Preconditioned BiCGStab (van der Vorst) for NONSYMMETRIC
    ``matvec`` — the device Krylov solver for the advection-diffusion
    stencil family, where CG does not apply. Same conventions as
    :func:`cg`: static shapes, ``lax.while_loop``, collectives allowed
    inside ``matvec``/``precond``; left application of the
    preconditioner to the search directions (K ~ A, ``precond(r)``
    approximates A^-1 r)."""
    if x0 is None:
        x0 = jnp.zeros_like(b)
    M = precond if precond is not None else (lambda r: r)

    bnorm = jnp.linalg.norm(b)
    r0 = b - matvec(x0)
    rhat = r0  # fixed shadow residual
    one = jnp.ones((), r0.dtype)
    # dtype-aware breakdown floor: 1e-300 underflows to zero in f32 and
    # a zero denominator would silently return all-NaN "converged"
    tiny = float(jnp.finfo(r0.dtype).tiny)

    def cond(state):
        *_, rnorm, k = state
        return jnp.logical_and(
            rnorm > tol * jnp.maximum(bnorm, tiny),
            k < maxiter,
        )

    def body(state):
        x, r, p, v, rho, alpha, omega, rnorm, k = state
        rho_new = jnp.vdot(rhat, r)
        # breakdown guards: the where's keep the scalars defined; on an
        # ACTUAL breakdown (f32 overflow -> inf/NaN in the scalars or
        # the residual) the update below freezes the last finite
        # iterate and forces exit — without this a breakdown exits the
        # loop "converged" with an all-NaN x (NaN > tol is False),
        # observed with Jacobi-BiCGStab on the 1M-DoF advection family.
        safe = lambda d: jnp.where(jnp.abs(d) > tiny, d, tiny)  # noqa: E731
        beta = (rho_new / safe(rho)) * (alpha / safe(omega))
        p_new = r + beta * (p - omega * v)
        ph = M(p_new)
        v_new = matvec(ph)
        alpha_new = rho_new / safe(jnp.vdot(rhat, v_new))
        s = r - alpha_new * v_new
        sh = M(s)
        t = matvec(sh)
        omega_new = jnp.vdot(t, s) / safe(jnp.vdot(t, t))
        x_new = x + alpha_new * ph + omega_new * sh
        r_new = s - omega_new * t
        rnorm_new = jnp.linalg.norm(r_new)
        ok = (jnp.isfinite(rnorm_new) & jnp.isfinite(rho_new)
              & jnp.isfinite(beta) & jnp.isfinite(alpha_new)
              & jnp.isfinite(omega_new))
        sel = lambda a, b_: jnp.where(ok, a, b_)  # noqa: E731
        return (sel(x_new, x), sel(r_new, r), sel(p_new, p),
                sel(v_new, v), sel(rho_new, rho), sel(alpha_new, alpha),
                sel(omega_new, omega), sel(rnorm_new, rnorm),
                jnp.where(ok, k + 1, maxiter))

    state0 = (x0, r0, jnp.zeros_like(b), jnp.zeros_like(b),
              one, one, one, jnp.linalg.norm(r0), jnp.asarray(0))
    x, r, *_, rnorm, k = lax.while_loop(cond, body, state0)
    return CGResult(x, k, rnorm)


def solve_dense(A: jax.Array, b: jax.Array) -> jax.Array:
    """Dense solve (jit-friendly)."""
    return jnp.linalg.solve(A, b)


def lstsq_dense(A: jax.Array, b: jax.Array, rcond: float = 1e-12) -> jax.Array:
    """Least-squares via economic SVD (jit-friendly, stable rank handling).

    Used for the minres ROM solve (reference LsOperator,
    utilities/other_operators.py:12-33) and the HS-estimator minimization
    (reference preconditioned_reductor.py:384).
    """
    U, s, Vh = jnp.linalg.svd(A, full_matrices=False)
    cutoff = rcond * jnp.max(s)
    s_inv = jnp.where(s > cutoff, 1.0 / s, 0.0)
    return Vh.conj().T @ (s_inv * (U.conj().T @ b).T).T if b.ndim > 1 else (
        Vh.conj().T @ (s_inv * (U.conj().T @ b))
    )


def bounded_lstsq(
    G: jax.Array,
    g: jax.Array,
    lb: jax.Array,
    ub: jax.Array,
    iters: int = 200,
) -> jax.Array:
    """Bound-constrained least squares min ||G x - g||, lb <= x <= ub.

    Device-side replacement for ``scipy.optimize.lsq_linear`` (reference
    inverse_problems/manifold_distance.py:229-234). Projected gradient with
    Nesterov momentum and exact-Lipschitz step (L = ||G||_2^2 via power
    iteration); dims are tiny (p = #parameters), so fixed ``iters`` is cheap
    and keeps shapes static for vmap over path points.
    """
    mm = partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)
    Gt = G.conj().T

    # power iteration for the Lipschitz constant
    def pw(v, _):
        w = mm(Gt, mm(G, v))
        return w / jnp.maximum(jnp.linalg.norm(w), 1e-30), None

    v0 = jnp.ones((G.shape[1],), dtype=G.dtype)
    v, _ = lax.scan(pw, v0 / jnp.linalg.norm(v0), None, length=20)
    L = jnp.maximum(jnp.linalg.norm(mm(G, v)) ** 2, 1e-30)

    x0 = jnp.clip(lstsq_dense(G, g), lb, ub)

    def step(carry, _):
        x, y, t = carry
        grad = mm(Gt, mm(G, y) - g)
        x_new = jnp.clip(y - grad / L, lb, ub)
        t_new = 0.5 * (1.0 + jnp.sqrt(1.0 + 4.0 * t * t))
        y_new = x_new + ((t - 1.0) / t_new) * (x_new - x)
        return (x_new, y_new, t_new), None

    (x, _, _), _ = lax.scan(step, (x0, x0, jnp.asarray(1.0, G.dtype)), None, length=iters)
    return x
