"""Monotone semilinear reaction-diffusion: the NONLINEAR-IN-STATE family.

Beyond-reference addition (the reference framework is linear-affine only,
SURVEY §2.3; its closest machinery is the affine sketched reductor,
/root/reference/mor/sketched_reductor.py:140-190): this module brings the
state-nonlinear model class

    A(mu) u  +  c(mu) * M_L g(u)  =  f        on the unit square, u|_dD = 0

into the stencil-FOM protocol.  ``A(mu)`` is the matrix-free affine Q1
thermal-block stiffness (models/stencil.py), ``M_L`` the LUMPED Q1 mass
(diag h^2 on interior nodes — lumping makes the reaction act nodewise,
which is exactly what DEIM hyperreduction needs: one magic point = one
node), ``g`` a MONOTONE nondecreasing scalar nonlinearity applied
elementwise, and ``c(mu) >= 0`` the reaction strength.

Why monotone: with g' >= 0 and c >= 0 the operator
``F(u) = A(mu) u + c M_L g(u) - f`` is STRONGLY monotone with the same
constant as the linear part,

    <F(u) - F(v), u - v>  >=  <A(mu)(u - v), u - v>  >=  alpha(mu) ||u-v||_R^2,

so (a) the Newton Jacobian ``J(u) = A(mu) + c M_L g'(u)`` is SPD —
Newton-CG applies verbatim, and (b) the a-posteriori error bound

    ||u - u_r||_R  <=  ||F(u_r)||_{R^-1} / alpha_LB(mu)

holds with the LINEAR family's certified coercivity lower bound
(min-theta / SCM / matrix-free LOBPCG anchors, mor/bounds.py +
mor/scm_matfree.py) — the whole certified-bounds tier transfers to the
nonlinear class unchanged.  The ROM side (POD basis + DEIM-hyperreduced
reaction + certified residual estimator) lives in
``mor/semilinear_reductor.py``.

TPU shape: the FOM Newton solve is one jittable ``lax.while_loop`` whose
body runs a matrix-free preconditioned CG on the SPD Jacobian — identical
compute pattern to the linear stencil families, so it scales to the same
pod-scale DoF counts; the ROM online stage is a dense (r, r) Newton that
jits and vmaps over parameter batches.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from rla4mor_tpu.core.parameters import ParameterSpace
from rla4mor_tpu.core.solvers import cg
from rla4mor_tpu.models.stencil import (
    StencilThermalBlock,
    interior_mask,
)

# -- scalar nonlinearities (static names -> jit-cacheable callables) --------
# each entry: (g, g') with g monotone nondecreasing and g(0) = 0 (so u = 0
# stays the Dirichlet-compatible rest state)


def _g_cubic(u):
    return u * u * u


def _dg_cubic(u):
    return 3.0 * u * u


def _g_expm1(u):
    return jnp.expm1(u)


def _dg_expm1(u):
    return jnp.exp(u)


def _g_arctan_shifted(u):
    # u + atan(u): strongly monotone variant (g' >= 1) exercising a
    # non-polynomial nonlinearity
    return u + jnp.arctan(u)


def _dg_arctan_shifted(u):
    return 1.0 + 1.0 / (1.0 + u * u)


NONLINEARITIES = {
    "cubic": (_g_cubic, _dg_cubic),
    "expm1": (_g_expm1, _dg_expm1),
    "arctan": (_g_arctan_shifted, _dg_arctan_shifted),
}

# sup of g' over the symmetric interval [-U, U] — the rigorous local
# Lipschitz constant the certified IMEX parabolic bound needs
# (mor/semilinear_reductor.py::certified_error_bound): each g' here is
# even or monotone, so the sup is attained at +-U (or globally).
NONLINEARITY_DG_SUP = {
    "cubic": lambda U: 3.0 * U * U,          # g' = 3 s^2, even increasing
    "expm1": lambda U: jnp.exp(U),           # g' = e^s, increasing
    "arctan": lambda U: jnp.asarray(2.0),    # g' = 1 + 1/(1+s^2) <= 2
}

# spectral bounds of the CONSISTENT Q1 mass matrix relative to h^2 on
# the uniform square grid: M = M1 (x) M1 with the 1-D P1 mass
# eigenvalues h (2 + cos theta) / 3 in [h/3, h], so M's eigenvalues lie
# in [h^2/9, h^2]; the Dirichlet-interior principal submatrix inherits
# the bounds by Cauchy interlacing.
MASS_REL_SPECTRUM = (1.0 / 9.0, 1.0)


class SemilinearStencilFOM:
    """Matrix-free monotone semilinear FOM on the stencil protocol.

    ``A(mu) u + c(mu) M_L g(u) = f`` with ``A`` the (grid_shape) thermal
    block, ``c(mu) = reaction_scale * mu['reaction'][0]`` and ``g`` one of
    :data:`NONLINEARITIES`.  Parameters live in the global box
    ``[mu_lo, mu_hi]`` (diffusion per block + one reaction entry).
    """

    is_spd = True  # the Newton Jacobian is SPD (monotone g)

    def __init__(
        self,
        grid_shape=(2, 2),
        num_intervals: int = 64,
        dtype=jnp.float32,
        nonlinearity: str = "cubic",
        reaction_scale: float = 100.0,
        mu_range: tuple[float, float] = (0.1, 1.0),
    ):
        self.linear = StencilThermalBlock(grid_shape, num_intervals, dtype)
        self.grid_shape = grid_shape
        self.num_intervals = num_intervals
        self.dtype = dtype
        self.n_nodes = num_intervals + 1
        self.h = 1.0 / num_intervals
        if nonlinearity not in NONLINEARITIES:
            raise ValueError(
                f"unknown nonlinearity {nonlinearity!r}; "
                f"one of {sorted(NONLINEARITIES)}"
            )
        self.nonlinearity = nonlinearity
        self.g, self.dg = NONLINEARITIES[nonlinearity]
        self.reaction_scale = float(reaction_scale)
        if mu_range[0] < 0:
            raise ValueError("monotonicity needs c(mu) >= 0: mu_lo >= 0")
        self.parameter_space = ParameterSpace.make(
            {"diffusion": self.linear.n_terms, "reaction": 1}, *mu_range
        )

    # -- pieces ------------------------------------------------------------
    @property
    def solution_shape(self):
        return self.linear.solution_shape

    @property
    def n_dof(self) -> int:
        return self.n_nodes * self.n_nodes

    def reaction(self, mu) -> jax.Array:
        return self.reaction_scale * jnp.asarray(mu["reaction"]).reshape(-1)[0]

    def mass_lumped_diag(self, dtype=None) -> jax.Array:
        """Lumped Q1 mass diagonal: h^2 on interior nodes, 0 on the
        Dirichlet ring (the row-sum of the consistent mass, Dirichlet
        rows cleared)."""
        dt = self.dtype if dtype is None else dtype
        return (self.h * self.h) * interior_mask(self.n_nodes, dt)

    def apply_linear(self, mu, u: jax.Array) -> jax.Array:
        return self.linear.apply(mu, u)

    def apply_nonlinear(self, mu, u: jax.Array) -> jax.Array:
        """c(mu) M_L g(u) — nodewise on the interior."""
        ml = self.mass_lumped_diag(u.dtype)
        return self.reaction(mu).astype(u.dtype) * ml * self.g(u)

    def residual(self, mu, u: jax.Array) -> jax.Array:
        """F(u) = A(mu) u + c M_L g(u) - f (zero on the Dirichlet ring)."""
        return (self.apply_linear(mu, u) + self.apply_nonlinear(mu, u)
                - self.rhs(u.dtype))

    def jacobian_apply(self, mu, u: jax.Array, v: jax.Array) -> jax.Array:
        """J(u) v = A(mu) v + c M_L g'(u) v (SPD for monotone g)."""
        ml = self.mass_lumped_diag(v.dtype)
        c = self.reaction(mu).astype(v.dtype)
        return self.apply_linear(mu, v) + c * ml * self.dg(u) * v

    def jacobian_diag(self, mu, u: jax.Array) -> jax.Array:
        """diag J(u) for Jacobi preconditioning (>= diag A > 0)."""
        d = self.linear.jacobi_diag(mu)
        ml = self.mass_lumped_diag(u.dtype)
        return d + self.reaction(mu).astype(u.dtype) * ml * self.dg(u)

    def rhs(self, dtype=None) -> jax.Array:
        return self.linear.rhs(dtype)

    def output(self, u) -> jax.Array:
        """Mean-value functional (lumped integral)."""
        return jnp.sum(u) * self.h * self.h

    def product_apply(self, u: jax.Array) -> jax.Array:
        """h1_0 product R = A(kappa=1)."""
        return self.linear.product_apply(u)

    def affine_operator(self):
        """AffineOp of the LINEAR part (feeds MinThetaCoercivity /
        matrix-free SCM: the monotone bound only needs the linear
        family's coercivity)."""
        return self.linear.affine_operator()

    # -- solve ---------------------------------------------------------------
    @partial(jax.jit, static_argnames=("self", "newton_tol", "max_newton",
                                       "cg_tol", "cg_maxiter", "mesh",
                                       "axis", "cg_precond",
                                       "return_iters"))
    def solve_newton(
        self,
        mu,
        newton_tol: float = 1e-9,
        max_newton: int = 30,
        cg_tol: float = 1e-10,
        cg_maxiter: int = 2000,
        mesh=None,
        axis: str = "dof",
        cg_precond: str = "jacobi",
        return_iters: bool = False,
    ):
        """Jittable Newton-CG from u = 0: full steps (the monotone
        operator has a unique solution; from the rest state with the
        smooth g's above plain Newton converges in < 10 steps for the
        default families — ``max_newton`` is the safety bound), inner
        preconditioned CG on the SPD Jacobian.

        Convergence claim: ||F(u)||_2 <= newton_tol * ||f||_2 — OR the
        dtype's representation floor was reached.  Any u STORED in f32
        has true residual >~ eps_f32 * lam_max * ||u||_2 (~1.8e-2
        relative at 4.2M DoF, measured in f64: PERF.md round-5), so an
        f32 pod-scale solve can never signal a 1e-6 tolerance; the loop
        therefore also stops on STAGNATION (per-step residual decrease
        worse than 10% — genuine Newton steps on these smooth monotone
        families contract far faster, and at the floor the ratio is ~1),
        instead of silently burning ``max_newton`` full iterations.
        ``return_iters=True`` additionally returns the iteration count
        (host diagnostics / tests).

        ``cg_precond``: ``'jacobi'`` (default) or ``'mg'`` — a geometric
        V-cycle on the LINEAR stiffness ``A(mu)`` (the reaction diagonal
        is O(c h^2 g'), negligible for conditioning). MANDATORY at pod
        scale in f32: Jacobi-CG stagnates at ~eps_f32 * kappa relative
        residual (measured 2.1e-2 at 4.2M DoF, PERF.md round-5) while
        the V-cycle keeps the preconditioned kappa O(1). Needs
        power-of-two ``num_intervals`` (models/multigrid.py).

        ``mesh``: a ``jax.sharding.Mesh`` with a DoF axis — the node
        grid's leading axis is shard-constrained over it so GSPMD
        partitions the stencil applies (halo exchanges) exactly like
        the linear families (models/instationary_stencil.py:176-185).
        """
        constrain = self._grid_constraint(mesh, axis)
        f = self.rhs()
        fnorm = jnp.linalg.norm(f)
        tiny = jnp.asarray(jnp.finfo(f.dtype).tiny, f.dtype)

        if cg_precond == "mg":
            from rla4mor_tpu.models.multigrid import make_vcycle

            vc = make_vcycle(self.linear.kappa(mu))

            def precond_for(u):
                return vc
        elif cg_precond == "jacobi":
            def precond_for(u):
                diag = self.jacobian_diag(mu, u)
                return lambda r: r / diag
        else:
            raise ValueError(f"cg_precond must be 'jacobi' or 'mg': "
                             f"{cg_precond!r}")

        def cond(state):
            u, k, rnorm, prev = state
            return jnp.logical_and(
                jnp.logical_and(
                    rnorm > newton_tol * jnp.maximum(fnorm, tiny),
                    k < max_newton,
                ),
                # stagnation stop: still contracting by >= 10% per step
                # (prev = inf on entry; at the dtype floor the ratio ~ 1)
                rnorm <= 0.9 * prev,
            )

        def body(state):
            u, k, rnorm, prev = state
            F = self.residual(mu, u)
            res = cg(
                lambda v: self.jacobian_apply(mu, u, v),
                -F,
                precond=precond_for(u),
                tol=cg_tol,
                maxiter=cg_maxiter,
            )
            u_new = constrain(u + res.x)
            return (u_new, k + 1,
                    jnp.linalg.norm(self.residual(mu, u_new)), rnorm)

        u0 = constrain(jnp.zeros(self.solution_shape, self.dtype))
        inf0 = jnp.asarray(jnp.inf, fnorm.dtype)
        u, iters, _, _ = lax.while_loop(
            cond, body,
            (u0, jnp.asarray(0), jnp.linalg.norm(self.residual(mu, u0)),
             inf0),
        )
        if return_iters:
            return u, iters
        return u

    def _grid_constraint(self, mesh, axis: str):
        """Identity when ``mesh`` is None; else a DoF-axis sharding
        constraint on the node grid (leading axis over ``axis``)."""
        if mesh is None:
            return lambda u: u
        from jax.sharding import NamedSharding, PartitionSpec as P

        sharding = NamedSharding(
            mesh, P(axis, *([None] * (len(self.solution_shape) - 1)))
        )
        return lambda u: lax.with_sharding_constraint(u, sharding)

    def solve(self, mu) -> jax.Array:
        """Reductor-facing flat solve (column vector of length n_dof)."""
        return self.solve_newton(mu).reshape(-1)

    def solve_many(self, mus) -> jax.Array:
        return jnp.stack([self.solve(mu) for mu in mus], axis=1)

    def sample_parameters(self, count: int, key=0):
        return self.parameter_space.sample_randomly(count, key)


class SemilinearInstationaryFOM:
    """IMEX semilinear heat equation over the monotone reaction family:

        M u^{k+1} + dt A(mu) u^{k+1}  =  M u^k + dt (f - c(mu) M_L g(u^k)),

    implicit (backward-Euler) diffusion, EXPLICIT reaction — each time
    step is one LINEAR SPD solve (M + dt A, warm-started preconditioned
    CG inside a ``lax.scan``), so the parabolic time loop keeps the
    exact compute pattern of :class:`InstationaryStencilFOM`
    (models/instationary_stencil.py) while the nonlinearity costs one
    nodewise evaluation per step.  First-order accurate in dt (both
    pieces are); the explicit reaction is the standard IMEX trade —
    stable for ``dt * c * max g'(u)`` below O(1), which the default
    families satisfy by orders of magnitude (solutions are O(0.1)).

    M is the CONSISTENT Q1 mass (time derivative), M_L the lumped one
    (reaction) — the same split DEIM needs on the reduced side.
    """

    def __init__(self, fom: SemilinearStencilFOM, T: float = 1.0,
                 nt: int = 50):
        self.fom = fom
        self.T = float(T)
        self.nt = int(nt)
        self.dt = self.T / self.nt
        self.parameter_space = fom.parameter_space
        self.u0 = jnp.zeros(fom.solution_shape, fom.dtype)

    @property
    def solution_shape(self):
        return self.fom.solution_shape

    def _mass_apply(self, v: jax.Array) -> jax.Array:
        from rla4mor_tpu.models.stencil import mass_apply

        return mass_apply(v, self.fom.h)

    @partial(jax.jit, static_argnames=("self", "tol", "maxiter",
                                       "store_every", "mesh", "axis"))
    def solve(self, mu, tol: float = 1e-9, maxiter: int = 400,
              store_every: int = 1, mesh=None,
              axis: str = "dof") -> jax.Array:
        """(*solution_shape, n_stored) trajectory including u0 (time
        axis last), exactly like ``InstationaryStencilFOM.solve``
        (incl. its optional DoF-sharded ``mesh`` mode)."""
        from rla4mor_tpu.core.solvers import cg
        from rla4mor_tpu.models.stencil import mass_diag

        fom = self.fom
        dt = self.dt
        b = fom.rhs()
        ml = fom.mass_lumped_diag()
        c = fom.reaction(mu).astype(fom.dtype)

        def B(v):
            return self._mass_apply(v) + dt * fom.apply_linear(mu, v)

        dia = (mass_diag(fom.n_nodes, fom.h, fom.dtype)
               + dt * fom.linear.jacobi_diag(mu))
        M_pre = lambda r: r / dia  # noqa: E731

        if self.nt % store_every != 0:
            raise ValueError(
                f"store_every={store_every} must divide nt={self.nt}")

        constrain = fom._grid_constraint(mesh, axis)

        def outer(u, _):
            def step(u, _):
                rhs = self._mass_apply(u) + dt * (b - c * ml * fom.g(u))
                u_new = cg(B, rhs, x0=u, precond=M_pre, tol=tol,
                           maxiter=maxiter).x
                return constrain(u_new), None

            u, _ = jax.lax.scan(step, u, None, length=store_every)
            return u, u

        _, stored = jax.lax.scan(
            outer, constrain(self.u0), None, length=self.nt // store_every)
        return jnp.moveaxis(
            jnp.concatenate([self.u0[None], stored], axis=0), 0, -1)

    def solve_flat(self, mu, **kw) -> jax.Array:
        traj = self.solve(mu, **kw)
        return traj.reshape(-1, traj.shape[-1])

    def output_trajectory(self, traj) -> jax.Array:
        """Mean-value output at each stored step: (n_stored,)."""
        h2 = self.fom.h * self.fom.h
        return jnp.sum(traj, axis=tuple(range(traj.ndim - 1))) * h2

    def sample_parameters(self, count: int, key=0):
        return self.parameter_space.sample_randomly(count, key)
