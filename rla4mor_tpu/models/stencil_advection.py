"""Matrix-free advection-diffusion stencil FOM (pod-scale, non-SPD).

Extends the big-n path (models/stencil.py, SURVEY §2.2 / BASELINE
config 5) beyond the SPD thermal block: the same unit-square
discretization as the host-assembled ``AdvectionDiffusionFOM``
(models/advection_diffusion.py — Q1 diffusion stiffness + lumped
central-difference advection) applied as fused gather-form stencils, so
it jits, shards over a DoF mesh axis, and scales to 1e7+ nodes with
device BiCGStab (core/solvers.py) instead of host SuperLU. Oracle
tests pin it to the host FOM's sparse matrices entry-for-entry.

    A(mu) = eps K + bx Cx + by Cy,   mu = {'eps': (1,), 'velocity': (2,)}

Grid conventions follow :mod:`rla4mor_tpu.models.stencil`: node grid
(N+1, N+1), Dirichlet ring masked, row index = y, column = x.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from rla4mor_tpu.core.parameters import ParameterSpace
from rla4mor_tpu.core.solvers import bicgstab
from rla4mor_tpu.models.stencil import (
    FlatGridOp,
    interior_mask,
    stencil_apply,
    stiffness_diag_raw,
)


def advection_apply(u: jax.Array, h: float, axis: int) -> jax.Array:
    """Lumped central-difference advection (C_axis u) in gather form:
    (h/2)(u_east - u_west) per interior node (axis=0: x / columns,
    axis=1: y / rows), Dirichlet ring masked on input and output —
    matches the host ``AdvectionDiffusionFOM.advection`` matrix
    (models/advection_diffusion.py) restricted to interior nodes."""
    mask = interior_mask(u.shape[0], u.dtype)
    u = u * mask
    M = u.shape[0]
    up = jnp.pad(u, 1)
    if axis == 0:   # x: minor (column) index
        diff = up[1:M + 1, 2:] - up[1:M + 1, :M]
    else:           # y: major (row) index
        diff = up[2:, 1:M + 1] - up[:M, 1:M + 1]
    return (h / 2.0) * diff * mask


class StencilAdvectionDiffusion:
    """Matrix-free non-SPD affine FOM: A(mu) = eps K + bx Cx + by Cy."""

    is_spd = False
    n_terms = 3
    # kappa() below is the SPD diffusion PART (an MG-preconditioner
    # hook), not the full operator — see InstationaryStencilFOM._make_stiff
    kappa_is_full_operator = False

    def __init__(
        self,
        num_intervals: int = 64,
        dtype=jnp.float32,
        eps_range: Tuple[float, float] = (0.05, 1.0),
        velocity_range: Tuple[float, float] = (-1.0, 1.0),
    ):
        self.num_intervals = num_intervals
        self.dtype = dtype
        self.n_nodes = num_intervals + 1
        self.h = 1.0 / num_intervals
        self.parameter_space = ParameterSpace.make({"eps": 1, "velocity": 2})
        self._eps_range = eps_range
        self._velocity_range = velocity_range

    @property
    def solution_shape(self):
        return (self.n_nodes, self.n_nodes)

    def theta_vector(self, mu) -> jax.Array:
        return jnp.concatenate([
            jnp.asarray(mu["eps"]).reshape(-1),
            jnp.asarray(mu["velocity"]).reshape(-1),
        ])

    def apply(self, mu, u: jax.Array) -> jax.Array:
        theta = self.theta_vector(mu).astype(u.dtype)
        N = self.num_intervals
        out = theta[0] * stencil_apply(u, jnp.ones((N, N), u.dtype))
        out = out + theta[1] * advection_apply(u, self.h, 0)
        out = out + theta[2] * advection_apply(u, self.h, 1)
        return out

    def apply_term(self, t: int, u: jax.Array) -> jax.Array:
        if t == 0:
            N = self.num_intervals
            return stencil_apply(u, jnp.ones((N, N), u.dtype))
        return advection_apply(u, self.h, t - 1)

    def product_apply(self, u: jax.Array) -> jax.Array:
        """h1_0 product R = K (the diffusion stiffness)."""
        N = self.num_intervals
        return stencil_apply(u, jnp.ones((N, N), u.dtype))

    def term_box_bounds(self) -> list:
        """Rigorous analytic l2 boxes of the SYMMETRIZED terms (for
        `l2_interior_scm`; see StencilThermalBlock.term_box_bounds):
        the diffusion stiffness is PSD with lambda <= 16/3 (unit kappa),
        the convection terms have EXACT anti-symmetric adjoints
        (core/linops AdvectionTermOp) so their symmetric parts vanish —
        boxes pin to [0, 0] (the eigensolved boxes land there too,
        tests/test_scm_matfree.py::test_l2_interior_scm_advection_oracle)."""
        return [(0.0, 16.0 / 3.0), (0.0, 0.0), (0.0, 0.0)]

    def rhs(self, dtype=None) -> jax.Array:
        dt = self.dtype if dtype is None else dtype
        load = jnp.full(self.solution_shape, self.h * self.h, dtype=dt)
        return load * interior_mask(self.n_nodes, dt)

    def kappa(self, mu, dtype=None) -> jax.Array:
        """Element diffusion field eps * ones — the SPD part of A(mu),
        consumed by the geometric-multigrid V-cycle as a BiCGStab
        preconditioner (models/multigrid.py). At pod scale the cell
        Peclet number |b| h / (2 eps) is tiny, so the diffusion V-cycle
        approximates A(mu)^-1 well; plain Jacobi-BiCGStab in f32 breaks
        down there (kappa ~ eps^-1 h^-2)."""
        dt = self.dtype if dtype is None else dtype
        eps = jnp.asarray(mu["eps"]).reshape(-1)[0].astype(dt)
        N = self.num_intervals
        return jnp.full((N, N), 1.0, dt) * eps

    def jacobi_diag(self, mu) -> jax.Array:
        """diag A(mu) = eps * diag K (the central-difference advection has
        zero diagonal); identity filler on the Dirichlet ring."""
        eps = jnp.asarray(mu["eps"]).reshape(-1)[0].astype(self.dtype)
        N = self.num_intervals
        d = eps * stiffness_diag_raw(jnp.ones((N, N), self.dtype))
        return jnp.where(d > 0, d, 1.0)

    def solve_bicgstab(self, mu, tol=1e-8, maxiter=4000):
        """Matrix-free preconditioned BiCGStab solve (jittable)."""
        b = self.rhs()
        diag = self.jacobi_diag(mu)
        return bicgstab(
            lambda u: self.apply(mu, u), b,
            precond=lambda r: r / diag, tol=tol, maxiter=maxiter,
        ).x

    def output(self, u) -> jax.Array:
        """Mean-value functional (lumped integral), as the thermal
        stencil's."""
        return jnp.sum(u) * self.h * self.h

    # -- flattened-vector LinOp views (the parabolic reductor path) -----
    def term_linop(self, t: int) -> "AdvectionTermOp":
        return AdvectionTermOp(self, t)

    def affine_operator(self):
        """AffineOp over flattened vectors: eps K + bx Cx + by Cy with
        ProjectionCoefficient thetas — the same interface as
        ``StencilThermalBlock.affine_operator``, so
        ``InstationaryStencilFOM.as_reductor_fom`` consumes the non-SPD
        family (the time-stepping then runs BiCGStab per implicit
        step)."""
        from rla4mor_tpu.core.affine import AffineOp
        from rla4mor_tpu.core.parameters import ProjectionCoefficient

        return AffineOp(
            tuple(self.term_linop(t) for t in range(self.n_terms)),
            (
                ProjectionCoefficient("eps", 0),
                ProjectionCoefficient("velocity", 0),
                ProjectionCoefficient("velocity", 1),
            ),
        )

    def sample_parameters(self, count: int, key=0):
        """Samples honoring the per-name ranges (eps > 0) — mirrors
        ``AdvectionDiffusionFOM.sample_parameters``."""
        if isinstance(key, int):
            key = jax.random.key(key)
        out = []
        for i in range(count):
            k = jax.random.fold_in(key, i)
            k1, k2 = jax.random.split(k)
            out.append({
                "eps": jax.random.uniform(
                    k1, (1,), minval=self._eps_range[0],
                    maxval=self._eps_range[1],
                ),
                "velocity": jax.random.uniform(
                    k2, (2,), minval=self._velocity_range[0],
                    maxval=self._velocity_range[1],
                ),
            })
        return out


class AdvectionTermOp(FlatGridOp):
    """LinOp view of one advection-diffusion term on flattened vectors.
    t=0: the (symmetric) diffusion stiffness K; t=1/2: the central-
    difference advection C_x / C_y, which is ANTI-symmetric on interior
    nodes — ``H`` returns the negated operator."""

    def __init__(self, fom: StencilAdvectionDiffusion, t: int,
                 sign: float = 1.0):
        super().__init__(fom.n_nodes)
        self.fom = fom
        self.t = t
        self.sign = sign

    def _grid_apply(self, grid):
        out = self.fom.apply_term(self.t, grid)
        return out if self.sign == 1.0 else self.sign * out

    def apply_adjoint(self, V, mu=None):
        # overrides FlatGridOp's symmetric alias (apply_adjoint = apply):
        # the advection terms are anti-symmetric
        return self.H.apply(V, mu)

    @property
    def H(self):
        if self.t == 0:
            return self
        return AdvectionTermOp(self.fom, self.t, sign=-self.sign)
