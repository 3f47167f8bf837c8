"""Indefinite Helmholtz stencil family: A(ksq) = K - ksq M at pod scale.

The INDEFINITE model class of the framework: for ``ksq`` above the first
Dirichlet eigenvalue of the unit square (2 pi^2 ~ 19.74), ``A(ksq)`` has
negative eigenvalues — no coercivity constant exists, min-theta and the
coercivity SCM do not apply, and the only certified stability constant
is the inf-sup constant ``beta(mu) = sigma_min``.  Pair with
:class:`~rla4mor_tpu.mor.scm_matfree.MatrixFreeScmInfSup` for certified
error bounds at the same DoF counts as the rest of the stencil zoo.

Matrix-free Q1 gather stencils throughout: ``K`` is the unit-coefficient
stiffness (models/stencil.py ``stencil_apply``), ``M`` the CONSISTENT Q1
mass (``mass_apply``), both zeroed on the Dirichlet ring, so the pencil
``(K, M)`` eigenvalues approximate the continuum Laplace spectrum
``pi^2 (m^2 + n^2)`` and real interior resonances exist on the discrete
level too.  The default ``ksq_range = (22, 46)`` sits strictly between
the first (2 pi^2 ~ 19.74) and second (5 pi^2 ~ 49.35) resonances: A is
indefinite on the whole range yet uniformly invertible, the regime a
certified sweep must handle.

Reference parity: the reference repo's Helmholtz usage is the host FEM
example driven through its embedding/LARS stack
(/root/reference/inverse_problems/example.py:1-60); this family is the
TPU-native pod-scale analog (real-indefinite; the complex impedance
variant lives in models/helmholtz.py at host scale).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from rla4mor_tpu.core.parameters import ExpressionCoefficient, ParameterSpace
from rla4mor_tpu.core.solvers import bicgstab
from rla4mor_tpu.models.stencil import (
    FlatGridOp,
    interior_mask,
    mass_apply,
    mass_diag,
    stencil_apply,
    stiffness_diag_raw,
)


def _neg_ksq(mu):
    return -jnp.asarray(mu["ksq"]).reshape(-1)[0]


# one module-level coefficient object: ExpressionCoefficient compares by
# fn IDENTITY (core/parameters.py) — a per-call lambda would defeat the
# jit cache of everything keyed on the coefficient tuple
_NEG_KSQ = ExpressionCoefficient(_neg_ksq, "-ksq")


class StencilHelmholtz:
    """Matrix-free indefinite affine FOM: A(mu) = K - ksq M."""

    is_spd = False
    n_terms = 2
    # kappa() is the unit diffusion field (an MG-preconditioner hook for
    # the V-cycle on K), NOT the operator — cf. stencil_advection.py
    kappa_is_full_operator = False

    def __init__(
        self,
        num_intervals: int = 64,
        dtype=jnp.float32,
        ksq_range: tuple[float, float] = (22.0, 46.0),
    ):
        self.num_intervals = num_intervals
        self.dtype = dtype
        self.n_nodes = num_intervals + 1
        self.h = 1.0 / num_intervals
        self.parameter_space = ParameterSpace.make({"ksq": 1}, *ksq_range)
        self._ksq_range = ksq_range

    @property
    def solution_shape(self):
        return (self.n_nodes, self.n_nodes)

    def theta_vector(self, mu) -> jax.Array:
        ksq = jnp.asarray(mu["ksq"]).reshape(-1)
        return jnp.concatenate([jnp.ones_like(ksq), -ksq])

    def apply(self, mu, u: jax.Array) -> jax.Array:
        theta = self.theta_vector(mu).astype(u.dtype)
        N = self.num_intervals
        return (theta[0] * stencil_apply(u, jnp.ones((N, N), u.dtype))
                + theta[1] * mass_apply(u, self.h))

    def apply_term(self, t: int, u: jax.Array) -> jax.Array:
        if t == 0:
            N = self.num_intervals
            return stencil_apply(u, jnp.ones((N, N), u.dtype))
        return mass_apply(u, self.h)

    def product_apply(self, u: jax.Array) -> jax.Array:
        """h1_0 product R = K (unit-coefficient stiffness)."""
        N = self.num_intervals
        return stencil_apply(u, jnp.ones((N, N), u.dtype))

    def term_norm_bounds(self) -> list:
        """Rigorous l2 spectral-norm bounds of the affine terms [K, M]
        (feeds the analytic pair boxes of the matrix-free inf-sup SCM,
        round-5): lam_max(K) <= 16/3 (element Rayleigh / Gershgorin,
        StencilThermalBlock.term_box_bounds), lam_max(M) <= h^2 (each
        node in <= 4 elements; Q1 element mass eigenvalues
        h^2/36 * {9, 3, 3, 1}, so 4 * 9 h^2/36 = h^2)."""
        return [16.0 / 3.0, self.h * self.h]

    def rhs(self, dtype=None) -> jax.Array:
        dt = self.dtype if dtype is None else dtype
        load = jnp.full(self.solution_shape, self.h * self.h, dtype=dt)
        return load * interior_mask(self.n_nodes, dt)

    def kappa(self, mu, dtype=None) -> jax.Array:
        """Unit element diffusion field — the V-cycle on K preconditions
        BiCGStab on K - ksq M (K dominates away from the lowest modes at
        fine h, where ksq stays O(10) while K's spectrum spans h^-2)."""
        dt = self.dtype if dtype is None else dtype
        N = self.num_intervals
        return jnp.ones((N, N), dt)

    def jacobi_diag(self, mu) -> jax.Array:
        """diag A(mu) = diag K - ksq diag M; identity filler on the
        Dirichlet ring and a magnitude floor (the diagonal CROSSES zero
        between resonances — a signed division by a near-zero entry
        would blow the preconditioned residual up)."""
        ksq = jnp.asarray(mu["ksq"]).reshape(-1)[0].astype(self.dtype)
        N = self.num_intervals
        dk = stiffness_diag_raw(jnp.ones((N, N), self.dtype))
        dm = mass_diag(self.n_nodes, self.h, self.dtype)
        mask = interior_mask(self.n_nodes, self.dtype)
        d = (dk - ksq * jnp.where(mask > 0, dm, 0.0)) * mask
        floor = 0.1 * float(8.0 / 3.0)  # ~diag K scale
        safe = jnp.where(jnp.abs(d) > floor, d,
                         jnp.where(d >= 0, floor, -floor))
        return jnp.where(mask > 0, safe, 1.0)

    def solve_bicgstab(self, mu, tol=1e-8, maxiter=6000):
        """Matrix-free preconditioned BiCGStab solve (jittable).
        Indefinite symmetric systems are BiCGStab-solvable but slow with
        a Jacobi preconditioner; keep grids moderate or raise maxiter."""
        b = self.rhs()
        diag = self.jacobi_diag(mu)
        return bicgstab(
            lambda u: self.apply(mu, u), b,
            precond=lambda r: r / diag, tol=tol, maxiter=maxiter,
        ).x

    def output(self, u) -> jax.Array:
        """Mean-value functional (lumped integral)."""
        return jnp.sum(u) * self.h * self.h

    # -- flattened-vector LinOp views ------------------------------------
    def term_linop(self, t: int) -> "HelmholtzTermOp":
        return HelmholtzTermOp(self, t)

    def affine_operator(self):
        from rla4mor_tpu.core.affine import AffineOp
        from rla4mor_tpu.core.parameters import ONE

        return AffineOp(
            (self.term_linop(0), self.term_linop(1)),
            (ONE, _NEG_KSQ),
        )

    def sample_parameters(self, count: int, key=0):
        if isinstance(key, int):
            key = jax.random.key(key)
        lo, hi = self._ksq_range
        out = []
        for i in range(count):
            k = jax.random.fold_in(key, i)
            out.append({"ksq": jax.random.uniform(
                k, (1,), minval=lo, maxval=hi)})
        return out


class HelmholtzTermOp(FlatGridOp):
    """LinOp view of K (t=0) or M (t=1) on flattened vectors — both
    symmetric, so FlatGridOp's symmetric adjoint alias is exact."""

    def __init__(self, fom: StencilHelmholtz, t: int):
        super().__init__(fom.n_nodes)
        self.fom = fom
        self.t = t

    def _grid_apply(self, grid):
        return self.fom.apply_term(self.t, grid)

    @property
    def H(self):
        return self


def _m_coeff_damped(mu):
    ksq = jnp.asarray(mu["ksq"]).reshape(-1)[0]
    gam = jnp.asarray(mu["gamma"]).reshape(-1)[0]
    return -ksq + 1j * gam


_M_COEFF_DAMPED = ExpressionCoefficient(_m_coeff_damped, "-ksq+i*gamma")


class StencilHelmholtzDamped(StencilHelmholtz):
    """LOSSY-media Helmholtz at pod scale: ``A(mu) = K + (-ksq + i
    gamma) M`` — the same REAL symmetric stencil terms (K, M) with a
    COMPLEX affine coefficient on the mass (damping ``gamma > 0`` models
    absorption; the continuum operator is ``-Lap - (ksq - i gamma)``).

    The round-5 target family for the COMPLEX matrix-free inf-sup SCM
    (mor/scm_matfree.py:MatrixFreeScmInfSup with the Re/Im squared-pair
    expansion, dense-tier semantics mor/scm.py:240-270): the dense
    complex tier (models/helmholtz.py) stops at host scale, this family
    runs the same physics through the matrix-free stencil protocol.
    Solutions/solves are complex; ``dtype`` is the REAL storage dtype of
    the stencil fields (promoted to the matching complex dtype in
    ``apply``/``solve_bicgstab``)."""

    is_complex = True

    def __init__(
        self,
        num_intervals: int = 64,
        dtype=jnp.float32,
        ksq_range: tuple[float, float] = (22.0, 46.0),
        gamma_range: tuple[float, float] = (0.5, 4.0),
    ):
        super().__init__(num_intervals, dtype, ksq_range)
        # flat box bounds in SORTED name order (gamma, ksq) — the shape
        # sample_mu_batched's flat path broadcasts against
        self.parameter_space = ParameterSpace.make(
            {"ksq": 1, "gamma": 1},
            jnp.asarray([gamma_range[0], ksq_range[0]]),
            jnp.asarray([gamma_range[1], ksq_range[1]]),
        )
        self._gamma_range = gamma_range

    @property
    def complex_dtype(self):
        return jnp.complex64 if self.dtype == jnp.float32 else jnp.complex128

    def theta_vector(self, mu) -> jax.Array:
        ksq = jnp.asarray(mu["ksq"]).reshape(-1)
        gam = jnp.asarray(mu["gamma"]).reshape(-1)
        one = jnp.ones_like(ksq)
        return jnp.concatenate([one, -ksq + 1j * gam]).astype(
            self.complex_dtype)

    def apply(self, mu, u: jax.Array) -> jax.Array:
        u = u.astype(jnp.promote_types(u.dtype, self.complex_dtype))
        theta = self.theta_vector(mu).astype(u.dtype)
        N = self.num_intervals
        ones = jnp.ones((N, N), u.real.dtype)
        return (theta[0] * stencil_apply(u, ones.astype(u.dtype))
                + theta[1] * mass_apply(u, self.h))

    def jacobi_diag(self, mu) -> jax.Array:
        """Complex diag K + (-ksq + i gamma) diag M; the damping keeps
        |diag| away from zero, identity filler on the ring."""
        z = _m_coeff_damped(mu)
        N = self.num_intervals
        dk = stiffness_diag_raw(jnp.ones((N, N), self.dtype))
        dm = mass_diag(self.n_nodes, self.h, self.dtype)
        mask = interior_mask(self.n_nodes, self.dtype)
        d = (dk + z.astype(self.complex_dtype)
             * jnp.where(mask > 0, dm, 0.0)) * mask
        floor = 0.1 * float(8.0 / 3.0)
        safe = jnp.where(jnp.abs(d) > floor, d, floor)
        return jnp.where(mask > 0, safe, 1.0)

    def solve_bicgstab(self, mu, tol=1e-8, maxiter=6000):
        b = self.rhs().astype(self.complex_dtype)
        diag = self.jacobi_diag(mu)
        return bicgstab(
            lambda u: self.apply(mu, u), b,
            precond=lambda r: r / diag, tol=tol, maxiter=maxiter,
        ).x

    def affine_operator(self):
        from rla4mor_tpu.core.affine import AffineOp
        from rla4mor_tpu.core.parameters import ONE

        return AffineOp(
            (self.term_linop(0), self.term_linop(1)),
            (ONE, _M_COEFF_DAMPED),
        )

    def sample_parameters(self, count: int, key=0):
        if isinstance(key, int):
            key = jax.random.key(key)
        klo, khi = self._ksq_range
        glo, ghi = self._gamma_range
        out = []
        for i in range(count):
            k1, k2 = jax.random.split(jax.random.fold_in(key, i))
            out.append({
                "ksq": jax.random.uniform(k1, (1,), minval=klo, maxval=khi),
                "gamma": jax.random.uniform(k2, (1,), minval=glo,
                                            maxval=ghi),
            })
        return out
