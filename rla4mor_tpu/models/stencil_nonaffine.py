"""Non-affine diffusion on the matrix-free Q1 stencil, made affine by EIM.

The reference framework handles only affine parametric operators (every
sketched system there is a pyMOR LincombOperator, SURVEY §2.3). This
family is genuinely NON-affine — a Gaussian-bump conductivity

    kappa(mu, x) = kappa0 + amp * exp(-|x - c(mu)|^2 / (2 w(mu)^2))

whose mu-dependence (bump center + width) cannot be written as a finite
theta/term sum. ``EimStencilFOM`` closes it with the empirical
interpolation method (mor/eim.py): offline, an EIM greedy over training
kappa fields builds magic element-points + basis fields xi_q; online,

    A(mu) ~= sum_q theta_q(mu) A(xi_q),   theta(mu) = T^{-1} kappa(mu, pts)

which satisfies the pod-scale stencil-FOM protocol of parallel/driver.py
(``n_terms`` / ``theta_vector`` / ``apply_term`` / ``apply`` / ``rhs`` /
``jacobi_diag`` / ``is_spd``) — so the fully-sharded sketched greedy,
the MG/Jacobi CG solvers and the exact-score refinement all run on a
non-affine family unchanged. theta(mu) costs M field evaluations + one
(M, M) triangular solve: O(M), independent of the grid.

TPU notes: the exact field apply and every EIM term apply are the same
pure-gather ``stencil_apply`` pass (models/stencil.py); the EIM kappa
reconstruction is one (M, N, N) tensordot — fused MXU work. All online
pieces are jittable with static shapes.
"""

from __future__ import annotations

import math
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp

from rla4mor_tpu.core.parameters import Mu, ParameterSpace
from rla4mor_tpu.models.stencil import (
    FlatGridOp,
    interior_mask,
    stencil_apply,
    stiffness_diag_raw,
)

_HI = jax.lax.Precision.HIGHEST


class NonAffineStencilFOM:
    """Exact (non-affine) diffusion stencil FOM.

    ``field_fn(mu, X, Y) -> kappa`` must be jittable and shape-polymorphic
    (full (N, N) element-center grids AND 1-d magic-point coordinate
    vectors). No ``theta_vector``/``apply_term``: this class is the
    ground truth the EIM surrogate is measured against.
    """

    is_spd = True

    def __init__(self, field_fn: Callable, num_intervals: int = 64,
                 parameter_space: Optional[ParameterSpace] = None,
                 dtype=jnp.float32, kappa_lower: Optional[float] = None):
        self.field_fn = field_fn
        self.num_intervals = num_intervals
        self.parameter_space = parameter_space
        self.dtype = dtype
        self.kappa_lower = kappa_lower  # provable inf_x,mu kappa, if known
        self.n_nodes = num_intervals + 1
        self.h = 1.0 / num_intervals

    @property
    def solution_shape(self):
        return (self.n_nodes, self.n_nodes)

    @property
    def n_dof(self) -> int:
        return math.prod(self.solution_shape)

    @property
    def element_shape(self):
        return (self.num_intervals, self.num_intervals)

    def element_centers(self):
        """(X, Y) element-center coordinate grids (N, N), row = y."""
        N = self.num_intervals
        c = (jnp.arange(N, dtype=self.dtype) + 0.5) * self.h
        return jnp.meshgrid(c, c, indexing="xy")

    # --- field-generic backend (the EIM surrogate delegates here) ------
    def apply_field(self, kappa: jax.Array, u: jax.Array) -> jax.Array:
        """A(kappa) u for an arbitrary per-element coefficient field."""
        return stencil_apply(u, kappa.astype(u.dtype))

    def diag_field(self, kappa: jax.Array) -> jax.Array:
        d = stiffness_diag_raw(kappa)
        return jnp.where(d > 0, d, 1.0)

    def kappa(self, mu: Mu, dtype=None) -> jax.Array:
        dt = self.dtype if dtype is None else dtype
        coords = self.element_centers()
        return self.field_fn(mu, *(c.astype(dt) for c in coords))

    def apply(self, mu: Mu, u: jax.Array) -> jax.Array:
        return self.apply_field(self.kappa(mu, dtype=u.dtype), u)

    def rhs(self, dtype=None) -> jax.Array:
        dt = self.dtype if dtype is None else dtype
        load = jnp.full(self.solution_shape, self.h * self.h, dtype=dt)
        return load * interior_mask(self.n_nodes, dt)

    def jacobi_diag(self, mu: Mu) -> jax.Array:
        return self.diag_field(self.kappa(mu))

    def solve_cg(self, mu: Mu, tol=1e-8, maxiter=2000):
        from rla4mor_tpu.core.solvers import cg

        diag = self.jacobi_diag(mu)
        res = cg(lambda u: self.apply(mu, u), self.rhs(),
                 precond=lambda r: r / diag, tol=tol, maxiter=maxiter)
        return res.x

    def output(self, u) -> jax.Array:
        return jnp.sum(u) * self.h * self.h

    def sample_parameters(self, count: int, key=0):
        assert self.parameter_space is not None
        return self.parameter_space.sample_randomly(count, key=key)

    def with_num_intervals(self, num_intervals: int):
        """Same family on a different grid (two-grid EIM training)."""
        return type(self)(
            self.field_fn, num_intervals,
            parameter_space=self.parameter_space, dtype=self.dtype,
            kappa_lower=self.kappa_lower,
        )


class NonAffineStencilFOM3D(NonAffineStencilFOM):
    """3-D analog on the trilinear Q1 hexahedral stencil
    (models/stencil3d.py): ``field_fn(mu, X, Y, Z) -> kappa`` over
    (N, N, N) element centers. Inherits the whole non-affine protocol —
    only the geometry backend differs — so :class:`EimStencilFOM` and
    the rank-generic sharded driver consume it unchanged."""

    @property
    def solution_shape(self):
        return (self.n_nodes,) * 3

    @property
    def element_shape(self):
        return (self.num_intervals,) * 3

    def element_centers(self):
        N = self.num_intervals
        c = (jnp.arange(N, dtype=self.dtype) + 0.5) * self.h
        Z, Y, X = jnp.meshgrid(c, c, c, indexing="ij")
        return (X, Y, Z)

    def apply_field(self, kappa: jax.Array, u: jax.Array) -> jax.Array:
        from rla4mor_tpu.models.stencil3d import stencil3d_apply

        return stencil3d_apply(u, kappa.astype(u.dtype), self.h)

    def diag_field(self, kappa: jax.Array) -> jax.Array:
        from rla4mor_tpu.models.stencil3d import stiffness3d_diag_raw

        d = stiffness3d_diag_raw(kappa, self.h)
        return jnp.where(d > 0, d, 1.0)

    def rhs(self, dtype=None) -> jax.Array:
        from rla4mor_tpu.models.stencil3d import interior_mask3

        dt = self.dtype if dtype is None else dtype
        load = jnp.full(self.solution_shape, self.h ** 3, dtype=dt)
        return load * interior_mask3(self.n_nodes, dt)

    def output(self, u) -> jax.Array:
        return jnp.sum(u) * self.h ** 3

    # lumped-mass parabolic hooks (shared formula: stencil3d.py)
    def mass_apply_grid(self, u: jax.Array) -> jax.Array:
        from rla4mor_tpu.models.stencil3d import lumped_mass3_apply

        return lumped_mass3_apply(u, self.h)

    def mass_diag_grid(self) -> jax.Array:
        from rla4mor_tpu.models.stencil3d import lumped_mass3_diag

        return lumped_mass3_diag(self.n_nodes, self.h, self.dtype)


class EimStencilFOM:
    """EIM-affine surrogate of a :class:`NonAffineStencilFOM` — implements
    the full stencil-FOM protocol (see module docstring).

    ``is_spd = True`` holds as long as the EIM kappa stays positive.
    Training positivity is asserted in :meth:`from_training`; for
    held-out mus check :meth:`ellipticity_margin` — a negative margin
    means the interpolation error may have made the operator indefinite
    (CG would silently stall)."""

    is_spd = True

    def __init__(self, exact: NonAffineStencilFOM, interpolant,
                 kappa_floor: float):
        from rla4mor_tpu.mor.eim import EimInterpolant

        assert isinstance(interpolant, EimInterpolant)
        self.exact = exact
        self.interpolant = interpolant
        self.kappa_floor = kappa_floor  # min EIM kappa over training
        self.dtype = exact.dtype
        self.num_intervals = exact.num_intervals
        self.n_nodes = exact.n_nodes
        self.h = exact.h
        self.parameter_space = exact.parameter_space
        # (M, *element_shape) ACTIVE EIM basis fields + ALL magic-point
        # coordinates (active first, then the certification reserve);
        # dimension-agnostic — any exact FOM with the field-generic
        # backend (element_shape/element_centers/apply_field/diag_field)
        # works, 2-D and 3-D alike
        M = interpolant.n_terms
        self.xi = interpolant.basis[:, :M].T.reshape(
            (-1,) + tuple(exact.element_shape)
        )
        pts = interpolant.points
        self._pcoords = tuple(
            c.reshape(-1)[pts] for c in exact.element_centers()
        )
        # parabolic mass hooks: forward only when the exact FOM defines
        # them (3-D lumped mass; the 2-D path uses the consistent mass
        # defaults inside InstationaryStencilFOM)
        if hasattr(exact, "mass_apply_grid"):
            self.mass_apply_grid = exact.mass_apply_grid
            self.mass_diag_grid = exact.mass_diag_grid

    @classmethod
    def from_training(cls, exact: NonAffineStencilFOM,
                      training_mus: Sequence[Mu], tol: float = 1e-6,
                      max_terms: Optional[int] = None,
                      reserve: int = 4,
                      training_intervals: Optional[int] = None,
                      device_scan: bool = False,
                      ) -> "EimStencilFOM":
        """Offline EIM greedy over the training kappa fields.

        ``reserve`` extra greedy steps past convergence give the online
        a-posteriori indicator (:meth:`kappa_error_indicator`,
        :meth:`model_error_bound`). If the greedy exhausts the training
        set before tol (n_reserve comes back short), a warning is issued
        — enlarge ``training_mus`` to regain the indicator.

        ``training_intervals`` enables TWO-GRID training for pod-scale
        FOMs: the greedy (which tracks residuals of ALL training fields,
        O(n_train · m) per step) runs on a coarse auxiliary grid; only
        the K selected snapshots are then evaluated on the fine grid and
        the interpolant rebuilt there (``mor.eim.eim_rebuild``, fine
        argmax magic points). Offline cost drops from O(M · n_fine · m)
        to O(M · n_coarse · m + M² · n_fine). The certified training
        history lives on the coarse greedy; fine-grid fit is validated
        by the positivity floor + the online indicator.

        ``device_scan`` runs the greedy as jitted fixed-shape scan
        chunks (``eim_greedy_device``) — zero per-step host syncs, one
        per chunk, early stopping; prefer on TPU."""
        import warnings

        from rla4mor_tpu.mor.eim import (
            eim_greedy,
            eim_greedy_device,
            eim_rebuild,
        )

        two_grid = (training_intervals is not None
                    and training_intervals != exact.num_intervals)
        trainer = (exact if not two_grid
                   else exact.with_num_intervals(training_intervals))
        G = jnp.stack(
            [trainer.kappa(mu).reshape(-1) for mu in training_mus], axis=1
        )
        greedy = eim_greedy_device if device_scan else eim_greedy
        interp = greedy(G, tol=tol, max_terms=max_terms, reserve=reserve)
        if interp.n_reserve < reserve:
            warnings.warn(
                f"EIM greedy exhausted the training set: n_reserve="
                f"{interp.n_reserve} < {reserve}; kappa_error_indicator "
                "unavailable — enlarge training_mus", stacklevel=2,
            )
        if two_grid:
            # the greedy re-selects training columns (snapshot_ids has
            # duplicates) — evaluate each unique fine field exactly once
            fine = {
                j: exact.kappa(training_mus[j]).reshape(-1)
                for j in sorted(set(interp.snapshot_ids))
            }
            G_sel = jnp.stack(
                [fine[j] for j in interp.snapshot_ids], axis=1
            )
            interp = eim_rebuild(G_sel, n_reserve=interp.n_reserve)
            # positivity floor over the SELECTED fine fields (the full
            # training set was only ever materialized coarse)
            recon = interp.interpolate(G_sel)
        else:
            recon = interp.interpolate(G)
        floor = float(jnp.min(recon))
        assert floor > 0, (
            "EIM kappa surrogate loses positivity on the training set "
            f"(min {floor:.3e}); tighten tol or enlarge training"
        )
        return cls(exact, interp, kappa_floor=floor)

    # --- stencil-FOM protocol ------------------------------------------------
    def const_arrays(self) -> dict:
        """Large constant array leaves for jit-closure hoisting.

        The (M, *element_shape) EIM basis fields are the one pod-scale
        constant this FOM holds — ~1.5 GB at M=87, grid 2048² — and a
        jit closure would bake them into the HLO as literals (the remote
        compile transport rejects such programs).  The sharded greedy
        driver threads this pytree through its state and calls
        :meth:`bind` on the traced leaves inside the step."""
        return {"xi": self.xi}

    def bind(self, aux: dict) -> "EimStencilFOM":
        """Shallow view of this FOM with :meth:`const_arrays` leaves
        replaced by (traced) ``aux`` — values identical by contract."""
        import copy

        f = copy.copy(self)
        f.xi = aux["xi"]
        return f

    @property
    def n_terms(self) -> int:
        return self.interpolant.n_terms

    @property
    def solution_shape(self):
        return self.exact.solution_shape

    def theta_vector(self, mu: Mu) -> jax.Array:
        """EIM coefficients: M field evaluations at the magic points +
        one (M, M) unit-lower-triangular solve. O(M), jittable."""
        M = self.n_terms
        g = self.exact.field_fn(mu, *(c[:M] for c in self._pcoords))
        return self.interpolant.coefficients(g.astype(self.dtype))

    def kappa_error_indicator(self, mu: Mu) -> jax.Array:
        """A-posteriori estimate of ``sup_x |kappa(mu,x) - kappa_EIM(mu,x)|``
        — the interpolation error at the ``reserve`` next greedy points
        (a rigorous lower bound that tracks the sup closely on smooth
        families). O(M + reserve), jittable."""
        g = self.exact.field_fn(mu, *self._pcoords)
        return self.interpolant.error_indicator(g.astype(self.dtype))

    def model_error_bound(self, mu: Mu, u_s: jax.Array,
                          eps: Optional[float] = None) -> jax.Array:
        """First-order exact-energy-norm bound on the EIM model error:
        with ``|kappa - kappa_EIM| <= eps`` pointwise and
        ``kappa >= k0 > 0``,

            ||u_exact - u_s||_{a(mu)}  <=  eps * |u_s|_{H1} / sqrt(k0)

        (test v = u_exact - u_s in the difference of the two weak forms;
        |.|_{H1}^2 = u^T A_1 u with the unit-conductivity stencil). When
        ``eps`` is None it is ESTIMATED by :meth:`kappa_error_indicator`
        — then the output is a tight indicator, not a certificate; pass
        a certified eps for rigor. ``k0`` is the exact FOM's
        ``kappa_lower`` if declared, else the training EIM floor
        (heuristic). Jittable."""
        if eps is None:
            eps = self.kappa_error_indicator(mu)
        k0 = self.exact.kappa_lower
        k0 = self.kappa_floor if k0 is None else k0
        ones = jnp.ones(tuple(self.exact.element_shape), u_s.dtype)
        # elementwise multiply + sum (VPU) — no MXU bf16 truncation
        h1 = jnp.sqrt(jnp.sum(
            (jnp.conj(u_s) * self.exact.apply_field(ones, u_s)).real
        ))
        return eps * h1 / jnp.sqrt(jnp.asarray(k0, u_s.dtype))

    def total_error_bound(
        self,
        mu: Mu,
        u_s: jax.Array,
        est: jax.Array,
        lam_bounds: tuple,
        eps: Optional[float] = None,
    ) -> jax.Array:
        """TOTAL certified l2 state-error bound vs the EXACT non-affine
        operator (round-5, VERDICT r4 missing #4) — composes the
        surrogate residual with the EIM model term into one bound:

            ||A_e(mu) u_s - f||_2
                <= ||A_s(mu) u_s - f||_2  +  ||(A_e - A_s)(mu) u_s||_2
                <= est + eps |u_s|_H1 sqrt(lam_max(K_1)),

        (per-element Cauchy-Schwarz: ``(A_delta u, v) <= eps |u|_H1
        |v|_H1`` since every local stiffness is PSD, then ``|v|_H1^2 <=
        lam_max(K_1) ||v||_2^2``), and the exact family's certified l2
        coercivity ``lam_min(A_e(mu)) >= kappa_lower lam_min(K_1)``
        (stiffness is monotone in the field: ``A_e >= kappa_lower K_1``):

            ||u_e - u_s||_2  <=  (est + eps |u_s|_H1 sqrt(lam_hi))
                                 / (kappa_lower * lam_lo).

        ``est``: the l2 residual norm of ``u_s`` vs the SURROGATE
        (exact-score f64, or sketched => rigorous up to distortion);
        ``lam_bounds = (lam_lo, lam_hi)``: certified l2 spectral
        enclosure of the UNIT-conductivity interior stiffness ``K_1``
        (one ``mor.scm_matfree.spectral_interval`` LOBPCG pair — safe
        edges; Gershgorin ``lam_hi <= 16/3`` is a valid fallback);
        ``eps``: pointwise EIM field error sup — defaults to
        :meth:`kappa_error_indicator` (then the output inherits that
        reserve-point honesty contract; pass a certified eps for full
        rigor).  Requires the exact FOM to declare ``kappa_lower``.
        Jittable, vmappable."""
        if self.exact.kappa_lower is None:
            raise ValueError(
                "total_error_bound needs exact.kappa_lower (a provable "
                "field infimum); the EIM training floor is heuristic"
            )
        if eps is None:
            eps = self.kappa_error_indicator(mu)
        lam_lo, lam_hi = lam_bounds
        ones = jnp.ones(tuple(self.exact.element_shape), u_s.dtype)
        h1 = jnp.sqrt(jnp.maximum(jnp.sum(
            (jnp.conj(u_s) * self.exact.apply_field(ones, u_s)).real
        ), 0.0))
        num = est + eps * h1 * jnp.sqrt(jnp.asarray(lam_hi, h1.dtype))
        den = self.exact.kappa_lower * jnp.asarray(lam_lo, h1.dtype)
        return num / den

    def ellipticity_margin(self, mu: Mu) -> jax.Array:
        """Estimated lower bound on ``inf_x kappa_EIM(mu, x)``:
        ``kappa_lower - kappa_error_indicator(mu)`` (the surrogate can
        dip below the exact field by at most sup|kappa - kappa_EIM|).
        Positivity was asserted on the TRAINING set only — at held-out
        mus, gate CG/is_spd-dependent paths on this margin staying
        positive. Estimate quality = the indicator's (rigorous only for
        a certified eps). O(M + reserve), jittable."""
        k0 = self.exact.kappa_lower
        k0 = self.kappa_floor if k0 is None else k0
        return jnp.asarray(k0, self.dtype) - self.kappa_error_indicator(mu)

    def kappa(self, mu: Mu, dtype=None) -> jax.Array:
        dt = self.dtype if dtype is None else dtype
        theta = self.theta_vector(mu).astype(dt)
        # HIGHEST: the TPU bf16 truncation (~2e-3) is the same order as
        # typical EIM tolerances — it would swamp the certification
        return jnp.tensordot(theta, self.xi.astype(dt), axes=1,
                             precision=_HI)

    def apply(self, mu: Mu, u: jax.Array) -> jax.Array:
        return self.exact.apply_field(self.kappa(mu, dtype=u.dtype), u)

    def apply_field(self, kappa_el: jax.Array, u: jax.Array) -> jax.Array:
        """Field-generic backend delegation (rank-generic: the parabolic
        FOM applies the interpolated EIM field through the exact FOM's
        geometry, 2-D and 3-D alike)."""
        return self.exact.apply_field(kappa_el, u)

    def apply_term(self, q: int, u: jax.Array) -> jax.Array:
        return self.exact.apply_field(self.xi[q], u)

    def term_linop(self, q: int) -> "EimTermOp":
        return EimTermOp(self, q)

    def affine_operator(self):
        """AffineOp over flattened vectors with ExpressionCoefficient
        thetas (the EIM magic-point solve per term) — the same interface
        as ``StencilThermalBlock.affine_operator`` (stencil.py:267), so
        ``InstationaryStencilFOM.as_reductor_fom`` / the sketched
        reductors consume the non-affine surrogate unchanged. Cached:
        coefficient identity is the jit-cache key."""
        if getattr(self, "_affine_op", None) is None:
            from rla4mor_tpu.core.affine import AffineOp
            from rla4mor_tpu.mor.eim import theta_coefficients

            def entries(mu):
                M = self.n_terms
                g = self.exact.field_fn(
                    mu, *(c[:M] for c in self._pcoords)
                )
                return g.astype(self.dtype)

            self._affine_op = AffineOp(
                tuple(self.term_linop(q) for q in range(self.n_terms)),
                theta_coefficients(self.interpolant, entries,
                                   name="eim_theta"),
            )
        return self._affine_op

    def rhs(self, dtype=None) -> jax.Array:
        return self.exact.rhs(dtype)

    def jacobi_diag(self, mu: Mu) -> jax.Array:
        return self.exact.diag_field(self.kappa(mu))

    def output(self, u) -> jax.Array:
        return self.exact.output(u)

    def sample_parameters(self, count: int, key=0):
        return self.exact.sample_parameters(count, key=key)


class EimTermOp(FlatGridOp):
    """LinOp view of one EIM term A(xi_q) on flattened vectors (the
    non-affine analog of ``StencilTermOp`` in stencil.py);
    rank-generic (2-D and 3-D grids)."""

    def __init__(self, fom: EimStencilFOM, q: int):
        super().__init__(grid_shape=fom.solution_shape)
        self.fom = fom
        self.q = q

    def _grid_apply(self, grid):
        return self.fom.exact.apply_field(self.fom.xi[self.q], grid)

    @property
    def H(self):
        return self


def gaussian_bump_field(kappa0: float = 1.0, amp: float = 9.0,
                        center_range=(0.25, 0.75),
                        width_range=(0.08, 0.25)) -> Callable:
    """Field factory: mu['bump'] = (cx, cy, w) in the [0,1] box, affinely
    mapped into ``center_range`` / ``width_range``."""

    def field(mu: Mu, X, Y):
        b = jnp.asarray(mu["bump"], X.dtype)
        c0, c1 = center_range
        w0, w1 = width_range
        cx = c0 + (c1 - c0) * b[0]
        cy = c0 + (c1 - c0) * b[1]
        w = w0 + (w1 - w0) * b[2]
        r2 = (X - cx) ** 2 + (Y - cy) ** 2
        return kappa0 + amp * jnp.exp(-r2 / (2.0 * w * w))

    return field


def gaussian_bump_fom(num_intervals: int = 64, dtype=jnp.float32,
                      **field_kw) -> NonAffineStencilFOM:
    """Convenience: the Gaussian-bump non-affine diffusion FOM with
    parameter space mu['bump'] in [0, 1]^3."""
    ps = ParameterSpace.make({"bump": 3})
    kappa0 = field_kw.get("kappa0", 1.0)
    amp = field_kw.get("amp", 9.0)
    return NonAffineStencilFOM(
        gaussian_bump_field(**field_kw), num_intervals,
        parameter_space=ps, dtype=dtype,
        kappa_lower=kappa0 + min(0.0, amp),  # exp in (0, 1]
    )


def gaussian_bump_field3d(kappa0: float = 1.0, amp: float = 9.0,
                          center_range=(0.25, 0.75),
                          width_range=(0.1, 0.3)) -> Callable:
    """3-D field factory: mu['bump'] = (cx, cy, cz, w) in [0, 1]^4."""

    def field(mu: Mu, X, Y, Z):
        b = jnp.asarray(mu["bump"], X.dtype)
        c0, c1 = center_range
        w0, w1 = width_range
        cx = c0 + (c1 - c0) * b[0]
        cy = c0 + (c1 - c0) * b[1]
        cz = c0 + (c1 - c0) * b[2]
        w = w0 + (w1 - w0) * b[3]
        r2 = (X - cx) ** 2 + (Y - cy) ** 2 + (Z - cz) ** 2
        return kappa0 + amp * jnp.exp(-r2 / (2.0 * w * w))

    return field


def gaussian_bump_fom3d(num_intervals: int = 32, dtype=jnp.float32,
                        **field_kw) -> NonAffineStencilFOM3D:
    """Convenience: the 3-D Gaussian-bump non-affine diffusion FOM with
    parameter space mu['bump'] in [0, 1]^4."""
    ps = ParameterSpace.make({"bump": 4})
    kappa0 = field_kw.get("kappa0", 1.0)
    amp = field_kw.get("amp", 9.0)
    return NonAffineStencilFOM3D(
        gaussian_bump_field3d(**field_kw), num_intervals,
        parameter_space=ps, dtype=dtype,
        kappa_lower=kappa0 + min(0.0, amp),
    )
