"""POD-DEIM reduction of the monotone semilinear family — certified.

Beyond-reference addition (the reference reduces affine-LINEAR models
only, /root/reference/mor/sketched_reductor.py:140-190); this module is
the nonlinear-in-state analog of that pipeline for
:class:`~rla4mor_tpu.models.semilinear.SemilinearStencilFOM`:

offline
    POD of Newton-solved snapshots -> basis ``V`` (n, r);
    DEIM (mor/eim.py ``deim``) of the nonlinearity snapshots ``g(u_i)``
    -> nodal basis ``U`` + magic points ``P`` (+ reserve points for the
    a-posteriori DEIM indicator);
    reduced stacks ``V^T A_b V``; hyperreduction matrices ``W = V^T M_L
    U (P^T U)^{-1}`` (r, m) and ``P V`` (m, r);
    residual columns ``C = [f | A_1 V | ... | A_B V | M_L U (P^T U)^{-1}]``
    compressed EITHER exactly (Gram ``C^T C``, small-n/oracle path) OR
    through an oblivious embedding ``Theta C`` (the framework's sketched
    path — pod-scale, epsilon-distortion of the residual l2 norm).

online (jittable, vmappable over mu)
    dense (r, r) Newton on  ``A_hat(mu) a + c(mu) W g(Pv a) = b_hat``
    (the DEIM identity: one reaction evaluation per MAGIC POINT, m of
    them, instead of n);
    residual norm ``||C w(a, mu)||`` from the Gram/sketch with
    ``w = [1, -theta(mu) (x) a, -c(mu) g(Pv a)]`` — EXACT l2 norm of the
    DEIM-approximated residual (no linearization);
    DEIM error indicator from the reserve points.

Certificate (R = l2): strong monotonicity of the semilinear operator
(models/semilinear.py module docstring) gives

    ||u - u_r||_2  <=  ( ||r_deim(u_r)||_2 + c h^2 ||g - I_m g||_2 ) / alpha_LB

with ``alpha_LB <= lambda_min(sym A(mu))`` certified by the linear
family's machinery (min-theta over matrix-free LOBPCG anchors,
mor/bounds.py + mor/scm_matfree.py). The first term is computed exactly
(up to sketch distortion when ``embedding`` is used); the second (DEIM
truncation) is ESTIMATED from reserve magic points — the same honesty
contract as the EIM tier (mor/eim.py ``error_indicator``): rigorous up
to the reserve-point indicator and, on the sketched path, up to the
embedding's (epsilon, delta) guarantee.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from rla4mor_tpu.core.affine import AffineDense
from rla4mor_tpu.core.orthonormalize import pod
from rla4mor_tpu.core.parameters import Mu, ProjectionCoefficient, eval_coefficients
from rla4mor_tpu.models.semilinear import NONLINEARITIES, SemilinearStencilFOM
from rla4mor_tpu.mor.eim import deim

_HI = jax.lax.Precision.HIGHEST


class SemilinearResidualEstimator:
    """l2 norm of the DEIM residual + reserve-point DEIM indicator.

    Pytree. ``gram`` is EITHER the (ncols, ncols) Gram ``C^T C`` (exact
    path, ``sketched=False``) OR the (k, ncols) sketch ``Theta C``
    (``sketched=True``). ``w`` layout: ``[1 | -theta (x) a | -c g_pts]``.
    """

    def __init__(self, gram, Pv_res, pred_res, sketched: bool,
                 mass_scale: float, n_interior: int):
        self.gram = jnp.asarray(gram)
        # reserve-point pieces (both None when n_reserve == 0)
        self.Pv_res = None if Pv_res is None else jnp.asarray(Pv_res)
        self.pred_res = None if pred_res is None else jnp.asarray(pred_res)
        self.sketched = bool(sketched)
        self.mass_scale = float(mass_scale)  # h^2
        self.n_interior = int(n_interior)

    def tree_flatten(self):
        return (self.gram, self.Pv_res, self.pred_res), (
            self.sketched, self.mass_scale, self.n_interior)

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = object.__new__(cls)
        obj.gram, obj.Pv_res, obj.pred_res = children
        obj.sketched, obj.mass_scale, obj.n_interior = aux
        return obj

    def residual_norm(self, w: jax.Array) -> jax.Array:
        if self.sketched:
            return jnp.linalg.norm(
                jnp.matmul(self.gram, w, precision=_HI))
        q = jnp.vdot(w, jnp.matmul(self.gram, w, precision=_HI))
        return jnp.sqrt(jnp.maximum(q.real, 0.0))

    def residual_norms_batch(self, Ws: jax.Array) -> jax.Array:
        """||C w_k|| for a stack of weight vectors Ws (K, ncols) — the
        parabolic time loop's per-step residual norms in one matmul."""
        if self.sketched:
            R = jnp.matmul(self.gram, Ws.T, precision=_HI)
            return jnp.linalg.norm(R, axis=0)
        q = jnp.sum(Ws * jnp.matmul(Ws, self.gram, precision=_HI), axis=1)
        return jnp.sqrt(jnp.maximum(q, 0.0))

    def deim_indicator(self, g_pts: jax.Array, g_res: jax.Array) -> jax.Array:
        """sup-norm DEIM error estimate at the reserve points, scaled to
        an l2 surrogate ``h^2 sqrt(n_int) * sup`` (a LOWER-bound-flavored
        indicator, cf. mor/eim.py error_indicator)."""
        if self.pred_res is None:
            return jnp.asarray(0.0, g_pts.dtype)
        sup = jnp.max(jnp.abs(
            g_res - jnp.matmul(self.pred_res, g_pts, precision=_HI)))
        return self.mass_scale * jnp.sqrt(
            jnp.asarray(float(self.n_interior), sup.dtype)) * sup


jax.tree_util.register_pytree_node(
    SemilinearResidualEstimator,
    lambda x: x.tree_flatten(),
    SemilinearResidualEstimator.tree_unflatten,
)


class SemilinearROM:
    """Dense hyperreduced semilinear ROM — jittable online Newton.

    Pytree; the online stage (``solve``/``output``/``estimate_error``)
    is a pure function of ``mu``, so it jits once and vmaps over
    parameter batches (the UQ/optimize entry points consume it through
    the same duck-typed surface as :class:`StationaryROM`).
    """

    def __init__(
        self,
        lhs: AffineDense,              # (B, r, r) reduced linear stacks
        rhs_hat: jax.Array,            # (r,)
        W: jax.Array,                  # (r, m)   V^T M_L U S
        Pv: jax.Array,                 # (m, r)   V rows at magic points
        output_row: Optional[jax.Array],   # (r,) or None
        error_estimator: Optional[SemilinearResidualEstimator],
        nonlinearity: str,
        reaction_scale: float,
        newton_tol: float = 1e-11,
        max_newton: int = 50,
    ):
        self.lhs = lhs
        self.rhs_hat = jnp.asarray(rhs_hat)
        self.W = jnp.asarray(W)
        self.Pv = jnp.asarray(Pv)
        self.output_row = None if output_row is None else jnp.asarray(output_row)
        self.error_estimator = error_estimator
        self.nonlinearity = str(nonlinearity)
        self.reaction_scale = float(reaction_scale)
        self.newton_tol = float(newton_tol)
        self.max_newton = int(max_newton)

    def tree_flatten(self):
        return (self.lhs, self.rhs_hat, self.W, self.Pv, self.output_row,
                self.error_estimator), (
            self.nonlinearity, self.reaction_scale, self.newton_tol,
            self.max_newton)

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = object.__new__(cls)
        (obj.lhs, obj.rhs_hat, obj.W, obj.Pv, obj.output_row,
         obj.error_estimator) = children
        (obj.nonlinearity, obj.reaction_scale, obj.newton_tol,
         obj.max_newton) = aux
        return obj

    @property
    def dim(self) -> int:
        return self.lhs.source_dim

    @property
    def n_deim(self) -> int:
        return self.W.shape[1]

    def _gdg(self):
        return NONLINEARITIES[self.nonlinearity]

    def reaction(self, mu: Mu) -> jax.Array:
        return self.reaction_scale * jnp.asarray(mu["reaction"]).reshape(-1)[0]

    # -- online stage --------------------------------------------------------
    def solve(self, mu: Mu) -> jax.Array:
        """Dense (r, r) Newton with full steps from a = 0. The reduced
        operator inherits strong monotonicity (V^T F(V .) has the same
        monotonicity constant on range(V)), so the solution is unique."""
        g, dg = self._gdg()
        A = self.lhs.assemble(mu)
        c = self.reaction(mu).astype(A.dtype)
        b = self.rhs_hat.astype(A.dtype)
        W, Pv = self.W.astype(A.dtype), self.Pv.astype(A.dtype)

        def F(a):
            return (jnp.matmul(A, a, precision=_HI)
                    + c * jnp.matmul(W, g(jnp.matmul(Pv, a, precision=_HI)),
                                     precision=_HI) - b)

        bn = jnp.maximum(jnp.linalg.norm(b), jnp.finfo(A.dtype).tiny)

        def cond(state):
            a, k = state
            return jnp.logical_and(
                jnp.linalg.norm(F(a)) > self.newton_tol * bn,
                k < self.max_newton)

        def body(state):
            a, k = state
            p = jnp.matmul(Pv, a, precision=_HI)
            J = A + c * jnp.matmul(W * dg(p)[None, :], Pv, precision=_HI)
            return a - jnp.linalg.solve(J, F(a)), k + 1

        a0 = jnp.zeros((self.dim,), A.dtype)
        a, _ = lax.while_loop(cond, body, (a0, jnp.asarray(0)))
        return a

    def solve_batch(self, mus_batched: Mu) -> jax.Array:
        return jax.vmap(self.solve)(mus_batched)

    def output(self, a, mu: Mu | None = None) -> jax.Array:
        assert self.output_row is not None
        return jnp.vdot(self.output_row.astype(a.dtype), a)

    def estimate_error(self, mu: Mu, a=None, include_deim: bool = True):
        """l2 residual norm of the hyperreduced solution (exact up to
        sketch distortion) + the reserve-point DEIM indicator. Divide by
        a certified alpha_LB(mu) of the LINEAR family for the monotone
        error bound (module docstring)."""
        est = self.error_estimator
        assert est is not None
        if a is None:
            a = self.solve(mu)
        g, _ = self._gdg()
        theta = jnp.asarray(
            eval_coefficients(self.lhs.coefficients, mu), a.dtype)
        c = self.reaction(mu).astype(a.dtype)
        g_pts = g(jnp.matmul(self.Pv.astype(a.dtype), a, precision=_HI))
        w = jnp.concatenate([
            jnp.ones((1,), a.dtype),
            -(theta[:, None] * a[None, :]).reshape(-1),
            -c * g_pts,
        ])
        rnorm = est.residual_norm(w)
        if include_deim and est.Pv_res is not None:
            g_res = g(jnp.matmul(est.Pv_res.astype(a.dtype), a,
                                 precision=_HI))
            rnorm = rnorm + c * est.deim_indicator(g_pts, g_res)
        return rnorm

    def solve_and_estimate_batch(self, mus_batched: Mu):
        def one(mu):
            a = self.solve(mu)
            return a, self.estimate_error(mu, a)

        return jax.vmap(one)(mus_batched)


jax.tree_util.register_pytree_node(
    SemilinearROM,
    lambda x: x.tree_flatten(),
    SemilinearROM.tree_unflatten,
)


class SemilinearInstationaryROM:
    """Hyperreduced IMEX semilinear heat ROM — one jittable ``lax.scan``.

    Reduced recursion (cf. :class:`SemilinearInstationaryFOM`):

        (M_hat + dt A_hat(mu)) a^{k+1} = M_hat a^k + dt (b_hat
                                          - c(mu) W g(Pv a^k)),

    Cholesky-factored ONCE per mu (the implicit matrix is SPD and
    time-independent), so the online cost is nt dense (r, r) triangular
    solves + nt DEIM point evaluations.  ``estimate_error`` returns the
    space-time residual quantity ``sqrt(dt sum_k ||r^k||_2^2)
    (+ DEIM reserve term)``; :meth:`certified_error_bound` composes the
    per-step residuals with the linear family's certified ``alpha_LB``
    into a RIGOROUS state-error bound (round-5 theorem below — the
    round-4 "indicator-grade" honesty boundary is closed).

    **Theorem (monotone IMEX composition).**  Let ``u^k`` solve the FOM
    IMEX recursion (models/semilinear.py:SemilinearInstationaryFOM) and
    ``u_r^k = V a^k`` the lifted ROM trajectory with per-step defects
    ``rho^k = M V (a^{k+1}-a^k)/dt + A V a^{k+1} + c M_L USg^k - f`` and
    DEIM gaps ``d^k = c M_L (g(u_r^k) - US g^k)``.  Subtracting the two
    recursions and testing with ``e^{k+1} = u^{k+1} - u_r^{k+1}`` gives,
    with ``(A v, v) >= alpha ||v||_2^2`` and the pointwise Lipschitz
    bound ``|g(u^k) - g(u_r^k)| <= L |e^k|`` (L = sup g' over [-U, U],
    U a verified a-priori solution window) and ``M_L = h^2 I``::

        (E_{k+1} - E_k)/(2 dt) + alpha x_k^2
            <= r_k x_k + c h^2 L x_k y_k,

    ``E_k = ||e^k||_M^2``, ``x_k = ||e^{k+1}||_2``, ``y_k = ||e^k||_2``,
    ``r_k = ||rho^k||_2 + ||d^k||_2``.  SUMMING over k (instead of a
    per-step Groenwall — the reaction cross terms ``sum x_k y_k <= sum
    x_k^2`` absorb into the accumulated dissipation, so no exponential
    in ``1/m_lo`` appears) and one Young inequality with weight
    ``alpha - c h^2 L`` yield, whenever ``c h^2 L < alpha``::

        ||e^K||_2^2  <=  E_K / (m_lo h^2)
                     <=  dt sum_{k<K} r_k^2 / ((alpha - c h^2 L)
                                               m_lo h^2),

    ``m_lo h^2 I <= M`` the consistent-mass spectral floor
    (models/semilinear.py:MASS_REL_SPECTRUM) — i.e. exactly the
    space-time residual quantity ``estimate_error`` accumulates, divided
    by a reaction-corrected certified coercivity.  The window U is
    closed by a discrete bootstrap: with ``U = U_r + margin``
    (``U_r >= max_k ||u_r^k||_inf`` via the stored row-sup factor
    ``v_row_sup``), induction over k keeps ``|u^k|_inf <= U`` valid as
    long as every intermediate bound stays ``<= margin`` — checked (and
    auto-fitted over a margin ladder), flagged ``certified=False`` with
    an ``inf`` bound otherwise; ``c h^2 L >= alpha`` (reaction beats
    dissipation — explicit treatment genuinely unstable there) is
    likewise flagged, never silently wrong.  Honesty contract unchanged
    from the stationary tier: ``||d^k||`` is estimated from the DEIM
    reserve points, and the residual norms are exact up to sketch
    distortion on the sketched path.
    """

    def __init__(self, lhs: AffineDense, M_hat, rhs_hat, W, Pv,
                 output_row, error_estimator, nonlinearity: str,
                 reaction_scale: float, nt: int, dt: float,
                 v_row_sup: float = float("nan")):
        self.lhs = lhs
        self.M_hat = jnp.asarray(M_hat)
        self.rhs_hat = jnp.asarray(rhs_hat)
        self.W = jnp.asarray(W)
        self.Pv = jnp.asarray(Pv)
        self.output_row = None if output_row is None else jnp.asarray(
            output_row)
        self.error_estimator = error_estimator
        self.nonlinearity = str(nonlinearity)
        self.reaction_scale = float(reaction_scale)
        self.nt = int(nt)
        self.dt = float(dt)
        # max row 2-norm of the POD basis V: ||V a||_inf <= v_row_sup
        # ||a||_2 — the computable a-priori sup bound the certified
        # bootstrap needs (NaN when fit by an old offline stage)
        self.v_row_sup = float(v_row_sup)

    def tree_flatten(self):
        return (self.lhs, self.M_hat, self.rhs_hat, self.W, self.Pv,
                self.output_row, self.error_estimator), (
            self.nonlinearity, self.reaction_scale, self.nt, self.dt,
            self.v_row_sup)

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = object.__new__(cls)
        (obj.lhs, obj.M_hat, obj.rhs_hat, obj.W, obj.Pv, obj.output_row,
         obj.error_estimator) = children
        (obj.nonlinearity, obj.reaction_scale, obj.nt, obj.dt,
         obj.v_row_sup) = aux
        return obj

    @property
    def dim(self) -> int:
        return self.lhs.source_dim

    def reaction(self, mu: Mu) -> jax.Array:
        return self.reaction_scale * jnp.asarray(mu["reaction"]).reshape(-1)[0]

    def solve(self, mu: Mu) -> jax.Array:
        """(r, nt + 1) reduced trajectory from a0 = 0 (time axis last)."""
        g, _ = NONLINEARITIES[self.nonlinearity]
        A = self.lhs.assemble(mu)
        dt = jnp.asarray(self.dt, A.dtype)
        c = self.reaction(mu).astype(A.dtype)
        B = self.M_hat.astype(A.dtype) + dt * A
        cho = jax.scipy.linalg.cho_factor(B)
        b = self.rhs_hat.astype(A.dtype)
        W, Pv = self.W.astype(A.dtype), self.Pv.astype(A.dtype)
        Mh = self.M_hat.astype(A.dtype)

        def step(a, _):
            rhs = (jnp.matmul(Mh, a, precision=_HI)
                   + dt * (b - c * jnp.matmul(
                       W, g(jnp.matmul(Pv, a, precision=_HI)),
                       precision=_HI)))
            a_new = jax.scipy.linalg.cho_solve(cho, rhs)
            return a_new, a_new

        a0 = jnp.zeros((self.dim,), A.dtype)
        _, traj = lax.scan(step, a0, None, length=self.nt)
        return jnp.concatenate([a0[None], traj], axis=0).T

    def solve_batch(self, mus_batched: Mu) -> jax.Array:
        return jax.vmap(self.solve)(mus_batched)

    def output_trajectory(self, traj) -> jax.Array:
        assert self.output_row is not None
        return jnp.matmul(self.output_row.astype(traj.dtype), traj,
                          precision=_HI)

    def _step_residuals(self, mu: Mu, traj, include_deim: bool):
        """Per-step defect norms of the stored trajectory: ``(rnorms,
        deim)`` with ``rnorms[k] = ||rho^k||_2`` (weight vector
        ``[-1 | theta_b (x) a^{k+1} | c g(Pv a^k) | (a^{k+1}-a^k)/dt]``
        over the columns ``[f | A_b V | M_L U S | M V]``) and ``deim[k]``
        the reserve-point estimate of ``||d^k||_2 = c ||M_L (g(u_r^k) -
        US g^k)||_2`` (zeros when no reserve points / disabled)."""
        est = self.error_estimator
        assert est is not None
        g, _ = NONLINEARITIES[self.nonlinearity]
        dtype = traj.dtype
        a_old = traj[:, :-1].T          # (nt, r)
        a_new = traj[:, 1:].T           # (nt, r)
        theta = jnp.asarray(
            eval_coefficients(self.lhs.coefficients, mu), dtype)
        c = self.reaction(mu).astype(dtype)
        dt = jnp.asarray(self.dt, dtype)
        g_pts = g(jnp.matmul(a_old, self.Pv.T.astype(dtype),
                             precision=_HI))          # (nt, m)
        K = a_old.shape[0]
        Ws = jnp.concatenate([
            jnp.full((K, 1), -1.0, dtype),
            (theta[None, :, None] * a_new[:, None, :]).reshape(K, -1),
            c * g_pts,
            (a_new - a_old) / dt,
        ], axis=1)
        rnorms = est.residual_norms_batch(Ws)
        if include_deim and est.Pv_res is not None:
            g_res = g(jnp.matmul(a_old, est.Pv_res.T.astype(dtype),
                                 precision=_HI))      # (nt, m_res)
            pred = jnp.matmul(g_pts, est.pred_res.T.astype(dtype),
                              precision=_HI)
            sup = jnp.max(jnp.abs(g_res - pred), axis=1)  # (nt,)
            scale = est.mass_scale * jnp.sqrt(
                jnp.asarray(float(est.n_interior), dtype))
            deim = c * scale * sup
        else:
            deim = jnp.zeros_like(rnorms)
        return rnorms, deim

    def estimate_error(self, mu: Mu, traj=None,
                       include_deim: bool = True) -> jax.Array:
        """Space-time l2 residual quantity ``sqrt(dt sum_k ||rho^k||^2)
        (+ DEIM reserve term)`` of the stored trajectory — the greedy
        scoring quantity; :meth:`certified_error_bound` upgrades the
        per-step pieces to a rigorous bound."""
        if traj is None:
            traj = self.solve(mu)
        rnorms, deim = self._step_residuals(mu, traj, include_deim)
        dt = jnp.asarray(self.dt, rnorms.dtype)
        eta = jnp.sqrt(dt * jnp.sum(rnorms * rnorms))
        if include_deim:
            eta = eta + jnp.sqrt(dt * jnp.sum(deim * deim))
        return eta

    def certified_error_bound(
        self,
        mu: Mu,
        coercivity,
        traj=None,
        margin: float | jax.Array | None = None,
        v_row_sup: float | None = None,
        include_deim: bool = True,
    ):
        """RIGOROUS final-time state-error bound ``||u^nt - V a^nt||_2``
        by the monotone IMEX composition (class docstring theorem).

        ``coercivity``: certified l2 ``alpha_LB`` callable of the LINEAR
        family (min-theta / matrix-free SCM — the same object the
        stationary tier uses).  ``margin``: the bootstrap window
        ``U = U_r + margin`` for the local Lipschitz constant of ``g``;
        every intermediate bound must stay ``<= margin`` for the window
        to be self-consistent (default ``0.05 (1 + U_r)``).

        Returns ``(bound, info)`` — jittable / vmappable; ``bound`` is
        ``inf`` when the explicit-reaction CFL factor turns nonpositive
        OR the bootstrap fails (``info['certified']`` False), never a
        silently invalid finite number.  ``info`` carries jnp scalars:
        ``bound_max`` (max over steps), ``margin``, ``L``, ``alpha``,
        ``U_r``, ``certified``."""
        from rla4mor_tpu.models.semilinear import (
            MASS_REL_SPECTRUM,
            NONLINEARITY_DG_SUP,
        )

        est = self.error_estimator
        assert est is not None
        if traj is None:
            traj = self.solve(mu)
        s_V = self.v_row_sup if v_row_sup is None else float(v_row_sup)
        if not np.isfinite(s_V):
            raise ValueError(
                "certified_error_bound needs v_row_sup (the POD basis "
                "row-sup factor); refit with the round-5 offline stage "
                "or pass v_row_sup= explicitly"
            )
        rnorms, deim = self._step_residuals(mu, traj, include_deim)
        r = rnorms + deim                      # (nt,)
        dtype = r.dtype
        dt = jnp.asarray(self.dt, dtype)
        h2 = jnp.asarray(est.mass_scale, dtype)      # h^2 (M_L scale)
        m_lo, m_hi = MASS_REL_SPECTRUM
        alpha = jnp.asarray(coercivity(mu), dtype).reshape(())
        c = self.reaction(mu).astype(dtype)

        U_r = s_V * jnp.max(jnp.linalg.norm(traj, axis=0))

        S_T = dt * jnp.sum(r * r)  # the full space-time residual sum

        def bound_for(m):
            """(final bound, certified, L) for the window U = U_r + m —
            closed form (class docstring theorem)."""
            L = jnp.asarray(
                NONLINEARITY_DG_SUP[self.nonlinearity](U_r + m), dtype)
            gap = alpha - c * h2 * L      # reaction-corrected coercivity
            ok = gap > 0
            gap_s = jnp.where(ok, gap, 1.0)
            b_T = jnp.sqrt(S_T / (gap_s * m_lo * h2))
            # cumulative sums are monotone: the bound at every k <= nt
            # is <= b_T, so the bootstrap only needs the final value
            cert = jnp.logical_and(ok, b_T <= m)
            return b_T, cert, L

        if margin is None:
            # automatic bootstrap fixed point: the window must satisfy
            # bound(L(U_r + m)) <= m; too-small m fails the check,
            # too-large m inflates L (and can close the coercivity gap)
            # — geometric ladder, take the SMALLEST certified window
            base = 0.01 * (1.0 + U_r)
            margins = base * (1.5 ** jnp.arange(24, dtype=dtype))
            b_T, cert, Ls = jax.vmap(bound_for)(margins)
            big = jnp.asarray(jnp.inf, dtype)
            pick = jnp.argmin(jnp.where(cert, margins, big))
            certified = jnp.any(cert)
            margin = margins[pick]
            bound_last = b_T[pick]
            L = Ls[pick]
        else:
            margin = jnp.asarray(margin, dtype)
            bound_last, certified, L = bound_for(margin)
        bound_max = bound_last  # monotone cumulative bound

        inf = jnp.asarray(jnp.inf, dtype)
        bound = jnp.where(certified, bound_last, inf)
        info = dict(
            bound_max=jnp.where(certified, bound_max, inf),
            margin=margin, L=L, alpha=alpha, U_r=U_r,
            certified=certified,
        )
        return bound, info


jax.tree_util.register_pytree_node(
    SemilinearInstationaryROM,
    lambda x: x.tree_flatten(),
    SemilinearInstationaryROM.tree_unflatten,
)


# ---------------------------------------------------------------------------
# offline
# ---------------------------------------------------------------------------


@dataclass
class SemilinearReductor:
    """POD-DEIM offline stage for :class:`SemilinearStencilFOM`.

    ``embedding``: None -> exact Gram residual estimator (small/medium
    n); an ``ops.embeddings`` LinOp (rows = n_dof) -> sketched estimator
    (pod scale: the n-sized residual columns are compressed to k rows
    once, offline).
    """

    fom: SemilinearStencilFOM
    embedding: object | None = None

    # set by the most recent fit/greedy: the POD basis (n, r) and DEIM
    # interpolant behind the returned ROM (reconstruction + diagnostics)
    last_basis: object = None
    last_interpolant: object = None

    def fit(
        self,
        mus_train,
        modes: Optional[int] = None,
        pod_rtol: float = 1e-7,
        deim_modes: Optional[int] = None,
        deim_rtol: float = 1e-7,
        n_reserve: int = 2,
        snapshots: Optional[jax.Array] = None,
        **solve_kw,
    ) -> SemilinearROM:
        fom = self.fom
        if snapshots is None:
            snapshots = jnp.stack(
                [fom.solve_newton(m, **solve_kw).reshape(-1)
                 for m in mus_train], axis=1)
        S = jnp.asarray(snapshots)

        V, _ = pod(S, modes=modes, rtol=pod_rtol)

        # DEIM of the nonlinearity snapshots (g(0)=0 on the Dirichlet
        # ring -> boundary rows are identically zero, never selected)
        G = fom.g(S)
        n_keep = deim_modes
        interp_full = deim(G, modes=n_keep, rtol=deim_rtol)
        m_total = interp_full.basis.shape[1]
        n_res = min(n_reserve, max(m_total - 1, 0))
        interp = (interp_full.truncate(m_total - n_res, n_res)
                  if n_res > 0 else interp_full)
        return self._assemble_rom(V, interp)

    def _assemble_rom(self, V, interp) -> SemilinearROM:
        self.last_basis = V
        self.last_interpolant = interp
        fom = self.fom
        B = fom.linear.n_terms
        V = jnp.asarray(V)

        # reduced linear stacks
        AV = [fom.linear.term_linop(b).apply(V) for b in range(B)]
        lhs = AffineDense(
            jnp.stack([jnp.matmul(V.T, av, precision=_HI) for av in AV]),
            tuple(ProjectionCoefficient("diffusion", b) for b in range(B)),
        )
        f = fom.rhs().reshape(-1)
        rhs_hat = jnp.matmul(V.T, f, precision=_HI)

        # hyperreduction pieces
        m = interp.n_terms
        pts = interp.active_points
        U_act = interp.basis[:, :m]
        S_inv = jnp.linalg.inv(interp.interp_matrix[:m, :m])
        ml = fom.mass_lumped_diag().reshape(-1)
        MUS = ml[:, None] * jnp.matmul(U_act, S_inv, precision=_HI)  # (n, m)
        W = jnp.matmul(V.T, MUS, precision=_HI)
        Pv = V[pts, :]

        # reserve-point pieces
        res_pts = interp.reserve_points
        if res_pts is not None and res_pts.shape[0] > 0:
            Pv_res = V[res_pts, :]
            pred_res = jnp.matmul(U_act[res_pts, :], S_inv, precision=_HI)
        else:
            Pv_res = pred_res = None

        # residual columns C = [f | A_1 V .. A_B V | M_L U S]
        C = jnp.concatenate([f[:, None]] + AV + [MUS], axis=1)
        if self.embedding is None:
            gram = jnp.matmul(C.T, C, precision=_HI)
            sketched = False
        else:
            gram = self.embedding.apply(C)
            sketched = True
        n_int = int((fom.n_nodes - 2) ** 2)
        est = SemilinearResidualEstimator(
            gram, Pv_res, pred_res, sketched,
            mass_scale=fom.h * fom.h, n_interior=n_int)

        out_row = jnp.matmul(
            jnp.full((fom.n_dof,), fom.h * fom.h, V.dtype), V,
            precision=_HI)
        return SemilinearROM(
            lhs, rhs_hat, W, Pv, out_row, est,
            nonlinearity=fom.nonlinearity,
            reaction_scale=fom.reaction_scale,
        )

    def fit_instationary(
        self,
        ifom,
        mus_train,
        modes: Optional[int] = None,
        pod_rtol: float = 1e-7,
        deim_modes: Optional[int] = None,
        deim_rtol: float = 1e-7,
        n_reserve: int = 2,
        store_every: int = 1,
        snapshots: Optional[jax.Array] = None,
        **solve_kw,
    ) -> SemilinearInstationaryROM:
        """POD-DEIM over IMEX trajectories of a
        :class:`~rla4mor_tpu.models.semilinear.SemilinearInstationaryFOM`:
        snapshots = all stored states of all training trajectories
        (u0 = 0 dropped), DEIM over their nonlinearity images."""
        from rla4mor_tpu.models.stencil import mass_apply

        fom = self.fom
        assert ifom.fom is fom, "reductor fom must be the ifom's spatial fom"
        if snapshots is None:
            trajs = [ifom.solve_flat(m, store_every=store_every,
                                     **solve_kw)[:, 1:]
                     for m in mus_train]
            snapshots = jnp.concatenate(trajs, axis=1)
        S = jnp.asarray(snapshots)

        V, _ = pod(S, modes=modes, rtol=pod_rtol)
        G = fom.g(S)
        interp_full = deim(G, modes=deim_modes, rtol=deim_rtol)
        m_total = interp_full.basis.shape[1]
        n_res = min(n_reserve, max(m_total - 1, 0))
        interp = (interp_full.truncate(m_total - n_res, n_res)
                  if n_res > 0 else interp_full)
        self.last_basis = V
        self.last_interpolant = interp

        B = fom.linear.n_terms
        AV = [fom.linear.term_linop(b).apply(V) for b in range(B)]
        lhs = AffineDense(
            jnp.stack([jnp.matmul(V.T, av, precision=_HI) for av in AV]),
            tuple(ProjectionCoefficient("diffusion", b) for b in range(B)),
        )
        f = fom.rhs().reshape(-1)
        rhs_hat = jnp.matmul(V.T, f, precision=_HI)

        # consistent-mass columns M V (flat), via the grid mass apply
        shp = fom.solution_shape
        MV = jax.vmap(
            lambda col: mass_apply(col.reshape(shp), fom.h).reshape(-1),
            in_axes=1, out_axes=1)(V)
        M_hat = jnp.matmul(V.T, MV, precision=_HI)

        m = interp.n_terms
        pts = interp.active_points
        U_act = interp.basis[:, :m]
        S_inv = jnp.linalg.inv(interp.interp_matrix[:m, :m])
        ml = fom.mass_lumped_diag().reshape(-1)
        MUS = ml[:, None] * jnp.matmul(U_act, S_inv, precision=_HI)
        W = jnp.matmul(V.T, MUS, precision=_HI)
        Pv = V[pts, :]

        res_pts = interp.reserve_points
        if res_pts is not None and res_pts.shape[0] > 0:
            Pv_res = V[res_pts, :]
            pred_res = jnp.matmul(U_act[res_pts, :], S_inv, precision=_HI)
        else:
            Pv_res = pred_res = None

        C = jnp.concatenate([f[:, None]] + AV + [MUS, MV], axis=1)
        if self.embedding is None:
            gram = jnp.matmul(C.T, C, precision=_HI)
            sketched = False
        else:
            gram = self.embedding.apply(C)
            sketched = True
        n_int = int((fom.n_nodes - 2) ** 2)
        est = SemilinearResidualEstimator(
            gram, Pv_res, pred_res, sketched,
            mass_scale=fom.h * fom.h, n_interior=n_int)

        out_row = jnp.matmul(
            jnp.full((fom.n_dof,), fom.h * fom.h, V.dtype), V,
            precision=_HI)
        return SemilinearInstationaryROM(
            lhs, M_hat, rhs_hat, W, Pv, out_row, est,
            nonlinearity=fom.nonlinearity,
            reaction_scale=fom.reaction_scale,
            nt=ifom.nt, dt=ifom.dt,
            # ||V a||_inf <= v_row_sup ||a||_2: the a-priori window factor
            # certified_error_bound's bootstrap needs
            v_row_sup=float(jnp.max(jnp.linalg.norm(V, axis=1))),
        )

    # -- certified strong greedy -------------------------------------------
    def greedy(
        self,
        mus_train,
        n_steps: int,
        coercivity=None,
        deim_rtol: float = 1e-7,
        n_reserve: int = 2,
        seed_index: int = 0,
        verbose: bool = False,
        **solve_kw,
    ):
        """Strong greedy on the training set driven by the CERTIFIED
        indicator ``estimate_error(mu) / alpha_LB(mu)`` (falls back to
        the raw residual norm when ``coercivity`` is None): each step
        Newton-solves only the argmax parameter, refits POD+DEIM on the
        snapshots collected so far. The estimate sweep over the training
        set is ONE jitted vmapped dispatch per step (recompiled per step
        — the reduced shapes grow). Returns ``(rom, history)`` where
        ``history[k]`` is the max indicator before step k's enrichment.
        """
        from rla4mor_tpu.core.parameters import mu_stack

        mus = list(mus_train)
        batched = mu_stack(mus)
        picked = [seed_index]
        snaps = [self.fom.solve_newton(mus[seed_index], **solve_kw)
                 .reshape(-1)]
        history = []
        rom = None
        alphas = (np.ones(len(mus)) if coercivity is None
                  else np.asarray([float(coercivity(mu)) for mu in mus]))
        for step in range(1, n_steps + 1):
            S = jnp.stack(snaps, axis=1)
            rom = self.fit(None, snapshots=S, pod_rtol=1e-10,
                           deim_rtol=deim_rtol, n_reserve=n_reserve)
            _, est_b = jax.jit(rom.solve_and_estimate_batch)(batched)
            ests = np.asarray(est_b, np.float64) / alphas
            ests[np.asarray(picked, int)] = 0.0
            imax = int(np.argmax(ests))
            history.append(float(ests[imax]))
            if verbose:
                print(f"[semilinear greedy] step {step}: "
                      f"max indicator {history[-1]:.3e} at mu #{imax}")
            if step == n_steps or imax in picked:
                break
            picked.append(imax)
            snaps.append(self.fom.solve_newton(mus[imax], **solve_kw)
                         .reshape(-1))
        return rom, history
