"""Successive constraint method (SCM): LP-based coercivity / inf-sup
lower bounds.

Upgrades :mod:`rla4mor_tpu.mor.bounds` — ``MinThetaCoercivity`` needs
parametric coercivity (SPD terms, positive coefficients) and
``InfSupLowerBound`` (Weyl/Lipschitz "SCM-lite") is positive only near
its reference parameters. The SCM (Huynh/Rozza/Sen/Patera, CRAS 345
(2007) 473-478) bounds

    alpha(mu) = lambda_min( sym A(mu), R ),    A(mu) = sum_q theta_q(mu) A_q

by relaxing the Rayleigh-quotient set
Y = { y_q = u^H T_q u / u^H R u } to the polytope

    B  =  prod_q [sigma_q^-, sigma_q^+]           (per-term spectral box)
    cap  { y : theta(mu_j) . y >= alpha(mu_j) }   (exact anchors, greedy)

so alpha_LB(mu) = min_{y in polytope} theta(mu) . y is a small LP (T
variables, J + 2T constraints — scipy HiGHS, ~ms) and a RIGOROUS lower
bound; alpha_UB(mu) = min_j theta(mu) . y*(mu_j) over the anchors'
Rayleigh vectors is a rigorous upper bound. ``fit`` greedily adds the
training parameter with the worst LB/UB gap until certified.

Inf-sup constants reduce to this Hermitian form by squaring
(:class:`ScmInfSup`): beta(mu)^2 = lambda_min(A^H R^-1 A, R), whose
affine expansion over term pairs has HERMITIAN matrices with REAL
coefficients even for complex theta (Helmholtz):

    conj(t_q) t_q' M + conj(t_q') t_q M^H
        = Re(conj(t_q) t_q') (M + M^H)  +  Im(conj(t_q) t_q') i(M - M^H)

with M = A_q^H R^-1 A_q', and both (M + M^H) and i(M - M^H) Hermitian.

Everything here is OFFLINE host-side dense linear algebra plus an
online host LP per mu — the certified-bound analog of the reference's
(nonexistent) bound machinery; use moderate FOM dims (the same regime
as ``InfSupLowerBound``'s dense SVDs). Not jittable; ``tabulate`` bakes
a training set's bounds into an array for device-side sweeps.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import numpy as np
import scipy.linalg as sla
import scipy.sparse as sps
from scipy.optimize import linprog

from rla4mor_tpu.core.parameters import Mu, eval_coefficients


def _dense(op) -> np.ndarray:
    if sps.issparse(op):
        return op.toarray()
    if hasattr(op, "S"):
        return np.asarray(
            op.S.toarray() if sps.issparse(op.S) else op.S
        )
    if hasattr(op, "matrix"):
        return np.asarray(op.matrix())
    return np.asarray(op)


def _product_dense(product, n: int) -> np.ndarray:
    if product is None:
        return np.eye(n)
    return _dense(product.op)


class ScmHermitian:
    """SCM for alpha(mu) = lambda_min(sum_q c_q(mu) T_q, R) with
    Hermitian ``terms`` T_q and a REAL coefficient map ``theta_fn``.

    The generic engine: :class:`ScmCoercivity` / :class:`ScmInfSup`
    build the (terms, theta_fn) pair from a FOM. ``R`` is the SPD
    metric (dense)."""

    def __init__(self, terms: Sequence[np.ndarray],
                 theta_fn: Callable[[Mu], np.ndarray],
                 R: np.ndarray):
        self.terms = [np.asarray(T) for T in terms]
        self.theta_fn = theta_fn
        self.R = np.asarray(R)
        n = self.R.shape[0]
        for T in self.terms:
            assert T.shape == (n, n)
        # per-term spectral box: extreme generalized eigenvalues of (T, R)
        lo, hi = [], []
        for T in self.terms:
            lo.append(float(sla.eigh(
                T, self.R, subset_by_index=[0, 0], eigvals_only=True)[0]))
            hi.append(float(sla.eigh(
                T, self.R, subset_by_index=[n - 1, n - 1],
                eigvals_only=True)[0]))
        self.box = list(zip(lo, hi))
        # greedy anchor state
        self.anchor_mus: list[Mu] = []
        self.anchor_thetas = np.zeros((0, len(self.terms)))
        self.anchor_alphas = np.zeros((0,))
        self.anchor_ystars = np.zeros((0, len(self.terms)))

    # -- exact eigensolve at one parameter --------------------------------
    def _assemble(self, theta: np.ndarray) -> np.ndarray:
        A = np.zeros_like(self.terms[0], dtype=np.result_type(
            *[T.dtype for T in self.terms], np.float64))
        for c, T in zip(theta, self.terms):
            A = A + c * T
        return A

    def alpha_exact(self, mu: Mu):
        """(alpha(mu), y*) — smallest generalized eigenpair of
        (sum c_q T_q, R), y*_q the Rayleigh coordinates of its vector."""
        theta = self._theta(mu)
        w, v = sla.eigh(self._assemble(theta), self.R,
                        subset_by_index=[0, 0])
        u = v[:, 0]
        den = float(np.real(u.conj() @ (self.R @ u)))
        ystar = np.array([
            float(np.real(u.conj() @ (T @ u))) / den for T in self.terms
        ])
        return float(w[0]), ystar

    def _theta(self, mu: Mu) -> np.ndarray:
        th = np.asarray(self.theta_fn(mu), dtype=np.float64)
        assert th.shape == (len(self.terms),)
        return th

    # -- bounds ------------------------------------------------------------
    def lower(self, mu: Mu) -> float:
        """alpha_LB(mu): LP over the box + anchor half-spaces. Rigorous
        lower bound for any anchor set (including none: box only)."""
        theta = self._theta(mu)
        if len(self.anchor_alphas):
            A_ub, b_ub = -self.anchor_thetas, -self.anchor_alphas
        else:
            A_ub = b_ub = None
        res = linprog(theta, A_ub=A_ub, b_ub=b_ub, bounds=self.box,
                      method="highs")
        if not res.success:  # infeasible can't happen (Y is nonempty);
            # numerical failure -> fall back to the box-only bound
            return float(sum(
                min(t * lo, t * hi) for t, (lo, hi) in zip(theta, self.box)
            ))
        return float(res.fun)

    def upper(self, mu: Mu) -> float:
        """alpha_UB(mu) = min over anchors' Rayleigh vectors (rigorous
        upper bound; +inf with no anchors)."""
        if not len(self.anchor_ystars):
            return float("inf")
        theta = self._theta(mu)
        return float(np.min(self.anchor_ystars @ theta))

    __call__ = lower

    def tabulate(self, mus: Sequence[Mu]) -> np.ndarray:
        """Vector of lower bounds (for device-side sweeps)."""
        return np.array([self.lower(mu) for mu in mus])

    # -- offline greedy ------------------------------------------------------
    def add_anchor(self, mu: Mu) -> float:
        alpha, ystar = self.alpha_exact(mu)
        self.anchor_mus.append(mu)
        self.anchor_thetas = np.vstack([self.anchor_thetas,
                                        self._theta(mu)])
        self.anchor_alphas = np.append(self.anchor_alphas, alpha)
        self.anchor_ystars = np.vstack([self.anchor_ystars, ystar])
        return alpha

    def fit(self, training_mus: Sequence[Mu], tol: float = 0.1,
            max_anchors: int = 30) -> dict:
        """Greedy SCM: repeatedly anchor the training parameter with the
        worst relative LB/UB gap (gap := 1 - LB/UB, or inf while LB <= 0
        < UB) until max gap <= tol or ``max_anchors``. Returns a history
        dict (anchors, max_gap per iteration)."""
        mus = list(training_mus)
        history = {"max_gap": [], "n_anchors": 0}
        if not len(self.anchor_alphas):
            self.add_anchor(mus[0])
        while len(self.anchor_alphas) < max_anchors:
            lbs = np.array([self.lower(mu) for mu in mus])
            ubs = np.array([self.upper(mu) for mu in mus])
            with np.errstate(divide="ignore", invalid="ignore"):
                gaps = np.where(
                    (lbs > 0) & (ubs > 0), 1.0 - lbs / ubs,
                    np.where(ubs > 0, np.inf, 0.0),
                )
            worst = int(np.argmax(gaps))
            history["max_gap"].append(float(gaps[worst]))
            if gaps[worst] <= tol:
                break
            self.add_anchor(mus[worst])
        history["n_anchors"] = int(len(self.anchor_alphas))
        return history


class ScmCoercivity(ScmHermitian):
    """SCM coercivity lower bound alpha_LB(mu) <= lambda_min(sym A(mu), R)
    for an affine FOM with REAL coefficients. Unlike
    :class:`~rla4mor_tpu.mor.bounds.MinThetaCoercivity` it needs neither
    SPD terms nor positive coefficients — only overall coercivity on the
    sampled region — and is tighter once fit."""

    def __init__(self, fom, product=None):
        coeffs = tuple(fom.operator.coefficients)
        terms = []
        for t in fom.operator.terms:
            T = _dense(t)
            terms.append(0.5 * (T + T.conj().T))  # symmetric part
        n = terms[0].shape[0]
        R = _product_dense(product, n)

        def theta_fn(mu):
            th = np.asarray(eval_coefficients(coeffs, mu))
            if np.iscomplexobj(th):
                if not np.allclose(th.imag, 0):
                    raise ValueError(
                        "ScmCoercivity needs real coefficients; use "
                        "ScmInfSup for complex families"
                    )
                th = th.real
            return np.asarray(th, dtype=np.float64)

        super().__init__(terms, theta_fn, R)


class ScmInfSup:
    """SCM inf-sup lower bound via the squared operator:
    beta(mu)^2 = lambda_min(A(mu)^H R^-1 A(mu), R). Handles COMPLEX
    coefficients (Helmholtz) through the Re/Im pair expansion (module
    docstring); the expanded Hermitian family has T(T+1)/2 real-part
    terms plus T(T-1)/2 imaginary-part terms.

    Same call surface as ``bounds.InfSupLowerBound``: ``__call__(mu)``
    is beta_LB(mu) (= sqrt(max(alpha_LB, 0))), usable directly in
    :func:`rla4mor_tpu.mor.bounds.inf_sup_error_bound` (eagerly — the
    online LP is host-side, not jittable)."""

    def __init__(self, fom, product=None):
        base_coeffs = tuple(fom.operator.coefficients)
        A_terms = [_dense(t) for t in fom.operator.terms]
        T = len(A_terms)
        n = A_terms[0].shape[0]
        R = _product_dense(product, n)
        # M_qq' = A_q^H R^-1 A_q'
        Rinv_A = [sla.solve(R, Aq, assume_a="pos") for Aq in A_terms]
        terms: list[np.ndarray] = []
        self._pairs: list[tuple[int, int, str]] = []
        for q in range(T):
            for qp in range(q, T):
                M = A_terms[q].conj().T @ Rinv_A[qp]
                if qp == q:
                    terms.append(0.5 * (M + M.conj().T))  # numerically herm
                    self._pairs.append((q, q, "re"))
                else:
                    terms.append(M + M.conj().T)
                    self._pairs.append((q, qp, "re"))
                    S = 1j * (M - M.conj().T)
                    terms.append(S)
                    self._pairs.append((q, qp, "im"))

        pairs = self._pairs

        def theta_fn(mu):
            th = np.asarray(eval_coefficients(base_coeffs, mu))
            out = np.empty(len(pairs))
            for i, (q, qp, part) in enumerate(pairs):
                z = np.conj(th[q]) * th[qp]
                out[i] = float(np.real(z) if part == "re" else np.imag(z))
            return out

        self.scm = ScmHermitian(terms, theta_fn, R)

    def fit(self, training_mus, tol: float = 0.1, max_anchors: int = 30):
        return self.scm.fit(training_mus, tol=tol, max_anchors=max_anchors)

    def lower(self, mu: Mu) -> float:
        return float(np.sqrt(max(self.scm.lower(mu), 0.0)))

    def upper(self, mu: Mu) -> float:
        ub = self.scm.upper(mu)
        if not np.isfinite(ub):
            return float("inf")
        # clamp: a tiny-negative squared bound near an inf-sup zero must
        # give 0, not sqrt(negative) = NaN
        return float(np.sqrt(max(ub, 0.0)))

    __call__ = lower

    def tabulate(self, mus) -> np.ndarray:
        return np.array([self.lower(mu) for mu in mus])
