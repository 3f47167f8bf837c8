"""Distance of a (reduced) vector to the parametric solution manifold.

Rebuild of reference ``ManifoldDistance`` and subclasses (inverse_problems/
manifold_distance.py:20-234): the distance of coefficients ``u`` is the
minimal parametric residual norm  min_mu || L(mu) u - b(mu) ||.

* :class:`ResidualDistanceDiscrete` — minimize over a finite mu sample set
  (reference :91-132). Here: one vmapped evaluation over the whole set (and
  over batches of vectors), instead of a double Python loop.
* :class:`ResidualDistanceAffine` — affine lhs/rhs with box-constrained
  parameters: the minimization is a bound-constrained linear least-squares
  per vector (reference :135-234 uses scipy ``lsq_linear``); here a
  jittable projected-gradient solve (core.solvers.bounded_lstsq) vmapped
  over path points.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rla4mor_tpu.core.affine import AffineDense
from rla4mor_tpu.core.parameters import (
    ConstantCoefficient,
    Mu,
    ProjectionCoefficient,
    mu_stack,
)
from rla4mor_tpu.core.solvers import bounded_lstsq
from rla4mor_tpu.utils.logger import get_logger


class ManifoldDistance:
    """Base: ``evaluate(U)`` for coefficient columns U (dim, k)."""

    lhs: AffineDense

    def evaluate(self, U) -> Tuple[np.ndarray, List]:
        """Distances and minimizing parameter values for each column."""
        raise NotImplementedError

    def distances(self, U) -> "jax.Array":
        """Distances only, as a pure jittable/vmappable function of U
        (n_dofs, cols) -> (cols,) — used by the batched recovery driver."""
        raise NotImplementedError

    def project(self, indices) -> "ManifoldDistance":
        """Restrict the source DoFs of lhs to ``indices`` (reference
        ``ManifoldDistance.project``, manifold_distance.py:67-89)."""
        raise NotImplementedError


class ResidualDistanceDiscrete(ManifoldDistance):
    def __init__(
        self,
        lhs: AffineDense,
        rhs: AffineDense,
        mus: Sequence[Mu],
        log_level: int = 30,
    ):
        self.lhs = lhs
        self.rhs = rhs
        self.mus = list(mus)
        self._mus_batched = mu_stack(self.mus)
        self.logger = get_logger("estim.mdist_discrete", log_level)

    def _residual_norms(self, u):
        def per_mu(mu):
            r = self.lhs.apply(u, mu) - self.rhs.assemble_vec(mu)
            return jnp.linalg.norm(r)

        return jax.vmap(per_mu)(self._mus_batched)

    def evaluate(self, U):
        U = jnp.asarray(U)
        if U.ndim == 1:
            U = U[:, None]
        norms = jax.jit(jax.vmap(self._residual_norms, in_axes=1))(U)
        norms = np.asarray(norms)  # (k, n_mus)
        idx = norms.argmin(axis=1)
        distances = norms[np.arange(len(idx)), idx]
        mus = [self.mus[i] for i in idx]
        return distances, mus

    def distances(self, U):
        U = jnp.asarray(U)
        if U.ndim == 1:
            U = U[:, None]
        return jax.vmap(self._residual_norms, in_axes=1)(U).min(axis=1)

    def project(self, indices):
        indices = jnp.asarray(indices)
        return ResidualDistanceDiscrete(
            AffineDense(self.lhs.stack[:, :, indices], self.lhs.coefficients),
            self.rhs,
            self.mus,
        )


class ResidualDistanceAffine(ManifoldDistance):
    """Affine-in-mu residual, parameters in a box.

    Coefficients of lhs/rhs must each be a ``ProjectionCoefficient`` (a
    parametric column of the LS system) or a ``ConstantCoefficient``
    (contributing to the fixed part) — the affine-rearrangement the
    reference performs symbolically (manifold_distance.py:165-187) is here a
    classification of the typed coefficient tuple.
    """

    def __init__(
        self,
        lhs: AffineDense,
        rhs: AffineDense,
        param_bounds: Tuple[Sequence[float], Sequence[float]],
        parameter_key: str = "diffusion",
        pg_iters: int = 300,
        log_level: int = 30,
    ):
        self.lhs = lhs
        self.rhs = rhs
        self.parameter_key = parameter_key
        self.lb = jnp.asarray(param_bounds[0], dtype=lhs.stack.dtype)
        self.ub = jnp.asarray(param_bounds[1], dtype=lhs.stack.dtype)
        self.pg_iters = pg_iters
        self.logger = get_logger("estim.mdist_affine", log_level)

        self.n_params = self.lb.shape[0]

        def classify(coeffs):
            param_ids, const_ids = [], []
            for t, c in enumerate(coeffs):
                if isinstance(c, ProjectionCoefficient):
                    assert c.key == parameter_key
                    param_ids.append((t, c.index))
                else:
                    assert isinstance(c, ConstantCoefficient)
                    const_ids.append((t, c.value))
            return param_ids, const_ids

        self._lhs_param, self._lhs_const = classify(lhs.coefficients)
        self._rhs_param, self._rhs_const = classify(rhs.coefficients)

    def _build_ls(self, u):
        """G (k, p), g (k,): residual = G mu - g (reference build_ls,
        manifold_distance.py:192-227)."""
        k = self.lhs.range_dim
        dt = self.lhs.stack.dtype
        Lu = jnp.einsum("tkm,m->tk", self.lhs.stack, u,
                        precision=jax.lax.Precision.HIGHEST)  # (T, k)
        b = self.rhs.stack[:, :, 0]  # (Tb, k)

        G = jnp.zeros((k, self.n_params), dtype=dt)
        for t, p in self._lhs_param:
            G = G.at[:, p].add(Lu[t])
        for t, p in self._rhs_param:
            G = G.at[:, p].add(-b[t])
        g = jnp.zeros((k,), dtype=dt)
        for t, v in self._rhs_const:
            g = g + v * b[t]
        for t, v in self._lhs_const:
            g = g - v * Lu[t]
        return G, g

    def _evaluate_one(self, u):
        G, g = self._build_ls(u)
        x = bounded_lstsq(G, g, self.lb, self.ub, iters=self.pg_iters)
        r = jnp.matmul(G, x, precision=jax.lax.Precision.HIGHEST) - g
        return jnp.linalg.norm(r), x

    def evaluate(self, U):
        U = jnp.asarray(U)
        if U.ndim == 1:
            U = U[:, None]
        dist, xs = jax.jit(jax.vmap(self._evaluate_one, in_axes=1))(U)
        mus = [{self.parameter_key: xs[i]} for i in range(xs.shape[0])]
        return np.asarray(dist), mus

    def distances(self, U):
        U = jnp.asarray(U)
        if U.ndim == 1:
            U = U[:, None]
        return jax.vmap(self._evaluate_one, in_axes=1)(U)[0]

    def project(self, indices):
        indices = jnp.asarray(indices)
        out = object.__new__(ResidualDistanceAffine)
        out.__dict__.update(self.__dict__)
        out.lhs = AffineDense(
            self.lhs.stack[:, :, indices], self.lhs.coefficients
        )
        return out
