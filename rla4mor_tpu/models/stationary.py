"""Stationary parametric models: full-order (FOM) and reduced-order (ROM).

JAX-native replacement for pyMOR ``StationaryModel`` as used by the
reference (mor/sketched_reductor.py:165-166, inverse_problems/example.py).

* :class:`StationaryFOM` — affine operator with (host-)sparse or matrix-free
  terms; ``solve`` assembles and factorizes on host (small/medium n) or runs
  device CG (large n, matrix-free terms).
* :class:`StationaryROM` — a **pytree** of dense affine stacks: ``solve``,
  ``output`` and ``estimate_error`` are pure jittable functions of ``mu``,
  so online evaluation vmaps over parameter batches (the reference loops in
  Python, one dense assemble + solve per mu).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sps
import scipy.sparse.linalg as spla

from rla4mor_tpu.core.affine import AffineDense, AffineOp
from rla4mor_tpu.core.linops import HostSparseOp
from rla4mor_tpu.core.parameters import Mu, ParameterSpace, eval_coefficients
from rla4mor_tpu.core.products import Product


class StationaryFOM:
    """A(mu) u = b(mu) with affine A, b; optional output functional s = C u."""

    def __init__(
        self,
        operator: AffineOp,
        rhs: AffineOp,
        output_functional: Optional[AffineOp] = None,
        products: Optional[Dict[str, Product]] = None,
        parameter_space: Optional[ParameterSpace] = None,
        name: str = "fom",
    ):
        self.operator = operator
        self.rhs = rhs
        self.output_functional = output_functional
        self.products = products or {}
        self.parameter_space = parameter_space
        self.name = name
        self.solution_dim = operator.source_dim

    # -- assembly -------------------------------------------------------------
    def assemble_sparse(self, mu: Mu) -> sps.csr_matrix:
        theta = np.asarray(eval_coefficients(self.operator.coefficients, mu))
        out = None
        for t, term in enumerate(self.operator.terms):
            assert isinstance(term, HostSparseOp), "assemble_sparse needs sparse terms"
            m = theta[t] * term.S
            out = m if out is None else out + m
        return out.tocsc()

    def assemble_rhs(self, mu: Mu) -> jax.Array:
        if isinstance(self.rhs, AffineDense):
            return self.rhs.assemble_vec(mu)
        return self.rhs.assemble_dense(mu)[:, 0]

    # -- solve ----------------------------------------------------------------
    def solve(self, mu: Mu) -> jax.Array:
        """Direct sparse solve on host (offline/oracle path)."""
        A = self.assemble_sparse(mu)
        b = np.asarray(self.assemble_rhs(mu))
        if not np.iscomplexobj(b):
            b = b.astype(np.float64)
        x = spla.splu(A).solve(b)
        return jnp.asarray(x)

    def solve_many(self, mus) -> jax.Array:
        return jnp.stack([self.solve(mu) for mu in mus], axis=1)

    def output(self, u, mu: Mu):
        assert self.output_functional is not None
        return self.output_functional.apply(u, mu)

    def residual_norm(self, u, mu: Mu, product: Optional[Product] = None):
        u = jnp.asarray(u)
        b = self.assemble_rhs(mu)
        if u.ndim > 1:
            b = b[:, None]
        r = jnp.asarray(self.operator.apply(u, mu)) - b
        return jnp.linalg.norm(r, axis=0) if product is None else product.norm(r)


class ResidualErrorEstimator:
    """|| lhs(mu) u - rhs(mu) ||_2 — sketched residual estimator (pytree).

    Rebuild of reference ``ResidualErrorEstimator``
    (mor/sketched_reductor.py:210-219) and the preconditioners'
    ``ErrorEstimator`` (preconditioned_rom.py:236-244).
    """

    def __init__(self, lhs: AffineDense, rhs: AffineDense):
        self.lhs = lhs  # (T, k, r)
        self.rhs = rhs  # (Tb, k, 1)

    def tree_flatten(self):
        return (self.lhs, self.rhs), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = object.__new__(cls)
        obj.lhs, obj.rhs = children
        return obj

    def estimate_error(self, u, mu: Mu) -> jax.Array:
        r = self.lhs.apply(u, mu)
        b = self.rhs.assemble_vec(mu)
        if jnp.asarray(u).ndim == 1:
            return jnp.linalg.norm(r - b)
        return jnp.linalg.norm(r - b[:, None], axis=0)


jax.tree_util.register_pytree_node(
    ResidualErrorEstimator,
    lambda x: x.tree_flatten(),
    ResidualErrorEstimator.tree_unflatten,
)


class StationaryROM:
    """Dense affine reduced model; fully jittable online stage.

    ``ls=False``: Galerkin square solve (reference _reduce_galerkin,
    mor/sketched_reductor.py:154-168). ``ls=True``: least-squares (minres)
    solve of a sketched rectangular system (reference _reduce_minres +
    LsOperator, sketched_reductor.py:170-187, utilities/
    other_operators.py:32-33).
    """

    def __init__(
        self,
        lhs: AffineDense,
        rhs: AffineDense,
        output_functional: Optional[AffineDense] = None,
        error_estimator: Optional[ResidualErrorEstimator] = None,
        ls: bool = False,
        ls_rcond: float = 1e-13,
    ):
        self.lhs = lhs
        self.rhs = rhs
        self.output_functional = output_functional
        self.error_estimator = error_estimator
        self.ls = ls
        self.ls_rcond = float(ls_rcond)

    def tree_flatten(self):
        return (self.lhs, self.rhs, self.output_functional, self.error_estimator), (
            self.ls,
            self.ls_rcond,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = object.__new__(cls)
        obj.lhs, obj.rhs, obj.output_functional, obj.error_estimator = children
        obj.ls, obj.ls_rcond = aux
        return obj

    @property
    def dim(self) -> int:
        return self.lhs.source_dim

    # -- online stage (pure functions of mu) ----------------------------------
    def solve(self, mu: Mu) -> jax.Array:
        A = self.lhs.assemble(mu)
        b = self.rhs.assemble_vec(mu)
        if self.ls:
            # least squares via economic SVD (stable under jit)
            U, s, Vh = jnp.linalg.svd(A, full_matrices=False)
            cutoff = jnp.maximum(
                jnp.asarray(self.ls_rcond, s.dtype),
                100 * jnp.finfo(s.dtype).eps,
            ) * jnp.max(s)  # dtype-aware: 1e-13 is below f32 noise
            s_inv = jnp.where(s > cutoff, 1.0 / s, 0.0)
            return Vh.conj().T @ (s_inv * (U.conj().T @ b))
        return jnp.linalg.solve(A, b)

    def solve_batch(self, mus_batched: Mu) -> jax.Array:
        """vmap over a batched Mu (leaves have a leading batch axis)."""
        return jax.vmap(self.solve)(mus_batched)

    def output(self, u, mu: Mu) -> jax.Array:
        assert self.output_functional is not None
        return self.output_functional.apply(u, mu)

    def estimate_error(self, mu: Mu, u=None) -> jax.Array:
        assert self.error_estimator is not None
        if u is None:
            u = self.solve(mu)
        return self.error_estimator.estimate_error(u, mu)

    def solve_and_estimate_batch(self, mus_batched: Mu):
        def one(mu):
            u = self.solve(mu)
            return u, self.error_estimator.estimate_error(u, mu)

        return jax.vmap(one)(mus_batched)


jax.tree_util.register_pytree_node(
    StationaryROM,
    lambda x: x.tree_flatten(),
    StationaryROM.tree_unflatten,
)
