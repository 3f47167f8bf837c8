"""Preconditioned Galerkin ROM assembly.

Rebuild of reference ``PreconditionedRom`` (preconditioners/
preconditioned_rom.py:20-233). The ROM approximates A(mu)^-1 by
P(mu_p) = sum_i y_i P_i (y = mu_p['precond']) and solves the preconditioned
Galerkin system

    U^H R P(y) A(mu) U  u  =  U^H R P(y) b(mu),

with a sketched-residual error estimator  || Theta_res P(y) (A(mu) U u -
b(mu)) ||.

Two assembly modes, matching the reference:

* **naive** (reference ``_add_preconditioner`` :37-123): expand the product
  into p*T affine terms with coefficients y_i * theta_j. Flagged
  "numerically unstable / many terms" by the reference.
* **stable** (reference ``_add_preconditioner_stable`` :126-208): factor
  through R-orthonormal intermediate image bases V with span{R^-1 A_j U} —
  the ROM operator is a *product of two affine factors*
  (sum_i y_i U^H R P_i R V) @ (sum_j theta_j V^H A_j U), i.e. p + T terms.
  Here this is a first-class :class:`FactoredROM` pytree instead of the
  reference's ConcatenationOperator-of-LincombOperators.

Unlike the reference, adding a direction never rewrites existing coefficient
objects (pyMOR ProjectionParameterFunctionals carry a ``size`` that must be
patched, reference :83-105); our ProjectionCoefficient reads
``mu['precond'][i]`` whose length is carried by the parameter value itself.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from rla4mor_tpu.core.affine import AffineDense, materialize, project
from rla4mor_tpu.core.linops import LinOp
from rla4mor_tpu.core.parameters import (
    Mu,
    ProjectionCoefficient,
    eval_coefficients,
)
from rla4mor_tpu.core.products import Product
from rla4mor_tpu.models.stationary import (
    ResidualErrorEstimator,
    StationaryFOM,
    StationaryROM,
)
from rla4mor_tpu.ops.embeddings import Embedding
from rla4mor_tpu.utils.logger import get_logger


class FactoredResidualEstimator:
    """|| L(mu) Rf(mu) u - Lb(mu) Rb(mu) ||_2 with affine factors (pytree)."""

    def __init__(self, lhs_left: AffineDense, lhs_right: AffineDense,
                 rhs_left: AffineDense, rhs_right: AffineDense):
        self.lhs_left = lhs_left      # (p, k, d1)
        self.lhs_right = lhs_right    # (T, d1, r)
        self.rhs_left = rhs_left      # (p, k, d2)
        self.rhs_right = rhs_right    # (Tb, d2, 1)

    def tree_flatten(self):
        return (self.lhs_left, self.lhs_right, self.rhs_left, self.rhs_right), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = object.__new__(cls)
        (obj.lhs_left, obj.lhs_right, obj.rhs_left, obj.rhs_right) = children
        return obj

    def estimate_error(self, u, mu: Mu) -> jax.Array:
        r = self.lhs_left.assemble(mu) @ (self.lhs_right.assemble(mu) @ u)
        b = self.rhs_left.assemble(mu) @ self.rhs_right.assemble_vec(mu)
        if jnp.asarray(u).ndim == 1:
            return jnp.linalg.norm(r - b)
        return jnp.linalg.norm(r - b[:, None], axis=0)


jax.tree_util.register_pytree_node(
    FactoredResidualEstimator,
    lambda x: x.tree_flatten(),
    FactoredResidualEstimator.tree_unflatten,
)


class FactoredROM:
    """ROM whose lhs/rhs are products of two affine factors (stable mode)."""

    def __init__(self, lhs_left, lhs_right, rhs_left, rhs_right,
                 output_functional=None, error_estimator=None):
        self.lhs_left = lhs_left      # (p, r, d1), coeffs y_i
        self.lhs_right = lhs_right    # (T, d1, r), coeffs theta_j
        self.rhs_left = rhs_left      # (p, r, d2)
        self.rhs_right = rhs_right    # (Tb, d2, 1)
        self.output_functional = output_functional
        self.error_estimator = error_estimator

    def tree_flatten(self):
        return (
            self.lhs_left, self.lhs_right, self.rhs_left, self.rhs_right,
            self.output_functional, self.error_estimator,
        ), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = object.__new__(cls)
        (obj.lhs_left, obj.lhs_right, obj.rhs_left, obj.rhs_right,
         obj.output_functional, obj.error_estimator) = children
        return obj

    @property
    def dim(self):
        return self.lhs_right.source_dim

    def assemble(self, mu: Mu):
        A = self.lhs_left.assemble(mu) @ self.lhs_right.assemble(mu)
        b = self.rhs_left.assemble(mu) @ self.rhs_right.assemble_vec(mu)
        return A, b

    def solve(self, mu: Mu) -> jax.Array:
        A, b = self.assemble(mu)
        return jnp.linalg.solve(A, b)

    def solve_batch(self, mus_batched: Mu) -> jax.Array:
        return jax.vmap(self.solve)(mus_batched)

    def estimate_error(self, mu: Mu, u=None) -> jax.Array:
        if u is None:
            u = self.solve(mu)
        return self.error_estimator.estimate_error(u, mu)


jax.tree_util.register_pytree_node(
    FactoredROM,
    lambda x: x.tree_flatten(),
    FactoredROM.tree_unflatten,
)


class PreconditionedRom:
    """Incrementally assembles the preconditioned Galerkin ROM."""

    def __init__(
        self,
        fom: StationaryFOM,
        reduced_basis,
        residual_embedding: Embedding,
        intermediate_bases: Optional[dict] = None,
        product: Optional[Product] = None,
        stable_galerkin: bool = True,
        log_level: int = 20,
    ):
        self.fom = fom
        self.reduced_basis = jnp.asarray(reduced_basis)
        self.residual_embedding = residual_embedding
        self.intermediate_bases = intermediate_bases
        self.product = (
            product if product is not None else Product.identity(fom.solution_dim)
        )
        self.stable_galerkin = stable_galerkin and intermediate_bases is not None
        self.logger = get_logger("precond.rom", log_level)
        self.mu_added: list = []
        self.rom = None

        # precompute reusable arrays
        self._RU = jnp.asarray(self.product.op.apply(self.reduced_basis))
        # Theta_res^H columns (n, k): rows of the residual embedding
        self._res_cols = jnp.asarray(residual_embedding.source_array())
        if self.stable_galerkin:
            V1 = jnp.asarray(intermediate_bases["lhs"])
            V2 = jnp.asarray(intermediate_bases["rhs"])
            self._RV1 = jnp.asarray(self.product.op.apply(V1))
            self._RV2 = jnp.asarray(self.product.op.apply(V2))
            # fixed right factors: V^H A_j U and V^H b_l
            self._right_lhs = project(fom.operator, V1, self.reduced_basis)
            self._right_rhs = project(fom.rhs, V2, None)
        # naive-mode accumulators
        self._gal_lhs: Optional[AffineDense] = None
        self._gal_rhs: Optional[AffineDense] = None
        self._res_lhs: Optional[AffineDense] = None
        self._res_rhs: Optional[AffineDense] = None
        # stable-mode accumulators: left factors, one term per direction
        self._left_gal_lhs = None  # (p, r, d1)
        self._left_gal_rhs = None  # (p, r, d2)
        self._left_res_lhs = None  # (p, k, d1)
        self._left_res_rhs = None  # (p, k, d2)

    # ------------------------------------------------------------------ naive
    def _add_preconditioner_naive(self, P: LinOp):
        """p*T-term expansion (reference preconditioned_rom.py:37-123)."""
        i = len(self.mu_added)
        y_i = ProjectionCoefficient("precond", i)
        U = self.reduced_basis

        # C = P^H R U  ->  U^H R P A_j U = C^H (A_j U)
        C = jnp.asarray(P.apply_adjoint(self._RU))
        op_gal_lhs = project(self.fom.operator, C, U).scale(y_i)
        op_gal_rhs = materialize(project(self.fom.rhs, C, None)).scale(y_i)

        # D = P^H Theta_res^H  ->  Theta_res P A_j U = D^H (A_j U)
        D = jnp.asarray(P.apply_adjoint(self._res_cols))
        op_res_lhs = project(self.fom.operator, D, U).scale(y_i)
        op_res_rhs = materialize(project(self.fom.rhs, D, None)).scale(y_i)

        if self._gal_lhs is None:
            self._gal_lhs, self._gal_rhs = op_gal_lhs, op_gal_rhs
            self._res_lhs, self._res_rhs = op_res_lhs, op_res_rhs
        else:
            self._gal_lhs = self._gal_lhs.add(op_gal_lhs)
            self._gal_rhs = self._gal_rhs.add(op_gal_rhs)
            self._res_lhs = self._res_lhs.add(op_res_lhs)
            self._res_rhs = self._res_rhs.add(op_res_rhs)

        output = None
        if self.fom.output_functional is not None:
            output = project(self.fom.output_functional, None, U)
        return StationaryROM(
            self._gal_lhs,
            self._gal_rhs,
            output_functional=output,
            error_estimator=ResidualErrorEstimator(self._res_lhs, self._res_rhs),
        )

    # ------------------------------------------------------------------ stable
    def _add_preconditioner_stable(self, P: LinOp):
        """p+T-term factored form (reference preconditioned_rom.py:126-208)."""
        i = len(self.mu_added)
        y_i = ProjectionCoefficient("precond", i)
        U = self.reduced_basis

        C = jnp.asarray(P.apply_adjoint(self._RU))      # (n, r)
        D = jnp.asarray(P.apply_adjoint(self._res_cols))  # (n, k)

        # left-factor blocks for direction i
        gal_lhs_i = C.conj().T @ self._RV1   # U^H R P R V1  (r, d1)
        gal_rhs_i = C.conj().T @ self._RV2   # (r, d2)
        res_lhs_i = D.conj().T @ self._RV1   # Theta P R V1  (k, d1)
        res_rhs_i = D.conj().T @ self._RV2   # (k, d2)

        def extend(acc, block):
            blk = AffineDense(block[None], (y_i,))
            return blk if acc is None else acc.add(blk)

        self._left_gal_lhs = extend(self._left_gal_lhs, gal_lhs_i)
        self._left_gal_rhs = extend(self._left_gal_rhs, gal_rhs_i)
        self._left_res_lhs = extend(self._left_res_lhs, res_lhs_i)
        self._left_res_rhs = extend(self._left_res_rhs, res_rhs_i)

        output = None
        if self.fom.output_functional is not None:
            output = project(self.fom.output_functional, None, U)
        estimator = FactoredResidualEstimator(
            self._left_res_lhs, self._right_lhs,
            self._left_res_rhs, self._right_rhs,
        )
        return FactoredROM(
            self._left_gal_lhs, self._right_lhs,
            self._left_gal_rhs, self._right_rhs,
            output_functional=output, error_estimator=estimator,
        )

    def add_preconditioner(self, P: LinOp, mu: Optional[Mu] = None) -> None:
        self.logger.info("adding preconditioner direction %d", len(self.mu_added))
        if self.stable_galerkin:
            rom = self._add_preconditioner_stable(P)
        else:
            rom = self._add_preconditioner_naive(P)
        self.mu_added.append(mu)
        self.rom = rom
