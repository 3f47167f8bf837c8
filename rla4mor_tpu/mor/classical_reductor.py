"""Classical (unsketched) reduced-basis reductor.

The baseline the sketched method is measured against (BASELINE.md:
"sketched-RB greedy wall-clock: beat pyMOR reference loop"). Standard
Galerkin RB with the exact affine residual-norm error estimator: offline,
Riesz representatives of all residual terms are computed and their Gram
matrix assembled, so the online estimator is

    ||r(u, mu)||_{R^-1}^2 = z(mu, u)^H G z(mu, u),

with z the affine coefficient vector — the classical offline/online
decomposition (what pyMOR's ``ResidualReductor`` with
``riesz_representatives=True`` does for the reference's empty-basis path,
reference mor/sketched_reductor.py:189-208). Online solve + estimate are
jittable/vmappable like the sketched ROM.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from rla4mor_tpu.core.affine import materialize, project
from rla4mor_tpu.core.orthonormalize import gram_schmidt
from rla4mor_tpu.core.parameters import Mu, eval_coefficients
from rla4mor_tpu.core.products import Product
from rla4mor_tpu.models.stationary import StationaryFOM, StationaryROM
from rla4mor_tpu.utils.logger import get_logger


class GramResidualEstimator:
    """Exact Riesz residual norm from the precomputed Gram matrix (pytree).

    Residual terms: columns [A_j U | -b_l]; coefficient vector at (mu, u):
    z = [theta_j(mu) u ; theta_b_l(mu)].
    """

    def __init__(self, gram: jax.Array, op_coeffs, rhs_coeffs, r: int):
        self.gram = gram  # ((T*r + Tb), (T*r + Tb))
        self.op_coeffs = tuple(op_coeffs)
        self.rhs_coeffs = tuple(rhs_coeffs)
        self.r = r

    def tree_flatten(self):
        return (self.gram,), (self.op_coeffs, self.rhs_coeffs, self.r)

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = object.__new__(cls)
        (obj.gram,) = children
        obj.op_coeffs, obj.rhs_coeffs, obj.r = aux
        return obj

    def _z(self, u, mu):
        th_op = eval_coefficients(self.op_coeffs, mu).astype(self.gram.dtype)
        th_rhs = eval_coefficients(self.rhs_coeffs, mu).astype(self.gram.dtype)
        return jnp.concatenate(
            [(th_op[:, None] * u[None, :]).reshape(-1), -th_rhs]
        )

    def estimate_error(self, u, mu: Mu) -> jax.Array:
        if jnp.asarray(u).ndim > 1:
            return jax.vmap(self.estimate_error, in_axes=(1, None))(u, mu)
        z = self._z(jnp.asarray(u), mu)
        val = jnp.real(z.conj() @ (self.gram @ z))
        return jnp.sqrt(jnp.maximum(val, 0.0))


jax.tree_util.register_pytree_node(
    GramResidualEstimator,
    lambda x: x.tree_flatten(),
    GramResidualEstimator.tree_unflatten,
)


class ClassicalReductor:
    """Galerkin RB with exact residual estimator (the unsketched baseline)."""

    def __init__(
        self,
        fom: StationaryFOM,
        product: Optional[Product] = None,
        orthonormalize: bool = True,
        log_level: int = 20,
    ):
        self.fom = fom
        n = fom.solution_dim
        self.product = product if product is not None else Product.identity(n)
        self.orthonormalize = orthonormalize
        self.logger = get_logger("mor.classical", log_level)
        self.rb = jnp.zeros((n, 0))
        self.mu_basis: list = []

    @property
    def basis_size(self) -> int:
        return self.rb.shape[1]

    def extend_basis(self, U, mu=None) -> None:
        U = jnp.asarray(U)
        if U.ndim == 1:
            U = U[:, None]
        if mu is not None:
            self.mu_basis.extend([mu] * U.shape[1])
        rb = jnp.concatenate([self.rb.astype(U.dtype), U], axis=1)
        if self.orthonormalize:
            rb = gram_schmidt(rb, product=self.product,
                              offset=self.basis_size)
        self.rb = rb

    def reduce(self, **_ignored) -> StationaryROM:
        """Project the FOM and assemble the exact residual estimator.

        Note: unlike the sketched reductor, the offline cost here is
        O(T r + Tb) FOM-side R^-1 solves plus their O((Tr)^2) inner
        products — this quadratic-in-terms Gram assembly is exactly what
        sketching avoids.
        """
        U = self.rb
        r = self.basis_size
        lhs = project(self.fom.operator, U, U, product=None)
        rhs = project(self.fom.rhs, U, None)
        output = None
        if self.fom.output_functional is not None:
            output = project(self.fom.output_functional, None, U)

        # residual columns [A_j U | b_l], Riesz-lifted, Gram matrix
        self.logger.info("assembling residual Gram matrix")
        cols = []
        for term in self.fom.operator.terms:
            cols.append(jnp.asarray(term.apply(U)))
        rhs_mat = materialize(self.fom.rhs)
        for t in range(rhs_mat.n_terms):
            cols.append(rhs_mat.stack[t])
        C = jnp.concatenate(cols, axis=1)
        Riesz = jnp.asarray(self.product.inv.apply(C))
        gram = C.conj().T @ Riesz
        gram = 0.5 * (gram + gram.conj().T)

        estimator = GramResidualEstimator(
            gram,
            self.fom.operator.coefficients,
            rhs_mat.coefficients,
            r,
        )
        return StationaryROM(lhs, rhs, output_functional=output,
                             error_estimator=estimator)

    def reconstruct(self, u_reduced) -> jax.Array:
        return self.rb @ jnp.asarray(u_reduced)
