"""Inner products with square-root factors and implicit inverses.

Rebuild of the reference's factorization layer (utilities/factorization.py):
an SPD ``product`` operator R, its implicit inverse R^-1, and a square root
Q with Q^H Q = R (the reference gets Q from SuperLU/CHOLMOD,
factorization.py:24-52,142-247). On the TPU path Q is either a dense
Cholesky factor (moderate n) or host-sparse (offline); matrix-free CG
inverses cover very large n (see core/solvers.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sps

from rla4mor_tpu.core.linops import (
    DenseOp,
    HostLUInverse,
    HostSparseOp,
    IdentityOp,
    LinOp,
    SparseCholeskyOp,
    sparse_cholesky,
)


class Product:
    """Bundle (R, R^-1, Q) for an SPD inner product R = Q^H Q."""

    def __init__(self, op: LinOp, inv: LinOp, sqrt: LinOp):
        self.op = op
        self.inv = inv
        self.sqrt = sqrt
        self.dim = op.source_dim

    # constructors -----------------------------------------------------------
    @classmethod
    def identity(cls, dim: int) -> "Product":
        eye = IdentityOp(dim)
        return cls(eye, eye, eye)

    @classmethod
    def from_sparse(cls, S) -> "Product":
        """SPD scipy sparse matrix: SuperLU inverse + LU->Cholesky sqrt.

        The sqrt is a :class:`SparseCholeskyOp`, so ``sqrt.apply_inverse``
        / ``apply_inverse_adjoint`` are TRIANGULAR solves (the reference's
        CholmodOperator solve_L/solve_Lt paths,
        utilities/factorization.py:221-247)."""
        S = sps.csc_matrix(S)
        return cls(
            HostSparseOp(S),
            HostLUInverse(S, symmetric=True),
            SparseCholeskyOp(S),
        )

    @classmethod
    def from_dense(cls, A) -> "Product":
        """SPD dense matrix (device): Cholesky sqrt, explicit inverse."""
        A = jnp.asarray(A)
        L = jnp.linalg.cholesky(A)  # A = L L^H
        return cls(
            DenseOp(A),
            DenseOp(jnp.linalg.inv(A)),
            DenseOp(L.conj().T),  # Q = L^H, Q^H Q = A
        )

    # inner products -----------------------------------------------------------
    def inner(self, U, V=None):
        """U^H R V (V defaults to U).

        HIGHEST precision: inner products seed gramians/cross-gramians
        that the estim stack solves against — the TPU default (f32
        truncated to bf16) put a ~2e-3 error into DicRecoveryMap's
        cross-gramian, the exact on-chip failure the round-3 device-estim
        test caught."""
        V = U if V is None else V
        return jnp.matmul(
            jnp.asarray(U).conj().T, jnp.asarray(self.op.apply(V)),
            precision=jax.lax.Precision.HIGHEST,
        )

    def norm(self, U):
        """Column-wise R-norms of U (n, b) -> (b,)."""
        U = jnp.asarray(U)
        single = U.ndim == 1
        Um = U[:, None] if single else U
        sq = jnp.real(jnp.sum(Um.conj() * jnp.asarray(self.op.apply(Um)), axis=0))
        out = jnp.sqrt(jnp.maximum(sq, 0.0))
        return out[0] if single else out

    def riesz(self, F):
        """Riesz representatives R^-1 F."""
        return self.inv.apply(F)
