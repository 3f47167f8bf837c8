"""Linear operators.

Minimal JAX-native substitute for the pyMOR ``Operator`` algebra the
reference extends (reference layer L1, see e.g. utilities/factorization.py,
utilities/other_operators.py). Vectors are columns: a batch of ``b`` vectors
of dimension ``n`` is an ``(n, b)`` array (or ``(n,)`` for a single vector).

Two worlds coexist:

* **device ops** (``DenseOp``, ``DiagonalOp``, chains thereof) hold jnp
  arrays and are jit-compatible;
* **host ops** (``HostSparseOp``, ``HostLUInverse``, ...) wrap scipy sparse
  matrices / factorizations and run on CPU in the *offline* phase only —
  the TPU-side analog of the reference's SuperLU/UMFPACK/CHOLMOD wrappers
  (reference utilities/factorization.py:84,142,249). Everything downstream
  of sketching is small and dense, hence device-resident.
"""

from __future__ import annotations

import inspect
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sps
import scipy.sparse.linalg as spla


def _as_2d(U):
    U = jnp.asarray(U) if not isinstance(U, np.ndarray) else U
    return (U.reshape(-1, 1), True) if U.ndim == 1 else (U, False)


class LinOp:
    """Abstract linear operator: y = A x with x (source_dim, b)."""

    source_dim: int
    range_dim: int

    def apply(self, U, mu=None):
        raise NotImplementedError

    def apply_adjoint(self, V, mu=None):
        raise NotImplementedError

    @property
    def H(self) -> "LinOp":
        return AdjointOp(self)

    def matrix(self):
        """Dense matrix of the operator (small ops only)."""
        eye = jnp.eye(self.source_dim)
        return jnp.asarray(self.apply(eye))

    def __matmul__(self, other: "LinOp") -> "LinOp":
        return ChainOp((self, other))

    @property
    def linear(self):
        return True


class IdentityOp(LinOp):
    def __init__(self, dim: int):
        self.source_dim = self.range_dim = dim

    def apply(self, U, mu=None):
        return U

    def apply_adjoint(self, V, mu=None):
        return V

    @property
    def H(self):
        return self

    def matrix(self):
        return jnp.eye(self.source_dim)


class DenseOp(LinOp):
    """Dense (device) matrix operator."""

    def __init__(self, A):
        self.A = jnp.asarray(A)
        assert self.A.ndim == 2
        self.range_dim, self.source_dim = self.A.shape

    def apply(self, U, mu=None):
        return self.A @ jnp.asarray(U)

    def apply_adjoint(self, V, mu=None):
        return self.A.conj().T @ jnp.asarray(V)

    @property
    def H(self):
        return DenseOp(self.A.conj().T)

    def matrix(self):
        return self.A


class DiagonalOp(LinOp):
    def __init__(self, d):
        self.d = jnp.asarray(d)
        self.source_dim = self.range_dim = self.d.shape[0]

    def apply(self, U, mu=None):
        U, single = _as_2d(U)
        out = self.d[:, None] * U
        return out[:, 0] if single else out

    def apply_adjoint(self, V, mu=None):
        V, single = _as_2d(V)
        out = self.d.conj()[:, None] * V
        return out[:, 0] if single else out

    def matrix(self):
        return jnp.diag(self.d)


class AdjointOp(LinOp):
    def __init__(self, op: LinOp):
        self.op = op
        self.source_dim = op.range_dim
        self.range_dim = op.source_dim

    def apply(self, U, mu=None):
        return self.op.apply_adjoint(U, mu)

    def apply_adjoint(self, V, mu=None):
        return self.op.apply(V, mu)

    @property
    def H(self):
        return self.op

    def matrix(self):
        return jnp.asarray(self.op.matrix()).conj().T


class ChainOp(LinOp):
    """Composition ``ops[0] @ ops[1] @ ... @ ops[-1]`` (applied right-first).

    Replaces pyMOR ``ConcatenationOperator`` chains like
    ``embedding @ inverse_product @ fom.operator`` (reference
    mor/sketched_reductor.py:69). Kept lazy: applying to a basis evaluates
    right-to-left, which is exactly the "corrected" projection rule the
    reference monkey-patches into pyMOR (utilities/__init__.py:17-42).
    """

    def __init__(self, ops: Sequence[LinOp]):
        flat = []
        for op in ops:
            if isinstance(op, ChainOp):
                flat.extend(op.ops)
            else:
                flat.append(op)
        self.ops = tuple(flat)
        for a, b in zip(self.ops[:-1], self.ops[1:]):
            assert a.source_dim == b.range_dim, (a.source_dim, b.range_dim)
        self.source_dim = self.ops[-1].source_dim
        self.range_dim = self.ops[0].range_dim

    def apply(self, U, mu=None):
        for op in reversed(self.ops):
            U = op.apply(U, mu)
        return U

    def apply_adjoint(self, V, mu=None):
        for op in self.ops:
            V = op.apply_adjoint(V, mu)
        return V

    @property
    def H(self):
        return ChainOp(tuple(op.H for op in reversed(self.ops)))


class ScaledOp(LinOp):
    def __init__(self, op: LinOp, alpha: float):
        self.op, self.alpha = op, alpha
        self.source_dim, self.range_dim = op.source_dim, op.range_dim

    def apply(self, U, mu=None):
        return self.alpha * self.op.apply(U, mu)

    def apply_adjoint(self, V, mu=None):
        return np.conj(self.alpha) * self.op.apply_adjoint(V, mu)

    def matrix(self):
        return self.alpha * self.op.matrix()


class CastInputOp(LinOp):
    """Apply ``op`` to ``x.astype(in_dtype)`` and emit ``out_dtype``.

    The TPU bf16 offline mode: wrapping an embedding as
    ``CastInputOp(S, bfloat16, float32)`` halves the HBM bytes the sketch
    reads (the hot cost of the offline stage, PERF.md "Known gaps" #4)
    while the MXU still accumulates in f32 (kernels use
    ``preferred_element_type``). Complex inputs are left untouched when
    ``in_dtype`` is real (casting would drop the imaginary part)."""

    def __init__(self, op: LinOp, in_dtype, out_dtype=None):
        self.op = op
        self.in_dtype = jnp.dtype(in_dtype)
        self.out_dtype = (
            jnp.dtype(out_dtype) if out_dtype is not None
            else jnp.promote_types(self.in_dtype, jnp.float32)
        )
        self.source_dim, self.range_dim = op.source_dim, op.range_dim

    def _cast_in(self, U):
        U = jnp.asarray(U)
        if jnp.iscomplexobj(U) and not jnp.issubdtype(
            self.in_dtype, jnp.complexfloating
        ):
            return U
        return U.astype(self.in_dtype)

    def apply(self, U, mu=None):
        op = self.op
        if hasattr(op, "apply_random") and hasattr(op, "_apply_q"):
            # Embedding: the product-sqrt factor is often a HOST sparse op
            # (scipy cannot take bf16, and host bytes are not the
            # bottleneck) — cast only the input of the device random
            # sketch, which is where the HBM read happens. Embeddings
            # whose apply_random takes out_dtype (SRHT kernels) emit the
            # f32 accumulator directly — the astype below is then a no-op
            # instead of a re-promotion of an already-rounded bf16 result
            # (round-3 review finding).
            x = op._apply_q(jnp.asarray(U))
            if "out_dtype" in inspect.signature(
                type(op).apply_random
            ).parameters:
                out = op.apply_random(self._cast_in(x),
                                      out_dtype=self.out_dtype)
            else:
                out = op.apply_random(self._cast_in(x))
        else:
            out = op.apply(self._cast_in(U), mu)
        return jnp.asarray(out).astype(
            jnp.promote_types(self.out_dtype, jnp.asarray(out).dtype)
            if jnp.iscomplexobj(jnp.asarray(out)) else self.out_dtype
        )

    def apply_adjoint(self, V, mu=None):
        out = self.op.apply_adjoint(self._cast_in(V), mu)
        return jnp.asarray(out).astype(
            jnp.promote_types(self.out_dtype, jnp.asarray(out).dtype)
            if jnp.iscomplexobj(jnp.asarray(out)) else self.out_dtype
        )


class ZeroOp(LinOp):
    def __init__(self, range_dim: int, source_dim: int):
        self.range_dim, self.source_dim = range_dim, source_dim

    def apply(self, U, mu=None):
        U, single = _as_2d(U)
        out = jnp.zeros((self.range_dim, U.shape[1]), dtype=jnp.asarray(U).dtype)
        return out[:, 0] if single else out

    def apply_adjoint(self, V, mu=None):
        V, single = _as_2d(V)
        out = jnp.zeros((self.source_dim, V.shape[1]), dtype=jnp.asarray(V).dtype)
        return out[:, 0] if single else out

    def matrix(self):
        return jnp.zeros((self.range_dim, self.source_dim))


# ---------------------------------------------------------------------------
# Host (CPU / scipy) operators — offline FOM-side only
# ---------------------------------------------------------------------------


class HostSparseOp(LinOp):
    """scipy sparse matrix as a LinOp (host execution, f64)."""

    def __init__(self, S):
        self.S = sps.csr_matrix(S)
        self.range_dim, self.source_dim = self.S.shape

    def apply(self, U, mu=None):
        U = np.asarray(U)
        return jnp.asarray(self.S @ U)

    def apply_adjoint(self, V, mu=None):
        V = np.asarray(V)
        return jnp.asarray(self.S.conj().T @ V)

    def matrix(self):
        return jnp.asarray(self.S.toarray())


class HostLUInverse(LinOp):
    """Implicit inverse of a sparse matrix via SuperLU factorization.

    TPU-native rebuild of the reference's ``InverseLuOperator``
    (utilities/factorization.py:84-138): ``apply`` solves, ``apply_inverse``
    multiplies by the original matrix. Factorization happens once on host;
    these operators appear only in offline sketches (the results are small
    and move to device).
    """

    def __init__(self, S, symmetric: bool = False, **splu_kwargs):
        S = sps.csc_matrix(S)
        if symmetric:
            self.factorization = spla.splu(
                S,
                permc_spec="MMD_AT_PLUS_A",
                diag_pivot_thresh=0,
                options={"SymmetricMode": True},
            )
        else:
            self.factorization = spla.splu(S, **splu_kwargs)
        self.operator = HostSparseOp(S)
        self.source_dim = self.range_dim = S.shape[0]

    def _solve(self, U, trans="N"):
        """SuperLU solve; a REAL factorization solves complex right-hand
        sides by real-linearity (scipy refuses the complex->f64 cast —
        the Riesz lift of complex residuals, e.g. Helmholtz, hits this)."""
        if np.iscomplexobj(U) and not np.iscomplexobj(self.factorization.U):
            return (self.factorization.solve(np.ascontiguousarray(U.real),
                                             trans=trans)
                    + 1j * self.factorization.solve(
                        np.ascontiguousarray(U.imag), trans=trans))
        return self.factorization.solve(U, trans=trans)

    def apply(self, U, mu=None):
        U = np.asarray(U)
        return jnp.asarray(self._solve(U))

    def apply_adjoint(self, V, mu=None):
        V = np.asarray(V)
        return jnp.asarray(self._solve(V, trans="H"))

    def apply_inverse(self, U, mu=None):
        return self.operator.apply(U)


class SparseCholeskyOp(LinOp):
    """Sparse Cholesky square-root operator with TRIANGULAR solve paths.

    Parity with the reference's ``CholmodOperator``
    (utilities/factorization.py:142-247): the operator is Q = G^H P with
    G = L D^{1/2} lower-triangular from the symmetric-mode SuperLU
    factorization P^T (L D L^T) P^... = S (so Q^H Q = S), and

    * ``apply(u)          = G^T (P u)``        (ref ``_apply_real``)
    * ``apply_adjoint(v)  = P^T (G v)``        (ref ``_apply_adjoint_real``)
    * ``apply_inverse(v)  = P^T solve_Lt(v)``  (ref ``_apply_inverse_real``)
    * ``apply_inverse_adjoint(u) = solve_L(P u)`` (ref ``:246``)

    where solve_L/solve_Lt are sparse triangular solves (CHOLMOD's
    ``factor.solve_L/solve_Lt`` replaced by scipy
    ``spsolve_triangular`` on the SuperLU-derived factor — sksparse is
    not available in this environment, the factorization trick is the
    reference's own, utilities/factorization.py:24-52).
    """

    def __init__(self, S):
        S = sps.csc_matrix(S)
        factor = spla.splu(
            S,
            permc_spec="MMD_AT_PLUS_A",
            diag_pivot_thresh=0,
            options={"SymmetricMode": True},
        )
        n = S.shape[0]
        dsq = np.sqrt(factor.U.diagonal())
        self._G = sps.csr_matrix(factor.L @ sps.diags(dsq))   # lower
        self._GT = sps.csr_matrix(self._G.T)                   # upper
        self._perm = factor.perm_r  # row permutation: (P u) = u[perm]
        self.source_dim = self.range_dim = n

    def _scatter(self, U):  # P u  with P[perm[j], j] = 1
        out = np.empty_like(U)
        out[self._perm] = U
        return out

    def _gather(self, V):  # P^T v = P^{-1} v
        return V[self._perm]

    def apply(self, U, mu=None):
        U = np.asarray(U)
        return jnp.asarray(self._GT @ self._scatter(U))

    def apply_adjoint(self, V, mu=None):
        V = np.asarray(V)
        return jnp.asarray(self._gather(self._G @ V))

    def apply_inverse(self, V, mu=None):
        """x with Q x = v: solve G^T y = v (upper), x = P^T y."""
        V = np.asarray(V)
        y = spla.spsolve_triangular(self._GT, V, lower=False)
        return jnp.asarray(self._gather(y))

    def apply_inverse_adjoint(self, U, mu=None):
        """x with Q^H x = u: solve G x = P u (lower)."""
        U = np.asarray(U)
        return jnp.asarray(
            spla.spsolve_triangular(self._G, self._scatter(U), lower=True)
        )

    def sparse_matrix(self) -> sps.csc_matrix:
        """Explicit sparse Q (reference ``get_matrix``,
        factorization.py:245-247)."""
        n = self.source_dim
        P = sps.csc_matrix(
            (np.ones(n), (self._perm, np.arange(n))), shape=(n, n)
        )
        return sps.csc_matrix(self._GT @ P)

    def matrix(self) -> jax.Array:
        """Dense Q — the LinOp.matrix() contract is a dense jnp array
        (materialize/assemble_dense call jnp.asarray on it; returning the
        scipy matrix here crashed every generic affine path over a
        sparse sqrt factor — round-2 review finding). Use
        :meth:`sparse_matrix` for the sparse form."""
        return jnp.asarray(self.sparse_matrix().toarray())


def sparse_cholesky(S) -> sps.csc_matrix:
    """Sparse Cholesky-like factor Q with ``Q^H Q = S`` for SPD sparse S.

    Same LU->Cholesky construction as the reference (utilities/
    factorization.py:24-52): symmetric-mode SuperLU gives ``S = P^T L U``
    with ``U = D L^T P`` up to scaling, so ``Q = (P^T L D^{1/2})^H``.
    """
    S = sps.csc_matrix(S)
    factor = spla.splu(
        S,
        permc_spec="MMD_AT_PLUS_A",
        diag_pivot_thresh=0,
        options={"SymmetricMode": True},
    )
    n = S.shape[0]
    P = sps.csc_matrix(
        (np.ones(n), (factor.perm_r, np.arange(n))), shape=(n, n)
    )
    D = sps.diags(np.sqrt(factor.U.diagonal()))
    Q = (P.T @ factor.L @ D).conj().T
    return sps.csc_matrix(Q)


class CGInverseOp(LinOp):
    """Implicit inverse of an SPD matrix-free operator via device CG.

    The TPU-native replacement for stored sparse factorizations as
    preconditioner directions P_i = A(mu_i)^-1 (reference builds
    ``InverseOperator``/``InverseLuOperator`` over SuperLU,
    preconditioners/tests.py:374-378, utilities/factorization.py:84): a
    ``matvec`` closure (e.g. a stencil apply) + Jacobi preconditioning,
    jittable and vmapped over right-hand-side columns.
    """

    def __init__(self, matvec, dim: int, precond=None, tol: float = 1e-10,
                 maxiter: int = 1000):
        self.matvec = matvec
        self.precond = precond
        self.tol = tol
        self.maxiter = maxiter
        self.source_dim = self.range_dim = dim
        # jit once per instance: eager cg() builds fresh cond/body closures
        # per call, so every apply would re-trace + recompile the loop
        from rla4mor_tpu.core.solvers import cg

        self._solve_fn = jax.jit(lambda b: cg(
            self.matvec, b, precond=self.precond, tol=self.tol,
            maxiter=self.maxiter
        ).x)

    def _solve_one(self, b):
        return self._solve_fn(b)

    def apply(self, U, mu=None):
        U = jnp.asarray(U)
        if U.ndim == 1:
            return self._solve_one(U)
        return jax.vmap(self._solve_one, in_axes=1, out_axes=1)(U)

    # SPD: the adjoint solve is the same solve
    apply_adjoint = apply

    def apply_inverse(self, U, mu=None):
        U = jnp.asarray(U)
        if U.ndim == 1:
            return self.matvec(U)
        return jax.vmap(self.matvec, in_axes=1, out_axes=1)(U)


class DeviceCholeskyInverse(LinOp):
    """Dense SPD inverse via a device Cholesky factor computed ONCE.

    TPU-native analog of the reference's *stored* sparse factorizations as
    preconditioner directions (``InverseLuOperator`` over SuperLU,
    utilities/factorization.py:84-138; used at preconditioners/
    tests.py:374-378): for moderate n the dense factor lives in HBM and
    every apply is two batched triangular solves on the device — the
    factorization is reused across all applies instead of re-solving from
    scratch (VERDICT r1 next #8, first option).
    """

    def __init__(self, A_dense):
        A = jnp.asarray(A_dense)
        assert A.ndim == 2 and A.shape[0] == A.shape[1]
        self.A = A
        self.chol = jax.scipy.linalg.cho_factor(A, lower=True)
        self.source_dim = self.range_dim = A.shape[0]

    def apply(self, U, mu=None):
        U = jnp.asarray(U)
        single = U.ndim == 1
        X = jax.scipy.linalg.cho_solve(self.chol, U[:, None] if single else U)
        return X[:, 0] if single else X

    # SPD: adjoint solve == solve
    apply_adjoint = apply

    def apply_inverse(self, U, mu=None):
        return self.A @ jnp.asarray(U)


class RecycledCGInverseOp(LinOp):
    """Device CG inverse with warm-start deflation from recycled solves.

    Keeps up to ``m_max`` A-orthonormal directions W (W^H A W = I) built
    from past solutions; each apply starts CG at the Galerkin projection
    x0 = W W^H b of the new right-hand side, so repeated or nearby
    right-hand sides converge in a few iterations instead of restarting
    cold (replaces the cold-CG-per-apply of :class:`CGInverseOp`; SURVEY
    §7 hard part 2, second half — the matrix-free analog of the
    reference's stored factorizations, utilities/factorization.py:84-138).

    The recycle update runs eagerly (ring-buffer state on the host side of
    the offline loop); the inner CG and the deflated start are fixed-shape
    jittable device code. ``last_iters`` exposes the most recent CG
    iteration count (observability / tests).
    """

    def __init__(self, matvec, dim: int, precond=None, tol: float = 1e-10,
                 maxiter: int = 1000, m_max: int = 16, dtype=None):
        self.matvec = matvec
        self.precond = precond
        self.tol = tol
        self.maxiter = maxiter
        self.m_max = m_max
        self.source_dim = self.range_dim = dim
        from rla4mor_tpu.utils.config import default_dtype

        self._W = jnp.zeros((dim, m_max), dtype or default_dtype())
        self._count = 0
        self.last_iters = 0

        # jit ONCE with W as an ARGUMENT: closing the eager helpers over
        # the concrete self._W made every apply re-trace (W became a jaxpr
        # constant that changes per recycle), recompiling the whole
        # CG(+preconditioner) program per column — a compile storm that
        # exhausted the LLVM JIT after ~100 columns (round-3 finding,
        # examples/preconditioned_large_demo.py). One compile per op
        # instance now.
        from rla4mor_tpu.core.solvers import cg

        @jax.jit
        def _solve(W, b):
            x0 = W @ (W.conj().T @ b)  # W^H A W = I => Galerkin coeffs
            res = cg(self.matvec, b, x0=x0, precond=self.precond,
                     tol=self.tol, maxiter=self.maxiter)
            return res.x, res.iters

        @jax.jit
        def _aorth(W, x):
            w = jnp.asarray(x, W.dtype)
            Aw = jnp.asarray(self.matvec(w), W.dtype)
            for _ in range(2):  # A-orthogonalize + one re-orth pass
                coeffs = W.conj().T @ Aw
                w = w - W @ coeffs
                Aw = jnp.asarray(self.matvec(w), W.dtype)
            return w, jnp.vdot(w, Aw).real

        @jax.jit
        def _insert(W, w, nrm2, slot):
            col = (w / jnp.sqrt(nrm2))[:, None]
            zero = jnp.zeros((), slot.dtype)
            return jax.lax.dynamic_update_slice(W, col.astype(W.dtype),
                                                (zero, slot))

        self._solve_fn, self._aorth_fn, self._insert_fn = \
            _solve, _aorth, _insert

    def _solve_one(self, b):
        x, iters = self._solve_fn(self._W, b)
        self.last_iters = int(iters)
        self._recycle(x)
        return x

    def _recycle(self, x):
        if self.last_iters <= 2:
            # the deflated start already solved it: x is (numerically) in
            # span(W) and re-inserting it only burns 3 matvecs per apply
            return
        w, nrm2 = self._aorth_fn(self._W, x)
        if float(nrm2) > 1e-28:
            slot = self._count % self.m_max
            self._W = self._insert_fn(self._W, w, nrm2,
                                      jnp.asarray(slot, jnp.int32))
            self._count += 1

    def apply(self, U, mu=None):
        U = jnp.asarray(U)
        if U.ndim == 1:
            return self._solve_one(U)
        cols = [self._solve_one(U[:, j]) for j in range(U.shape[1])]
        return jnp.stack(cols, axis=1)

    # SPD: the adjoint solve is the same solve
    apply_adjoint = apply

    def apply_inverse(self, U, mu=None):
        U = jnp.asarray(U)
        if U.ndim == 1:
            return self.matvec(U)
        return jax.vmap(self.matvec, in_axes=1, out_axes=1)(U)


class ScipyLinearOperator(spla.LinearOperator):
    """Adapter exposing a LinOp to scipy's iterative solvers.

    Rebuild of reference ``ScipyLinearOperator`` (utilities/utilities.py:
    16-36): e.g. pass a preconditioner direction to ``scipy.sparse.linalg.
    gmres(..., M=ScipyLinearOperator(P))``.
    """

    def __init__(self, op: LinOp, dtype=np.float64):
        self.op = op
        super().__init__(dtype=np.dtype(dtype),
                         shape=(op.range_dim, op.source_dim))

    def _matvec(self, x):
        # copy: jnp-backed buffers are read-only, scipy mutates work arrays
        return np.array(self.op.apply(np.asarray(x).reshape(-1)))

    def _rmatvec(self, x):
        return np.array(self.op.apply_adjoint(np.asarray(x).reshape(-1)))


def to_matrix(op, dtype=None):
    """Dense jnp matrix of an op / array."""
    if isinstance(op, LinOp):
        m = op.matrix()
    else:
        m = jnp.asarray(op)
    return m.astype(dtype) if dtype is not None else m
