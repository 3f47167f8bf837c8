"""Affine-parametric operator calculus.

This module replaces, with *static typed structure*, what the reference gets
from pyMOR's ``LincombOperator`` plus the symbolic ``expand``/``contract``
rewriter and the ``project`` rule engine (reference: pymor usage in
mor/sketched_reductor.py:69-81,148-152; rule patches in
utilities/__init__.py:17-72 and rla/__init__.py:15-21).

Two affine types:

* :class:`AffineOp` — general offline container: ``terms`` are arbitrary
  :class:`~rla4mor_tpu.core.linops.LinOp` (possibly host-sparse, possibly
  lazy chains like ``Theta o R^-1 o A_j``), with one
  :class:`~rla4mor_tpu.core.parameters.Coefficient` per term.
* :class:`AffineDense` — a **pytree** of term-stacked dense arrays
  ``(T, k, m)`` plus a static coefficient tuple. Everything downstream of
  sketching lives here: assembly is one einsum, so ROM solves jit and vmap
  over parameter batches (the TPU-native win over the reference's per-mu
  Python assembly).

The reference's rewriting steps map to explicit functions:

* ``contract(expand(Theta @ Lincomb(A_j)))``  ->  :func:`compose`
* ``project(op, V, W)`` (rule engine)          ->  :func:`project`
* ``concatenate_operators`` (utilities/utilities.py:39-84) -> :func:`concat_affine`
* blockwise ``project_block`` (utilities/utilities.py:87-126) -> :func:`project_block`
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from rla4mor_tpu.core.linops import ChainOp, DenseOp, LinOp
from rla4mor_tpu.core.parameters import (
    ONE,
    Coefficient,
    ConstantCoefficient,
    Mu,
    as_coefficient,
    conj_coefficient,
    eval_coefficients,
)


# Every dense contraction in the affine calculus runs at HIGHEST
# precision: the operands are sketch-/reduced-dimension arrays (tiny next
# to FOM work), while ROM solves and sketched error estimators compare
# quantities against tolerances far below the TPU default matmul's bf16
# truncation (~2e-3) — VERDICT r2 weak #2.
_HI = jax.lax.Precision.HIGHEST


def _cast_theta(theta: jax.Array, stack: jax.Array):
    """Cast (theta, stack) for contraction: keep the stack's precision,
    but NEVER drop a complex coefficient's imaginary part onto a real
    stack (the old ``theta.astype(stack.dtype)`` silently truncated e.g.
    a 1j*mu frequency coefficient to 0 — round-2 review finding)."""
    if jnp.iscomplexobj(theta) and not jnp.iscomplexobj(stack):
        dt = jnp.promote_types(stack.dtype, jnp.complex64)
        return theta.astype(dt), stack.astype(dt)
    return theta.astype(stack.dtype), stack


class AffineOp:
    """sum_i theta_i(mu) * A_i with LinOp terms (general, offline)."""

    def __init__(
        self,
        terms: Sequence[LinOp],
        coefficients: Optional[Sequence[Union[Coefficient, float]]] = None,
    ):
        self.terms = tuple(terms)
        if coefficients is None:
            coefficients = (ONE,) * len(self.terms)
        self.coefficients = tuple(as_coefficient(c) for c in coefficients)
        assert len(self.terms) == len(self.coefficients)
        t0 = self.terms[0]
        assert all(t.source_dim == t0.source_dim for t in self.terms)
        assert all(t.range_dim == t0.range_dim for t in self.terms)
        self.source_dim = t0.source_dim
        self.range_dim = t0.range_dim

    @property
    def n_terms(self) -> int:
        return len(self.terms)

    @property
    def parametric(self) -> bool:
        return any(c.parametric for c in self.coefficients)

    def apply(self, U, mu: Mu | None = None):
        theta = eval_coefficients(self.coefficients, mu)
        out = None
        for t, term in enumerate(self.terms):
            y = theta[t] * jnp.asarray(term.apply(U, mu))
            out = y if out is None else out + y
        return out

    def apply_adjoint(self, V, mu: Mu | None = None):
        theta = eval_coefficients(self.coefficients, mu)
        out = None
        for t, term in enumerate(self.terms):
            y = jnp.conj(theta[t]) * jnp.asarray(term.apply_adjoint(V, mu))
            out = y if out is None else out + y
        return out

    @property
    def H(self) -> "AffineOp":
        return AffineOp(
            tuple(t.H for t in self.terms),
            tuple(conj_coefficient(c) for c in self.coefficients),
        )

    def with_(self, terms=None, coefficients=None) -> "AffineOp":
        return AffineOp(
            self.terms if terms is None else terms,
            self.coefficients if coefficients is None else coefficients,
        )

    def assemble_dense(self, mu: Mu | None = None):
        theta = np.asarray(eval_coefficients(self.coefficients, mu))
        out = None
        for t, term in enumerate(self.terms):
            m = np.asarray(term.matrix()) * theta[t]
            out = m if out is None else out + m
        return jnp.asarray(out)


class AffineDense:
    """Affine operator with a dense term stack — a jit-friendly pytree.

    ``stack`` has shape (T, k, m): T affine terms of a k x m matrix.
    ``coefficients`` is a static (hashable) tuple, so the structure is a
    compile-time constant and only the arrays are traced.
    """

    def __init__(self, stack, coefficients: Sequence[Coefficient]):
        self.stack = jnp.asarray(stack)
        assert self.stack.ndim == 3, self.stack.shape
        self.coefficients = tuple(as_coefficient(c) for c in coefficients)
        assert self.stack.shape[0] == len(self.coefficients)

    # pytree protocol ------------------------------------------------------
    def tree_flatten(self):
        return (self.stack,), self.coefficients

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = object.__new__(cls)
        obj.stack = children[0]
        obj.coefficients = aux
        return obj

    # shapes ---------------------------------------------------------------
    @property
    def n_terms(self) -> int:
        return self.stack.shape[0]

    @property
    def range_dim(self) -> int:
        return self.stack.shape[1]

    @property
    def source_dim(self) -> int:
        return self.stack.shape[2]

    @property
    def parametric(self) -> bool:
        return any(c.parametric for c in self.coefficients)

    # algebra ----------------------------------------------------------------
    def assemble(self, mu: Mu | None = None) -> jax.Array:
        """(k, m) matrix at parameter mu — one einsum, jittable."""
        theta, stack = _cast_theta(
            eval_coefficients(self.coefficients, mu), self.stack
        )
        return jnp.einsum("t,tkm->km", theta, stack, precision=_HI)

    def assemble_vec(self, mu: Mu | None = None) -> jax.Array:
        """(k,) vector for m==1 operators (rhs / functionals)."""
        return self.assemble(mu)[:, 0]

    def apply(self, U, mu: Mu | None = None):
        U = jnp.asarray(U)
        single = U.ndim == 1
        Um = U[:, None] if single else U
        theta, stack = _cast_theta(
            eval_coefficients(self.coefficients, mu), self.stack
        )
        out = jnp.einsum("t,tkm,mb->kb", theta, stack, Um, precision=_HI)
        return out[:, 0] if single else out

    def apply_adjoint(self, V, mu: Mu | None = None):
        V = jnp.asarray(V)
        single = V.ndim == 1
        Vm = V[:, None] if single else V
        theta, stack = _cast_theta(
            eval_coefficients(self.coefficients, mu), self.stack
        )
        out = jnp.einsum("t,tkm,kb->mb", jnp.conj(theta), jnp.conj(stack), Vm,
                         precision=_HI)
        return out[:, 0] if single else out

    @property
    def H(self) -> "AffineDense":
        return AffineDense(
            jnp.conj(jnp.swapaxes(self.stack, 1, 2)),
            tuple(conj_coefficient(c) for c in self.coefficients),
        )

    def lmul(self, M) -> "AffineDense":
        """M @ self, term-wise (M dense (p, k))."""
        return AffineDense(
            jnp.einsum("pk,tkm->tpm", jnp.asarray(M), self.stack,
                       precision=_HI), self.coefficients
        )

    def rmul(self, M) -> "AffineDense":
        """self @ M, term-wise (M dense (m, q))."""
        return AffineDense(
            jnp.einsum("tkm,mq->tkq", self.stack, jnp.asarray(M),
                       precision=_HI), self.coefficients
        )

    def map_terms(self, fn: Callable) -> "AffineDense":
        """Apply a linear map to every term: terms'_t = fn(terms_t).

        ``fn`` maps (k, m) -> (k', m); applied as one batched call on the
        reshaped (k, T*m) matrix so embeddings sketch all terms at once.
        """
        T, k, m = self.stack.shape
        flat = jnp.moveaxis(self.stack, 0, 1).reshape(k, T * m)
        out = jnp.asarray(fn(flat))
        kp = out.shape[0]
        return AffineDense(
            jnp.moveaxis(out.reshape(kp, T, m), 1, 0), self.coefficients
        )

    def with_coefficients(self, coefficients) -> "AffineDense":
        return AffineDense(self.stack, coefficients)

    def add(self, other: "AffineDense") -> "AffineDense":
        """Affine sum: term-list union (T1+T2 terms)."""
        assert self.range_dim == other.range_dim
        assert self.source_dim == other.source_dim
        return AffineDense(
            jnp.concatenate([self.stack, other.stack], axis=0),
            self.coefficients + other.coefficients,
        )

    def scale(self, c: Union[Coefficient, float]) -> "AffineDense":
        c = as_coefficient(c)
        return AffineDense(self.stack, tuple(c * ci for ci in self.coefficients))

    def astype(self, dtype) -> "AffineDense":
        return AffineDense(self.stack.astype(dtype), self.coefficients)


jax.tree_util.register_pytree_node(
    AffineDense,
    lambda x: x.tree_flatten(),
    AffineDense.tree_unflatten,
)


# ---------------------------------------------------------------------------
# Structural operations (the expand/contract/project replacements)
# ---------------------------------------------------------------------------

AnyOp = Union[AffineOp, AffineDense, LinOp]


def as_affine(op: AnyOp) -> Union[AffineOp, AffineDense]:
    if isinstance(op, (AffineOp, AffineDense)):
        return op
    return AffineOp((op,), (ONE,))


def compose(left: LinOp, op: AnyOp) -> Union[AffineOp, AffineDense]:
    """left o op, distributing over affine terms.

    Equivalent of ``contract(expand(left @ lincomb))`` in the reference
    (mor/sketched_reductor.py:148-149, utilities/__init__.py:44-68) — here a
    trivial structural map because affine structure is explicit.
    """
    op = as_affine(op)
    if isinstance(op, AffineDense):
        if isinstance(left, DenseOp):
            return op.lmul(left.A)
        return op.map_terms(lambda X: left.apply(X))
    return AffineOp(
        tuple(ChainOp((left, t)) for t in op.terms), op.coefficients
    )


def project(
    op: AnyOp,
    V,
    W,
    product: Optional[LinOp] = None,
) -> AffineDense:
    """Petrov-Galerkin projection ``V^H [R] op W``, term-wise.

    ``V`` (n, kv) and/or ``W`` (m, kw) are dense bases (columns) or ``None``
    (meaning: keep that side full). Mirrors pyMOR ``project`` semantics as
    used by the reference, including the adjoint-based rule for matrix-free
    operators (reference utilities/__init__.py:17-42): with ``W=None`` the
    terms are evaluated via ``apply_adjoint`` on ``V``.

    Returns an :class:`AffineDense` (all results of projection are dense).
    At least one of V, W must be given.
    """
    op = as_affine(op)
    if product is not None and V is not None:
        V = product.apply(V)

    if isinstance(op, AffineDense):
        out = op
        if W is not None:
            out = out.rmul(jnp.asarray(W))
        if V is not None:
            out = out.lmul(jnp.asarray(V).conj().T)
        return out

    assert V is not None or W is not None
    mats = []
    for term in op.terms:
        if W is not None:
            Y = jnp.asarray(term.apply(jnp.asarray(W)))
            if V is not None:
                Y = jnp.asarray(V).conj().T @ Y
        else:
            # V^H A = (A^H V)^H  — matrix-free adjoint path
            Y = jnp.asarray(term.apply_adjoint(jnp.asarray(V))).conj().T
        mats.append(Y)
    return AffineDense(jnp.stack(mats), op.coefficients)


def apply2(op: AnyOp, V, W, mu: Mu | None = None, product=None) -> jax.Array:
    """V^H [R] op(mu) W as a dense matrix (pyMOR ``apply2`` analog)."""
    return project(op, V, W, product=product).assemble(mu)


def materialize(op: AnyOp) -> AffineDense:
    """AffineDense with each term materialized as a dense matrix.

    Use for small-source operators only (rhs vectors, functionals).
    """
    op = as_affine(op)
    if isinstance(op, AffineDense):
        return op
    return AffineDense(
        jnp.stack([jnp.asarray(t.matrix()) for t in op.terms]), op.coefficients
    )


def concat_affine(
    ops: Sequence[Union[AffineDense, AffineOp]], axis: int
) -> AffineDense:
    """Concatenate affine operators term-wise along ``axis`` (1=source cols,
    0=range rows).

    Rebuild of reference ``concatenate_operators`` (utilities/
    utilities.py:39-84): all operands must share the same coefficient tuple;
    the i-th terms are stacked. Used to grow the sketched residual columns
    as the basis is extended (reference mor/sketched_reductor.py:58,78).
    """
    dense = [materialize(op) for op in ops]
    coeffs = dense[0].coefficients
    assert all(d.coefficients == coeffs for d in dense), (
        "concat_affine requires identical coefficient tuples"
    )
    stack = jnp.concatenate([d.stack for d in dense], axis=1 + axis)
    return AffineDense(stack, coeffs)


def project_block(
    op: AnyOp,
    V,
    W,
    product=None,
    max_block_size: Optional[int] = None,
) -> AffineDense:
    """Blockwise projection bounding peak memory.

    Rebuild of reference ``project_block`` (utilities/utilities.py:87-126):
    splits the source (or range) basis into chunks, projects each, and
    concatenates term-wise. On TPU this bounds HBM pressure for very wide
    bases.
    """
    if max_block_size is None or (V is None and W is None):
        return project(op, V, W, product=product)
    # apply the product to the test basis ONCE up front (also fixes the
    # range-side path, which recurses with V on the W slot where project
    # would never apply it — round-2 review finding, repro'd)
    if product is not None and V is not None:
        V = jnp.asarray(product.apply(V))
        product = None
    if W is not None:
        W = jnp.asarray(W)
        nb = -(-W.shape[1] // max_block_size)
        parts = [
            project(op, V, W[:, i * max_block_size : (i + 1) * max_block_size])
            for i in range(nb)
        ]
        return concat_affine(parts, axis=1)
    # range-side blocking via the adjoint
    return project_block(
        as_affine(op).H, None, V, max_block_size=max_block_size
    ).H
