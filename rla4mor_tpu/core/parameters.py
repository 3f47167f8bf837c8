"""Parameters, parameter spaces and coefficient functionals.

JAX-native replacement for the pyMOR parameter stack the reference builds on
(``Mu``, ``ParameterSpace``, ``ParameterFunctional``,
``ProjectionParameterFunctional``; used e.g. in reference
preconditioners/preconditioned_rom.py:54 and preconditioners/tests.py:84).

Design: a parameter value ``Mu`` is a plain ``dict[str, jnp.ndarray]`` so it
is a pytree and can be jitted / vmapped over directly. Coefficient
functionals are small frozen (hashable) dataclasses evaluated with
traced ``mu`` leaves, so an affine operator's coefficient structure is static
under ``jax.jit`` while the parameter values are traced.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Dict, Mapping, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

# A parameter value: dict of 1-d arrays, e.g. {'diffusion': (4,) array}.
Mu = Dict[str, jax.Array]


def mu_stack(mus: Sequence[Mu]) -> Mu:
    """Stack a list of Mu into a batched Mu (leading batch axis per leaf)."""
    keys = mus[0].keys()
    return {k: jnp.stack([jnp.asarray(m[k]) for m in mus]) for k in keys}


def mu_unstack(batched: Mu) -> list[Mu]:
    n = len(next(iter(batched.values())))
    return [{k: v[i] for k, v in batched.items()} for i in range(n)]


@dataclass(frozen=True)
class ParameterSpace:
    """Box-constrained parameter space.

    ``shapes`` maps parameter name -> size; ``low``/``high`` are global box
    bounds (the reference always uses ``fom.parameters.space(0, 1)``,
    reference preconditioners/tests.py:357).
    """

    shapes: Tuple[Tuple[str, int], ...]
    low: float = 0.0
    high: float = 1.0

    @classmethod
    def make(cls, shapes: Mapping[str, int], low: float = 0.0, high: float = 1.0):
        return cls(tuple(sorted(shapes.items())), low, high)

    @property
    def names(self) -> Tuple[str, ...]:
        return tuple(k for k, _ in self.shapes)

    def dim(self) -> int:
        return int(sum(s for _, s in self.shapes))

    def sample_randomly(self, count: int, key: jax.Array | int = 0) -> list[Mu]:
        """Uniform samples in the box. Deterministic in ``key``."""
        if isinstance(key, int):
            key = jax.random.key(key)
        out = []
        for i in range(count):
            k = jax.random.fold_in(key, i)
            mu: Mu = {}
            for j, (name, size) in enumerate(self.shapes):
                kk = jax.random.fold_in(k, j)
                mu[name] = jax.random.uniform(
                    kk, (size,), minval=self.low, maxval=self.high
                )
            out.append(mu)
        return out

    def sample_uniformly(self, counts_per_dim: int) -> list[Mu]:
        """Tensor grid of samples (small dims only)."""
        axes = []
        for _, size in self.shapes:
            for _ in range(size):
                axes.append(np.linspace(self.low, self.high, counts_per_dim))
        grid = np.stack(np.meshgrid(*axes, indexing="ij"), axis=-1).reshape(
            -1, len(axes)
        )
        out = []
        for row in grid:
            mu: Mu = {}
            off = 0
            for name, size in self.shapes:
                mu[name] = jnp.asarray(row[off : off + size])
                off += size
            out.append(mu)
        return out

    def parse(self, x) -> Mu:
        """Parse a flat vector into a Mu (order = sorted names)."""
        x = jnp.asarray(x)
        mu: Mu = {}
        off = 0
        for name, size in self.shapes:
            mu[name] = x[off : off + size]
            off += size
        return mu

    def extend(self, name: str, size: int) -> "ParameterSpace":
        """Space with one extra parameter block (e.g. 'precond')."""
        return ParameterSpace(
            tuple(sorted(self.shapes + ((name, size),))), self.low, self.high
        )


def mu_flat(mu: Mu, names: Sequence[str]) -> jax.Array:
    return jnp.concatenate([jnp.atleast_1d(jnp.asarray(mu[n]).ravel()) for n in names])


# ---------------------------------------------------------------------------
# Coefficient functionals (static structure, traced values)
# ---------------------------------------------------------------------------


class Coefficient:
    """A scalar-valued function of Mu. Frozen/hashable: static under jit."""

    def __call__(self, mu: Mu | None) -> jax.Array:
        raise NotImplementedError

    # algebra ---------------------------------------------------------------
    def __mul__(self, other: "Coefficient | float") -> "Coefficient":
        other = as_coefficient(other)
        return simplify_product(self, other)

    __rmul__ = __mul__

    @property
    def parametric(self) -> bool:
        return True


@dataclass(frozen=True)
class ConstantCoefficient(Coefficient):
    value: float = 1.0

    def __call__(self, mu=None):
        return jnp.asarray(self.value)

    @property
    def parametric(self):
        return False


ONE = ConstantCoefficient(1.0)


@dataclass(frozen=True)
class ProjectionCoefficient(Coefficient):
    """theta(mu) = mu[key][index].

    Analog of pyMOR ``ProjectionParameterFunctional`` (reference
    preconditioners/preconditioned_rom.py:54). Unlike the reference, no
    ``size`` bookkeeping is needed: Mu leaves carry their own length, so
    adding a preconditioner direction never rewrites existing coefficients
    (reference must patch sizes: preconditioned_rom.py:83-105).
    """

    key: str
    index: int

    def __call__(self, mu):
        return jnp.asarray(mu[self.key])[self.index]


@dataclass(frozen=True)
class ProductCoefficient(Coefficient):
    factors: Tuple[Coefficient, ...]

    def __call__(self, mu):
        out = jnp.asarray(1.0)
        for f in self.factors:
            out = out * f(mu)
        return out

    @property
    def parametric(self):
        return any(f.parametric for f in self.factors)


@dataclass(frozen=True)
class ExpressionCoefficient(Coefficient):
    """theta(mu) = fn(mu) for an arbitrary jittable fn.

    ``fn`` participates in equality/hash BY IDENTITY: two coefficients
    holding different functions must never compare equal, because
    coefficient tuples are static jit-cache keys (an fn-blind comparison
    let a program traced for one coefficient silently serve another —
    round-2 review finding, repro'd). Reuse the same function object when
    you want cache hits; ``name`` is display-only.
    """

    fn: Callable[[Mu], jax.Array]
    name: str = field(default="expr", compare=False)

    def __call__(self, mu):
        return jnp.asarray(self.fn(mu))


@dataclass(frozen=True)
class ConjugateCoefficient(Coefficient):
    """conj(inner(mu)) — used by the affine ``.H`` so the adjoint
    conjugates complex-valued coefficients."""

    inner: Coefficient

    def __call__(self, mu):
        return jnp.conj(self.inner(mu))

    @property
    def parametric(self):
        return self.inner.parametric


def conj_coefficient(c: Coefficient) -> Coefficient:
    """Conjugate of a coefficient, unwrapping/simplifying where the value
    is known real (Mu leaves are real box parameters, so projections are
    their own conjugates; conj of conj unwraps, keeping ``.H.H``'s
    coefficient tuple identical to the original)."""
    if isinstance(c, ConjugateCoefficient):
        return c.inner
    if isinstance(c, ProjectionCoefficient):
        return c
    if isinstance(c, ConstantCoefficient):
        v = complex(c.value)
        return c if v.imag == 0 else ConstantCoefficient(v.conjugate())
    if isinstance(c, ProductCoefficient):
        return ProductCoefficient(
            tuple(conj_coefficient(f) for f in c.factors)
        )
    return ConjugateCoefficient(c)


def as_coefficient(c: Union[Coefficient, float, int]) -> Coefficient:
    if isinstance(c, Coefficient):
        return c
    return ConstantCoefficient(float(c))


def simplify_product(a: Coefficient, b: Coefficient) -> Coefficient:
    if isinstance(a, ConstantCoefficient) and a.value == 1.0:
        return b
    if isinstance(b, ConstantCoefficient) and b.value == 1.0:
        return a
    if isinstance(a, ConstantCoefficient) and isinstance(b, ConstantCoefficient):
        return ConstantCoefficient(a.value * b.value)
    fa = a.factors if isinstance(a, ProductCoefficient) else (a,)
    fb = b.factors if isinstance(b, ProductCoefficient) else (b,)
    return ProductCoefficient(fa + fb)


def eval_coefficients(
    coefficients: Sequence[Coefficient], mu: Mu | None
) -> jax.Array:
    """Evaluate a tuple of coefficients into a (T,) array (jit-friendly)."""
    return jnp.stack([c(mu) for c in coefficients])
