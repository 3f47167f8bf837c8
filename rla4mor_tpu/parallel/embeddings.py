"""Mesh-sharded embeddings with the standard Embedding interface.

Wraps the DoF-sharded sketch kernels (parallel/sharded_sketch.py) as
LinOp-compatible embeddings so reductors can sketch mesh-sharded snapshot
matrices directly. The operator is a pure function of ``seed`` (blockwise
``fold_in`` derivation), and equals its single-device blocked oracle
bit-for-bit, so offline state built on a pod matches state built on one
chip.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from rla4mor_tpu.core.linops import LinOp
from rla4mor_tpu.parallel.sharded_sketch import (
    gaussian_sketch_blocked,
    gaussian_sketch_sharded,
    srht_blocked,
    srht_sketch_sharded,
)


@dataclass(frozen=True)
class ShardedGaussianEmbedding(LinOp):
    """Gaussian l2->l2 embedding applied across a ('dof', ...) mesh.

    Frozen dataclass like the rest of the zoo (CLAUDE.md convention): a
    pure function of its fields; ``dtype`` is part of the operator
    identity because the drawn values depend on the generation dtype
    (inputs are cast)."""

    range_dim: int
    source_dim: int
    mesh: Mesh
    seed: int = 0
    axis: str = "dof"
    dtype: Any = None

    def __post_init__(self):
        if self.dtype is None:
            from rla4mor_tpu.utils.config import default_dtype

            object.__setattr__(self, "dtype", default_dtype())
        assert self.source_dim % self.mesh.shape[self.axis] == 0

    @property
    def key(self):
        return jax.random.key(self.seed)

    def with_seed(self, seed: Optional[int]):
        if seed is None:
            seed = int(np.random.randint(0, 2**31 - 1))
        return dataclasses.replace(self, seed=seed)

    def apply(self, U, mu=None):
        return gaussian_sketch_sharded(
            self.key, self.range_dim, jnp.asarray(U, dtype=self.dtype),
            self.mesh, self.axis,
        )

    def apply_blocked(self, U):
        """Single-device oracle (same operator, no mesh)."""
        return gaussian_sketch_blocked(
            self.key, self.range_dim, jnp.asarray(U, dtype=self.dtype),
            self.mesh.shape[self.axis],
        )

    def matrix(self):
        n_dev = self.mesh.shape[self.axis]
        from rla4mor_tpu.parallel.sharded_sketch import gaussian_block

        bs = self.source_dim // n_dev
        return jnp.concatenate(
            [gaussian_block(self.key, self.range_dim, bs, b, self.dtype)
             for b in range(n_dev)], axis=1
        )

    def apply_adjoint(self, V, mu=None):
        """Omega^H V, DoF-sharded: each shard generates ITS block of
        Omega and emits its rows of the result — Omega is never
        materialized (the previous matrix()-based adjoint concatenated
        the full (k, n) Omega, defeating the class's whole purpose at
        big n — round-2 review finding)."""
        from jax.sharding import PartitionSpec as P

        from rla4mor_tpu.parallel.sharded_sketch import gaussian_block

        V = jnp.asarray(V, dtype=self.dtype)
        single = V.ndim == 1
        Vm = V[:, None] if single else V
        bs = self.source_dim // self.mesh.shape[self.axis]

        def local(v):
            b = jax.lax.axis_index(self.axis)
            Ob = gaussian_block(self.key, self.range_dim, bs, b, self.dtype)
            return Ob.conj().T @ v  # (bs, cols)

        out = jax.shard_map(
            local, mesh=self.mesh, in_specs=(P(),),
            out_specs=P(self.axis, None),
        )(Vm)
        return out[:, 0] if single else out


@dataclass(frozen=True)
class ShardedSrhtEmbedding(LinOp):
    """Sharded SRHT embedding (same canonical operator as ``ops.fwht.srht``).

    ``variant="flat"`` (default) applies the flat-contraction kernel with
    ONE psum of the (k, m) result (srht_sketch_sharded_flat — the
    roofline kernel, PERF.md round-2); ``variant="butterfly"`` keeps the
    local-FWHT + cross-chip ppermute butterfly (useful when n_local is
    not a multiple of an R block)."""

    range_dim: int
    source_dim: int
    mesh: Mesh
    seed: int = 0
    axis: str = "dof"
    variant: str = "flat"

    def __post_init__(self):
        d = self.source_dim.bit_length() - 1
        assert 1 << d == self.source_dim, "sharded SRHT needs power-of-two n"
        assert self.variant in ("flat", "butterfly")

    @property
    def key(self):
        return jax.random.key(self.seed)

    def with_seed(self, seed: Optional[int]):
        if seed is None:
            seed = int(np.random.randint(0, 2**31 - 1))
        return dataclasses.replace(self, seed=seed)

    def apply(self, U, mu=None):
        if self.variant == "flat":
            from rla4mor_tpu.parallel.sharded_sketch import (
                srht_sketch_sharded_flat,
            )

            return srht_sketch_sharded_flat(
                self.key, self.range_dim, jnp.asarray(U), self.mesh,
                self.axis,
            )
        return srht_sketch_sharded(
            self.key, self.range_dim, jnp.asarray(U), self.mesh, self.axis
        )

    def apply_blocked(self, U):
        return srht_blocked(
            self.key, self.range_dim, jnp.asarray(U), self.mesh.shape[self.axis]
        )
