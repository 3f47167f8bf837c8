"""Mesh-sharded embeddings with the standard Embedding interface.

Wraps the DoF-sharded sketch kernels (parallel/sharded_sketch.py) as
LinOp-compatible embeddings so reductors can sketch mesh-sharded snapshot
matrices directly. The operator is a pure function of ``seed`` (blockwise
``fold_in`` derivation), and equals its single-device blocked oracle
bit-for-bit, so offline state built on a pod matches state built on one
chip.
"""

from __future__ import annotations

from typing import Optional

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


class ShardedGaussianEmbedding(LinOp):
    """Gaussian l2->l2 embedding applied across a ('dof', ...) mesh."""

    def __init__(self, range_dim: int, source_dim: int, mesh: Mesh,
                 seed: int = 0, axis: str = "dof", dtype=None):
        self.range_dim = range_dim
        self.source_dim = source_dim
        self.mesh = mesh
        self.seed = seed
        self.axis = axis
        # the drawn values depend on the generation dtype, so the operator
        # identity fixes it (inputs are cast)
        from rla4mor_tpu.utils.config import default_dtype

        self.dtype = dtype if dtype is not None else default_dtype()
        assert source_dim % mesh.shape[axis] == 0

    @property
    def key(self):
        return jax.random.key(self.seed)

    def with_seed(self, seed: Optional[int]):
        if seed is None:
            seed = int(np.random.randint(0, 2**31 - 1))
        return ShardedGaussianEmbedding(
            self.range_dim, self.source_dim, self.mesh, seed, self.axis,
            self.dtype,
        )

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
        return self.matrix().conj().T @ jnp.asarray(V)


class ShardedSrhtEmbedding(LinOp):
    """Sharded SRHT embedding (same canonical operator as ``ops.fwht.srht``).

    ``variant="flat"`` (default) applies the flat-contraction kernel with
    ONE psum of the (k, m) result (srht_sketch_sharded_flat — the
    roofline kernel, PERF.md round-2); ``variant="butterfly"`` keeps the
    local-FWHT + cross-chip ppermute butterfly (useful when n_local is
    not a multiple of an R block)."""

    def __init__(self, range_dim: int, source_dim: int, mesh: Mesh,
                 seed: int = 0, axis: str = "dof", variant: str = "flat"):
        d = source_dim.bit_length() - 1
        assert 1 << d == source_dim, "sharded SRHT needs power-of-two n"
        assert variant in ("flat", "butterfly")
        self.range_dim = range_dim
        self.source_dim = source_dim
        self.mesh = mesh
        self.seed = seed
        self.axis = axis
        self.variant = variant

    @property
    def key(self):
        return jax.random.key(self.seed)

    def with_seed(self, seed: Optional[int]):
        if seed is None:
            seed = int(np.random.randint(0, 2**31 - 1))
        return ShardedSrhtEmbedding(
            self.range_dim, self.source_dim, self.mesh, seed, self.axis,
            self.variant,
        )

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
