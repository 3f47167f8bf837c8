"""Random embedding zoo (oblivious l2->l2 and U->l2 subspace embeddings).

Rebuild of the reference's embedding operators (rla/embeddings.py):
``RandomEmbedding`` ABC :22, ``SrhtEmbedding`` :126, ``GaussianEmbedding``
:214, ``IdentityEmbedding`` :274, ``EmbeddingVectorized`` :318,
``BlockGaussianEmbedding`` :373 — plus Rademacher and sparse-sign
embeddings (TPU-cheap additions).

Contract (reference rla/embeddings.py:22-122): an embedding Theta wraps an
optional ``sqrt_product`` Q with Q^H Q = R; ``apply(U) = Omega (Q U)`` where
Omega is the l2->l2 random matrix; ``matrix()`` is the (k, n) U->l2 map
Omega Q. Every embedding is a *pure function of its seed*: ``with_seed``
returns an operator drawing fresh randomness (used to redraw online sketches,
reference mor/sketched_reductor.py:128,135-136), and block/shard randomness
derives via ``jax.random.fold_in`` so sharded and unsharded sketches agree.

Embeddings are LinOps, so they compose with the affine calculus
(``compose(embedding, affine_op)``) without any rewrite rules — the
reference needs to patch embeddings into pyMOR's rewriter as atomic leaves
(rla/__init__.py:15-21).
"""

from __future__ import annotations

import dataclasses
import math
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from rla4mor_tpu.core.linops import LinOp
from rla4mor_tpu.ops import dims as _dims
from rla4mor_tpu.ops.fwht import srht, srht_rows
from rla4mor_tpu.utils.config import default_dtype


@dataclass(frozen=True)
class Embedding(LinOp):
    """Base class. ``range_dim`` = k, ``source_dim`` = n (U-space)."""

    range_dim: int
    source_dim: int
    seed: int = 0
    sqrt_product: Optional[LinOp] = None  # Q with Q^H Q = R
    # draw a COMPLEX Omega (the reference's per-embedding dtype option,
    # rla/embeddings.py:30-33; also switches the oblivious-dim formulas
    # to their complex a=2 constants). Complex DATA through a real Omega
    # works regardless; this makes the embedding itself complex.
    complex_dtype: bool = False

    def __post_init__(self):
        if self.sqrt_product is not None:
            assert self.sqrt_product.source_dim == self.source_dim

    # --- seed discipline -----------------------------------------------------
    @property
    def key(self) -> jax.Array:
        return jax.random.key(self.seed)

    def with_seed(self, seed: Optional[int]) -> "Embedding":
        if seed is None:
            seed = int(np.random.randint(0, 2**31 - 1))
        return dataclasses.replace(self, seed=seed)

    def with_range_dim(self, range_dim: int) -> "Embedding":
        """Same embedding family/seed at sketch size ``range_dim``.

        The supported way to resize a sketch (``reduce_adaptive``
        doubling): plain ``dataclasses.replace(range_dim=...)`` breaks on
        classes whose constructor derives the range dim
        (``IdentityEmbedding``) and is untested for block-structured
        bitstreams — subclasses override where the semantics differ.
        """
        return dataclasses.replace(self, range_dim=int(range_dim))

    def _draw_dtype(self):
        """Generation dtype of the random entries (part of the operator
        identity, ops/seeding.py docstring)."""
        dt = default_dtype()
        if self.complex_dtype:
            dt = jnp.promote_types(dt, jnp.complex64)
        return dt

    # --- dims ------------------------------------------------------------------
    @property
    def l2_dim(self) -> int:
        """Dimension of the intermediate l2 space (= Q's range)."""
        return (
            self.sqrt_product.range_dim
            if self.sqrt_product is not None
            else self.source_dim
        )

    # --- core maps ---------------------------------------------------------------
    def _apply_q(self, U):
        return U if self.sqrt_product is None else self.sqrt_product.apply(U)

    def apply_random(self, X):
        """l2 -> l2 sketch: Omega @ X, X (l2_dim, b). Subclasses override.

        HIGHEST precision like the SRHT path (CLAUDE.md convention): the
        default TPU matmul truncates f32 inputs to bf16 (~2e-3), which
        puts a visible floor under sketched residual estimators; these
        sketches are offline, so the 3-pass cost is irrelevant.
        """
        return jnp.matmul(
            self.random_matrix_cached(), jnp.asarray(X),
            precision=jax.lax.Precision.HIGHEST,
        )

    def apply(self, U, mu=None):
        return self.apply_random(self._apply_q(jnp.asarray(U)))

    def apply_adjoint(self, V, mu=None):
        """Theta^H V = Q^H (Omega^H V)."""
        W = jnp.matmul(
            self.random_matrix_cached().conj().T, jnp.asarray(V),
            precision=jax.lax.Precision.HIGHEST,
        )
        if self.sqrt_product is None:
            return W
        return self.sqrt_product.apply_adjoint(W)

    # --- explicit matrices ------------------------------------------------------
    def random_matrix(self) -> jax.Array:
        """The (k, l2_dim) l2->l2 matrix Omega (pure function of seed)."""
        raise NotImplementedError

    def random_matrix_cached(self) -> jax.Array:
        m = self.__dict__.get("_rm_cache")
        if m is None:
            m = self.random_matrix()
            self.__dict__["_rm_cache"] = m
        return m

    def matrix(self) -> jax.Array:
        """The (k, n) U->l2 matrix Theta = Omega Q (reference get_matrix,
        rla/embeddings.py:69-84)."""
        m = self.__dict__.get("_m_cache")
        if m is not None:
            return m
        rm = self.random_matrix_cached()
        if self.sqrt_product is None:
            out = rm
        else:
            # Theta = (Q^H Omega^H)^H
            out = jnp.asarray(
                self.sqrt_product.apply_adjoint(rm.conj().T)
            ).conj().T
        self.__dict__["_m_cache"] = out
        return out

    def source_array(self) -> jax.Array:
        """Columns Theta^H (n, k) — the rows of Theta as U-space vectors
        (reference ``as_source_array``, rla/embeddings.py:120-122)."""
        return self.matrix().conj().T

    def range_array(self) -> jax.Array:
        return self.matrix().T


def _resolve(kind, source_dim, range_dim, epsilon, delta, oblivious_dim,
             complex_dtype):
    return _dims.resolve_dim(
        kind, source_dim, range_dim, epsilon, delta, oblivious_dim, complex_dtype
    )


@dataclass(frozen=True)
class GaussianEmbedding(Embedding):
    """Omega with iid N(0, 1/k) entries (reference rla/embeddings.py:214-270).

    Entries follow the canonical tile derivation (ops/seeding.py), so this,
    ``BlockGaussianEmbedding`` and the mesh-sharded Gaussian sketch all name
    the SAME operator at the same seed.
    """

    @classmethod
    def make(cls, source_dim, sqrt_product=None, range_dim=None, epsilon=None,
             delta=None, oblivious_dim=None, seed=0, complex_dtype=False):
        k = _resolve("gaussian", source_dim, range_dim, epsilon, delta,
                     oblivious_dim, complex_dtype)
        return cls(k, source_dim, seed, sqrt_product,
                   complex_dtype=bool(complex_dtype))

    def random_matrix(self):
        from rla4mor_tpu.ops.seeding import gaussian_matrix

        return gaussian_matrix(
            self.key, self.range_dim, self.l2_dim, self._draw_dtype()
        )


@dataclass(frozen=True)
class RademacherEmbedding(Embedding):
    """Omega with iid +-1/sqrt(k) entries — same moments as Gaussian, but
    the matrix is one random-bits op (cheap to regenerate in kernels)."""

    @classmethod
    def make(cls, source_dim, sqrt_product=None, range_dim=None, epsilon=None,
             delta=None, oblivious_dim=None, seed=0, complex_dtype=False):
        k = _resolve("gaussian", source_dim, range_dim, epsilon, delta,
                     oblivious_dim, complex_dtype)
        return cls(k, source_dim, seed, sqrt_product,
                   complex_dtype=bool(complex_dtype))

    def random_matrix(self):
        k = self.range_dim
        r = jax.random.rademacher(self.key, (k, self.l2_dim), dtype=jnp.int8)
        if not self.complex_dtype:
            return r.astype(default_dtype()) / math.sqrt(k)
        # complex Rademacher (s1 + i s2)/sqrt(2): unit-modulus-variance
        # entries with the same second moments as the complex Gaussian
        r2 = jax.random.rademacher(
            jax.random.fold_in(self.key, 1), (k, self.l2_dim), dtype=jnp.int8
        )
        dt = self._draw_dtype()
        return (r.astype(dt) + 1j * r2.astype(dt)) / math.sqrt(2 * k)


@dataclass(frozen=True)
class SparseSignEmbedding(Embedding):
    """s-sparse sign embedding (Clarkson-Woodruff / OSNAP): each source
    column has s entries +-1/sqrt(s) at uniform rows. O(s n b) apply via
    scatter-add — no reference analog ("sparse" in the north-star list)."""

    s: int = 8

    @classmethod
    def make(cls, source_dim, sqrt_product=None, range_dim=None, epsilon=None,
             delta=None, oblivious_dim=None, seed=0, s=8, complex_dtype=False):
        k = _resolve("gaussian", source_dim, range_dim, epsilon, delta,
                     oblivious_dim, complex_dtype)
        assert not complex_dtype, (
            "SparseSignEmbedding draws real signs; complex data through it "
            "works — use GaussianEmbedding for a complex Omega"
        )
        return cls(k, source_dim, seed, sqrt_product, s=s)

    def _plan(self):
        kr = jax.random.fold_in(self.key, 0)
        ks = jax.random.fold_in(self.key, 1)
        rows = jax.random.randint(kr, (self.l2_dim, self.s), 0, self.range_dim)
        signs = jax.random.rademacher(ks, (self.l2_dim, self.s), dtype=jnp.int8)
        return rows, signs

    def apply_random(self, X):
        X = jnp.asarray(X)
        single = X.ndim == 1
        Xm = X[:, None] if single else X
        rows, signs = self._plan()
        vals = (signs.astype(Xm.dtype) / math.sqrt(self.s))[..., None] * Xm[:, None, :]
        out = jnp.zeros((self.range_dim, Xm.shape[1]), dtype=Xm.dtype)
        out = out.at[rows.reshape(-1)].add(vals.reshape(-1, Xm.shape[1]))
        return out[:, 0] if single else out

    def random_matrix(self):
        rows, signs = self._plan()
        out = jnp.zeros((self.range_dim, self.l2_dim), dtype=default_dtype())
        cols = jnp.broadcast_to(
            jnp.arange(self.l2_dim)[:, None], rows.shape
        ).reshape(-1)
        return out.at[rows.reshape(-1), cols].add(
            signs.reshape(-1).astype(default_dtype()) / math.sqrt(self.s)
        )


@dataclass(frozen=True)
class SrhtEmbedding(Embedding):
    """Subsampled randomized Hadamard transform, O(n log n) matrix-free apply
    (reference rla/embeddings.py:126-209; kernel semantics in ops/fwht.py).

    ``precision`` sets the MXU precision of the one-pass sketch kernels:
    ``"highest"`` (exact f32), ``"high"`` (3-pass bf16, ~1.5e-5 rel),
    ``"default"`` (1-pass bf16, ~2e-3 rel), or ``None`` = dtype-aware
    auto — f64/complex inputs sketch at HIGHEST (exact CPU oracles),
    f32 at HIGH (86% of the HBM roofline vs 74% for HIGHEST, PERF.md
    round-3; the ~1.5e-5 matmul envelope sits at the f32 snapshot floor),
    bf16 at DEFAULT (the bf16 offline mode's own quantization dominates).
    """

    precision: Optional[str] = None

    @classmethod
    def make(cls, source_dim, sqrt_product=None, range_dim=None, epsilon=None,
             delta=None, oblivious_dim=None, seed=0, complex_dtype=False,
             precision=None):
        k = _resolve("srht", source_dim, range_dim, epsilon, delta,
                     oblivious_dim, complex_dtype)
        # complex_dtype switches the a=2 dim formula only: the SRHT's
        # Omega is real (sign flips + Hadamard rows) and complex data
        # flows through it exactly (tested in test_complex.py), matching
        # the reference's c16 transform signatures (rla/srht.py:14,39)
        return cls(k, source_dim, seed, sqrt_product,
                   complex_dtype=bool(complex_dtype), precision=precision)

    def _kernel_precision(self, dtype):
        if self.precision is not None:
            return {
                "highest": jax.lax.Precision.HIGHEST,
                "high": jax.lax.Precision.HIGH,
                "default": jax.lax.Precision.DEFAULT,
            }[self.precision]
        dtype = jnp.dtype(dtype)
        if dtype == jnp.float64 or jnp.issubdtype(dtype, jnp.complexfloating):
            return jax.lax.Precision.HIGHEST
        if dtype.itemsize <= 2:  # bf16/f16 storage
            return jax.lax.Precision.DEFAULT
        return jax.lax.Precision.HIGH

    # above this many DoFs the fused single-pass SRHT (one HBM read)
    # beats the 3-pass Kronecker FWHT; below it the small fwht path
    # compiles faster and the traffic difference is noise.  ANY n — the
    # flat kernels handle non-power-of-two node counts via the
    # zero-block trick (ops/srht_pallas.py _flat_plan), so the reductor's
    # real FOM dims ((N-1)^2 thermal block, 2049^2 stencil grids) take
    # the roofline path too (VERDICT r2 weak #1).
    _ONEPASS_MIN_DIM = 1 << 16
    # wide column blocks (>= one lane tile) go through the columns-native
    # flat contraction with m minor; skinnier blocks use the (B, m, K)
    # ordering (K minor: full 128-lane tiles at any m — probed at
    # n=2049^2, see PERF.md round-3)
    _COLS_MIN_WIDTH = 128

    @property
    def blocked_shape(self):
        """(B, R) of the roofline blocked snapshot layout for this n:
        ``B = ceil(n / R)`` row blocks of the ``R``-minor storage (see
        ``apply_random`` 3-D input and ``to_blocked``)."""
        from rla4mor_tpu.ops.srht_pallas import _split_pqr

        n = self.l2_dim
        d = max(int(math.ceil(math.log2(max(n, 1)))), 0)
        R = min(1 << _split_pqr(d)[2], 1 << d)
        return -(-n // R), R

    def to_blocked(self, X) -> jax.Array:
        """Convert columns ``(n, m)`` (or ``(n,)``) to the ``(m, B, R)``
        zero-padded rows-blocked layout that ``apply_random`` sketches at
        the HBM stream rate. One-time physical re-tile — use it to STORE
        snapshot stacks, not per sketch (PERF.md round-3: skinny (n, m)
        column blocks cannot be contracted at roofline on TPU because the
        born layout lane-pads m and the R-contraction transposes; the
        blocked layout is the reductor's storage convention for big n)."""
        X = jnp.asarray(X)
        if X.ndim == 1:
            X = X[:, None]
        n, m = X.shape
        B, R = self.blocked_shape
        pad = B * R - n
        Xt = jnp.pad(X.T, ((0, 0), (0, pad)))
        return Xt.reshape(m, B, R)

    def apply_random(self, X, out_dtype=None):
        """``out_dtype`` (optional) emits the sketch in that dtype straight
        from the kernels' f32 accumulator — the bf16 offline mode
        (``CastInputOp``) requests f32 output for bf16 input so the only
        rounding is the input quantization, not an extra 2^-9 on the
        result (round-3 review finding)."""
        X = jnp.asarray(X)
        if out_dtype is not None and jnp.iscomplexobj(X):
            # never drop the imaginary part: a real out_dtype request on
            # complex data promotes (f32 -> c64 etc.)
            out_dtype = jnp.promote_types(jnp.dtype(out_dtype), X.dtype)
        if X.ndim == 3:
            # pre-blocked rows layout (m, B, R) with zero tail (see
            # to_blocked); returns (k, m) like the cols paths
            from rla4mor_tpu.ops.srht_pallas import srht_onepass_flat

            B, R = self.blocked_shape
            assert X.shape[1:] == (B, R), (X.shape, (B, R))
            out = srht_onepass_flat(
                X, self.range_dim, self.key,
                precision=self._kernel_precision(X.dtype), n=self.l2_dim,
                out_dtype=out_dtype,
            )
            return out.T
        single = X.ndim == 1
        n = X.shape[0]
        if n >= self._ONEPASS_MIN_DIM:
            # identical plan/scaling to srht for every n (equality tested
            # in tests/test_srht_pallas.py)
            from rla4mor_tpu.ops.srht_pallas import (
                srht_onepass_cols_bmk,
                srht_onepass_flat_cols,
                srht_onepass_vec,
            )

            prec = self._kernel_precision(X.dtype)
            if single:
                # the greedy hot shape: one new snapshot per extension —
                # dense 1-D layout, one (B, R) @ (R, K) dot
                return srht_onepass_vec(
                    X, self.range_dim, self.key, precision=prec,
                    out_dtype=out_dtype,
                )
            m = X.shape[1]
            if m >= self._COLS_MIN_WIDTH:
                return srht_onepass_flat_cols(
                    X, self.range_dim, self.key, precision=prec,
                    out_dtype=out_dtype,
                )
            return srht_onepass_cols_bmk(
                X, self.range_dim, self.key, precision=prec,
                out_dtype=out_dtype,
            )
        Xm = X[:, None] if single else X
        if out_dtype is not None and jnp.dtype(out_dtype).itemsize > \
                Xm.dtype.itemsize:
            # small-n 3-pass FWHT computes in the input dtype; upcast so
            # the passes accumulate at the requested width (XLA fuses the
            # convert into the first multiply — the HBM read stays narrow)
            Xm = Xm.astype(out_dtype)
        out = srht(Xm.T, self.range_dim, self.key).T
        if out_dtype is not None:
            out = out.astype(out_dtype)
        return out[:, 0] if single else out

    def random_matrix(self):
        return srht_rows(
            self.key, self.l2_dim, self.range_dim, dtype=default_dtype()
        )


@dataclass(frozen=True)
class IdentityEmbedding(Embedding):
    """Theta = Q: maps U to l2 w.r.t. the product, no randomness (reference
    rla/embeddings.py:274-315)."""

    def __init__(self, source_dim, sqrt_product=None, seed=0):
        l2 = sqrt_product.range_dim if sqrt_product is not None else source_dim
        object.__setattr__(self, "range_dim", l2)
        object.__setattr__(self, "source_dim", source_dim)
        object.__setattr__(self, "seed", seed)
        object.__setattr__(self, "sqrt_product", sqrt_product)

    def apply_random(self, X):
        return jnp.asarray(X)

    def random_matrix(self):
        return jnp.eye(self.l2_dim, dtype=default_dtype())

    def apply(self, U, mu=None):
        return self._apply_q(jnp.asarray(U))

    def with_seed(self, seed):
        # deterministic operator: redrawing is a no-op (reference
        # rla/embeddings.py:301-302, ``update`` is pass)
        return self

    def with_range_dim(self, range_dim):
        if int(range_dim) != self.range_dim:
            raise ValueError(
                "IdentityEmbedding has no adjustable sketch size: its "
                f"range dim is fixed to the l2 dim {self.range_dim}"
            )
        return self


@dataclass(frozen=True)
class BlockGaussianEmbedding(Embedding):
    """Gaussian embedding generated (and applied) in seeded row blocks.

    The reference stores only per-block seeds and regenerates k x n Gaussian
    blocks on demand to bound RAM (rla/embeddings.py:373-467, block seeds
    :402-407). Here every block is a row slice of the canonical tile-derived
    Omega (ops/seeding.py) — deterministic, collision-free, and literally
    equal to the corresponding rows of ``GaussianEmbedding`` and of the
    mesh-sharded Gaussian at the same seed (same sketch on any layout).
    """

    max_block_size: int = 128

    @classmethod
    def make(cls, source_dim, sqrt_product=None, range_dim=None, epsilon=None,
             delta=None, oblivious_dim=None, seed=0, max_block_size=128,
             complex_dtype=False):
        k = _resolve("gaussian", source_dim, range_dim, epsilon, delta,
                     oblivious_dim, complex_dtype)
        return cls(k, source_dim, seed, sqrt_product,
                   complex_dtype=bool(complex_dtype),
                   max_block_size=max_block_size)

    @property
    def block_sizes(self):
        m, r = divmod(self.range_dim, self.max_block_size)
        return tuple([self.max_block_size] * m + ([r] if r else []))

    @property
    def n_blocks(self) -> int:
        return len(self.block_sizes)

    def random_block(self, b: int) -> jax.Array:
        """(block_size, l2_dim) rows of the canonical Omega for block b."""
        from rla4mor_tpu.ops.seeding import gaussian_rows

        r0 = b * self.max_block_size
        r1 = r0 + self.block_sizes[b]
        return gaussian_rows(
            self.key, self.l2_dim, r0, r1, self._draw_dtype()
        ) / math.sqrt(self.range_dim)

    def block_source_array(self, b: int) -> jax.Array:
        """(n, block_size) columns = (Omega_b Q)^H — reference ``get_block``
        (rla/embeddings.py:463-467) as U-space vectors."""
        rb = self.random_block(b)
        if self.sqrt_product is None:
            return rb.conj().T
        return jnp.asarray(self.sqrt_product.apply_adjoint(rb.conj().T))

    def apply_random(self, X):
        X = jnp.asarray(X)
        parts = [
            jnp.matmul(self.random_block(b), X,
                       precision=jax.lax.Precision.HIGHEST)
            for b in range(self.n_blocks)
        ]
        return jnp.concatenate(parts, axis=0)

    def random_matrix(self):
        return jnp.concatenate(
            [self.random_block(b) for b in range(self.n_blocks)], axis=0
        )


@dataclass(frozen=True)
class StreamedGaussianEmbedding(Embedding):
    """Gaussian embedding applied by streaming COLUMN strips of Omega.

    Fills the big-n gap the reference's ``BlockGaussianEmbedding`` leaves
    open: its blocks are k-row slices of FULL width n (to bound the
    reference's RAM, rla/embeddings.py:373-467), so a single block is
    still O(n) memory — 8.6 GB at n = 1.7e7. Here Omega is generated in
    ``(k, block_cols)`` strips of the canonical tile grid (ops/seeding.py)
    inside a ``lax.scan``: peak memory is one strip + the accumulator, so
    a 1e7-DoF Gaussian sketch runs on ONE chip without ever materializing
    the 17 GB matrix. Same canonical derivation => literally the same
    operator as ``GaussianEmbedding`` / ``BlockGaussianEmbedding`` / the
    mesh-sharded Gaussian at the same seed.

    ``block_cols`` must be a multiple of the seeding column tile
    (ops/seeding.py TILE_N). Generation dtype is the input's dtype (like
    the sharded path); pass f64 inputs for f64-canonical draws.
    """

    block_cols: int = 1 << 16

    @classmethod
    def make(cls, source_dim, sqrt_product=None, range_dim=None, epsilon=None,
             delta=None, oblivious_dim=None, seed=0, block_cols=1 << 16,
             complex_dtype=False):
        k = _resolve("gaussian", source_dim, range_dim, epsilon, delta,
                     oblivious_dim, complex_dtype)
        return cls(k, source_dim, seed, sqrt_product,
                   complex_dtype=bool(complex_dtype), block_cols=block_cols)

    def apply_random(self, X):
        from rla4mor_tpu.ops.seeding import TILE_N, gaussian_cols_unscaled

        assert self.block_cols % TILE_N == 0, (self.block_cols, TILE_N)
        X = jnp.asarray(X)
        single = X.ndim == 1
        Xm = X[:, None] if single else X
        n, m = Xm.shape
        W = self.block_cols
        n_pad = -(-n // W) * W
        if n_pad != n:  # zero-pad: unused canonical columns multiply zeros
            Xm = jnp.pad(Xm, ((0, n_pad - n), (0, 0)))
        dtype = Xm.dtype
        if self.complex_dtype:
            dtype = jnp.promote_types(dtype, jnp.complex64)
        k, key = self.range_dim, self.key

        def step(acc, b):
            # c0 = b*W is width-aligned by construction (traced b, so the
            # static check can't see it): keep the tile-exact fast path
            strip = gaussian_cols_unscaled(key, k, b * W, W, dtype,
                                           aligned=True)
            xb = jax.lax.dynamic_slice(Xm, (b * W, 0), (W, m))
            return acc + jnp.matmul(
                strip, xb.astype(dtype),
                precision=jax.lax.Precision.HIGHEST,
            ), None

        acc0 = jnp.zeros((k, m), dtype)
        acc, _ = jax.lax.scan(step, acc0, jnp.arange(n_pad // W))
        out = acc / math.sqrt(k)
        return out[:, 0] if single else out

    def random_matrix(self):
        from rla4mor_tpu.ops.seeding import gaussian_matrix

        return gaussian_matrix(
            self.key, self.range_dim, self.l2_dim, self._draw_dtype()
        )


@dataclass(frozen=True)
class HwPrngGaussianEmbedding(Embedding):
    """Gaussian / Rademacher embedding drawn by the TPU *hardware* PRNG
    inside a Pallas kernel (ops/gaussian_pallas.py) — Omega only ever
    exists one VMEM strip at a time.

    Measured on the v5e (PERF.md): the canonical threefry generation caps
    Gaussian sketches at ~11 GB/s of snapshot read; this kernel's PRNG is
    free (const-fill == prng-fill timing) so wide sketches (>= 128
    columns) run at the full ~119 GB/s HBM read roofline (10.8x), and
    narrow ones at the MXU weight-stream floor (2.2-2.6x).

    LOUD CAVEAT — different bitstream: the operator is determined by
    ``(seed, range_dim, block_rows, dist)`` under the kernel's own draw
    order, NOT by the canonical ops/seeding.py derivation, so the same
    seed names a different Omega than ``GaussianEmbedding`` & friends.
    It is reproducible on TPU backends but is NOT portable to the CPU
    zoo; mixing it with canonical embeddings inside one reductor state is
    fine (each embedding is self-consistent), re-generating its sketches
    off-TPU is not.  ``dist="rademacher"`` draws +-1 entries (same
    oblivious-dim guarantees up to constants, reference
    rla/embeddings.py:148-164 formulas reused unchanged).
    """

    block_rows: int = 2048
    dist: str = "normal"

    @classmethod
    def make(cls, source_dim, sqrt_product=None, range_dim=None, epsilon=None,
             delta=None, oblivious_dim=None, seed=0, block_rows=2048,
             dist="normal", complex_dtype=False):
        assert not complex_dtype, (
            "HwPrngGaussianEmbedding is real-only (the kernel draws real "
            "f32 strips); use GaussianEmbedding for complex data"
        )
        k = _resolve("gaussian", source_dim, range_dim, epsilon, delta,
                     oblivious_dim, complex_dtype)
        return cls(k, source_dim, seed, sqrt_product,
                   block_rows=block_rows, dist=dist)

    def apply_random(self, X):
        from rla4mor_tpu.ops.gaussian_pallas import gaussian_sketch

        return gaussian_sketch(
            jnp.asarray(X), self.range_dim, self.seed,
            block_rows=self.block_rows, dist=self.dist,
        )

    def random_matrix(self):
        from rla4mor_tpu.ops.gaussian_pallas import gaussian_strip

        W = self.block_rows
        n_blocks = -(-self.l2_dim // W)
        strips = [
            gaussian_strip(self.range_dim, self.seed, b, block_rows=W,
                           dist=self.dist)
            for b in range(n_blocks)
        ]
        full = jnp.concatenate(strips, axis=1)[:, : self.l2_dim]
        return full / math.sqrt(self.range_dim)


@dataclass(frozen=True)
class VectorizedEmbedding(LinOp):
    """Sketch a whole (rows x cols) matrix by flattening then embedding.

    Reference ``EmbeddingVectorized`` (rla/embeddings.py:318-369): input is
    a (rows, cols) matrix (or its C-order flattening, index = i_row * cols +
    i_col, matching the reference's ``to_numpy().T.flatten()``); output is
    the inner embedding's sketch of the vectorization.
    """

    embedding: Embedding = None
    rows: int = 0
    cols: int = 0

    def __post_init__(self):
        assert self.embedding.source_dim == self.rows * self.cols

    @property
    def range_dim(self):
        return self.embedding.range_dim

    @property
    def source_dim(self):
        return self.rows * self.cols

    @property
    def seed(self):
        return self.embedding.seed

    def with_seed(self, seed):
        return dataclasses.replace(self, embedding=self.embedding.with_seed(seed))

    def with_range_dim(self, range_dim):
        return dataclasses.replace(
            self, embedding=self.embedding.with_range_dim(range_dim)
        )

    def apply_matrix(self, M) -> jax.Array:
        M = jnp.asarray(M)
        assert M.shape == (self.rows, self.cols), (M.shape, self.rows, self.cols)
        return self.embedding.apply(M.reshape(-1))

    def apply(self, U, mu=None):
        return self.embedding.apply(U)

    def apply_adjoint(self, V, mu=None):
        return self.embedding.apply_adjoint(V)

    def matrix(self):
        return self.embedding.matrix()


# reference-name alias (rla/embeddings.py:318 ``EmbeddingVectorized``)
EmbeddingVectorized = VectorizedEmbedding
