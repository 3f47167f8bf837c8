"""Sketched reduced-basis reductor.

Rebuild of the reference ``SketchedReductor`` (mor/sketched_reductor.py:22)
on the JAX affine calculus. Semantics preserved (SURVEY §2.3):

* state = sketched basis ``srb = Theta_primal @ U`` (k x r), optional full
  basis ``rb``, affine sketched residual ``Theta R^-1 A U`` (terms, k x r)
  and rhs ``Theta R^-1 b``, projected output functional;
* ``extend_basis`` appends snapshots and concatenates affine terms
  column-wise (reference :49-88);
* orthonormalization happens **in sketch space**: Gram-Schmidt on ``srb``,
  T = pinv(R) applied to rb, residual source and output (reference :90-118);
* ``reduce`` draws a fresh online embedding Phi (seeded ``with_seed``) and
  emits a Galerkin or minimal-residual :class:`StationaryROM` whose error
  estimator is the Phi-sketched residual norm (reference :121-208).

TPU-first differences: everything after the FOM-side applies is dense
term-stacked arrays, so the emitted ROM is a pytree whose online solve +
error estimate jit and vmap over parameter batches.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rla4mor_tpu.core.affine import (
    AffineDense,
    compose,
    concat_affine,
    materialize,
    project,
)
from rla4mor_tpu.core.linops import CastInputOp, ChainOp, LinOp
from rla4mor_tpu.core.orthonormalize import gram_schmidt
from rla4mor_tpu.core.products import Product
from rla4mor_tpu.models.stationary import (
    ResidualErrorEstimator,
    StationaryFOM,
    StationaryROM,
)
from rla4mor_tpu.ops.embeddings import Embedding, IdentityEmbedding
from rla4mor_tpu.utils.logger import get_logger


@jax.jit
def _adaptive_rel_dev(rom, est2, mus):
    """Max relative deviation between the ROM's estimator and an
    independent check estimator over a mu batch. Module-level so jax.jit
    caches across ``reduce_adaptive`` calls (a per-call closure would
    recompile every invocation — minutes on the remote-compile TPU)."""

    def one(mu):
        u = rom.solve(mu)
        e1 = rom.error_estimator.estimate_error(u, mu)
        e2 = est2.estimate_error(u, mu)
        return jnp.abs(e1 - e2) / jnp.maximum(
            jnp.maximum(e1, e2), jnp.finfo(e1.dtype).tiny
        )

    return jnp.max(jax.vmap(one)(mus))


class SketchedReductor:
    """Online-efficient sketched RB with Galerkin / minres projection."""

    def __init__(
        self,
        fom: StationaryFOM,
        embedding_primal: Optional[Embedding] = None,
        embedding_online: Optional[Embedding] = None,
        product: Optional[Product] = None,
        save_rb: bool = True,
        orthonormalize: bool = True,
        projection: str = "galerkin",
        log_level: int = 20,
        offline_dtype=None,
        truncation_rtol: float = 0.0,
    ):
        """``offline_dtype`` (e.g. ``jnp.bfloat16``): store snapshots and
        feed every primal-embedding sketch at that dtype — halves the HBM
        bytes the offline stage moves on TPU (PERF.md "Known gaps" #4) —
        while all sketched quantities (srb, residual stacks) accumulate
        and live in f32.  Accuracy envelope: bf16 inputs perturb snapshots
        by ~2^-9 relative, so error estimates carry an O(1e-3) relative
        floor — fine for greedy selection and 3-digit certification;
        tests/test_bf16_offline.py pins it.  Complex snapshots are left
        untouched (no complex bf16).

        ``truncation_rtol``: drop basis columns whose orthogonalized
        direction has sketch norm < rtol * column norm (the vector-removal
        semantics the reference inherits from pyMOR's ``gram_schmidt``
        rtol, reference mor/sketched_reductor.py:94).  0.0 (default)
        keeps every column — near-dependent directions become noise at
        working precision and the reduced Galerkin system can turn
        numerically singular.  Recommended for redundant snapshot sets:
        ~1e-13 at f64, ~sqrt(eps)≈3e-4 at f32 offline."""
        assert projection in ("galerkin", "minres")
        self.fom = fom
        self.offline_dtype = (
            jnp.dtype(offline_dtype) if offline_dtype is not None else None
        )
        n = fom.solution_dim
        self.product = product if product is not None else Product.identity(n)
        self.embedding_primal = (
            embedding_primal
            if embedding_primal is not None
            else IdentityEmbedding(n)
        )
        self.embedding_online = (
            embedding_online
            if embedding_online is not None
            else IdentityEmbedding(self.embedding_primal.range_dim)
        )
        self.save_rb = save_rb
        self.orthonormalize = orthonormalize
        self.projection = projection
        self.truncation_rtol = float(truncation_rtol)
        self.logger = get_logger("mor.sketched_reductor", log_level)

        k = self.embedding_primal.range_dim
        self.mu_basis: list = []
        self.srb = jnp.zeros((k, 0))
        self.rb = jnp.zeros((n, 0))
        self.residual_lhs: Optional[AffineDense] = None  # (T, k, r)
        self.residual_rhs: Optional[AffineDense] = None  # (Tb, k, 1)
        self.output_functional: Optional[AffineDense] = None  # (To, q, r)
        # Theta o R^-1 chain reused for every sketch; in the low-precision
        # offline mode the embedding reads its input at offline_dtype and
        # emits f32 (CastInputOp skips complex inputs)
        self._sketch_embedding: LinOp = (
            self.embedding_primal if self.offline_dtype is None
            else CastInputOp(self.embedding_primal, self.offline_dtype)
        )
        self._sketch_map: LinOp = ChainOp(
            (self._sketch_embedding, self.product.inv)
        )

    # ------------------------------------------------------------------ state
    @property
    def basis_size(self) -> int:
        return self.srb.shape[1]

    def extend_basis(self, U, mu=None) -> None:
        """Append snapshot columns U (n, m) to the sketched state."""
        U = jnp.asarray(U)
        if U.ndim == 1:
            U = U[:, None]
        if mu is not None:
            self.mu_basis.extend([mu] * U.shape[1])

        if self.save_rb:
            Ustore = U
            if self.offline_dtype is not None and not jnp.iscomplexobj(U):
                Ustore = U.astype(self.offline_dtype)
            self.rb = jnp.concatenate(
                [self.rb.astype(Ustore.dtype), Ustore], axis=1
            )

        self.logger.info("project the output functional")
        if self.fom.output_functional is not None:
            out_proj = project(self.fom.output_functional, None, U)
            if self.output_functional is not None:
                out_proj = concat_affine(
                    (self.output_functional, out_proj), axis=1
                )
            self.output_functional = out_proj

        self.logger.info("sketch the basis")
        su = jnp.asarray(self._sketch_embedding.apply(U))
        self.srb = jnp.concatenate([self.srb.astype(su.dtype), su], axis=1)

        self.logger.info("sketch the residual")
        sop = project(compose(self._sketch_map, self.fom.operator), None, U)
        if self.residual_lhs is None:
            self.residual_lhs = sop
            self.residual_rhs = materialize(
                compose(self._sketch_map, self.fom.rhs)
            )
        else:
            self.residual_lhs = concat_affine((self.residual_lhs, sop), axis=1)

        if self.orthonormalize:
            self.orthonormalize_basis(offset=self.basis_size - U.shape[1])

    def orthonormalize_basis(
        self, offset: int = 0, T=None, return_T: bool = False,
        truncation_rtol: Optional[float] = None,
    ):
        """Orthonormalize ``srb`` (l2, sketch space) and push the change of
        basis T = pinv(R) through rb, residual and output (reference
        mor/sketched_reductor.py:90-118).

        ``truncation_rtol`` (default: the reductor's) > 0 additionally
        DROPS columns whose orthogonalized direction fell below
        rtol * column norm — pyMOR's vector-removal semantics, which the
        reference inherits through ``gram_schmidt(..., rtol=...)``.  T
        then has shape (r_old, r_kept)."""
        if T is None:
            Q, R = gram_schmidt(self.srb, offset=offset, return_R=True)
            T = jnp.linalg.pinv(R)
            rtol = (self.truncation_rtol if truncation_rtol is None
                    else float(truncation_rtol))
            if rtol > 0.0 and self.basis_size > offset:
                Rh = np.asarray(R)
                col = np.linalg.norm(Rh, axis=0)
                diag = np.abs(np.diagonal(Rh))
                keep = diag > rtol * np.maximum(
                    col, np.finfo(col.dtype).tiny
                )
                keep[:offset] = True
                if not keep.all():
                    self.logger.info(
                        "truncating %d near-dependent basis column(s) "
                        "(rtol=%.1e)", int((~keep).sum()), rtol,
                    )
                    Q = Q[:, keep]
                    T = T[:, keep]
                    if len(self.mu_basis) == keep.size:
                        self.mu_basis = [
                            m for m, k in zip(self.mu_basis, keep) if k
                        ]
        else:
            Q = self.srb @ T
        self.srb = Q
        if self.save_rb and self.rb.shape[1]:
            rb_dtype = self.rb.dtype
            self.rb = (self.rb @ T.astype(
                jnp.promote_types(rb_dtype, T.dtype)
            )).astype(rb_dtype)
        if self.residual_lhs is not None:
            self.residual_lhs = self.residual_lhs.rmul(T)
        if self.output_functional is not None:
            self.output_functional = self.output_functional.rmul(T)
        return T if return_T else None

    def truncate_basis(self, r: int) -> None:
        """Keep only the FIRST ``r`` basis columns (no-op if r >= size).

        Requires an orthonormalized sketched basis (``orthonormalize=True``
        or a prior :meth:`orthonormalize_basis` call): leading-``r``
        slicing is then the Galerkin restriction onto the leading
        subspace, pushed consistently through srb / rb / residual /
        output.  Use to ship FIXED-dimension artifacts — e.g. a nightly
        model refresh at the same reduced dims as the previous artifact,
        so :func:`rla4mor_tpu.serve.serve_batch` hot-swaps it with zero
        recompiles (jit keys on leaf shapes).  The reference has no
        analog (its online stage is shapeless per-mu Python)."""
        if r < 0:
            raise ValueError(f"truncate_basis: negative rank {r}")
        if r >= self.basis_size:
            return
        T = jnp.eye(self.basis_size, r, dtype=self.srb.dtype)
        self.orthonormalize_basis(T=T)
        self.mu_basis = self.mu_basis[:r]

    # ------------------------------------------------------------------ reduce
    def _sketch_residual(
        self, embedding: Embedding
    ) -> Tuple[AffineDense, AffineDense]:
        lhs = compose(embedding, self.residual_lhs)
        rhs = compose(embedding, self.residual_rhs)
        return lhs, rhs

    def reduce(
        self,
        embedding: Optional[Embedding] = None,
        seed=None,
        ls_rcond: float = 1e-13,
    ) -> StationaryROM:
        """Emit the online ROM, drawing a fresh online sketch.

        Galerkin (reference :154-168) or minres with two independent online
        sketches — one for the system, one for the estimator (reference
        :170-187)."""
        if self.basis_size == 0:
            return self._reduce_empty()

        if self.projection == "galerkin":
            if embedding is None:
                embedding = self.embedding_online.with_seed(seed)
            return self._reduce_galerkin(embedding)

        if not isinstance(seed, (tuple, list)):
            seed = (seed, None if seed is None else seed + 1)
        if embedding is None:
            embedding = (
                self.embedding_online.with_seed(seed[0]),
                self.embedding_online.with_seed(seed[1]),
            )
        return self._reduce_minres(embedding, ls_rcond)

    def _reduce_galerkin(self, embedding: Embedding) -> StationaryROM:
        est_lhs, est_rhs = self._sketch_residual(embedding)
        estimator = ResidualErrorEstimator(est_lhs, est_rhs)
        reduced_lhs = self.residual_lhs.lmul(self.srb.conj().T)
        reduced_rhs = self.residual_rhs.lmul(self.srb.conj().T)
        return StationaryROM(
            reduced_lhs,
            reduced_rhs,
            output_functional=self.output_functional,
            error_estimator=estimator,
            ls=False,
        )

    def _reduce_minres(self, embeddings,
                       ls_rcond: float = 1e-13) -> StationaryROM:
        sys_lhs, sys_rhs = self._sketch_residual(embeddings[0])
        est_lhs, est_rhs = self._sketch_residual(embeddings[1])
        estimator = ResidualErrorEstimator(est_lhs, est_rhs)
        return StationaryROM(
            sys_lhs,
            sys_rhs,
            output_functional=self.output_functional,
            error_estimator=estimator,
            ls=True,
            ls_rcond=ls_rcond,
        )

    def reduce_adaptive(
        self,
        mus_batched,
        seed=None,
        tol: float = 0.2,
        max_rounds: int = 3,
        ls_rcond: float = 1e-13,
    ):
        """Adaptive online-sketch refresh: emit the ROM, cross-validate its
        error estimator against an INDEPENDENT online sketch over a
        parameter batch, and double the online sketch size until the two
        agree to relative ``tol`` (or the online dim reaches the primal
        sketch dim, where the sketch is exact up to the epsilon of the
        primal embedding).

        Rationale: the reference draws one online Phi per ``reduce`` with a
        user-guessed size (mor/sketched_reductor.py:128-136) — if k_online
        is too small the estimator is silently unreliable.  Two
        independent draws both concentrate around the true sketched
        residual norm, so their spread is a computable a-posteriori proxy
        for the embedding quality. Accepted sizes persist in
        ``self.embedding_online`` (the "refresh"), so later plain
        ``reduce`` calls keep the certified size.

        Returns ``(rom, info)`` with ``info = {"online_dim", "max_rel_dev",
        "rounds", "certified"}``.
        """
        assert self.basis_size > 0, "adaptive reduce needs a nonempty basis"
        base_seed = 0 if seed is None else int(seed)
        k_max = self.embedding_primal.range_dim
        rel_dev = _adaptive_rel_dev
        info = {}
        for rnd in range(max_rounds + 1):
            s = base_seed + 2 * rnd
            rom = self.reduce(seed=s, ls_rcond=ls_rcond)
            # check sketch on a disjoint seed stream (minres reduce() uses
            # (s, s+1) itself)
            est2 = ResidualErrorEstimator(
                *self._sketch_residual(
                    self.embedding_online.with_seed(base_seed + 100003 + rnd)
                )
            )
            dev = float(rel_dev(rom, est2, mus_batched))
            k_now = self.embedding_online.range_dim
            info = {
                "online_dim": k_now,
                "max_rel_dev": dev,
                "rounds": rnd + 1,
                "certified": dev <= tol,
            }
            self.logger.info(
                "adaptive online sketch: k_online=%d max_rel_dev=%.3e",
                k_now, dev,
            )
            if dev <= tol or k_now >= k_max:
                if dev > tol:
                    self.logger.warning(
                        "online sketch at primal size %d still deviates "
                        "%.2e > tol %.2e", k_now, dev, tol
                    )
                return rom, info
            if rnd == max_rounds:
                # rounds exhausted: do NOT double — keep embedding_online
                # at the size that produced the returned (uncertified) ROM
                self.logger.warning(
                    "adaptive online sketch: rounds exhausted at "
                    "k_online=%d with max_rel_dev=%.2e > tol %.2e",
                    k_now, dev, tol,
                )
                return rom, info
            self.embedding_online = self.embedding_online.with_range_dim(
                min(2 * k_now, k_max)
            )
        raise AssertionError("unreachable")

    def _reduce_empty(self) -> StationaryROM:
        """Classical fallback for the empty basis (reference
        mor/sketched_reductor.py:189-208): project with the empty basis and
        build the exact Riesz residual estimator, so the emitted ROM
        estimates ||b(mu)||_{R^-1}-type residuals instead of raising."""
        from rla4mor_tpu.mor.classical_reductor import ClassicalReductor

        self.logger.info("empty basis: classical residual reduction")
        red = ClassicalReductor(self.fom, product=self.product)
        return red.reduce()

    def extend_basis_blocked(self, U, max_block_size: int = 64, mu=None):
        """Stream snapshot columns in blocks to bound peak memory
        (reference's blockwise RAM strategy, utilities/utilities.py:43-44;
        the FOM-side applies and sketches then never hold more than
        ``max_block_size`` columns at once)."""
        U = jnp.asarray(U)
        if U.ndim == 1:
            U = U[:, None]
        for i in range(0, U.shape[1], max_block_size):
            self.extend_basis(U[:, i : i + max_block_size], mu=mu)

    def extend_basis_streamed(self, blocks, mu=None) -> None:
        """Consume an ITERATOR of snapshot column blocks: peak memory is one
        block plus the sketched state, so the snapshot matrix never has to
        exist whole (HBM/host-RAM-larger-than-memory streaming; the
        reference's blockwise RAM strategy taken to its limit,
        utilities/utilities.py:43-44)."""
        for block in blocks:
            self.extend_basis(block, mu=mu)

    # ------------------------------------------------------------------ recon
    def reconstruct(self, u_reduced) -> jax.Array:
        """Lift reduced coefficients to the full space (needs save_rb)."""
        assert self.save_rb, "reconstruct requires save_rb=True"
        u_reduced = jnp.asarray(u_reduced)
        dt = jnp.promote_types(self.rb.dtype, u_reduced.dtype)
        return self.rb.astype(dt) @ u_reduced.astype(dt)
