"""Pad-to-r_max, zero-retrace offline mode of the sketched reductor.

On the TPU platform every new array shape is a (remote, minutes-slow)
compile, so the plain :class:`~rla4mor_tpu.mor.sketched_reductor.
SketchedReductor` — whose state grows a column per greedy extension —
retraces constantly.  Here ALL offline state is preallocated at ``r_max``
columns with a fill counter:

* ``extend_basis`` is ONE jitted fixed-shape step: sketch-space masked
  incremental CGS-2 (the same update the sharded driver runs in-jit,
  parallel/driver.py:119-136) applied simultaneously to the sketched basis,
  the sketched residual stack, the projected output and the saved basis;
* ``sweep`` is the fixed-shape masked ROM solve + sketched-error estimate
  over a parameter batch (one compile for the whole greedy run);
* ``reduce`` slices the live columns and delegates to the standard
  :class:`SketchedReductor` ROM emission, so the emitted ROM is identical
  in kind to the plain reductor's.

Semantics match SketchedReductor with ``orthonormalize=True`` extending one
column at a time (equivalence-tested); reference counterpart: the plain
reductor's extend/orthonormalize loop, mor/sketched_reductor.py:49-118.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from rla4mor_tpu.core.affine import AffineDense, compose, materialize
from rla4mor_tpu.core.linops import ChainOp
from rla4mor_tpu.core.parameters import Mu, eval_coefficients, mu_stack
from rla4mor_tpu.core.products import Product
from rla4mor_tpu.models.stationary import StationaryFOM, StationaryROM
from rla4mor_tpu.ops.embeddings import Embedding, IdentityEmbedding
from rla4mor_tpu.utils.logger import get_logger


class _PaddedState(NamedTuple):
    srb: jax.Array      # (k, r_max) sketched basis, zero-padded
    res_lhs: jax.Array  # (T, k, r_max) sketched residual columns
    out: jax.Array      # (To, q, r_max) projected output (To=0 if none)
    rb: jax.Array       # (n, r_max) saved basis ((0, r_max) if not saved)
    ncols: jax.Array    # () int32 fill counter


@partial(jax.jit, static_argnames=("r_max",), donate_argnums=(0,))
def _append_column(state: _PaddedState, su, sres, out_col, u_col,
                   r_max: int) -> _PaddedState:
    """Masked incremental CGS-2 append (fixed shapes, zero retraces).

    Rank-deficiency guard: a column that keeps less than ~100*eps of its
    original sketch norm after the two orthogonalization passes is already
    (numerically) in the basis — it is SKIPPED (zero column written,
    ``ncols`` unchanged, so the next append overwrites it).  This matches
    the plain ``SketchedReductor``'s ``pinv(R)`` push-through, which maps
    such directions to zero, and keeps the masked reduced systems
    nonsingular when the greedy re-selects a resolved parameter."""
    c = state.ncols
    col_mask = (jnp.arange(r_max) < c).astype(su.dtype)
    nrm0 = jnp.linalg.norm(su)
    for _ in range(2):  # one re-orthogonalization pass
        coeffs = (state.srb.conj().T @ su) * col_mask
        su = su - state.srb @ coeffs
        sres = sres - jnp.einsum("tkr,r->tk", state.res_lhs, coeffs)
        out_col = out_col - jnp.einsum("oqr,r->oq", state.out, coeffs)
        u_col = u_col - state.rb @ coeffs
    nrm = jnp.linalg.norm(su)
    real_dtype = jnp.real(su).dtype
    tol = 100 * jnp.finfo(real_dtype).eps * nrm0
    ok = (nrm > tol) & (c < r_max) & jnp.isfinite(nrm)
    scale = jnp.where(
        ok, 1.0 / jnp.maximum(nrm, jnp.finfo(real_dtype).tiny), 0.0
    ).astype(su.dtype)
    c_write = jnp.minimum(c, r_max - 1)  # keep the write in bounds when full

    def put(arr, col, axis):
        old = jnp.take(arr, c_write, axis=axis)
        new = jnp.where(ok, col, old)  # skipped append leaves state intact
        idx = [slice(None)] * arr.ndim
        idx[axis] = c_write
        return arr.at[tuple(idx)].set(new)

    return _PaddedState(
        srb=put(state.srb, su * scale, 1),
        res_lhs=put(state.res_lhs, sres * scale, 2),
        out=put(state.out, out_col * scale, 2),
        rb=put(state.rb, u_col * scale, 1),
        ncols=c + ok.astype(c.dtype),
    )


def build_masked_sweep(r_max: int, minres: bool, op_coeffs, rhs_coeffs):
    """Jitted masked (solve + Phi-sketched estimate) sweep over a mu batch.

    The ONE compile shared by the whole no-retrace greedy run: reduced
    systems are padded to ``r_max`` columns and masked by the live column
    count. ``minres`` solves the Phi1-sketched system by masked min-norm
    least squares (zeroed pad columns give zero coefficients under the
    SVD pseudo-inverse); galerkin solves the square masked system with an
    identity filler on the dead diagonal. Shared by
    ``PaddedSketchedReductor.sweep`` and ``mor.greedy.rb_greedy_padded``.
    """

    @jax.jit
    def sweep(srb, res_lhs, rhs_stack, phi1, phi2, ncols, mus):
        col_mask = (jnp.arange(r_max) < ncols).astype(srb.dtype)

        def one(mu):
            theta = eval_coefficients(op_coeffs, mu).astype(srb.dtype)
            res = jnp.einsum("t,tkr->kr", theta, res_lhs) * col_mask
            rhs = jnp.einsum(
                "t,tk->k",
                eval_coefficients(rhs_coeffs, mu).astype(srb.dtype),
                rhs_stack,
            )
            if minres:
                A = phi1 @ res
                b = phi1 @ rhs
                U_, s_, Vh_ = jnp.linalg.svd(A, full_matrices=False)
                rcond = jnp.maximum(
                    jnp.asarray(1e-13, s_.dtype),
                    100 * jnp.finfo(s_.dtype).eps,
                )  # dtype-aware: 1e-13 is f32 noise amplified by 1/s
                s_inv = jnp.where(s_ > rcond * jnp.max(s_), 1.0 / s_, 0.0)
                y = Vh_.conj().T @ (s_inv * (U_.conj().T @ b))
            else:
                A = srb.conj().T @ res
                A = A * col_mask[:, None] + jnp.diag(1.0 - col_mask)
                b = (srb.conj().T @ rhs) * col_mask
                y = jnp.linalg.solve(A, b)
            est = jnp.linalg.norm(phi2 @ (res @ y - rhs))
            return est

        return jax.vmap(one)(mus)

    return sweep


class PaddedSketchedReductor:
    """Sketched RB reductor with preallocated r_max-column state."""

    def __init__(
        self,
        fom: StationaryFOM,
        embedding_primal: Optional[Embedding] = None,
        embedding_online: Optional[Embedding] = None,
        product: Optional[Product] = None,
        r_max: int = 20,
        save_rb: bool = True,
        projection: str = "galerkin",
        log_level: int = 20,
    ):
        assert projection in ("galerkin", "minres")
        self.fom = fom
        n = fom.solution_dim
        self.product = product if product is not None else Product.identity(n)
        self.embedding_primal = (
            embedding_primal if embedding_primal is not None
            else IdentityEmbedding(n)
        )
        self.embedding_online = (
            embedding_online if embedding_online is not None
            else IdentityEmbedding(self.embedding_primal.range_dim)
        )
        self.r_max = r_max
        self.save_rb = save_rb
        self.projection = projection
        self.logger = get_logger("mor.padded_reductor", log_level)
        self.mu_basis: list = []

        k = self.embedding_primal.range_dim
        T = len(fom.operator.terms)
        self._sketch_map = ChainOp((self.embedding_primal, self.product.inv))
        rhs = materialize(compose(self._sketch_map, fom.rhs))
        self.residual_rhs = rhs  # (Tb, k, 1) AffineDense
        dt = rhs.stack.dtype
        if fom.output_functional is not None:
            of = fom.output_functional
            To = of.n_terms if hasattr(of, "n_terms") else len(of.terms)
            q = of.range_dim
        else:
            To, q = 0, 0
        self.state = _PaddedState(
            srb=jnp.zeros((k, r_max), dt),
            res_lhs=jnp.zeros((T, k, r_max), dt),
            out=jnp.zeros((To, q, r_max), dt),
            rb=jnp.zeros((n if save_rb else 0, r_max), dt),
            ncols=jnp.asarray(0, jnp.int32),
        )
        self._sweep_fn = None

    # ------------------------------------------------------------------ state
    @property
    def basis_size(self) -> int:
        return int(self.state.ncols)

    def extend_basis(self, U, mu=None) -> None:
        """Append snapshot columns; every append is the SAME jitted step."""
        U = jnp.asarray(U)
        if U.ndim == 1:
            U = U[:, None]
        assert self.basis_size + U.shape[1] <= self.r_max, "r_max exceeded"
        if mu is not None:
            self.mu_basis.extend([mu] * U.shape[1])
        from rla4mor_tpu.core.affine import project

        dt = self.state.srb.dtype
        for j in range(U.shape[1]):
            u = U[:, j].astype(dt)
            # exactly SketchedReductor's sketches, one column at a time
            su = jnp.asarray(self.embedding_primal.apply(u)).astype(dt)
            sop = project(
                compose(self._sketch_map, self.fom.operator), None, u[:, None]
            )
            sres = sop.stack[:, :, 0].astype(dt)  # (T, k)
            if self.fom.output_functional is not None:
                out_col = project(
                    self.fom.output_functional, None, u[:, None]
                ).stack[:, :, 0].astype(dt)  # (To, q)
            else:
                out_col = jnp.zeros((0, 0), dt)
            u_col = u if self.save_rb else jnp.zeros((0,), dt)
            self.state = _append_column(
                self.state, su, sres, out_col, u_col, self.r_max
            )

    # ------------------------------------------------------------------ sweep
    def _build_sweep(self):
        return build_masked_sweep(
            self.r_max,
            self.projection == "minres",
            self.fom.operator.coefficients,
            self.residual_rhs.coefficients,
        )

    def sweep(self, mus_batched: Mu, seed: int) -> np.ndarray:
        """Masked ROM solve + sketched-error estimate over a batch (one
        compile for the whole greedy run; fresh online sketch per call)."""
        if self._sweep_fn is None:
            self._sweep_fn = self._build_sweep()
        dt = self.state.srb.dtype
        phi1 = jnp.asarray(
            self.embedding_online.with_seed(seed).matrix()
        ).astype(dt)
        phi2 = (
            jnp.asarray(
                self.embedding_online.with_seed(seed + 1).matrix()
            ).astype(dt)
            if self.projection == "minres"
            else phi1
        )
        return np.asarray(
            self._sweep_fn(
                self.state.srb, self.state.res_lhs,
                self.residual_rhs.stack[:, :, 0], phi1, phi2,
                self.state.ncols, mus_batched,
            )
        )

    # ------------------------------------------------------------------ reduce
    def to_sketched_reductor(self):
        """View the live columns as a standard SketchedReductor (shares the
        ROM-emission code path; one final shape-dependent compile)."""
        from rla4mor_tpu.mor.sketched_reductor import SketchedReductor

        red = SketchedReductor(
            self.fom,
            embedding_primal=self.embedding_primal,
            embedding_online=self.embedding_online,
            product=self.product,
            save_rb=self.save_rb,
            orthonormalize=False,
            projection=self.projection,
        )
        r = self.basis_size
        red.mu_basis = list(self.mu_basis)
        red.srb = self.state.srb[:, :r]
        if self.save_rb:
            red.rb = self.state.rb[:, :r]
        red.residual_lhs = AffineDense(
            self.state.res_lhs[:, :, :r], self.fom.operator.coefficients
        )
        red.residual_rhs = self.residual_rhs
        if self.fom.output_functional is not None:
            red.output_functional = AffineDense(
                self.state.out[:, :, :r],
                self.fom.output_functional.coefficients,
            )
        return red

    def reduce(self, embedding=None, seed=None, **kw) -> StationaryROM:
        return self.to_sketched_reductor().reduce(
            embedding=embedding, seed=seed, **kw
        )

    def reconstruct(self, u_reduced) -> jax.Array:
        assert self.save_rb, "reconstruct requires save_rb=True"
        r = self.basis_size
        return self.state.rb[:, :r] @ jnp.asarray(u_reduced)


def rb_greedy_no_retrace(
    fom,
    reductor: PaddedSketchedReductor,
    training_set: Sequence[Mu],
    max_extensions: Optional[int] = None,
    atol: float = 0.0,
    rtol: float = 0.0,
    online_seed: int = 0,
    log_level: int = 20,
):
    """Weak greedy on the padded reductor: after the first iteration the
    only compiles are cache hits (extend step + sweep, both fixed-shape).
    Same seed schedule / selection rule as mor.greedy.rb_greedy."""
    from rla4mor_tpu.mor.greedy import GreedyResult
    import time

    logger = get_logger("mor.greedy", log_level)
    result = GreedyResult(rom=None)
    mus_batched = mu_stack(list(training_set))
    max_extensions = (
        reductor.r_max if max_extensions is None else max_extensions
    )
    assert max_extensions <= reductor.r_max

    mu0 = training_set[0]
    t0 = time.perf_counter()
    reductor.extend_basis(fom.solve(mu0), mu=mu0)
    result.extension_times.append(time.perf_counter() - t0)
    result.selected_mus.append(mu0)

    first_max = None
    for it in range(1, max_extensions):
        estimates = reductor.sweep(mus_batched, online_seed + it)
        imax = int(np.argmax(estimates))
        emax = float(estimates[imax])
        result.max_estimates.append(emax)
        if first_max is None:
            first_max = emax
        logger.info("greedy(no-retrace) it=%d basis=%d max_est=%.3e", it,
                    reductor.basis_size, emax)
        if emax <= atol or (rtol and emax <= rtol * first_max):
            break
        mu = training_set[imax]
        t0 = time.perf_counter()
        reductor.extend_basis(fom.solve(mu), mu=mu)
        result.extension_times.append(time.perf_counter() - t0)
        result.selected_mus.append(mu)

    result.rom = reductor.reduce(seed=online_seed + max_extensions)
    result.iterations = len(result.selected_mus)
    return result
