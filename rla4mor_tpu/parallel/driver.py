"""Fully-sharded sketched-greedy training step.

One greedy iteration of the sketched RB method as a single jitted SPMD
program over a 2-D mesh ('dof', 'mu'):

* the FOM solve is matrix-free Jacobi-CG on the stencil operator with the
  node grid sharded over 'dof' (XLA inserts halo exchanges);
* the snapshot and its residual columns are sketched by the DoF-sharded
  Gaussian embedding (per-shard fold_in generation + psum over 'dof');
* the ROM assembly/solve/error-estimation is small and dense; the
  training-set error sweep vmaps over a parameter batch sharded over 'mu'.

State is padded to ``r_max`` columns with a fill counter so greedy
iterations never retrace (SURVEY §7 hard part 5).
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from rla4mor_tpu.models.stencil import StencilThermalBlock
from rla4mor_tpu.parallel.sharded_sketch import gaussian_sketch_sharded


class GreedyState(NamedTuple):
    srb: jax.Array        # (k, r_max) sketched basis (zero-padded)
    res_lhs: jax.Array    # (T, k, r_max) sketched residual columns
    res_rhs: jax.Array    # (k,) sketched rhs
    ncols: jax.Array      # () int32 fill counter
    # (r_max, N+1, N+1) full basis grids, kept only for score="exact"
    # (None otherwise; invariant: srb[:, j] == sketch(U[j]))
    U: jax.Array | None = None
    # constant FOM array leaves (fom.const_arrays()), threaded through
    # the jitted step as an ARGUMENT pytree instead of closure capture:
    # closure-captured concrete arrays are baked into the HLO as
    # literals, and e.g. the 87 fine-grid EIM basis fields at 4.2M DoF
    # are ~1.5 GB — the remote compile transport rejects the program
    # (same failure class as the iota-traced stencil masks, PERF.md)
    aux: dict | None = None
    # (n_out, r_max) reduced output columns out[:, j] = l(U[:, j]) —
    # tracked through the same masked Gram-Schmidt combination as srb
    # (l is linear, so GS on the grids commutes with evaluating l), at
    # O(n_out) extra state; lets state_to_rom() ship a ROM with an
    # output functional without ever storing the basis. None when the
    # FOM declares no `output(u)`.
    out: jax.Array | None = None


def init_state(k: int, r_max: int, n_terms: int, res_rhs,
               U0=None, aux=None, out0=None) -> GreedyState:
    dt = res_rhs.dtype
    return GreedyState(
        srb=jnp.zeros((k, r_max), dt),
        res_lhs=jnp.zeros((n_terms, k, r_max), dt),
        res_rhs=res_rhs,
        ncols=jnp.asarray(0, jnp.int32),
        U=U0,
        aux=aux,
        out=out0,
    )


def make_sharded_greedy_step(
    fom: StencilThermalBlock,
    mesh: Mesh,
    key: jax.Array,
    k: int = 32,
    r_max: int = 8,
    cg_tol: float = 1e-6,
    cg_maxiter: int = 500,
    cg_precond: str = "jacobi",
    sketch: str = "gaussian",
    score: str = "sketched",
    exact_dtype=jnp.float64,
    projection: str = "galerkin",
    model_error=None,
):
    """Build (init_state, step) for the sharded greedy. ``step(state, mu,
    mu_batch)`` solves the FOM at mu, extends the sketched state, and
    returns ROM error estimates over the (mu-sharded) batch.

    ``fom`` is any grid FOM following the stencil protocol
    (models/stencil.py, models/stencil_advection.py, models/stencil3d.py):
    ``n_terms``, ``solution_shape``, ``theta_vector(mu)``,
    ``apply(mu, u)`` / ``apply_term(t, u)`` on solution-shaped grids of
    any rank — (M, M) or (M, M, M); the leading grid axis is sharded
    over 'dof' — plus ``rhs(dtype=None)``, ``jacobi_diag(mu)``,
    ``is_spd``. Non-SPD
    families (``is_spd = False``, e.g. advection-diffusion) are solved
    by device BiCGStab instead of CG; ``cg_precond="mg"`` additionally
    needs ``kappa(mu)`` (the SPD thermal block).

    ``projection``: ``"galerkin"`` (default) solves the sketched
    Galerkin system; ``"minres"`` solves the sketched least-squares
    system (SVD lstsq) — the right choice for non-SPD families, where
    Galerkin has no best-approximation guarantee (reference
    mor/sketched_reductor.py:170-187 semantics).

    ``sketch``: ``"gaussian"`` (per-shard generated Omega + psum) or
    ``"srht"`` (the flat one-psum sharded SRHT). The Gaussian materializes
    a (k, n_local) strip per shard — 17 GB at k=256, n=16.8M — so the
    matrix-free SRHT is the only option at >=1e7 DoF on one chip (its
    plan memory is O(k * R), and the contraction streams the snapshot at
    the HBM roofline; PERF.md round-3 capstone).

    ``score``: how the per-mu batch error estimates are computed.
    ``"sketched"`` (default, online-efficient) differences the f32
    pre-sketched affine residual columns — at >=1e7 DoF the O(1)-sized
    pieces cancel against each other and the estimates floor at
    ~sqrt(n)*eps_f32 (PERF.md round-3 capstone: median drifts back up to
    ~4e-3 past r=3). ``"exact"`` keeps the (GS-combined) basis grids in
    the state and scores each candidate by the TRUE residual norm
    ``||A(mu) (U y) - b||_2`` recomputed matrix-free in ``exact_dtype``
    (f64 kappa/apply — the "f64 refinement" mode): O(n) per candidate
    instead of O(k), one stencil pass per mu, floor ~eps_f32 * ||basis||
    (the f32 storage of U), 3-4 orders below the sketched floor. The ROM
    coefficients y still come from the sketched Galerkin system — only
    the scoring is refined.

    ``model_error`` (requires score='exact'): jittable
    ``(mu, u_grid) -> scalar`` added to each candidate's exact estimate —
    a TOTAL error indicator vs the exact operator when the fom is itself
    a surrogate, e.g. ``EimStencilFOM.model_error_bound`` for the EIM
    non-affine families (RB residual + kappa-interpolation energy
    bound)."""
    if cg_precond == "mg" and not hasattr(fom, "kappa"):
        raise ValueError(
            "cg_precond='mg' needs a kappa(mu) grid (SPD stencil thermal "
            "block); use 'jacobi' for this FOM"
        )
    if projection not in ("galerkin", "minres"):
        raise ValueError(f"unknown projection mode {projection!r}")
    # validate cheap arguments BEFORE the sketch plan / rhs sketch are
    # built (misuse must fail fast, not after a 2-10 min remote compile)
    if model_error is not None and score != "exact":
        raise ValueError(
            "model_error needs the candidate's reconstructed grid, which "
            "only score='exact' keeps (the sketched score never forms U y)"
        )
    if score == "exact" and \
            jnp.zeros((), exact_dtype).dtype != jnp.dtype(exact_dtype):
        raise ValueError(
            f"score='exact' with exact_dtype={jnp.dtype(exact_dtype)} "
            "requires jax_enable_x64 (the refinement is pointless at "
            "the storage precision)"
        )
    # rank-generic: solution grids may be (M, M) or (M, M, M) — shard
    # the leading axis, replicate the rest
    grid_rank = len(fom.solution_shape)
    grid_sharding = NamedSharding(mesh, P("dof", *([None] * (grid_rank - 1))))
    basis_spec = P(None, "dof", *([None] * (grid_rank - 1)))
    key_theta = jax.random.fold_in(key, 0)
    n_true = math.prod(fom.solution_shape)

    if sketch == "srht":
        from rla4mor_tpu.parallel.sharded_sketch import (
            flat_shard_rows,
            srht_sketch_sharded_flat,
        )

        n_phys, _R = flat_shard_rows(n_true, mesh)

        def sketch(X_flat):  # noqa: F811
            """Flat sharded SRHT of (n,) or (n, b) columns, zero-padded to
            the whole-R-block layout (same canonical plan as ops.fwht.srht
            at seed key_theta)."""
            pad = [(0, n_phys - n_true)] + [(0, 0)] * (X_flat.ndim - 1)
            return srht_sketch_sharded_flat(
                key_theta, k, jnp.pad(X_flat, pad), mesh, n=n_true
            )
    else:
        assert sketch == "gaussian", sketch

        def sketch(X_flat):  # noqa: F811
            """DoF-sharded Gaussian sketch of (n,) or (n, b) columns."""
            return gaussian_sketch_sharded(
                key_theta, k, X_flat, mesh, axis="dof"
            )

    # rhs sketch (precomputed once)
    rhs_flat = fom.rhs().reshape(-1)
    res_rhs = sketch(rhs_flat)
    if score == "exact":
        U0 = jax.device_put(
            jnp.zeros((r_max, *fom.solution_shape), fom.dtype),
            NamedSharding(mesh, basis_spec),
        )  # born sharded: at 16.8M DoF an unsharded init is 537 MB+ on
        # one device before the first step reshards it
    elif score == "sketched":
        U0 = None
    else:
        raise ValueError(f"unknown score mode {score!r}")
    # hoist the FOM's large constant arrays (if it declares any) into the
    # state pytree, so they enter the jitted step as arguments rather than
    # HLO literals (see GreedyState.aux)
    aux0 = fom.const_arrays() if hasattr(fom, "const_arrays") else None
    if hasattr(fom, "output"):
        # reduced output columns (see GreedyState.out); n_out from the
        # functional's abstract shape — no n-sized materialization
        _f0 = fom if aux0 is None else fom.bind(aux0)
        out_shape = jax.eval_shape(
            lambda u: jnp.atleast_1d(_f0.output(u)),
            jax.ShapeDtypeStruct(fom.solution_shape, fom.dtype),
        )
        out0 = jnp.zeros((out_shape.shape[0], r_max), fom.dtype)
    else:
        out0 = None
    state0 = init_state(k, r_max, fom.n_terms, res_rhs, U0=U0, aux=aux0,
                        out0=out0)

    def _fom(state: GreedyState):
        return fom if aux0 is None else fom.bind(state.aux)

    def rom_solve_and_estimate(state: GreedyState, mu):
        theta = _fom(state).theta_vector(mu).astype(state.srb.dtype)
        # mask unused columns: identity rows keep the system solvable
        col_mask = (jnp.arange(r_max) < state.ncols).astype(state.srb.dtype)
        res = jnp.einsum("t,tkr->kr", theta, state.res_lhs) * col_mask[None, :]
        if projection == "minres":
            # sketched least squares; zero (masked) columns get y = 0
            # from the min-norm SVD solution
            y = jnp.linalg.lstsq(res, state.res_rhs)[0]
        else:
            A = state.srb.conj().T @ res
            A = A * col_mask[:, None] + jnp.diag(1.0 - col_mask)
            b = (state.srb.conj().T @ state.res_rhs) * col_mask
            y = jnp.linalg.solve(A, b)
        est = jnp.linalg.norm(res @ y - state.res_rhs)
        return y, est

    def exact_estimate(state: GreedyState, mu, rhs_e):
        """True residual norm ||A(mu) (U y) - b||_2 of the sketched-ROM
        solution, recomputed matrix-free in ``exact_dtype`` (see the
        factory docstring). One O(n) stencil pass per candidate mu."""
        y, _ = rom_solve_and_estimate(state, mu)
        col_mask = jnp.arange(r_max) < state.ncols
        y = jnp.where(col_mask, y, 0).astype(exact_dtype)

        def body(r, acc):
            # per-column cast: never materializes the (r_max, n) basis
            # in exact_dtype (537 MB f32 -> 1 GB f64 at 16.8M DoF)
            return acc + y[r] * state.U[r].astype(exact_dtype)

        # traced bound: only the ncols live columns stream from HBM
        u_rom = lax.fori_loop(
            0, state.ncols, body, jnp.zeros(fom.solution_shape, exact_dtype)
        )
        u_rom = lax.with_sharding_constraint(u_rom, grid_sharding)
        # fom.apply runs at the input's dtype (stencil-FOM protocol)
        r_vec = _fom(state).apply(mu, u_rom) - rhs_e
        est = jnp.linalg.norm(r_vec)
        if model_error is not None:
            # surrogate-model error added to the RB residual: a TOTAL
            # error indicator vs the exact operator (e.g. the EIM
            # family's model_error_bound(mu, u) — jittable, O(M) + one
            # extra stencil pass)
            est = est + model_error(mu, u_rom).astype(est.dtype)
        return est

    def step(state: GreedyState, mu, mu_batch):
        fm = _fom(state)
        # 1) sharded FOM solve
        bvec = lax.with_sharding_constraint(fm.rhs(), grid_sharding)
        if cg_precond == "mg":
            from rla4mor_tpu.models.multigrid import make_vcycle

            M = make_vcycle(fm.kappa(mu))
        else:
            diag = fm.jacobi_diag(mu)
            M = lambda r: r / diag  # noqa: E731

        from rla4mor_tpu.core.solvers import bicgstab, cg

        solver = cg if getattr(fom, "is_spd", True) else bicgstab
        u = solver(
            lambda v: fm.apply(mu, v),
            bvec,
            precond=M,
            tol=cg_tol,
            maxiter=cg_maxiter,
        ).x
        u = lax.with_sharding_constraint(u, grid_sharding)

        # 2) sketch snapshot and its residual columns (one batched sketch)
        terms = jnp.stack(
            [fm.apply_term(t, u).reshape(-1) for t in range(fom.n_terms)],
            axis=1,
        )  # (n, T)
        X = jnp.concatenate([u.reshape(-1, 1), terms], axis=1)
        SX = sketch(X)  # (k, 1+T)
        su, s_terms = SX[:, 0], SX[:, 1:]

        # 3) extend padded state with masked incremental Gram-Schmidt: the
        # sketched basis stays orthonormal (otherwise the masked Galerkin
        # solve degrades as near-parallel snapshots accumulate), and the
        # same combination is applied to the residual columns — exactly the
        # host reductor's sketch-space orthonormalization in incremental
        # form (mor/sketched_reductor.py orthonormalize_basis)
        c = state.ncols
        col_mask = (jnp.arange(r_max) < c).astype(su.dtype)
        su0_nrm = jnp.linalg.norm(su)  # raw sketch scale, pre-GS
        ug = u  # GS-combined snapshot grid (kept only for score="exact")
        ou = (jnp.atleast_1d(fm.output(u)).astype(su.dtype)
              if state.out is not None else None)
        for _ in range(2):  # one re-orthogonalization pass
            coeffs = (state.srb.conj().T @ su) * col_mask
            su = su - state.srb @ coeffs
            s_terms = s_terms - jnp.einsum(
                "tkr,r->kt", state.res_lhs, coeffs
            )
            if ou is not None:
                # l linear => l(GS-combined grid) == GS-combined l(grid):
                # the invariant out[:, j] == l(U[:, j]) holds without
                # ever forming the grid combination in sketched mode
                ou = ou - state.out @ coeffs
            if score == "exact":
                # same combination on the stored basis grids, preserving
                # the invariant srb[:, j] == sketch(U[j])
                ug = ug - jnp.tensordot(coeffs, state.U, axes=1)
        nrm_raw = jnp.linalg.norm(su)
        nrm = jnp.maximum(nrm_raw, 1e-30)
        # saturate at r_max: JAX drops out-of-bounds scatters SILENTLY, so
        # without the guard an extra step would keep incrementing ncols
        # against a stale basis (round-2 review finding). Also refuse to
        # write a DEGENERATE snapshot: (a) non-finite — one diverged
        # solve (e.g. the MG V-cycle amplifying on a sharp-feature kappa)
        # would poison the padded state PERMANENTLY, every later estimate
        # turns NaN (a NaN anywhere in u reaches every sketch entry
        # through the sketching matmul, so the k-sized checks see it);
        # (b) sketch-dependent — a zero solve (CG exits at x0 on NaN
        # inputs: NaN comparisons are false) or an exact-duplicate
        # snapshot leaves only GS roundoff, and normalizing noise into a
        # live column makes the masked Galerkin system singular. This is
        # the driver-side analog of the host reductor's truncation_rtol.
        finite = jnp.all(jnp.isfinite(su)) & jnp.all(jnp.isfinite(s_terms))
        indep = nrm_raw > 100 * jnp.finfo(su.dtype).eps * su0_nrm
        ok = (c < r_max) & finite & indep
        c_write = jnp.minimum(c, r_max - 1)
        su_col = jnp.where(ok, su / nrm, state.srb[:, c_write])
        res_col = jnp.where(
            ok, s_terms.T / nrm, state.res_lhs[:, :, c_write]
        )
        new_U = state.U
        if score == "exact":
            u_col = jnp.where(ok, ug / nrm, state.U[c_write])
            new_U = lax.with_sharding_constraint(
                state.U.at[c_write].set(u_col),
                NamedSharding(mesh, basis_spec),
            )
        new_out = state.out
        if ou is not None:
            out_col = jnp.where(ok, ou / nrm, state.out[:, c_write])
            new_out = state.out.at[:, c_write].set(out_col)
        state = state._replace(
            srb=state.srb.at[:, c_write].set(su_col),
            res_lhs=state.res_lhs.at[:, :, c_write].set(res_col),
            ncols=c + ok.astype(c.dtype),
            U=new_U,
            out=new_out,
        )

        # 4) error sweep over the mu batch (sharded over 'mu')
        mu_batch = jax.tree.map(
            lambda x: lax.with_sharding_constraint(
                x, NamedSharding(mesh, P("mu", *([None] * (x.ndim - 1))))
            ),
            mu_batch,
        )
        if score == "exact":
            # sequential map: one n-sized f64 intermediate at a time
            # (a vmap would stack batch-many 16.8M-DoF grids); rhs built
            # once outside the map
            rhs_e = lax.with_sharding_constraint(
                fm.rhs(dtype=exact_dtype), grid_sharding
            )
            estimates = lax.map(
                lambda m: exact_estimate(state, m, rhs_e), mu_batch
            )
        else:
            _, estimates = jax.vmap(
                lambda m: rom_solve_and_estimate(state, m)
            )(mu_batch)
        return state, estimates, u

    return state0, step


def state_to_rom(fom, state: GreedyState, projection: str = "galerkin"):
    """Ship the trained sharded-greedy state as a :class:`StationaryROM`.

    The online stage (``solve`` / ``output`` / ``estimate_error``) is the
    same sketch-space system the greedy's own sweep evaluated
    (``rom_solve_and_estimate`` above) with the padding stripped to the
    ``ncols`` live columns — packaged as the framework's dense affine ROM
    so the pod-scale offline stage feeds the online layer directly:
    ``serve.serve_batch``, ``mor.uq.certified_moments``,
    ``mor.optimize.minimize_output`` all take the result unchanged.

    Certification note: the sharded sketch is an UNWEIGHTED l2 OSE
    (parallel/sharded_sketch.py), so ``estimate_error`` approximates the
    plain l2 residual norm ``||A(mu) U y - b||_2``. Pair it with an l2
    coercivity bound — ``MinThetaCoercivity(fom, mu_ref,
    alpha_ref=lambda_min(sym A(mu_ref)))`` with the anchor eigenvalue
    from the matrix-free LOBPCG (``mor.scm_matfree.lobpcg_gen``) — and
    the l2 output dual norm ``||l||_2`` (``ConstantDualNorm``) for a
    rigorous (up to sketch distortion) output certificate.

    ``projection='galerkin'`` exports the square sketched-Galerkin
    system; ``'minres'`` exports the rectangular sketched least-squares
    system (``StationaryROM(ls=True)``) — use whichever the greedy was
    trained with. Output functional requires the FOM to declare
    ``output(u)`` (all in-repo stencil families do); otherwise the ROM
    ships without one.
    """
    from rla4mor_tpu.core.affine import AffineDense
    from rla4mor_tpu.core.parameters import ONE
    from rla4mor_tpu.models.stationary import (
        ResidualErrorEstimator,
        StationaryROM,
    )

    r = int(state.ncols)
    if r == 0:
        raise ValueError("empty greedy state (ncols == 0): run step first")
    if projection not in ("galerkin", "minres"):
        raise ValueError(f"unknown projection mode {projection!r}")
    srb = state.srb[:, :r]                 # (k, r)
    res_lhs = state.res_lhs[:, :, :r]      # (T, k, r)
    res_rhs = state.res_rhs[:, None]       # (k, 1)
    coeffs = tuple(fom.affine_operator().coefficients)
    estimator = ResidualErrorEstimator(
        AffineDense(res_lhs, coeffs),
        AffineDense(res_rhs[None], (ONE,)),
    )
    if projection == "minres":
        lhs = AffineDense(res_lhs, coeffs)
        rhs = AffineDense(res_rhs[None], (ONE,))
        ls = True
    else:
        lhs = AffineDense(
            jnp.einsum("kr,tks->trs", srb.conj(), res_lhs), coeffs
        )
        rhs = AffineDense((srb.conj().T @ res_rhs)[None], (ONE,))
        ls = False
    out_fn = None
    if state.out is not None:
        out_fn = AffineDense(state.out[None, :, :r], (ONE,))
    return StationaryROM(
        lhs, rhs, output_functional=out_fn, error_estimator=estimator,
        ls=ls,
    )
