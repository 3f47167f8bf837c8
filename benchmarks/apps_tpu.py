#!/usr/bin/env python
"""TPU perf rows for the applications layer (PERF.md round-4).

Measures on the live chip and prints one JSON line per row:

* ``uq_stationary``:  certified_moments samples/s at batch 4096 on the
  assembled 2-D thermal-block ROM (the examples/uq_demo.py recipe —
  r=30 sketched RB, 9 parameters, per-sample rigorous output bound);
* ``uq_thermal3d``:   same throughput on a greedy-shipped 274k-DoF
  3-D stencil ROM (``parallel.state_to_rom``) with a fully rigorous l2
  certificate: min-theta anchored at the matrix-free LOBPCG
  ``lambda_min(A(1))`` over the interior subspace;
* ``pgd``:            multi-start projected-gradient iterations/s
  (64 starts advancing together in one jitted vmapped scan);
* ``sobol``:          Saltelli/Jansen pick-freeze evaluation throughput,
  n=4096 -> n*(d+2) reduced solves.

Methodology: every row times the SECOND call of the same program shape
(the first pays tracing + persistent-cache compile); wall time includes
the device->host result transfer, which is the only reliable sync on
the axon tunnel (PERF.md "Measured platform reality").
"""

import json
import math
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")

import jax.numpy as jnp
import numpy as np


def row(name, value, unit, **extra):
    print(json.dumps({"metric": name, "value": round(value, 2),
                      "unit": unit, **extra}), flush=True)


def build_stationary_rom():
    from rla4mor_tpu.models import ThermalBlockFOM
    from rla4mor_tpu.mor import (
        MinThetaCoercivity,
        OutputDualNorm,
        SketchedReductor,
    )
    from rla4mor_tpu.ops import GaussianEmbedding

    fom = ThermalBlockFOM(grid_shape=(3, 3), num_intervals=40)
    Ru = fom.h1_0_product
    theta = GaussianEmbedding.make(
        fom.solution_dim, sqrt_product=Ru.sqrt, range_dim=400, seed=0
    )
    phi = GaussianEmbedding.make(400, range_dim=200, seed=100)
    red = SketchedReductor(
        fom, embedding_primal=theta, embedding_online=phi, product=Ru,
        orthonormalize=True,
    )
    red.extend_basis(fom.solve_many(fom.parameter_space.sample_randomly(
        30, key=7)))
    rom = red.reduce(seed=1)
    alpha = MinThetaCoercivity(fom, {"diffusion": jnp.full((9,), 1.0)})
    dual = OutputDualNorm(fom, product=Ru)
    return fom, rom, alpha, dual


def build_thermal3d_rom(num_intervals=64, k=256, steps=8):
    """Greedy-train a 3-D stencil ROM on the chip and ship it
    (parallel.state_to_rom) with the rigorous l2 certificate pair."""
    from jax.sharding import Mesh

    from rla4mor_tpu.core import mu_stack
    from rla4mor_tpu.models import StencilThermalBlock3D
    from rla4mor_tpu.models.stencil3d import interior_mask3
    from rla4mor_tpu.mor import ConstantDualNorm, MinThetaCoercivity
    from rla4mor_tpu.mor.scm_matfree import _flat_cols, lobpcg_gen
    from rla4mor_tpu.parallel import make_sharded_greedy_step, state_to_rom

    fom = StencilThermalBlock3D((2, 2, 2), num_intervals, dtype=jnp.float32)
    n = fom.n_dof
    mesh = Mesh(np.array(jax.devices()[:1]).reshape(1, 1), ("dof", "mu"))
    key = jax.random.key(0)
    state, step = make_sharded_greedy_step(
        fom, mesh, key, k=k, r_max=steps, cg_tol=1e-6, cg_maxiter=3000,
        cg_precond="jacobi", sketch="srht",
    )
    batch = mu_stack(fom.sample_parameters(8, key=1))
    batch = jax.tree.map(lambda x: x.astype(jnp.float32), batch)
    t0 = time.perf_counter()
    with mesh:
        jit_step = jax.jit(step)
        for it in range(steps):
            mu = jax.tree.map(lambda x: x.astype(jnp.float32),
                              fom.sample_parameters(1, key=10 + it)[0])
            state, est, _ = jit_step(state, mu, batch)
            np.asarray(est)  # sync
    t_greedy = time.perf_counter() - t0
    rom = state_to_rom(fom, state)
    r = int(state.ncols)

    # rigorous l2 anchor: lambda_min(A(1)) on the interior subspace
    # (Dirichlet ring is a common kernel), matrix-free LOBPCG with an
    # inverse-iteration preconditioner (inner Jacobi-CG on A(1))
    from rla4mor_tpu.core.solvers import cg

    mu_ref = {"diffusion": jnp.ones((fom.n_terms,), jnp.float32)}
    apply_A = _flat_cols(lambda g: fom.apply(mu_ref, g), fom.solution_shape)
    mask = interior_mask3(fom.n_nodes, jnp.float32).reshape(-1)
    project = lambda U: U * (mask[:, None] if U.ndim == 2  # noqa: E731
                             else mask).astype(U.dtype)
    diag = fom.jacobi_diag(mu_ref).reshape(-1)

    def precond(U):
        one = U.ndim == 1
        cols = U[:, None] if one else U
        sol = jax.vmap(
            lambda b: cg(
                lambda v: apply_A(v), b, precond=lambda rr: rr / diag,
                tol=1e-2, maxiter=600,
            ).x, in_axes=1, out_axes=1,
        )(cols)
        return sol[:, 0] if one else sol

    t0 = time.perf_counter()
    eig = lobpcg_gen(
        apply_A, lambda U: U, n, k=1, block=4, precond=precond,
        project=project, iters=100, tol=3e-6, dtype=jnp.float32,
        identity_R=True,  # R = I: exact l2 Bauer-Fike radii
    )
    # f64 polishing stage: the f32 Ritz vector stalls at a whitening/
    # roundoff floor — the honestly (f64) evaluated Bauer-Fike radius is
    # then a large fraction of lambda_1. Warm-start a short f64 LOBPCG
    # from it to shrink the enclosure to a tight certificate. x64 is
    # SCOPED (jax.enable_x64 context): enabling it globally would
    # promote the UQ path to f64 and hit the unsupported TPU
    # LuDecomposition in the ROM solve (CLAUDE.md TPU-f64 note).
    with jax.enable_x64(True):
        mu64 = {"diffusion": jnp.ones((fom.n_terms,), jnp.float64)}
        apply_A64 = _flat_cols(lambda g: fom.apply(mu64, g),
                               fom.solution_shape)
        diag64 = jnp.asarray(np.asarray(diag), jnp.float64)

        def precond64(U):
            one = U.ndim == 1
            cols = U[:, None] if one else U
            sol = jax.vmap(
                lambda b: cg(
                    lambda v: apply_A64(v), b,
                    precond=lambda rr: rr / diag64, tol=1e-5,
                    maxiter=1500,
                ).x, in_axes=1, out_axes=1,
            )(cols)
            return sol[:, 0] if one else sol

        mask64 = jnp.asarray(np.asarray(mask), jnp.float64)
        project64 = lambda U: U * (  # noqa: E731
            mask64[:, None] if U.ndim == 2 else mask64).astype(U.dtype)
        x0 = jnp.concatenate(
            [jnp.asarray(np.asarray(eig.vectors[:, :1]), jnp.float64),
             jax.random.normal(jax.random.key(7), (n, 1), jnp.float64)],
            axis=1,
        )
        eig = lobpcg_gen(
            apply_A64, lambda U: U, n, k=1, block=2, precond=precond64,
            project=project64, iters=40, tol=1e-8, dtype=jnp.float64,
            x0=project64(x0), identity_R=True,
        )
    t_eig = time.perf_counter() - t0
    lam, rad = float(eig.values[0]), float(eig.radii[0])
    alpha_ref = lam - rad
    assert alpha_ref > 0, (lam, rad)
    alpha = MinThetaCoercivity(fom, mu_ref, alpha_ref=alpha_ref)
    dual = ConstantDualNorm(fom.h ** 3 * math.sqrt(n))
    return fom, rom, alpha, dual, dict(
        n=n, r=r, t_greedy=t_greedy, t_eig=t_eig, lam=lam, rad=rad,
        converged=eig.converged,
    )


def time_uq(rom, space, alpha, dual, n_samples=20480, batch=4096,
            method="halton"):
    from rla4mor_tpu.mor import certified_moments

    res = None
    times = []
    for _ in range(2):  # 1st call pays trace + cache-hit compile
        t0 = time.perf_counter()
        res = certified_moments(rom, space, alpha, dual, n=n_samples,
                                key=5, method=method, batch=batch)
        times.append(time.perf_counter() - t0)
    return res, n_samples / times[-1], times


def main():
    from rla4mor_tpu.core.parameters import ParameterSpace
    from rla4mor_tpu.mor import sobol_indices
    from rla4mor_tpu.mor.optimize import make_objective, minimize_scalar

    print(f"# devices: {jax.devices()}", flush=True)

    # ---- stationary 2-D thermal block --------------------------------
    fom2, rom2, a2, d2 = build_stationary_rom()
    space2 = fom2.parameter_space
    res, rate, times = time_uq(rom2, space2, a2, d2)
    row("uq_stationary_certified_samples_per_s", rate, "samples/s",
        n_dof=fom2.solution_dim, r=rom2.dim, d=space2.dim(),
        bias_bound=float(res.bias_bound), batch=4096,
        t_first=round(times[0], 2), t_steady=round(times[-1], 3))

    # ---- PGD optimizer ------------------------------------------------
    J = make_objective(rom2, space2)
    n_starts, iters = 64, 200
    for _ in range(2):
        t0 = time.perf_counter()
        opt = minimize_scalar(J, space2, n_starts=n_starts, iters=iters,
                              key=3)
        t_pgd = time.perf_counter() - t0
    row("pgd_multistart_iters_per_s", n_starts * iters / t_pgd, "iters/s",
        n_starts=n_starts, iters=iters, best=round(opt.value, 6),
        t_steady=round(t_pgd, 3))

    # ---- Sobol pick-freeze throughput ---------------------------------
    nsob = 4096
    for _ in range(2):
        t0 = time.perf_counter()
        sob = sobol_indices(J, space2, n=nsob, key=8, method="halton")
        t_sob = time.perf_counter() - t0
    evals = nsob * (space2.dim() + 2)
    row("sobol_evals_per_s", evals / t_sob, "evals/s", n=nsob,
        d=space2.dim(), evals=evals, t_steady=round(t_sob, 3),
        top_total=round(float(np.max(sob.total)), 3))

    # ---- greedy-shipped 274k-DoF thermal3d ROM ------------------------
    fom3, rom3, a3, d3, info = build_thermal3d_rom()
    space3 = ParameterSpace.make({"diffusion": fom3.n_terms}, 0.1, 1.0)
    res3, rate3, times3 = time_uq(rom3, space3, a3, d3)
    row("uq_thermal3d_certified_samples_per_s", rate3, "samples/s",
        n_dof=info["n"], r=info["r"], d=space3.dim(),
        bias_bound=float(res3.bias_bound), mean=float(res3.mean),
        batch=4096, t_first=round(times3[0], 2),
        t_steady=round(times3[-1], 3),
        t_greedy_offline=round(info["t_greedy"], 1),
        t_lambda_min=round(info["t_eig"], 1),
        lambda_min=info["lam"], bauer_fike_radius=info["rad"],
        eig_converged=bool(info["converged"]))


if __name__ == "__main__":
    main()
