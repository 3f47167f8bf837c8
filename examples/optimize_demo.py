#!/usr/bin/env python
"""Certified ROM-based parameter optimization demo (mor/optimize.py).

Minimize the mean temperature of a 3x3 thermal block over its 9-dim
parameter box — a workload the reference framework has no counterpart for
(its online stage is evaluation-only). The loop:

1. multi-start projected gradient on the reduced model, all starts in one
   jitted vmap(scan) program, gradients by autodiff through the reduced
   solve (the solve's transpose rule is the exact discrete adjoint);
2. certify the candidate optimum with the rigorous output bound
   ||l||_{R^-1} * eta(mu) / alpha_LB(mu);
3. if the certificate is looser than tol, spend ONE FOM solve at the
   candidate (basis enrichment) and re-optimize.

Also demonstrates maximization and a target-tracking objective on the
final certified ROM.

Run on CPU: python examples/optimize_demo.py --cpu
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--intervals", type=int, default=40)
    ap.add_argument("--tol", type=float, default=1e-6)
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)

    import jax.numpy as jnp

    from rla4mor_tpu.models import ThermalBlockFOM
    from rla4mor_tpu.mor import (
        MinThetaCoercivity,
        SketchedReductor,
        certified_minimize,
        minimize_output,
    )
    from rla4mor_tpu.ops import GaussianEmbedding

    fom = ThermalBlockFOM(grid_shape=(3, 3), num_intervals=args.intervals)
    space = fom.parameter_space
    Ru = fom.h1_0_product
    print(f"FOM: n={fom.solution_dim}, parameters={space.dim()}")

    theta = GaussianEmbedding.make(
        fom.solution_dim, sqrt_product=Ru.sqrt, range_dim=300, seed=0
    )
    phi = GaussianEmbedding.make(300, range_dim=150, seed=100)
    red = SketchedReductor(
        fom, embedding_primal=theta, embedding_online=phi, product=Ru,
        orthonormalize=True,
    )
    alpha = MinThetaCoercivity(fom, {"diffusion": jnp.full((9,), 1.0)})

    t0 = time.perf_counter()
    opt = certified_minimize(
        fom, red, alpha, tol=args.tol, n_starts=8, iters=120, seed=0,
        log_level=30,
    )
    t1 = time.perf_counter()
    print(
        f"certified minimize: J*={opt.value:.8f} +- {opt.bound:.2e} "
        f"(tol {args.tol:g}), converged={opt.converged}, "
        f"{opt.n_enrichments} enrichments "
        f"(basis {opt.history[-1]['basis_size']}), {t1 - t0:.1f}s"
    )
    for h in opt.history:
        print(
            f"  round {h['round']}: r={h['basis_size']:2d} "
            f"J={h['value']:.8f} bound={h['bound']:.2e} "
            f"stat={h['stationarity']:.1e}"
        )
    s_fom = float(fom.output(fom.solve(opt.mu), opt.mu).reshape(-1)[0])
    print(f"FOM output at mu*: {s_fom:.8f} "
          f"(|diff| {abs(s_fom - opt.value):.2e} <= bound {opt.bound:.2e})")

    # --- trust-region RB vs enrich-at-the-optimum: FOM-solve economy ----
    # Non-affine Gaussian-bump family (MDEIM surrogate): the TR loop
    # accepts certified decreases FOM-free and only pays a FOM solve
    # when a step cannot be certified from the ROM alone.
    from rla4mor_tpu.models.bump_host import bump_coercivity, bump_host_fom
    from rla4mor_tpu.mor import trust_region_minimize
    from rla4mor_tpu.ops import IdentityEmbedding

    def exact_red(f):
        Ru_b = f.h1_0_product
        th = IdentityEmbedding(f.solution_dim, sqrt_product=Ru_b.sqrt)
        return SketchedReductor(
            f, embedding_primal=th,
            embedding_online=IdentityEmbedding(th.range_dim),
            product=Ru_b, orthonormalize=True, log_level=30,
        )

    bump = bump_host_fom(nx=16)
    alpha_b = bump_coercivity(bump)
    tol_b = 1e-10
    print(f"\nnon-affine bump family: n={bump.solution_dim}, "
          f"MDEIM terms={bump.mdeim_op.n_terms}, tol={tol_b:g}")
    t0 = time.perf_counter()
    trr = trust_region_minimize(
        bump, exact_red(bump), alpha_b, tol=tol_b, seed=0, log_level=30)
    t_tr = time.perf_counter() - t0
    t0 = time.perf_counter()
    cm = certified_minimize(
        bump, exact_red(bump), alpha_b, tol=tol_b, n_starts=4, iters=60,
        seed=0, log_level=30)
    t_cm = time.perf_counter() - t0
    print(f"  {'method':<24} {'J*':>14} {'bound':>10} {'FOM solves':>10} "
          f"{'time':>7}")
    print(f"  {'trust-region RB':<24} {trr.value:>14.8f} "
          f"{trr.bound:>10.2e} {trr.n_fom_solves:>10d} {t_tr:>6.1f}s")
    print(f"  {'enrich-at-the-optimum':<24} {cm.value:>14.8f} "
          f"{cm.bound:>10.2e} {cm.n_enrichments + 1:>10d} {t_cm:>6.1f}s")

    # maximization + target tracking on the certified ROM
    rom = red.reduce(seed=1)
    t0 = time.perf_counter()
    mx = minimize_output(
        rom, space,
        objective=lambda s, mu: -jnp.real(jnp.asarray(s).reshape(-1)[0]),
        n_starts=8, iters=120, key=4,
    )
    target = 0.5 * (opt.value + -mx.value)
    tr = minimize_output(
        rom, space,
        objective=lambda s, mu: (
            jnp.real(jnp.asarray(s).reshape(-1)[0]) - target
        ) ** 2,
        n_starts=8, iters=120, key=5,
    )
    t1 = time.perf_counter()
    print(f"range of the output over the box: "
          f"[{opt.value:.6f}, {-mx.value:.6f}]")
    print(f"target tracking J={target:.6f}: residual^2={tr.value:.2e}, "
          f"stationarity={tr.stationarity:.1e} ({t1 - t0:.1f}s both)")


if __name__ == "__main__":
    main()
