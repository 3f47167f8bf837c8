#!/usr/bin/env python
"""Certified UQ demo (mor/uq.py): output statistics over the parameter box.

Mean/variance of the thermal-block mean temperature under uniform mu, and
a certified bracket for the exceedance probability P[s > c] — every sample
is a reduced solve + rigorous certificate, evaluated in jitted vmapped
batches; the ROM-vs-FOM bias is bounded, not hoped for. QMC (scrambled
Halton) vs plain MC shown side by side.

Run on CPU: python examples/uq_demo.py --cpu
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
    ap.add_argument("--n", type=int, default=20000)
    ap.add_argument("--snapshots", type=int, default=30)
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)

    import jax.numpy as jnp

    from rla4mor_tpu.models import ThermalBlockFOM
    from rla4mor_tpu.mor import (
        MinThetaCoercivity,
        OutputDualNorm,
        SketchedReductor,
        certified_moments,
        exceedance_probability,
    )
    from rla4mor_tpu.ops import GaussianEmbedding

    fom = ThermalBlockFOM(grid_shape=(3, 3), num_intervals=args.intervals)
    space = fom.parameter_space
    Ru = fom.h1_0_product
    print(f"FOM: n={fom.solution_dim}, parameters={space.dim()}")

    theta = GaussianEmbedding.make(
        fom.solution_dim, sqrt_product=Ru.sqrt, range_dim=400, seed=0
    )
    phi = GaussianEmbedding.make(400, range_dim=200, seed=100)
    red = SketchedReductor(
        fom, embedding_primal=theta, embedding_online=phi, product=Ru,
        orthonormalize=True,
    )
    mus = space.sample_randomly(args.snapshots, key=7)
    t0 = time.perf_counter()
    red.extend_basis(fom.solve_many(mus))
    rom = red.reduce(seed=1)
    print(f"offline: {args.snapshots} snapshots -> r={red.basis_size} "
          f"({time.perf_counter() - t0:.1f}s)")

    alpha = MinThetaCoercivity(fom, {"diffusion": jnp.full((9,), 1.0)})
    dual = OutputDualNorm(fom, product=Ru)

    for method in ("mc", "halton"):
        t0 = time.perf_counter()
        res = certified_moments(
            rom, space, alpha, dual, n=args.n, key=5, method=method,
            batch=4096,
        )
        dt = time.perf_counter() - t0
        print(
            f"{method:6s}: E[s]={res.mean:.6f} "
            f"(bias<= {res.bias_bound:.1e}, mc +-{res.mc_stderr:.1e})  "
            f"std={res.std:.6f} (var bias<= {res.var_bias_bound:.1e})  "
            f"[{res.n} samples, {dt:.1f}s = "
            f"{res.n / dt:.0f} certified solves/s]"
        )

    from rla4mor_tpu.mor import sobol_indices
    from rla4mor_tpu.mor.optimize import make_objective

    t0 = time.perf_counter()
    sob = sobol_indices(
        make_objective(rom, space), space, n=2048, key=8, method="halton"
    )
    order = sorted(range(space.dim()), key=lambda i: -sob.total[i])
    tops = ", ".join(
        f"{sob.names[i]}: S={sob.first[i]:.3f} T={sob.total[i]:.3f}"
        for i in order[:3]
    )
    print(f"Sobol sensitivities (top 3 of {space.dim()}): {tops} "
          f"[{2048 * (space.dim() + 2)} evals, "
          f"{time.perf_counter() - t0:.1f}s]")

    c = res.mean + res.std
    t0 = time.perf_counter()
    exc = exceedance_probability(
        rom, space, alpha, dual, threshold=c, n=args.n, key=6, batch=4096
    )
    print(
        f"P[s > {c:.4f}] in [{exc.p_lo:.4f}, {exc.p_hi:.4f}] "
        f"(nominal {exc.p_nominal:.4f} +-{exc.mc_stderr:.1e}; "
        f"certificate gap {exc.p_hi - exc.p_lo:.1e}) "
        f"[{time.perf_counter() - t0:.1f}s]"
    )

    # --- parabolic composition: certified UQ over a TIME-DEPENDENT output
    # Every sample is a full reduced primal + backward dual time loop,
    # vmapped into one program; the per-sample certificate is the
    # Grepl-Patera product bound eta_pr * eta_du / alpha (implicit Euler).
    import jax.numpy as jnp
    import numpy as np

    from rla4mor_tpu.core.affine import AffineDense
    from rla4mor_tpu.core.parameters import ONE
    from rla4mor_tpu.models import (
        InstationaryPrimalDualReductor,
        instationary_thermal_block,
    )

    nx = 16
    pfom = instationary_thermal_block((2, 2), nx, T=0.5, nt=30)
    w = np.zeros((nx - 1, nx - 1))
    w[: nx // 3, : nx // 3] = 1.0  # localized (non-compliant) output
    pfom.output_functional = AffineDense(
        jnp.asarray(w.reshape(1, 1, -1) / w.sum()), (ONE,)
    )
    Ru_p = pfom.products["h1_0"]
    emb_p = GaussianEmbedding.make(
        pfom.solution_dim, sqrt_product=Ru_p.sqrt, range_dim=150, seed=2
    )
    pred = InstationaryPrimalDualReductor(
        pfom, embedding=emb_p, product=Ru_p, log_level=30
    )
    for m in pfom.parameter_space.sample_randomly(4, key=1):
        pred.extend(m, modes_per_extension=3)
    prom = pred.reduce()
    alpha_p = MinThetaCoercivity(
        pfom, {"diffusion": jnp.full((4,), 1.0)}, product=Ru_p
    )
    pspace = pfom.parameter_space
    t0 = time.perf_counter()
    pres = certified_moments(
        prom, pspace, alpha_p, dual_norm=None, n=args.n, key=5, batch=4096
    )
    dt = time.perf_counter() - t0
    print(
        f"\nparabolic final-time output (n={pfom.solution_dim}, "
        f"nt=30, dual-corrected): E[s(T)]={pres.mean:.6f} "
        f"(bias<= {pres.bias_bound:.1e})  std={pres.std:.6f} "
        f"[{pres.n} samples, {dt:.1f}s = "
        f"{pres.n / dt:.0f} certified time-loops/s]"
    )
    c_p = pres.mean + pres.std
    t0 = time.perf_counter()
    pexc = exceedance_probability(
        prom, pspace, alpha_p, dual_norm=None, threshold=c_p, n=args.n,
        key=6, batch=4096
    )
    print(
        f"P[s(T) > {c_p:.4f}] in [{pexc.p_lo:.4f}, {pexc.p_hi:.4f}] "
        f"(nominal {pexc.p_nominal:.4f}; certificate gap "
        f"{pexc.p_hi - pexc.p_lo:.1e}) [{time.perf_counter() - t0:.1f}s]"
    )


if __name__ == "__main__":
    main()
