#!/usr/bin/env python
"""Instationary (parabolic) sketched MOR demo: POD-greedy on the
time-dependent thermal block (beyond-reference functionality — the
reference is stationary-only; workflow modeled on pyMOR's
InstationaryModel).

Implicit-Euler FOM trajectories, a sketched space-time residual
estimator, POD-greedy basis construction, then a batched online study —
the ROM time loop is a single ``lax.scan``, vmapped over parameters.

Run on CPU: python examples/instationary_demo.py --cpu
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
    ap.add_argument("--theta", type=float, default=1.0,
                    help="time scheme: 1 = implicit Euler, 0.5 = CN")
    ap.add_argument("--grid", type=int, default=16)
    ap.add_argument("--nt", type=int, default=30)
    ap.add_argument("--extensions", type=int, default=8)
    ap.add_argument("--sketch-dim", type=int, default=100)
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", jax.default_backend() == "cpu")

    import jax.numpy as jnp
    import numpy as np

    from rla4mor_tpu.models import (
        InstationaryReductor,
        instationary_thermal_block,
        pod_greedy,
    )
    from rla4mor_tpu.ops import GaussianEmbedding

    pfom = instationary_thermal_block((2, 2), args.grid, T=0.5, nt=args.nt, time_theta=args.theta)
    Ru = pfom.products["h1_0"]
    print(f"FOM: n = {pfom.solution_dim}, nt = {pfom.nt}, dt = {pfom.dt:.3g}")

    theta = GaussianEmbedding.make(
        pfom.solution_dim, sqrt_product=Ru.sqrt, range_dim=args.sketch_dim,
        seed=0,
    )
    red = InstationaryReductor(pfom, embedding=theta, product=Ru,
                               log_level=30)
    train = pfom.parameter_space.sample_randomly(20, key=1)

    t0 = time.perf_counter()
    rom, hist = pod_greedy(pfom, red, train,
                           max_extensions=args.extensions, log_level=20)
    print(f"POD-greedy: basis {red.basis_size} in "
          f"{time.perf_counter() - t0:.1f}s")
    print("max estimates:",
          " ".join(f"{e:.2e}" for e in hist["max_estimates"]))

    # online: full trajectories + estimates at unseen parameters
    test = pfom.parameter_space.sample_randomly(5, key=2)
    rels, ests = [], []
    for mu in test:
        traj_r, eta = rom.solve(mu, return_estimate=True)  # one time loop
        rec = red.reconstruct(traj_r)               # (n, nt+1)
        tr = pfom.solve(mu)
        rels.append(float(jnp.linalg.norm(rec - tr) / jnp.linalg.norm(tr)))
        ests.append(float(eta))
    print("true trajectory rel errors:",
          " ".join(f"{e:.2e}" for e in rels))
    print("space-time residual estimates:",
          " ".join(f"{e:.2e}" for e in ests))
    assert max(rels) < 0.2

    # certified bounds: min-theta coercivity upgrades the indicator to a
    # guaranteed final-time M-norm bound (mor.bounds.parabolic_error_bound)
    from rla4mor_tpu.mor import MinThetaCoercivity, parabolic_error_bound

    mu_ref = {"diffusion": jnp.full(4, 0.55)}
    coer = MinThetaCoercivity(pfom, mu_ref, product=Ru)
    bounds = [float(parabolic_error_bound(rom, mu, coer)) for mu in test]
    print("certified final-time bounds:",
          " ".join(f"{b:.2e}" for b in bounds))

    # goal-oriented: discrete-adjoint corrected output on a localized
    # (non-compliant) functional, trained by the output greedy
    from rla4mor_tpu.core.affine import AffineDense
    from rla4mor_tpu.core.parameters import ONE
    from rla4mor_tpu.models import (
        InstationaryPrimalDualReductor, output_pod_greedy,
    )

    nx = args.grid
    w = np.zeros((nx - 1, nx - 1))
    w[: nx // 3, : nx // 3] = 1.0
    pfom.output_functional = AffineDense(
        jnp.asarray(w.reshape(1, 1, -1) / w.sum()), (ONE,)
    )
    red_pd = InstationaryPrimalDualReductor(
        pfom, embedding=theta, product=Ru, log_level=30
    )
    t0 = time.perf_counter()
    rom_pd, hist_pd = output_pod_greedy(
        pfom, red_pd, train[:10], max_extensions=5,
        modes_per_extension=2, log_level=30,
    )
    print(f"output-greedy: bases {red_pd.primal.basis_size}/"
          f"{red_pd.dual_basis_size} in {time.perf_counter() - t0:.1f}s; "
          "indicators: "
          + " ".join(f"{e:.2e}" for e in hist_pd["max_indicators"]))
    mu_t = test[0]
    s_true = float(np.asarray(
        pfom.output_functional.apply(pfom.solve(mu_t), mu_t))[0, -1])
    s_plain = float(rom_pd.output_plain(mu_t))
    s_c, eta_s = rom_pd.output_corrected(mu_t)
    print(f"output at held-out mu: true {s_true:.6g}, plain err "
          f"{abs(s_plain - s_true):.2e}, corrected err "
          f"{abs(float(s_c) - s_true):.2e}, indicator {float(eta_s):.2e}")
    print("done")


if __name__ == "__main__":
    main()
