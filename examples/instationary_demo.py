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
    print("done")


if __name__ == "__main__":
    main()
