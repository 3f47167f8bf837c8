#!/usr/bin/env python
"""Big-n parabolic MOR entirely on device: POD-greedy over the
matrix-free implicit-Euler stencil FOM (InstationaryStencilFOM) — no
host factorization anywhere. Counterpart of large_scale_demo.py for the
time-dependent world.

Run on TPU:  python examples/large_scale_parabolic_demo.py --grid 1023
Run on CPU:  python examples/large_scale_parabolic_demo.py --cpu --grid 63
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
    ap.add_argument("--grid", type=int, default=None,
                    help="elements per axis (default 1024 for thermal, "
                         "255 for thermal3d)")
    ap.add_argument("--precond", choices=["auto", "jacobi", "mg"],
                    default="auto")
    ap.add_argument("--nt", type=int, default=50)
    ap.add_argument("--ext", type=int, default=5)
    ap.add_argument("--k", type=int, default=128)
    ap.add_argument("--family", choices=["thermal", "thermal3d"],
                    default="thermal",
                    help="thermal3d: 3-D Q1 hexahedral thermal block "
                         "(lumped mass, jacobi only)")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from rla4mor_tpu.models import (
        InstationaryReductor, InstationaryStencilFOM, pod_greedy,
    )
    from rla4mor_tpu.models.stencil import StencilThermalBlock
    from rla4mor_tpu.ops import StreamedGaussianEmbedding

    N = args.grid
    if N is None:
        N = 255 if args.family == "thermal3d" else 1024
    precond = args.precond
    if args.family == "thermal3d":
        from rla4mor_tpu.models import StencilThermalBlock3D

        if precond == "mg":
            ap.error("--precond mg is 2-D only; thermal3d uses jacobi")
        precond = "jacobi"
        st = StencilThermalBlock3D((2, 2, 2), N, dtype=jnp.float32)
        n = st.n_dof
        desc = f"grid {N}^3 elements"
    else:
        if precond == "auto":  # MG needs power-of-two element counts
            precond = "mg" if N & (N - 1) == 0 else "jacobi"
        st = StencilThermalBlock((2, 2), N, dtype=jnp.float32)
        n = st.n_nodes ** 2
        desc = f"grid {N}x{N} elements"
    dev = InstationaryStencilFOM(st, T=1.0, nt=args.nt)
    print(f"{desc}, n = {n / 1e6:.2f}M nodes, "
          f"nt = {args.nt}, sketch k = {args.k}")

    store_every = max(1, args.nt // 10)
    while args.nt % store_every:  # must divide nt
        store_every -= 1
    # snapshot quality gates the whole greedy: at big n plain Jacobi-CG
    # needs O(sqrt(kappa)) ~ hundreds of iterations for the FIRST step
    # (later steps warm-start); the mass-shifted V-cycle is
    # mesh-independent
    maxiter = 60 if precond == "mg" else 1500
    print(f"FOM solver: {precond}-CG, maxiter {maxiter}")
    view = dev.as_reductor_fom(tol=1e-6, maxiter=maxiter, precond=precond,
                               store_every=store_every)
    theta = StreamedGaussianEmbedding.make(n, range_dim=args.k, seed=0)
    red = InstationaryReductor(view, embedding=theta, log_level=20)
    train = [jax.tree.map(lambda x: x.astype(jnp.float32), m)
             for m in view.parameter_space.sample_randomly(12, key=1)]

    t0 = time.perf_counter()
    rom, hist = pod_greedy(view, red, train, max_extensions=args.ext,
                           pad_to=args.ext, log_level=20)
    print(f"POD-greedy: basis {red.basis_size} in "
          f"{time.perf_counter() - t0:.1f}s")
    print("max estimates:",
          " ".join(f"{e:.2e}" for e in hist["max_estimates"]))

    mu_t = jax.tree.map(lambda x: x.astype(jnp.float32),
                        view.parameter_space.sample_randomly(1, key=5)[0])
    traj_r, eta = rom.solve(mu_t, return_estimate=True)
    truth = np.asarray(view.solve(mu_t))
    # compare at the stored steps (the ROM trajectory covers every step)
    rec = np.asarray(red.reconstruct(traj_r))[:, ::store_every]
    rel = np.linalg.norm(rec - truth) / np.linalg.norm(truth)
    print(f"held-out trajectory rel error {rel:.2e}, "
          f"space-time estimate {float(eta):.2e}")
    print("done")


if __name__ == "__main__":
    main()
