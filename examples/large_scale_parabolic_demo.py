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
    ap.add_argument("--bounds", action="store_true",
                    help="certify the held-out trajectory: matrix-free "
                    "LOBPCG l2 anchor (Bauer-Fike safe) -> min-theta "
                    "alpha_LB -> Grepl-Patera parabolic_error_bound "
                    "(final-time M-norm), printed against the measured "
                    "error — certified bounds at the same pod scale as "
                    "the greedy")
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

    if args.bounds:
        # certified Grepl-Patera bound at the SAME scale as the greedy:
        # the reductor's embedding is an unweighted l2 OSE, so eta
        # approximates sqrt(dt sum_k ||r_k||_2^2) — the matching
        # alpha_LB is the l2 coercivity of A(mu), anchored by the
        # matrix-free LOBPCG (safe Bauer-Fike enclosure) + min-theta.
        from rla4mor_tpu.mor import MinThetaCoercivity, parabolic_error_bound
        from rla4mor_tpu.mor.scm_matfree import l2_interior_scm

        mu_ref = {"diffusion": jnp.ones((st.n_terms,))}
        t0 = time.perf_counter()
        scm = l2_interior_scm(st, mu_ref, two_stage=True, iters=200,
                              tol=1e-8, cg_maxiter=1200)
        alpha_ref, _ = scm.alpha_exact(mu_ref)
        t_eig = time.perf_counter() - t0
        assert alpha_ref > 0
        print(f"l2 anchor lambda_min(A(1), I | interior) = {alpha_ref:.6e}"
              f" ({t_eig:.1f}s, matrix-free LOBPCG two-stage)")
        alpha = MinThetaCoercivity(view, mu_ref, alpha_ref=alpha_ref)
        b_final = float(parabolic_error_bound(rom, mu_t, alpha,
                                              kind="final"))
        # measured final-time M-norm error for honesty
        eT = jnp.asarray(rec[:, -1] - truth[:, -1]).reshape(
            dev.solution_shape if hasattr(dev, "solution_shape")
            else st.solution_shape)
        err_M = float(jnp.sqrt(jnp.vdot(
            eT, dev._mass_apply(eT)).real))
        print(f"certified final-time M-norm bound {b_final:.3e} "
              f"(measured {err_M:.3e}, effectivity "
              f"{b_final / max(err_M, 1e-300):.1f}x) — rigorous up to "
              f"sketch distortion")
    print("done")


if __name__ == "__main__":
    main()
