#!/usr/bin/env python
"""Semilinear (nonlinear-in-state) MOR demo: POD-DEIM with a certified
monotone error bound.

The nonlinear tier the reference framework does not have (it reduces
affine-LINEAR models only): a monotone reaction-diffusion thermal block

    A(mu) u + c(mu) M_L g(u) = f,   g monotone (cubic by default),

solved by jittable Newton-CG, reduced by POD + DEIM hyperreduction of
the reaction (one nodal evaluation per magic point), with the residual
compressed either exactly (Gram) or through an SRHT sketch.  Strong
monotonicity makes  ||u - u_r|| <= ||residual|| / alpha_LB(mu)  a
RIGOROUS bound with the LINEAR family's certified coercivity constant
(min-theta), so the certified tier transfers to the nonlinear class.

Run on CPU: python examples/semilinear_demo.py --cpu
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
    ap.add_argument("--grid", type=int, default=48)
    ap.add_argument("--train", type=int, default=24)
    ap.add_argument("--test", type=int, default=32)
    ap.add_argument("--greedy-steps", type=int, default=8)
    ap.add_argument("--reaction-scale", type=float, default=100.0)
    ap.add_argument("--nonlinearity", default="cubic",
                    choices=("cubic", "expm1", "arctan"))
    ap.add_argument("--sketch-dim", type=int, default=0,
                    help=">0: SRHT-sketched residual estimator")
    ap.add_argument("--parabolic", action="store_true",
                    help="also run the IMEX time-dependent composition")
    ap.add_argument("--nt", type=int, default=24)
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", jax.default_backend() == "cpu")

    import jax.numpy as jnp
    import numpy as np

    from rla4mor_tpu.core.parameters import mu_stack
    from rla4mor_tpu.models.semilinear import SemilinearStencilFOM
    from rla4mor_tpu.mor.semilinear_reductor import SemilinearReductor

    f64 = jax.config.jax_enable_x64
    fom = SemilinearStencilFOM(
        grid_shape=(2, 2), num_intervals=args.grid,
        dtype=jnp.float64 if f64 else jnp.float32,
        nonlinearity=args.nonlinearity,
        reaction_scale=args.reaction_scale,
    )
    print(f"FOM: {fom.n_dof} DoF, g={args.nonlinearity}, "
          f"c scale {args.reaction_scale}")

    emb = None
    if args.sketch_dim > 0:
        from rla4mor_tpu.ops.embeddings import SrhtEmbedding

        emb = SrhtEmbedding.make(fom.n_dof, range_dim=args.sketch_dim,
                                 seed=7)
        print(f"sketched residual estimator: SRHT k={args.sketch_dim}")

    mus_train = fom.sample_parameters(args.train, key=1)
    mus_test = fom.sample_parameters(args.test, key=2)

    # certified l2 coercivity: min-theta over the LINEAR family, anchored
    # at lambda_min(sym A(mu_ref)) — dense at this scale, the matrix-free
    # LOBPCG anchor (mor/scm_matfree.py) at pod scale
    from rla4mor_tpu.mor.bounds import MinThetaCoercivity

    mu_ref = {k: jnp.ones_like(v) for k, v in mus_train[0].items()}
    n = fom.n_dof
    I = jnp.eye(n, dtype=fom.dtype)
    A_ref = sum(np.asarray(fom.linear.term_linop(b).apply(I))
                for b in range(fom.linear.n_terms))
    ml = np.asarray(fom.mass_lumped_diag().reshape(-1))
    mask = ml > 0
    Ai = A_ref[np.ix_(mask, mask)]
    alpha_ref = float(np.linalg.eigvalsh(0.5 * (Ai + Ai.T))[0])
    coerc = MinThetaCoercivity(fom, mu_ref, alpha_ref=alpha_ref)
    print(f"l2 anchor lambda_min(A(1)) = {alpha_ref:.4e}")

    red = SemilinearReductor(fom, embedding=emb)
    t0 = time.perf_counter()
    rom, hist = red.greedy(mus_train, n_steps=args.greedy_steps,
                           coercivity=coerc, n_reserve=2, verbose=True)
    t1 = time.perf_counter()
    print(f"greedy: {len(hist)} steps in {t1 - t0:.1f}s -> "
          f"r={rom.dim}, m_deim={rom.n_deim}")

    # online study: vmapped solves + certified bounds vs true errors
    batched = mu_stack(mus_test)
    t0 = time.perf_counter()
    a_b, est_b = jax.jit(rom.solve_and_estimate_batch)(batched)
    est_b = np.asarray(est_b)
    t1 = time.perf_counter()
    alpha_b = np.asarray([float(coerc(mu)) for mu in mus_test])
    bounds = est_b / alpha_b
    print(f"online: {args.test} certified solves in {t1 - t0:.2f}s "
          f"(one jitted vmapped dispatch)")

    # FOM truth on a subset
    n_check = min(8, args.test)
    errs = [(i, np.asarray(fom.solve_newton(mus_test[i]).reshape(-1)))
            for i in range(n_check)]
    print("\n  mu#   certified bound   estimator        alpha_LB")
    for i in range(n_check):
        print(f"  {i:3d}   {bounds[i]:.4e}       {est_b[i]:.4e}   "
              f"{alpha_b[i]:.4e}")
    viol = 0
    print("\ncontainment check (FOM Newton truth vs bound, "
          f"{n_check} parameters):")
    V = red.last_basis
    for i, u in errs:
        ur = np.asarray(V @ np.asarray(a_b[i]))
        err = np.linalg.norm(u - ur)
        ok = err <= bounds[i] * (1 + 1e-8)
        viol += (not ok)
        print(f"  mu {i:2d}: err {err:.4e} <= bound {bounds[i]:.4e}  "
              f"eff {bounds[i] / max(err, 1e-300):7.1f}  "
              f"{'OK' if ok else 'VIOLATED'}")
    print("\nall contained" if viol == 0 else f"\n{viol} VIOLATIONS")

    if args.parabolic:
        from rla4mor_tpu.models.semilinear import SemilinearInstationaryFOM

        print("\n-- IMEX parabolic composition --")
        ifom = SemilinearInstationaryFOM(fom, T=0.5, nt=args.nt)
        red_p = SemilinearReductor(fom, embedding=emb)
        t0 = time.perf_counter()
        prom = red_p.fit_instationary(
            ifom, mus_train[: max(4, args.train // 4)], pod_rtol=1e-8,
            deim_rtol=1e-8, n_reserve=2)
        t1 = time.perf_counter()
        print(f"parabolic POD-DEIM offline: {t1 - t0:.1f}s -> "
              f"r={prom.dim}, m_deim={prom.W.shape[1]}")
        Vp = np.asarray(red_p.last_basis)
        for i in range(min(4, args.test)):
            mu = mus_test[i]
            rec = Vp @ np.asarray(prom.solve(mu))
            truth = np.asarray(ifom.solve_flat(mu))
            rel = (np.linalg.norm(rec - truth)
                   / max(np.linalg.norm(truth), 1e-300))
            ind = float(prom.estimate_error(mu))
            print(f"  mu {i}: traj rel err {rel:.3e}  "
                  f"space-time indicator {ind:.3e}")

    return 0 if viol == 0 else 1


if __name__ == "__main__":
    raise SystemExit(main())
