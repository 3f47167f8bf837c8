#!/usr/bin/env python
"""Large-n parametric preconditioning, fully matrix-free (VERDICT r2 item 5).

The sketched-HS preconditioner selection (precond/) driven end-to-end on
the matrix-free stencil thermal block at ~1M DoF on one chip:

* directions P_i = A(mu_i)^-1 are RecycledCGInverseOp (deflated
  warm-started MG-CG) — no factorization ever touches the 1M-DoF
  operator, the TPU-native analog of the reference's stored LU/Cholesky
  directions (reference utilities/factorization.py:84-138);
* every n-sized sketch goes through SrhtEmbedding's one-pass roofline
  path (n = (N+1)^2 is NOT a power of two — the any-n zero-block plan);
* the online stage is the jitted BATCHED program
  (PreconditionedReductor.solve_batch): assemble HS estimator -> lstsq
  -> FactoredROM solve, vmapped over the whole mu batch in one program.

Run on TPU:  python examples/preconditioned_large_demo.py
Run on CPU:  python examples/preconditioned_large_demo.py --cpu --grid 64
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
    ap.add_argument("--grid", type=int, default=1024,
                    help="num_intervals (power of two for MG)")
    ap.add_argument("--nrb", type=int, default=5)
    ap.add_argument("--ndir", type=int, default=3)
    ap.add_argument("--nmu", type=int, default=64)
    ap.add_argument("--k-res", type=int, default=200)
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from rla4mor_tpu.core import mu_stack
    from rla4mor_tpu.core.affine import AffineOp
    from rla4mor_tpu.core.linops import DenseOp, RecycledCGInverseOp
    from rla4mor_tpu.core.orthonormalize import gram_schmidt
    from rla4mor_tpu.core.parameters import ONE, ParameterSpace
    from rla4mor_tpu.models.stationary import StationaryFOM
    from rla4mor_tpu.models.stencil import StencilThermalBlock
    from rla4mor_tpu.ops import GaussianEmbedding, SrhtEmbedding
    from rla4mor_tpu.ops.embeddings import VectorizedEmbedding
    from rla4mor_tpu.precond import PreconditionedReductor

    dt = jnp.float32 if not args.cpu else jnp.float64
    st = StencilThermalBlock((2, 2), args.grid, dtype=dt)
    n = st.n_nodes ** 2
    print(f"grid {st.n_nodes}x{st.n_nodes}: n = {n / 1e6:.2f}M DoF "
          f"(matrix-free stencil terms)")

    op = st.affine_operator()
    rhs_vec = st.rhs().reshape(-1, 1)
    space = ParameterSpace.make({"diffusion": st.n_terms}, 0.1, 1.0)
    fom = StationaryFOM(op, AffineOp((DenseOp(rhs_vec),), (ONE,)),
                        parameter_space=space)

    def solve_fom(mu, tol=1e-7, maxiter=400):
        return st.solve_cg(mu, tol=tol, maxiter=maxiter,
                           precond="mg").reshape(-1)

    def cast(mu):
        return jax.tree.map(lambda x: jnp.asarray(x, dt), mu)

    # ---- offline: snapshots -> reduced basis ------------------------------
    t0 = time.perf_counter()
    mus_rb = [cast(m) for m in space.sample_randomly(args.nrb, key=0)]
    U = jnp.stack([solve_fom(m) for m in mus_rb], axis=1)
    U = gram_schmidt(U)
    r = U.shape[1]
    print(f"{r} MG-CG snapshots + QR: {time.perf_counter() - t0:.1f}s")

    # ---- reductor: ur_ur sketched-HS key, one-pass SRHT on the big space --
    sig = GaussianEmbedding.make(r, range_dim=2 * r, seed=10)
    om = GaussianEmbedding.make(r, range_dim=2 * r, seed=11)
    vec = VectorizedEmbedding(
        embedding=GaussianEmbedding.make(4 * r * r, range_dim=4 * r, seed=12),
        rows=2 * r, cols=2 * r,
    )
    red = PreconditionedReductor(
        fom=fom,
        reduced_basis=U,
        source_bases={"ur_ur": U},
        range_bases={"ur_ur": U},
        source_embeddings={"ur_ur": sig},
        range_embeddings={"ur_ur": om},
        vec_embeddings={"ur_ur": vec},
        residual_embedding=SrhtEmbedding.make(
            n, range_dim=args.k_res, seed=13),
        stable_galerkin=True,
        log_level=30,
    )

    # ---- directions: deflated warm-started MG-CG inverses -----------------
    from rla4mor_tpu.models.multigrid import make_vcycle

    mus_dir = [cast(m) for m in space.sample_randomly(args.ndir, key=1)]
    for i, mu_i in enumerate(mus_dir):
        vcyc = make_vcycle(st.kappa(mu_i))
        N = st.n_nodes
        P_i = RecycledCGInverseOp(
            lambda v, mu_i=mu_i: op.apply(v, mu_i),
            n,
            precond=lambda rr, vcyc=vcyc, N=N:
                vcyc(rr.reshape(N, N)).reshape(-1),
            tol=1e-7, maxiter=300, dtype=dt,
        )
        t0 = time.perf_counter()
        red.add_preconditioner(P_i, mu_i)
        print(f"direction {i} (RecycledCG, {P_i.last_iters} its last solve): "
              f"sketched in {time.perf_counter() - t0:.1f}s")

    # ---- online: batched program vs per-mu loop ---------------------------
    mus = [cast(m) for m in space.sample_randomly(args.nmu, key=2)]
    batch = mu_stack(mus)

    t0 = time.perf_counter()
    u_batch, ys, rnorms = red.solve_batch(batch, "ur_ur")
    _ = np.asarray(u_batch)
    t_first = time.perf_counter() - t0
    t0 = time.perf_counter()
    u_batch2, _, _ = red.solve_batch(batch, "ur_ur")
    _ = np.asarray(u_batch2)
    t_batch = time.perf_counter() - t0

    t0 = time.perf_counter()
    u_loop = [red.solve(m, "ur_ur")[0] for m in mus[:8]]
    _ = np.asarray(u_loop[-1])
    t_loop = (time.perf_counter() - t0) / 8 * args.nmu

    print(f"online stage over {args.nmu} mus: batched "
          f"{t_batch * 1e3:.0f} ms (compile+run {t_first:.1f}s) vs per-mu "
          f"loop ~{t_loop * 1e3:.0f} ms -> {t_loop / t_batch:.0f}x")

    # spot-check: preconditioned ROM error at 3 mus vs the MG-CG truth
    errs = []
    for m, u_r in zip(mus[:3], np.asarray(u_batch)[:3]):
        u_true = np.asarray(solve_fom(m))
        u_full = np.asarray(U) @ u_r
        errs.append(np.linalg.norm(u_full - u_true)
                    / np.linalg.norm(u_true))
    print("relative ROM errors vs MG-CG truth:",
          " ".join(f"{e:.2e}" for e in errs))


if __name__ == "__main__":
    main()
