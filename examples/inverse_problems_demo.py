#!/usr/bin/env python
"""PBDW + dictionary recovery demo (counterpart of reference
inverse_problems/example.py:33-124): 3x3 thermal block, POD background,
random pointwise observations, error-vs-dimension tables and the
LARS-path-vs-manifold-distance study. Saves plots if matplotlib is
available.
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", jax.default_backend() == "cpu")

    import jax.numpy as jnp
    import numpy as np

    from rla4mor_tpu.core import (
        ChainOp, compose, gram_schmidt, materialize, pod, project,
    )
    from rla4mor_tpu.estim import (
        DicRecoveryMap, PbdwRecoveryMap, ResidualDistanceAffine,
    )
    from rla4mor_tpu.models import ThermalBlockFOM
    from rla4mor_tpu.ops import GaussianEmbedding

    fom = ThermalBlockFOM((3, 3), 32)
    Ru = fom.h1_0_product
    n = fom.solution_dim
    print(f"FOM: {fom.name}, n = {n}")

    # observation space: random pointwise evaluations, Riesz-lifted
    m = 50
    rng = np.random.RandomState(0)
    rows = rng.choice(n, size=m, replace=False)
    Wd = np.zeros((n, m))
    Wd[rows, np.arange(m)] = 1.0
    W = gram_schmidt(jnp.asarray(np.asarray(Ru.inv.apply(jnp.asarray(Wd)))),
                     product=Ru)

    # POD background from 200 training snapshots
    mus_train = fom.parameter_space.sample_randomly(200, key=1)
    u_train = fom.solve_many(mus_train)
    rb, svals = pod(u_train, product=Ru, modes=20)
    print("POD svals (normalized):",
          " ".join(f"{float(s / svals[0]):.1e}" for s in svals[:10]))

    mus_test = fom.parameter_space.sample_randomly(3, key=2)
    u_test = fom.solve_many(mus_test)
    obs = Ru.inner(W, u_test)

    # PBDW error decay
    rm_pbdw = PbdwRecoveryMap(rb, W, product=Ru, log_level=30)
    print("\nPBDW mean test error vs background dim:")
    errors_pbdw = []
    for i in range(1, rb.shape[1] + 1, 3):
        rmi = rm_pbdw.project_background(jnp.arange(i))
        ui = np.asarray(rmi.solve(obs))
        e = float(np.mean(np.asarray(Ru.norm(jnp.asarray(
            ui - np.asarray(u_test))))))
        errors_pbdw.append((i, e))
        print(f"  dim {i:3d}: {e:.3e}")

    # dictionary recovery with manifold-distance selection
    V_dic = np.asarray(u_train) / np.asarray(Ru.norm(u_train))[None, :]
    X = jnp.concatenate([jnp.asarray(V_dic), W], axis=1)
    S = GaussianEmbedding.make(n, sqrt_product=Ru.sqrt, range_dim=256, seed=3)
    chain = ChainOp((S, Ru.inv))
    lhs = project(compose(chain, fom.operator), None, X)
    rhs = materialize(compose(chain, fom.rhs))
    lo, hi = fom.parameter_space.low, fom.parameter_space.high
    p = fom.parameter_space.dim()
    mdist = ResidualDistanceAffine(lhs, rhs, ([lo] * p, [hi] * p),
                                   pg_iters=500)
    rm_dic = DicRecoveryMap(jnp.asarray(V_dic), W, product=Ru,
                            manifold_distance=mdist, log_level=30)
    u_rec = np.asarray(rm_dic.solve(obs))
    rel = np.asarray(Ru.norm(jnp.asarray(u_rec - np.asarray(u_test)))) / \
        np.asarray(Ru.norm(u_test))
    print("\nDictionary recovery relative errors:",
          " ".join(f"{e:.3e}" for e in rel))

    # path study for the worst case
    imax = int(np.argmax(rel))
    u_path, dist = rm_dic.solve_path(np.asarray(obs)[:, imax])
    errs_path = np.asarray(Ru.norm(u_path - np.asarray(u_test)[:, imax:imax+1]))
    print(f"\nLARS path ({len(dist)} points): "
          f"argmin distance = {int(np.argmin(dist))}, "
          f"argmin error = {int(np.argmin(errs_path))}")

    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, axes = plt.subplots(1, 2, figsize=(10, 4))
        dims, errs = zip(*errors_pbdw)
        axes[0].semilogy(dims, errs, "o-")
        axes[0].set_xlabel("background dimension")
        axes[0].set_ylabel("PBDW mean test error")
        axes[1].loglog(np.asarray(dist), errs_path, "o")
        axes[1].set_xlabel("manifold distance")
        axes[1].set_ylabel("recovery error along LARS path")
        fig.tight_layout()
        fig.savefig("inverse_problems_demo.png", dpi=120)
        print("\nsaved inverse_problems_demo.png")
    except Exception as e:
        print(f"(no plots: {e})")


if __name__ == "__main__":
    main()
