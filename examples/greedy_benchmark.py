#!/usr/bin/env python
"""Greedy wall-clock: sketched vs classical RB (BASELINE metric
"sketched-RB greedy wall-clock: beat pyMOR reference loop" — the classical
reductor here implements exactly the pyMOR-style offline/online
decomposition the reference falls back to).

Where the time goes: the classical estimator needs the Gram matrix of all
Riesz-lifted residual terms — O(T r) FOM-sized solves and O((T r)^2)
inner products per basis size; the sketched reductor replaces all of it
with k-dimensional sketches. Both online sweeps are vmapped.

Run: python examples/greedy_benchmark.py [--cpu] [--grid 48] [--ext 15]
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
    ap.add_argument("--ext", type=int, default=15)
    ap.add_argument("--train", type=int, default=100)
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", jax.default_backend() == "cpu")

    import jax.numpy as jnp
    import numpy as np

    from rla4mor_tpu.models import ThermalBlockFOM
    from rla4mor_tpu.mor import ClassicalReductor, SketchedReductor, rb_greedy
    from rla4mor_tpu.ops import GaussianEmbedding

    fom = ThermalBlockFOM((3, 3), args.grid)
    Ru = fom.h1_0_product
    training = fom.parameter_space.sample_randomly(args.train, key=0)
    print(f"FOM n = {fom.solution_dim}, {len(training)} training parameters, "
          f"{args.ext} extensions")

    results = {}
    reductors = {}
    for name, make in {
        "classical": lambda: ClassicalReductor(fom, product=Ru, log_level=40),
        "sketched": lambda: SketchedReductor(
            fom,
            embedding_primal=GaussianEmbedding.make(
                fom.solution_dim, sqrt_product=Ru.sqrt, range_dim=400, seed=1
            ),
            embedding_online=GaussianEmbedding.make(400, range_dim=200, seed=2),
            product=Ru,
            log_level=40,
        ),
    }.items():
        red = make()
        reductors[name] = red
        t0 = time.perf_counter()
        res = rb_greedy(fom, red, training, max_extensions=args.ext)
        t = time.perf_counter() - t0
        t_fom = sum(res.extension_times)
        results[name] = (t, t_fom, res)
        print(f"{name:10s}: total {t:7.2f}s  (FOM solves+extension "
              f"{t_fom:6.2f}s, reduce+sweep {t - t_fom:6.2f}s), "
              f"final max-est {res.max_estimates[-1]:.3e}")

    # accuracy cross-check on held-out parameters
    test = fom.parameter_space.sample_randomly(5, key=9)
    u_true = [np.asarray(fom.solve(mu)) for mu in test]
    for name, (_, _, res) in results.items():
        rels = []
        for mu, u in zip(test, u_true):
            y = np.asarray(res.rom.solve(mu))
            u_rom = np.asarray(reductors[name].reconstruct(jnp.asarray(y)))
            rels.append(
                float(Ru.norm(jnp.asarray(u - u_rom)))
                / float(Ru.norm(jnp.asarray(u)))
            )
        print(f"{name:10s}: mean held-out rel error {np.mean(rels):.3e}")

    t_c = results["classical"][0]
    t_s = results["sketched"][0]
    print(f"\nspeedup (classical / sketched): {t_c / t_s:.2f}x")


if __name__ == "__main__":
    main()
