#!/usr/bin/env python
"""Sketched reduced-basis demo: greedy construction + online study.

End-to-end counterpart of the reference's implicit user workflow (SURVEY
§3.1-3.2): thermal-block FOM, SRHT primal sketch, weak greedy driven by the
sketched estimator, then a vmapped online accuracy study.

Run on CPU: python examples/sketched_rb_demo.py --cpu
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
    ap.add_argument("--grid", type=int, default=32)
    ap.add_argument("--blocks", type=int, default=2)
    ap.add_argument("--sketch-dim", type=int, default=300)
    ap.add_argument("--extensions", type=int, default=15)
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", jax.default_backend() == "cpu")

    import jax.numpy as jnp
    import numpy as np

    from rla4mor_tpu.models import ThermalBlockFOM
    from rla4mor_tpu.mor import SketchedReductor, rb_greedy
    from rla4mor_tpu.core import mu_stack
    from rla4mor_tpu.ops import GaussianEmbedding, SrhtEmbedding

    fom = ThermalBlockFOM((args.blocks, args.blocks), args.grid)
    Ru = fom.h1_0_product
    print(f"FOM: {fom.name}, n = {fom.solution_dim}")

    theta = SrhtEmbedding.make(
        fom.solution_dim, sqrt_product=Ru.sqrt, range_dim=args.sketch_dim,
        seed=0,
    )
    phi = GaussianEmbedding.make(args.sketch_dim, range_dim=150, seed=1)
    red = SketchedReductor(
        fom, embedding_primal=theta, embedding_online=phi, product=Ru,
        projection="galerkin", log_level=30,
    )

    training = fom.parameter_space.sample_randomly(100, key=2)
    t0 = time.perf_counter()
    result = rb_greedy(fom, red, training, max_extensions=args.extensions)
    t_greedy = time.perf_counter() - t0
    print(f"greedy: {red.basis_size} basis vectors in {t_greedy:.1f}s")
    print("max estimates:",
          " ".join(f"{e:.2e}" for e in result.max_estimates))

    # online study: batched solves + estimates on a test set
    rom = result.rom
    test = fom.parameter_space.sample_randomly(200, key=3)
    batched = mu_stack(test)
    t0 = time.perf_counter()
    ys, ests = jax.jit(rom.solve_and_estimate_batch)(batched)
    jax.block_until_ready((ys, ests))
    t_online = time.perf_counter() - t0
    print(f"online: 200 solves+estimates in {t_online * 1e3:.1f} ms "
          f"({t_online / 200 * 1e6:.0f} us each)")

    # true errors on a few
    errs = []
    for i in range(5):
        u = np.asarray(fom.solve(test[i]))
        ur = np.asarray(red.rb) @ np.asarray(ys[i])
        errs.append(float(Ru.norm(jnp.asarray(u - ur))) /
                    float(Ru.norm(jnp.asarray(u))))
    print("true relative errors (5 samples):",
          " ".join(f"{e:.2e}" for e in errs))
    print("estimates for the same:",
          " ".join(f"{float(ests[i]):.2e}" for i in range(5)))


if __name__ == "__main__":
    main()
