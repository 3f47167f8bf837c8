#!/usr/bin/env python
"""Wave-equation MOR demo: Newmark-beta FOM, POD-greedy ROM, sketched
space-time indicator (beyond-reference — the reference is
stationary-only; hyperbolic counterpart of instationary_demo.py).

Run on CPU: python examples/wave_demo.py --cpu
Big-n device variant: --stencil (matrix-free Newmark over the stencil
thermal block; warm-started CG acceleration solves).
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
    ap.add_argument("--stencil", action="store_true",
                    help="device-native matrix-free Newmark (big n)")
    ap.add_argument("--grid", type=int, default=16)
    ap.add_argument("--nt", type=int, default=60)
    ap.add_argument("--extensions", type=int, default=6)
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", jax.default_backend() == "cpu")

    import jax.numpy as jnp
    import numpy as np

    from rla4mor_tpu.models import WaveReductor, pod_greedy
    from rla4mor_tpu.ops import GaussianEmbedding

    if args.stencil:
        from rla4mor_tpu.models import WaveStencilFOM
        from rla4mor_tpu.models.stencil import StencilThermalBlock

        st = StencilThermalBlock((2, 2), args.grid, dtype=jnp.float32)
        dev = WaveStencilFOM(st, T=1.0, nt=args.nt)
        fom = dev.as_reductor_fom(tol=1e-7, maxiter=500)
        product = None
        emb = GaussianEmbedding.make(fom.solution_dim, range_dim=120,
                                     seed=0)
        print(f"stencil wave FOM: n = {fom.solution_dim}, nt = {fom.nt}")
    else:
        from rla4mor_tpu.models import wave_thermal_block

        fom = wave_thermal_block((2, 2), args.grid, T=1.0, nt=args.nt)
        product = fom.products["h1_0"]
        emb = GaussianEmbedding.make(
            fom.solution_dim, sqrt_product=product.sqrt, range_dim=120,
            seed=0,
        )
        print(f"wave FOM: n = {fom.solution_dim}, nt = {fom.nt}, "
              f"standing-wave u0")

    red = WaveReductor(fom, embedding=emb, product=product, log_level=30)
    # mus at the FOM's dtype (f32 for the stencil path, f64 host FOM)
    mu_dtype = (jnp.float32 if args.stencil
                or jax.default_backend() != "cpu" else jnp.float64)
    train = [jax.tree.map(lambda x: x.astype(mu_dtype), m)
             for m in fom.parameter_space.sample_randomly(12, key=1)]

    t0 = time.perf_counter()
    rom, hist = pod_greedy(fom, red, train, max_extensions=args.extensions,
                           modes_per_extension=3, log_level=20)
    print(f"POD-greedy: basis {red.basis_size} in "
          f"{time.perf_counter() - t0:.1f}s")
    print("max estimates:",
          " ".join(f"{e:.2e}" for e in hist["max_estimates"]))

    test = [jax.tree.map(lambda x: x.astype(mu_dtype), m)
            for m in fom.parameter_space.sample_randomly(3, key=2)]
    for mu in test:
        traj_r, eta = rom.solve(mu, return_estimate=True)
        rec = np.asarray(red.reconstruct(traj_r))
        tr = np.asarray(fom.solve(mu))
        rel = np.linalg.norm(rec - tr) / np.linalg.norm(tr)
        print(f"held-out: rel trajectory err {rel:.2e}, "
              f"indicator {float(eta):.2e}")
    print("done")


if __name__ == "__main__":
    main()
