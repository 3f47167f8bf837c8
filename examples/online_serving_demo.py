#!/usr/bin/env python
"""Online serving demo: ship a ROM artifact, serve batched requests,
hot-swap a model refresh with zero recompiles.

Offline: sketched greedy on the thermal block -> ``save_rom`` (one .npz,
no FOM or reductor state needed at serving time).  Serving:
``load_rom`` + ``rla4mor_tpu.serve.serve_batch`` — the whole online
stage (assemble + solve + error estimate + output per request) is ONE
jitted program over the parameter batch; request counts are quantized
onto accepted batch sizes by ``pad_batch``.

Run on TPU:  python examples/online_serving_demo.py
Run on CPU:  python examples/online_serving_demo.py --cpu
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")


def sync(tree):
    """Device->host transfer of one scalar per output (the axon platform
    does not synchronize on block_until_ready; see CLAUDE.md)."""
    import jax.numpy as jnp

    return float(sum(jnp.sum(jnp.abs(x)).astype(jnp.float32)
                     for x in jax.tree.leaves(tree)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--grid", type=int, default=64,
                    help="thermal-block FEM intervals (n = (grid-1)^2)")
    ap.add_argument("--snapshots", type=int, default=20)
    ap.add_argument("--r", type=int, default=12,
                    help="shipped reduced dimension (truncate_basis)")
    ap.add_argument("--k", type=int, default=200)
    ap.add_argument("--batches", type=int, nargs="+",
                    default=[1, 16, 256, 4096, 65536])
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from rla4mor_tpu.core import mu_stack
    from rla4mor_tpu.models import ThermalBlockFOM
    from rla4mor_tpu.mor import SketchedReductor, load_rom, save_rom
    from rla4mor_tpu.ops import GaussianEmbedding
    from rla4mor_tpu.serve import pad_batch, serve_batch

    # ---- offline: train + ship ------------------------------------------
    t0 = time.perf_counter()
    fom = ThermalBlockFOM((2, 2), args.grid)
    Ru = fom.h1_0_product

    def train(seed):
        theta = GaussianEmbedding.make(
            fom.solution_dim, sqrt_product=Ru.sqrt, range_dim=args.k,
            seed=seed,
        )
        # f32 offline (no x64 here): truncate near-dependent snapshot
        # directions at ~sqrt(eps_f32), else the reduced Galerkin system
        # of RANDOM (collinear) snapshots is numerically singular.  The
        # kept count is data-dependent, so pin the SHIPPED dims with
        # truncate_basis — the hot swap below needs both trainings at
        # identical reduced dims (same jitted program, zero recompiles).
        red = SketchedReductor(fom, embedding_primal=theta, product=Ru,
                               truncation_rtol=3e-4)
        mus = fom.parameter_space.sample_randomly(args.snapshots, key=seed)
        red.extend_basis(fom.solve_many(mus))
        red.truncate_basis(args.r)
        assert red.basis_size == args.r, (
            f"only {red.basis_size} independent directions at rtol 3e-4; "
            f"lower --r or raise --snapshots")
        return red.reduce(seed=seed + 1)

    path = Path("/tmp/rla4mor_serving_model.npz")
    save_rom(train(seed=0), path)
    print(f"offline: trained + shipped r={args.r} ROM "
          f"({path.stat().st_size / 1e3:.0f} kB artifact) in "
          f"{time.perf_counter() - t0:.1f}s")

    # ---- serving process: load + serve ----------------------------------
    rom = load_rom(path)
    # serve in f32 (the TPU-native online dtype; estimators use HIGHEST)
    rom = jax.tree.map(
        lambda x: x.astype(jnp.float32) if hasattr(x, "astype") else x, rom
    )
    space = fom.parameter_space

    def requests(count, key):
        mus = mu_stack(space.sample_randomly(count, key=key))
        return jax.tree.map(lambda x: x.astype(jnp.float32), mus)

    print(f"serving on {jax.devices()[0].platform}: "
          "batched solve + error estimate + output per request")
    for b in args.batches:
        mus, n = pad_batch(requests(b, key=b), b)
        out = serve_batch(rom, mus)   # compile
        sync(out)
        t0 = time.perf_counter()
        reps = max(1, 3 if b >= 4096 else 20)
        for r in range(reps):
            out = serve_batch(rom, mus)
        sync(out)
        dt_call = (time.perf_counter() - t0) / reps
        print(f"  batch {b:>6}: {dt_call * 1e3:8.2f} ms/batch -> "
              f"{b / dt_call:12,.0f} mu/s   "
              f"(median estimate {float(np.median(out['estimate'])):.2e})")

    # ---- zero-recompile hot swap ----------------------------------------
    n_compiles = serve_batch._cache_size()
    save_rom(train(seed=17), path)  # a model refresh lands
    rom2 = jax.tree.map(
        lambda x: x.astype(jnp.float32) if hasattr(x, "astype") else x,
        load_rom(path),
    )
    # reuse the last sweep's batch size -> guaranteed-compiled program
    t0 = time.perf_counter()
    out2 = serve_batch(rom2, mus)
    sync(out2)
    dt = time.perf_counter() - t0
    assert serve_batch._cache_size() == n_compiles, "unexpected recompile!"
    print(f"hot swap: refreshed model served in {dt * 1e3:.2f} ms "
          f"(no recompile; {n_compiles} compiled programs total)")
    print("done")


if __name__ == "__main__":
    main()
