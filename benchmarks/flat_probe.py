"""Probe: the no-scan flat-dot SRHT (srht_onepass_flat) vs the scan.

orient_probe.py showed a flat (M,R)@(R,K) dot streams at the VPU read
rate (~375 GB/s amortized) while the production scan reaches ~half.
This times the full flat formulation (with signs + recombination) in
f32 and with bf16 snapshot input, plus a no-sign diagnostic to expose
whether the Rademacher multiply fuses into the dot.
"""

import sys as _sys
from pathlib import Path as _Path
_sys.path.insert(0, str(_Path(__file__).resolve().parents[1]))

import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from rla4mor_tpu.ops.srht_pallas import srht_onepass_flat, srht_onepass_xla

P = jax.lax.Precision


def timed(fn, x, iters=5):
    _ = np.asarray(fn(x))
    ts = []
    for _i in range(iters):
        t0 = time.perf_counter()
        _ = np.asarray(fn(x))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def timed_amortized(fn, x, chain=6, reps=3):
    _ = np.asarray(fn(x))
    best = float("inf")
    for _r in range(reps):
        t0 = time.perf_counter()
        rs = [fn(x) for _ in range(chain)]
        _ = np.asarray(rs[-1])
        best = min(best, (time.perf_counter() - t0) / chain)
    return best


def main(d=24, rows=56, k=256):
    n = 1 << d
    key = jax.random.key(0)
    x = jax.random.normal(jax.random.fold_in(key, 1), (rows, n), jnp.float32)
    xh = x.astype(jnp.bfloat16)
    _ = np.asarray(jnp.sum(x) + jnp.sum(xh).astype(jnp.float32))
    nb32, nb16 = rows * n * 4, rows * n * 2

    roof = jax.jit(lambda v: jnp.sum(v, dtype=jnp.float32))
    for name, arr, nb in (("roof_f32", x, nb32), ("roof_bf16", xh, nb16)):
        t, ta = timed(roof, arr), timed_amortized(roof, arr)
        print(f"{name}: sync {t*1e3:7.1f} ms ({nb/t/1e9:6.1f} GB/s) | "
              f"amort {ta*1e3:7.1f} ms ({nb/ta/1e9:6.1f} GB/s)", flush=True)

    # correctness vs the scan first (cheap shapes compile fast on CPU-like
    # sizes? no -- same big shape, reuse the timed fns' outputs instead)
    small = jax.random.normal(key, (3, 1 << 13), jnp.float32)
    y1 = np.asarray(srht_onepass_flat(small, 100, key, P.HIGHEST))
    y2 = np.asarray(srht_onepass_xla(small, 100, key, P.HIGHEST))
    print(f"correctness flat vs scan (small): "
          f"{np.abs(y1 - y2).max() / np.abs(y2).max():.2e}", flush=True)

    cands = {
        "flat_f32": (x, nb32, jax.jit(lambda v: jnp.sum(
            srht_onepass_flat(v, k, key, P.DEFAULT) ** 2))),
        "flat_bf16in": (xh, nb16, jax.jit(lambda v: jnp.sum(
            srht_onepass_flat(v, k, key, P.DEFAULT).astype(jnp.float32) ** 2))),
        "flat_f32_bigR": (x, nb32, jax.jit(lambda v: jnp.sum(
            srht_onepass_flat(v, k, key, P.DEFAULT, block=4096) ** 2))),
    }
    for name, (arr, nb, fn) in cands.items():
        try:
            t, ta = timed(fn, arr), timed_amortized(fn, arr)
        except Exception as e:
            print(f"{name}: FAILED {e!r}", flush=True)
            continue
        print(f"{name}: sync {t*1e3:7.1f} ms ({nb/t/1e9:6.1f} GB/s) | "
              f"amort {ta*1e3:7.1f} ms ({nb/ta/1e9:6.1f} GB/s)", flush=True)


if __name__ == "__main__":
    main()
