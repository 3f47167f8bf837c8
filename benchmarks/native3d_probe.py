"""Probe: flat SRHT from the R-blocked (grid-native) snapshot layout.

flat_decomp_probe showed the 22 ms wall is the minor-axis re-tiling, not
the MXU: a dot on a freshly-(M,R)-shaped array streams at ~375 GB/s.
Here the input is GENERATED in the blocked layout (m, B, R) — exactly
how 2-D grid FOM solutions (models/stencil.py) are stored — so the
contraction needs no relayout.
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

from rla4mor_tpu.ops.srht_pallas import srht_onepass_flat

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


def report(name, fn, arr, nb):
    try:
        t, ta = timed(fn, arr), timed_amortized(fn, arr)
    except Exception as e:
        print(f"{name}: FAILED {e!r}", flush=True)
        return
    print(f"{name}: sync {t*1e3:7.1f} ms ({nb/t/1e9:6.1f} GB/s) | "
          f"amort {ta*1e3:7.1f} ms ({nb/ta/1e9:6.1f} GB/s)", flush=True)


def main(rows=56, k=256):
    key = jax.random.key(0)
    N = 4096  # 4096x4096 grid, n = 2^24 DoF per snapshot
    x3 = jax.random.normal(jax.random.fold_in(key, 1), (rows, N, N),
                           jnp.float32)
    nb32 = rows * N * N * 4
    _ = np.asarray(jnp.sum(x3))

    roof = jax.jit(lambda v: jnp.sum(v, dtype=jnp.float32))
    report("roof_f32 (3d)", roof, x3, nb32)
    report("flat3d_f32 R4096", jax.jit(lambda v: jnp.sum(
        srht_onepass_flat(v, k, key, P.DEFAULT) ** 2)), x3, nb32)
    report("flat3d_f32 R4096 HIGH", jax.jit(lambda v: jnp.sum(
        srht_onepass_flat(v, k, key, P.HIGH) ** 2)), x3, nb32)

    xh = x3.astype(jnp.bfloat16)
    _ = np.asarray(jnp.sum(xh).astype(jnp.float32))
    report("roof_bf16 (3d)", roof, xh, nb32 // 2)
    report("flat3d_bf16 R4096", jax.jit(lambda v: jnp.sum(
        srht_onepass_flat(v, k, key, P.DEFAULT).astype(jnp.float32) ** 2)),
        xh, nb32 // 2)
    del xh

    x2 = x3.reshape(rows, 8192, 2048)
    del x3
    _ = np.asarray(jnp.sum(x2))
    report("flat3d_f32 R2048", jax.jit(lambda v: jnp.sum(
        srht_onepass_flat(v, k, key, P.DEFAULT) ** 2)), x2, nb32)


if __name__ == "__main__":
    main()
