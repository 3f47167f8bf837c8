"""Probe: what limits a (M, R)@(R, N) bf16 dot streaming 3.76 GB on this chip?

If halving N doubles throughput -> MXU-compute-bound; if flat -> bandwidth/
pipeline-bound. Also probes the sign-multiply fusion and f32 accumulate.
"""

import sys as _sys
from pathlib import Path as _Path
_sys.path.insert(0, str(_Path(__file__).resolve().parents[1]))


import time
import sys

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np


def timed(fn, *args, iters=5):
    _ = np.asarray(fn(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        _ = np.asarray(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    d, rows = 24, 56
    n = 1 << d
    key = jax.random.key(0)
    x = jax.random.normal(jax.random.fold_in(key, 1), (rows, n), jnp.float32)
    nbytes = rows * n * 4
    t = timed(jax.jit(jnp.sum), x)
    print(f"roofline(sum) {nbytes/t/1e9:.1f} GB/s", flush=True)
    # elementwise multiply + sum (VPU chain)
    s = jax.random.rademacher(jax.random.fold_in(key, 2), (n,), jnp.int8) \
        if hasattr(jax.random, "rademacher") else \
        (2 * jax.random.bernoulli(jax.random.fold_in(key, 2), 0.5, (n,)) - 1).astype(jnp.int8)
    t = timed(jax.jit(lambda v: jnp.sum(v * s.astype(v.dtype))), x)
    print(f"sign-mul+sum {nbytes/t/1e9:.1f} GB/s", flush=True)

    for R, N in [(4096, 256), (4096, 128), (4096, 64), (65536, 256),
                 (65536, 128), (4096, 512), (16384, 256)]:
        M = rows * n // R
        w = jax.random.normal(jax.random.fold_in(key, 3), (R, N), jnp.float32)

        def dot(v, w=w, M=M, R=R):
            return jnp.sum(jax.lax.dot_general(
                v.reshape(M, R), w, (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.DEFAULT,
                preferred_element_type=jnp.float32) ** 2)

        t = timed(jax.jit(dot), x)
        gbps = nbytes / t / 1e9
        tf = 2 * M * R * N / t / 1e12
        print(f"dot M={M} R={R} N={N}: {t*1e3:.1f} ms -> {gbps:.1f} GB/s, "
              f"{tf:.1f} TF/s", flush=True)

    # bf16 weights (halve weight traffic; same MACs)
    R, N = 65536, 256
    M = rows * n // R
    wb = jax.random.normal(jax.random.fold_in(key, 3), (R, N), jnp.bfloat16)
    def dotb(v):
        return jnp.sum(jax.lax.dot_general(
            v.reshape(M, R).astype(jnp.bfloat16), wb,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) ** 2)
    t = timed(jax.jit(dotb), x)
    print(f"dot bf16w M={M} R={R} N={N}: {t*1e3:.1f} ms -> "
          f"{nbytes/t/1e9:.1f} GB/s", flush=True)


if __name__ == "__main__":
    main()
