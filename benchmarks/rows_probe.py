"""Row-count scaling: the BASELINE workload is (1e7 x 500); more rows
amortize per-step overhead and improve MXU utilization (M = rows * Q)."""

import sys as _sys
from pathlib import Path as _Path
_sys.path.insert(0, str(_Path(__file__).resolve().parents[1]))

import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np


def timed(fn, x, iters=5):
    _ = np.asarray(fn(x))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        _ = np.asarray(fn(x))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    from rla4mor_tpu.ops.srht_pallas import srht_onepass_xla

    d, k = 24, 256
    n = 1 << d
    key = jax.random.key(0)
    P = jax.lax.Precision
    for rows in (56, 112):
        x = jax.random.normal(jax.random.fold_in(key, rows), (rows, n),
                              jnp.float32)
        nbytes = rows * n * 4
        t = timed(jax.jit(jnp.sum), x)
        roof = nbytes / t / 1e9
        fn = jax.jit(lambda v: jnp.sum(
            srht_onepass_xla(v, k, key, P.DEFAULT) ** 2))
        t = timed(fn, x)
        gbps = nbytes / t / 1e9
        print(f"rows={rows}: roofline {roof:.1f}, xla_scan_bf16 "
              f"{t*1e3:.1f} ms -> {gbps:.1f} GB/s ({gbps/roof*100:.0f}%)",
              flush=True)
        del x


if __name__ == "__main__":
    main()
