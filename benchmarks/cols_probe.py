"""Probe: columns-native flat SRHT on (n, m) snapshot matrices.

The (n, m) -> (B, R, m) leading split is tiling-free; the question is
the rate of the (K, R) @ (B, R, m) dot and the minor-dim (m) tile
padding cost (m < 128 lanes pads physically).
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

from rla4mor_tpu.ops.srht_pallas import srht_onepass_flat_cols

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


def main(k=256):
    key = jax.random.key(0)
    roof = jax.jit(lambda v: jnp.sum(v, dtype=jnp.float32))
    for n_log, m in ((23, 128), (24, 56)):
        n = 1 << n_log
        nb = n * m * 4
        U = jax.random.normal(jax.random.fold_in(key, m), (n, m), jnp.float32)
        _ = np.asarray(jnp.sum(U))
        report(f"roof (2^{n_log},{m})", roof, U, nb)
        report(f"cols flat (2^{n_log},{m})", jax.jit(lambda v: jnp.sum(
            srht_onepass_flat_cols(v, k, key, P.DEFAULT) ** 2)), U, nb)
        report(f"cols transpose+scanpath (2^{n_log},{m})", jax.jit(
            lambda v: jnp.sum(__import__(
                'rla4mor_tpu.ops.srht_pallas', fromlist=['srht_onepass_xla']
            ).srht_onepass_xla(v.T, k, key, P.DEFAULT) ** 2)), U, nb)
        del U


if __name__ == "__main__":
    main()
