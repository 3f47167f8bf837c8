"""Probe: throughput of sign-multiply + per-block rolled reduction.

z = sum_l roll(s_l * x_l, o_l along the coarse axis) on a (m, L, b1, 128)
view — candidate single-pass collapse for a CountSketch+SRHT composition.
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
    s = (2 * jax.random.bernoulli(jax.random.fold_in(key, 2), 0.5, (n,)) - 1
         ).astype(jnp.int8)

    for b_log in (16, 17):
        b = 1 << b_log
        L = n // b
        b1 = b // 128
        o = jax.random.randint(jax.random.fold_in(key, 3), (L,), 0, b1)

        def p0(v):  # no roll (broken statistically; traffic baseline)
            y = (v * s.astype(v.dtype)).reshape(rows, L, b)
            return jnp.sum(y.sum(1) ** 2)

        def p1(v):  # take_along_axis gather on coarse axis
            y = (v * s.astype(v.dtype)).reshape(rows, L, b1, 128)
            i1 = jnp.arange(b1)
            idx = (i1[None, :] - o[:, None]) % b1  # (L, b1)
            g = jnp.take_along_axis(y, idx[None, :, :, None], axis=2)
            return jnp.sum(g.sum(1) ** 2)

        def p2(v):  # scan over blocks, concat-doubled dynamic_slice roll
            y = (v * s.astype(v.dtype)).reshape(rows, L, b1, 128)
            y = jnp.moveaxis(y, 1, 0)  # (L, m, b1, 128)

            def step(acc, inp):
                blk, ol = inp
                dbl = jnp.concatenate([blk, blk], axis=1)
                rolled = jax.lax.dynamic_slice(
                    dbl, (jnp.int32(0), ol.astype(jnp.int32), jnp.int32(0)),
                    (rows, b1, 128))
                return acc + rolled, None

            acc0 = jnp.zeros((rows, b1, 128), v.dtype)
            acc, _ = jax.lax.scan(step, acc0, (y, o))
            return jnp.sum(acc ** 2)

        for name, fn in [("p0_noroll", p0), ("p1_gather", p1),
                         ("p2_scan_slice", p2)]:
            try:
                t = timed(jax.jit(fn), x)
            except Exception as e:
                print(f"b=2^{b_log} {name}: FAILED {type(e).__name__}",
                      flush=True)
                continue
            print(f"b=2^{b_log} {name}: {t*1e3:.1f} ms -> "
                  f"{nbytes/t/1e9:.1f} GB/s", flush=True)


if __name__ == "__main__":
    main()
