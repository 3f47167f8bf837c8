#!/usr/bin/env python
"""Probe round 2: blocked-rows layout + exact-multiple fix at the
reductor shapes (n = 2049^2, m in {1, 56}); pow2 sanity (2^23, 128)."""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from rla4mor_tpu.ops.embeddings import SrhtEmbedding
from rla4mor_tpu.ops.srht_pallas import (
    srht_onepass_flat,
    srht_onepass_flat_cols,
)

P = jax.lax.Precision
K = 256
N = 2049 * 2049


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timed_sync(fn, x, iters=5):
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


def probe(tag, fn, x, nbytes, t_roof_a):
    try:
        t = timed_sync(fn, x)
        t_a = timed_amortized(fn, x)
    except Exception as e:
        log(f"  {tag}: FAILED {e!r}")
        return
    log(f"  {tag}: sync {t * 1e3:.1f} ms | amort {t_a * 1e3:.2f} ms "
        f"({nbytes / t_a / 1e9:.1f} GB/s, "
        f"{t_roof_a / t_a * 100:.0f}% of pipelined roofline)")


def main():
    log(f"devices: {jax.devices()}")
    t0 = time.perf_counter()
    _ = np.asarray(jnp.sum(jnp.ones((8, 8))))
    log(f"tunnel probe: first tiny op {time.perf_counter() - t0:.1f}s")

    key = jax.random.key(0)
    roof = jax.jit(lambda v: jnp.sum(v, dtype=jnp.float32))

    # pow2 sanity: (2^23, 128) cols through the exact-multiple shortcut
    n2 = 1 << 23
    xs = jax.random.normal(key, (n2, 128), jnp.float32)
    nb = n2 * 128 * 4
    t_ra = timed_amortized(roof, xs)
    log(f"[pow2 (2^23,128) f32] roofline amort {t_ra * 1e3:.2f} ms "
        f"({nb / t_ra / 1e9:.1f} GB/s)")
    probe("flat_cols exact", jax.jit(
        lambda v: jnp.sum(srht_onepass_flat_cols(v, K, key, P.DEFAULT) ** 2)),
        xs, nb, t_ra)
    del xs

    # non-pow2 (n, 128) cols with slice+tail
    x1 = jax.random.normal(key, (N, 128), jnp.float32)
    nb = N * 128 * 4
    t_ra = timed_amortized(roof, x1)
    log(f"[(2049^2,128) f32 cols] roofline amort {t_ra * 1e3:.2f} ms "
        f"({nb / t_ra / 1e9:.1f} GB/s)")
    probe("flat_cols slice+tail", jax.jit(
        lambda v: jnp.sum(srht_onepass_flat_cols(v, K, key, P.DEFAULT) ** 2)),
        x1, nb, t_ra)
    del x1

    # blocked ROWS layout at the reductor shapes
    e = SrhtEmbedding.make(N, range_dim=K, seed=0)
    B, R = e.blocked_shape
    log(f"blocked_shape for n=2049^2: B={B}, R={R}")
    for m in (56, 1):
        xb = jax.random.normal(key, (m, B, R), jnp.float32)
        # zero the tail for contract validity
        tail = B * R - N
        xb = xb.at[:, -1, R - tail:].set(0.0)
        nbb = m * B * R * 4
        t_ra = timed_amortized(roof, xb)
        log(f"[blocked rows ({m},{B},{R}) f32] roofline amort "
            f"{t_ra * 1e3:.2f} ms ({nbb / t_ra / 1e9:.1f} GB/s)")
        probe("flat rows blocked (kernel)", jax.jit(
            lambda v: jnp.sum(srht_onepass_flat(v, K, key, P.DEFAULT, n=N) ** 2)),
            xb, nbb, t_ra)
        probe("SrhtEmbedding.apply_random blocked", jax.jit(
            lambda v: jnp.sum(e.apply_random(v) ** 2)),
            xb, nbb, t_ra)
        del xb

    # embedding-level vec path (m=1 1-D)
    xv = jax.random.normal(key, (N,), jnp.float32)
    nbv = N * 4
    t_ra = timed_amortized(roof, xv)
    log(f"[(n,) f32 vec] roofline amort {t_ra * 1e3:.2f} ms "
        f"({nbv / t_ra / 1e9:.1f} GB/s)")
    probe("SrhtEmbedding.apply_random vec", jax.jit(
        lambda v: jnp.sum(e.apply_random(v) ** 2)), xv, nbv, t_ra)

    log("done")


if __name__ == "__main__":
    main()
