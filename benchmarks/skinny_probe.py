#!/usr/bin/env python
"""Probe: SRHT apply throughput at the REDUCTOR's real shapes (VERDICT r2
item 1) — non-power-of-two n = 2049^2 (stencil-FOM node count) and the
skinny snapshot widths greedy actually produces (m = 1 single extension,
m = 56 block), against each shape's own measured 1-read roofline.

Variants per shape:
  m=1 (1-D (n,) vector): srht_onepass_vec (one (B,R)@(R,K) dot),
      default R and R=4096; the canonical 3-pass srht for reference.
  m=56 ((n, 56) cols): srht_onepass_flat_cols ((K,B,m) dot, m minor),
      srht_onepass_cols_bmk ((B,m,K) dot, K minor), canonical srht.
  m=128: flat_cols wide path at non-pow2 n (does the round-2 93% carry?).

Run on the TPU host: python benchmarks/skinny_probe.py
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from rla4mor_tpu.ops.fwht import srht
from rla4mor_tpu.ops.srht_pallas import (
    srht_onepass_cols_bmk,
    srht_onepass_flat_cols,
    srht_onepass_vec,
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
    # tunnel health
    t0 = time.perf_counter()
    _ = np.asarray(jnp.sum(jnp.ones((8, 8))))
    log(f"tunnel probe: first tiny op {time.perf_counter() - t0:.1f}s")

    key = jax.random.key(0)
    roof = jax.jit(lambda v: jnp.sum(v, dtype=jnp.float32))

    # ---------------- m = 1, 1-D vector --------------------------------
    x1 = jax.random.normal(key, (N,), jnp.float32)
    nb1 = N * 4
    t_r = timed_sync(roof, x1)
    t_ra = timed_amortized(roof, x1)
    log(f"[m=1 (n,) f32] roofline: sync {t_r * 1e3:.1f} ms | "
        f"amort {t_ra * 1e3:.2f} ms ({nb1 / t_ra / 1e9:.1f} GB/s)")
    probe("vec R=2048", jax.jit(
        lambda v: jnp.sum(srht_onepass_vec(v, K, key, P.DEFAULT) ** 2)),
        x1, nb1, t_ra)
    probe("vec R=4096", jax.jit(
        lambda v: jnp.sum(
            srht_onepass_vec(v, K, key, P.DEFAULT, block=4096) ** 2)),
        x1, nb1, t_ra)
    probe("vec R=8192", jax.jit(
        lambda v: jnp.sum(
            srht_onepass_vec(v, K, key, P.DEFAULT, block=8192) ** 2)),
        x1, nb1, t_ra)
    probe("vec R=2048 HIGH", jax.jit(
        lambda v: jnp.sum(srht_onepass_vec(v, K, key, P.HIGH) ** 2)),
        x1, nb1, t_ra)
    probe("canonical srht (3-pass)", jax.jit(
        lambda v: jnp.sum(srht(v, K, key) ** 2)), x1, nb1, t_ra)

    # ---------------- m = 56 cols --------------------------------------
    m = 56
    x56 = jax.random.normal(key, (N, m), jnp.float32)
    nb56 = N * m * 4
    t_r = timed_sync(roof, x56)
    t_ra = timed_amortized(roof, x56)
    log(f"[m=56 (n,56) f32] roofline: sync {t_r * 1e3:.1f} ms | "
        f"amort {t_ra * 1e3:.2f} ms ({nb56 / t_ra / 1e9:.1f} GB/s)")
    probe("flat_cols (K,B,m)", jax.jit(
        lambda v: jnp.sum(srht_onepass_flat_cols(v, K, key, P.DEFAULT) ** 2)),
        x56, nb56, t_ra)
    probe("cols_bmk (B,m,K)", jax.jit(
        lambda v: jnp.sum(srht_onepass_cols_bmk(v, K, key, P.DEFAULT) ** 2)),
        x56, nb56, t_ra)
    probe("cols_bmk R=4096", jax.jit(
        lambda v: jnp.sum(
            srht_onepass_cols_bmk(v, K, key, P.DEFAULT, block=4096) ** 2)),
        x56, nb56, t_ra)
    probe("canonical srht (3-pass)", jax.jit(
        lambda v: jnp.sum(srht(v.T, K, key) ** 2)), x56, nb56, t_ra)

    # ---------------- m = 128 wide, non-pow2 n -------------------------
    m = 128
    x128 = jax.random.normal(key, (N, m), jnp.float32)
    nb128 = N * m * 4
    t_r = timed_sync(roof, x128)
    t_ra = timed_amortized(roof, x128)
    log(f"[m=128 (n,128) f32] roofline: sync {t_r * 1e3:.1f} ms | "
        f"amort {t_ra * 1e3:.2f} ms ({nb128 / t_ra / 1e9:.1f} GB/s)")
    probe("flat_cols (K,B,m)", jax.jit(
        lambda v: jnp.sum(srht_onepass_flat_cols(v, K, key, P.DEFAULT) ** 2)),
        x128, nb128, t_ra)
    probe("cols_bmk (B,m,K)", jax.jit(
        lambda v: jnp.sum(srht_onepass_cols_bmk(v, K, key, P.DEFAULT) ** 2)),
        x128, nb128, t_ra)

    log("done")


if __name__ == "__main__":
    main()
