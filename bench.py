#!/usr/bin/env python
"""Benchmark: SRHT sketch throughput at pod scale (BASELINE north star).

Sketches a (rows x 2^24) float32 snapshot block along the 16.7M-DoF axis
(the 1e7-DoF case padded to the next power of two), k = 256 sampled rows,
using the fused single-pass SRHT (Pallas kernel and the XLA-scan variant of
the same algorithm; best of the two is reported).

Metric: effective sketch throughput = input bytes / wall time (GB/s).
``vs_baseline`` = achieved / (0.8 * measured HBM read roofline): the
BASELINE target is ">80% of HBM-bandwidth roofline", and the *measured*
roofline (a trivial one-read jnp.sum over the same bytes) is the honest
ceiling on this device — the axon-tunneled v5e-lite chip delivers far less
than the 819 GB/s spec sheet (~116 GB/s measured), and async dispatch means
only host transfers synchronize, so every timing below forces one.

Prints ONE JSON line on stdout; diagnostics go to stderr.
"""

import json
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

SPEC_ROOFLINE_GBPS = 819.0  # TPU v5e spec-sheet HBM bandwidth
TARGET_FRACTION = 0.8


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _timed(fn, x, iters):
    """Median seconds per call, synced via a host transfer of the (tiny)
    result (block_until_ready does not synchronize on this platform)."""
    _ = np.asarray(fn(x))
    ts = []
    for _i in range(iters):
        t0 = time.perf_counter()
        _ = np.asarray(fn(x))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def _timed_amortized(fn, x, chain=6, reps=3):
    """Seconds per call with ``chain`` back-to-back dispatches and ONE final
    sync: amortizes the axon tunnel's ~30 ms fixed dispatch+transfer cost
    and exposes the true on-chip rate (diagnostic; see PERF.md round 2)."""
    _ = np.asarray(fn(x))
    best = float("inf")
    for _r in range(reps):
        t0 = time.perf_counter()
        rs = [fn(x) for _ in range(chain)]
        _ = np.asarray(rs[-1])
        best = min(best, (time.perf_counter() - t0) / chain)
    return best


def bench_srht(d=24, rows=56, k=256, iters=5, seed=0):
    from rla4mor_tpu.ops.fwht import srht
    from rla4mor_tpu.ops.srht_pallas import srht_onepass_xla, srht_pallas

    P = jax.lax.Precision
    n = 1 << d
    key = jax.random.key(seed)
    nbytes = rows * n * 4
    log(f"generating ({rows}, 2^{d}) f32 block on device "
        f"({nbytes / 1e9:.2f} GB) ...")
    x = jax.random.normal(jax.random.fold_in(key, 1), (rows, n), jnp.float32)
    _ = np.asarray(jnp.sum(x))

    # measured single-read roofline (same per-call sync methodology as the
    # candidates; the amortized numbers below are the true on-chip rates)
    roof_fn = jax.jit(lambda v: jnp.sum(v))
    t_read = _timed(roof_fn, x, iters)
    roofline = nbytes / t_read / 1e9
    log(f"measured 1-read roofline: {roofline:.1f} GB/s "
        f"({roofline / SPEC_ROOFLINE_GBPS * 100:.1f}% of the 819 GB/s spec)")
    t_read_a = _timed_amortized(roof_fn, x)
    log(f"  amortized (pipelined) roofline: {nbytes / t_read_a / 1e9:.1f} "
        f"GB/s — fixed dispatch+sync overhead ~{(t_read - t_read_a) * 1e3:.0f}"
        " ms/call on this tunnel")

    candidates = {
        "pallas_bf16": jax.jit(
            lambda v: jnp.sum(srht_pallas(v, k, key, P.DEFAULT) ** 2)
        ),
        "xla_scan_high": jax.jit(
            lambda v: jnp.sum(srht_onepass_xla(v, k, key, P.HIGH) ** 2)
        ),
        # bf16 MXU passes: ~2e-3 rel error, far below sketch distortion
        "xla_scan_bf16": jax.jit(
            lambda v: jnp.sum(srht_onepass_xla(v, k, key, P.DEFAULT) ** 2)
        ),
        # same kernel, big-R split (the XLA scan has no VMEM constraint)
        "xla_scan_bf16_bigR": jax.jit(
            lambda v: jnp.sum(
                srht_onepass_xla(
                    v, k, key, P.DEFAULT, split=(1, 7, d - 8)
                ) ** 2
            )
        ),
    }
    best_name, best_gbps = None, 0.0
    for name, fn in candidates.items():
        log(f"compiling + timing {name} ...")
        try:
            t = _timed(fn, x, iters)
            t_a = _timed_amortized(fn, x)
        except Exception as e:
            log(f"  {name} failed: {e!r}")
            continue
        gbps = nbytes / t / 1e9
        log(f"  {name}: {t * 1e3:.1f} ms -> {gbps:.1f} GB/s "
            f"({gbps / roofline * 100:.1f}% of measured roofline); "
            f"amortized {t_a * 1e3:.1f} ms ({nbytes / t_a / 1e9:.1f} GB/s)")
        if gbps > best_gbps:
            best_name, best_gbps = name, gbps

    # correctness spot check at the same n (cheap, reuses XLA path)
    ref = srht(x[:2], k, key)
    got = srht_pallas(x[:2], k, key, P.HIGHEST)
    rel = float(jnp.max(jnp.abs(got - ref)) / jnp.max(jnp.abs(ref)))
    log(f"correctness (pallas HIGHEST vs XLA srht, 2 rows): rel err {rel:.2e}")

    return best_name, best_gbps, roofline


def main():
    backend = jax.default_backend()
    log(f"backend: {backend}, devices: {jax.devices()}")
    if backend in ("tpu", "axon"):
        name, gbps, roofline = bench_srht()
    else:
        name, gbps, roofline = bench_srht(d=18, rows=8, k=128, iters=3)

    print(json.dumps({
        "metric": f"srht_sketch_throughput_1e7dof_{name}",
        "value": round(gbps, 2),
        "unit": "GB/s",
        "vs_baseline": round(gbps / (TARGET_FRACTION * roofline), 4),
    }))


if __name__ == "__main__":
    main()
