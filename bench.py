#!/usr/bin/env python
"""Benchmark: SRHT sketch throughput at pod scale (BASELINE north star).

Sketches a 56-column snapshot block of a 16.7M-DoF FOM (the 1e7-DoF case
padded to 2^24), k = 256 sampled rows. The block is stored in the
framework's R-blocked snapshot layout — for a 2-D grid FOM a snapshot IS
its (4096, 4096) solution array (models/stencil.py), so the block is
(56, 4096, 4096) f32. PERF.md round-2: on TPU, re-tiling the minor axis
of a flat (m, 2^24) array costs a full HBM round-trip, which is why the
blocked layout is the storage convention; the flat-layout scan kernel is
timed as well for reference.

Metric: effective sketch throughput = input bytes / wall time (GB/s).
``vs_baseline`` = achieved / (0.8 * measured HBM read roofline), per the
BASELINE target ">80% of HBM-bandwidth roofline". The roofline is a
trivial one-read jnp.sum over the candidate's own input bytes (per
dtype), timed with the same per-call host-sync methodology (the
axon-tunneled chip pays a ~22-30 ms fixed dispatch+transfer cost per
synced call; amortized/pipelined rates are printed to stderr — the flat
kernel reaches ~90% of the pipelined read roofline, so the result does
not hinge on the fixed cost).

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


def tunnel_probe():
    """Tiny-op round-trip latency. The axon tunnel has outage-like
    episodes (a trivial first op measured at 360 s once); log the probe
    so a bench record taken during one is recognizable as such."""
    t0 = time.perf_counter()
    _ = np.asarray(jnp.sum(jnp.ones((8, 8))))
    warm = []
    for _i in range(3):
        t1 = time.perf_counter()
        _ = np.asarray(jnp.sum(jnp.ones((8, 8))))
        warm.append(time.perf_counter() - t1)
    first, med = time.perf_counter() - t0, float(np.median(warm))
    log(f"tunnel probe: first tiny op {first:.2f}s, warm {med * 1e3:.0f} ms")
    if med > 0.5:
        log("WARNING: tunnel appears degraded — wall-clock numbers from "
            "this run are not comparable across sessions")


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
    sync: amortizes the tunnel's fixed dispatch cost and exposes the true
    on-chip (pipelined) rate."""
    _ = np.asarray(fn(x))
    best = float("inf")
    for _r in range(reps):
        t0 = time.perf_counter()
        rs = [fn(x) for _ in range(chain)]
        _ = np.asarray(rs[-1])
        best = min(best, (time.perf_counter() - t0) / chain)
    return best


def bench_srht(d=24, rows=56, k=256, iters=5, seed=0):
    from rla4mor_tpu.ops.embeddings import SrhtEmbedding
    from rla4mor_tpu.ops.fwht import srht
    from rla4mor_tpu.ops.srht_pallas import (
        srht_onepass_flat,
        srht_onepass_xla,
        srht_pallas,
    )

    P = jax.lax.Precision
    n = 1 << d
    # the thing being measured is the FRAMEWORK path, not the raw kernel
    # (VERDICT r2 item 1): SrhtEmbedding.apply_random on the reductor's
    # blocked snapshot storage layout
    emb = SrhtEmbedding(k, n, seed)
    N_B, N_R = emb.blocked_shape
    key = emb.key
    nbytes = rows * n * 4
    log(f"generating ({rows}, {N_B}, {N_R}) f32 snapshot block on device "
        f"({nbytes / 1e9:.2f} GB, R-blocked layout) ...")
    x3 = jax.random.normal(
        jax.random.fold_in(key, 1), (rows, N_B, N_R), jnp.float32
    )
    _ = np.asarray(jnp.sum(x3))

    roof_fn = jax.jit(lambda v: jnp.sum(v, dtype=jnp.float32))

    def roofline_of(arr, nb, tag):
        t = _timed(roof_fn, arr, iters)
        t_a = _timed_amortized(roof_fn, arr)
        log(f"measured 1-read roofline [{tag}]: {nb / t / 1e9:.1f} GB/s "
            f"sync ({t * 1e3:.1f} ms) | amortized {nb / t_a / 1e9:.1f} GB/s "
            f"({t_a * 1e3:.1f} ms; fixed overhead ~{(t - t_a) * 1e3:.0f} ms)")
        return t, t_a

    t_roof32, t_roof32_a = roofline_of(x3, nbytes, "f32")

    xh = x3.astype(jnp.bfloat16)
    _ = np.asarray(jnp.sum(xh).astype(jnp.float32))
    t_roof16, t_roof16_a = roofline_of(xh, nbytes // 2, "bf16")

    # flat vector layout for the legacy scan/pallas kernels (one-off
    # device-side re-tiling, outside all timings)
    x2 = x3.reshape(rows, n)
    _ = np.asarray(jnp.sum(x2))

    candidates = {
        # THE production path: SrhtEmbedding.apply_random on the blocked
        # storage layout (dtype-aware precision inside: HIGH for f32,
        # the reductor default — ~1.5e-5 envelope at 86% roofline)
        "emb3d_f32": (x3, nbytes, t_roof32, t_roof32_a, jax.jit(
            lambda v: jnp.sum(emb.apply_random(v) ** 2))),
        # bf16 offline mode end-to-end: bf16 snapshot storage through the
        # same embedding path (SketchedReductor(offline_dtype=bfloat16))
        "emb3d_bf16in": (xh, nbytes // 2, t_roof16, t_roof16_a, jax.jit(
            lambda v: jnp.sum(
                emb.apply_random(v).astype(jnp.float32) ** 2))),
        # raw kernel at DEFAULT precision (cross-round reference: the
        # round-2 headline line)
        "flat3d_f32": (x3, nbytes, t_roof32, t_roof32_a, jax.jit(
            lambda v: jnp.sum(srht_onepass_flat(v, k, key, P.DEFAULT) ** 2))),
        # legacy flat-vector-layout kernels (pay the re-tiling wall)
        "xla_scan_bf16": (x2, nbytes, t_roof32, t_roof32_a, jax.jit(
            lambda v: jnp.sum(srht_onepass_xla(v, k, key, P.DEFAULT) ** 2))),
        "pallas_bf16": (x2, nbytes, t_roof32, t_roof32_a, jax.jit(
            lambda v: jnp.sum(srht_pallas(v, k, key, P.DEFAULT) ** 2))),
    }
    results = []
    for name, (arr, nb, t_roof, t_roof_a, fn) in candidates.items():
        log(f"compiling + timing {name} ...")
        try:
            t = _timed(fn, arr, iters)
            t_a = _timed_amortized(fn, arr)
        except Exception as e:
            log(f"  {name} failed: {e!r}")
            continue
        gbps = nb / t / 1e9
        vs = t_roof / (TARGET_FRACTION * t)
        vs_a = t_roof_a / (TARGET_FRACTION * t_a)
        log(f"  {name}: {t * 1e3:.1f} ms -> {gbps:.1f} GB/s "
            f"(vs_baseline {vs:.3f}); amortized {t_a * 1e3:.1f} ms "
            f"({nb / t_a / 1e9:.1f} GB/s, {nb / t_a / 1e9 / (nb / t_roof_a / 1e9) * 100:.0f}% "
            f"of pipelined roofline, vs_baseline {vs_a:.3f})")
        results.append((name, gbps, vs))
    if not results:
        return None, 0.0, 0.0
    # headline: the FRAMEWORK path (SrhtEmbedding.apply_random, f32 input)
    # when it ran; otherwise fall back to the best f32-input raw line.
    # bf16-input lines stay diagnostics (they move half the bytes, so the
    # GB/s is not comparable across rounds)
    emb_line = [r for r in results if r[0] == "emb3d_f32"]
    if emb_line:
        best = emb_line[0]
    else:
        pool = [r for r in results if "bf16in" not in r[0]] or results
        vs_max = max(r[2] for r in pool)
        best = max((r for r in pool if r[2] >= 0.95 * vs_max),
                   key=lambda r: r[1])

    # correctness spot check at the same n (embedding path vs canonical)
    ref = srht(x2[:2], k, key)
    got = emb.apply_random(x3[:2])
    rel = float(jnp.max(jnp.abs(got.T - ref)) / jnp.max(jnp.abs(ref)))
    log(f"correctness (emb blocked vs srht, 2 rows): rel err {rel:.2e}")

    return best


def main():
    # the axon tunnel has outage episodes where backend INIT itself fails
    # (RuntimeError: Unable to initialize backend 'axon': UNAVAILABLE).
    # Retry for a while, then emit an honest failure record instead of a
    # bare traceback (the one-JSON-line contract holds either way).
    backend = None
    for attempt in range(6):
        try:
            backend = jax.default_backend()
            break
        except RuntimeError as e:
            log(f"backend init failed (attempt {attempt + 1}/6): {e}")
            if attempt < 5:  # no pointless sleep after the final attempt
                time.sleep(120)
    if backend is None:
        print(json.dumps({
            "metric": "srht_sketch_throughput_1e7dof_BACKEND_UNAVAILABLE",
            "value": 0.0,
            "unit": "GB/s",
            "vs_baseline": 0.0,
        }))
        sys.exit(1)
    log(f"backend: {backend}, devices: {jax.devices()}")
    tunnel_probe()
    if backend in ("tpu", "axon"):
        name, gbps, vs = bench_srht()
    else:
        name, gbps, vs = bench_srht(d=18, rows=8, k=128, iters=3)

    if name is None:
        # every candidate failed (e.g. remote compile service down): FAIL
        # loudly instead of emitting a success-shaped 0 GB/s datapoint
        log("ERROR: all bench candidates failed")
        sys.exit(1)

    print(json.dumps({
        "metric": f"srht_sketch_throughput_1e7dof_{name}",
        "value": round(gbps, 2),
        "unit": "GB/s",
        "vs_baseline": round(vs, 4),
    }))


if __name__ == "__main__":
    main()
