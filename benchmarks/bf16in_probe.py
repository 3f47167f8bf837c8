"""Probe: bf16 snapshot blocks + scan unrolling for the SRHT bench.

Two levers left after the round-2 split/F-stacking sweeps found the
22 ms MXU-stream wall (PERF.md):

1. ``unroll`` on the ``lax.scan``: unrolled bodies let XLA overlap the
   next slab load with the current MXU pass (while-loops are not
   software-pipelined across iterations on TPU).
2. bf16 *input* snapshots: halves the bytes the MXU streams. This is the
   honest TPU-native representation for sketching (the embedding
   distortion epsilon ~ 0.1 dwarfs the 2e-3 bf16 quantization), so it is
   a first-class mode, not a bench trick. The roofline for a bf16 block
   is measured on the same bf16 bytes.
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

from rla4mor_tpu.ops.srht_pallas import srht_onepass_xla

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


def main(d=24, rows=56, k=256):
    n = 1 << d
    key = jax.random.key(0)
    x = jax.random.normal(jax.random.fold_in(key, 1), (rows, n), jnp.float32)
    xh = x.astype(jnp.bfloat16)
    _ = np.asarray(jnp.sum(x) + jnp.sum(xh).astype(jnp.float32))
    nbytes32 = rows * n * 4
    nbytes16 = rows * n * 2

    roof = jax.jit(lambda v: jnp.sum(v, dtype=jnp.float32))
    for name, arr, nb in (("roof_f32", x, nbytes32), ("roof_bf16", xh, nbytes16)):
        t = timed(roof, arr)
        ta = timed_amortized(roof, arr)
        print(f"{name}: sync {t*1e3:7.1f} ms ({nb/t/1e9:6.1f} GB/s) | "
              f"amort {ta*1e3:7.1f} ms ({nb/ta/1e9:6.1f} GB/s)", flush=True)

    cands = {
        "f32_u1": (x, nbytes32, jax.jit(lambda v: jnp.sum(
            srht_onepass_xla(v, k, key, P.DEFAULT) ** 2))),
        "f32_u2": (x, nbytes32, jax.jit(lambda v: jnp.sum(
            srht_onepass_xla(v, k, key, P.DEFAULT, unroll=2) ** 2))),
        "f32_u4": (x, nbytes32, jax.jit(lambda v: jnp.sum(
            srht_onepass_xla(v, k, key, P.DEFAULT, unroll=4) ** 2))),
        "bf16_u1": (xh, nbytes16, jax.jit(lambda v: jnp.sum(
            srht_onepass_xla(v, k, key, P.DEFAULT).astype(jnp.float32) ** 2))),
        "bf16_u2": (xh, nbytes16, jax.jit(lambda v: jnp.sum(
            srht_onepass_xla(v, k, key, P.DEFAULT, unroll=2).astype(jnp.float32) ** 2))),
        "bf16_u4": (xh, nbytes16, jax.jit(lambda v: jnp.sum(
            srht_onepass_xla(v, k, key, P.DEFAULT, unroll=4).astype(jnp.float32) ** 2))),
        "bf16_u2_bigR": (xh, nbytes16, jax.jit(lambda v: jnp.sum(
            srht_onepass_xla(v, k, key, P.DEFAULT, split=(1, 7, d - 8),
                             unroll=2).astype(jnp.float32) ** 2))),
    }
    for name, (arr, nb, fn) in cands.items():
        try:
            t = timed(fn, arr)
            ta = timed_amortized(fn, arr)
        except Exception as e:
            print(f"{name}: FAILED {e!r}", flush=True)
            continue
        print(f"{name}: sync {t*1e3:7.1f} ms ({nb/t/1e9:6.1f} GB/s) | "
              f"amort {ta*1e3:7.1f} ms ({nb/ta/1e9:6.1f} GB/s)", flush=True)


if __name__ == "__main__":
    main()
