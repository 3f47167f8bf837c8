"""Probe: srht_pallas_packed (multi-row grid steps + 1-bit packed signs)
vs the single-row int8-sign srht_pallas kernel (PERF.md gaps #2/#3).

On the tunneled chip the Pallas grid DMA caps well below the XLA flat
path (PERF.md round-2), so these are *relative* kernel numbers for real
hardware: does killing the per-row dot dispatch and shrinking the sign
side-channel move the per-step time?
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

from rla4mor_tpu.ops.fwht import srht
from rla4mor_tpu.ops.srht_pallas import srht_pallas, srht_pallas_packed

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
    _ = np.asarray(jnp.sum(x))
    nb = rows * n * 4

    # correctness at a small-but-kernel-eligible shape (Q=256 needs d>=13)
    xs = jax.random.normal(key, (3, 1 << 16), jnp.float32)
    y_ref = np.asarray(srht(xs, 64, key))
    for nm, f in (("pallas", srht_pallas), ("packed", srht_pallas_packed)):
        y = np.asarray(f(xs, 64, key, P.HIGHEST))
        print(f"correctness {nm} vs srht: "
              f"{np.abs(y - y_ref).max() / np.abs(y_ref).max():.2e}",
              flush=True)

    cands = {
        "pallas_int8_B2": jax.jit(lambda v: jnp.sum(
            srht_pallas(v, k, key, P.DEFAULT, block_rows=2) ** 2)),
        "packed_B2": jax.jit(lambda v: jnp.sum(
            srht_pallas_packed(v, k, key, P.DEFAULT, block_rows=2) ** 2)),
        "packed_B4": jax.jit(lambda v: jnp.sum(
            srht_pallas_packed(v, k, key, P.DEFAULT, block_rows=4) ** 2)),
        "packed_B8": jax.jit(lambda v: jnp.sum(
            srht_pallas_packed(v, k, key, P.DEFAULT, block_rows=8) ** 2)),
    }
    for name, fn in cands.items():
        try:
            t, ta = timed(fn, x), timed_amortized(fn, x)
        except Exception as e:
            print(f"{name}: FAILED {e!r}", flush=True)
            continue
        print(f"{name}: sync {t*1e3:7.1f} ms ({nb/t/1e9:6.1f} GB/s) | "
              f"amort {ta*1e3:7.1f} ms ({nb/ta/1e9:6.1f} GB/s)", flush=True)


if __name__ == "__main__":
    main()
