"""Amortized sweep: K-scaling, grouped-sample u, F-stacking, splits."""

import sys as _sys
from pathlib import Path as _Path
_sys.path.insert(0, str(_Path(__file__).resolve().parents[1]))

import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from benchmarks.gsrht_probe import gsrht_scan
from benchmarks.scan_variants import srht_scan_f
from benchmarks.amortized_probe import timed_amortized


def main():
    d, rows, k = 24, 56, 256
    n = 1 << d
    key = jax.random.key(0)
    x = jax.random.normal(jax.random.fold_in(key, 1), (rows, n), jnp.float32)
    nbytes = rows * n * 4
    ta = timed_amortized(jax.jit(jnp.sum), x)
    roof = nbytes / ta / 1e9
    print(f"amortized roofline {roof:.0f} GB/s ({ta*1e3:.1f} ms)", flush=True)

    runs = [
        ("scanK64", jax.jit(lambda v: jnp.sum(
            srht_scan_f(v, 64, key, (1, 7, 16), 1) ** 2))),
        ("scanK256", jax.jit(lambda v: jnp.sum(
            srht_scan_f(v, 256, key, (1, 7, 16), 1) ** 2))),
        ("scanK256_F16", jax.jit(lambda v: jnp.sum(
            srht_scan_f(v, 256, key, (0, 7, 17), 16) ** 2))),
        ("gsrht_u128", jax.jit(lambda v: jnp.sum(
            gsrht_scan(v, 256, key, 128, (1, 7, 16)) ** 2))),
        ("gsrht_u64", jax.jit(lambda v: jnp.sum(
            gsrht_scan(v, 256, key, 64, (1, 7, 16)) ** 2))),
        ("gsrht_u32", jax.jit(lambda v: jnp.sum(
            gsrht_scan(v, 256, key, 32, (1, 7, 16)) ** 2))),
        ("gsrht_u128_s3813", jax.jit(lambda v: jnp.sum(
            gsrht_scan(v, 256, key, 128, (3, 8, 13)) ** 2))),
    ]
    for name, fn in runs:
        try:
            t = timed_amortized(fn, x)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}", flush=True)
            continue
        gbps = nbytes / t / 1e9
        print(f"{name}: {t*1e3:.1f} ms -> {gbps:.0f} GB/s "
              f"({gbps/roof*100:.0f}% roof)", flush=True)


if __name__ == "__main__":
    main()
