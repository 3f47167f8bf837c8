"""Definitive same-session amortized split sweep of the SRHT scan."""

import sys as _sys
from pathlib import Path as _Path
_sys.path.insert(0, str(_Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from benchmarks.amortized_probe import timed_amortized, timed_sync
from benchmarks.scan_variants import srht_scan_f


def main():
    d, rows, k = 24, 56, 256
    n = 1 << d
    key = jax.random.key(0)
    x = jax.random.normal(jax.random.fold_in(key, 1), (rows, n), jnp.float32)
    nbytes = rows * n * 4
    ts = timed_sync(jax.jit(jnp.sum), x)
    ta = timed_amortized(jax.jit(jnp.sum), x)
    print(f"sum: sync {ts*1e3:.1f} ms, amort {ta*1e3:.1f} ms "
          f"({nbytes/ta/1e9:.0f} GB/s)", flush=True)

    for split in [(5, 8, 11), (4, 8, 12), (3, 8, 13), (2, 8, 14),
                  (1, 8, 15), (1, 7, 16), (6, 8, 10), (7, 8, 9)]:
        fn = jax.jit(lambda v, split=split: jnp.sum(
            srht_scan_f(v, k, key, split, 1) ** 2))
        try:
            t1 = timed_sync(fn, x)
            t2 = timed_amortized(fn, x)
        except Exception as e:
            print(f"{split}: FAILED {type(e).__name__}", flush=True)
            continue
        print(f"split={split}: sync {t1*1e3:.1f} ms | amort {t2*1e3:.1f} ms "
              f"({nbytes/t2/1e9:.0f} GB/s)", flush=True)


if __name__ == "__main__":
    main()
