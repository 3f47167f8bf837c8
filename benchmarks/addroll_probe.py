"""Roll-as-two-slice-adds collapse (no concat), amortized timing."""

import sys as _sys
from pathlib import Path as _Path
_sys.path.insert(0, str(_Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from benchmarks.amortized_probe import timed_amortized


def collapse_addroll(x, signs, offsets, b):
    m, n = x.shape
    L = n // b
    z = jnp.zeros((m, b), x.dtype)
    for l in range(L):
        blk = x[:, l * b:(l + 1) * b] * signs[l * b:(l + 1) * b].astype(
            x.dtype)
        o = int(offsets[l])
        if o:
            z = z.at[:, o:].add(blk[:, : b - o])
            z = z.at[:, :o].add(blk[:, b - o:])
        else:
            z = z + blk
    return z


def main():
    d, rows, k = 24, 56, 256
    n = 1 << d
    key = jax.random.key(0)
    x = jax.random.normal(jax.random.fold_in(key, 1), (rows, n), jnp.float32)
    nbytes = rows * n * 4
    ta = timed_amortized(jax.jit(jnp.sum), x)
    roof = nbytes / ta / 1e9
    print(f"amortized roofline {roof:.0f} GB/s ({ta*1e3:.1f} ms)", flush=True)
    signs = (2 * jax.random.bernoulli(
        jax.random.fold_in(key, 2), 0.5, (n,)) - 1).astype(jnp.int8)

    from rla4mor_tpu.ops.fwht import srht

    for b_log in (17, 18):
        b = 1 << b_log
        L = n // b
        raw = np.asarray(
            jax.random.randint(jax.random.fold_in(key, 3), (L,), 0, b))
        for name, offs in [("noroll", np.zeros(L, int)),
                           ("addroll", raw),
                           ("addroll1024", (raw // 1024) * 1024)]:
            def collapse_fn(v, b=b, offs=offs):
                return jnp.sum(collapse_addroll(v, signs, offs, b) ** 2)

            def full_fn(v, b=b, offs=offs):
                z = collapse_addroll(v, signs, offs, b)
                return jnp.sum(srht(z, k, jax.random.fold_in(key, 4)) ** 2)

            try:
                t1 = timed_amortized(jax.jit(collapse_fn), x)
                t2 = timed_amortized(jax.jit(full_fn), x)
            except Exception as e:
                print(f"b=2^{b_log} {name}: FAILED {type(e).__name__}",
                      flush=True)
                continue
            print(f"b=2^{b_log} {name}: collapse {t1*1e3:.1f} ms "
                  f"({nbytes/t1/1e9:.0f} GB/s) | +srht {t2*1e3:.1f} ms "
                  f"({nbytes/t2/1e9:.0f} GB/s, {nbytes/t2/1e9/roof*100:.0f}%"
                  f" roof)", flush=True)


if __name__ == "__main__":
    main()
