"""ChopSketch probe: z = sum_l roll(s_l * x_l, o_l) with STATIC offsets.

Offsets are seed-derived trace-time constants, so each roll is two static
slices + concat — pure data movement XLA fuses into the sign-multiply/add
reduction: ONE fusion reading x once and writing the (m, b) collapsed
array. A standard SRHT of z (b << n) finishes the sketch at ~b/n extra
traffic. Candidate to replace the MXU-coupled scan (ceiling ~75% of
roofline) with a VPU-only stream (~92% observed for mul+reduce).
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


def chop_collapse(x, signs, offsets, b):
    """(m, n) -> (m, b): signed, per-block statically-rolled reduction."""
    m, n = x.shape
    L = n // b
    parts = []
    for l in range(L):
        blk = x[:, l * b:(l + 1) * b] * signs[l * b:(l + 1) * b].astype(
            x.dtype)
        o = int(offsets[l])
        rolled = jnp.concatenate([blk[:, b - o:], blk[:, :b - o]], axis=1) \
            if o else blk
        parts.append(rolled)
    z = parts[0]
    for p in parts[1:]:
        z = z + p
    return z


def timed(fn, x, iters=5):
    _ = np.asarray(fn(x))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        _ = np.asarray(fn(x))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    d, rows, k = 24, 56, 256
    n = 1 << d
    key = jax.random.key(0)
    x = jax.random.normal(jax.random.fold_in(key, 1), (rows, n), jnp.float32)
    nbytes = rows * n * 4
    t = timed(jax.jit(jnp.sum), x)
    roof = nbytes / t / 1e9
    print(f"roofline {roof:.1f} GB/s", flush=True)
    signs = (2 * jax.random.bernoulli(
        jax.random.fold_in(key, 2), 0.5, (n,)) - 1).astype(jnp.int8)

    from rla4mor_tpu.ops.fwht import srht

    for b_log in (18, 17):
        b = 1 << b_log
        L = n // b
        raw = np.asarray(
            jax.random.randint(jax.random.fold_in(key, 3), (L,), 0, b))
        for name, offsets in [
            ("noroll", np.zeros(L, int)),
            ("roll1024", (raw // 1024) * 1024),
            ("roll8192", (raw // 8192) * 8192),
            ("rollany", raw),
        ]:
            def collapse_only(v, b=b, offsets=offsets):
                z = chop_collapse(v, signs, offsets, b)
                return jnp.sum(z ** 2)

            t = timed(jax.jit(collapse_only), x)
            gbps = nbytes / t / 1e9
            print(f"b=2^{b_log} {name}: {t*1e3:.1f} ms -> {gbps:.1f} GB/s "
                  f"({gbps/roof*100:.0f}%)", flush=True)


if __name__ == "__main__":
    main()
