"""Sweep (P, Q, R) splits for the XLA-scan single-pass SRHT on the chip.

The round-1 split (5,8,11) was inherited from the Pallas kernel's VMEM
budget; the XLA scan can take much bigger R, shrinking the per-step
(m, Q, K) intermediate traffic (K/R of input bytes, written+read).
"""

import sys as _sys
from pathlib import Path as _Path
_sys.path.insert(0, str(_Path(__file__).resolve().parents[1]))


import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from rla4mor_tpu.ops.srht_pallas import _plan_factors
import math


def srht_scan_split(x, k, key, split, precision):
    m, n = x.shape
    d = n.bit_length() - 1
    rademacher, _, _, _, _ = _plan_factors(key, n, k, d, x.dtype)
    # rebuild factors for the custom split
    from rla4mor_tpu.ops.fwht import _srht_plan
    from rla4mor_tpu.ops.srht_pallas import _hadamard_rows

    rademacher, sampling, _ = _srht_plan(key, n, k)
    dp, dq, dr = split
    assert dp + dq + dr == d
    P, Q, R = 1 << dp, 1 << dq, 1 << dr
    samp = sampling.astype(jnp.uint32)
    p_s = samp >> (dq + dr)
    q_s = (samp >> dr) & (Q - 1)
    r_s = samp & (R - 1)
    gq = _hadamard_rows(q_s, Q, x.dtype)
    gr = _hadamard_rows(r_s, R, x.dtype)
    hp = _hadamard_rows(p_s, P, jnp.float32)

    x4 = x.reshape(m, P, Q, R)
    d4 = rademacher.reshape(P, Q, R)

    def step(acc, inputs):
        xp, dp_signs, hp_p = inputs
        xd = xp * dp_signs.astype(xp.dtype)[None]
        w = jax.lax.dot_general(
            xd, gr.T, (((2,), (0,)), ((), ())), precision=precision,
            preferred_element_type=jnp.float32,
        )
        val = jnp.einsum("mqk,kq->mk", w, gq.astype(jnp.float32),
                         precision=precision)
        return acc + val * hp_p[None, :], None

    acc0 = jnp.zeros((m, k), jnp.float32)
    acc, _ = jax.lax.scan(step, acc0, (jnp.moveaxis(x4, 1, 0), d4, hp.T))
    return (acc / math.sqrt(k)).astype(x.dtype)


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

    P = jax.lax.Precision
    splits = [(5, 8, 11), (3, 8, 13), (2, 8, 14), (1, 8, 15), (0, 8, 16),
              (2, 7, 15), (1, 7, 16)]
    for sp in splits:
        for prec, pname in [(P.DEFAULT, "bf16")]:
            fn = jax.jit(lambda v, sp=sp, prec=prec: jnp.sum(
                srht_scan_split(v, k, key, sp, prec) ** 2))
            try:
                t = timed(fn, x)
            except Exception as e:
                print(f"split {sp} {pname}: FAILED {e!r}", flush=True)
                continue
            gbps = nbytes / t / 1e9
            print(f"split {sp} {pname}: {t*1e3:.1f} ms -> {gbps:.1f} GB/s "
                  f"({gbps/roof*100:.1f}%)", flush=True)


if __name__ == "__main__":
    main()
