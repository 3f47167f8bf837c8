"""Grouped-sample SRHT probe: sampled rows share u distinct r-components.

True SRHT sampling draws (p,q,r) iid uniform per sample. Here r_s is drawn
from a pool of u iid-uniform r-values (two-stage sampling, block-SRHT-style
structured sampling): stage-1 contracts R -> u instead of R -> k, cutting
the dominant MAC count by k/u while every row stays marginally uniform.
"""

import sys as _sys
from pathlib import Path as _Path
_sys.path.insert(0, str(_Path(__file__).resolve().parents[1]))

import math
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from rla4mor_tpu.ops.fwht import _srht_plan
from rla4mor_tpu.ops.srht_pallas import _hadamard_rows


def gsrht_scan(x, k, key, u, split, precision=jax.lax.Precision.DEFAULT):
    m, n = x.shape
    d = n.bit_length() - 1
    rademacher, _, _ = _srht_plan(key, n, k)
    dp, dq, dr = split
    P, Q, R = 1 << dp, 1 << dq, 1 << dr
    key_u = jax.random.fold_in(key, 2)
    key_pq = jax.random.fold_in(key, 3)
    r_pool = jax.random.randint(key_u, (u,), 0, R)           # u r-values
    pq = jax.random.randint(key_pq, (3, k), 0, jnp.array([[P], [Q], [u]]))
    p_s, q_s, j_s = pq[0], pq[1], pq[2]
    gq = _hadamard_rows(q_s.astype(jnp.uint32), Q, jnp.float32)   # (K, Q)
    gu = _hadamard_rows(r_pool.astype(jnp.uint32), R, x.dtype)    # (u, R)
    hp = _hadamard_rows(p_s.astype(jnp.uint32), P, jnp.float32)   # (K, P)

    x4 = x.reshape(m, P, Q, R)
    d4 = rademacher.reshape(P, Q, R)

    def step(acc, inputs):
        xp, dp_signs, hp_p = inputs
        xd = xp * dp_signs.astype(xp.dtype)[None]
        w = jax.lax.dot_general(
            xd, gu.T, (((2,), (0,)), ((), ())), precision=precision,
            preferred_element_type=jnp.float32,
        )  # (m, Q, u)
        wk = jnp.take(w, j_s, axis=2)  # (m, Q, K)
        val = jnp.einsum("mqk,kq->mk", wk, gq, precision=precision)
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

    for u, split in [(256, (1, 7, 16)), (128, (1, 7, 16)), (64, (1, 7, 16)),
                     (128, (3, 8, 13)), (64, (3, 8, 13)), (128, (5, 8, 11))]:
        fn = jax.jit(lambda v, u=u, split=split: jnp.sum(
            gsrht_scan(v, k, key, u, split) ** 2))
        t = timed(fn, x)
        gbps = nbytes / t / 1e9
        print(f"gsrht u={u} split={split}: {t*1e3:.1f} ms -> {gbps:.1f} GB/s"
              f" ({gbps/roof*100:.0f}%)", flush=True)

    # embedding-quality spot check: norm preservation on random vectors
    xs = jax.random.normal(jax.random.fold_in(key, 9), (64, 1 << 14))
    for u in (256, 128, 64):
        y = gsrht_scan(xs, 256, key, u, (0, 6, 8))
        ratios = jnp.linalg.norm(y, axis=1) / jnp.linalg.norm(xs, axis=1)
        print(f"u={u}: norm ratio mean {float(ratios.mean()):.4f} "
              f"std {float(ratios.std()):.4f}", flush=True)


if __name__ == "__main__":
    main()
