"""Decompose the flat SRHT's 22 ms: which stage kills the 375 GB/s dot?

G1: pure 2-D dot  (m*P*Q, R) @ (R, K)                  [orient A repro]
G2: G1 + Rademacher sign multiply on the input
G3: G2 + k-diagonal recombination (full SRHT, 2-D dot)
G5: 4-D-LHS dot, no signs/recomb                        [shape effect]
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

from rla4mor_tpu.ops.fwht import _srht_plan
from rla4mor_tpu.ops.srht_pallas import _hadamard_rows

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
    dp, dq, dr = 5, 8, 11
    Pn, Q, R = 1 << dp, 1 << dq, 1 << dr
    key = jax.random.key(0)
    x = jax.random.normal(jax.random.fold_in(key, 1), (rows, n), jnp.float32)
    _ = np.asarray(jnp.sum(x))
    nb = rows * n * 4

    rademacher, sampling, _ = _srht_plan(key, n, k)
    samp = sampling.astype(jnp.uint32)
    gq = _hadamard_rows((samp >> dr) & (Q - 1), Q, jnp.float32)
    gr = _hadamard_rows(samp & (R - 1), R, jnp.float32)
    hp = _hadamard_rows(samp >> (dq + dr), Pn, jnp.float32)
    grT = gr.T  # (R, K)
    hq = (hp[:, :, None] * gq[:, None, :]).reshape(k, Pn * Q).T  # (P*Q, K)
    dsig = rademacher.astype(jnp.float32)

    def g1(v):
        w = jax.lax.dot_general(v.reshape(-1, R), grT, (((1,), (0,)), ((), ())),
                                precision=P.DEFAULT,
                                preferred_element_type=jnp.float32)
        return jnp.sum(w ** 2)

    def g2(v):
        xd = (v * dsig[None]).reshape(-1, R)
        w = jax.lax.dot_general(xd, grT, (((1,), (0,)), ((), ())),
                                precision=P.DEFAULT,
                                preferred_element_type=jnp.float32)
        return jnp.sum(w ** 2)

    def g3(v):
        xd = (v * dsig[None]).reshape(-1, R)
        w = jax.lax.dot_general(xd, grT, (((1,), (0,)), ((), ())),
                                precision=P.DEFAULT,
                                preferred_element_type=jnp.float32)
        w3 = w.reshape(rows, Pn * Q, k)
        return jnp.sum(jnp.sum(w3 * hq[None], axis=1) ** 2)

    def g5(v):
        w = jax.lax.dot_general(v.reshape(rows, Pn, Q, R), grT,
                                (((3,), (0,)), ((), ())),
                                precision=P.DEFAULT,
                                preferred_element_type=jnp.float32)
        return jnp.sum(w ** 2)

    for name, fn in (("G1 pure 2-D dot", g1), ("G2 +signs", g2),
                     ("G3 full (2-D)", g3), ("G5 4-D dot", g5)):
        fj = jax.jit(fn)
        try:
            t, ta = timed(fj, x), timed_amortized(fj, x)
        except Exception as e:
            print(f"{name}: FAILED {e!r}", flush=True)
            continue
        print(f"{name}: sync {t*1e3:7.1f} ms ({nb/t/1e9:6.1f} GB/s) | "
              f"amort {ta*1e3:7.1f} ms ({nb/ta/1e9:6.1f} GB/s)", flush=True)


if __name__ == "__main__":
    main()
