"""Probe: does the MXU HBM-stream rate depend on which dot operand is the
big streamed one, and on where its contraction dim sits in memory?

A: big LHS (M, R) @ (R, K)      — the production scan's orientation
B: (K, R) @ big RHS (R, M)      — big operand streamed as RHS, contraction
                                   on its MAJOR axis (columns convention!)
C: batched (Q, R, m) einsum     — the (n, m) snapshot-columns layout
D: A with bf16 big operand
E: B with bf16 big operand
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


def report(name, fn, arr, nb):
    try:
        t = timed(fn, arr)
        ta = timed_amortized(fn, arr)
    except Exception as e:
        print(f"{name}: FAILED {e!r}", flush=True)
        return
    print(f"{name}: sync {t*1e3:7.1f} ms ({nb/t/1e9:6.1f} GB/s) | "
          f"amort {ta*1e3:7.1f} ms ({nb/ta/1e9:6.1f} GB/s)", flush=True)


def main():
    K, R = 256, 2048
    M = (56 * (1 << 24)) // R  # same total elements as the bench block
    key = jax.random.key(7)
    nb = M * R * 4

    a = jax.random.normal(key, (M, R), jnp.float32)
    w = jax.random.normal(jax.random.fold_in(key, 1), (R, K), jnp.float32)
    fA = jax.jit(lambda v: jnp.sum(jax.lax.dot_general(
        v, w, (((1,), (0,)), ((), ())), precision=P.DEFAULT,
        preferred_element_type=jnp.float32) ** 2))
    report("A  big-LHS (M,R)@(R,K) f32", fA, a, nb)
    del a

    b = jax.random.normal(key, (R, M), jnp.float32)
    wk = jax.random.normal(jax.random.fold_in(key, 1), (K, R), jnp.float32)
    fB = jax.jit(lambda v: jnp.sum(jax.lax.dot_general(
        wk, v, (((1,), (0,)), ((), ())), precision=P.DEFAULT,
        preferred_element_type=jnp.float32) ** 2))
    report("B  (K,R)@big-RHS (R,M) f32", fB, b, nb)

    # C: snapshot-columns layout (n, m): scan over P of (Q, R, m) blocks
    m_cols = 56
    n = 1 << 24
    Q = 256
    Pp = n // (Q * R)
    c = b.reshape(Pp, Q, R, m_cols)  # reuse memory shape-wise? sizes differ
    del b

    def scanC(v):
        def step(acc, blk):  # blk (Q, R, m)
            wqk = jax.lax.dot_general(
                wk, blk, (((1,), (1,)), ((), ())), precision=P.DEFAULT,
                preferred_element_type=jnp.float32)  # (K, Q, m)
            return acc + jnp.sum(wqk, axis=1), None
        acc, _ = jax.lax.scan(step, jnp.zeros((K, m_cols), jnp.float32), v)
        return jnp.sum(acc ** 2)
    report("C  cols-layout scan (Q,R,m) f32", jax.jit(scanC), c, nb)
    del c

    ah = jax.random.normal(key, (M, R), jnp.float32).astype(jnp.bfloat16)
    fD = jax.jit(lambda v: jnp.sum(jax.lax.dot_general(
        v, w.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
        precision=P.DEFAULT, preferred_element_type=jnp.float32) ** 2))
    report("D  big-LHS bf16", fD, ah, nb // 2)
    del ah

    bh = jax.random.normal(key, (R, M), jnp.float32).astype(jnp.bfloat16)
    fE = jax.jit(lambda v: jnp.sum(jax.lax.dot_general(
        wk.astype(jnp.bfloat16), v, (((1,), (0,)), ((), ())),
        precision=P.DEFAULT, preferred_element_type=jnp.float32) ** 2))
    report("E  (K,R)@big-RHS bf16", fE, bh, nb // 2)


if __name__ == "__main__":
    main()
