"""Kill the scan-xs transpose copy: index scan + dynamic_slice on (m, n)."""

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

from rla4mor_tpu.ops.srht_pallas import _plan_factors


def srht_scan_slice(x, k, key, precision=jax.lax.Precision.DEFAULT,
                    split=None):
    m, n = x.shape
    d = n.bit_length() - 1
    from rla4mor_tpu.ops.fwht import _srht_plan
    from rla4mor_tpu.ops.srht_pallas import _hadamard_rows

    rademacher, sampling, _ = _srht_plan(key, n, k)
    dp, dq, dr = split
    P, Q, R = 1 << dp, 1 << dq, 1 << dr
    samp = sampling.astype(jnp.uint32)
    p_s = samp >> (dq + dr)
    q_s = (samp >> dr) & (Q - 1)
    r_s = samp & (R - 1)
    gq = _hadamard_rows(q_s, Q, jnp.float32)
    gr = _hadamard_rows(r_s, R, x.dtype)
    hp = _hadamard_rows(p_s, P, jnp.float32)  # (K, P)
    signs = rademacher

    QR = Q * R

    def step(acc, p):
        xp = jax.lax.dynamic_slice(x, (0, p * QR), (m, QR)).reshape(m, Q, R)
        dp_signs = jax.lax.dynamic_slice(signs, (p * QR,), (QR,)).reshape(Q, R)
        xd = xp * dp_signs.astype(xp.dtype)[None]
        w = jax.lax.dot_general(
            xd, gr.T, (((2,), (0,)), ((), ())), precision=precision,
            preferred_element_type=jnp.float32,
        )
        val = jnp.einsum("mqk,kq->mk", w, gq, precision=precision)
        return acc + val * hp[:, p][None, :], None

    acc0 = jnp.zeros((m, k), jnp.float32)
    acc, _ = jax.lax.scan(step, acc0, jnp.arange(P))
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
    print(f"roofline {nbytes/t/1e9:.1f} GB/s", flush=True)

    for split in [(1, 7, 16), (2, 8, 14), (3, 8, 13), (5, 8, 11), (4, 8, 12)]:
        fn = jax.jit(lambda v, split=split: jnp.sum(
            srht_scan_slice(v, k, key, split=split) ** 2))
        # report cost-analysis write bytes too
        ca = fn.lower(jax.ShapeDtypeStruct(x.shape, x.dtype)).compile(
        ).cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        out_b = ca.get("bytes accessedout{}", 0.0)
        t = timed(fn, x)
        print(f"slice-scan split={split}: {t*1e3:.1f} ms -> "
              f"{nbytes/t/1e9:.1f} GB/s (HLO out-bytes {out_b/1e9:.2f} G)",
              flush=True)

    # correctness
    from rla4mor_tpu.ops.fwht import srht
    xs = x[:2, : 1 << 12]
    ref = srht(xs, 32, key)
    got = srht_scan_slice(xs, 32, key, jax.lax.Precision.HIGHEST, (1, 3, 8))
    rel = float(jnp.max(jnp.abs(got - ref)) / jnp.max(jnp.abs(ref)))
    print(f"correctness rel err {rel:.2e}", flush=True)


if __name__ == "__main__":
    main()
