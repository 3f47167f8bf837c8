"""Probe in-scan SRHT throughput levers: K scaling, F-stacking, splits.

F-stacking: move log2(F) high bits of the r-axis into the matmul M
dimension (H_R = H_F kron H_{R/F}); per-step dot becomes
(m*Q*F, R/F) @ (R/F, K) and the F axis is recombined with a (K, F) sign
matrix in the small VPU einsum. MAC count is unchanged; MXU shape changes.
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


def srht_scan_f(x, k, key, split, F, precision=jax.lax.Precision.DEFAULT):
    m, n = x.shape
    d = n.bit_length() - 1
    rademacher, sampling, _ = _srht_plan(key, n, k)
    dp, dq, dr = split
    assert dp + dq + dr == d
    P, Q, R = 1 << dp, 1 << dq, 1 << dr
    dF = F.bit_length() - 1
    assert 1 << dF == F and dF <= dr
    Rf = R // F
    samp = sampling.astype(jnp.uint32)
    p_s = samp >> (dq + dr)
    q_s = (samp >> dr) & (Q - 1)
    r_s = samp & (R - 1)
    f_s = r_s >> (dr - dF)
    rp_s = r_s & (Rf - 1)
    gq = _hadamard_rows(q_s, Q, jnp.float32)    # (K, Q)
    gf = _hadamard_rows(f_s, F, jnp.float32)    # (K, F)
    grf = _hadamard_rows(rp_s, Rf, x.dtype)     # (K, Rf)
    hp = _hadamard_rows(p_s, P, jnp.float32)    # (K, P)

    x5 = x.reshape(m, P, Q, F, Rf)
    d5 = rademacher.reshape(P, Q, F, Rf)

    def step(acc, inputs):
        xp, dp_signs, hp_p = inputs  # (m,Q,F,Rf), (Q,F,Rf), (K,)
        xd = xp * dp_signs.astype(xp.dtype)[None]
        w = jax.lax.dot_general(
            xd, grf.T, (((3,), (0,)), ((), ())), precision=precision,
            preferred_element_type=jnp.float32,
        )  # (m, Q, F, K)
        val = jnp.einsum("mqfk,kq,kf->mk", w, gq, gf, precision=precision)
        return acc + val * hp_p[None, :], None

    acc0 = jnp.zeros((m, k), jnp.float32)
    acc, _ = jax.lax.scan(step, acc0, (jnp.moveaxis(x5, 1, 0), d5, hp.T))
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
    d, rows = 24, 56
    n = 1 << d
    key = jax.random.key(0)
    x = jax.random.normal(jax.random.fold_in(key, 1), (rows, n), jnp.float32)
    nbytes = rows * n * 4
    t = timed(jax.jit(jnp.sum), x)
    print(f"roofline {nbytes/t/1e9:.1f} GB/s", flush=True)

    # F-stacking at K=256
    for split, F in [((0, 7, 17), 16), ((0, 7, 17), 32), ((0, 8, 16), 16),
                     ((0, 6, 18), 16), ((0, 6, 18), 32), ((0, 5, 19), 32),
                     ((0, 7, 17), 64)]:
        fn = jax.jit(lambda v, split=split, F=F: jnp.sum(
            srht_scan_f(v, 256, key, split, F) ** 2))
        t = timed(fn, x)
        print(f"K=256 split={split} F={F}: {t*1e3:.1f} ms -> "
              f"{nbytes/t/1e9:.1f} GB/s", flush=True)

    # correctness vs reference srht at small size
    from rla4mor_tpu.ops.fwht import srht
    xs = x[:2, : 1 << 12]
    ref = srht(xs, 32, key)
    got = srht_scan_f(xs, 32, key, (1, 3, 8), 4,
                      precision=jax.lax.Precision.HIGHEST)
    rel = float(jnp.max(jnp.abs(got - ref)) / jnp.max(jnp.abs(ref)))
    print(f"F-stacked correctness vs srht: rel err {rel:.2e}", flush=True)


if __name__ == "__main__":
    main()
