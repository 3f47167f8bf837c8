"""Fused single-pass SRHT Pallas kernel for TPU.

The reference's hot loop is the FWHT butterfly (numba/ffht, reference
rla/srht.py:14-134): 2*log2(n) passes of adds over HBM-resident data. Even
the Kronecker-matmul FWHT (ops/fwht.py) needs ~3 round trips to HBM. This
kernel exploits that a *sampled* SRHT with k << n outputs never needs the
full transform:

With n = 2^d = P*Q*R (Sylvester ordering, index g = (p, q, r)) and sampled
output indices g_s = (p_s, q_s, r_s),

    y_s = (1/sqrt(k)) * sum_p Hp[p_s, p] * ( gq_s^T (D_p (.) X_p) gr_s ),

where gq_s = H_Q[q_s, :] and gr_s = H_R[r_s, :] are +-1 Hadamard rows and
X_p is the (Q, R) slab of one input column. Per slab this is ONE (BQ, R) x
(R, k) MXU matmul + a VPU contraction — k MACs per element — and the input
is read from HBM **exactly once** (plus an int8 sign vector): the kernel is
HBM-bandwidth-bound at the theoretical minimum traffic, which no butterfly
reformulation can achieve.

Semantics are identical to ops.fwht.srht for power-of-two n (same seeded
plan, same sqrt(2^d/k) scaling x the 2^(-d/2) FWHT normalization = 1/sqrt(k)).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rla4mor_tpu.ops.fwht import _srht_plan


def _popcount_parity(a: jax.Array) -> jax.Array:
    """(-1)^popcount as int8, elementwise, via bit halving."""
    a = a.astype(jnp.uint32)
    p = a
    p ^= p >> 16
    p ^= p >> 8
    p ^= p >> 4
    p ^= p >> 2
    p ^= p >> 1
    return jnp.where((p & 1) == 0, jnp.int8(1), jnp.int8(-1))


def _hadamard_rows(sel: jax.Array, size: int, dtype) -> jax.Array:
    """(len(sel), size) rows of the Sylvester Hadamard H_size."""
    cols = jnp.arange(size, dtype=jnp.uint32)
    return _popcount_parity(sel[:, None].astype(jnp.uint32) & cols[None, :]).astype(dtype)


def _split_pqr(d: int) -> Tuple[int, int, int]:
    dr = min(8, d)
    dq = min(8, d - dr)
    dp = d - dr - dq
    return dp, dq, dr


def _srht_kernel(x_ref, d_ref, gq_ref, gr_ref, hp_ref, out_ref):
    """Grid (M, P), row-major (p inner). Blocks: x (1, 1, Q, R); d (1, Q, R)
    int8; gq (Q, K); gr (R, K); hp (1, K) (row p of the (P, K) factor);
    out (1, K), accumulated across the p steps (revisited block)."""
    p = pl.program_id(1)

    @pl.when(p == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    xd = x_ref[0, 0] * d_ref[0].astype(x_ref.dtype)  # (Q, R)
    # (Q, R) @ (R, K) on the MXU — the only O(n k) work. HIGHEST precision:
    # the default TPU matmul truncates f32 inputs to bf16 (~2e-3 rel error);
    # the Hadamard factor is exactly representable but the data is not.
    w = jax.lax.dot_general(
        xd, gr_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (Q, K)
    # contract q against the selected H_Q rows (VPU)
    val = jnp.sum(w * gq_ref[:], axis=0)  # (K,)
    out_ref[:] += (val * hp_ref[0, 0])[None, None, :]


def srht_pallas(
    x: jax.Array,
    k: int,
    key: jax.Array,
    block_rows: int = 8,
) -> jax.Array:
    """SRHT sketch along the LAST axis: (m, n) -> (m, k), n = 2^d.

    Equals ops.fwht.srht(x, k, key) for power-of-two n (same plan/scaling),
    computed in a single HBM pass.
    """
    m, n = x.shape
    d = n.bit_length() - 1
    assert 1 << d == n, "srht_pallas requires power-of-two n"
    rademacher, sampling, _ = _srht_plan(key, n, k)
    dp, dq, dr = _split_pqr(d)
    P, Q, R = 1 << dp, 1 << dq, 1 << dr

    # pad k to a lane multiple for clean MXU shapes
    k_pad = max(128, -(-k // 128) * 128)
    samp = jnp.concatenate(
        [sampling, jnp.zeros((k_pad - k,), sampling.dtype)]
    ).astype(jnp.uint32)
    p_s = samp >> (dq + dr)
    q_s = (samp >> dr) & (Q - 1)
    r_s = samp & (R - 1)

    gq = _hadamard_rows(q_s, Q, jnp.float32).T  # (Q, K)
    gr = _hadamard_rows(r_s, R, jnp.float32).T  # (R, K)
    hp = _hadamard_rows(p_s, P, jnp.float32).T  # (P, K)
    # zero out the padding samples
    valid = (jnp.arange(k_pad) < k).astype(jnp.float32)
    hp = (hp * valid[None, :]).reshape(P, 1, k_pad)

    d_signs = rademacher.reshape(P, Q, R)
    x4 = x.reshape(m, P, Q, R)

    grid = (m, P)
    out = pl.pallas_call(
        _srht_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, Q, R), lambda r, p: (r, p, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Q, R), lambda r, p: (p, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Q, k_pad), lambda r, p: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, k_pad), lambda r, p: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, k_pad), lambda r, p: (p, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, k_pad), lambda r, p: (r, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, 1, k_pad), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * k_pad,
            bytes_accessed=m * n * x.dtype.itemsize + n + 4 * k_pad * m,
            transcendentals=0,
        ),
    )(x4, d_signs, gq, gr, hp)

    scale = jnp.asarray(1.0 / math.sqrt(k), jnp.float32)
    return scale * out[:, 0, :k]
