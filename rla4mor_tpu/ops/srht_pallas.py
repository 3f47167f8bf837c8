"""Fused single-pass SRHT for TPU (Pallas kernel + XLA-scan fallback).

The reference's hot loop is the FWHT butterfly (numba/ffht, reference
rla/srht.py:14-134): 2*log2(n) passes of adds over HBM-resident data. Even
the Kronecker-matmul FWHT (ops/fwht.py) needs ~3 round trips to HBM. This
module exploits that a *sampled* SRHT with k << n outputs never needs the
full transform:

With n = 2^d = P*Q*R (Sylvester ordering, index g = (p, q, r)) and sampled
output indices g_s = (p_s, q_s, r_s),

    y_s = (1/sqrt(k)) * sum_p Hp[p_s, p] * ( gq_s^T (D_p (.) X_p) gr_s ),

where gq_s = H_Q[q_s, :] and gr_s = H_R[r_s, :] are +-1 Hadamard rows and
X_p is the (Q, R) slab of one input column. Per slab this is ONE (Q, R) x
(R, k) MXU matmul + a VPU contraction — k MACs per element — and the input
is read from HBM **exactly once** (plus an int8 sign vector): minimum
possible traffic for a sketch, unreachable by any butterfly formulation.

Precision: the accumulator is f32; the slab matmul precision is
configurable. DEFAULT (bf16 MXU) gives ~2e-3 relative error — usually far
below the embedding distortion epsilon and the fastest path; HIGH (3-pass
bf16) is near-f32 at ~1/3 the MXU rate; HIGHEST is the slowest/exact-f32
path used by the correctness tests.

Semantics are identical to ops.fwht.srht for power-of-two n (same seeded
plan, same sqrt(2^d/k) scaling x the 2^(-d/2) FWHT normalization = 1/sqrt(k)).
"""

from __future__ import annotations

import math
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
    return _popcount_parity(
        sel[:, None].astype(jnp.uint32) & cols[None, :]
    ).astype(dtype)


def _split_pqr(d: int, block_rows: int = 1) -> Tuple[int, int, int]:
    """(P, Q, R) factorization: big R so each slab DMA is MBs (per-step
    overhead amortized), Q <= 256 so the VPU contraction and the Gq factor
    stay small. Per-step block = B*Q*R*4 <= 2 MiB so the double-buffered
    slabs + int8 signs + (R, K) factor fit the 16 MiB VMEM."""
    shrink = max(0, (max(1, block_rows) - 1).bit_length())
    dr = min(11 - shrink, d)
    dq = min(8, d - dr)
    dp = d - dr - dq
    return dp, dq, dr


def _plan_factors(key, n, k, d, dtype, block_rows: int = 1):
    """Shared host-side plan: Hadamard factors for the sampled indices."""
    rademacher, sampling, _ = _srht_plan(key, n, k)
    dp, dq, dr = _split_pqr(d, block_rows)
    P, Q, R = 1 << dp, 1 << dq, 1 << dr
    samp = sampling.astype(jnp.uint32)
    p_s = samp >> (dq + dr)
    q_s = (samp >> dr) & (Q - 1)
    r_s = samp & (R - 1)
    gq = _hadamard_rows(q_s, Q, dtype)  # (K, Q)
    gr = _hadamard_rows(r_s, R, dtype)  # (K, R)
    hp = _hadamard_rows(p_s, P, jnp.float32)  # (K, P)
    return rademacher, (P, Q, R), gq, gr, hp


def srht_onepass_xla(
    x: jax.Array,
    k: int,
    key: jax.Array,
    precision=jax.lax.Precision.HIGHEST,
    split: Tuple[int, int, int] | None = None,
    unroll: int = 1,
) -> jax.Array:
    """The single-pass factored SRHT as a ``lax.scan`` over p-slabs in plain
    XLA — fast-compiling fallback with the same semantics as the kernel.

    ``split`` overrides the (log2 P, log2 Q, log2 R) factorization (the
    default is the Pallas-kernel-compatible ``_split_pqr``; the XLA scan
    has no VMEM constraint, and measured throughput is split-insensitive
    to ~5% — see PERF.md round-2 notes). ``unroll`` is passed to
    ``lax.scan`` (unrolled bodies let XLA overlap successive slab loads
    with MXU work)."""
    m, n = x.shape
    d = n.bit_length() - 1
    assert 1 << d == n, "srht_onepass_xla requires power-of-two n"
    if split is None:
        rademacher, (P, Q, R), gq, gr, hp = _plan_factors(key, n, k, d, x.dtype)
    else:
        dp, dq, dr = split
        assert dp + dq + dr == d, (split, d)
        rademacher, sampling, _ = _srht_plan(key, n, k)
        P, Q, R = 1 << dp, 1 << dq, 1 << dr
        samp = sampling.astype(jnp.uint32)
        gq = _hadamard_rows((samp >> dr) & (Q - 1), Q, x.dtype)
        gr = _hadamard_rows(samp & (R - 1), R, x.dtype)
        hp = _hadamard_rows(samp >> (dq + dr), P, jnp.float32)

    x4 = x.reshape(m, P, Q, R)
    d4 = rademacher.reshape(P, Q, R)

    # accumulate in f32 for <=32-bit inputs (bf16 snapshots included), in
    # the input dtype for f64 (CPU/f64 oracles need full precision)
    acc_dtype = jnp.promote_types(x.dtype, jnp.float32)
    hp = hp.astype(acc_dtype)

    def step(acc, inputs):
        xp, dp_signs, hp_p = inputs  # (m, Q, R), (Q, R), (K,)
        xd = xp * dp_signs.astype(xp.dtype)[None]
        w = jax.lax.dot_general(
            xd, gr.T, (((2,), (0,)), ((), ())), precision=precision,
            preferred_element_type=acc_dtype,
        )  # (m, Q, K)
        val = jnp.einsum("mqk,kq->mk", w, gq.astype(acc_dtype),
                         precision=precision)
        return acc + val * hp_p[None, :], None

    acc0 = jnp.zeros((m, k), acc_dtype)
    acc, _ = jax.lax.scan(
        step, acc0, (jnp.moveaxis(x4, 1, 0), d4, hp.T), unroll=unroll
    )
    return (acc / math.sqrt(k)).astype(x.dtype)


def srht_onepass_flat(
    x: jax.Array,
    k: int,
    key: jax.Array,
    precision=jax.lax.Precision.HIGHEST,
    block: int | None = None,
    n: int | None = None,
    out_dtype=None,
) -> jax.Array:
    """Single-pass factored SRHT as ONE flat MXU contraction (no scan).

    Identical semantics/plan to :func:`srht_onepass_xla` / ``ops.fwht.srht``
    for power-of-two n, computed with H_n = H_B (x) H_R:

        out[m, k] = hb[k, b] * ( (x[m, b, :] . d[b, :]) @ gr[k, :]^T )

    i.e. one ``(m*B, R) @ (R, K)`` dot over the whole input plus a
    k-diagonal +-1 recombination over the B axis (a lane-aligned column
    reduction, O(K/R) of the input bytes).

    ``x`` is ``(m, n)`` or — the TPU-native fast path — pre-blocked
    ``(m, B, R)`` with ``B * R = n = 2^d``. PERF.md round-2: on TPU a
    reshape of the minor axis is a physical re-tiling that costs a full
    HBM round-trip, so sketching from the flat ``(m, n)`` layout caps at
    ~half the read roofline no matter the kernel. Snapshot blocks stored
    in an R-blocked layout (e.g. 2-D grid solutions (N, N) of the stencil
    FOM, models/stencil.py) contract at the full HBM stream rate: the
    leading-axis merge (m, B, R) -> (m*B, R) is tiling-free.

    Replaces the reference hot loop (reference rla/srht.py:93-134, the
    butterfly FWHT over HBM) with a sampling-aware minimum-traffic
    contraction. ``block`` overrides R for 2-D input (default
    ``_split_pqr``'s R).

    NON-power-of-two n (round 3): pass pre-blocked ``(m, B_s, R)`` input
    with ``B_s = ceil(n / R)`` blocks, the entries past ``n`` ZERO, and
    the true length as ``n=`` — the contraction then runs over the
    nonzero blocks of the 2^d-padded transform only (same zero-block
    trick as :func:`_flat_plan`; semantics equal ``srht`` of the first
    ``n`` entries). 2-D ``(m, n)`` input requires power-of-two n (the
    minor-axis re-tile makes a slice+tail variant pointless there).
    """
    if x.ndim == 3:
        m, B_s, R = x.shape
        assert block is None or block == R
        if n is None:
            n = B_s * R
            d = n.bit_length() - 1
            assert 1 << d == n, (
                "pre-blocked input without n= requires power-of-two B*R; "
                "pass the true length n= for zero-padded blocked input"
            )
        assert (B_s - 1) * R < n <= B_s * R, (n, B_s, R)
        R_, B_nz, _, gr, hb, rademacher = _flat_plan(key, n, k, R, x.dtype)
        assert B_nz == B_s, (B_nz, B_s)
        dvec = jnp.pad(rademacher, (0, B_s * R - n), constant_values=1)
        x3 = x
    else:
        assert n is None or n == x.shape[1]
        m, n = x.shape
        R = block if block is not None else 1 << _split_pqr(
            n.bit_length() - 1)[2]
        d = n.bit_length() - 1
        assert 1 << d == n, "srht_onepass_flat on 2-D input requires 2^d n"
        assert R & (R - 1) == 0 and R <= n, (R, n)
        B_s = n // R
        R_, B_nz, _, gr, hb, rademacher = _flat_plan(key, n, k, R, x.dtype)
        dvec = rademacher
        x3 = x.reshape(m, B_s, R)

    acc_dtype = jnp.promote_types(x.dtype, jnp.float32)
    xd = x3 * dvec.reshape(B_s, R).astype(x.dtype)
    w = jax.lax.dot_general(
        xd, gr.T, (((2,), (0,)), ((), ())), precision=precision,
        preferred_element_type=acc_dtype,
    )  # (m, B_s, K)
    out = jnp.sum(w * hb.T[None].astype(acc_dtype), axis=1)  # (m, K)
    return (out / math.sqrt(k)).astype(x.dtype if out_dtype is None else out_dtype)


def _flat_plan(key, n: int, k: int, R: int | None, dtype):
    """Shared plan for the flat (H_B kron H_R) formulations, ANY n.

    The SRHT zero-pads n -> N = 2^d (ops/fwht.py semantics); with
    N = B * R only the first ``B_nz = ceil(n / R)`` blocks of the padded
    input are nonzero, so the flat contraction runs over those blocks
    alone — non-power-of-two n costs one tail-block pad (O(R) elements),
    not a pad of the whole array to 2^d.

    Returns ``(R, B_nz, n_full, gr (K, R), hb_nz (K, B_nz) f32,
    rademacher (n,) int8)`` where ``n_full = (B_nz - 1) * R`` is the
    length of the complete-blocks prefix.
    """
    d = max(int(math.ceil(math.log2(max(n, 1)))), 0)
    N = 1 << d
    if R is None:
        R = 1 << _split_pqr(d)[2]
    R = min(R, N)
    assert R & (R - 1) == 0, R
    dr = R.bit_length() - 1
    B_nz = -(-n // R)

    rademacher, sampling, _ = _srht_plan(key, n, k)
    samp = sampling.astype(jnp.uint32)
    gr = _hadamard_rows(samp & (R - 1), R, dtype)            # (K, R)
    hb = _popcount_parity(
        (samp >> dr)[:, None] & jnp.arange(B_nz, dtype=jnp.uint32)[None, :]
    ).astype(jnp.float32)                                     # (K, B_nz)
    return R, B_nz, (B_nz - 1) * R, gr, hb, rademacher


def srht_onepass_flat_cols(
    x: jax.Array,
    k: int,
    key: jax.Array,
    precision=jax.lax.Precision.HIGHEST,
    block: int | None = None,
    out_dtype=None,
) -> jax.Array:
    """SRHT sketch along AXIS 0 of an ``(n, m)`` column matrix — the
    framework's snapshot convention — with no transpose: ``(n, m) ->
    (B, R, m)`` splits the LEADING axis, which is tiling-free on TPU
    (PERF.md round-2), and the R contraction runs as one ``(K, R) @
    (B, R, m)`` dot. Same plan/scaling as ``ops.fwht.srht`` on the
    transposed input: ``srht_onepass_flat_cols(U, k, key) ==
    srht(U.T, k, key).T`` for ANY n (non-power-of-two n is handled by
    the zero-block trick of :func:`_flat_plan`: complete R-blocks go
    through the one flat dot, the tail block is padded to R — so the
    2^d padding of the reference semantics is never materialized;
    reference rla/srht.py:167 pads the whole array).

    ``x`` may also be pre-blocked ``(B, R, m)`` (power-of-two B * R).
    Returns ``(k, m)``.
    """
    if x.ndim == 3:
        B, R, m = x.shape
        n = B * R
        assert block is None or block == R
        d = n.bit_length() - 1
        assert 1 << d == n, "pre-blocked input requires power-of-two B*R"
        x3 = x
        R_, B_nz, n_full, gr, hb, rademacher = _flat_plan(key, n, k, R, x.dtype)
        xd = x3 * rademacher.reshape(B, R).astype(x.dtype)[:, :, None]
        acc_dtype = jnp.promote_types(x.dtype, jnp.float32)
        w = jax.lax.dot_general(
            gr, xd, (((1,), (1,)), ((), ())), precision=precision,
            preferred_element_type=acc_dtype,
        )  # (K, B, m)
        out = jnp.sum(w * hb.astype(acc_dtype)[:, :, None], axis=1)
        return (out / math.sqrt(k)).astype(x.dtype if out_dtype is None else out_dtype)

    n, m = x.shape
    R, B_nz, n_full, gr, hb, rademacher = _flat_plan(key, n, k, block, x.dtype)
    acc_dtype = jnp.promote_types(x.dtype, jnp.float32)
    hb = hb.astype(acc_dtype)

    if n == B_nz * R:  # exact multiple: one dot over all blocks, no tail
        xd = x.reshape(B_nz, R, m) \
            * rademacher.reshape(B_nz, R).astype(x.dtype)[:, :, None]
        w = jax.lax.dot_general(
            gr, xd, (((1,), (1,)), ((), ())), precision=precision,
            preferred_element_type=acc_dtype,
        )  # (K, B_nz, m)
        out = jnp.sum(w * hb[:, :, None], axis=1)
        return (out / math.sqrt(k)).astype(x.dtype if out_dtype is None else out_dtype)

    # complete blocks: leading-axis slice + split, tiling-free
    xm = x[:n_full].reshape(B_nz - 1, R, m)
    dm = rademacher[:n_full].reshape(B_nz - 1, R)
    xd = xm * dm.astype(x.dtype)[:, :, None]
    w = jax.lax.dot_general(
        gr, xd, (((1,), (1,)), ((), ())), precision=precision,
        preferred_element_type=acc_dtype,
    )  # (K, B_nz - 1, m)
    out = jnp.sum(w * hb[:, : B_nz - 1, None], axis=1)  # (K, m)

    # tail block, zero-padded to R (O(R * m) work)
    xt = x[n_full:] * rademacher[n_full:].astype(x.dtype)[:, None]
    xt = jnp.pad(xt, ((0, B_nz * R - n), (0, 0)))
    wt = jnp.matmul(gr, xt, precision=precision,
                    preferred_element_type=acc_dtype)  # (K, m)
    out = out + wt * hb[:, B_nz - 1, None]
    return (out / math.sqrt(k)).astype(x.dtype if out_dtype is None else out_dtype)


def srht_onepass_vec(
    x: jax.Array,
    k: int,
    key: jax.Array,
    precision=jax.lax.Precision.HIGHEST,
    block: int | None = None,
    out_dtype=None,
) -> jax.Array:
    """SRHT sketch of ONE vector ``(n,) -> (k,)``, any n — the greedy
    ``extend_basis`` hot shape (one new snapshot per iteration).

    A 1-D array's (B, R) reshape keeps the same linear element order, so
    the contraction reads the vector exactly once as one ``(B, R) @
    (R, K)`` MXU dot plus the k-diagonal +-1 recombination over B — no
    lane padding waste (an ``(n, 1)`` column matrix is physically padded
    to 128 lanes on TPU; the 1-D layout is dense). Same plan/scaling as
    ``ops.fwht.srht``: ``srht_onepass_vec(u, k, key) == srht(u, k, key)``.
    """
    (n,) = x.shape
    R, B_nz, n_full, gr, hb, rademacher = _flat_plan(key, n, k, block, x.dtype)
    acc_dtype = jnp.promote_types(x.dtype, jnp.float32)
    hb = hb.astype(acc_dtype)

    if n == B_nz * R:  # exact multiple: one dot, no tail
        xd = x.reshape(B_nz, R) * rademacher.reshape(B_nz, R).astype(x.dtype)
        w = jax.lax.dot_general(
            xd, gr, (((1,), (1,)), ((), ())), precision=precision,
            preferred_element_type=acc_dtype,
        )  # (B_nz, K)
        out = jnp.sum(w * hb.T, axis=0)
        return (out / math.sqrt(k)).astype(x.dtype if out_dtype is None else out_dtype)

    xm = x[:n_full].reshape(B_nz - 1, R)
    xd = xm * rademacher[:n_full].reshape(B_nz - 1, R).astype(x.dtype)
    w = jax.lax.dot_general(
        xd, gr, (((1,), (1,)), ((), ())), precision=precision,
        preferred_element_type=acc_dtype,
    )  # (B_nz - 1, K)
    out = jnp.sum(w * hb.T[: B_nz - 1], axis=0)  # (K,)

    xt = x[n_full:] * rademacher[n_full:].astype(x.dtype)
    xt = jnp.pad(xt, (0, B_nz * R - n))
    wt = jnp.matmul(gr, xt, precision=precision,
                    preferred_element_type=acc_dtype)  # (K,)
    out = out + wt * hb[:, B_nz - 1]
    return (out / math.sqrt(k)).astype(x.dtype if out_dtype is None else out_dtype)


def srht_onepass_cols_bmk(
    x: jax.Array,
    k: int,
    key: jax.Array,
    precision=jax.lax.Precision.HIGHEST,
    block: int | None = None,
    out_dtype=None,
) -> jax.Array:
    """Skinny-m variant of :func:`srht_onepass_flat_cols`: the R
    contraction produces ``(B, m, K)`` (K minor — full 128-lane tiles
    even for m << 128) instead of ``(K, B, m)`` (m minor — mostly
    padding at small m). Identical plan/semantics; any n.
    """
    n, m = x.shape
    R, B_nz, n_full, gr, hb, rademacher = _flat_plan(key, n, k, block, x.dtype)
    acc_dtype = jnp.promote_types(x.dtype, jnp.float32)
    hb = hb.astype(acc_dtype)

    xm = x[:n_full].reshape(B_nz - 1, R, m)
    xd = xm * rademacher[:n_full].reshape(B_nz - 1, R).astype(x.dtype)[:, :, None]
    w = jax.lax.dot_general(
        xd, gr, (((1,), (1,)), ((), ())), precision=precision,
        preferred_element_type=acc_dtype,
    )  # (B_nz - 1, m, K)
    out = jnp.einsum("bmk,kb->km", w, hb[:, : B_nz - 1],
                     precision=jax.lax.Precision.HIGHEST)  # (K, m)

    xt = x[n_full:] * rademacher[n_full:].astype(x.dtype)[:, None]
    xt = jnp.pad(xt, ((0, B_nz * R - n), (0, 0)))
    wt = jnp.matmul(gr, xt, precision=precision,
                    preferred_element_type=acc_dtype)  # (K, m)
    out = out + wt * hb[:, B_nz - 1, None]
    return (out / math.sqrt(k)).astype(x.dtype if out_dtype is None else out_dtype)


def _make_kernel(precision, block_rows):
    def kernel(x_ref, d_ref, gq_ref, gr_ref, hp_ref, out_ref):
        """Grid (M/B, P), p inner. Blocks: x (B, 1, Q, R); d (1, Q, R) int8;
        gq (Q, K); gr (R, K); hp (1, 1, K); out (B, 1, K) revisited.
        The row loop is unrolled: each row is one 2-D MXU matmul + a VPU
        contraction (no in-kernel reshapes — Mosaic-friendly)."""
        p = pl.program_id(1)

        @pl.when(p == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        d_signs = d_ref[0].astype(x_ref.dtype)  # (Q, R)
        hp_row = hp_ref[0, 0]  # (K,)
        for b in range(block_rows):
            xd = x_ref[b, 0] * d_signs  # (Q, R)
            w = jax.lax.dot_general(
                xd, gr_ref[:],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=precision,
            )  # (Q, K)
            val = jnp.sum(w * gq_ref[:], axis=0)  # (K,)
            out_ref[b, 0, :] += val * hp_row

    return kernel


def _make_kernel_packed(precision, B, Q):
    def kernel(x_ref, dp_ref, gq_ref, gr_ref, hp_ref, out_ref):
        """Multi-row + 1-bit-packed-sign variant (PERF.md gaps #2/#3).

        Grid (M/B, P), p inner. Blocks: x (B, 1, Q, R); dp (1, Q/32, R)
        uint32 — the Rademacher signs bit-packed along the SUBLANE (Q)
        axis, 1/32 the int8 sign traffic; gq (Q, K); gr (R, K);
        hp (1, 1, K); out (B, 1, K) revisited.

        All B rows go through ONE (B*Q, R) x (R, K) MXU matmul (the
        leading-dim merge keeps lanes, so it is relayout-free), killing
        the per-row dot dispatch; the Q-contraction is a VPU
        multiply + segment-sum after a sublane-split reshape."""
        p = pl.program_id(1)

        @pl.when(p == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        dw = dp_ref[0]  # (Q//32, R) uint32
        shifts = jax.lax.broadcasted_iota(jnp.uint32, (1, 32, 1), 1)
        bits = (dw[:, None, :] >> shifts) & jnp.uint32(1)  # (Q//32, 32, R)
        # Mosaic has no uint32->float cast; go through int32
        signs = (1 - 2 * bits.astype(jnp.int32)).astype(x_ref.dtype).reshape(
            Q, dw.shape[-1]
        )
        xb = x_ref[:, 0]  # (B, Q, R)
        xd = (xb * signs[None]).reshape(B * Q, dw.shape[-1])
        w = jax.lax.dot_general(
            xd, gr_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        )  # (B*Q, K)
        wv = w.reshape(B, Q, w.shape[-1]) * gq_ref[:][None]
        val = jnp.sum(wv, axis=1)  # (B, K)
        out_ref[:, 0, :] += val * hp_ref[0]

    return kernel


def srht_pallas_packed(
    x: jax.Array,
    k: int,
    key: jax.Array,
    precision=jax.lax.Precision.DEFAULT,
    block_rows: int = 4,
) -> jax.Array:
    """:func:`srht_pallas` with the two PERF.md round-2 kernel gaps closed:

    #2 multi-row grid steps — every block of ``block_rows`` rows is one
    flattened ``(B*Q, R) @ (R, K)`` MXU matmul (no per-row dot dispatch,
    no materialized (m, Q, K) intermediate), and
    #3 1-bit sign packing — the seeded Rademacher diagonal travels as
    uint32 words packed along Q (1/32 the int8 side-channel traffic),
    unpacked in-VMEM by a VPU shift/mask.

    Same plan/semantics as :func:`srht_pallas` (equals ``ops.fwht.srht``
    for power-of-two n). Requires Q >= 32 (i.e. d >= dr + 5), which every
    large-n shape satisfies; smaller problems should use the XLA paths.
    """
    if precision == jax.lax.Precision.HIGH:
        precision = jax.lax.Precision.HIGHEST
    m, n = x.shape
    d = n.bit_length() - 1
    assert 1 << d == n, "srht_pallas_packed requires power-of-two n"

    row_bytes = n * jnp.dtype(x.dtype).itemsize
    max_rows = max(1, (1 << 30) // int(row_bytes))
    if m > max_rows:
        outs = [
            srht_pallas_packed(x[i: i + max_rows], k, key, precision,
                               block_rows)
            for i in range(0, m, max_rows)
        ]
        return jnp.concatenate(outs, axis=0)

    rademacher, (P, Q, R), gq, gr, hp = _plan_factors(
        key, n, k, d, jnp.float32, block_rows
    )
    assert Q >= 32, (
        f"srht_pallas_packed needs Q >= 32 (got Q={Q} at n={n}); "
        "use srht_pallas / the XLA paths for small n"
    )

    k_pad = max(128, -(-k // 128) * 128)
    pad = k_pad - k
    gq = jnp.pad(gq, ((0, pad), (0, 0))).T  # (Q, K)
    gr = jnp.pad(gr, ((0, pad), (0, 0))).T  # (R, K)
    hp = jnp.pad(hp, ((0, pad), (0, 0))).T.reshape(P, 1, k_pad)

    # bit-pack the signs along Q: word[p, qg, r] bit b = sign(p, 32qg+b, r)<0
    neg = (rademacher.reshape(P, Q // 32, 32, R) < 0).astype(jnp.uint32)
    d_packed = jnp.sum(
        neg << jnp.arange(32, dtype=jnp.uint32)[None, None, :, None], axis=2
    ).astype(jnp.uint32)  # (P, Q//32, R)

    B = max(1, block_rows)
    m_pad = -(-m // B) * B
    if m_pad != m:
        x = jnp.pad(x, ((0, m_pad - m), (0, 0)))
    x4 = x.reshape(m_pad, P, Q, R)

    grid = (m_pad // B, P)
    out = pl.pallas_call(
        _make_kernel_packed(precision, B, Q),
        grid=grid,
        in_specs=[
            pl.BlockSpec((B, 1, Q, R), lambda r, p: (r, p, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Q // 32, R), lambda r, p: (p, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Q, k_pad), lambda r, p: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, k_pad), lambda r, p: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, k_pad), lambda r, p: (p, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, 1, k_pad), lambda r, p: (r, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, 1, k_pad), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * n * k_pad,
            bytes_accessed=m_pad * n * x.dtype.itemsize + n // 8
            + 4 * k_pad * m_pad,
            transcendentals=0,
        ),
    )(x4, d_packed, gq, gr, hp)

    scale = jnp.asarray(1.0 / math.sqrt(k), jnp.float32)
    return scale * out[:m, 0, :k]


def srht_pallas(
    x: jax.Array,
    k: int,
    key: jax.Array,
    precision=jax.lax.Precision.DEFAULT,
    block_rows: int = 2,
) -> jax.Array:
    """SRHT sketch along the LAST axis: (m, n) -> (m, k), n = 2^d.

    Equals ops.fwht.srht(x, k, key) for power-of-two n (same plan/scaling),
    computed in a single HBM pass. ``precision`` controls the slab matmul:
    DEFAULT = bf16 MXU (fast; ~2e-3 rel err, far below typical embedding
    distortion), HIGHEST = exact f32 (Mosaic supports only these two; HIGH
    is promoted to HIGHEST). The p-accumulation is always f32.
    ``block_rows`` rows share each grid step (bigger DMAs, less per-step
    overhead; VMEM-bound: B * 2 MiB double-buffered).
    """
    if precision == jax.lax.Precision.HIGH:
        precision = jax.lax.Precision.HIGHEST
    m, n = x.shape
    d = n.bit_length() - 1
    assert 1 << d == n, "srht_pallas requires power-of-two n"

    # Mosaic block-offset arithmetic must stay in i32: keep each pallas
    # operand under 1 GiB by chunking rows (same shape per chunk -> one
    # kernel compile, reused).
    row_bytes = n * jnp.dtype(x.dtype).itemsize
    max_rows = max(1, (1 << 30) // int(row_bytes))
    if m > max_rows:
        outs = [
            srht_pallas(x[i : i + max_rows], k, key, precision, block_rows)
            for i in range(0, m, max_rows)
        ]
        return jnp.concatenate(outs, axis=0)

    rademacher, (P, Q, R), gq, gr, hp = _plan_factors(
        key, n, k, d, jnp.float32, block_rows
    )

    # pad k to a lane multiple for clean MXU shapes
    k_pad = max(128, -(-k // 128) * 128)
    pad = k_pad - k
    gq = jnp.pad(gq, ((0, pad), (0, 0))).T  # (Q, K)
    gr = jnp.pad(gr, ((0, pad), (0, 0))).T  # (R, K)
    hp = jnp.pad(hp, ((0, pad), (0, 0))).T.reshape(P, 1, k_pad)  # (P, 1, K)

    d_signs = rademacher.reshape(P, Q, R)
    B = max(1, block_rows)
    m_pad = -(-m // B) * B
    if m_pad != m:
        x = jnp.pad(x, ((0, m_pad - m), (0, 0)))
    x4 = x.reshape(m_pad, P, Q, R)

    grid = (m_pad // B, P)
    out = pl.pallas_call(
        _make_kernel(precision, B),
        grid=grid,
        in_specs=[
            pl.BlockSpec((B, 1, Q, R), lambda r, p: (r, p, 0, 0),
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
        out_specs=pl.BlockSpec((B, 1, k_pad), lambda r, p: (r, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, 1, k_pad), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * n * k_pad,
            bytes_accessed=m_pad * n * x.dtype.itemsize + n + 4 * k_pad * m_pad,
            transcendentals=0,
        ),
    )(x4, d_signs, gq, gr, hp)

    scale = jnp.asarray(1.0 / math.sqrt(k), jnp.float32)
    return scale * out[:m, 0, :k]
