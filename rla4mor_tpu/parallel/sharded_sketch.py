"""DoF-sharded random sketching over a device mesh.

TPU-native replacement for the reference's blockwise big-n machinery
(``BlockGaussianEmbedding`` block loop, rla/embeddings.py:425-434;
``project_block``, utilities/utilities.py:87-126): the DoF axis is sharded
over the mesh; the Gaussian sketch is a per-shard on-the-fly-generated
matmul followed by a ``psum`` over the 'dof' axis, and the SRHT runs
log2(n_local) local FWHT stages plus log2(n_devices) cross-chip
add/subtract butterfly stages via ``ppermute`` (SURVEY §2.2).

Seed discipline: every shard generates its column strip of the CANONICAL
tile-derived Omega / sign vector (ops/seeding.py), so sharded, blocked and
full-matrix (embedding-zoo) sketches are **bit-identical at the same seed**
and independent of the device count (tested on the 8-device CPU mesh).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from rla4mor_tpu.ops.fwht import _srht_plan, fwht
from rla4mor_tpu.ops.seeding import gaussian_cols, rademacher_slice


# ---------------------------------------------------------------------------
# Gaussian: per-block generation (single-device reference + sharded version)
# ---------------------------------------------------------------------------


def gaussian_block(key, k: int, block_size: int, block_index,
                   dtype=jnp.float32) -> jax.Array:
    """(k, block_size) column-block of the canonical Omega, scaled
    1/sqrt(k). The full Omega is the column-concatenation over block_index
    — equal to ``GaussianEmbedding(key...).random_matrix()`` columns."""
    # c0 = block_index * block_size is width-aligned by construction
    return gaussian_cols(key, k, block_index * block_size, block_size, dtype,
                         aligned=True)


def gaussian_sketch_blocked(key, k: int, x: jax.Array, n_blocks: int) -> jax.Array:
    """Single-device oracle: Omega @ x with Omega generated in n_blocks
    column blocks (never materialized whole)."""
    n = x.shape[0]
    assert n % n_blocks == 0
    bs = n // n_blocks
    out = jnp.zeros((k,) + x.shape[1:], dtype=x.dtype)
    for b in range(n_blocks):
        Ob = gaussian_block(key, k, bs, b, x.dtype)
        out = out + jnp.matmul(
            Ob, x[b * bs : (b + 1) * bs],
            precision=jax.lax.Precision.HIGHEST,
        )
    return out


def gaussian_sketch_sharded(key, k: int, x: jax.Array, mesh: Mesh,
                            axis: str = "dof",
                            max_omega_elems: int = 1 << 26) -> jax.Array:
    """Sharded Omega @ x: each shard generates its own column block from
    fold_in(key, shard_index) and contributes via psum. Result replicated.

    The local Omega strip is generated in column CHUNKS of at most
    ``max_omega_elems`` entries (default 2^26 = 256 MB f32): tile-based
    generation peaks at ~3x the strip (vmap stack + reshape + concat),
    so an unchunked (k, n_local) strip at pod scale — e.g. (256, 4.2M)
    on ONE device — exhausts HBM before the matmul even starts.  Chunk
    starts stay width-aligned multiples of the canonical column offset,
    so the values are bit-identical to the unchunked strip."""
    n_dev = mesh.shape[axis]
    n = x.shape[0]
    assert n % n_dev == 0
    n_local = n // n_dev
    width = n_local
    while width * k > max_omega_elems and width % 2 == 0:
        width //= 2

    def local(x_local):
        b = lax.axis_index(axis)
        c00 = b * n_local
        acc = jnp.zeros((k,) + x_local.shape[1:], x_local.dtype)
        for j in range(n_local // width):
            Oj = gaussian_cols(key, k, c00 + j * width, width,
                               x_local.dtype, aligned=True)
            acc = acc + jnp.matmul(
                Oj, lax.slice_in_dim(x_local, j * width, (j + 1) * width),
                precision=jax.lax.Precision.HIGHEST,
            )
        return lax.psum(acc, axis_name=axis)

    in_spec = P(axis) if x.ndim == 1 else P(axis, None)
    return jax.shard_map(
        local, mesh=mesh, in_specs=(in_spec,), out_specs=P()
    )(x)


# ---------------------------------------------------------------------------
# SRHT: blocked Rademacher + local FWHT + cross-chip butterfly
# ---------------------------------------------------------------------------


def srht_blocked(key, k: int, x: jax.Array, n_blocks: int) -> jax.Array:
    """Single-device oracle of the sharded SRHT (n must be a power of two):
    y = sqrt(n/k) P H D x with the canonical seeded plan — identical to
    ``ops.fwht.srht`` applied along axis 0 (n_blocks only mirrors the
    sharded call signature; the operator does not depend on it)."""
    n = x.shape[0]
    d = n.bit_length() - 1
    assert 1 << d == n, "sharded SRHT requires power-of-two n (pre-padded)"
    del n_blocks  # canonical derivation is layout-independent
    rademacher, sampling, _ = _srht_plan(key, n, k)
    D = rademacher.astype(x.dtype)
    y = x * (D if x.ndim == 1 else D[:, None])
    y = fwht(y.T if x.ndim > 1 else y, normalize=True)
    y = y.T if x.ndim > 1 else y
    scale = jnp.asarray(math.sqrt(n / k), dtype=x.dtype)
    return scale * jnp.take(y, sampling, axis=0)


def srht_sketch_sharded(key, k: int, x: jax.Array, mesh: Mesh,
                        axis: str = "dof") -> jax.Array:
    """Sharded SRHT: D-multiply and FWHT local stages per shard, then
    log2(n_dev) ppermute butterfly stages across chips (H = H_chips (x)
    H_local in Sylvester order, chip index major), sampling gathered via
    psum of masked one-shard contributions."""
    n_dev = mesh.shape[axis]
    c = n_dev.bit_length() - 1
    assert 1 << c == n_dev, "device count must be a power of two"
    n = x.shape[0]
    d = n.bit_length() - 1
    assert 1 << d == n and n % n_dev == 0
    key_d = jax.random.fold_in(key, 0)
    key_s = jax.random.fold_in(key, 1)
    sampling = jax.random.randint(key_s, (k,), 0, n)
    n_local = n // n_dev

    def local(x_local):
        b = lax.axis_index(axis)
        single = x_local.ndim == 1
        xl = x_local[:, None] if single else x_local
        # D multiply — the shard regenerates its slice of the CANONICAL
        # sign vector (same derivation as srht_blocked / ops.fwht.srht)
        D = rademacher_slice(key_d, b * n_local, n_local, aligned=True).astype(xl.dtype)
        y = xl * D[:, None]
        # local FWHT stages (normalized by 2^{-d_local/2})
        y = fwht(y.T, normalize=True).T
        # cross-chip butterfly stages (normalize by 2^{-c/2} at the end)
        for s in range(c):
            pairs = [(i, i ^ (1 << s)) for i in range(n_dev)]
            other = lax.ppermute(y, axis_name=axis, perm=pairs)
            bit = (b >> s) & 1
            y = jnp.where(bit == 0, y + other, other - y)
        y = y * (2.0 ** (-c / 2.0))
        # sampling: global row g = chip * n_local + i
        chip_of = sampling // n_local
        row_of = sampling % n_local
        mine = (chip_of == b).astype(y.dtype)
        rows = jnp.take(y, row_of, axis=0) * mine[:, None]
        out = lax.psum(rows, axis_name=axis)
        scale = jnp.asarray(math.sqrt(n / k), dtype=y.dtype)
        out = scale * out
        return out[:, 0] if single else out

    in_spec = P(axis) if x.ndim == 1 else P(axis, None)
    return jax.shard_map(
        local, mesh=mesh, in_specs=(in_spec,), out_specs=P()
    )(x)


def flat_shard_rows(n: int, mesh: Mesh, axis: str = "dof",
                    block: int | None = None) -> tuple[int, int]:
    """(n_phys, R) of the zero-padded row layout the flat sharded SRHT
    consumes for a TRUE length ``n``: whole R-blocks per shard, blocks
    rounded up to a multiple of the dof-axis size. Pad columns ``(n, m)``
    to ``(n_phys, m)`` with zero rows before calling
    :func:`srht_sketch_sharded_flat` with ``n=n``."""
    from rla4mor_tpu.ops.srht_pallas import _split_pqr

    n_dev = mesh.shape[axis]
    d = max(int(math.ceil(math.log2(max(n, 1)))), 0)
    R = (1 << _split_pqr(d)[2]) if block is None else block
    assert R & (R - 1) == 0, R
    # shards must hold >= 1 block each; shrink R for tiny test shapes
    while R > 1 and (-(-n // R)) < n_dev:
        R //= 2
    b_total = -(-(-(-n // R)) // n_dev) * n_dev
    return b_total * R, R


def srht_sketch_sharded_flat(key, k: int, x: jax.Array, mesh: Mesh,
                             axis: str = "dof",
                             block: int | None = None,
                             n: int | None = None) -> jax.Array:
    """Sharded SRHT via the flat-contraction formulation — one psum, no
    butterfly.

    With H_{2^d} = H_B (x) H_R and the DoF axis sharded in contiguous
    ranges, every shard holds whole R-blocks, contracts them locally
    against the (R, K) Hadamard factor (srht_onepass_flat's single MXU
    dot — the ~roofline kernel, PERF.md round-2), recombines with ITS
    columns of the (K, B) factor, and contributes via one ``psum`` of a
    (k, m) partial.  Communication: one all-reduce of k*m floats, vs
    log2(n_dev) ppermutes of the full local block for the butterfly
    version.

    Same canonical plan as ``ops.fwht.srht`` / ``srht_blocked`` (bit-equal
    up to f32 summation order).  ANY true length ``n``: pass storage
    padded per :func:`flat_shard_rows` and ``n=`` the logical length — the
    zero tail blocks contribute nothing (the single-device zero-block
    trick, ops/srht_pallas._flat_plan, on a mesh).  Without ``n=`` the
    storage length must be a power of two (back-compat).
    """
    n_dev = mesh.shape[axis]
    n_phys = x.shape[0]
    if n is None:
        n = n_phys
        assert 1 << (n.bit_length() - 1) == n, (
            "non-power-of-two storage needs the true length n= "
            "(pad via flat_shard_rows)"
        )
    assert n_phys >= n and n_phys % n_dev == 0
    d = max(int(math.ceil(math.log2(max(n, 1)))), 0)
    n_local = n_phys // n_dev
    from rla4mor_tpu.ops.srht_pallas import (
        _hadamard_rows,
        _popcount_parity,
    )

    # single source of truth for the block size: the SAME derivation the
    # padding helper used, so a storage padded by flat_shard_rows can
    # never disagree with the split chosen here (round-3 review finding)
    n_phys_want, R = flat_shard_rows(n, mesh, axis, block)
    assert n_phys == n_phys_want, (
        n_phys, n_phys_want, "storage must be padded via flat_shard_rows "
        "with the same (mesh, axis, block)"
    )
    assert R & (R - 1) == 0 and n_local % R == 0, (R, n_local)
    dr = R.bit_length() - 1
    B_local = n_local // R

    key_d = jax.random.fold_in(key, 0)
    key_s = jax.random.fold_in(key, 1)
    sampling = jax.random.randint(key_s, (k,), 0, 1 << d)
    samp_hi = (sampling.astype(jnp.uint32) >> dr)  # B-factor index per sample

    def local(x_local):
        b = lax.axis_index(axis)
        single = x_local.ndim == 1
        xl = x_local[:, None] if single else x_local
        m = xl.shape[1]
        D = rademacher_slice(key_d, b * n_local, n_local, aligned=True).astype(xl.dtype)
        xd = (xl * D[:, None]).reshape(B_local, R, m)
        gr = _hadamard_rows(
            sampling.astype(jnp.uint32) & (R - 1), R, xl.dtype
        )  # (K, R)
        # this shard's columns of the (K, B) factor: parity(samp_hi & col)
        cols = (b * B_local + jnp.arange(B_local)).astype(jnp.uint32)
        hb = _popcount_parity(samp_hi[:, None] & cols[None, :])  # (K, Bl)
        acc_dtype = jnp.promote_types(xl.dtype, jnp.float32)
        w = jax.lax.dot_general(
            gr, xd, (((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=acc_dtype,
        )  # (K, B_local, m)
        part = jnp.sum(w * hb.astype(acc_dtype)[:, :, None], axis=1)
        out = lax.psum(part, axis_name=axis)
        out = (out / math.sqrt(k)).astype(xl.dtype)
        return out[:, 0] if single else out

    in_spec = P(axis) if x.ndim == 1 else P(axis, None)
    return jax.shard_map(
        local, mesh=mesh, in_specs=(in_spec,), out_specs=P()
    )(x)
