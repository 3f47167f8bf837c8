"""Pallas TPU Gaussian sketch with in-kernel hardware PRNG.

The canonical Gaussian paths (``GaussianEmbedding`` / ``BlockGaussian`` /
``StreamedGaussianEmbedding`` / the mesh-sharded sketch, all over
ops/seeding.py) pay XLA's threefry to generate Omega: measured ~22 G
words/s on the v5e — 10x below the HBM read roofline for the snapshot
block, so big-n Gaussian sketches are *generation*-bound, not
memory-bound. The reference has the same problem at larger constants
(numpy Philox on the host, rla/embeddings.py:434-441).

This module instead generates each (k, block_rows) strip of Omega inside
the kernel with the TPU's hardware PRNG (``pltpu.prng_seed`` /
``pltpu.prng_random_bits``), converts bits to normals with Box–Muller on
the VPU, and contracts against the resident snapshot strip on the MXU —
Omega never exists outside VMEM and costs (almost) no HBM traffic.

Bitstream contract: the operator is fully determined by
``(seed, k, block_rows)`` — strip ``b`` seeds the PRNG with
``(seed, b)`` and draws two (k, block_rows) uint32 grids. It is
reproducible on TPU but is NOT the canonical ops/seeding.py operator:
the same seed names a different Omega than the embedding zoo.  Use it
through :class:`rla4mor_tpu.ops.embeddings.HwPrngGaussianEmbedding`,
which carries that warning; ``gaussian_strip`` regenerates any strip of
the same bitstream for oracles/cross-checks.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_ROWS = 2048
# Normal strips are drawn in (CHUNK_K, block_rows) row-chunk PAIRS: one
# Box-Muller draw (bits1 then bits2) fills rows [r0, r0+CHUNK_K) with the
# cos half and [r0+CHUNK_K, r0+2*CHUNK_K) with the sin half, r0 ascending
# by 2*CHUNK_K. This order is part of the bitstream contract.
CHUNK_K = 64
_TWO_PI = 2.0 * math.pi


def _bits_to_unit(bits):
    """uint32 -> f32 uniform in [0, 1): set exponent to [1, 2), drop 1."""
    mantissa = jax.lax.shift_right_logical(bits, jnp.uint32(9))
    one_to_two = jax.lax.bitcast_convert_type(
        mantissa | jnp.uint32(0x3F800000), jnp.float32
    )
    return one_to_two - 1.0


def _normal_pair(shape):
    """Box–Muller from two hardware-PRNG draws; BOTH halves (cos and sin
    share the log/sqrt radius, halving transcendentals and PRNG words per
    normal — the VPU transcendental chain is the measured bottleneck)."""
    b1 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    b2 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    u1 = _bits_to_unit(b1)
    u2 = _bits_to_unit(b2)
    # 1 - u1 in (0, 1]: log argument never 0
    r = jnp.sqrt(-2.0 * jnp.log1p(-u1))
    t = _TWO_PI * u2
    return r * jnp.cos(t), r * jnp.sin(t)


def _rademacher_tile(shape):
    """+-1.0 from the sign bit: two bit-ops per entry, no transcendentals."""
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    return jax.lax.bitcast_convert_type(
        (bits & jnp.uint32(0x80000000)) | jnp.uint32(0x3F800000), jnp.float32
    )


def _fill_strip(omega_ref, k: int, block_rows: int, dist: str):
    """Fill the (k, block_rows) scratch strip chunk by chunk — chunks are
    ALWAYS bounded (<= 4*CHUNK_K rows of live temporaries) regardless of
    k: a full-strip Box-Muller (or a large sign draw) OOMs scoped VMEM."""
    if dist == "rademacher":
        for r0 in range(0, k, 4 * CHUNK_K):
            c = min(4 * CHUNK_K, k - r0)
            omega_ref[r0:r0 + c, :] = _rademacher_tile((c, block_rows))
        return
    assert dist == "normal", dist
    if k % (2 * CHUNK_K) == 0:
        for r0 in range(0, k, 2 * CHUNK_K):
            zc, zs = _normal_pair((CHUNK_K, block_rows))
            omega_ref[r0:r0 + CHUNK_K, :] = zc
            omega_ref[r0 + CHUNK_K:r0 + 2 * CHUNK_K, :] = zs
    else:  # odd-shaped k: cos half only (separate bitstream family)
        for r0 in range(0, k, CHUNK_K):
            c = min(CHUNK_K, k - r0)
            omega_ref[r0:r0 + c, :] = _normal_pair((c, block_rows))[0]


def _sketch_kernel(seed_ref, x_ref, o_ref, omega_ref, *, block_rows, dist):
    i = pl.program_id(0)
    pltpu.prng_seed(seed_ref[0], i)
    _fill_strip(omega_ref, o_ref.shape[0], block_rows, dist)

    @pl.when(i == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    o_ref[:] += jax.lax.dot(
        omega_ref[:], x_ref[:], preferred_element_type=jnp.float32
    )


@functools.partial(
    jax.jit,
    static_argnames=("range_dim", "block_rows", "dist", "interpret"),
)
def gaussian_sketch(
    X,
    range_dim: int,
    seed,
    block_rows: int = DEFAULT_BLOCK_ROWS,
    dist: str = "normal",
    interpret: bool = False,
):
    """Sketch column vectors: (n, m) -> (range_dim, m), Omega ~ N(0, 1/k).

    ``dist="rademacher"`` draws +-1/sqrt(k) entries instead (same JL
    guarantees up to constants): no transcendentals, so it runs at the
    HBM read roofline where the normal draw is VPU-bound.

    ``X`` is f32 (bf16 input is upcast — the normals and the accumulator
    are f32 either way; complex input is rejected, the hardware-PRNG
    path is real-only).  n is zero-padded to a multiple of
    ``block_rows``; padded rows multiply zeros, so the result does not
    depend on the padding, and strips always draw full-width so the
    bitstream does not depend on n.

    PRECISION CONTRACT: the in-kernel MXU dot runs at the platform
    default (f32 operands truncated to bf16, ~2e-3 relative) — a
    DELIBERATE choice: the kernel is MXU-weight-stream-bound below ~128
    columns, so HIGHEST (3 passes) would triple its floor, and 2e-3 is
    far below sketch distortion.  Consequence: results differ from the
    exact ``gaussian_strip``-matrix oracle product at the bf16 level;
    compare with tolerance ~1e-2, and prefer the canonical
    ``GaussianEmbedding`` where exact cross-path reproducibility matters.
    """
    X = jnp.asarray(X)
    if jnp.iscomplexobj(X):
        raise TypeError(
            "gaussian_sketch is real-only (the hardware-PRNG kernel draws "
            "real strips and casting would silently drop the imaginary "
            "part); use the canonical GaussianEmbedding for complex data"
        )
    X = X.astype(jnp.float32)
    single = X.ndim == 1
    Xm = X[:, None] if single else X
    n, m = Xm.shape
    k = int(range_dim)
    W = int(block_rows)
    n_pad = -(-n // W) * W
    if n_pad != n:
        Xm = jnp.pad(Xm, ((0, n_pad - n), (0, 0)))
    grid = n_pad // W

    out = pl.pallas_call(
        functools.partial(_sketch_kernel, block_rows=W, dist=dist),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((W, m), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((k, m), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((k, m), jnp.float32),
        scratch_shapes=[pltpu.VMEM((k, W), jnp.float32)],
        interpret=interpret,
    )(jnp.asarray([seed], jnp.int32), Xm)
    out = out / math.sqrt(k)
    return out[:, 0] if single else out


def _strip_kernel(seed_ref, o_ref, *, block_rows, dist):
    pltpu.prng_seed(seed_ref[0], seed_ref[1])
    _fill_strip(o_ref, o_ref.shape[0], block_rows, dist)


@functools.partial(
    jax.jit,
    static_argnames=("range_dim", "block_rows", "dist", "interpret"),
)
def gaussian_strip(
    range_dim: int,
    seed,
    block_index,
    block_rows: int = DEFAULT_BLOCK_ROWS,
    dist: str = "normal",
    interpret: bool = False,
):
    """Materialize strip ``block_index`` of the UNSCALED Omega — the exact
    (range_dim, block_rows) values :func:`gaussian_sketch` contracts with
    rows ``[b*block_rows, (b+1)*block_rows)`` (oracle / ``random_matrix``
    path; multiply by ``1/sqrt(range_dim)`` for the scaled operator)."""
    k = int(range_dim)
    W = int(block_rows)
    return pl.pallas_call(
        functools.partial(_strip_kernel, block_rows=W, dist=dist),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k, W), jnp.float32),
        interpret=interpret,
    )(jnp.asarray([seed, block_index], jnp.int32))
