"""Fast Walsh-Hadamard transform and SRHT, TPU-first.

Rebuild of the reference's numba/ffht FWHT stack (reference rla/srht.py:
``_fht_1d``:14, ``_fht_2d``:39, ``fht_ip``:99, ``fht_oop``:121,
``srht``:136). Instead of translating the radix-2 butterfly loop (2*log2(n)
HBM passes of pure adds — bandwidth-catastrophic on TPU), the transform is
computed from the Kronecker factorization

    H_{2^d} = H_{2^{d1}} (x) ... (x) H_{2^{dm}},   d1 + ... + dm = d,

i.e. m batched matmuls with small dense Hadamard factors that run on the
MXU: O(n * 2^{d_i}) MACs per stage but only m ~ 3 passes over HBM, which is
the right trade on hardware with ~200x more flops than bandwidth. A fused
single-pass Pallas kernel for the full SRHT (sketch dims k << n) lives in
ops/srht_pallas.py.

SRHT semantics (matching the reference, with its normalization inconsistency
resolved — see reference rla/srht.py:171 vs rla/embeddings.py:208):

    y = sqrt(2^d / k) * P H D x

with D a seeded Rademacher diagonal on the *n original* entries, zero-pad
n -> 2^d, H the 2^(-d/2)-normalized Hadamard transform, and P a k-row
sampler **with replacement** from the 2^d outputs. We use sqrt(2^d/k)
everywhere (the matrix-free convention); the reference's explicit-matrix
path uses sqrt(n/k), which disagrees whenever n is not a power of two.
"""

from __future__ import annotations

import math
from functools import lru_cache
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_MAX_FACTOR_LOG = 8  # largest Hadamard factor 2^8=256: 256KB f32, VMEM-friendly


@lru_cache(maxsize=None)
def _hadamard_np(log2n: int) -> np.ndarray:
    """Sylvester-ordered Hadamard matrix H[i,j] = (-1)^popcount(i & j)."""
    n = 1 << log2n
    i = np.arange(n)
    ij = i[:, None] & i[None, :]
    pop = np.zeros_like(ij)
    v = ij
    while v.any():
        pop += v & 1
        v >>= 1
    return np.where(pop % 2 == 0, 1.0, -1.0)


def hadamard_matrix(log2n: int, dtype=jnp.float32) -> jax.Array:
    return jnp.asarray(_hadamard_np(log2n), dtype=dtype)


def _split_factors(d: int) -> Tuple[int, ...]:
    """Split d into near-equal chunks of at most _MAX_FACTOR_LOG."""
    if d == 0:
        return ()
    m = -(-d // _MAX_FACTOR_LOG)
    base, extra = divmod(d, m)
    return tuple(base + (1 if i < extra else 0) for i in range(m))


def fwht(x: jax.Array, normalize: bool = True,
         precision=jax.lax.Precision.HIGHEST) -> jax.Array:
    """Walsh-Hadamard transform along the LAST axis (length must be 2^d).

    ``normalize=True`` applies the 2^(-d/2) scaling (reference
    rla/srht.py:36,64,90 normalize in-place the same way). ``precision``
    defaults to HIGHEST: the default TPU matmul truncates f32 inputs to
    bf16; the Hadamard factors are exact but the data is not. Pass
    ``precision=None`` for the fast bf16 path when sketch distortion
    dominates anyway.
    """
    n = x.shape[-1]
    d = n.bit_length() - 1
    assert 1 << d == n, f"fwht: last axis {n} is not a power of two"
    batch = x.shape[:-1]
    factors = _split_factors(d)
    for i, df in enumerate(factors):
        F = 1 << df
        P = int(np.prod([1 << f for f in factors[:i]], dtype=np.int64)) if i else 1
        S = n // (P * F)
        H = hadamard_matrix(df, x.dtype)
        x = x.reshape(*batch, P, F, S)
        x = jnp.einsum("...pfs,fg->...pgs", x, H, precision=precision)
    x = x.reshape(*batch, n)
    if normalize:
        x = x * jnp.asarray(2.0 ** (-d / 2.0), dtype=x.dtype)
    return x


def _srht_plan(key: jax.Array, n: int, k: int) -> Tuple[jax.Array, jax.Array, int]:
    """Seeded (rademacher (n,), sampling (k,), d) — pure function of key.

    The sign vector uses the canonical SIGN_BLOCK-wise derivation
    (ops/seeding.py) so mesh shards can regenerate exactly their slice:
    one seed = one operator on any device layout.
    """
    from rla4mor_tpu.ops.seeding import rademacher_vector

    d = max(int(math.ceil(math.log2(max(n, 1)))), 0)
    key_d = jax.random.fold_in(key, 0)
    key_s = jax.random.fold_in(key, 1)
    rademacher = rademacher_vector(key_d, n)
    sampling = jax.random.randint(key_s, (k,), 0, 1 << d)
    return rademacher, sampling, d


def srht(x: jax.Array, k: int, key: jax.Array) -> jax.Array:
    """SRHT sketch along the LAST axis: (..., n) -> (..., k).

    Matches reference ``srht`` (rla/srht.py:136-177): Rademacher sign flip
    on the n input entries, zero-pad to 2^d, normalized FWHT, sample k rows
    with replacement, scale by sqrt(2^d / k).
    """
    n = x.shape[-1]
    rademacher, sampling, d = _srht_plan(key, n, k)
    y = x * rademacher.astype(x.dtype)
    if (1 << d) > n:
        pad = [(0, 0)] * (x.ndim - 1) + [(0, (1 << d) - n)]
        y = jnp.pad(y, pad)
    y = fwht(y, normalize=True)
    scale = jnp.asarray(math.sqrt((1 << d) / k), dtype=x.dtype)
    return scale * jnp.take(y, sampling, axis=-1)


def srht_rows(
    key: jax.Array, n: int, k: int, indices: Optional[jax.Array] = None,
    dtype=jnp.float64,
) -> jax.Array:
    """Explicit rows of the (k, n) SRHT matrix (same seed => same operator).

    Equivalent of the reference's ``_get_random_rows`` (rla/
    embeddings.py:195-209) but with the consistent sqrt(2^d/k) scaling:
    rows are FWHT'ed one-hots at the sampled positions, truncated to n and
    sign-flipped.
    """
    rademacher, sampling, d = _srht_plan(key, n, k)
    if indices is None:
        indices = jnp.arange(k)
    m = 1 << d
    onehot = jax.nn.one_hot(sampling[indices], m, dtype=dtype)
    rows = fwht(onehot, normalize=True)[:, :n]
    scale = jnp.asarray(math.sqrt(m / k), dtype=dtype)
    return scale * rows * rademacher.astype(dtype)[None, :]
