"""Canonical seeded derivation of random embedding entries.

One seed = one operator EVERYWHERE (the reference contract: an embedding is
a pure function of its seed, rla/embeddings.py:102-113).  Host, blocked and
mesh-sharded code paths all generate the same Gaussian matrix for the same
``(key, k, n, dtype)`` by drawing fixed-size tiles

    T[i, j] = normal(fold_in(fold_in(key, i), j), (TILE_K, TILE_N))

on a padded grid and slicing the assembly to ``(k, n)``; Rademacher sign
vectors use fixed blocks ``s[b] = rademacher(fold_in(key, b), (SIGN_BLOCK,))``.
Because tile sizes are fixed constants (part of the operator definition,
not of the execution layout), a row block, a column shard, and the full
matrix are literally slices of the same array — so sharded and unsharded
sketches are bit-identical and independent of the device count.

The drawn values depend on the generation dtype (normal in f32 is not the
f64 draw cast down), so the operator identity includes ``dtype``.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

TILE_K = 128     # row tile: MXU/VREG aligned, >= typical sketch k granularity
TILE_N = 4096    # column tile: shard widths must be a multiple or a divisor
SIGN_BLOCK = 4096


def _tile(key: jax.Array, i, j, dtype) -> jax.Array:
    """(TILE_K, TILE_N) Gaussian tile (i, j). i/j may be traced."""
    kij = jax.random.fold_in(jax.random.fold_in(key, i), j)
    return jax.random.normal(kij, (TILE_K, TILE_N), dtype)


def gaussian_rows(key: jax.Array, n: int, r0: int, r1: int, dtype) -> jax.Array:
    """Rows [r0, r1) x columns [0, n) of the UNSCALED canonical Gaussian.

    Host-side slicing (static r0/r1, any alignment): generates the covering
    tile rows and slices.
    """
    i0, i1 = r0 // TILE_K, -(-r1 // TILE_K)
    nj = -(-n // TILE_N)

    def tile_row(i):
        t = jax.vmap(lambda j: _tile(key, i, j, dtype))(jnp.arange(nj))
        return jnp.moveaxis(t, 0, 1).reshape(TILE_K, nj * TILE_N)

    rows = jnp.concatenate([tile_row(i) for i in range(i0, i1)], axis=0)
    return rows[r0 - i0 * TILE_K : r1 - i0 * TILE_K, :n]


def gaussian_matrix(key: jax.Array, k: int, n: int, dtype) -> jax.Array:
    """The canonical (k, n) Gaussian Omega with iid N(0, 1/k) entries."""
    return gaussian_rows(key, n, 0, k, dtype) / math.sqrt(k)


def _is_static_multiple(c0, width: int) -> bool:
    """True when c0 is a static python/numpy int divisible by width."""
    import numpy as np

    return isinstance(c0, (int, np.integer)) and int(c0) % width == 0


def gaussian_cols_unscaled(key: jax.Array, k: int, c0, width: int,
                           dtype, aligned: bool = False) -> jax.Array:
    """Columns [c0, c0+width) of the UNSCALED canonical (k, n) Gaussian.

    ``c0`` may be traced (shard offset); ``width`` is static.  The fast
    tile-exact paths are ONLY valid when ``c0 % width == 0`` (then a
    width-multiple-of-TILE_N strip starts tile-aligned, and a
    width-dividing-TILE_N strip cannot cross a tile boundary).  They are
    taken when that is statically known — ``c0`` a static int, or the
    caller asserting ``aligned=True`` for a traced offset it constructs
    as ``shard_index * width`` (all in-repo sharded callers).  Any other
    (c0, width) uses the general path: draw the ``(width-1)//TILE_N + 2``
    covering tiles and dynamic-slice — one extra tile of generation,
    values identical (everything is a slice of the same canonical
    matrix).  A boundary-crossing strip MUST take the general path:
    ``dynamic_slice`` clamps its start index and would silently return
    the wrong columns (round-2 review finding, repro'd).
    """
    ni = -(-k // TILE_K)
    c0_ok = aligned or _is_static_multiple(c0, width)
    if width % TILE_N == 0 and c0_ok:
        nj = width // TILE_N
        j0 = c0 // TILE_N

        def block(i):
            t = jax.vmap(lambda j: _tile(key, i, j, dtype))(j0 + jnp.arange(nj))
            return jnp.moveaxis(t, 0, 1).reshape(TILE_K, nj * TILE_N)

    elif TILE_N % width == 0 and c0_ok:
        j0 = c0 // TILE_N
        off = jnp.asarray(c0 % TILE_N, jnp.int32)

        def block(i):
            return jax.lax.dynamic_slice(
                _tile(key, i, j0, dtype),
                (jnp.zeros_like(off), off),
                (TILE_K, width),
            )

    else:  # general strip: covering tiles + dynamic slice
        nj = (width - 1) // TILE_N + 2
        j0 = c0 // TILE_N
        off = jnp.asarray(c0 % TILE_N, jnp.int32)

        def block(i):
            t = jax.vmap(lambda j: _tile(key, i, j, dtype))(j0 + jnp.arange(nj))
            row = jnp.moveaxis(t, 0, 1).reshape(TILE_K, nj * TILE_N)
            return jax.lax.dynamic_slice(
                row, (jnp.zeros_like(off), off), (TILE_K, width)
            )

    out = jnp.concatenate([block(i) for i in range(ni)], axis=0)
    return out[:k]


def gaussian_cols(key: jax.Array, k: int, c0, width: int, dtype,
                  aligned: bool = False) -> jax.Array:
    """Scaled (k, width) column strip of the canonical N(0, 1/k) Omega."""
    return gaussian_cols_unscaled(
        key, k, c0, width, dtype, aligned=aligned
    ) / math.sqrt(k)


def rademacher_vector(key: jax.Array, n: int) -> jax.Array:
    """Canonical (n,) int8 +-1 vector assembled from SIGN_BLOCK blocks."""
    nb = -(-n // SIGN_BLOCK)
    s = jax.vmap(
        lambda b: jax.random.rademacher(
            jax.random.fold_in(key, b), (SIGN_BLOCK,), dtype=jnp.int8
        )
    )(jnp.arange(nb))
    return s.reshape(-1)[:n]


def rademacher_slice(key: jax.Array, c0, width: int,
                     aligned: bool = False) -> jax.Array:
    """Entries [c0, c0+width) of the canonical sign vector (traced c0 ok).

    Same alignment contract as ``gaussian_cols_unscaled`` w.r.t.
    SIGN_BLOCK: fast paths require ``c0 % width == 0`` (static or
    asserted via ``aligned=True``); anything else takes the
    covering-block general path.
    """
    c0_ok = aligned or _is_static_multiple(c0, width)
    if width % SIGN_BLOCK == 0 and c0_ok:
        b0 = c0 // SIGN_BLOCK
        nb = width // SIGN_BLOCK
        s = jax.vmap(
            lambda b: jax.random.rademacher(
                jax.random.fold_in(key, b), (SIGN_BLOCK,), dtype=jnp.int8
            )
        )(b0 + jnp.arange(nb))
        return s.reshape(-1)
    if SIGN_BLOCK % width == 0 and c0_ok:
        b0 = c0 // SIGN_BLOCK
        s = jax.random.rademacher(
            jax.random.fold_in(key, b0), (SIGN_BLOCK,), dtype=jnp.int8
        )
        return jax.lax.dynamic_slice(s, (c0 % SIGN_BLOCK,), (width,))
    # general slice: covering blocks + dynamic slice
    nb = (width - 1) // SIGN_BLOCK + 2
    b0 = c0 // SIGN_BLOCK
    s = jax.vmap(
        lambda b: jax.random.rademacher(
            jax.random.fold_in(key, b), (SIGN_BLOCK,), dtype=jnp.int8
        )
    )(b0 + jnp.arange(nb))
    return jax.lax.dynamic_slice(
        s.reshape(-1), (jnp.asarray(c0 % SIGN_BLOCK, jnp.int32),), (width,)
    )
