"""Fused Pallas SRHT kernel: interpret-mode equivalence with the XLA path
(real-TPU execution is exercised by bench.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import jax.experimental.pallas as pl

import rla4mor_tpu.ops.srht_pallas as sp
from rla4mor_tpu.ops.fwht import srht


@pytest.fixture
def interpret_pallas(monkeypatch):
    orig = pl.pallas_call

    def patched(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    monkeypatch.setattr(sp.pl, "pallas_call", patched)


@pytest.mark.parametrize("m,d,k", [(5, 10, 64), (3, 13, 200), (9, 16, 150)])
def test_pallas_matches_xla(interpret_pallas, m, d, k):
    key = jax.random.key(7)
    x = jnp.asarray(
        np.random.RandomState(d).normal(size=(m, 1 << d)), dtype=jnp.float32
    )
    y1 = np.asarray(sp.srht_pallas(x, k, key))
    y2 = np.asarray(srht(x, k, key))
    assert y1.shape == (m, k)
    rel = np.abs(y1 - y2).max() / np.abs(y2).max()
    assert rel < 1e-5


@pytest.mark.parametrize("m,d,k,B", [(4, 16, 64, 2), (5, 17, 100, 4)])
def test_pallas_packed_matches_srht(interpret_pallas, m, d, k, B):
    """Multi-row + 1-bit-packed-sign kernel (PERF.md gaps #2/#3) equals
    the canonical plan; also at m not divisible by block_rows."""
    key = jax.random.key(7)
    x = jnp.asarray(
        np.random.RandomState(d).normal(size=(m, 1 << d)), dtype=jnp.float32
    )
    y1 = np.asarray(
        sp.srht_pallas_packed(x, k, key, jax.lax.Precision.HIGHEST,
                              block_rows=B)
    )
    y2 = np.asarray(srht(x, k, key))
    assert y1.shape == (m, k)
    assert np.abs(y1 - y2).max() / np.abs(y2).max() < 1e-5


def test_hadamard_rows_helper():
    from scipy.linalg import hadamard

    H = hadamard(64)
    sel = jnp.asarray([0, 5, 17, 63])
    rows = np.asarray(sp._hadamard_rows(sel, 64, jnp.float32))
    assert np.array_equal(rows, H[np.asarray(sel)])


def test_split_pqr():
    for d in (10, 12, 16, 20, 24):
        dp, dq, dr = sp._split_pqr(d)
        assert dp + dq + dr == d
        assert dr <= 12 and dq <= 8
        assert dp >= 0
    assert sp._split_pqr(24) == (5, 8, 11)


def test_onepass_xla_matches_srht():
    import jax.numpy as jnp
    from rla4mor_tpu.ops.srht_pallas import srht_onepass_xla

    key = jax.random.key(3)
    m, d, k = 4, 14, 120
    x = jnp.asarray(
        np.random.RandomState(1).normal(size=(m, 1 << d)), dtype=jnp.float32
    )
    y1 = np.asarray(srht_onepass_xla(x, k, key))
    y2 = np.asarray(srht(x, k, key))
    assert np.abs(y1 - y2).max() / np.abs(y2).max() < 1e-5


def test_onepass_xla_unroll_equivalent():
    from rla4mor_tpu.ops.srht_pallas import srht_onepass_xla

    key = jax.random.key(11)
    m, d, k = 3, 13, 96
    x = jnp.asarray(
        np.random.RandomState(2).normal(size=(m, 1 << d)), dtype=jnp.float32
    )
    y1 = np.asarray(srht_onepass_xla(x, k, key))
    for unroll in (2, 4):
        yu = np.asarray(srht_onepass_xla(x, k, key, unroll=unroll))
        assert np.abs(yu - y1).max() / np.abs(y1).max() < 1e-6


def test_onepass_xla_bf16_input():
    """bf16 snapshot blocks: sketch accumulates in f32; quantization error
    stays ~1e-2, far below typical embedding distortion (PERF.md)."""
    from rla4mor_tpu.ops.srht_pallas import srht_onepass_xla

    key = jax.random.key(5)
    m, d, k = 4, 13, 128
    xf = jnp.asarray(
        np.random.RandomState(3).normal(size=(m, 1 << d)), dtype=jnp.float32
    )
    xh = xf.astype(jnp.bfloat16)
    yh = np.asarray(
        srht_onepass_xla(xh, k, key, jax.lax.Precision.DEFAULT)
    ).astype(np.float32)
    yf = np.asarray(srht_onepass_xla(xf, k, key))
    rel = np.abs(yh - yf).max() / np.abs(yf).max()
    assert rel < 2e-2
    # norms preserved to bf16 accuracy (the sketch estimate itself)
    nf = np.linalg.norm(yf, axis=1)
    nh = np.linalg.norm(yh.astype(np.float32), axis=1)
    assert np.abs(nh / nf - 1).max() < 2e-2


def test_onepass_flat_matches_srht():
    """Flat (no-scan) formulation: 2-D, blocked 3-D, and block override all
    equal the canonical srht plan."""
    from rla4mor_tpu.ops.srht_pallas import srht_onepass_flat

    key = jax.random.key(3)
    m, d, k, R = 4, 14, 120, 512
    x = jnp.asarray(np.random.RandomState(1).normal(size=(m, 1 << d)))
    want = np.asarray(srht(x, k, key))
    got2 = np.asarray(srht_onepass_flat(x, k, key, block=R))
    got3 = np.asarray(
        srht_onepass_flat(x.reshape(m, (1 << d) // R, R), k, key)
    )
    gotd = np.asarray(srht_onepass_flat(x, k, key))  # default block
    scale = np.abs(want).max()
    assert np.abs(got2 - want).max() / scale < 1e-12
    assert np.abs(got3 - want).max() / scale < 1e-12
    assert np.abs(gotd - want).max() / scale < 1e-12


def test_onepass_flat_bf16():
    from rla4mor_tpu.ops.srht_pallas import srht_onepass_flat

    key = jax.random.key(9)
    m, d, k = 3, 13, 128
    xf = jnp.asarray(
        np.random.RandomState(5).normal(size=(m, 1 << d)), jnp.float32
    )
    want = np.asarray(srht_onepass_flat(xf, k, key))
    got = np.asarray(
        srht_onepass_flat(xf.astype(jnp.bfloat16), k, key,
                          jax.lax.Precision.DEFAULT)
    ).astype(np.float32)
    assert np.abs(got - want).max() / np.abs(want).max() < 2e-2


def test_onepass_flat_cols_matches_srht():
    from rla4mor_tpu.ops.srht_pallas import srht_onepass_flat_cols

    key = jax.random.key(3)
    n, m, k = 1 << 13, 6, 96
    U = jnp.asarray(np.random.RandomState(8).normal(size=(n, m)))
    want = np.asarray(srht(U.T, k, key).T)
    got2 = np.asarray(srht_onepass_flat_cols(U, k, key, block=256))
    got3 = np.asarray(srht_onepass_flat_cols(U.reshape(32, 256, m), k, key))
    scale = np.abs(want).max()
    assert np.abs(got2 - want).max() / scale < 1e-12
    assert np.abs(got3 - want).max() / scale < 1e-12


def test_srht_embedding_dispatches_onepass():
    """SrhtEmbedding uses the single-pass kernels at large power-of-two n
    with identical results (same seeded plan): scan path for skinny
    blocks, columns-native flat path for wide blocks."""
    from rla4mor_tpu.ops.embeddings import SrhtEmbedding

    n = SrhtEmbedding._ONEPASS_MIN_DIM  # smallest dispatching size
    emb = SrhtEmbedding(64, n, seed=9)
    for m in (2, SrhtEmbedding._COLS_MIN_WIDTH):
        x = jnp.asarray(np.random.RandomState(4).normal(size=(n, m)))
        got = np.asarray(emb.apply(x))
        want = np.asarray(srht(x.T, 64, emb.key).T)
        assert np.allclose(got, want, rtol=1e-9, atol=1e-9), m


def test_flat_cols_dispatch_complex(rng):
    """Complex snapshots through SrhtEmbedding's wide-input fast path
    (srht_onepass_flat_cols) equal the canonical srht exactly."""
    from rla4mor_tpu.ops import SrhtEmbedding
    from rla4mor_tpu.ops.fwht import srht

    n, m, k = 4096, 160, 64  # n pow2, m >= 128 -> flat-cols dispatch
    X = jnp.asarray(rng.normal(size=(n, m)) + 1j * rng.normal(size=(n, m)))
    emb = SrhtEmbedding(k, n, seed=3)
    got = np.asarray(emb.apply_random(X))
    ref = np.asarray(srht(X.T, k, emb.key).T)
    assert np.abs(got - ref).max() < 1e-12 * np.abs(ref).max()


@pytest.mark.parametrize("n,m,k,block", [
    (1000, 7, 64, 128),        # non-pow2 n, tail block partial
    (4097, 3, 100, 256),       # just past a power of two
    (1 << 12, 5, 64, 256),     # pow2 n through the general path
    (2049 * 33, 2, 128, 2048), # grid-like node count
])
def test_onepass_flat_cols_any_n(n, m, k, block):
    """Non-pow2 n: the slice+tail flat contraction equals the canonical
    pad-to-2^d srht (reference rla/srht.py:167 semantics)."""
    from rla4mor_tpu.ops.srht_pallas import (
        srht_onepass_cols_bmk,
        srht_onepass_flat_cols,
        srht_onepass_vec,
    )

    key = jax.random.key(11)
    U = jnp.asarray(
        np.random.RandomState(n % 997).normal(size=(n, m)), dtype=jnp.float64
    )
    want = np.asarray(srht(U.T, k, key).T)
    got = np.asarray(srht_onepass_flat_cols(U, k, key, block=block))
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)
    got_bmk = np.asarray(srht_onepass_cols_bmk(U, k, key, block=block))
    np.testing.assert_allclose(got_bmk, want, rtol=1e-12, atol=1e-12)
    got_vec = np.asarray(srht_onepass_vec(U[:, 0], k, key, block=block))
    np.testing.assert_allclose(got_vec, want[:, 0], rtol=1e-12, atol=1e-12)
    # default block size too
    got_d = np.asarray(srht_onepass_flat_cols(U, k, key))
    np.testing.assert_allclose(got_d, want, rtol=1e-12, atol=1e-12)


def test_onepass_vec_small_n_tail_only():
    """n <= R: everything lives in the tail block."""
    from rla4mor_tpu.ops.srht_pallas import srht_onepass_vec

    key = jax.random.key(3)
    x = jnp.asarray(np.random.RandomState(0).normal(size=100), jnp.float64)
    want = np.asarray(srht(x, 64, key))
    got = np.asarray(srht_onepass_vec(x, 64, key, block=256))
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("n,m,k", [(1000, 5, 64), (4097, 3, 100), (4096, 4, 64)])
def test_flat_rows_blocked_any_n(n, m, k):
    """Pre-blocked (m, B, R) rows input with zero tail + n= equals the
    canonical srht of the true-length rows."""
    from rla4mor_tpu.ops.srht_pallas import srht_onepass_flat

    key = jax.random.key(5)
    X = jnp.asarray(np.random.RandomState(n % 97).normal(size=(m, n)),
                    jnp.float64)
    want = np.asarray(srht(X, k, key))
    R = 256
    B = -(-n // R)
    Xb = jnp.pad(X, ((0, 0), (0, B * R - n))).reshape(m, B, R)
    got = np.asarray(srht_onepass_flat(Xb, k, key, n=n))
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


def test_srht_embedding_blocked_layout(rng):
    """SrhtEmbedding.to_blocked + 3-D apply_random == 2-D apply_random
    (the reductor's roofline snapshot storage, VERDICT r2 item 1)."""
    from rla4mor_tpu.ops.embeddings import SrhtEmbedding

    for n in (1000, 4096, 5000):
        e = SrhtEmbedding.make(n, range_dim=48, seed=9)
        U = jnp.asarray(rng.normal(size=(n, 6)))
        want = np.asarray(e.apply_random(U))
        got = np.asarray(e.apply_random(e.to_blocked(U)))
        np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)
        B, R = e.blocked_shape
        assert e.to_blocked(U).shape == (6, B, R)
