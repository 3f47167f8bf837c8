"""Embedding zoo tests: apply == explicit matrix, adjoints, seeds, dims."""

import jax.numpy as jnp
import numpy as np
import pytest

from rla4mor_tpu.core import DenseOp
from rla4mor_tpu.ops import (
    BlockGaussianEmbedding,
    GaussianEmbedding,
    IdentityEmbedding,
    RademacherEmbedding,
    SparseSignEmbedding,
    SrhtEmbedding,
    VectorizedEmbedding,
    gaussian_dim,
    srht_dim,
)

N, K = 60, 25


def _make(cls, n=N, k=K, seed=7, Q=None):
    if cls is BlockGaussianEmbedding:
        return cls.make(n, sqrt_product=Q, range_dim=k, seed=seed, max_block_size=7)
    return cls.make(n, sqrt_product=Q, range_dim=k, seed=seed)


ALL = [GaussianEmbedding, RademacherEmbedding, SparseSignEmbedding,
       SrhtEmbedding, BlockGaussianEmbedding]


@pytest.mark.parametrize("cls", ALL)
def test_apply_equals_matrix(cls, rng):
    e = _make(cls)
    x = jnp.asarray(rng.normal(size=(N, 4)))
    y = np.asarray(e.apply(x))
    M = np.asarray(e.matrix())
    assert M.shape == (K, N)
    assert np.allclose(y, M @ np.asarray(x), atol=1e-12)


@pytest.mark.parametrize("cls", ALL)
def test_adjoint(cls, rng):
    e = _make(cls)
    v = jnp.asarray(rng.normal(size=(K, 3)))
    M = np.asarray(e.matrix())
    assert np.allclose(
        np.asarray(e.apply_adjoint(v)), M.conj().T @ np.asarray(v), atol=1e-12
    )


@pytest.mark.parametrize("cls", ALL)
def test_with_sqrt_product(cls, rng):
    A = rng.normal(size=(N, N))
    Q = DenseOp(jnp.asarray(np.triu(A) + 5 * np.eye(N)))
    e = _make(cls, Q=Q)
    x = jnp.asarray(rng.normal(size=(N, 2)))
    y = np.asarray(e.apply(x))
    M = np.asarray(e.matrix())
    assert np.allclose(y, M @ np.asarray(x), atol=1e-10)
    # Theta = Omega @ Q
    assert np.allclose(
        M, np.asarray(e.random_matrix()) @ np.asarray(Q.matrix()), atol=1e-12
    )


@pytest.mark.parametrize("cls", ALL)
def test_seed_determinism(cls):
    e1, e2 = _make(cls, seed=3), _make(cls, seed=3)
    assert np.array_equal(np.asarray(e1.matrix()), np.asarray(e2.matrix()))
    e3 = e1.with_seed(4)
    assert not np.allclose(np.asarray(e1.matrix()), np.asarray(e3.matrix()))
    # with_seed back to the original seed restores the operator
    assert np.array_equal(
        np.asarray(e3.with_seed(3).matrix()), np.asarray(e1.matrix())
    )


def test_block_gaussian_block_consistency():
    """Blocks reassemble the full matrix; per-block fold_in seeds
    (reference block-seed design, rla/embeddings.py:402-407,452-467)."""
    e = _make(BlockGaussianEmbedding)
    M = np.asarray(e.random_matrix())
    off = 0
    for b in range(e.n_blocks):
        blk = np.asarray(e.random_block(b))
        assert np.array_equal(M[off : off + blk.shape[0]], blk)
        off += blk.shape[0]
    assert off == K
    assert e.block_sizes == (7, 7, 7, 4)


def test_identity_embedding(rng):
    Q = DenseOp(jnp.asarray(np.eye(N) * 2.0))
    e = IdentityEmbedding(N, Q)
    x = jnp.asarray(rng.normal(size=(N, 2)))
    assert np.allclose(np.asarray(e.apply(x)), 2 * np.asarray(x))
    assert e.range_dim == N


def test_vectorized_embedding(rng):
    inner = GaussianEmbedding.make(12, range_dim=5, seed=2)
    ve = VectorizedEmbedding(embedding=inner, rows=3, cols=4)
    M = jnp.asarray(rng.normal(size=(3, 4)))
    got = np.asarray(ve.apply_matrix(M))
    want = np.asarray(inner.matrix()) @ np.asarray(M).reshape(-1)
    assert np.allclose(got, want, atol=1e-12)


def test_gaussian_subspace_embedding_quality(rng):
    """eps-embedding statistics on a fixed subspace (oblivious property)."""
    d, n = 5, 400
    V, _ = np.linalg.qr(rng.normal(size=(n, d)))
    k = gaussian_dim(0.5, 1e-2, d)
    e = GaussianEmbedding.make(n, range_dim=k, seed=1)
    SV = np.asarray(e.apply(jnp.asarray(V)))
    s = np.linalg.svd(SV, compute_uv=False)
    assert s.max() < 1.5 and s.min() > 0.5


def test_dim_formulas_monotone():
    assert gaussian_dim(0.25, 1e-6, 10) > gaussian_dim(0.5, 1e-6, 10)
    assert srht_dim(0.5, 1e-6, 10, 10**7) > srht_dim(0.5, 1e-6, 10, 10**3)
    assert gaussian_dim(0.5, 1e-6, 10, complex_dtype=True) > gaussian_dim(
        0.5, 1e-6, 10
    )


def test_streamed_gaussian_equals_gaussian():
    """StreamedGaussianEmbedding names the same canonical operator as
    GaussianEmbedding at the same seed, for tile-aligned and padded n."""
    import jax
    from rla4mor_tpu.ops import StreamedGaussianEmbedding
    from rla4mor_tpu.ops.seeding import TILE_N

    k = 16
    for n in (2 * TILE_N, TILE_N + 123):  # aligned / zero-padded tail
        dense = GaussianEmbedding(k, n, seed=11)
        streamed = StreamedGaussianEmbedding(k, n, seed=11,
                                             block_cols=TILE_N)
        X = jnp.asarray(np.random.RandomState(n).normal(size=(n, 3)))
        want = np.asarray(dense.apply(X))
        got = np.asarray(streamed.apply(X))
        assert np.allclose(got, want, rtol=1e-12, atol=1e-12), n
        # 1-D input path
        got1 = np.asarray(streamed.apply(X[:, 0]))
        assert np.allclose(got1, want[:, 0], rtol=1e-12, atol=1e-12)
        # jits (fixed shapes, scan over strips)
        got_j = np.asarray(jax.jit(streamed.apply)(X))
        assert np.allclose(got_j, want, rtol=1e-12, atol=1e-12)


def test_seeding_unaligned_strips_are_canonical_slices():
    """Any (c0, width) — tile-aligned or not — returns literally a slice
    of the canonical matrix / sign vector (the general covering-tile
    fallback added for non-power-of-two DoF counts, e.g. the (2^k + 1)^2
    node grids multigrid needs)."""
    import jax

    from rla4mor_tpu.ops.seeding import (
        TILE_N, gaussian_cols_unscaled, gaussian_matrix, gaussian_rows,
        rademacher_slice, rademacher_vector,
    )

    key = jax.random.key(7)
    k, n = 40, 2 * TILE_N + 513
    full = np.asarray(gaussian_rows(key, n, 0, k, jnp.float64))
    for c0, width in [(0, n), (513, 777), (TILE_N - 1, TILE_N + 3),
                      (4097, 4095), (0, TILE_N + 1),
                      # tile-crossing strips whose WIDTH matches a fast
                      # path but whose offset is unaligned (review
                      # round-2: dynamic_slice clamps -> wrong columns)
                      (TILE_N - 100, 512), (100, TILE_N)]:
        strip = np.asarray(
            gaussian_cols_unscaled(key, k, c0, width, jnp.float64)
        )
        assert np.array_equal(strip, full[:, c0:c0 + width]), (c0, width)

    sfull = np.asarray(rademacher_vector(key, n))
    for c0, width in [(0, n), (513, 777), (4095, 4099),
                      (TILE_N - 100, 512), (100, TILE_N)]:
        s = np.asarray(rademacher_slice(key, c0, width))
        assert np.array_equal(s, sfull[c0:c0 + width]), (c0, width)


@pytest.mark.parametrize("cls", ALL)
def test_with_range_dim(cls, rng):
    """Resizing the sketch (reduce_adaptive doubling, VERDICT r2 weak #7):
    same family/seed at the new k, apply == matrix at the new size."""
    e = _make(cls)
    e2 = e.with_range_dim(2 * K)
    assert e2.range_dim == 2 * K and e2.seed == e.seed
    u = jnp.asarray(rng.normal(size=(N, 3)))
    got = np.asarray(e2.apply(u))
    want = np.asarray(e2.matrix()) @ np.asarray(u)
    np.testing.assert_allclose(got, want, rtol=1e-8, atol=1e-10)


def test_with_range_dim_streamed(rng):
    from rla4mor_tpu.ops.embeddings import StreamedGaussianEmbedding

    e = StreamedGaussianEmbedding.make(N, range_dim=K, seed=3, block_cols=4096)
    e2 = e.with_range_dim(2 * K)
    g = GaussianEmbedding.make(N, range_dim=2 * K, seed=3)
    u = jnp.asarray(rng.normal(size=(N, 2)))
    np.testing.assert_allclose(
        np.asarray(e2.apply(u)), np.asarray(g.apply(u)), rtol=1e-6, atol=1e-8
    )


def test_with_range_dim_identity_raises():
    e = IdentityEmbedding(N)
    assert e.with_range_dim(e.range_dim) is e
    with pytest.raises(ValueError):
        e.with_range_dim(2 * N)


def test_with_range_dim_vectorized():
    inner = GaussianEmbedding.make(N * 2, range_dim=K, seed=5)
    v = VectorizedEmbedding(embedding=inner, rows=N, cols=2)
    v2 = v.with_range_dim(40)
    assert v2.range_dim == 40 and v2.rows == N and v2.cols == 2
