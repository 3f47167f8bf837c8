"""Hardware-PRNG Pallas Gaussian sketch (ops/gaussian_pallas.py).

These tests need a real TPU: the Mosaic PRNG primitives have no CPU
lowering (interpret mode raises NotImplementedError for ``prng_seed``),
so the whole module skips on the CPU suite. Run on-TPU via
``python -m pytest tests/test_gaussian_pallas.py --no-header -q`` with
the conftest CPU forcing disabled (RLA4MOR_TPU_TESTS=1).
"""

import os

import numpy as np
import pytest

if os.environ.get("RLA4MOR_TPU_TESTS") != "1":
    pytest.skip(
        "TPU-only kernel (no CPU lowering for Mosaic prng_seed); set "
        "RLA4MOR_TPU_TESTS=1 on a TPU host to run",
        allow_module_level=True,
    )

import jax
import jax.numpy as jnp

from rla4mor_tpu.ops.embeddings import HwPrngGaussianEmbedding
from rla4mor_tpu.ops.gaussian_pallas import gaussian_sketch, gaussian_strip

K, W = 256, 2048


@pytest.mark.parametrize("dist", ["normal", "rademacher"])
def test_sketch_matches_strip_oracle(dist):
    """Padded n; sketch == sum of materialized strips @ X blocks (f64)."""
    n, m = 3 * W + 100, 8
    X = jax.random.normal(jax.random.PRNGKey(0), (n, m), jnp.float32)
    Y = np.asarray(gaussian_sketch(X, K, 42, block_rows=W, dist=dist))
    Xp = np.zeros((4 * W, m), np.float32)
    Xp[:n] = np.asarray(X)
    acc = np.zeros((K, m), np.float64)
    for b in range(4):
        S = np.asarray(gaussian_strip(K, 42, b, block_rows=W, dist=dist))
        acc += S.astype(np.float64) @ Xp[b * W:(b + 1) * W].astype(np.float64)
    acc /= np.sqrt(K)
    # in-kernel dot runs at default (bf16-truncated) matmul precision
    assert np.linalg.norm(Y - acc) / np.linalg.norm(acc) < 1e-2


@pytest.mark.parametrize("dist", ["normal", "rademacher"])
def test_strip_statistics_and_reproducibility(dist):
    S0 = np.asarray(gaussian_strip(K, 7, 0, block_rows=W, dist=dist))
    S0b = np.asarray(gaussian_strip(K, 7, 0, block_rows=W, dist=dist))
    S1 = np.asarray(gaussian_strip(K, 7, 1, block_rows=W, dist=dist))
    T0 = np.asarray(gaussian_strip(K, 8, 0, block_rows=W, dist=dist))
    assert np.array_equal(S0, S0b)
    assert not np.allclose(S0, S1)
    assert not np.allclose(S0, T0)
    v = S0.ravel()
    assert abs(v.mean()) < 5e-3
    assert abs(v.std() - 1.0) < 5e-3
    if dist == "rademacher":
        assert set(np.unique(v)) == {-1.0, 1.0}
    else:
        assert v.min() < -3.5 and v.max() > 3.5  # real tails


def test_embedding_jl_and_matrix():
    """Embedding contract: apply == matrix @, and Parseval-ish JL norms."""
    n, m = 2 * W, 16
    emb = HwPrngGaussianEmbedding.make(n, range_dim=512, seed=3)
    X = jax.random.normal(jax.random.PRNGKey(1), (n, m), jnp.float32)
    Y = np.asarray(emb.apply(X))
    M = np.asarray(emb.random_matrix())
    assert np.linalg.norm(Y - M @ np.asarray(X)) < 1e-2 * np.linalg.norm(Y)
    ratio = np.linalg.norm(Y, axis=0) / np.linalg.norm(np.asarray(X), axis=0)
    assert np.all(np.abs(ratio - 1.0) < 0.2)  # k=512 -> ~1/sqrt(k) spread
