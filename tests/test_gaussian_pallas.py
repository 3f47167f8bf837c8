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


def test_hwprng_embedding_in_sketched_reductor():
    """Integration: the hardware-PRNG embedding drives a SketchedReductor
    end-to-end on the chip — estimator tracks the true residual within
    the usual sketch distortion."""
    from rla4mor_tpu.models import ThermalBlockFOM
    from rla4mor_tpu.mor import SketchedReductor
    from rla4mor_tpu.ops import GaussianEmbedding

    fom = ThermalBlockFOM((2, 2), 16)
    Ru = fom.h1_0_product
    theta = HwPrngGaussianEmbedding.make(
        fom.solution_dim, sqrt_product=Ru.sqrt, range_dim=256, seed=1,
        dist="rademacher",
    )
    phi = GaussianEmbedding.make(256, range_dim=128, seed=7)
    red = SketchedReductor(fom, embedding_primal=theta,
                           embedding_online=phi, product=Ru,
                           orthonormalize=True, log_level=30)
    mus = fom.parameter_space.sample_randomly(5, key=3)
    red.extend_basis(fom.solve_many(mus))
    rom = red.reduce(seed=11)
    mu_t = fom.parameter_space.sample_randomly(1, key=4)[0]
    u_r = rom.solve(mu_t)
    est = float(np.asarray(rom.estimate_error(mu_t)))
    # true Riesz residual norm of the lifted solution
    u = red.rb @ jnp.asarray(u_r)
    A = fom.assemble_sparse(mu_t)
    b = np.asarray(fom.assemble_rhs(mu_t))
    r = A @ np.asarray(u, np.float64) - b
    true = float(np.sqrt(r @ np.asarray(Ru.inv.apply(jnp.asarray(r)))))
    assert est > 0 and np.isfinite(est)
    assert 0.3 * true < est < 3.0 * true
