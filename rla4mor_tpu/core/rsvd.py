"""Randomized range finder and randomized SVD (Halko–Martinsson–Tropp).

Beyond-reference addition: the reference sketches *residual systems*
(rla/embeddings.py) but has no randomized factorization — its POD is
pyMOR's dense method of snapshots (inverse_problems/example.py:64), an
(m, m) host Gram eigendecomposition that squares the condition number.
The randomized SVD here is the natural TPU companion:

* all O(n)-sized work is tall-skinny matmuls (MXU, ``Precision.HIGHEST``
  by default — the TPU f32->bf16 truncation is ~2e-3, far above POD
  truncation tolerances);
* the l2 path (``product=None``) is fully jittable: fixed shapes, QR
  re-orthonormalization, no host round trips — it vmaps/shards like any
  other device program (a DoF-sharded X turns every n-axis contraction
  into per-shard partials + psum under GSPMD);
* no Gram squaring: the small SVD runs on Q^H X, so the accuracy floor
  is ~eps, not ~sqrt(eps) like the method of snapshots.

``range_finder`` / ``rsvd`` take an oversampled target rank and optional
power iterations (HMT Algs 4.3/4.4 + 5.1); ``range_finder_adaptive`` is
the posterior-certified variant (HMT Alg 4.2): it grows the basis until
a Gaussian-probe estimate of ||X - Q Q^H X|| drops below ``tol`` — the
bound ``max_j ||(I - QQ^H) x_omega_j|| * 10 sqrt(2/pi)`` holds with
probability ``1 - 10^-n_probes``.

Product-weighted (R-inner-product) variants return R-orthonormal modes:
``X = U S V^H`` with ``U^H R U = I``, computed Gram-free via an
R-orthonormal range basis (``gram_schmidt(product=...)``) and the small
SVD of ``Q^H R X``. ``pod_randomized`` wraps this with the same return
contract as :func:`rla4mor_tpu.core.orthonormalize.pod`.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rla4mor_tpu.core.orthonormalize import gram_schmidt
from rla4mor_tpu.core.products import Product

_HI = jax.lax.Precision.HIGHEST


def _test_matrix(key, m: int, l: int, dtype) -> jnp.ndarray:
    """Gaussian test matrix Omega (m, l); complex when dtype is complex."""
    if jnp.issubdtype(dtype, jnp.complexfloating):
        rdt = jnp.zeros((), dtype).real.dtype
        kr, ki = jax.random.split(key)
        return (jax.random.normal(kr, (m, l), rdt)
                + 1j * jax.random.normal(ki, (m, l), rdt)).astype(dtype)
    return jax.random.normal(key, (m, l), dtype)


def _orth_l2(Y: jnp.ndarray) -> jnp.ndarray:
    """Thin-QR orthonormalization (jittable; rank deficiency tolerated —
    null columns come out as arbitrary orthonormal directions, harmless
    for a range basis)."""
    return jnp.linalg.qr(Y, mode="reduced")[0]


def range_finder(
    X,
    l: int,
    key=None,
    power_iters: int = 0,
    product: Optional[Product] = None,
    seed: int = 0,
) -> jnp.ndarray:
    """Randomized range basis Q (n, l) with Q^H R Q = I (HMT Alg 4.3/4.4).

    ``Y = X Omega`` for a Gaussian Omega (m, l), followed by
    ``power_iters`` rounds of the R-weighted subspace iteration
    ``Y <- X (X^H R Y)`` with re-orthonormalization between rounds (the
    numerically stable form of ``(X X^H R)^q X Omega``), then a final
    orthonormalization. With ``product=None`` everything is device QR +
    matmuls and the call jits; product-weighted orthonormalization uses
    the host CGS-2 loop (FOM products may be host ops).
    """
    X = jnp.asarray(X)
    n, m = X.shape
    if key is None:
        key = jax.random.key(seed)
    Om = _test_matrix(key, m, l, X.dtype)
    Y = jnp.matmul(X, Om, precision=_HI)
    orth = _orth_l2 if product is None else (
        lambda Z: gram_schmidt(Z, product=product)
    )
    weigh = (lambda Z: Z) if product is None else (
        lambda Z: jnp.asarray(product.op.apply(Z))
    )
    for _ in range(power_iters):
        Q = orth(Y)
        Z = jnp.matmul(X.conj().T, weigh(Q), precision=_HI)
        Y = jnp.matmul(X, Z, precision=_HI)
    return orth(Y)


def range_finder_adaptive(
    X,
    tol: float,
    key=None,
    block: int = 8,
    n_probes: int = 10,
    max_rank: Optional[int] = None,
    seed: int = 0,
) -> Tuple[jnp.ndarray, float]:
    """Adaptive randomized range finder (HMT Alg 4.2), l2 inner product.

    Grows Q block-by-block until the Gaussian-probe posterior bound
    ``10 sqrt(2/pi) * max_j ||(I - Q Q^H) X omega_j||`` (valid with
    probability ``1 - 10^{-n_probes}``) certifies
    ``||X - Q Q^H X||_2 <= tol``. Returns ``(Q, certified_bound)``.
    Host-controlled loop (data-dependent size), device matmuls — the MOR
    use is offline basis sizing, not a jitted hot path.
    """
    X = jnp.asarray(X)
    n, m = X.shape
    if key is None:
        key = jax.random.key(seed)
    max_rank = min(n, m) if max_rank is None else min(max_rank, min(n, m))
    factor = 10.0 * math.sqrt(2.0 / math.pi)
    kp, kb = jax.random.split(key)
    probes = jnp.matmul(X, _test_matrix(kp, m, n_probes, X.dtype),
                        precision=_HI)  # X omega_j, updated in place
    Q = jnp.zeros((n, 0), X.dtype)
    it = 0
    while True:
        bound = factor * float(
            jnp.max(jnp.linalg.norm(probes, axis=0))
        )
        if bound <= tol or Q.shape[1] >= max_rank:
            return Q, bound
        width = min(block, max_rank - Q.shape[1])
        Y = jnp.matmul(
            X, _test_matrix(jax.random.fold_in(kb, it), m, width, X.dtype),
            precision=_HI,
        )
        # project the new block (twice, CGS-2) against the current basis
        for _ in range(2):
            Y = Y - jnp.matmul(
                Q, jnp.matmul(Q.conj().T, Y, precision=_HI), precision=_HI
            )
        Qb = _orth_l2(Y)
        Q = jnp.concatenate([Q, Qb], axis=1)
        probes = probes - jnp.matmul(
            Qb, jnp.matmul(Qb.conj().T, probes, precision=_HI),
            precision=_HI,
        )
        it += 1


def rsvd(
    X,
    rank: int,
    oversample: int = 8,
    power_iters: int = 2,
    key=None,
    product: Optional[Product] = None,
    seed: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Randomized truncated SVD ``X ~= U diag(s) V^H`` (HMT Alg 5.1).

    ``U`` is (n, rank) with ``U^H R U = I`` (R = ``product``, l2 when
    None), ``s`` (rank,) non-negative descending, ``V`` (m, rank)
    l2-orthonormal. The small SVD runs on ``B = Q^H R X`` (no Gram
    squaring). With ``product=None`` and static shapes the call jits.
    """
    X = jnp.asarray(X)
    n, m = X.shape
    l = min(rank + oversample, min(n, m))
    Q = range_finder(X, l, key=key, power_iters=power_iters,
                     product=product, seed=seed)
    RX = X if product is None else jnp.asarray(product.op.apply(X))
    B = jnp.matmul(Q.conj().T, RX, precision=_HI)  # (l, m)
    W, s, Vh = jnp.linalg.svd(B, full_matrices=False)
    rank = min(rank, l)
    U = jnp.matmul(Q, W[:, :rank], precision=_HI)
    return U, s[:rank], Vh[:rank].conj().T


def pod_randomized(
    U,
    product: Optional[Product] = None,
    modes: Optional[int] = None,
    rtol: Optional[float] = 1e-12,
    oversample: int = 8,
    power_iters: int = 2,
    key=None,
    seed: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Randomized POD — same contract as
    :func:`rla4mor_tpu.core.orthonormalize.pod`: returns
    ``(modes (n, r), singular values (r,))`` with R-orthonormal modes.

    Use over the method of snapshots when the snapshot count m is large
    (the (m, m) host Gram eigh becomes the bottleneck) or in f32 (no Gram
    squaring: floor ~eps instead of ~sqrt(eps), hence the tighter 1e-12
    default ``rtol``). ``rtol=None`` (requires ``modes``) keeps exactly
    ``modes`` modes and the l2 path jits.
    """
    U = jnp.asarray(U)
    m = U.shape[1]
    target = m if modes is None else min(modes, m)
    Um, s, _ = rsvd(U, target, oversample=oversample,
                    power_iters=power_iters, key=key, product=product,
                    seed=seed)
    if rtol is None:
        assert modes is not None, "rtol=None (jittable) requires modes"
        return Um, s
    ref = s[0] if s.shape[0] else jnp.asarray(1.0, s.dtype)
    keep = int(jnp.sum(s > rtol * ref))
    if modes is not None:
        keep = min(keep, modes)
    return Um[:, :keep], s[:keep]
