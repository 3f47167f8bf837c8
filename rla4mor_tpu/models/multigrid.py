"""Geometric multigrid preconditioner for the stencil thermal block.

The missing piece of SURVEY §7 hard part 2 at pod scale: plain Jacobi-CG
needs O(sqrt(kappa)) ~ thousands of iterations on a multi-million-DoF
Laplacian (kappa ~ h^-2). A V-cycle with rediscretized coefficients,
damped-Jacobi smoothing, full-weighting restriction and bilinear
prolongation is mesh-independent: CG preconditioned with one V-cycle
converges in tens of iterations.

Everything is static-shape per level (node grids (2^l + 1)^2), so the
whole cycle jits, vmaps, and shards like the stencil itself (shifted adds;
XLA inserts halo exchanges for sharded grids).
"""

from __future__ import annotations

from functools import lru_cache
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from rla4mor_tpu.models.stencil import interior_mask, stencil_apply

# Grid transfers run as SEPARABLE DENSE MXU CONTRACTIONS (R f R^T and
# P e P^T with banded constant 1-D matrices), not as strided slices or
# strided scatters: stride-2 minor-axis access is a physical re-tile on
# TPU and measured 10.4 ms (restrict) / 22.3 ms (prolong) at 2049^2 vs
# 0.78 / 0.77 ms for the matmul form (benchmarks; 13-29x). HIGHEST
# precision keeps P = 2 R^T exact so the V-cycle stays a symmetric
# preconditioner; the matrices' entries (1, 1/2, 1/4) are exact in bf16
# anyway, so only the data would be truncated at default precision.


# The banded 1-D transfer matrices are built from IOTA inside the trace
# (a few fused elementwise ops), NOT as baked numpy literals: at 4097^2
# the dense (nf, nc) constants were ~34 MB per level per direction,
# which (together with the stencil masks) pushed pod-scale programs over
# the remote compile service's request limit (round-3 capstone fix).
# Both bands are |f - 2c| hat functions: R = max(0, 1/2 - |f-2c|/4),
# P = max(0, 1 - |f-2c|/2) — identical entries to the old literals.


@lru_cache(maxsize=32)
def _restrict_1d_np(n_fine: int, dtype_name: str) -> np.ndarray:
    """(nc, nf) full-weighting rows: [1/4, 1/2, 1/4] at stride 2
    (numpy oracle for tests; traced code uses :func:`_restrict_1d`)."""
    nc = (n_fine - 1) // 2 + 1
    R = np.zeros((nc, n_fine), np.dtype(dtype_name))
    for off, w in ((-1, 0.25), (0, 0.5), (1, 0.25)):
        i = np.arange(nc)
        j = 2 * i + off
        ok = (j >= 0) & (j < n_fine)
        R[i[ok], j[ok]] = w
    return R


@lru_cache(maxsize=32)
def _prolong_1d_np(n_fine: int, dtype_name: str) -> np.ndarray:
    """(nf, nc) bilinear columns: even rows copy, odd rows average
    (numpy oracle for tests; traced code uses :func:`_prolong_1d`)."""
    nc = (n_fine - 1) // 2 + 1
    P = np.zeros((n_fine, nc), np.dtype(dtype_name))
    i = np.arange(nc)
    P[2 * i, i] = 1.0
    odd = 2 * i + 1 < n_fine
    P[2 * i[odd] + 1, i[odd]] = 0.5
    right = odd & (i + 1 < nc)
    P[2 * i[right] + 1, i[right] + 1] = 0.5
    return P


def _restrict_1d(n_fine: int, dtype) -> jax.Array:
    nc = (n_fine - 1) // 2 + 1
    f = jax.lax.broadcasted_iota(jnp.int32, (nc, n_fine), 1)
    c = jax.lax.broadcasted_iota(jnp.int32, (nc, n_fine), 0)
    d = jnp.abs(f - 2 * c).astype(dtype)
    return jnp.maximum(jnp.asarray(0, dtype), 0.5 - 0.25 * d).astype(dtype)


def _prolong_1d(n_fine: int, dtype) -> jax.Array:
    nc = (n_fine - 1) // 2 + 1
    f = jax.lax.broadcasted_iota(jnp.int32, (n_fine, nc), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (n_fine, nc), 1)
    d = jnp.abs(f - 2 * c).astype(dtype)
    return jnp.maximum(jnp.asarray(0, dtype), 1.0 - 0.5 * d).astype(dtype)


def coarsen_kappa(kappa: jax.Array) -> jax.Array:
    """(N, N) element coefficients -> (N/2, N/2) by 2x2 averaging."""
    N = kappa.shape[0]
    return kappa.reshape(N // 2, 2, N // 2, 2).mean(axis=(1, 3))


def restrict_full_weighting(r: jax.Array) -> jax.Array:
    """Node-grid full-weighting: coarse nodes = even fine nodes, 9-point
    [1/4, 1/2, 1/4] (x) [1/4, 1/2, 1/4] stencil. r: (N+1, N+1), N even."""
    R = _restrict_1d(r.shape[0], r.dtype)
    coarse = jnp.einsum(
        "cf,fg,dg->cd", R, r, R, precision=jax.lax.Precision.HIGHEST
    )
    return coarse * interior_mask(coarse.shape[0], r.dtype)


def prolong_bilinear(e: jax.Array, n_fine: int) -> jax.Array:
    """Bilinear interpolation from ((N/2)+1)^2 coarse nodes to (N+1)^2."""
    P = _prolong_1d(n_fine, e.dtype)
    out = jnp.einsum(
        "fc,cd,gd->fg", P, e, P, precision=jax.lax.Precision.HIGHEST
    )
    return out * interior_mask(n_fine, e.dtype)


def _jacobi_diag(kappa: jax.Array, dtype) -> jax.Array:
    from rla4mor_tpu.models.stencil import stiffness_diag_raw

    d = stiffness_diag_raw(kappa).astype(dtype)
    return jnp.where(d > 0, d, 1.0)


def make_vcycle(
    kappa: jax.Array,
    n_levels: int | None = None,
    nu_pre: int = 2,
    nu_post: int = 2,
    omega: float = 0.8,
    nu_coarse: int = 40,
    mass_dt: float | None = None,
):
    """Build ``vcycle(b) -> approximate B^-1 b``.

    ``mass_dt=None``: B = A = stencil(kappa) (elliptic solves).
    ``mass_dt=dt``:   B = M + dt A with M the consistent Q1 mass on each
    level's own grid (rediscretized geometrically) — the implicit-Euler
    system of the device-native parabolic FOM
    (models/instationary_stencil.py).

    ``kappa``: (N, N) element coefficients, N a power of two. Levels coarsen
    down to 8x8 elements (or ``n_levels``). The returned closure is a fixed
    linear operation (static iteration counts) — a valid CG preconditioner.
    """
    from rla4mor_tpu.models.stencil import (
        interior_mask,
        mass_apply,
        stiffness_diag_raw,
    )

    N = kappa.shape[0]
    assert N & (N - 1) == 0, "multigrid needs power-of-two element counts"
    kappas: List[jax.Array] = [kappa]
    while kappas[-1].shape[0] > 8 and (
        n_levels is None or len(kappas) < n_levels
    ):
        kappas.append(coarsen_kappa(kappas[-1]))
    hs = [1.0 / k.shape[0] for k in kappas]
    if mass_dt is None:
        diags = [_jacobi_diag(k, kappa.dtype) for k in kappas]

        def op(level, u):
            return stencil_apply(u, kappas[level])

    else:
        dt = float(mass_dt)
        diags = []
        for k, h in zip(kappas, hs):
            dA = stiffness_diag_raw(k).astype(kappa.dtype)
            dM = (16.0 * h * h / 36.0) * interior_mask(
                k.shape[0] + 1, kappa.dtype
            )
            d = dM + dt * dA
            diags.append(jnp.where(d > 0, d, 1.0))

        def op(level, u):
            return mass_apply(u, hs[level]) + dt * stencil_apply(
                u, kappas[level]
            )

    def smooth(level, u, b, steps):
        dia = diags[level]
        for _ in range(steps):
            r = b - op(level, u)
            u = u + omega * r / dia
        return u

    def cycle(level, b):
        u = smooth(level, jnp.zeros_like(b), b, nu_pre)
        if level == len(kappas) - 1:
            return smooth(level, u, b, nu_coarse)
        r = b - op(level, u)
        e_c = cycle(level + 1, restrict_full_weighting(r))
        u = u + prolong_bilinear(e_c, b.shape[0])
        return smooth(level, u, b, nu_post)

    def vcycle(b):
        return cycle(0, b)

    return vcycle
