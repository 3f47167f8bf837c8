"""Matrix-free 3-D Q1 thermal block (pod-scale; trilinear hexahedral
elements).

Third dimension for the big-n path: in practice 1e7+ DoF comes from 3-D
meshes (256^3 = 16.7M nodes), so the pod-scale stencil family
(models/stencil.py, SURVEY §2.2 / BASELINE config 5) gets a 3-D member.
Same design: the affine stiffness terms are applied as fused gather-form
3-D stencils (8 corner contributions x 8 element nodes over shifted
views of the padded grids — one fusible elementwise pass, no
scatter-adds), so the operator jits, shards over a DoF mesh axis
(GSPMD halo exchanges on the leading grid axis), and solves by
matrix-free CG. Node grids are (N+1, N+1, N+1) with the Dirichlet shell
masked; index order (z, y, x), x fastest.

The element stiffness is computed by exact 2x2x2 Gauss quadrature of
the trilinear basis gradients over the unit cube, scaled by h (in 3-D
K_el = h * K_hat; the 2-D analog is h-independent)."""

from __future__ import annotations

from functools import lru_cache
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rla4mor_tpu.core.parameters import ParameterSpace
from rla4mor_tpu.core.solvers import cg
from rla4mor_tpu.models.stencil import FlatGridOp


@lru_cache(maxsize=1)
def k_el_3d() -> tuple:
    """8x8 unit-cube trilinear element stiffness K_hat (h factor NOT
    included), corner order c = 4*cz + 2*cy + cx (x fastest). Exact:
    the integrand is quadratic per axis, so 2-point Gauss is exact.
    Returned as nested python-float tuples (weak-typed under jit)."""
    g = np.array([0.5 - 0.5 / np.sqrt(3.0), 0.5 + 0.5 / np.sqrt(3.0)])

    def shape(c, x, y, z):
        cz, cy, cx = (c >> 2) & 1, (c >> 1) & 1, c & 1
        fx = x if cx else 1 - x
        fy = y if cy else 1 - y
        fz = z if cz else 1 - z
        dfx = 1.0 if cx else -1.0
        dfy = 1.0 if cy else -1.0
        dfz = 1.0 if cz else -1.0
        val_grad = np.array([dfx * fy * fz, fx * dfy * fz, fx * fy * dfz])
        return val_grad

    K = np.zeros((8, 8))
    for x in g:
        for y in g:
            for z in g:
                G = np.stack([shape(c, x, y, z) for c in range(8)])
                K += (G @ G.T) / 8.0  # 8 Gauss points, weight 1/8 each
    return tuple(tuple(float(v) for v in row) for row in K)


def interior_mask3(n_nodes: int, dtype=jnp.float32) -> jax.Array:
    m = jnp.zeros((n_nodes,) * 3, dtype=dtype)
    return m.at[1:-1, 1:-1, 1:-1].set(1.0)


def lumped_mass3_apply(u: jax.Array, h: float) -> jax.Array:
    """Lumped Q1 mass: h^3 per interior node (8 adjacent elements x
    h^3/8), Dirichlet shell masked. One formula, one site — shared by
    the 3-D thermal block and the 3-D non-affine family (the parabolic
    ``mass_apply_grid`` hook; lumping is the standard 3-D
    simplification, a convergent scheme of the same order as the
    consistent mass the 2-D path uses)."""
    return (h ** 3) * u * interior_mask3(u.shape[0], u.dtype)


def lumped_mass3_diag(n_nodes: int, h: float, dtype) -> jax.Array:
    """Diagonal of the lumped Q1 mass on the FULL node grid (boundary
    entries included: only the Jacobi preconditioner consumes this, and
    a nonzero shell diagonal is harmless there — CG never leaves the
    interior subspace)."""
    return jnp.full((n_nodes,) * 3, h ** 3, dtype)


def block_index_map3(num_intervals: int,
                     grid_shape: Tuple[int, int, int]) -> jax.Array:
    """(N, N, N) int32 block id per element from iota inside the trace
    (the 3-D analog of stencil.block_index_map; stored masks at 256^3
    would be GBs of HLO literals)."""
    bx, by, bz = grid_shape
    N = num_intervals
    ex = jax.lax.broadcasted_iota(jnp.int32, (N,) * 3, 2)
    ey = jax.lax.broadcasted_iota(jnp.int32, (N,) * 3, 1)
    ez = jax.lax.broadcasted_iota(jnp.int32, (N,) * 3, 0)
    return ((ez * bz // N) * by + (ey * by // N)) * bx + (ex * bx // N)


def stencil3d_apply(u: jax.Array, kappa_el: jax.Array,
                    h: float) -> jax.Array:
    """A(kappa) u for the 3-D Q1 Laplacian with per-element coefficient,
    pure gather form. u: (M, M, M) node grid (M = N+1, Dirichlet shell
    enforced on input and output); kappa_el: (N, N, N)."""
    mask = interior_mask3(u.shape[0], u.dtype)
    u = u * mask
    M = u.shape[0]
    up = jnp.pad(u, 1)        # (M+2)^3
    kp = jnp.pad(kappa_el, 1)  # (M+1)^3
    K = k_el_3d()
    uv = [[[up[dz:dz + M, dy:dy + M, dx:dx + M]
            for dx in range(3)] for dy in range(3)] for dz in range(3)]
    out = jnp.zeros_like(u)
    for a in range(8):
        az, ay, ax = (a >> 2) & 1, (a >> 1) & 1, a & 1
        # the element for which node (z,y,x) is corner a
        kel = kp[1 - az:1 - az + M, 1 - ay:1 - ay + M, 1 - ax:1 - ax + M]
        s = None
        for b in range(8):
            bz, by, bx = (b >> 2) & 1, (b >> 1) & 1, b & 1
            term = K[a][b] * uv[1 - az + bz][1 - ay + by][1 - ax + bx]
            s = term if s is None else s + term
        out = out + kel * s
    return out * (h * mask)


def _eight_element_sum(kappa_el: jax.Array) -> jax.Array:
    kp = jnp.pad(kappa_el, 1)
    M = kappa_el.shape[0] + 1
    return sum(
        kp[1 - az:1 - az + M, 1 - ay:1 - ay + M, 1 - ax:1 - ax + M]
        for az in (0, 1) for ay in (0, 1) for ax in (0, 1)
    )


def stiffness3d_diag_raw(kappa_el: jax.Array, h: float) -> jax.Array:
    """Diagonal of A(kappa) on the node grid: each node's 8 adjacent
    elements weighted by the (all-equal) corner self-coefficient. Shared
    by the thermal block's jacobi_diag and the non-affine families'
    diag_field (one formula, one site)."""
    kdiag = k_el_3d()[0][0]  # all equal by symmetry
    return h * kdiag * _eight_element_sum(kappa_el)


class StencilThermalBlock3D:
    """Matrix-free 3-D affine thermal block:
    A(mu) = sum_b mu_b A_b over a (bx, by, bz) octant partition."""

    is_spd = True

    def __init__(self, grid_shape=(2, 2, 2), num_intervals=32,
                 dtype=jnp.float32):
        self.grid_shape = grid_shape
        self.num_intervals = num_intervals
        self.dtype = dtype
        self.n_terms = int(np.prod(grid_shape))
        self.n_nodes = num_intervals + 1
        self.h = 1.0 / num_intervals

    @property
    def solution_shape(self):
        return (self.n_nodes,) * 3

    @property
    def n_dof(self) -> int:
        return self.n_nodes ** 3

    def theta_vector(self, mu) -> jax.Array:
        return jnp.asarray(mu["diffusion"])

    def term_box_bounds(self) -> list:
        """Rigorous analytic l2 boxes of the octant terms (for
        `l2_interior_scm`; 2-D derivation:
        StencilThermalBlock.term_box_bounds): PSD masked stiffness, and
        ``x^T A x = h sum_e x_e^T K_hat x_e <= 8 h lam_max(K_hat)
        ||x||^2`` — each node lies in <= 8 elements; ``lam_max(K_hat)``
        from the exact 8x8 trilinear element stiffness (k_el_3d, exact
        quadrature) with a 1e-12 float safety pad."""
        lam = float(np.linalg.eigvalsh(np.asarray(k_el_3d()))[-1])
        hi = 8.0 * self.h * lam * (1.0 + 1e-12)
        return [(0.0, hi)] * self.n_terms

    def _block_index(self) -> jax.Array:
        return block_index_map3(self.num_intervals, self.grid_shape)

    def _kappa(self, mu, dtype=None) -> jax.Array:
        dt = self.dtype if dtype is None else dtype
        theta = jnp.asarray(mu["diffusion"], dtype=dt)
        blk = self._block_index()
        out = jnp.zeros(blk.shape, dt)
        for b in range(self.n_terms):
            out = out + jnp.where(blk == b, theta[b], 0).astype(dt)
        return out

    def kappa(self, mu, dtype=None) -> jax.Array:
        """Public per-element coefficient field (the stencil-FOM
        protocol name the parabolic backend dispatches on)."""
        return self._kappa(mu, dtype=dtype)

    def apply(self, mu, u: jax.Array) -> jax.Array:
        return stencil3d_apply(u, self._kappa(mu, dtype=u.dtype), self.h)

    def apply_term(self, b: int, u: jax.Array) -> jax.Array:
        mask = (self._block_index() == b).astype(u.dtype)
        return stencil3d_apply(u, mask, self.h)

    def product_apply(self, u: jax.Array) -> jax.Array:
        N = self.num_intervals
        return stencil3d_apply(u, jnp.ones((N,) * 3, u.dtype), self.h)

    def rhs(self, dtype=None) -> jax.Array:
        """Lumped load for f = 1: interior nodes get h^3 (8 adjacent
        elements x h^3/8)."""
        dt = self.dtype if dtype is None else dtype
        load = jnp.full(self.solution_shape, self.h ** 3, dtype=dt)
        return load * interior_mask3(self.n_nodes, dt)

    def jacobi_diag(self, mu) -> jax.Array:
        d = stiffness3d_diag_raw(self._kappa(mu), self.h)
        return jnp.where(d > 0, d, 1.0)

    def solve_cg(self, mu, tol=1e-8, maxiter=2000):
        b = self.rhs()
        diag = self.jacobi_diag(mu)
        res = cg(lambda u: self.apply(mu, u), b,
                 precond=lambda r: r / diag, tol=tol, maxiter=maxiter)
        return res.x

    def output(self, u) -> jax.Array:
        """Mean-value functional (lumped integral)."""
        return jnp.sum(u) * self.h ** 3

    # parabolic hooks InstationaryStencilFOM dispatches on
    def mass_apply_grid(self, u: jax.Array) -> jax.Array:
        return lumped_mass3_apply(u, self.h)

    def mass_diag_grid(self) -> jax.Array:
        return lumped_mass3_diag(self.n_nodes, self.h, self.dtype)

    def apply_field(self, kappa_el: jax.Array, u: jax.Array) -> jax.Array:
        """A(kappa) u for an arbitrary per-element field (the generic
        backend InstationaryStencilFOM/EIM dispatch on)."""
        return stencil3d_apply(u, kappa_el.astype(u.dtype), self.h)

    def term_linop(self, b: int) -> "Stencil3DTermOp":
        return Stencil3DTermOp(self, b)

    def affine_operator(self):
        """AffineOp over flattened vectors (same coefficient structure
        as the 2-D thermal block, stencil.py:267) — feeds the parabolic
        reductor view in 3-D."""
        from rla4mor_tpu.core.affine import AffineOp
        from rla4mor_tpu.core.parameters import ProjectionCoefficient

        return AffineOp(
            tuple(self.term_linop(b) for b in range(self.n_terms)),
            tuple(
                ProjectionCoefficient("diffusion", b)
                for b in range(self.n_terms)
            ),
        )

    def sample_parameters(self, count: int, key=0):
        space = ParameterSpace.make({"diffusion": self.n_terms}, 0.1, 1.0)
        return space.sample_randomly(count, key=key)


class Stencil3DTermOp(FlatGridOp):
    """LinOp view of one 3-D stencil term on flattened vectors (the 3-D
    analog of ``StencilTermOp`` in stencil.py; rank-generic base)."""

    def __init__(self, st: StencilThermalBlock3D, term):
        super().__init__(grid_shape=st.solution_shape)
        self.st = st
        self.term = term

    def _kappa(self):
        N = self.st.num_intervals
        if self.term is None:
            return jnp.ones((N,) * 3, self.st.dtype)
        return (self.st._block_index() == self.term).astype(self.st.dtype)

    def _grid_apply(self, grid):
        return stencil3d_apply(grid, self._kappa(), self.st.h)

    @property
    def H(self):
        return self
