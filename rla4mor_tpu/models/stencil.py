"""Matrix-free Q1 thermal-block operator (device, shardable).

The scipy-assembled FOM (models/thermal_block.py) covers oracle-scale
problems; this module is the pod-scale path (SURVEY §2.2, BASELINE config 5):
the affine stiffness terms are applied as 2-D stencils on the node grid —
pure shifted adds and multiplies, so XLA fuses them and, when the grid is
sharded over a ``jax.sharding.Mesh`` axis, inserts halo exchanges
automatically. Solves are matrix-free CG (core/solvers.py) instead of the
reference's SuperLU (utilities/factorization.py:115).

Node grid u has shape (N+1, N+1) with homogeneous Dirichlet boundary (the
boundary ring is masked, not eliminated, to keep shapes shard-friendly).
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rla4mor_tpu.core.solvers import cg

# Q1 element stiffness, local corner order [SW, SE, NW, NE] (see
# models/thermal_block.py; h-independent in 2D).
_K_EL = (1.0 / 6.0) * np.array(
    [
        [4.0, -1.0, -1.0, -2.0],
        [-1.0, 4.0, -2.0, -1.0],
        [-1.0, -2.0, 4.0, -1.0],
        [-2.0, -1.0, -1.0, 4.0],
    ]
)


def interior_mask(n_nodes: int, dtype=jnp.float32) -> jax.Array:
    m = jnp.zeros((n_nodes, n_nodes), dtype=dtype)
    return m.at[1:-1, 1:-1].set(1.0)


def block_masks(num_intervals: int, grid_shape: Tuple[int, int],
                dtype=jnp.float32) -> jax.Array:
    """(B, N, N) element masks for the diffusion blocks (x-fastest order,
    matching models/thermal_block.py)."""
    bx, by = grid_shape
    N = num_intervals
    ex = np.arange(N)
    ey = np.arange(N)
    bxi = ex * bx // N
    byi = ey * by // N
    blk = byi[:, None] * bx + bxi[None, :]  # (ey, ex)
    masks = np.stack([(blk == b).astype(np.float64) for b in range(bx * by)])
    return jnp.asarray(masks, dtype=dtype)


def block_index_map(num_intervals: int,
                    grid_shape: Tuple[int, int]) -> jax.Array:
    """(N, N) int32 block id per element, built from iota INSIDE the
    trace — the traced equivalent of :func:`block_masks`.

    At pod scale the stored masks were the killer: (4, 4096, 4096) f32
    = 268 MB of LITERALS baked into every jitted program that touched
    ``kappa`` — over the remote compile service's request limit (round-3
    capstone, HTTP 413). The iota form is a few elementwise int ops that
    XLA fuses into the consumer."""
    bx, by = grid_shape
    N = num_intervals
    ex = jax.lax.broadcasted_iota(jnp.int32, (N, N), 1)
    ey = jax.lax.broadcasted_iota(jnp.int32, (N, N), 0)
    return (ey * by // N) * bx + (ex * bx // N)


def mass_apply(u: jax.Array, h: float) -> jax.Array:
    """Consistent Q1 mass-matrix apply on the uniform grid, gather form.

    Element mass matrix (h^2/36) [[4,2,2,1],...] summed over the four
    elements around each node gives the 9-point kernel
    (h^2/36) [[1,4,1],[4,16,4],[1,4,1]] on interior nodes (every interior
    node touches 4 elements); Dirichlet ring zeroed like
    :func:`stencil_apply`. Validated against the scipy-assembled
    ``ThermalBlockFOM.l2_product`` (tests).
    """
    mask = interior_mask(u.shape[0], u.dtype)
    u = u * mask
    M = u.shape[0]
    up = jnp.pad(u, 1)
    w = ((1.0, 4.0, 1.0), (4.0, 16.0, 4.0), (1.0, 4.0, 1.0))
    out = sum(
        w[dy][dx] * up[dy:dy + M, dx:dx + M]
        for dy in range(3)
        for dx in range(3)
    )
    return out * (h * h / 36.0) * mask


def mass_diag(n_nodes: int, h: float, dtype=jnp.float32) -> jax.Array:
    """Diagonal of the consistent Q1 mass matrix: 16 h^2/36 on every
    interior node (all interior nodes touch 4 elements), 1 on the
    Dirichlet ring (identity filler for Jacobi division)."""
    mask = interior_mask(n_nodes, dtype)
    d = (16.0 * h * h / 36.0) * mask
    return jnp.where(d > 0, d, 1.0)


def _four_element_sum(kappa_el: jax.Array) -> jax.Array:
    """Per-node sum of the four adjacent elements' coefficients, in
    gather form (shifted views of the padded grid; see stencil_apply)."""
    kp = jnp.pad(kappa_el, 1)
    return kp[1:, 1:] + kp[1:, :-1] + kp[:-1, 1:] + kp[:-1, :-1]


def stiffness_diag_raw(kappa_el: jax.Array) -> jax.Array:
    """Raw diagonal of A(kappa): K[a,a] = 2/3 times the four adjacent
    elements' coefficient sum (zero on the Dirichlet ring). The single
    home of the Q1 diagonal formula (used by the Jacobi preconditioners
    here and in models/multigrid.py)."""
    return (2.0 / 3.0) * _four_element_sum(kappa_el)


def stencil_apply(u: jax.Array, kappa_el: jax.Array) -> jax.Array:
    """A(kappa) u for the Q1 Laplacian with per-element coefficient.

    u: (N+1, N+1) node grid (Dirichlet ring enforced on input and output);
    kappa_el: (N, N) element coefficients. Row index = y, column = x.

    Written in pure-GATHER form: out[y, x] sums the four surrounding
    elements' K-weighted corner combinations read from shifted views of
    the padded inputs. Everything is one fusible elementwise pass — no
    scatter-adds, whose buffer updates XLA cannot fuse (measured 2.05x:
    301 vs 147 GB/s effective at 4.2M nodes, the CG hot loop of the big-n
    path).
    """
    mask = interior_mask(u.shape[0], u.dtype)
    u = u * mask
    M = u.shape[0]
    up = jnp.pad(u, 1)            # (M+2, M+2)
    kp = jnp.pad(kappa_el, 1)     # (M+1, M+1)
    # python floats, not numpy f64 scalars: with x64 enabled a np.float64
    # scalar is strong-typed and would promote an f32 grid to f64
    K = _K_EL.tolist()
    # u 3x3 neighborhood views: uv[dy][dx] = u[y-1+dy, x-1+dx]
    uv = [[up[dy:dy + M, dx:dx + M] for dx in range(3)] for dy in range(3)]
    # the node (y, x) is corner a of the element whose kappa multiplies:
    #   a=0 (SW) of element (y, x)     -> kp[1:, 1:]
    #   a=1 (SE) of element (y, x-1)   -> kp[1:, :-1]
    #   a=2 (NW) of element (y-1, x)   -> kp[:-1, 1:]
    #   a=3 (NE) of element (y-1, x-1) -> kp[:-1, :-1]
    kels = (kp[1:, 1:], kp[1:, :-1], kp[:-1, 1:], kp[:-1, :-1])
    # that element's corner nodes in K's [SW, SE, NW, NE] order, as
    # (dy, dx) offsets into the 3x3 neighborhood views
    nodes = (
        ((1, 1), (1, 2), (2, 1), (2, 2)),
        ((1, 0), (1, 1), (2, 0), (2, 1)),
        ((0, 1), (0, 2), (1, 1), (1, 2)),
        ((0, 0), (0, 1), (1, 0), (1, 1)),
    )
    out = jnp.zeros_like(u)
    for a in range(4):
        s = sum(K[a][b] * uv[dy][dx] for b, (dy, dx) in enumerate(nodes[a]))
        out = out + kels[a] * s
    return out * mask


class StencilThermalBlock:
    """Matrix-free affine thermal block: A(mu) = sum_b mu_b A_b (stencils)."""

    is_spd = True

    def __init__(self, grid_shape=(2, 2), num_intervals=64, dtype=jnp.float32):
        self.grid_shape = grid_shape
        self.num_intervals = num_intervals
        self.dtype = dtype
        self.n_terms = grid_shape[0] * grid_shape[1]
        self.n_nodes = num_intervals + 1
        self.h = 1.0 / num_intervals
        self._masks = None

    @property
    def masks(self):
        """(B, N, N) element masks — LAZY host-side compat view. Traced
        code paths use :func:`block_index_map` instead so pod-scale
        programs never bake N^2-sized literals (see that docstring)."""
        if self._masks is None:
            self._masks = block_masks(
                self.num_intervals, self.grid_shape, self.dtype
            )
        return self._masks

    def _block_index(self) -> jax.Array:
        return block_index_map(self.num_intervals, self.grid_shape)

    @property
    def solution_shape(self):
        return (self.n_nodes, self.n_nodes)

    def kappa(self, mu, dtype=None) -> jax.Array:
        dt = self.dtype if dtype is None else dtype
        theta = jnp.asarray(mu["diffusion"], dtype=dt)
        blk = self._block_index()
        out = jnp.zeros(blk.shape, dt)
        for b in range(self.n_terms):  # select-sum: fuses, no literals
            out = out + jnp.where(blk == b, theta[b], 0).astype(dt)
        return out

    def theta_vector(self, mu) -> jax.Array:
        """Affine coefficient vector (the stencil-FOM protocol used by
        parallel/driver.py)."""
        return jnp.asarray(mu["diffusion"])

    def apply(self, mu, u: jax.Array) -> jax.Array:
        # kappa at u's dtype: an f64 input gets a genuine f64 apply (the
        # exact-score refinement path), f32 callers are unchanged
        return stencil_apply(u, self.kappa(mu, dtype=u.dtype))

    def apply_field(self, kappa_el: jax.Array, u: jax.Array) -> jax.Array:
        """A(kappa) u for an arbitrary per-element field (the generic
        backend InstationaryStencilFOM / EIM dispatch on; 3-D analog in
        stencil3d.py)."""
        return stencil_apply(u, kappa_el.astype(u.dtype))

    def apply_term(self, b: int, u: jax.Array) -> jax.Array:
        mask = (self._block_index() == b).astype(self.dtype)
        return stencil_apply(u, mask)

    def product_apply(self, u: jax.Array) -> jax.Array:
        """h1_0 product R = A(kappa=1)."""
        N = self.num_intervals
        return stencil_apply(u, jnp.ones((N, N), self.dtype))

    def term_box_bounds(self) -> list:
        """Rigorous ANALYTIC l2 spectral boxes of the affine terms
        (round-5, for `mor.scm_matfree.l2_interior_scm`): each term is a
        PSD masked Q1 stiffness with kappa in {0, 1}, so

            0 <= lambda <= 16/3:

        lower edge — PSD (sum of PSD element matrices); upper edge —
        element-level Rayleigh bound ``x^T A x = sum_e x_e^T K_e x_e <=
        lam_max(K_e) * 4 ||x||^2`` (each node lies in <= 4 elements;
        Q1 unit element stiffness eigenvalues {0, 2/3, 2/3, 4/3}), which
        coincides with the interior Gershgorin row bound 8/3 + 8/3.
        A looser box only enlarges the SCM LP's feasible set (the bound
        stays safe), and the LOWER edges are exact (masked terms are
        singular), so nothing is lost vs the eigensolved boxes — while
        skipping 2 * n_terms pod-scale eigensolves."""
        return [(0.0, 16.0 / 3.0)] * self.n_terms

    def rhs(self, dtype=None) -> jax.Array:
        """Load vector for f = 1 (interior nodes get h^2: four adjacent
        elements x h^2/4)."""
        dt = self.dtype if dtype is None else dtype
        load = jnp.full(self.solution_shape, self.h * self.h, dtype=dt)
        return load * interior_mask(self.n_nodes, dt)

    def jacobi_diag(self, mu) -> jax.Array:
        """Diagonal of A(mu) for Jacobi preconditioning: node n gets
        sum_{adjacent elements} kappa_e * K[a,a] with K[a,a] = 2/3."""
        d = stiffness_diag_raw(self.kappa(mu))
        return jnp.where(d > 0, d, 1.0)

    def solve_cg(self, mu, tol=1e-8, maxiter=2000, precond="jacobi"):
        """Matrix-free preconditioned CG solve (jittable).

        ``precond``: 'jacobi' (default) or 'mg' — a geometric V-cycle
        (models/multigrid.py), mesh-independent iteration counts; requires
        power-of-two num_intervals."""
        b = self.rhs()
        if precond == "mg":
            from rla4mor_tpu.models.multigrid import make_vcycle

            M = make_vcycle(self.kappa(mu))
        else:
            diag = self.jacobi_diag(mu)
            M = lambda r: r / diag  # noqa: E731
        res = cg(lambda u: self.apply(mu, u), b, precond=M, tol=tol,
                 maxiter=maxiter)
        return res.x

    def output(self, u) -> jax.Array:
        """Mean-value functional: integral of u (lumped) == sum * h^2."""
        return jnp.sum(u) * self.h * self.h

    # -- flattened-vector LinOp views (for the generic operator algebra) ----
    def term_linop(self, b: int) -> "StencilTermOp":
        return StencilTermOp(self, b)

    def product_linop(self) -> "StencilTermOp":
        return StencilTermOp(self, None)

    def affine_operator(self):
        """AffineOp over flattened interior-masked vectors (same coefficient
        structure as ThermalBlockFOM)."""
        from rla4mor_tpu.core.affine import AffineOp
        from rla4mor_tpu.core.parameters import ProjectionCoefficient

        return AffineOp(
            tuple(self.term_linop(b) for b in range(self.n_terms)),
            tuple(
                ProjectionCoefficient("diffusion", b)
                for b in range(self.n_terms)
            ),
        )


class FlatGridOp:
    """Base: a symmetric grid operator viewed as a LinOp on flattened
    vectors — jittable, shardable. Subclasses implement
    ``_grid_apply(grid) -> grid``. Rank-generic: pass ``n_nodes`` for
    the square (n, n) grid or ``grid_shape`` for any rank (the 3-D
    families use (M, M, M))."""

    def __init__(self, n_nodes: int = None, grid_shape=None):
        if (n_nodes is None) == (grid_shape is None):
            raise TypeError(
                "FlatGridOp: pass exactly one of n_nodes / grid_shape"
            )
        if grid_shape is None:
            grid_shape = (n_nodes, n_nodes)
        self.grid_shape = tuple(grid_shape)
        self.n_nodes = self.grid_shape[0]
        self.source_dim = self.range_dim = math.prod(self.grid_shape)

    def _grid_apply(self, grid):
        raise NotImplementedError

    def _apply_one(self, u_flat):
        return self._grid_apply(
            u_flat.reshape(self.grid_shape)
        ).reshape(-1)

    def apply(self, U, mu=None):
        U = jnp.asarray(U)
        if U.ndim == 1:
            return self._apply_one(U)
        return jax.vmap(self._apply_one, in_axes=1, out_axes=1)(U)

    # symmetric
    apply_adjoint = apply


class StencilTermOp(FlatGridOp):
    """LinOp view of one stencil term (or the kappa=1 product)."""

    def __init__(self, st: StencilThermalBlock, term):
        super().__init__(st.n_nodes)
        self.st = st
        self.term = term

    def _kappa(self):
        N = self.st.num_intervals
        if self.term is None:
            return jnp.ones((N, N), self.st.dtype)
        return (self.st._block_index() == self.term).astype(self.st.dtype)

    def _grid_apply(self, grid):
        return stencil_apply(grid, self._kappa())

    @property
    def H(self):
        return self
