"""Advection-diffusion model problem (nonsymmetric affine FOM).

Second model family beyond the thermal block: on the unit square,

    -eps div(grad u) + b(mu) . grad u = 1,    u = 0 on the boundary,

with constant velocity b(mu) = (mu_bx, mu_by) and parametric diffusion
eps = mu_eps. The operator is affine with three terms (diffusion stiffness,
x-advection, y-advection) and is NONSYMMETRIC — the natural exercise for
the sketched minimal-residual projection (sketched Galerkin has no
best-approximation guarantee here), which the reference supports but never
instantiates on a model (its only FOM is the symmetric thermal block).

Q1 elements on a uniform grid; advection by central differences on the
node grid (row-summed to zero, boundary rows eliminated).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np
import scipy.sparse as sps

from rla4mor_tpu.core.affine import AffineDense, AffineOp
from rla4mor_tpu.core.linops import DenseOp, HostSparseOp
from rla4mor_tpu.core.parameters import ONE, ParameterSpace, ProjectionCoefficient
from rla4mor_tpu.core.products import Product
from rla4mor_tpu.models.stationary import StationaryFOM
from rla4mor_tpu.models.thermal_block import _K_EL, _M_EL, _assemble, _element_nodes


class AdvectionDiffusionFOM(StationaryFOM):
    """mu = {'eps': (1,), 'velocity': (2,)}; A(mu) = eps K + bx Cx + by Cy."""

    def __init__(
        self,
        num_intervals: int = 32,
        eps_range: Tuple[float, float] = (0.05, 1.0),
        velocity_range: Tuple[float, float] = (-1.0, 1.0),
    ):
        nx = num_intervals
        n_nodes = (nx + 1) ** 2
        el_nodes = _element_nodes(nx)
        h = 1.0 / nx

        ix, iy = np.meshgrid(np.arange(nx + 1), np.arange(nx + 1), indexing="xy")
        interior = (
            (ix.ravel() > 0) & (ix.ravel() < nx) & (iy.ravel() > 0) & (iy.ravel() < nx)
        )
        self.interior = np.where(interior)[0]
        n = self.interior.size
        restrict = sps.coo_matrix(
            (np.ones(n), (np.arange(n), self.interior)), shape=(n, n_nodes)
        ).tocsr()

        # diffusion stiffness
        K = restrict @ _assemble(el_nodes, _K_EL, n_nodes) @ restrict.T

        # central-difference advection with mass lumping: (C u)_i =
        # h^2 * (u_{i+1} - u_{i-1}) / (2h) on the lumped node quadrature
        def advection(axis: int) -> sps.csr_matrix:
            stride = 1 if axis == 0 else nx + 1
            rows, cols, vals = [], [], []
            node = np.arange(n_nodes)
            xi = node % (nx + 1) if axis == 0 else node // (nx + 1)
            ok = (xi > 0) & (xi < nx)
            w = h * h / (2.0 * h)  # lumped volume x central difference
            rows.extend(node[ok]); cols.extend(node[ok] + stride)
            vals.extend([w] * int(ok.sum()))
            rows.extend(node[ok]); cols.extend(node[ok] - stride)
            vals.extend([-w] * int(ok.sum()))
            C = sps.coo_matrix((vals, (rows, cols)), shape=(n_nodes, n_nodes))
            return (restrict @ C.tocsr() @ restrict.T).tocsr()

        Cx, Cy = advection(0), advection(1)

        operator = AffineOp(
            (HostSparseOp(K), HostSparseOp(Cx), HostSparseOp(Cy)),
            (
                ProjectionCoefficient("eps", 0),
                ProjectionCoefficient("velocity", 0),
                ProjectionCoefficient("velocity", 1),
            ),
        )

        load = np.zeros(n_nodes)
        np.add.at(load, el_nodes.ravel(), h * h / 4.0)
        rhs_vec = load[self.interior]
        rhs = AffineOp((DenseOp(rhs_vec.reshape(-1, 1)),), (ONE,))

        M_full = _assemble(el_nodes, h * h * _M_EL, n_nodes)
        products = {
            "h1_0": Product.from_sparse(K.tocsc()),
            "l2": Product.from_sparse((restrict @ M_full @ restrict.T).tocsc()),
        }
        out = AffineDense(jnp.asarray(rhs_vec).reshape(1, 1, -1), (ONE,))

        space = ParameterSpace.make({"eps": 1, "velocity": 2})
        # box bounds differ per name; store them for sampling
        self._eps_range = eps_range
        self._velocity_range = velocity_range
        super().__init__(
            operator, rhs, output_functional=out, products=products,
            parameter_space=space, name=f"advection_diffusion_n{nx}",
        )
        self.num_intervals = nx

    @property
    def h1_0_product(self) -> Product:
        return self.products["h1_0"]

    def sample_parameters(self, count: int, key=0):
        """Samples honoring the per-name ranges (eps > 0)."""
        import jax

        if isinstance(key, int):
            key = jax.random.key(key)
        out = []
        for i in range(count):
            k = jax.random.fold_in(key, i)
            k1, k2 = jax.random.split(k)
            out.append({
                "eps": jax.random.uniform(
                    k1, (1,), minval=self._eps_range[0],
                    maxval=self._eps_range[1],
                ),
                "velocity": jax.random.uniform(
                    k2, (2,), minval=self._velocity_range[0],
                    maxval=self._velocity_range[1],
                ),
            })
        return out
