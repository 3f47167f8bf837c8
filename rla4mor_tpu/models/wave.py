"""Second-order-in-time (wave) parametric models and their reduction.

    M u'' + A(mu) u = b(mu),   u(0) = u0, u'(0) = v0,

time-stepped by Newmark-beta (default beta = 1/4, gamma = 1/2: the
trapezoidal / average-acceleration scheme — implicit, unconditionally
stable, second order). Beyond-reference functionality (the reference is
stationary-only; the framework's parabolic stack is
models/instationary.py) extending the same TPU-first recipe to
hyperbolic problems:

* FOM trajectories: one host factorization of (M + beta dt^2 A(mu)) and
  nt back-substitutions (mirrors ``InstationaryFOM.solve``);
* ROM trajectories: dense reduced mass/stiffness, the WHOLE Newmark loop
  is a ``lax.scan`` — one jitted program per mu, vmappable over
  parameter batches;
* error estimation: the second-order residual at each step,
  r_k = M a_k + A(mu) u_k - b(mu), Riesz-lifted and SKETCHED with the
  stationary machinery (Theta R^-1 applied to the reduced-basis images
  once offline), accumulated as eta = sqrt(dt * sum_k ||.||^2) inside
  the same scan — an error INDICATOR (wave a-posteriori BOUNDS need
  energy arguments outside this module's scope).

``pod_greedy`` (models/instationary.py) drives this reductor unchanged:
the FOM/reductor/ROM trio implements the same protocol (solve ->
(n, nt+1) displacement trajectory, extend_basis, project_trajectory,
reduce, estimate_error).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sps
import scipy.sparse.linalg as spla

from rla4mor_tpu.core.affine import AffineDense, AffineOp
from rla4mor_tpu.core.linops import HostSparseOp
from rla4mor_tpu.core.parameters import Mu, ParameterSpace
from rla4mor_tpu.core.products import Product
from rla4mor_tpu.models.instationary import _materialize_rhs, _mm
from rla4mor_tpu.utils.logger import get_logger


class WaveFOM:
    """Newmark-beta wave FOM with affine A(mu), b(mu) and fixed M."""

    def __init__(
        self,
        operator: AffineOp,
        rhs: AffineOp,
        mass: HostSparseOp,
        T: float = 1.0,
        nt: int = 100,
        u0=None,
        v0=None,
        beta: float = 0.25,
        gamma: float = 0.5,
        output_functional=None,
        products=None,
        parameter_space: Optional[ParameterSpace] = None,
        name: str = "wave_fom",
    ):
        assert beta > 0 and 0.5 <= gamma <= 1.0, (beta, gamma)
        self.operator = operator
        self.rhs = rhs
        self.mass = mass
        self.T = float(T)
        self.nt = int(nt)
        self.dt = self.T / self.nt
        self.beta = float(beta)
        self.gamma = float(gamma)
        n = operator.source_dim
        self.solution_dim = n
        self.u0 = jnp.zeros(n) if u0 is None else jnp.asarray(u0)
        self.v0 = jnp.zeros(n) if v0 is None else jnp.asarray(v0)
        self.output_functional = output_functional
        self.products = products or {}
        self.parameter_space = parameter_space
        self.name = name
        self.logger = get_logger("models.wave", 20)
        self._lu_M = {}  # dtype -> cached SuperLU of the fixed mass

    # StationaryFOM-protocol assembly (mor.bounds consumes these)
    def _assemble_A(self, mu: Mu) -> sps.csc_matrix:
        from rla4mor_tpu.core.parameters import eval_coefficients

        theta = np.asarray(eval_coefficients(self.operator.coefficients, mu))
        out = None
        for t, term in enumerate(self.operator.terms):
            m = theta[t] * term.S
            out = m if out is None else out + m
        return out.tocsc()

    def assemble_sparse(self, mu: Mu) -> sps.csc_matrix:
        return self._assemble_A(mu)

    def assemble_rhs(self, mu: Mu) -> np.ndarray:
        if isinstance(self.rhs, AffineDense):
            return np.asarray(self.rhs.assemble_vec(mu))
        return np.asarray(self.rhs.assemble_dense(mu))[:, 0]

    def solve(self, mu: Mu, return_velocity: bool = False):
        """(n, nt+1) displacement trajectory (and optionally velocity).

        Newmark-beta: predictors
        u* = u + dt v + dt^2 (1/2 - beta) a,  v* = v + dt (1 - gamma) a;
        accelerations from (M + beta dt^2 A) a+ = b - A u*; correctors
        u+ = u* + beta dt^2 a+,  v+ = v* + gamma dt a+. ONE
        factorization per mu."""
        A = self._assemble_A(mu)
        M = sps.csc_matrix(self.mass.S)
        dt, beta, gamma = self.dt, self.beta, self.gamma
        b = np.asarray(self.assemble_rhs(mu))
        dtype = np.promote_types(np.promote_types(A.dtype, b.dtype),
                                 np.float64)
        b = b.astype(dtype)
        S = sps.csc_matrix(M + beta * dt * dt * A, dtype=dtype)
        lu = spla.splu(S)
        # M is mu-independent: factorize once per dtype, not per solve
        lu_M = self._lu_M.get(dtype)
        if lu_M is None:
            lu_M = self._lu_M[dtype] = spla.splu(
                sps.csc_matrix(M, dtype=dtype)
            )

        u = np.asarray(self.u0, dtype)
        v = np.asarray(self.v0, dtype)
        a = lu_M.solve(b - np.asarray(A @ u))  # consistent initial accel
        us, vs = [u], [v]
        for _ in range(self.nt):
            u_star = u + dt * v + dt * dt * (0.5 - beta) * a
            v_star = v + dt * (1.0 - gamma) * a
            a = lu.solve(b - np.asarray(A @ u_star))
            u = u_star + beta * dt * dt * a
            v = v_star + gamma * dt * a
            us.append(u)
            vs.append(v)
        traj = jnp.asarray(np.stack(us, axis=1))
        if return_velocity:
            return traj, jnp.asarray(np.stack(vs, axis=1))
        return traj

    def solve_many(self, mus) -> jax.Array:
        return jnp.stack([self.solve(mu) for mu in mus], axis=0)


class WaveROM:
    """Dense reduced Newmark model; trajectory + sketched space-time
    residual indicator in ONE jitted ``lax.scan`` (pytree, vmappable)."""

    def __init__(self, mass_r, lhs: AffineDense, rhs_r: AffineDense,
                 u0_r, v0_r, dt: float, nt: int, beta: float, gamma: float,
                 est_mass=None, est_lhs: Optional[AffineDense] = None,
                 est_rhs: Optional[AffineDense] = None,
                 output_functional: Optional[AffineDense] = None):
        self.mass_r = mass_r          # (r, r)
        self.lhs = lhs                # (T, r, r)
        self.rhs_r = rhs_r            # (Tb, r, 1)
        self.u0_r = u0_r
        self.v0_r = v0_r
        self.dt = float(dt)
        self.nt = int(nt)
        self.beta = float(beta)
        self.gamma = float(gamma)
        self.est_mass = est_mass      # (k, r)   Theta R^-1 M V
        self.est_lhs = est_lhs        # (T, k, r)
        self.est_rhs = est_rhs        # (Tb, k, 1)
        self.output_functional = output_functional

    def tree_flatten(self):
        return (self.mass_r, self.lhs, self.rhs_r, self.u0_r, self.v0_r,
                self.est_mass, self.est_lhs, self.est_rhs,
                self.output_functional), (
            self.dt, self.nt, self.beta, self.gamma)

    @classmethod
    def tree_unflatten(cls, aux, ch):
        obj = object.__new__(cls)
        (obj.mass_r, obj.lhs, obj.rhs_r, obj.u0_r, obj.v0_r, obj.est_mass,
         obj.est_lhs, obj.est_rhs, obj.output_functional) = ch
        obj.dt, obj.nt, obj.beta, obj.gamma = aux
        return obj

    @property
    def dim(self) -> int:
        return self.mass_r.shape[0]

    def solve(self, mu: Mu, return_estimate: bool = False):
        A = self.lhs.assemble(mu)
        b = self.rhs_r.assemble_vec(mu)
        dt, beta, gamma = self.dt, self.beta, self.gamma
        S = self.mass_r + beta * dt * dt * A
        S_lu = jax.scipy.linalg.lu_factor(S)
        M_lu = jax.scipy.linalg.lu_factor(self.mass_r)
        estimating = return_estimate and self.est_lhs is not None
        if estimating:
            sM = self.est_mass
            sA = self.est_lhs.assemble(mu)
            sb = self.est_rhs.assemble_vec(mu)

        u = self.u0_r.astype(S.dtype)
        v = self.v0_r.astype(S.dtype)
        a = jax.scipy.linalg.lu_solve(M_lu, b - _mm(A, u))

        def step(carry, _):
            u, v, a, acc = carry
            u_star = u + dt * v + dt * dt * (0.5 - beta) * a
            v_star = v + dt * (1.0 - gamma) * a
            a_new = jax.scipy.linalg.lu_solve(S_lu, b - _mm(A, u_star))
            u_new = u_star + beta * dt * dt * a_new
            v_new = v_star + gamma * dt * a_new
            if estimating:
                r = _mm(sM, a_new) + _mm(sA, u_new) - sb
                acc = acc + jnp.real(
                    jnp.sum(jnp.abs(r) ** 2)
                ).astype(acc.dtype)
            return (u_new, v_new, a_new, acc), u_new

        acc0 = jnp.asarray(0.0, jnp.real(u).dtype)
        (u, v, a, acc), traj = jax.lax.scan(
            step, (u, v, a, acc0), None, length=self.nt
        )
        traj = jnp.concatenate(
            [self.u0_r.astype(S.dtype)[None], traj], axis=0
        ).T  # (r, nt+1)
        if return_estimate:
            return traj, jnp.sqrt(dt * acc)
        return traj

    def estimate_error(self, mu: Mu) -> jax.Array:
        if self.est_lhs is None:
            raise ValueError(
                "this ROM was reduced without an embedding: the sketched "
                "space-time residual indicator is unavailable"
            )
        _, eta = self.solve(mu, return_estimate=True)
        return eta

    def output(self, U, mu: Mu) -> jax.Array:
        assert self.output_functional is not None
        return self.output_functional.apply(U, mu)


jax.tree_util.register_pytree_node(
    WaveROM, lambda x: x.tree_flatten(), WaveROM.tree_unflatten,
)


class WaveReductor:
    """Galerkin reduction of a WaveFOM (same protocol as
    ``InstationaryReductor`` — ``models.pod_greedy`` drives it
    unchanged)."""

    def __init__(self, fom: WaveFOM, embedding=None,
                 product: Optional[Product] = None, log_level: int = 20):
        self.fom = fom
        n = fom.solution_dim
        self.product = product if product is not None else Product.identity(n)
        self.embedding = embedding
        self.rb = jnp.zeros((n, 0))
        self.logger = get_logger("mor.wave", log_level)

    @property
    def basis_size(self) -> int:
        return self.rb.shape[1]

    def extend_basis(self, U) -> None:
        from rla4mor_tpu.core.orthonormalize import gram_schmidt

        U = jnp.asarray(U)
        if U.ndim == 1:
            U = U[:, None]
        rb = jnp.concatenate([self.rb.astype(U.dtype), U], axis=1)
        self.rb = gram_schmidt(rb, product=self.product,
                               offset=self.basis_size)

    def project_trajectory(self, traj) -> jax.Array:
        V = self.rb
        if V.shape[1] == 0:
            return jnp.asarray(traj)
        coeffs = V.conj().T @ jnp.asarray(self.product.op.apply(traj))
        return jnp.asarray(traj) - V @ coeffs

    def reduce(self, pad_to: Optional[int] = None) -> WaveROM:
        """Emit the reduced model (``pad_to`` fixes shapes for the
        no-retrace greedy; the dead block gets identity mass + zero
        couplings, so dead coords of u, v, a stay exactly zero)."""
        from rla4mor_tpu.models.instationary import (
            pad_time_system,
            project_time_system,
        )

        fom = self.fom
        V = self.rb
        r = V.shape[1]
        mass_r, lhs, rhs_r, est_mass, est_lhs, est_rhs = \
            project_time_system(fom, V, self.product, self.embedding)
        Rop = self.product.op
        u0_r = V.conj().T @ jnp.asarray(Rop.apply(fom.u0))
        v0_r = V.conj().T @ jnp.asarray(Rop.apply(fom.v0))

        out = None
        if fom.output_functional is not None:
            of = fom.output_functional
            if isinstance(of, AffineDense):
                out = AffineDense(
                    jnp.einsum("tqn,nr->tqr", of.stack, V),
                    of.coefficients,
                )

        if pad_to is not None:
            mass_r, lhs, rhs_r, est_mass, est_lhs, est_rhs = \
                pad_time_system(pad_to, r, mass_r, lhs, rhs_r,
                                est_mass, est_lhs, est_rhs)
            p = int(pad_to) - r
            u0_r = jnp.pad(u0_r, (0, p))
            v0_r = jnp.pad(v0_r, (0, p))
            if out is not None:
                out = AffineDense(
                    jnp.pad(out.stack, ((0, 0), (0, 0), (0, p))),
                    out.coefficients,
                )

        return WaveROM(
            mass_r, lhs, rhs_r, u0_r, v0_r, fom.dt, fom.nt, fom.beta,
            fom.gamma, est_mass=est_mass, est_lhs=est_lhs,
            est_rhs=est_rhs, output_functional=out,
        )

    def reconstruct(self, traj_r) -> jax.Array:
        r = self.basis_size
        return self.rb @ jnp.asarray(traj_r)[:r]


def wave_thermal_block(
    grid_shape=(2, 2),
    num_intervals: int = 16,
    T: float = 1.0,
    nt: int = 100,
    parameter_range=(0.1, 1.0),
    u0_bump: bool = True,
) -> WaveFOM:
    """Wave equation on the thermal-block geometry: L2 mass + the
    block-wise affine stiffness as the wave operator (parametric wave
    speeds per block), f = 0, and a smooth displacement bump as u0 (zero
    initial velocity) — a standing-wave benchmark whose solution manifold
    is genuinely parameter-dependent."""
    from rla4mor_tpu.models.thermal_block import ThermalBlockFOM

    st = ThermalBlockFOM(grid_shape, num_intervals, parameter_range)
    n = st.solution_dim
    if u0_bump:
        nx = num_intervals
        x = (np.arange(1, nx) / nx)
        X, Y = np.meshgrid(x, x, indexing="xy")
        u0 = np.sin(np.pi * X) * np.sin(np.pi * Y)
        u0 = jnp.asarray(u0.reshape(-1))
        assert u0.shape == (n,)
    else:
        u0 = None
    zero_rhs = AffineDense(jnp.zeros((1, n, 1)), (0.0,))
    return WaveFOM(
        operator=st.operator,
        rhs=zero_rhs,
        mass=st.l2_product.op,
        T=T,
        nt=nt,
        u0=u0,
        output_functional=st.output_functional,
        products=st.products,
        parameter_space=st.parameter_space,
        name=f"wave_thermal_block_n{num_intervals}",
    )
