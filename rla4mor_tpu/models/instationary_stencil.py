"""Device-native big-n parabolic FOM: matrix-free implicit Euler.

``InstationaryFOM`` (models/instationary.py) time-steps with ONE host
SuperLU factorization per mu — right for moderate n, impossible at the
4M-DoF scale of the stencil world.  Here the whole trajectory is one
jitted ``lax.scan``: each implicit-Euler step solves

    (M + dt A(mu)) u_{k+1} = M u_k + dt b

by preconditioned CG on the matrix-free stencil operators — warm-started
at ``u_k`` (consecutive steps differ by O(dt), so after the first step CG
converges in a few iterations), with either the Jacobi diagonal of
``M + dt A`` or the mass-shifted geometric V-cycle
(models/multigrid.py ``make_vcycle(mass_dt=dt)``) as the preconditioner.

The FOM is beyond-reference scope (the reference is stationary-only and
host-bound); it closes the gap between the big-n stationary path
(models/stencil.py + CG/MG) and the parabolic MOR layer.  Trajectories
equal the host-LU ``InstationaryFOM`` on the same mesh to CG tolerance
(tested via the interior-index mapping).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from rla4mor_tpu.core.parameters import ParameterSpace
from rla4mor_tpu.models.stencil import (
    FlatGridOp,
    StencilThermalBlock,
    mass_apply,
    mass_diag,
    stencil_apply,
)


class InstationaryStencilFOM:
    """Implicit-Euler heat equation over a :class:`StencilThermalBlock`.

    State lives on the (N+1, N+1) node grid (Dirichlet ring zero); the
    diffusion blocks parameterize A(mu) exactly like the stationary
    stencil FOM; f = 1, u0 = 0 (matching ``instationary_thermal_block``).
    """

    def __init__(
        self,
        stencil: StencilThermalBlock,
        T: float = 1.0,
        nt: int = 50,
        u0: Optional[jax.Array] = None,
        parameter_range=(0.1, 1.0),
        time_theta: float = 1.0,
    ):
        assert 0.0 < time_theta <= 1.0, time_theta
        self.time_theta = float(time_theta)
        self.stencil = stencil
        self.T = float(T)
        self.nt = int(nt)
        self.dt = self.T / self.nt
        self.h = stencil.h
        shape = stencil.solution_shape
        self.u0 = jnp.zeros(shape, stencil.dtype) if u0 is None else u0
        # any stencil-protocol FOM with kappa/rhs/jacobi_diag works (e.g.
        # the EIM-affine non-affine surrogate); it may bring its own
        # parameter space — the thermal block builds the per-block one
        ps = getattr(stencil, "parameter_space", None)
        if ps is None:
            assert hasattr(stencil, "grid_shape"), (
                "stencil-protocol FOM must provide a parameter_space "
                "(non-thermal-block families) or grid_shape (thermal "
                f"block): {type(stencil).__name__} has neither"
            )
            ps = ParameterSpace.make(
                {"diffusion": math.prod(stencil.grid_shape)},
                *parameter_range,
            )
        self.parameter_space = ps

    # -- rank-generic backend dispatch ----------------------------------
    # 2-D families use the consistent Q1 mass / fused 2-D stencil from
    # models/stencil.py; any family exposing the protocol hooks
    # (mass_apply_grid / mass_diag_grid / apply_field — the 3-D and
    # non-affine members) is consumed through them instead.
    def _mass_apply(self, v: jax.Array) -> jax.Array:
        st = self.stencil
        if hasattr(st, "mass_apply_grid"):
            return st.mass_apply_grid(v)
        return mass_apply(v, self.h)

    def _mass_diag(self) -> jax.Array:
        st = self.stencil
        if hasattr(st, "mass_diag_grid"):
            return st.mass_diag_grid()
        return mass_diag(st.n_nodes, self.h, st.dtype)

    def _stiff_apply(self, v: jax.Array, kappa: jax.Array) -> jax.Array:
        st = self.stencil
        if hasattr(st, "apply_field"):
            return st.apply_field(kappa, v)
        return stencil_apply(v, kappa)

    def _make_stiff(self, mu):
        """A(mu) as a grid->grid closure: kappa-field families evaluate
        the coefficient field ONCE per mu (loop-invariant); families
        without a kappa protocol (e.g. the non-SPD advection-diffusion
        stencil) apply the affine operator directly."""
        st = self.stencil
        # kappa alone describes A(mu) only when the family says so: the
        # advection-diffusion stencil exposes kappa (= its SPD diffusion
        # part, for MG preconditioning) yet its operator has advection
        # terms on top — gating on hasattr alone would silently drop them
        if hasattr(st, "kappa") and getattr(st, "kappa_is_full_operator",
                                            True):
            kappa = st.kappa(mu)
            return lambda v: self._stiff_apply(v, kappa), kappa
        return (lambda v: st.apply(mu, v)), None

    @property
    def solution_shape(self):
        return self.stencil.solution_shape

    @partial(jax.jit, static_argnames=(
        "self", "tol", "maxiter", "precond", "store_every", "mesh", "axis"))
    def solve(self, mu, tol: float = 1e-7, maxiter: int = 200,
              precond: str = "jacobi", store_every: int = 1,
              mesh=None, axis: str = "dof") -> jax.Array:
        """(*solution_shape, n_stored) trajectory including u0 (time
        axis last; (N+1, N+1, n_stored) for the 2-D thermal block).

        ``store_every=s`` keeps every s-th step (memory control at big n:
        a 2048^2 grid stores 16.8 MB per kept step). ``precond``:
        'jacobi' (diagonal of M + dt A) or 'mg' (mass-shifted V-cycle,
        mesh-independent; needs power-of-two element counts).

        ``mesh``: a `jax.sharding.Mesh` with a DoF axis — the state rows
        are sharded over it and GSPMD inserts the halo exchanges for the
        stencil/mass gathers (node rows must divide the axis size);
        identical values to the unsharded run (tested on the CPU mesh).
        """
        from rla4mor_tpu.core.solvers import bicgstab, cg

        st = self.stencil
        dt, th = self.dt, self.time_theta
        A_mu, kappa = self._make_stiff(mu)
        b = st.rhs()
        # M + theta dt A is SPD iff A is; non-SPD families (advection-
        # diffusion) solve each implicit step by warm-started BiCGStab
        solver = cg if getattr(st, "is_spd", True) else bicgstab

        def B(v):  # implicit side: M + theta dt A
            return self._mass_apply(v) + th * dt * A_mu(v)

        if precond == "mg":
            if len(self.solution_shape) != 2 or kappa is None:
                raise ValueError(
                    "precond='mg' needs a 2-D kappa-field family "
                    "(models/multigrid.py); use 'jacobi' otherwise"
                )
            from rla4mor_tpu.models.multigrid import make_vcycle

            M_pre = make_vcycle(kappa, mass_dt=th * dt)
        else:
            dia = self._mass_diag() + th * dt * st.jacobi_diag(mu)
            M_pre = lambda r: r / dia  # noqa: E731

        if self.nt % store_every != 0:
            raise ValueError(
                f"store_every={store_every} must divide nt={self.nt}"
            )

        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            sharding = NamedSharding(
                mesh, P(axis, *([None] * (len(self.solution_shape) - 1)))
            )

            def constrain(u):
                return jax.lax.with_sharding_constraint(u, sharding)
        else:
            def constrain(u):
                return u

        def outer(u, _):
            def step(u, _):
                rhs = self._mass_apply(u) + dt * b  # explicit side:
                if th < 1.0:                        # (M - (1-th) dt A) u
                    rhs = rhs - (1.0 - th) * dt * A_mu(u)
                u_new = solver(B, rhs, x0=u, precond=M_pre, tol=tol,
                               maxiter=maxiter).x
                return constrain(u_new), None

            u, _ = jax.lax.scan(step, u, None, length=store_every)
            return u, u

        _, stored = jax.lax.scan(
            outer, self.u0, None, length=self.nt // store_every
        )
        # time axis last: (*solution_shape, n_stored)
        return jnp.moveaxis(
            jnp.concatenate([self.u0[None], stored], axis=0), 0, -1
        )

    def solve_flat(self, mu, **kw) -> jax.Array:
        """(n, n_stored) flat-column view of :meth:`solve`."""
        traj = self.solve(mu, **kw)
        return traj.reshape(-1, traj.shape[-1])

    def as_reductor_fom(self, **solve_kw) -> "_FlatParabolicView":
        """Drop-in FOM view for ``InstationaryReductor`` / ``pod_greedy``:
        flat-vector trajectories + the affine stencil operator, rhs and
        mass as LinOps — big-n POD-greedy runs entirely on device (the
        host-LU path never sees the 4M-DoF system).  ``solve_kw`` (tol,
        maxiter, precond, store_every) are baked into every greedy FOM
        solve. ``store_every=s`` subsamples the SNAPSHOT trajectories
        the greedy PODs; the emitted ROM still time-steps all ``nt``
        steps — compare at the stored steps (``rec[:, ::s]``, as the
        parabolic demo does)."""
        return _FlatParabolicView(self, solve_kw)


class MassStencilOp(FlatGridOp):
    """LinOp view of the FOM's mass matrix on flat vectors (consistent
    Q1 in 2-D, the family's ``mass_apply_grid`` hook otherwise)."""

    def __init__(self, fom: InstationaryStencilFOM):
        super().__init__(grid_shape=fom.solution_shape)
        self.fom = fom

    def _grid_apply(self, grid):
        return self.fom._mass_apply(grid)

    @property
    def H(self):
        return self


_UNBUILT = object()  # lazy-output sentinel (None is a valid built value)


def _mean_value_output(fom):
    """The stencil families' lumped-integral output (``st.output``:
    sum(u) * h^d, uniform weights) as an affine (1, 1, n) row so the
    reduced models emit outputs; None when the family defines no
    output. The per-entry weight is derived by linearity from
    ``output(ones)``; a one-hot probe verifies the uniform-weight
    assumption so a future non-uniform ``output`` fails loudly here
    instead of silently producing a wrong affine row."""
    from rla4mor_tpu.core.affine import AffineDense
    from rla4mor_tpu.core.parameters import ONE

    st = fom.stencil
    if not hasattr(st, "output"):
        return None
    n = math.prod(fom.solution_shape)
    ones = jnp.ones(fom.solution_shape, st.dtype)
    c = jnp.asarray(st.output(ones)) / n

    def _weight_at(flat_index, amplitude=1.0):
        e = (jnp.zeros(n, st.dtype).at[flat_index].set(amplitude)
             .reshape(fom.solution_shape))
        return jnp.asarray(st.output(e))

    # probe two one-hot weights AND homogeneity (output(2 e) == 2 output(e)),
    # so non-uniform linear functionals and homogeneous nonlinear outputs
    # (e.g. sum(u**2) * h^d, which passes a single one-hot check exactly)
    # both fail loudly instead of silently producing a wrong affine row
    w0 = _weight_at(0)
    w_mid = _weight_at(n // 2)
    w0_scaled = _weight_at(0, amplitude=2.0)
    tol = 1e-5 * (jnp.abs(c) + 1e-30)
    if not bool((jnp.abs(w0 - c) <= tol) & (jnp.abs(w_mid - c) <= tol)
                & (jnp.abs(w0_scaled - 2.0 * w0) <= 2 * tol)):
        raise NotImplementedError(
            f"{type(st).__name__}.output is not a uniform-weight linear "
            "functional; _mean_value_output cannot derive its affine row "
            f"(weight[0]={float(w0):.6e}, weight[n//2]={float(w_mid):.6e}, "
            f"output(2 e0)={float(w0_scaled):.6e} vs mean weight "
            f"{float(c):.6e})"
        )
    return AffineDense(jnp.full((1, 1, n), c, st.dtype), (ONE,))


class _FlatParabolicView:
    """The ``InstationaryFOM``-shaped interface of an
    :class:`InstationaryStencilFOM` (flat columns, affine LinOps)."""

    def __init__(self, fom: InstationaryStencilFOM, solve_kw):
        from rla4mor_tpu.core.affine import AffineOp
        from rla4mor_tpu.core.linops import DenseOp
        from rla4mor_tpu.core.parameters import ONE

        self._fom = fom
        self._solve_kw = dict(solve_kw)
        st = fom.stencil
        self.operator = st.affine_operator()
        self.rhs = AffineOp((DenseOp(st.rhs().reshape(-1, 1)),), (ONE,))
        self.mass = MassStencilOp(fom)
        self.solution_dim = math.prod(fom.solution_shape)
        self.u0 = fom.u0.reshape(-1)
        self.T, self.nt, self.dt = fom.T, fom.nt, fom.dt
        self.time_theta = fom.time_theta
        self.parameter_space = fom.parameter_space
        self.products = {}
        self._output_functional = _UNBUILT  # lazy: the dense (1,1,n)
        # row is ~n*8 bytes, wasted on output-free big-n pipelines

    @property
    def output_functional(self):
        if self._output_functional is _UNBUILT:
            self._output_functional = _mean_value_output(self._fom)
        return self._output_functional

    def solve(self, mu) -> jax.Array:
        return self._fom.solve_flat(mu, **self._solve_kw)

    def solve_many(self, mus) -> jax.Array:
        return jnp.stack([self.solve(mu) for mu in mus], axis=0)
