"""Device-native big-n wave FOM: matrix-free Newmark-beta.

``WaveFOM`` (models/wave.py) time-steps with one host SuperLU
factorization per mu; this is the big-n stencil-world counterpart (the
same relationship ``InstationaryStencilFOM`` has to ``InstationaryFOM``):
the whole Newmark trajectory is one jitted ``lax.scan``, each implicit
acceleration solve

    (M + beta dt^2 A(mu)) a_{k+1} = b - A(mu) u*_k

runs warm-started matrix-free CG (BiCGStab for non-SPD families) on the
stencil operators, with the Jacobi diagonal of M + beta dt^2 A or the
mass-shifted geometric V-cycle as preconditioner. Inherits the
rank-generic backend dispatch from ``InstationaryStencilFOM``
(consistent 2-D Q1 mass by default; ``mass_apply_grid``/
``mass_diag_grid``/``apply_field`` hooks for the 3-D and non-affine
families), so the whole stencil family zoo time-steps hyperbolically
unchanged, including DoF-axis sharding via ``mesh=``.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from rla4mor_tpu.models.instationary_stencil import (
    InstationaryStencilFOM,
    MassStencilOp,
)


class WaveStencilFOM(InstationaryStencilFOM):
    """Newmark-beta wave equation over a stencil-protocol FOM.

    State lives on the node grid (Dirichlet shell zero); ``u0``/``v0``
    default to zero (with the f = 1 stencil load as forcing, the
    membrane rings up from rest); pass a displacement bump for the
    standing-wave benchmark."""

    def __init__(self, stencil, T: float = 1.0, nt: int = 100,
                 u0: Optional[jax.Array] = None,
                 v0: Optional[jax.Array] = None,
                 beta: float = 0.25, gamma: float = 0.5,
                 parameter_range=(0.1, 1.0)):
        assert beta > 0 and 0.5 <= gamma <= 1.0, (beta, gamma)
        super().__init__(stencil, T=T, nt=nt, u0=u0,
                         parameter_range=parameter_range)
        del self.time_theta  # not a theta scheme
        self.beta = float(beta)
        self.gamma = float(gamma)
        self.v0 = (jnp.zeros(stencil.solution_shape, stencil.dtype)
                   if v0 is None else v0)

    @partial(jax.jit, static_argnames=(
        "self", "tol", "maxiter", "precond", "store_every", "mesh", "axis"))
    def solve(self, mu, tol: float = 1e-7, maxiter: int = 200,
              precond: str = "jacobi", store_every: int = 1,
              mesh=None, axis: str = "dof") -> jax.Array:
        """(*solution_shape, n_stored) displacement trajectory including
        u0 (time axis last). Same knobs as the parabolic solve; the
        acceleration is warm-started across steps (consecutive a_k
        differ by O(dt), so CG converges in a few iterations after the
        first)."""
        from rla4mor_tpu.core.solvers import bicgstab, cg

        st = self.stencil
        dt, beta, gamma = self.dt, self.beta, self.gamma
        c = beta * dt * dt
        A_mu, kappa = self._make_stiff(mu)
        b = st.rhs()
        solver = cg if getattr(st, "is_spd", True) else bicgstab

        def S_op(v):  # implicit side: M + beta dt^2 A
            return self._mass_apply(v) + c * A_mu(v)

        m_dia = self._mass_diag()
        if precond == "mg":
            if len(self.solution_shape) != 2 or kappa is None:
                raise ValueError(
                    "precond='mg' needs a 2-D kappa-field family "
                    "(models/multigrid.py); use 'jacobi' otherwise"
                )
            from rla4mor_tpu.models.multigrid import make_vcycle

            M_pre = make_vcycle(kappa, mass_dt=c)
        else:
            dia = m_dia + c * st.jacobi_diag(mu)
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

            def constrain(x):
                return jax.lax.with_sharding_constraint(x, sharding)
        else:
            def constrain(x):
                return x

        u0 = constrain(self.u0)
        v0 = constrain(self.v0)
        # consistent initial acceleration: M a0 = b - A u0 (mass solve;
        # Jacobi-preconditioned CG — exact in one step for lumped mass)
        a0 = cg(self._mass_apply, b - A_mu(u0), precond=lambda r: r / m_dia,
                tol=tol, maxiter=maxiter).x
        a0 = constrain(a0)

        def outer(carry, _):
            def step(carry, _):
                u, v, a = carry
                u_star = u + dt * v + dt * dt * (0.5 - beta) * a
                v_star = v + dt * (1.0 - gamma) * a
                a_new = solver(S_op, b - A_mu(u_star), x0=a,
                               precond=M_pre, tol=tol, maxiter=maxiter).x
                u_new = constrain(u_star + c * a_new)
                v_new = constrain(v_star + gamma * dt * a_new)
                return (u_new, v_new, constrain(a_new)), None

            carry, _ = jax.lax.scan(step, carry, None, length=store_every)
            return carry, carry[0]

        _, stored = jax.lax.scan(
            outer, (u0, v0, a0), None, length=self.nt // store_every
        )
        return jnp.moveaxis(
            jnp.concatenate([u0[None], stored], axis=0), 0, -1
        )

    def as_reductor_fom(self, **solve_kw) -> "_FlatWaveView":
        """Drop-in FOM view for :class:`models.wave.WaveReductor` /
        ``pod_greedy``: flat-vector trajectories + the affine stencil
        operator, rhs and mass as LinOps. ``solve_kw`` (tol, maxiter,
        precond, store_every, mesh) are baked into every greedy FOM
        solve.

        ``store_every=s`` subsamples the SNAPSHOT trajectories the
        greedy PODs (memory control at big n); the emitted ROM still
        time-steps all ``nt`` steps, so ``rom.solve`` has nt+1 columns
        vs the view's nt/s+1 — compare at the stored steps
        (``rec[:, ::s]``), as the parabolic demo does."""
        return _FlatWaveView(self, solve_kw)


class _FlatWaveView:
    """The ``WaveFOM``-shaped interface of a :class:`WaveStencilFOM`
    (flat columns, affine LinOps; mirrors
    instationary_stencil._FlatParabolicView)."""

    def __init__(self, fom: WaveStencilFOM, solve_kw):
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
        self.v0 = fom.v0.reshape(-1)
        self.T, self.nt, self.dt = fom.T, fom.nt, fom.dt
        self.beta, self.gamma = fom.beta, fom.gamma
        self.parameter_space = fom.parameter_space
        self.products = {}
        from rla4mor_tpu.models.instationary_stencil import _UNBUILT

        self._output_functional = _UNBUILT  # lazy (see _FlatParabolicView)

    @property
    def output_functional(self):
        from rla4mor_tpu.models.instationary_stencil import (
            _UNBUILT,
            _mean_value_output,
        )

        if self._output_functional is _UNBUILT:
            self._output_functional = _mean_value_output(self._fom)
        return self._output_functional

    def solve(self, mu) -> jax.Array:
        traj = self._fom.solve(mu, **self._solve_kw)
        return traj.reshape(-1, traj.shape[-1])

    def solve_many(self, mus) -> jax.Array:
        return jnp.stack([self.solve(mu) for mu in mus], axis=0)
