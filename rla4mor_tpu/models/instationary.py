"""Instationary (parabolic) parametric models and their reduction.

M du/dt + A(mu) u = b(mu),  u(0) = u0,  on (0, T] with nt implicit-Euler
steps.  The reference is stationary-only (rla4mor has no instationary
counterpart); this extends the framework toward pyMOR's
``InstationaryModel`` the TPU-first way:

* FOM trajectories: one host factorization of (M + dt A(mu)) and nt
  back-substitutions (offline path, mirrors StationaryFOM.solve);
* ROM trajectories: dense reduced mass/stiffness, the WHOLE time loop is a
  ``lax.scan`` — one jitted program per mu, vmappable over parameter
  batches;
* error estimation: the implicit-Euler space-time residual
  r_k = M (u_k - u_{k-1})/dt + A(mu) u_k - b(mu), Riesz-lifted and
  SKETCHED with the stationary machinery (Theta R^-1 applied to the
  reduced-basis images ONCE offline), accumulated as
  eta = sqrt(dt * sum_k ||Theta R^-1 r_k||^2) inside the same scan.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sps
import scipy.sparse.linalg as spla

from rla4mor_tpu.core.affine import AffineDense, AffineOp
from rla4mor_tpu.core.linops import HostSparseOp
from rla4mor_tpu.core.parameters import Mu, ParameterSpace, eval_coefficients
from rla4mor_tpu.core.products import Product
from rla4mor_tpu.utils.logger import get_logger

# reduced-system matmuls are tiny (r x r); HIGHEST removes the TPU f32
# -> bf16 truncation from trajectories and estimators at no real cost
_HI = jax.lax.Precision.HIGHEST


def _mm(a, b):
    return jnp.matmul(a, b, precision=_HI)


class InstationaryFOM:
    """Theta-scheme parabolic FOM with affine A(mu), b(mu) and fixed M.

    ``time_theta=1`` (default) is implicit Euler; ``0.5`` is
    Crank-Nicolson (second order in time, tested); any theta in (0, 1]
    is accepted (explicit Euler theta=0 is excluded: the scheme would
    need a mass solve and a CFL bound instead).
    """

    def __init__(
        self,
        operator: AffineOp,
        rhs: AffineOp,
        mass: HostSparseOp,
        T: float = 1.0,
        nt: int = 50,
        u0=None,
        output_functional=None,
        products=None,
        parameter_space: Optional[ParameterSpace] = None,
        time_theta: float = 1.0,
        name: str = "instationary_fom",
    ):
        assert 0.0 < time_theta <= 1.0, time_theta
        self.time_theta = float(time_theta)
        self.operator = operator
        self.rhs = rhs
        self.mass = mass
        self.T = float(T)
        self.nt = int(nt)
        self.dt = self.T / self.nt
        n = operator.source_dim
        self.solution_dim = n
        self.u0 = (jnp.zeros(n) if u0 is None else jnp.asarray(u0))
        self.output_functional = output_functional
        self.products = products or {}
        self.parameter_space = parameter_space
        self.name = name
        self.logger = get_logger("models.instationary", 20)

    def _assemble_A(self, mu: Mu) -> sps.csc_matrix:
        theta = np.asarray(eval_coefficients(self.operator.coefficients, mu))
        out = None
        for t, term in enumerate(self.operator.terms):
            m = theta[t] * term.S
            out = m if out is None else out + m
        return out.tocsc()

    def assemble_sparse(self, mu: Mu) -> sps.csc_matrix:
        """Host-sparse A(mu) (the StationaryFOM protocol name —
        mor.bounds coercivity constants consume parabolic FOMs
        through it)."""
        return self._assemble_A(mu)

    def assemble_rhs(self, mu: Mu) -> np.ndarray:
        if isinstance(self.rhs, AffineDense):
            return np.asarray(self.rhs.assemble_vec(mu))
        return np.asarray(self.rhs.assemble_dense(mu))[:, 0]

    def solve(self, mu: Mu) -> jax.Array:
        """(n, nt+1) trajectory, theta scheme:
        (M + theta dt A) u_{k+1} = (M - (1-theta) dt A) u_k + dt b;
        ONE factorization per mu."""
        A = self._assemble_A(mu)
        M = sps.csc_matrix(self.mass.S)
        th = self.time_theta
        b = np.asarray(self.assemble_rhs(mu))
        # complex operators/rhs (e.g. lossy media) run the same loop at
        # the promoted dtype; the real case stays f64
        dt_num = np.promote_types(
            np.promote_types(A.dtype, b.dtype), np.float64
        )
        b = b.astype(dt_num)
        lu = spla.splu(sps.csc_matrix((M + th * self.dt * A), dtype=dt_num))
        C = sps.csc_matrix(M - (1.0 - th) * self.dt * A, dtype=dt_num)
        u = np.asarray(self.u0, dt_num)
        out = [u]
        for _ in range(self.nt):
            u = lu.solve(np.asarray(C @ u) + self.dt * b)
            out.append(u)
        return jnp.asarray(np.stack(out, axis=1))

    def solve_many(self, mus) -> jax.Array:
        return jnp.stack([self.solve(mu) for mu in mus], axis=0)  # (m, n, nt+1)


class InstationaryROM:
    """Dense reduced parabolic model; trajectory + sketched space-time
    residual estimate in ONE jitted ``lax.scan`` (pytree, vmappable)."""

    def __init__(self, mass_r, lhs: AffineDense, rhs_r: AffineDense,
                 u0_r, dt: float, nt: int,
                 est_mass=None, est_lhs: Optional[AffineDense] = None,
                 est_rhs: Optional[AffineDense] = None,
                 output_functional: Optional[AffineDense] = None,
                 time_theta: float = 1.0):
        self.time_theta = float(time_theta)
        self.mass_r = mass_r          # (r, r)
        self.lhs = lhs                # (T, r, r)
        self.rhs_r = rhs_r            # (Tb, r, 1)
        self.u0_r = u0_r              # (r,)
        self.dt = float(dt)
        self.nt = int(nt)
        self.est_mass = est_mass      # (k, r)   Theta R^-1 M V
        self.est_lhs = est_lhs        # (T, k, r) Theta R^-1 A_t V
        self.est_rhs = est_rhs        # (Tb, k, 1) Theta R^-1 b_l
        self.output_functional = output_functional

    def tree_flatten(self):
        return (self.mass_r, self.lhs, self.rhs_r, self.u0_r, self.est_mass,
                self.est_lhs, self.est_rhs, self.output_functional), (
            self.dt, self.nt, self.time_theta)

    @classmethod
    def tree_unflatten(cls, aux, ch):
        obj = object.__new__(cls)
        (obj.mass_r, obj.lhs, obj.rhs_r, obj.u0_r, obj.est_mass, obj.est_lhs,
         obj.est_rhs, obj.output_functional) = ch
        obj.dt, obj.nt, obj.time_theta = aux
        return obj

    @property
    def dim(self) -> int:
        return self.mass_r.shape[0]

    def _assembled(self, mu: Mu):
        A = self.lhs.assemble(mu)
        b = self.rhs_r.assemble_vec(mu)
        return A, b

    def solve(self, mu: Mu, return_estimate: bool = False):
        """(r, nt+1) trajectory; optionally the cumulative residual-norm
        estimate eta = sqrt(dt * sum_k ||sketched r_k||^2)."""
        A, b = self._assembled(mu)
        th = self.time_theta
        S = self.mass_r + th * self.dt * A
        C = self.mass_r - (1.0 - th) * self.dt * A
        estimating = return_estimate and self.est_lhs is not None
        if estimating:
            sA = self.est_lhs.assemble(mu)
            sb = self.est_rhs.assemble_vec(mu)

        # S is loop-invariant: factorize ONCE outside the scan (an LU per
        # time step is nt x O(r^3) wasted; S may be nonsymmetric)
        S_lu = jax.scipy.linalg.lu_factor(S)

        def step(carry, _):
            u, acc = carry
            u_new = jax.scipy.linalg.lu_solve(S_lu, _mm(C, u) + self.dt * b)
            if estimating:
                u_th = th * u_new + (1.0 - th) * u
                r = _mm(self.est_mass, u_new - u) / self.dt \
                    + _mm(sA, u_th) - sb
                acc = acc + jnp.sum(jnp.abs(r) ** 2)
            return (u_new, acc), u_new

        (u_end, acc), traj = jax.lax.scan(
            step, (self.u0_r.astype(S.dtype), jnp.asarray(0.0, S.dtype)),
            None, length=self.nt,
        )
        traj = jnp.concatenate(
            [self.u0_r.astype(S.dtype)[None], traj], axis=0
        ).T  # (r, nt+1)
        if return_estimate:
            return traj, jnp.sqrt(self.dt * acc)
        return traj

    def estimate_error(self, mu: Mu) -> jax.Array:
        if self.est_lhs is None:
            raise ValueError(
                "this ROM was reduced without an embedding: the sketched "
                "space-time residual estimator is unavailable (construct "
                "InstationaryReductor(..., embedding=...) to enable it)"
            )
        _, eta = self.solve(mu, return_estimate=True)
        return eta

    def output(self, U, mu: Mu) -> jax.Array:
        assert self.output_functional is not None
        return self.output_functional.apply(U, mu)


jax.tree_util.register_pytree_node(
    InstationaryROM,
    lambda x: x.tree_flatten(),
    InstationaryROM.tree_unflatten,
)


class InstationaryReductor:
    """Galerkin reduction of an InstationaryFOM with a sketched space-time
    residual estimator (embedding = Theta, Riesz lift = product.inv —
    the stationary sketching machinery applied to [M V | A_t V | b])."""

    def __init__(self, fom: InstationaryFOM, embedding=None,
                 product: Optional[Product] = None, log_level: int = 20):
        self.fom = fom
        n = fom.solution_dim
        self.product = product if product is not None else Product.identity(n)
        self.embedding = embedding
        self.rb = jnp.zeros((n, 0))
        self.logger = get_logger("mor.instationary", log_level)

    @property
    def basis_size(self) -> int:
        return self.rb.shape[1]

    def extend_basis(self, U) -> None:
        """Append columns and R-orthonormalize (POD-greedy appends POD
        modes of the projection error trajectory)."""
        from rla4mor_tpu.core.orthonormalize import gram_schmidt

        U = jnp.asarray(U)
        if U.ndim == 1:
            U = U[:, None]
        rb = jnp.concatenate([self.rb.astype(U.dtype), U], axis=1)
        self.rb = gram_schmidt(rb, product=self.product,
                               offset=self.basis_size)

    def project_trajectory(self, traj) -> jax.Array:
        """R-orthogonal projection error of an (n, nt+1) trajectory."""
        V = self.rb
        if V.shape[1] == 0:
            return jnp.asarray(traj)
        coeffs = V.conj().T @ jnp.asarray(self.product.op.apply(traj))
        return jnp.asarray(traj) - V @ coeffs

    def reduce(self, pad_to: Optional[int] = None) -> InstationaryROM:
        """Emit the reduced model.

        ``pad_to=r_max`` pads every reduced quantity to a FIXED r_max
        columns (identity filler on the dead mass diagonal, zeros
        elsewhere), so the ROM's jitted solve/estimate compiles once for a
        whole POD-greedy run regardless of the live basis size — the
        instationary analog of mor/padded_reductor.py.  Dead coordinates
        provably stay zero: u0 is zero there, the padded implicit-Euler
        matrix S = M + dt A has a unit dead diagonal, and the dead rows of
        the rhs are zero, so the trajectory and the sketched estimate are
        EXACTLY those of the unpadded ROM (equivalence-tested).
        """
        fom = self.fom
        V = self.rb
        r = V.shape[1]
        mass_r, lhs, rhs_r, est_mass, est_lhs, est_rhs = \
            project_time_system(fom, V, self.product, self.embedding)
        u0_r = V.conj().T @ jnp.asarray(self.product.op.apply(fom.u0))

        out = None
        if fom.output_functional is not None:
            of = fom.output_functional
            out = AffineDense(
                jnp.einsum("tqn,nr->tqr", of.stack, V), of.coefficients
            ) if isinstance(of, AffineDense) else None

        if pad_to is not None:
            mass_r, lhs, rhs_r, est_mass, est_lhs, est_rhs = \
                pad_time_system(pad_to, r, mass_r, lhs, rhs_r,
                                est_mass, est_lhs, est_rhs)
            p = int(pad_to) - r
            u0_r = jnp.pad(u0_r, (0, p))
            if out is not None:
                out = AffineDense(
                    jnp.pad(out.stack, ((0, 0), (0, 0), (0, p))),
                    out.coefficients,
                )

        return InstationaryROM(
            mass_r, lhs, rhs_r, u0_r, fom.dt, fom.nt,
            est_mass=est_mass, est_lhs=est_lhs, est_rhs=est_rhs,
            output_functional=out,
            time_theta=getattr(fom, "time_theta", 1.0),
        )

    def reconstruct(self, traj_r) -> jax.Array:
        return self.rb @ jnp.asarray(traj_r)


def project_time_system(fom, V, product, embedding):
    """Galerkin + sketch projections shared by the parabolic and wave
    reductors: reduced mass/stiffness/rhs plus the sketched residual
    images Theta R^-1 [M V | A_t V | b_t]. Returns
    (mass_r, lhs, rhs_r, est_mass, est_lhs, est_rhs)."""
    MV = jnp.asarray(fom.mass.apply(V))
    mass_r = V.conj().T @ MV
    lhs = AffineDense(
        jnp.stack([V.conj().T @ jnp.asarray(t.apply(V))
                   for t in fom.operator.terms]),
        fom.operator.coefficients,
    )
    rhs_mat = (fom.rhs if isinstance(fom.rhs, AffineDense)
               else _materialize_rhs(fom.rhs))
    rhs_r = AffineDense(
        jnp.einsum("nr,tnl->trl", V.conj(), rhs_mat.stack),
        rhs_mat.coefficients,
    )

    est_mass = est_lhs = est_rhs = None
    if embedding is not None:
        Rinv = product.inv

        def sk(X):
            return jnp.asarray(embedding.apply(jnp.asarray(Rinv.apply(X))))

        est_mass = sk(MV)
        est_lhs = AffineDense(
            jnp.stack([sk(jnp.asarray(t.apply(V)))
                       for t in fom.operator.terms]),
            fom.operator.coefficients,
        )
        est_rhs = AffineDense(
            jnp.stack([sk(rhs_mat.stack[t])
                       for t in range(rhs_mat.n_terms)]),
            rhs_mat.coefficients,
        )
    return mass_r, lhs, rhs_r, est_mass, est_lhs, est_rhs


def pad_time_system(pad_to, r, mass_r, lhs, rhs_r,
                    est_mass, est_lhs, est_rhs):
    """Dead-block padding shared by the parabolic and wave reductors:
    identity filler on the dead mass diagonal, zeros everywhere else —
    dead coordinates provably stay zero through any of the time scans
    (equivalence-tested in both suites)."""
    R = int(pad_to)
    assert R >= r, (R, r)
    p = R - r
    eye_dead = jnp.zeros((R, R), mass_r.dtype).at[
        jnp.arange(r, R), jnp.arange(r, R)
    ].set(1.0)
    mass_r = jnp.pad(mass_r, ((0, p), (0, p))) + eye_dead
    lhs = AffineDense(
        jnp.pad(lhs.stack, ((0, 0), (0, p), (0, p))), lhs.coefficients
    )
    rhs_r = AffineDense(
        jnp.pad(rhs_r.stack, ((0, 0), (0, p), (0, 0))), rhs_r.coefficients
    )
    if est_mass is not None:
        est_mass = jnp.pad(est_mass, ((0, 0), (0, p)))
        est_lhs = AffineDense(
            jnp.pad(est_lhs.stack, ((0, 0), (0, 0), (0, p))),
            est_lhs.coefficients,
        )
    return mass_r, lhs, rhs_r, est_mass, est_lhs, est_rhs


def _materialize_rhs(rhs: AffineOp) -> AffineDense:
    from rla4mor_tpu.core.affine import materialize

    return materialize(rhs)


@jax.jit
def _estimate_sweep(rom: InstationaryROM, mus_batched: Mu) -> jax.Array:
    """Module-level jitted sweep: jax.jit caches on the ROM pytree
    structure + shapes, so with a padded ROM the whole POD-greedy run
    compiles once."""
    return jax.vmap(rom.estimate_error)(mus_batched)


def pod_greedy(
    fom: InstationaryFOM,
    reductor: InstationaryReductor,
    training_set: Sequence[Mu],
    max_extensions: int = 10,
    modes_per_extension: int = 1,
    atol: float = 0.0,
    rtol: float = 0.0,
    pad_to: Optional[int] = None,
    mu_sharding=None,
    pod_method: str = "snapshots",
    coercivity=None,
    log_level: int = 20,
) -> Tuple[InstationaryROM, dict]:
    """POD-greedy (Haasdonk/Ohlberger): greedy over mu by the sketched
    space-time residual estimate; each extension appends the leading POD
    mode(s) of the R-orthogonal projection-error trajectory at the worst
    mu.  The estimator sweep is one jitted vmap over the training set.

    ``pad_to=r_max`` runs the sweep on r_max-padded ROMs: ONE compile for
    the whole greedy run (use on the remote-compile TPU platform; the
    stationary analog is mor.greedy.rb_greedy_no_retrace).

    ``pod_method``: ``"snapshots"`` (method of snapshots, (nt, nt) host
    Gram eigh) or ``"randomized"`` (core.rsvd.pod_randomized — Gram-free
    device matmuls; prefer for long trajectories or f32 storage).

    ``coercivity``: a jittable ``mu -> alpha_LB(mu)`` (e.g.
    ``mor.bounds.MinThetaCoercivity``) upgrades the sweep scores to the
    CERTIFIED final-time bounds eta/sqrt(alpha_LB) — selection then
    targets the bound, and ``atol``/``rtol`` terminate on certified
    error, not the indicator (``mor.bounds.parabolic_error_bound``;
    needs ``fom.time_theta >= 1/2``)."""
    from rla4mor_tpu.core.orthonormalize import pod as _pod_snapshots
    from rla4mor_tpu.core.parameters import mu_stack
    from rla4mor_tpu.core.rsvd import pod_randomized

    if pod_method == "snapshots":
        pod = _pod_snapshots
    elif pod_method == "randomized":
        pod = partial(pod_randomized, rtol=1e-7)
    else:
        raise ValueError(f"unknown pod_method {pod_method!r}")

    assert reductor.embedding is not None, (
        "pod_greedy drives the greedy by the sketched space-time residual "
        "estimate: InstationaryReductor needs an embedding"
    )
    if pad_to is not None:
        assert pad_to >= max_extensions * modes_per_extension, (
            "pad_to must hold the full final basis", pad_to
        )
    if coercivity is not None and fom.time_theta < 0.5:
        raise ValueError(
            "certified POD-greedy (coercivity=...) needs time_theta >= "
            f"1/2 (got {fom.time_theta}); see mor.bounds."
            "parabolic_error_bound"
        )
    logger = get_logger("mor.pod_greedy", log_level)
    history = {"selected_mus": [], "max_estimates": []}
    mus_batched = mu_stack(list(training_set))
    if mu_sharding is not None:
        # 2-D ('dof', 'mu') mesh: the estimator sweep vmaps over the
        # training set — placing the stacked mu batch on the 'mu' axis
        # makes GSPMD split the sweep across that axis while the FOM
        # solves stay dof-sharded (len(training_set) must divide evenly)
        mus_batched = jax.tree.map(
            lambda x: jax.device_put(x, mu_sharding), mus_batched
        )

    mu0 = training_set[0]
    traj = fom.solve(mu0)
    err0 = reductor.project_trajectory(traj)
    modes, _ = pod(err0, product=reductor.product,
                   modes=modes_per_extension)
    reductor.extend_basis(modes)
    history["selected_mus"].append(mu0)

    # loop-invariant: alpha_LB depends on mu only — one eval up front
    sqrt_alphas = None
    if coercivity is not None:
        if hasattr(coercivity, "tabulate"):  # host-LP bounds (mor.scm)
            alphas = np.asarray(coercivity.tabulate(list(training_set)))
        else:  # jittable bounds (mor.bounds)
            alphas = np.asarray(jax.jit(jax.vmap(coercivity))(mus_batched))
        if not np.all(alphas > 0):
            # sqrt of a <=0 bound would flow NaN into the argmax, which
            # then silently re-selects one mu forever; fail loudly (SCM
            # LPs can legitimately return <=0 far from their anchor set)
            bad = np.flatnonzero(~(alphas > 0))
            raise ValueError(
                f"certified pod_greedy: coercivity lower bound is not "
                f"positive at {bad.size} training parameter(s) (first "
                f"index {int(bad[0])}, value {float(alphas[bad[0]]):.3e}); "
                "tighten the SCM fit (more anchors) or drop coercivity= "
                "for indicator-only greedy"
            )
        sqrt_alphas = np.sqrt(alphas)

    first_max = None
    rom = reductor.reduce(pad_to=pad_to)
    for _it in range(1, max_extensions):
        estimates = np.asarray(_estimate_sweep(rom, mus_batched))
        if np.iscomplexobj(estimates):
            # estimates are norms — real by construction; a complex dtype
            # only carries promotion roundoff. Never discard a genuine
            # imaginary part silently.
            scale = max(float(np.max(np.abs(estimates))), 1e-300)
            imag_max = float(np.max(np.abs(estimates.imag)))
            if imag_max > 1e-8 * scale:
                raise ValueError(
                    f"pod_greedy: error estimates carry a non-roundoff "
                    f"imaginary part (max |Im| = {imag_max:.3e} at scale "
                    f"{scale:.3e}) — the estimator is broken upstream"
                )
            estimates = estimates.real
        if sqrt_alphas is not None:
            estimates = estimates / sqrt_alphas
        imax = int(np.argmax(estimates))
        emax = float(estimates[imax])
        history["max_estimates"].append(emax)
        if first_max is None:
            first_max = emax
        logger.info("pod-greedy it=%d basis=%d max_est=%.3e", _it,
                    reductor.basis_size, emax)
        if emax <= atol or (rtol and emax <= rtol * first_max):
            break
        mu = training_set[imax]
        traj = fom.solve(mu)
        err = reductor.project_trajectory(traj)
        modes, svals = pod(err, product=reductor.product,
                           modes=modes_per_extension)
        if modes.shape[1] == 0:
            logger.info("pod-greedy: projection error exhausted")
            break
        reductor.extend_basis(modes)
        history["selected_mus"].append(mu)
        rom = reductor.reduce(pad_to=pad_to)

    if pad_to is not None:
        rom = reductor.reduce()  # hand back the live-size ROM
    return rom, history


def instationary_thermal_block(
    grid_shape=(2, 2),
    num_intervals: int = 16,
    T: float = 1.0,
    nt: int = 50,
    parameter_range=(0.1, 1.0),
    time_theta: float = 1.0,
) -> InstationaryFOM:
    """Parabolic thermal block: L2 mass + the stationary affine stiffness
    (heat equation with block-wise diffusion, f = 1, u0 = 0)."""
    from rla4mor_tpu.models.thermal_block import ThermalBlockFOM

    st = ThermalBlockFOM(grid_shape, num_intervals, parameter_range)
    fom = InstationaryFOM(
        operator=st.operator,
        rhs=st.rhs,
        mass=st.l2_product.op,
        T=T,
        nt=nt,
        output_functional=st.output_functional,
        products=st.products,
        parameter_space=st.parameter_space,
        time_theta=time_theta,
        name=st.name + "_parabolic",
    )
    return fom
