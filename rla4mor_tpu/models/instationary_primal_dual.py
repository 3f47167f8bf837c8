"""Goal-oriented parabolic MOR: discrete-adjoint corrected outputs.

The stationary stack has primal-dual output correction + an output error
indicator (mor/primal_dual.py); this is the parabolic counterpart, built
on the DISCRETE adjoint of the theta scheme — so the correction identity
is exact at the discrete level, with no time-continuous dual or
quadrature error. The reference is stationary-only and has no output
error control at all (SURVEY §2.3).

For the theta-scheme primal recursion (S = M + theta dt A,
C = M - (1-theta) dt A)

    S u_k = C u_{k-1} + dt b,         k = 1..K,

and the final-time output s(mu) = l(mu)^H u_K, the discrete adjoint runs
BACKWARD:

    S^H z_K = l,      S^H z_k = C^H z_{k+1}   (k = K-1..1),

and summation by parts gives the exact identity (e_0 = 0, i.e. u0 in the
reduced space — e.g. u0 = 0)

    s - s_r = sum_k z_k^H r_k,   r_k = C u_{r,k-1} + dt b - S u_{r,k}.

Replacing z by its reduced-basis approximation Z zeta yields the
dual-corrected output

    s_c = s_r + sum_k zeta_k^H ( Z^H M V (a_{k-1} - a_k)
                                 - dt Z^H A V a_th,k + dt Z^H b ),

with s - s_c = sum_k (z_k - Z zeta_k)^H r_k — a PRODUCT of the dual and
primal approximation errors (exact when EITHER basis captures its
trajectory; tested in both limits). Both factors are estimated by the
sketched space-time residual machinery, giving the output indicator

    eta_s = eta_pr * eta_du

(same status as the stationary module's: an indicator that tracks the
true output error; a rigorous bound would additionally need a stability
lower bound).

Everything online is dense-affine; ``output_corrected`` is one jittable,
vmappable call (forward scan + LU-once backward scan + correction sum).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sps
import scipy.sparse.linalg as spla

from rla4mor_tpu.core.affine import AffineDense, as_affine
from rla4mor_tpu.core.parameters import Mu, conj_coefficient
from rla4mor_tpu.models.instationary import (
    InstationaryFOM,
    InstationaryReductor,
    InstationaryROM,
    _materialize_rhs,
    _mm,
)
from rla4mor_tpu.utils.logger import get_logger


def _output_terms(fom: InstationaryFOM) -> AffineDense:
    """The output functional as an affine stack of COLUMN vectors l_t
    (s = l(mu)^H u with l(mu) = sum_t conj(theta_t) l_t), single output.
    Accepts AffineDense / AffineOp / LinOp outputs (materialized — the
    functional is a (1, n) row, always small-source)."""
    from rla4mor_tpu.core.affine import materialize

    of = fom.output_functional
    assert of is not None, "goal-oriented reduction needs output_functional"
    ofd = materialize(as_affine(of))
    assert ofd.range_dim == 1, "dual correction supports single outputs"
    return ofd.H  # (To, n, 1), conj coefficients


def solve_dual(fom: InstationaryFOM, mu: Mu,
               output_kind: str = "final") -> jax.Array:
    """(n, nt) exact discrete-adjoint trajectory, column k-1 = z_k
    (z_K first solved, stored last-to-first in forward index order).
    One host factorization of S^H per mu, like the primal solve.

    ``output_kind='final'``: adjoint of s = l^H u_K (terminal condition
    S^H z_K = l, homogeneous backward recursion).
    ``output_kind='integral'``: adjoint of the right-endpoint quadrature
    s = dt sum_k l^H u_k — the source dt*l enters EVERY backward step
    (S^H z_K = dt l; S^H z_k = C^H z_{k+1} + dt l)."""
    _check_output_kind(output_kind)
    A = fom._assemble_A(mu)
    M = sps.csc_matrix(fom.mass.S)
    th, dt = fom.time_theta, fom.dt
    S = sps.csc_matrix(M + th * dt * A)
    C = sps.csc_matrix(M - (1.0 - th) * dt * A)
    lterms = _output_terms(fom)
    l = np.asarray(lterms.assemble_vec(mu))
    dt_num = np.promote_types(np.promote_types(S.dtype, l.dtype),
                              np.float64)
    lu = spla.splu(sps.csc_matrix(S.conj().T, dtype=dt_num))
    l = l.astype(dt_num)
    CH = sps.csc_matrix(C.conj().T)
    integral = output_kind == "integral"
    term = dt * l if integral else l
    z = lu.solve(term)
    out = [z]
    for _ in range(fom.nt - 1):
        rhs = np.asarray(CH @ z)
        if integral:
            rhs = rhs + dt * l
        z = lu.solve(rhs)
        out.append(z)
    out.reverse()  # forward index order z_1 .. z_K
    return jnp.asarray(np.stack(out, axis=1))


def _check_output_kind(kind: str) -> None:
    if kind not in ("final", "integral"):
        raise ValueError(
            f"output_kind must be 'final' or 'integral': {kind!r}"
        )


class InstationaryCorrectedOutputROM:
    """Pytree: primal InstationaryROM + reduced discrete adjoint +
    offline correction projections (+ sketched dual-residual pieces)."""

    def __init__(self, rom_pr: InstationaryROM, mass_zz, lhs_zz: AffineDense,
                 l_z: AffineDense, rhs_z: AffineDense, mass_zv, op_zv:
                 AffineDense, est_mass_z=None, est_lhs_z=None, est_l=None,
                 output_kind: str = "final"):
        _check_output_kind(output_kind)
        self.output_kind = output_kind
        self.rom_pr = rom_pr
        self.mass_zz = mass_zz    # (rz, rz)      Z^H M Z
        self.lhs_zz = lhs_zz      # (T, rz, rz)   Z^H A_t^H Z, conj thetas
        self.l_z = l_z            # (To, rz, 1)   Z^H l_t, conj thetas
        self.rhs_z = rhs_z        # (Tb, rz, 1)   Z^H b_t
        self.mass_zv = mass_zv    # (rz, rv)      Z^H M V
        self.op_zv = op_zv        # (T, rz, rv)   Z^H A_t V
        self.est_mass_z = est_mass_z  # (k, rz)   Theta R^-1 M Z
        self.est_lhs_z = est_lhs_z    # (T, k, rz) Theta R^-1 A_t^H Z
        self.est_l = est_l            # (To, k, 1) Theta R^-1 l_t

    def tree_flatten(self):
        return (self.rom_pr, self.mass_zz, self.lhs_zz, self.l_z,
                self.rhs_z, self.mass_zv, self.op_zv, self.est_mass_z,
                self.est_lhs_z, self.est_l), (self.output_kind,)

    @classmethod
    def tree_unflatten(cls, aux, ch):
        obj = object.__new__(cls)
        (obj.rom_pr, obj.mass_zz, obj.lhs_zz, obj.l_z, obj.rhs_z,
         obj.mass_zv, obj.op_zv, obj.est_mass_z, obj.est_lhs_z,
         obj.est_l) = ch
        obj.output_kind, = aux
        return obj

    def _plain_from_traj(self, traj, mu) -> jax.Array:
        outs = self.rom_pr.output(traj, mu)[0]
        if self.output_kind == "integral":
            return self.rom_pr.dt * jnp.sum(outs[1:])
        return outs[-1]

    def output_plain(self, mu: Mu) -> jax.Array:
        return self._plain_from_traj(self.rom_pr.solve(mu), mu)

    def solve_dual_reduced(self, mu: Mu):
        """((rz, nt) zeta trajectory in forward index order, eta_du)."""
        rom = self.rom_pr
        th, dt, K = rom.time_theta, rom.dt, rom.nt
        Azz = self.lhs_zz.assemble(mu)
        Szz = self.mass_zz + th * dt * Azz
        Czz = self.mass_zz - (1.0 - th) * dt * Azz
        l_r = self.l_z.assemble_vec(mu)
        integral = self.output_kind == "integral"
        # Szz already IS Z^H S^H Z (built from adjoint terms + conj thetas)
        lu = jax.scipy.linalg.lu_factor(Szz)
        zeta_K = jax.scipy.linalg.lu_solve(
            lu, dt * l_r if integral else l_r
        )

        rdtype = jnp.real(zeta_K).dtype
        estimating = self.est_mass_z is not None
        if estimating:
            skM = self.est_mass_z
            skA = self.est_lhs_z.assemble(mu)
            skl = self.est_l.assemble_vec(mu)
            # terminal residual (1/dt-scaled): rho_K = l - S^H Z zeta_K
            # (final) / dt l - S^H Z zeta_K (integral)
            lK = skl if integral else skl / dt
            rho_K = lK - _mm(skM, zeta_K) / dt - th * _mm(skA, zeta_K)
            acc0 = jnp.real(jnp.sum(jnp.abs(rho_K) ** 2)).astype(rdtype)
        else:
            acc0 = jnp.asarray(0.0, rdtype)

        def bstep(carry, _):
            zeta_next, acc = carry
            rhs = _mm(Czz, zeta_next)
            if integral:
                rhs = rhs + dt * l_r
            zeta = jax.scipy.linalg.lu_solve(lu, rhs)
            if estimating:
                rho = _mm(skM, zeta_next - zeta) / dt \
                    - _mm(skA, th * zeta + (1.0 - th) * zeta_next)
                if integral:
                    rho = rho + skl
                acc = acc + jnp.real(jnp.sum(jnp.abs(rho) ** 2))
            return (zeta, acc), zeta

        (zeta_1, acc), back = jax.lax.scan(
            bstep, (zeta_K, acc0), None, length=K - 1
        )
        zetas = jnp.concatenate([back[::-1], zeta_K[None]], axis=0)  # (K, rz)
        eta_du = jnp.sqrt(dt * acc)
        return zetas, eta_du

    def output_corrected(self, mu: Mu):
        """(s_c, eta_s): discrete-adjoint corrected output (final-time
        or time-integrated, per ``output_kind``) and the
        residual-product output indicator — one jittable call."""
        rom = self.rom_pr
        th, dt = rom.time_theta, rom.dt
        traj, eta_pr = rom.solve(mu, return_estimate=True)  # (rv, K+1)
        s = self._plain_from_traj(traj, mu)
        zetas, eta_du = self.solve_dual_reduced(mu)         # (K, rz)

        a_prev = traj[:, :-1].T  # (K, rv)
        a_cur = traj[:, 1:].T
        Ozv = self.op_zv.assemble(mu)               # (rz, rv)
        bz = self.rhs_z.assemble_vec(mu)            # (rz,)
        a_th = th * a_cur + (1.0 - th) * a_prev
        resid = _mm(a_prev - a_cur, self.mass_zv.T) \
            - dt * _mm(a_th, Ozv.T) + dt * bz[None, :]  # (K, rz)
        corr = jnp.sum(jnp.conj(zetas) * resid)
        return s + corr, eta_pr * eta_du


jax.tree_util.register_pytree_node(
    InstationaryCorrectedOutputROM,
    lambda x: x.tree_flatten(),
    InstationaryCorrectedOutputROM.tree_unflatten,
)


class InstationaryPrimalDualReductor:
    """Primal InstationaryReductor + a dual reduced basis for the
    discrete adjoint, emitting :class:`InstationaryCorrectedOutputROM`.

    ``extend(mu)`` solves both trajectories at mu and appends the leading
    POD modes of each R-orthogonal projection-error trajectory (the
    parabolic analog of the stationary primal-dual recipe); use
    ``extend_primal``/``extend_dual`` for direct control."""

    def __init__(self, fom: InstationaryFOM, embedding=None,
                 embedding_dual=None, product=None,
                 output_kind: str = "final", log_level: int = 20):
        _check_output_kind(output_kind)
        self.output_kind = output_kind
        self.fom = fom
        self.lterms = _output_terms(fom)  # validates single output
        self.primal = InstationaryReductor(
            fom, embedding=embedding, product=product, log_level=log_level
        )
        self.product = self.primal.product
        if embedding_dual is None and embedding is not None:
            embedding_dual = embedding.with_seed(embedding.seed + 77)
        self.embedding_dual = embedding_dual
        self.rb_dual = jnp.zeros((fom.solution_dim, 0))
        self.logger = get_logger("mor.instationary_pd", log_level)

    @property
    def dual_basis_size(self) -> int:
        return self.rb_dual.shape[1]

    def extend_primal(self, U) -> None:
        self.primal.extend_basis(U)

    def extend_dual(self, Z) -> None:
        from rla4mor_tpu.core.orthonormalize import gram_schmidt

        Z = jnp.asarray(Z)
        if Z.ndim == 1:
            Z = Z[:, None]
        rb = jnp.concatenate([self.rb_dual.astype(Z.dtype), Z], axis=1)
        self.rb_dual = gram_schmidt(rb, product=self.product,
                                    offset=self.dual_basis_size)

    def project_dual_trajectory(self, ztraj) -> jax.Array:
        Z = self.rb_dual
        if Z.shape[1] == 0:
            return jnp.asarray(ztraj)
        coeffs = Z.conj().T @ jnp.asarray(self.product.op.apply(ztraj))
        return jnp.asarray(ztraj) - Z @ coeffs

    def extend(self, mu: Mu, modes_per_extension: int = 1) -> None:
        from rla4mor_tpu.core.orthonormalize import pod

        traj = self.fom.solve(mu)
        err_p = self.primal.project_trajectory(traj)
        modes_p, _ = pod(err_p, product=self.product,
                         modes=modes_per_extension)
        if modes_p.shape[1]:
            self.extend_primal(modes_p)
        ztraj = solve_dual(self.fom, mu, output_kind=self.output_kind)
        err_z = self.project_dual_trajectory(ztraj)
        modes_z, _ = pod(err_z, product=self.product,
                         modes=modes_per_extension)
        if modes_z.shape[1]:
            self.extend_dual(modes_z)

    def reduce(self, pad_to=None,
               pad_dual_to=None) -> InstationaryCorrectedOutputROM:
        """Emit the corrected-output ROM.

        ``pad_to``/``pad_dual_to`` fix the primal/dual shapes for the
        no-retrace greedy (the analog of ``InstationaryReductor.reduce
        (pad_to=...)``): dead primal columns of the correction
        projections are zero (dead coords stay zero in the padded
        primal ROM), and the dead dual block gets an identity mass
        diagonal + zero couplings, so zeta is exactly zero there —
        corrected output and indicator equal the live-size ROM's
        (equivalence-tested)."""
        fom = self.fom
        V, Z = self.primal.rb, self.rb_dual
        rom_pr = self.primal.reduce(pad_to=pad_to)

        MZ = jnp.asarray(fom.mass.apply(Z))
        mass_zz = Z.conj().T @ MZ
        # Z^H A_t^H Z = (A_t Z)^H Z; conj thetas make it Z^H A(mu)^H Z
        AtZ = [jnp.asarray(t.apply(Z)) for t in fom.operator.terms]
        lhs_zz = AffineDense(
            jnp.stack([a.conj().T @ Z for a in AtZ]),
            tuple(conj_coefficient(c) for c in fom.operator.coefficients),
        )
        l_z = AffineDense(
            jnp.einsum("nr,tnl->trl", Z.conj(), self.lterms.stack),
            self.lterms.coefficients,
        )
        rhs_mat = (fom.rhs if isinstance(fom.rhs, AffineDense)
                   else _materialize_rhs(fom.rhs))
        rhs_z = AffineDense(
            jnp.einsum("nr,tnl->trl", Z.conj(), rhs_mat.stack),
            rhs_mat.coefficients,
        )
        mass_zv = Z.conj().T @ jnp.asarray(fom.mass.apply(V))
        op_zv = AffineDense(
            jnp.stack([Z.conj().T @ jnp.asarray(t.apply(V))
                       for t in fom.operator.terms]),
            fom.operator.coefficients,
        )

        est_mass_z = est_lhs_z = est_l = None
        if self.embedding_dual is not None:
            Rinv = self.product.inv
            emb = self.embedding_dual

            def sk(X):
                return jnp.asarray(emb.apply(jnp.asarray(Rinv.apply(X))))

            est_mass_z = sk(MZ)
            est_lhs_z = AffineDense(
                jnp.stack([sk(jnp.asarray(t.apply_adjoint(Z)))
                           for t in fom.operator.terms]),
                tuple(conj_coefficient(c)
                      for c in fom.operator.coefficients),
            )
            est_l = AffineDense(
                jnp.stack([sk(self.lterms.stack[t])
                           for t in range(self.lterms.n_terms)]),
                self.lterms.coefficients,
            )

        if pad_to is not None:  # zero dead-primal columns
            p = int(pad_to) - V.shape[1]
            assert p >= 0, (pad_to, V.shape)
            mass_zv = jnp.pad(mass_zv, ((0, 0), (0, p)))
            op_zv = AffineDense(
                jnp.pad(op_zv.stack, ((0, 0), (0, 0), (0, p))),
                op_zv.coefficients,
            )
        if pad_dual_to is not None:
            q = int(pad_dual_to) - Z.shape[1]
            assert q >= 0, (pad_dual_to, Z.shape)
            R = int(pad_dual_to)
            rz = Z.shape[1]
            eye_dead = jnp.zeros((R, R), mass_zz.dtype).at[
                jnp.arange(rz, R), jnp.arange(rz, R)
            ].set(1.0)
            mass_zz = jnp.pad(mass_zz, ((0, q), (0, q))) + eye_dead
            lhs_zz = AffineDense(
                jnp.pad(lhs_zz.stack, ((0, 0), (0, q), (0, q))),
                lhs_zz.coefficients,
            )
            l_z = AffineDense(
                jnp.pad(l_z.stack, ((0, 0), (0, q), (0, 0))),
                l_z.coefficients,
            )
            rhs_z = AffineDense(
                jnp.pad(rhs_z.stack, ((0, 0), (0, q), (0, 0))),
                rhs_z.coefficients,
            )
            mass_zv = jnp.pad(mass_zv, ((0, q), (0, 0)))
            op_zv = AffineDense(
                jnp.pad(op_zv.stack, ((0, 0), (0, q), (0, 0))),
                op_zv.coefficients,
            )
            if est_mass_z is not None:
                est_mass_z = jnp.pad(est_mass_z, ((0, 0), (0, q)))
                est_lhs_z = AffineDense(
                    jnp.pad(est_lhs_z.stack, ((0, 0), (0, 0), (0, q))),
                    est_lhs_z.coefficients,
                )
        return InstationaryCorrectedOutputROM(
            rom_pr, mass_zz, lhs_zz, l_z, rhs_z, mass_zv, op_zv,
            est_mass_z=est_mass_z, est_lhs_z=est_lhs_z, est_l=est_l,
            output_kind=self.output_kind,
        )


@jax.jit
def _output_indicator_sweep(rom: InstationaryCorrectedOutputROM,
                            mus_batched: Mu):
    return jax.vmap(lambda m: rom.output_corrected(m)[1])(mus_batched)


def output_pod_greedy(
    fom: InstationaryFOM,
    reductor: InstationaryPrimalDualReductor,
    training_set,
    max_extensions: int = 10,
    modes_per_extension: int = 1,
    atol: float = 0.0,
    rtol: float = 0.0,
    pad_to: Optional[int] = None,
    log_level: int = 20,
):
    """Goal-oriented POD-greedy: extend primal AND dual bases at the
    worst OUTPUT-indicator parameter (eta_s = eta_pr * eta_du). Returns
    (rom, history).

    ``pad_to=r_max`` pads BOTH bases' reduced quantities to r_max, so
    the jitted indicator sweep compiles once for the whole run (the
    goal-oriented analog of ``pod_greedy(pad_to=...)``; use on the
    remote-compile TPU platform)."""
    from rla4mor_tpu.core.parameters import mu_stack

    assert (reductor.primal.embedding is not None
            and reductor.embedding_dual is not None), (
        "output_pod_greedy drives the greedy by eta_s = eta_pr * eta_du: "
        "the reductor needs primal AND dual embeddings (with "
        "embedding=None every indicator is exactly 0 and the greedy "
        "would silently stop after one extension)"
    )
    if pad_to is not None:
        assert pad_to >= max_extensions * modes_per_extension, (
            "pad_to must hold the full final basis", pad_to
        )

    logger = get_logger("mor.output_pod_greedy", log_level)
    history = {"selected_mus": [], "max_indicators": []}
    mus_batched = mu_stack(list(training_set))

    mu0 = training_set[0]
    reductor.extend(mu0, modes_per_extension=modes_per_extension)
    history["selected_mus"].append(mu0)

    first_max = None
    rom = reductor.reduce(pad_to=pad_to, pad_dual_to=pad_to)
    for it in range(1, max_extensions):
        etas = np.asarray(_output_indicator_sweep(rom, mus_batched))
        imax = int(np.argmax(etas))
        emax = float(etas[imax])
        history["max_indicators"].append(emax)
        if first_max is None:
            first_max = emax
        logger.info("output-pod-greedy it=%d basis=%d/%d max_eta_s=%.3e",
                    it, reductor.primal.basis_size,
                    reductor.dual_basis_size, emax)
        if emax <= atol or (rtol and emax <= rtol * first_max):
            break
        mu = training_set[imax]
        reductor.extend(mu, modes_per_extension=modes_per_extension)
        history["selected_mus"].append(mu)
        rom = reductor.reduce(pad_to=pad_to, pad_dual_to=pad_to)

    if pad_to is not None:
        rom = reductor.reduce()  # hand back the live-size ROM
    return rom, history
