"""Primal-dual sketched RB: dual-corrected outputs + output error indicator.

Beyond-reference completeness (the reference projects output functionals,
mor/sketched_reductor.py:55-59, but offers NO output error control; pyMOR
users expect the classic primal-dual machinery): for a single-output FOM
``s(mu) = c(mu) u(mu)`` the dual problem is ``A(mu)^H z = c(mu)^H``, and
the dual-weighted residual correction

    s_c(mu) = c u_r + z_r^H (b(mu) - A(mu) u_r)

satisfies s - s_c = (z - z_r)^H A (u - u_r) — a PRODUCT of the two
approximation errors (exact when either basis captures its solution;
tested in the exact-dual limit). The practical gain over the plain
Galerkin output is the relative dual approximation error, so it grows
as the dual basis is trained. Both factors are
estimated by the existing SKETCHED residual machinery, giving the output
error indicator ``eta_s = eta_pr * eta_du`` (residual product; a rigorous
bound needs an inf-sup/coercivity lower bound, which is
parameter-dependent — like the reference's residual estimators this is an
indicator, tested to track the true error).

Everything online is dense-affine: the correction terms are the
Petrov-Galerkin projections ``Z^H b`` and ``Z^H A V`` (offline), so
``CorrectedOutputROM`` is a pytree whose corrected output + indicator jit
and vmap over parameter batches like every other ROM here.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import scipy.sparse as sps

from rla4mor_tpu.core.affine import AffineOp, as_affine, project
from rla4mor_tpu.core.linops import HostSparseOp
from rla4mor_tpu.core.parameters import Mu, conj_coefficient
from rla4mor_tpu.core.products import Product
from rla4mor_tpu.models.stationary import StationaryFOM, StationaryROM
from rla4mor_tpu.mor.sketched_reductor import SketchedReductor
from rla4mor_tpu.ops.embeddings import Embedding
from rla4mor_tpu.utils.logger import get_logger


def dual_fom(fom: StationaryFOM) -> StationaryFOM:
    """The dual problem ``A(mu)^H z = c(mu)^H`` as a StationaryFOM.

    Host-sparse terms are explicitly conj-transposed (the generic
    ``AffineOp.H`` wraps adjoints, but the FOM's sparse direct solver
    needs real ``.S`` matrices); coefficients are conjugated (real box
    parameters make this the identity in practice)."""
    of = as_affine(fom.output_functional)
    assert of.range_dim == 1, "dual correction supports single outputs"
    op = as_affine(fom.operator)
    terms = []
    for t in op.terms:
        S = getattr(t, "S", None)
        assert S is not None, (
            "dual_fom needs host-sparse operator terms (HostSparseOp)"
        )
        terms.append(HostSparseOp(sps.csr_matrix(S.conj().T)))
    dual_op = AffineOp(
        tuple(terms), tuple(conj_coefficient(c) for c in op.coefficients)
    )
    rhs = of.H  # (To, n, 1): c(mu)^H as an affine rhs
    return StationaryFOM(
        operator=dual_op,
        rhs=rhs,
        products=fom.products,
        parameter_space=fom.parameter_space,
        name=fom.name + "_dual",
    )


class CorrectedOutputROM:
    """Pytree: primal ROM + dual ROM + offline correction projections."""

    def __init__(self, rom_pr: StationaryROM, rom_du: StationaryROM,
                 rhs_z, op_zv):
        self.rom_pr = rom_pr
        self.rom_du = rom_du
        self.rhs_z = rhs_z    # (T_b, r_z, 1) AffineDense: Z^H b
        self.op_zv = op_zv    # (T, r_z, r_v) AffineDense: Z^H A V

    def tree_flatten(self):
        return (self.rom_pr, self.rom_du, self.rhs_z, self.op_zv), ()

    @classmethod
    def tree_unflatten(cls, aux, ch):
        obj = object.__new__(cls)
        obj.rom_pr, obj.rom_du, obj.rhs_z, obj.op_zv = ch
        return obj

    def output_plain(self, mu: Mu) -> jax.Array:
        u_r = self.rom_pr.solve(mu)
        return self.rom_pr.output(u_r, mu)[0]

    def output_corrected(self, mu: Mu):
        """(s_c, eta_s): dual-corrected output and the residual-product
        output error indicator — one jittable/vmappable call."""
        u_r = self.rom_pr.solve(mu)
        z_r = self.rom_du.solve(mu)
        s = self.rom_pr.output(u_r, mu)[0]
        corr = jnp.vdot(
            z_r,
            self.rhs_z.assemble_vec(mu) - self.op_zv.apply(u_r, mu),
        )
        eta_pr = self.rom_pr.error_estimator.estimate_error(u_r, mu)
        eta_du = self.rom_du.error_estimator.estimate_error(z_r, mu)
        return s + corr, eta_pr * eta_du


jax.tree_util.register_pytree_node(
    CorrectedOutputROM,
    lambda x: x.tree_flatten(),
    CorrectedOutputROM.tree_unflatten,
)


class PrimalDualReductor:
    """Two sketched reductors (primal on (A, b), dual on (A^H, c^H)) and
    the corrected-output ROM emission.

    ``extend(mu)`` solves BOTH problems at mu and extends both bases
    (dual snapshots at the primal greedy's parameters is the standard
    recipe); pass precomputed solutions via ``extend_primal``/
    ``extend_dual`` to control the bases independently."""

    def __init__(
        self,
        fom: StationaryFOM,
        embedding_primal: Embedding,
        embedding_dual: Optional[Embedding] = None,
        embedding_online: Optional[Embedding] = None,
        product: Optional[Product] = None,
        log_level: int = 20,
    ):
        self.fom = fom
        self.fom_dual = dual_fom(fom)
        self.primal = SketchedReductor(
            fom, embedding_primal=embedding_primal,
            embedding_online=embedding_online, product=product,
            orthonormalize=True, log_level=log_level,
        )
        emb_du = (embedding_dual if embedding_dual is not None
                  else embedding_primal.with_seed(embedding_primal.seed + 77))
        self.dual = SketchedReductor(
            self.fom_dual, embedding_primal=emb_du,
            embedding_online=embedding_online, product=product,
            orthonormalize=True, log_level=log_level,
        )
        self.logger = get_logger("mor.primal_dual", log_level)

    def extend(self, mu: Mu) -> None:
        self.primal.extend_basis(self.fom.solve(mu), mu=mu)
        self.dual.extend_basis(self.fom_dual.solve(mu), mu=mu)

    def extend_primal(self, U, mu=None) -> None:
        self.primal.extend_basis(U, mu=mu)

    def extend_dual(self, Z, mu=None) -> None:
        self.dual.extend_basis(Z, mu=mu)

    def reduce(self, seed=None) -> CorrectedOutputROM:
        rom_pr = self.primal.reduce(seed=seed)
        rom_du = self.dual.reduce(
            seed=None if seed is None else seed + 1000
        )
        Z, V = self.dual.rb, self.primal.rb
        rhs_z = project(self.fom.rhs, Z, None)
        op_zv = project(self.fom.operator, Z, V)
        return CorrectedOutputROM(rom_pr, rom_du, rhs_z, op_zv)


@jax.jit
def _output_indicator_sweep(rom: CorrectedOutputROM, mus_batched: Mu):
    """Vmapped eta_s over a parameter batch (module-level jit: cached by
    the ROM pytree's shapes, so only basis growth retraces)."""
    return jax.vmap(lambda m: rom.output_corrected(m)[1])(mus_batched)


def output_greedy(
    fom: StationaryFOM,
    reductor: PrimalDualReductor,
    training_set,
    max_extensions: int = 10,
    atol: float = 0.0,
    rtol: float = 0.0,
    online_seed: int = 0,
    log_level: int = 20,
):
    """Goal-oriented greedy: extend primal AND dual bases at the worst
    OUTPUT-indicator parameter (eta_s = eta_pr * eta_du), the standard
    primal-dual recipe. Returns (rom, history)."""
    from rla4mor_tpu.core.parameters import mu_stack

    import numpy as np

    logger = get_logger("mor.output_greedy", log_level)
    history = {"selected_mus": [], "max_indicators": []}
    mus_batched = mu_stack(list(training_set))

    mu0 = training_set[0]
    reductor.extend(mu0)
    history["selected_mus"].append(mu0)

    first_max = None
    rom = reductor.reduce(seed=online_seed)
    for it in range(1, max_extensions):
        etas = np.asarray(_output_indicator_sweep(rom, mus_batched))
        imax = int(np.argmax(etas))
        emax = float(etas[imax])
        history["max_indicators"].append(emax)
        if first_max is None:
            first_max = emax
        logger.info("output-greedy it=%d basis=%d max_eta_s=%.3e", it,
                    reductor.primal.basis_size, emax)
        if emax <= atol or (rtol and emax <= rtol * first_max):
            break
        mu = training_set[imax]
        reductor.extend(mu)
        history["selected_mus"].append(mu)
        rom = reductor.reduce(seed=online_seed + it)

    return rom, history
