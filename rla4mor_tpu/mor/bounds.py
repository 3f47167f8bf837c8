"""Coercivity lower bounds: residual estimates -> rigorous error bounds.

The reference's estimators (and this framework's, so far) are residual
norms — error INDICATORS. For parametrically coercive problems
(SPD affine terms with positive coefficients, e.g. the thermal block)
the classic min-theta bound

    alpha_LB(mu) = alpha(mu_ref) * min_q  theta_q(mu) / theta_q(mu_ref)

is a rigorous coercivity lower bound (Rozza/Huynh/Patera; pyMOR's
``MinThetaParameterFunctional``), and

    ||u - u_r||_R  <=  ||r(u_r)||_{R^-1} / alpha_LB(mu)

upgrades the Riesz residual norm to a TRUE error bound. With the
SKETCHED residual the bound holds up to the embedding distortion
(1 +- epsilon), like every sketched quantity here.

Offline cost: one smallest generalized eigenvalue of (A(mu_ref), R) on
the host (scipy eigsh); online alpha_LB is a jittable min over T
coefficient ratios, so ``error_bound`` vmaps over parameter batches.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sps
import scipy.sparse.linalg as spla

from rla4mor_tpu.core.parameters import Mu, eval_coefficients


class MinThetaCoercivity:
    """alpha_LB(mu) for a parametrically coercive affine operator.

    ``fom``: StationaryFOM with host-sparse SPD terms and positive
    coefficients over the parameter domain; ``mu_ref``: the reference
    parameter; ``product``: the R defining the coercivity norm (defaults
    to the FOM operator at mu_ref itself, making alpha_ref == 1).
    """

    def __init__(self, fom, mu_ref: Mu, product=None):
        self.coefficients = tuple(fom.operator.coefficients)
        self.theta_ref = jnp.asarray(
            eval_coefficients(self.coefficients, mu_ref)
        )
        assert bool(jnp.all(self.theta_ref > 0)), (
            "min-theta needs positive reference coefficients"
        )
        A_ref = fom.assemble_sparse(mu_ref)
        if product is None:
            self.alpha_ref = 1.0  # coercivity of A(mu_ref) w.r.t. itself
        else:
            R = sps.csc_matrix(product.op.S) if hasattr(
                product.op, "S") else sps.csc_matrix(
                np.asarray(product.op.matrix()))
            # smallest generalized eigenvalue of (sym(A_ref), R)
            A_sym = 0.5 * (A_ref + A_ref.conj().T)
            w = spla.eigsh(A_sym, k=1, M=R, sigma=0, which="LM",
                           return_eigenvectors=False)
            self.alpha_ref = float(w[0])
            assert self.alpha_ref > 0, "operator not coercive at mu_ref"

    def __call__(self, mu: Mu) -> jax.Array:
        """Jittable alpha_LB(mu) = alpha_ref * min_q theta_q/theta_ref_q."""
        theta = eval_coefficients(self.coefficients, mu).astype(
            self.theta_ref.dtype
        )
        return self.alpha_ref * jnp.min(theta / self.theta_ref)


def error_bound(rom, mu: Mu, coercivity: MinThetaCoercivity,
                u_r=None) -> jax.Array:
    """Rigorous (up to sketch distortion) R-norm error bound:
    sketched residual norm / alpha_LB(mu). Jittable, vmappable."""
    if u_r is None:
        u_r = rom.solve(mu)
    return rom.error_estimator.estimate_error(u_r, mu) / coercivity(mu)
