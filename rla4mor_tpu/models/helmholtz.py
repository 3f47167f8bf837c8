"""Damped Helmholtz FOM: a COMPLEX-coefficient model family.

    A(k) u = (K - k^2 M + i * damping * k * M) u = f

on the unit square (Q1 FEM, homogeneous Dirichlet), parameterized by the
wavenumber ``mu = {"wavenumber": (1,)}``.  The stiffness and mass
matrices are REAL; the parametric coefficient of the mass term is
COMPLEX (``-k^2 + i c k``) — exactly the complex-coefficient-over-real-
stack case the affine calculus supports (complex-aware theta promotion
and coefficient-conjugating adjoints, round-2 fixes; the reference is
complex-capable through numpy but ships no complex model).

The damping keeps A(k) invertible through the real resonances, so the
family is solvable over a wavenumber box crossing several eigenvalues —
the classic hard case for reduced-basis methods.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from rla4mor_tpu.core.affine import AffineOp
from rla4mor_tpu.core.linops import HostSparseOp
from rla4mor_tpu.core.parameters import (
    ExpressionCoefficient,
    ONE,
    ParameterSpace,
)
from rla4mor_tpu.models.stationary import StationaryFOM
from rla4mor_tpu.models.thermal_block import ThermalBlockFOM


def helmholtz_fom(
    num_intervals: int = 32,
    wavenumber_range: Tuple[float, float] = (2.0, 12.0),
    damping: float = 0.5,
) -> StationaryFOM:
    """Build the damped Helmholtz FOM (reusing the thermal-block FEM)."""
    tb = ThermalBlockFOM((1, 1), num_intervals)
    K = tb.operator.terms[0].S        # unit-coefficient stiffness
    M = tb.l2_product.op.S            # consistent mass

    c = float(damping)

    def theta_mass(mu):
        k = mu["wavenumber"][0]
        return -(k ** 2) + 1j * c * k

    operator = AffineOp(
        (HostSparseOp(K), HostSparseOp(M)),
        (ONE, ExpressionCoefficient(theta_mass, name="-k^2+ick")),
    )
    space = ParameterSpace.make(
        {"wavenumber": 1}, wavenumber_range[0], wavenumber_range[1]
    )
    fom = StationaryFOM(
        operator,
        tb.rhs,
        output_functional=tb.output_functional,
        products=tb.products,
        parameter_space=space,
        name=f"helmholtz_n{num_intervals}_c{c}",
    )
    fom.h1_0_product = tb.h1_0_product
    return fom
