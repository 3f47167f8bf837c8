"""Host FEM Gaussian-bump FOM: the oracle-scale NON-AFFINE family.

The pod-scale non-affine path lives in ``models/stencil_nonaffine.py``
(device stencils + EIM).  This module provides the same Gaussian-bump
diffusion problem at oracle scale on the host FEM path: the Q1
stiffness is assembled per-mu with the bump coefficient field, MDEIM
(``mor/eim.py``) turns the non-affine sparse operator family into a
standard :class:`~rla4mor_tpu.core.affine.AffineOp`, and the result is
a plain :class:`~rla4mor_tpu.models.stationary.StationaryFOM` every
affine consumer (SketchedReductor, certified optimization/UQ) runs on
unchanged.

The coefficient field is bounded below by ``kappa0`` (the bump is
nonnegative), so the EXACT operator is coercive with
``alpha(mu) >= min_e kappa_e(mu)`` in the kappa=1 stiffness metric —
:func:`bump_coercivity` returns that jittable lower bound (the MDEIM
surrogate inherits it up to the interpolation error, which ``mdeim``'s
reserve-point indicator controls).

Reference note: the reference has no non-affine machinery at all; its
thermal-block tests (preconditioners/tests.py:354-356) are the affine
analog of this fixture.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
import scipy.sparse as sps

from rla4mor_tpu.core.affine import AffineDense, AffineOp
from rla4mor_tpu.core.linops import DenseOp
from rla4mor_tpu.core.parameters import ONE, Mu, ParameterSpace
from rla4mor_tpu.core.products import Product
from rla4mor_tpu.models.stationary import StationaryFOM
from rla4mor_tpu.models.stencil_nonaffine import gaussian_bump_field
from rla4mor_tpu.models.thermal_block import _K_EL, _assemble, _element_nodes


def bump_host_fom(
    nx: int = 12,
    n_train_per_dim: int = 6,
    n_train_random: int = 200,
    mdeim_tol: float = 1e-8,
    reserve: int = 2,
    **field_kw,
) -> StationaryFOM:
    """Gaussian-bump diffusion FOM on the host FEM path via MDEIM.

    ``mu['bump'] = (cx, cy, w)`` in ``[0, 1]^3`` (affinely mapped inside
    :func:`~rla4mor_tpu.models.stencil_nonaffine.gaussian_bump_field`).
    The operator is the MDEIM affine surrogate fit on a
    ``n_train_per_dim^3`` tensor grid with JITTABLE element-local
    magic-entry online thetas (exact entries, O(n_terms) per mu), so
    ``fom.solve``/``assemble_sparse`` AND jitted reduced solves work
    verbatim.  Attributes beyond
    StationaryFOM: ``kappa_field(mu)`` (per-element coefficients),
    ``exact_assemble(mu)`` (the exact csr), ``num_intervals``.
    """
    from rla4mor_tpu.mor.eim import mdeim

    n_nodes = (nx + 1) ** 2
    el_nodes = _element_nodes(nx)
    field = gaussian_bump_field(**field_kw)
    h = 1.0 / nx
    c = (np.arange(nx) + 0.5) * h
    X, Y = np.meshgrid(c, c, indexing="xy")
    Xj, Yj = jnp.asarray(X), jnp.asarray(Y)
    ix, iy = np.meshgrid(np.arange(nx + 1), np.arange(nx + 1),
                         indexing="xy")
    interior = np.where(
        (ix.ravel() > 0) & (ix.ravel() < nx)
        & (iy.ravel() > 0) & (iy.ravel() < nx)
    )[0]
    restrict = sps.coo_matrix(
        (np.ones(interior.size), (np.arange(interior.size), interior)),
        shape=(interior.size, n_nodes),
    ).tocsr()

    def kappa_field(mu: Mu):
        return field(mu, Xj, Yj)

    def exact_assemble(mu: Mu) -> sps.csr_matrix:
        w = np.asarray(kappa_field(mu))
        A = _assemble(el_nodes, _K_EL, n_nodes, w.ravel())
        Ai = (restrict @ A @ restrict.T).tocsr()
        Ai.sort_indices()
        return Ai

    space = ParameterSpace.make({"bump": 3})
    # tensor grid + random fill-in: the grid alone misses narrow bumps
    # centered between grid points (off-grid sup error ~1e-4 at
    # n_train_per_dim=6; the random half closes that generalization gap)
    train = list(space.sample_uniformly(n_train_per_dim))
    train += list(space.sample_randomly(n_train_random, key=20240819))
    op = mdeim([exact_assemble(mu) for mu in train], tol=mdeim_tol,
               reserve=reserve)

    # Jittable O(M) magic-entry evaluation (the grid-independent online
    # theta path the MDEIM design intends): each active magic position
    # (r, c) of the interior-restricted stiffness is a fixed sum of
    # kappa_e * K_EL[a, b] over the <= 4 elements whose node pair
    # (a, b) hits (r, c) — precompute (element id, K_EL weight) tables
    # once, then ``entries(mu)`` is a pure gather + weighted sum.
    P = op.n_terms
    rows_g = interior[np.asarray(op.magic_rows[:P])]
    cols_g = interior[np.asarray(op.magic_cols[:P])]
    from collections import defaultdict

    contrib = defaultdict(list)
    for e in range(el_nodes.shape[0]):
        nd = el_nodes[e]
        for a in range(4):
            for b in range(4):
                contrib[(int(nd[a]), int(nd[b]))].append((e, _K_EL[a, b]))
    max_c = max(len(contrib[(int(r), int(c))])
                for r, c in zip(rows_g, cols_g))
    elem_idx = np.zeros((P, max_c), np.int32)
    kel_w = np.zeros((P, max_c))
    for p, (r, c) in enumerate(zip(rows_g, cols_g)):
        for j, (e, k) in enumerate(contrib[(int(r), int(c))]):
            elem_idx[p, j] = e
            kel_w[p, j] = k
    elem_idx_j = jnp.asarray(elem_idx)
    kel_w_j = jnp.asarray(kel_w)

    def entries(mu):
        kappa = kappa_field(mu).ravel()
        return jnp.sum(kappa[elem_idx_j] * kel_w_j, axis=1)

    operator = op.affine_op(entries)

    load = np.zeros(n_nodes)
    np.add.at(load, el_nodes.ravel(), h * h / 4.0)
    rhs_vec = load[interior]
    rhs = AffineOp((DenseOp(rhs_vec.reshape(-1, 1)),), (ONE,))
    out = AffineDense(jnp.asarray(rhs_vec).reshape(1, 1, -1), (ONE,))

    K1 = _assemble(el_nodes, _K_EL, n_nodes)
    h1_0 = Product.from_sparse(restrict @ K1 @ restrict.T)

    fom = StationaryFOM(
        operator,
        rhs,
        output_functional=out,
        products={"h1_0": h1_0},
        parameter_space=space,
        name=f"bump_host_n{nx}",
    )
    fom.h1_0_product = h1_0
    fom.kappa_field = kappa_field
    fom.exact_assemble = exact_assemble
    fom.num_intervals = nx
    fom.mdeim_op = op
    return fom


def bump_coercivity(fom):
    """Jittable coercivity lower bound of the bump family in the
    ``h1_0`` (kappa=1 stiffness) metric:
    ``alpha(mu) >= min_e kappa_e(mu)`` since every Q1 element stiffness
    contribution is PSD.  Valid for the exact operator; the MDEIM
    surrogate inherits it up to the interpolation error."""
    kappa_field = fom.kappa_field

    def alpha(mu: Mu):
        return jnp.min(kappa_field(mu))

    return alpha
