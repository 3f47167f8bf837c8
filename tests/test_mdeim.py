"""Matrix-DEIM (mor/eim.py::mdeim / MdeimOperator): affine surrogates of
NON-affine parametric SPARSE operators — the host-FEM-path companion of
the stencil EIM families.

Source problem: the Q1 FEM stiffness assembled with a Gaussian-bump
per-element conductivity (thermal_block._assemble with element weights)
— genuinely non-affine in mu, fixed sparsity pattern.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sps

from rla4mor_tpu.mor import MdeimOperator, mdeim  # noqa: F401
from rla4mor_tpu.models.stencil_nonaffine import gaussian_bump_field
from rla4mor_tpu.models.thermal_block import (
    _K_EL,
    _assemble,
    _element_nodes,
)


def _bump_stiffness_problem(nx=12):
    """(assemble(mu) -> csr on interior nodes, mus sampler, rhs vector)."""
    n_nodes = (nx + 1) ** 2
    el_nodes = _element_nodes(nx)
    field = gaussian_bump_field()
    h = 1.0 / nx
    c = (np.arange(nx) + 0.5) * h
    X, Y = np.meshgrid(c, c, indexing="xy")
    ix, iy = np.meshgrid(np.arange(nx + 1), np.arange(nx + 1),
                         indexing="xy")
    interior = np.where(
        (ix.ravel() > 0) & (ix.ravel() < nx)
        & (iy.ravel() > 0) & (iy.ravel() < nx)
    )[0]
    R = sps.coo_matrix(
        (np.ones(interior.size), (np.arange(interior.size), interior)),
        shape=(interior.size, n_nodes),
    ).tocsr()

    def assemble(mu):
        w = np.asarray(field(mu, jnp.asarray(X), jnp.asarray(Y)))
        A = _assemble(el_nodes, _K_EL, n_nodes, w.ravel())
        Ai = (R @ A @ R.T).tocsr()
        Ai.sort_indices()
        # fixed pattern across mus: the unweighted assembly's pattern
        return Ai

    load = np.zeros(n_nodes)
    np.add.at(load, el_nodes.ravel(), h * h / 4.0)
    return assemble, load[interior]


def _mus(count, key=0):
    from rla4mor_tpu.core.parameters import ParameterSpace

    return ParameterSpace.make({"bump": 3}).sample_randomly(count, key=key)


def _mus_grid(per_dim):
    from rla4mor_tpu.core.parameters import ParameterSpace

    return ParameterSpace.make({"bump": 3}).sample_uniformly(per_dim)


def test_mdeim_reconstructs_operator():
    """Training matrices reproduce to tol; held-out mus to the
    generalization scale; the indicator lower-bounds the true nnz error;
    assemble() == sum theta_q A_q."""
    assemble, _ = _bump_stiffness_problem(nx=12)
    train = _mus_grid(5)
    mats = [assemble(mu) for mu in train]
    op = mdeim(mats, tol=1e-6, reserve=3)
    assert op.interpolant.n_reserve == 3
    assert op.n_terms < len(train)

    scale = max(np.abs(A.data).max() for A in mats)
    for A in mats[:5]:
        th = op.theta_from_matrix(A)
        err = np.abs((op.assemble(th) - A).data).max()
        assert err < 1e-5 * scale

    worst = 0.0
    for mu in _mus(3, key=99):
        A = assemble(mu)
        th = op.theta_from_matrix(A)
        diff = op.assemble(th) - A
        true_err = np.abs(diff.data).max() if diff.nnz else 0.0
        ind = op.indicator_from_matrix(A)
        assert ind <= true_err * (1 + 1e-9) + 1e-14
        worst = max(worst, true_err)
    assert worst < 5e-2 * scale  # held-out generalization

    # magic positions point at real entries: entries_from_matrix equals
    # A[rows, cols]
    A = mats[0]
    e = op.entries_from_matrix(A)
    direct = np.asarray(
        A[op.magic_rows, op.magic_cols]
    ).ravel()
    np.testing.assert_allclose(e, direct, rtol=1e-14)


def test_mdeim_pattern_mismatch_rejected():
    assemble, _ = _bump_stiffness_problem(nx=8)
    A = assemble(_mus(1, key=1)[0])
    B = sps.eye(A.shape[0], format="csr")
    with pytest.raises(AssertionError, match="sparsity pattern"):
        mdeim([A, B])


def test_mdeim_affine_op_and_sketched_reductor():
    """The MDEIM AffineOp drives the existing affine machinery: apply ==
    exact A(mu) u to the surrogate's accuracy, and the sketched RB
    reductor runs end-to-end on the non-affine sparse FOM."""
    from rla4mor_tpu.core.affine import AffineOp
    from rla4mor_tpu.core.linops import DenseOp
    from rla4mor_tpu.core.parameters import ONE
    from rla4mor_tpu.models.stationary import StationaryFOM
    from rla4mor_tpu.mor import SketchedReductor
    from rla4mor_tpu.ops import GaussianEmbedding

    nx = 12
    assemble, rhs_vec = _bump_stiffness_problem(nx=nx)
    train = _mus_grid(5)
    op = mdeim([assemble(mu) for mu in train], tol=1e-7, reserve=2)

    def entries(mu):
        # online theta: M matrix entries; here read from the assembled
        # matrix (a real FEM code evaluates M local element integrals)
        return jnp.asarray(op.entries_from_matrix(assemble(mu))
                           [: op.n_terms])

    affine = op.affine_op(entries)
    mu = _mus(1, key=7)[0]
    u = np.random.default_rng(0).standard_normal((affine.source_dim, 2))
    got = np.asarray(affine.apply(jnp.asarray(u), mu=mu))
    want = assemble(mu) @ u
    rel = np.abs(got - want).max() / np.abs(want).max()
    assert rel < 1e-3, rel

    fom = StationaryFOM(
        operator=affine,
        rhs=AffineOp((DenseOp(rhs_vec.reshape(-1, 1)),), (ONE,)),
    )
    theta_emb = GaussianEmbedding.make(fom.solution_dim, range_dim=64,
                                       seed=3)
    red = SketchedReductor(fom, embedding_primal=theta_emb, log_level=30)
    mus_fit = _mus(3, key=11)
    red.extend_basis(fom.solve_many(mus_fit))
    rom = red.reduce(seed=5)
    mu_t = mus_fit[1]  # in-basis mu: tiny RB error, finite estimate
    u_r = red.reconstruct(rom.solve(mu_t))
    u_t = np.asarray(fom.solve(mu_t))
    rel = np.linalg.norm(np.asarray(u_r) - u_t) / np.linalg.norm(u_t)
    assert rel < 1e-6, rel
    assert np.isfinite(float(rom.estimate_error(mu_t)))


def test_mdeim_roundtrip(tmp_path):
    from rla4mor_tpu.mor import load_mdeim_operator, save_mdeim_operator

    assemble, _ = _bump_stiffness_problem(nx=10)
    mats = [assemble(mu) for mu in _mus_grid(3)]
    op = mdeim(mats, tol=1e-5, reserve=2)
    path = tmp_path / "mdeim.npz"
    save_mdeim_operator(op, path)
    back = load_mdeim_operator(path)
    assert back.shape == op.shape and back.n_terms == op.n_terms
    np.testing.assert_array_equal(back.indices, op.indices)
    np.testing.assert_array_equal(back.magic_rows, op.magic_rows)
    A = mats[1]
    np.testing.assert_allclose(
        np.asarray(back.theta_from_matrix(A)),
        np.asarray(op.theta_from_matrix(A)), atol=1e-14)
    assert (back.assemble(back.theta_from_matrix(A)) != op.assemble(
        op.theta_from_matrix(A))).nnz == 0


def test_mdeim_does_not_mutate_caller_matrices():
    """tocsr() returns the matrix itself when already CSR; mdeim and the
    entry/indicator readers must canonicalize on a COPY, never permuting
    user-owned data/indices arrays in place."""
    assemble, _ = _bump_stiffness_problem(nx=8)
    mus = _mus_grid(2)
    # unsorted-indices CSR (CSR*CSR products come out unsorted)
    mats = []
    for mu in mus:
        A = assemble(mu)
        P = sps.random(A.shape[0], A.shape[0], density=0.0,
                       format="csr") + sps.eye(A.shape[0], format="csr")
        B = (P @ A @ P).tocsr()  # same values, possibly unsorted
        B.has_sorted_indices = False  # force the canonicalization path
        mats.append(B)
    before = [(m.indices.copy(), m.data.copy()) for m in mats]
    op = mdeim(mats, tol=1e-4, reserve=1)
    op.entries_from_matrix(mats[0])
    if op.interpolant.n_reserve:  # tiny training may exhaust the reserve
        op.indicator_from_matrix(mats[0])
    for m, (idx, dat) in zip(mats, before):
        np.testing.assert_array_equal(m.indices, idx)
        np.testing.assert_array_equal(m.data, dat)
