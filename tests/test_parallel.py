"""Multi-chip sharding tests on the 8-virtual-device CPU mesh:
sharded sketches == single-device blocked oracles (SURVEY §4: "sharded
sketch ≡ single-chip sketch"), stencil FOM == assembled FOM, and the
fully-sharded greedy training step."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from rla4mor_tpu.models import ThermalBlockFOM
from rla4mor_tpu.models.stencil import StencilThermalBlock, interior_mask
from rla4mor_tpu.parallel import (
    gaussian_sketch_blocked,
    gaussian_sketch_sharded,
    make_mesh,
    make_sharded_greedy_step,
    srht_blocked,
    srht_sketch_sharded,
)


@pytest.fixture(scope="module")
def mesh():
    assert jax.device_count() >= 8
    return make_mesh(8, ("dof",))


def test_gaussian_sharded_equals_blocked(mesh, rng):
    key = jax.random.key(3)
    n, k, m = 512, 33, 5
    x = jnp.asarray(rng.normal(size=(n, m)))
    g1 = np.asarray(gaussian_sketch_blocked(key, k, x, 8))
    g2 = np.asarray(gaussian_sketch_sharded(key, k, x, mesh))
    assert np.array_equal(g1, g2) or np.abs(g1 - g2).max() < 1e-12


def test_gaussian_sharded_chunked_equals_unchunked(mesh, rng):
    """Column-chunked local Omega generation (the pod-scale HBM guard:
    an unchunked (k, n_local) strip peaks at ~3x its size during tile
    generation) produces the same sketch as the single-chunk path."""
    key = jax.random.key(3)
    n, k, m = 512, 33, 5
    x = jnp.asarray(rng.normal(size=(n, m)))
    g1 = np.asarray(gaussian_sketch_sharded(key, k, x, mesh))
    # force 4 chunks per local strip (n_local=64 -> width 16)
    g2 = np.asarray(gaussian_sketch_sharded(key, k, x, mesh,
                                            max_omega_elems=16 * k))
    assert np.abs(g1 - g2).max() < 1e-12


def test_srht_sharded_equals_blocked(mesh, rng):
    key = jax.random.key(4)
    n, k, m = 1024, 57, 3
    x = jnp.asarray(rng.normal(size=(n, m)))
    s1 = np.asarray(srht_blocked(key, k, x, 8))
    s2 = np.asarray(srht_sketch_sharded(key, k, x, mesh))
    assert np.abs(s1 - s2).max() < 1e-12


def test_one_seed_one_operator_across_layouts(mesh, rng):
    """VERDICT round 1 weak #3: the same seed must name the SAME operator
    on every code path — embedding zoo (full matrix), row-blocked, and
    mesh-sharded (canonical tile derivation, ops/seeding.py)."""
    from rla4mor_tpu.ops.embeddings import (
        BlockGaussianEmbedding,
        GaussianEmbedding,
    )
    from rla4mor_tpu.parallel.embeddings import (
        ShardedGaussianEmbedding,
        ShardedSrhtEmbedding,
    )
    from rla4mor_tpu.ops.fwht import srht

    k, n, seed = 70, 1024, 3
    g = GaussianEmbedding(k, n, seed)
    bg = BlockGaussianEmbedding(k, n, seed, None, max_block_size=32)
    sg = ShardedGaussianEmbedding(k, n, mesh, seed)
    M = np.asarray(g.random_matrix())
    assert np.array_equal(M, np.asarray(bg.random_matrix()))
    assert np.array_equal(M, np.asarray(sg.matrix()))

    x = jnp.asarray(rng.normal(size=(n, 5)))
    y_host = np.asarray(g.apply(x))
    with mesh:
        y_sh = np.asarray(sg.apply(x))
    assert np.abs(y_host - y_sh).max() < 1e-12

    # SRHT: sharded == the embedding-zoo srht kernel, not just its own oracle
    ss = ShardedSrhtEmbedding(16, n, mesh, seed)
    with mesh:
        y1 = np.asarray(ss.apply(x))
    y2 = np.asarray(srht(x.T, 16, jax.random.key(seed)).T)
    assert np.abs(y1 - y2).max() < 1e-12


def test_sharded_precond_sketch_matches_host(mesh, rng):
    """VERDICT r1 next #7: u_u-key preconditioner sketching with a
    DoF-sharded range embedding (per-shard canonical generation + psum,
    reference's blockwise loop preconditioned_reductor.py:169-200) equals
    the host GaussianEmbedding path at the same seed."""
    from rla4mor_tpu.core.affine import AffineOp
    from rla4mor_tpu.core.linops import DenseOp
    from rla4mor_tpu.core.parameters import ONE, ParameterSpace, \
        ProjectionCoefficient
    from rla4mor_tpu.models.stationary import StationaryFOM
    from rla4mor_tpu.ops import GaussianEmbedding, VectorizedEmbedding
    from rla4mor_tpu.parallel.embeddings import ShardedGaussianEmbedding
    from rla4mor_tpu.precond import PreconditionedReductor

    n, K_dim = 64, 6
    # synthetic SPD affine FOM: A(mu) = mu_0 A_0 + mu_1 A_1
    mats = []
    for t in range(2):
        M = rng.normal(size=(n, n))
        mats.append(jnp.asarray(M @ M.T + n * np.eye(n)))
    operator = AffineOp(
        tuple(DenseOp(M) for M in mats),
        tuple(ProjectionCoefficient("diffusion", t) for t in range(2)),
    )
    rhs = AffineOp((DenseOp(jnp.asarray(rng.normal(size=(n, 1)))),), (ONE,))
    space = ParameterSpace.make({"diffusion": 2}, 0.5, 2.0)
    fom = StationaryFOM(operator, rhs, parameter_space=space)

    mus = space.sample_randomly(3, key=1)
    U = jnp.stack(
        [jnp.linalg.solve(operator.assemble_dense(mu),
                          rhs.assemble_dense(mu)[:, 0]) for mu in mus],
        axis=1,
    )
    from rla4mor_tpu.core.orthonormalize import gram_schmidt

    u_basis = gram_schmidt(U)

    def build(range_emb):
        vec = VectorizedEmbedding(
            embedding=GaussianEmbedding.make(
                K_dim * K_dim, range_dim=K_dim, seed=30
            ),
            rows=K_dim, cols=K_dim,
        )
        return PreconditionedReductor(
            fom=fom,
            reduced_basis=u_basis,
            source_bases={"u_u": None},
            range_bases={"u_u": None},
            source_embeddings={
                "u_u": GaussianEmbedding.make(n, range_dim=K_dim, seed=10)
            },
            range_embeddings={"u_u": range_emb},
            vec_embeddings={"u_u": vec},
            residual_embedding=GaussianEmbedding.make(
                n, range_dim=40, seed=40
            ),
            log_level=30,
        )

    host_emb = GaussianEmbedding(K_dim, n, 20)
    shard_emb = ShardedGaussianEmbedding(K_dim, n, mesh, 20)
    red_h = build(host_emb)
    with mesh:
        red_s = build(shard_emb)
    P = DenseOp(jnp.linalg.inv(operator.assemble_dense(mus[0])))
    W_h = np.asarray(red_h.sketch_preconditioner(P, "u_u"))
    with mesh:
        W_s = np.asarray(red_s.sketch_preconditioner(P, "u_u"))
    scale = np.abs(W_h).max()
    assert np.abs(W_h - W_s).max() < 1e-12 * scale
    rhs_h = np.asarray(red_h.hs_estimators_rhs["u_u"])
    rhs_s = np.asarray(red_s.hs_estimators_rhs["u_u"])
    assert np.abs(rhs_h - rhs_s).max() < 1e-12 * max(1.0, np.abs(rhs_h).max())


def test_srht_blocked_is_isometric_in_expectation(rng):
    key = jax.random.key(5)
    x = jnp.asarray(rng.normal(size=(256,)))
    y = np.asarray(srht_blocked(key, 2048, x, 8))
    assert abs(np.linalg.norm(y) / np.linalg.norm(np.asarray(x)) - 1) < 0.1


def test_stencil_matches_assembled():
    """Matrix-free stencil apply == scipy-assembled operator terms."""
    nx = 12
    fom = ThermalBlockFOM((2, 2), nx)
    st = StencilThermalBlock((2, 2), nx, dtype=jnp.float64)
    rngl = np.random.RandomState(0)
    u_int = rngl.normal(size=fom.solution_dim)
    # embed interior vector into the node grid
    grid = np.zeros((nx + 1) * (nx + 1))
    grid[fom.interior] = u_int
    grid = jnp.asarray(grid.reshape(nx + 1, nx + 1))
    for t in range(4):
        want = fom.operator.terms[t].S @ u_int
        got = np.asarray(st.apply_term(t, grid)).reshape(-1)[fom.interior]
        assert np.allclose(got, want, atol=1e-12)
    # full operator at a parameter
    mu = {"diffusion": jnp.asarray([0.3, 1.4, 0.8, 2.2])}
    want = fom.assemble_sparse(mu) @ u_int
    got = np.asarray(st.apply(mu, grid)).reshape(-1)[fom.interior]
    assert np.allclose(got, want, atol=1e-12)
    # rhs matches the assembled load vector
    rhs_grid = np.asarray(st.rhs()).reshape(-1)[fom.interior]
    assert np.allclose(rhs_grid, np.asarray(fom.assemble_rhs(mu)), atol=1e-12)


def test_stencil_cg_solve():
    nx = 16
    fom = ThermalBlockFOM((2, 2), nx)
    st = StencilThermalBlock((2, 2), nx, dtype=jnp.float64)
    mu = {"diffusion": jnp.asarray([0.5, 1.0, 2.0, 0.7])}
    u = jax.jit(lambda m: st.solve_cg(m, tol=1e-12, maxiter=2000))(mu)
    want = np.asarray(fom.solve(mu))
    got = np.asarray(u).reshape(-1)[fom.interior]
    assert np.allclose(got, want, atol=1e-8)


def test_sharded_greedy_step_srht_sketch():
    """sketch='srht' greedy driver: the sketched state equals the
    canonical srht of the snapshot/residual columns at the same seed —
    the matrix-free option required at >=1e7 DoF (VERDICT r2 item 9)."""
    from rla4mor_tpu.core import mu_stack
    from rla4mor_tpu.core.parameters import ParameterSpace
    from rla4mor_tpu.ops.fwht import srht

    devices = np.array(jax.devices()[:8]).reshape(4, 2)
    mesh = Mesh(devices, ("dof", "mu"))
    fom = StencilThermalBlock((2, 2), 15, dtype=jnp.float64)
    key = jax.random.key(0)
    k = 32
    state0, step = make_sharded_greedy_step(
        fom, mesh, key, k=k, r_max=4, cg_tol=1e-12, cg_maxiter=800,
        sketch="srht",
    )
    space = ParameterSpace.make({"diffusion": 4}, 0.1, 1.0)
    mu = space.sample_randomly(1, key=1)[0]
    batch = mu_stack(space.sample_randomly(8, key=2))
    with mesh:
        state, est, u = jax.jit(step)(state0, mu, batch)
    assert int(state.ncols) == 1 and np.all(np.isfinite(np.asarray(est)))
    # the first basis column is the normalized canonical srht sketch of u
    su = np.asarray(srht(np.asarray(u).reshape(-1),
                         k, jax.random.fold_in(key, 0)))
    want = su / np.linalg.norm(su)
    got = np.asarray(state.srb[:, 0])
    assert np.abs(got - want).max() < 1e-10


def test_sharded_greedy_step():
    """One jitted sharded training step on a (4, 2) ('dof','mu') mesh."""
    devices = np.array(jax.devices()[:8]).reshape(4, 2)
    mesh = Mesh(devices, ("dof", "mu"))
    fom = StencilThermalBlock((2, 2), 15, dtype=jnp.float64)  # N+1=16, /4 ok
    key = jax.random.key(0)
    state0, step = make_sharded_greedy_step(
        fom, mesh, key, k=32, r_max=4, cg_tol=1e-10, cg_maxiter=500
    )
    from rla4mor_tpu.core import mu_stack
    from rla4mor_tpu.core.parameters import ParameterSpace

    space = ParameterSpace.make({"diffusion": 4}, 0.1, 1.0)
    mu = space.sample_randomly(1, key=1)[0]
    batch = mu_stack(space.sample_randomly(8, key=2))
    with mesh:
        jit_step = jax.jit(step)
        state, est1, u = jit_step(state0, mu, batch)
        state, est2, _ = jit_step(state, space.sample_randomly(1, key=3)[0], batch)
    assert int(state.ncols) == 2
    est1, est2 = np.asarray(est1), np.asarray(est2)
    assert np.all(np.isfinite(est1)) and np.all(np.isfinite(est2))
    # the 2-column ROM estimates are (weakly) better than the 1-column ones
    assert np.median(est2) < np.median(est1)
    # estimate at the interpolated mu itself is ~0 for the 1-column ROM
    with mesh:
        est_self = np.asarray(jit_step(state0, mu, mu_stack([mu] * 8))[1])
    assert est_self.min() < 1e-6


def test_sharded_step_skips_nonfinite_snapshot():
    """A diverged/NaN FOM solve (here: a NaN parameter) must NOT be
    written into the padded state — ncols stays put, estimates stay
    finite, and a later good step extends normally (regression: one bad
    solve at 4.2M DoF permanently poisoned every later estimate)."""
    devices = np.array(jax.devices()[:8]).reshape(4, 2)
    mesh = Mesh(devices, ("dof", "mu"))
    fom = StencilThermalBlock((2, 2), 15, dtype=jnp.float64)
    key = jax.random.key(0)
    state0, step = make_sharded_greedy_step(
        fom, mesh, key, k=32, r_max=4, cg_tol=1e-10, cg_maxiter=500
    )
    from rla4mor_tpu.core import mu_stack
    from rla4mor_tpu.core.parameters import ParameterSpace

    space = ParameterSpace.make({"diffusion": 4}, 0.1, 1.0)
    mu_good = space.sample_randomly(1, key=1)[0]
    mu_bad = jax.tree.map(lambda x: x * jnp.nan, mu_good)
    batch = mu_stack(space.sample_randomly(8, key=2))
    with mesh:
        jit_step = jax.jit(step)
        state, est0, _ = jit_step(state0, mu_good, batch)
        state, est1, _ = jit_step(state, mu_bad, batch)
        state, est2, _ = jit_step(state, space.sample_randomly(1, key=3)[0],
                                  batch)
    assert int(state.ncols) == 2  # the bad step was skipped
    assert bool(jnp.all(jnp.isfinite(state.srb)))
    assert bool(jnp.all(jnp.isfinite(state.res_lhs)))
    for est in (est0, est1, est2):
        assert np.all(np.isfinite(np.asarray(est)))


def test_sharded_step_matches_unsharded_oracle():
    """The sharded step's sketched state equals a hand-built unsharded one."""
    devices = np.array(jax.devices()[:8]).reshape(4, 2)
    mesh = Mesh(devices, ("dof", "mu"))
    fom = StencilThermalBlock((2, 2), 15, dtype=jnp.float64)
    key = jax.random.key(9)
    state0, step = make_sharded_greedy_step(
        fom, mesh, key, k=24, r_max=2, cg_tol=1e-12, cg_maxiter=800
    )
    from rla4mor_tpu.core import mu_stack
    from rla4mor_tpu.core.parameters import ParameterSpace

    space = ParameterSpace.make({"diffusion": 4}, 0.1, 1.0)
    mu = space.sample_randomly(1, key=4)[0]
    batch = mu_stack(space.sample_randomly(4, key=5))
    with mesh:
        state, est, u = jax.jit(step)(state0, mu, batch)

    # unsharded oracle of the same quantities
    from rla4mor_tpu.parallel import gaussian_sketch_blocked

    key_theta = jax.random.fold_in(key, 0)
    u_flat = jnp.asarray(np.asarray(u).reshape(-1))
    su = np.asarray(gaussian_sketch_blocked(key_theta, 24, u_flat, 4))
    nrm = np.linalg.norm(su)  # first column is GS-normalized in the step
    assert np.allclose(np.asarray(state.srb[:, 0]), su / nrm, atol=1e-10)
    term0 = fom.apply_term(0, jnp.asarray(u)).reshape(-1)
    st0 = np.asarray(gaussian_sketch_blocked(key_theta, 24, term0, 4))
    assert np.allclose(
        np.asarray(state.res_lhs[0, :, 0]), st0 / nrm, atol=1e-10
    )


def test_sharded_greedy_step_exact_score():
    """score='exact' (the f64 refinement mode): the returned estimates are
    the TRUE residual norms ||A(mu)(U y) - b|| of the sketched-ROM
    solutions (numpy oracle), and the stored basis grids satisfy the
    invariant srb[:, j] == sketch(U[j]) after Gram-Schmidt."""
    from rla4mor_tpu.core import mu_stack
    from rla4mor_tpu.core.parameters import ParameterSpace
    from rla4mor_tpu.ops.fwht import srht

    devices = np.array(jax.devices()[:8]).reshape(4, 2)
    mesh = Mesh(devices, ("dof", "mu"))
    fom = StencilThermalBlock((2, 2), 15, dtype=jnp.float64)
    key = jax.random.key(0)
    k, r_max, n_batch = 32, 3, 6
    state0, step = make_sharded_greedy_step(
        fom, mesh, key, k=k, r_max=r_max, cg_tol=1e-12, cg_maxiter=800,
        sketch="srht", score="exact",
    )
    space = ParameterSpace.make({"diffusion": 4}, 0.1, 1.0)
    batch = mu_stack(space.sample_randomly(n_batch, key=2))
    with mesh:
        jit_step = jax.jit(step)
        state = state0
        for i in range(2):
            mu = space.sample_randomly(1, key=10 + i)[0]
            state, est, u = jit_step(state, mu, batch)
    assert int(state.ncols) == 2
    U = np.asarray(state.U)
    for j in range(2):  # invariant: sketched basis == sketch of U columns
        su = np.asarray(
            srht(U[j].reshape(-1), k, jax.random.fold_in(key, 0))
        )
        assert np.abs(np.asarray(state.srb[:, j]) - su).max() < 1e-9

    # numpy oracle: same sketched-Galerkin solve, then the true residual
    est = np.asarray(est)
    srb = np.asarray(state.srb)
    res_lhs = np.asarray(state.res_lhs)
    res_rhs = np.asarray(state.res_rhs)
    b = np.asarray(fom.rhs())
    mask = (np.arange(r_max) < 2).astype(float)
    for i in range(n_batch):
        m = {"diffusion": np.asarray(batch["diffusion"])[i]}
        res = np.einsum("t,tkr->kr", m["diffusion"], res_lhs) * mask
        A = srb.T @ res * mask[:, None] + np.diag(1 - mask)
        y = np.linalg.solve(A, (srb.T @ res_rhs) * mask)
        u_rom = np.einsum("r,ryx->yx", y, U)
        r_vec = np.asarray(fom.apply(m, jnp.asarray(u_rom))) - b
        want = np.linalg.norm(r_vec)
        assert abs(est[i] - want) < 1e-9 * max(1.0, want), (i, est[i], want)


def test_sharded_embedding_classes(mesh, rng):
    from rla4mor_tpu.parallel import (
        ShardedGaussianEmbedding,
        ShardedSrhtEmbedding,
    )

    n, k = 512, 33
    x = jnp.asarray(rng.normal(size=(n, 4)))
    e = ShardedGaussianEmbedding(k, n, mesh, seed=5)
    y1 = np.asarray(e.apply(x))
    y2 = np.asarray(e.apply_blocked(x))
    assert np.abs(y1 - y2).max() < 1e-12
    M = np.asarray(e.matrix())
    assert np.allclose(y1, M @ np.asarray(x), atol=1e-12)
    # seeded redraw
    e2 = e.with_seed(6)
    assert not np.allclose(np.asarray(e2.apply(x)), y1)
    assert np.allclose(np.asarray(e.with_seed(5).apply(x)), y1)

    s = ShardedSrhtEmbedding(21, 1024, mesh, seed=7)
    xs = jnp.asarray(rng.normal(size=(1024, 3)))
    assert np.abs(
        np.asarray(s.apply(xs)) - np.asarray(s.apply_blocked(xs))
    ).max() < 1e-12


def test_jax_lars_in_recovery(thermal_fom):
    """DicRecoveryMap with the on-device fixed-shape LARS path."""
    import jax as _jax
    from rla4mor_tpu.core import gram_schmidt
    from rla4mor_tpu.estim.lars import lars_weighted_path, lars_weighted_path_jax

    fom = thermal_fom
    Ru = fom.h1_0_product
    mus = fom.parameter_space.sample_randomly(10, key=3)
    U = fom.solve_many(mus)
    V = np.asarray(U) / np.asarray(Ru.norm(U))[None, :]
    W = gram_schmidt(
        jnp.asarray(
            np.asarray(Ru.inv.apply(jnp.asarray(
                np.eye(fom.solution_dim)[:, :20]
            )))
        ),
        product=Ru,
    )
    CG = np.asarray(Ru.inner(W, jnp.asarray(V)))
    w = CG @ np.ones(V.shape[1]) / V.shape[1]
    p_np, a_np = lars_weighted_path(CG, w, ols=True)
    p_j, a_j, steps = lars_weighted_path_jax(CG, jnp.asarray(w), ols=True,
                                             max_steps=64)
    # the dictionary is extremely ill-conditioned (normalized snapshots of
    # nearby parameters), so breakpoint-for-breakpoint equality is not a
    # stable property — check functional quality instead: every jax path
    # point is the OLS fit on its support, and the best path residual
    # matches the host path's within tolerance
    p_j = np.asarray(p_j)
    for i in range(int(steps)):
        ind = np.nonzero(p_j[:, i])[0]
        if ind.size:
            sol, *_ = np.linalg.lstsq(CG[:, ind], w, rcond=None)
            # compare in residual space: coefficient-space equality is
            # meaningless at these support condition numbers
            r_j = np.linalg.norm(CG[:, ind] @ p_j[ind, i] - w)
            r_o = np.linalg.norm(CG[:, ind] @ sol - w)
            assert r_j <= r_o * (1 + 1e-3) + 1e-6 * np.linalg.norm(w)
    res_np = np.linalg.norm(CG @ p_np - w[:, None], axis=0).min()
    res_j = np.linalg.norm(CG @ p_j - w[:, None], axis=0).min()
    assert res_j <= res_np * (1 + 1e-6) + 1e-10


def test_sketched_reductor_with_sharded_embedding(mesh):
    """SketchedReductor driven by a mesh-sharded embedding equals the same
    reductor driven by the embedding's explicit matrix."""
    from rla4mor_tpu.core import DenseOp
    from rla4mor_tpu.models import ThermalBlockFOM
    from rla4mor_tpu.mor import SketchedReductor
    from rla4mor_tpu.parallel import ShardedGaussianEmbedding

    fom = ThermalBlockFOM((2, 2), 17)  # interior = 16^2 = 256, /8 ok
    n = fom.solution_dim
    assert n % 8 == 0
    emb = ShardedGaussianEmbedding(48, n, mesh, seed=3)
    emb_dense = DenseOp(emb.matrix())
    emb_dense.with_seed = lambda s: emb_dense  # deterministic online stand-in

    mus = fom.parameter_space.sample_randomly(5, key=0)
    U = fom.solve_many(mus)

    red_s = SketchedReductor(fom, embedding_primal=emb)
    red_d = SketchedReductor(fom, embedding_primal=emb_dense)
    red_s.extend_basis(U)
    red_d.extend_basis(U)
    assert np.allclose(np.asarray(red_s.srb), np.asarray(red_d.srb), atol=1e-10)
    assert np.allclose(
        np.asarray(red_s.residual_lhs.stack),
        np.asarray(red_d.residual_lhs.stack),
        atol=1e-10,
    )
    mu = fom.parameter_space.sample_randomly(1, key=1)[0]
    rom_s = red_s.reduce()
    rom_d = red_d.reduce()
    assert np.allclose(
        np.asarray(rom_s.solve(mu)), np.asarray(rom_d.solve(mu)), atol=1e-8
    )


def test_srht_sharded_flat_equals_blocked(mesh, rng):
    """Flat-contraction sharded SRHT (one psum, no butterfly) == the
    canonical plan, for 2-D and 1-D inputs and an overridden R block.

    Uses SIGN_BLOCK-divisor shards (n_local=512) so the canonical sign
    slice path is exercised."""
    from rla4mor_tpu.parallel import srht_sketch_sharded_flat

    key = jax.random.key(9)
    n, k, m = 4096, 41, 3
    x = jnp.asarray(rng.normal(size=(n, m)))
    want = np.asarray(srht_blocked(key, k, x, 8))
    got = np.asarray(srht_sketch_sharded_flat(key, k, x, mesh))
    assert np.abs(got - want).max() / np.abs(want).max() < 1e-12
    got_b = np.asarray(srht_sketch_sharded_flat(key, k, x, mesh, block=128))
    assert np.abs(got_b - want).max() / np.abs(want).max() < 1e-12
    got1 = np.asarray(srht_sketch_sharded_flat(key, k, x[:, 0], mesh))
    assert np.abs(got1 - want[:, 0]).max() / np.abs(want).max() < 1e-12


def test_gram_schmidt_and_pod_shard_over_dof(mesh, rng):
    """SURVEY §5's "sharded Gram-Schmidt / tall-skinny factorization": the
    jitted device CGS-2 and the method-of-snapshots POD are pure XLA
    programs whose n-axis contractions GSPMD turns into per-shard partials
    + psum — placing a DoF-sharded input gives the same factors with the
    tall outputs still sharded (no gather to one device)."""
    from rla4mor_tpu.core.orthonormalize import gram_schmidt, pod
    from rla4mor_tpu.parallel import dof_sharding

    n, r = 1024, 7
    U = jnp.asarray(rng.normal(size=(n, r)))
    Q_ref, R_ref = gram_schmidt(U, return_R=True)

    sh = dof_sharding(mesh)
    U_s = jax.device_put(U, sh)
    gs = jax.jit(lambda A: gram_schmidt(A, return_R=True))
    with mesh:
        Q_s, R_s = gs(U_s)
    assert np.abs(np.asarray(Q_s) - np.asarray(Q_ref)).max() < 1e-10
    assert np.abs(np.asarray(R_s) - np.asarray(R_ref)).max() < 1e-10
    # the orthonormal basis stays DoF-sharded
    assert not Q_s.sharding.is_fully_replicated

    modes_ref, sv_ref = pod(U, modes=4, rtol=None)
    pod_j = jax.jit(lambda A: pod(A, modes=4, rtol=None))
    with mesh:
        modes_s, sv_s = pod_j(U_s)
    assert np.abs(np.asarray(sv_s) - np.asarray(sv_ref)).max() < 1e-10
    assert np.abs(np.abs(np.asarray(modes_s)) -
                  np.abs(np.asarray(modes_ref))).max() < 1e-9
    assert not modes_s.sharding.is_fully_replicated


def test_sharded_gaussian_adjoint_blockwise(mesh, rng):
    """apply_adjoint is computed shard-wise (Omega never materialized —
    review round-2) and equals the explicit-matrix adjoint."""
    from rla4mor_tpu.parallel import ShardedGaussianEmbedding

    n, k = 512, 9
    emb = ShardedGaussianEmbedding(k, n, mesh, seed=6)
    V = jnp.asarray(rng.normal(size=(k, 3)), emb.dtype)
    with mesh:
        out = np.asarray(emb.apply_adjoint(V))
    ref = np.asarray(emb.matrix()).conj().T @ np.asarray(V)
    assert np.abs(out - ref).max() < 1e-12 * max(1.0, np.abs(ref).max())
    # frozen-dataclass zoo convention: with_seed is a pure replace
    emb2 = emb.with_seed(7)
    assert emb2.seed == 7 and emb2.mesh is emb.mesh


def test_instationary_stencil_sharded_matches_unsharded(mesh):
    """The device parabolic time loop runs with DoF-sharded state (GSPMD
    halo exchanges for the stencil/mass gathers): same trajectory as the
    unsharded run."""
    from rla4mor_tpu.models import InstationaryStencilFOM
    from rla4mor_tpu.models.stencil import StencilThermalBlock

    st = StencilThermalBlock((2, 2), 31, dtype=jnp.float64)  # 32 node rows
    fom = InstationaryStencilFOM(st, T=0.5, nt=6)
    mu = fom.parameter_space.sample_randomly(1, key=2)[0]
    ref = np.asarray(fom.solve(mu, tol=1e-12, maxiter=400))
    with mesh:
        got = np.asarray(fom.solve(mu, tol=1e-12, maxiter=400, mesh=mesh))
    assert np.abs(got - ref).max() < 1e-9 * max(1.0, np.abs(ref).max())


def test_instationary_stencil_3d_sharded_matches_unsharded(mesh):
    """3-D parabolic loop with the state sharded over the leading (z)
    grid axis — the rank-generic sharding constraint P('dof', None, None)
    plus GSPMD halo exchanges for the 3-D stencil gathers: identical
    trajectory to the unsharded run."""
    from rla4mor_tpu.models import InstationaryStencilFOM
    from rla4mor_tpu.models.stencil3d import StencilThermalBlock3D

    st = StencilThermalBlock3D((2, 2, 2), 15, dtype=jnp.float64)  # 16 z-rows
    fom = InstationaryStencilFOM(st, T=0.25, nt=4)
    mu = fom.parameter_space.sample_randomly(1, key=2)[0]
    ref = np.asarray(fom.solve(mu, tol=1e-12, maxiter=400))
    with mesh:
        got = np.asarray(fom.solve(mu, tol=1e-12, maxiter=400, mesh=mesh))
    assert np.abs(got - ref).max() < 1e-9 * max(1.0, np.abs(ref).max())


def test_wave_stencil_sharded_matches_unsharded(mesh):
    """The Newmark scan runs with DoF-sharded (u, v, a) state (GSPMD
    halo exchanges in the CG acceleration solves): same trajectory as
    the unsharded run."""
    from rla4mor_tpu.models import WaveStencilFOM
    from rla4mor_tpu.models.stencil import StencilThermalBlock

    st = StencilThermalBlock((2, 2), 31, dtype=jnp.float64)  # 32 node rows
    fom = WaveStencilFOM(st, T=0.25, nt=5)
    mu = fom.parameter_space.sample_randomly(1, key=2)[0]
    ref = np.asarray(fom.solve(mu, tol=1e-12, maxiter=400))
    with mesh:
        got = np.asarray(fom.solve(mu, tol=1e-12, maxiter=400, mesh=mesh))
    assert np.abs(got - ref).max() < 1e-9 * max(1.0, np.abs(ref).max())


def test_sharded_flat_srht_any_n(mesh, rng):
    """VERDICT r2 item 8: the flat (one-psum) sharded SRHT at NON-pow2
    DoF counts equals the canonical single-device srht — the zero-block
    trick (ops/srht_pallas._flat_plan) on a mesh, storage padded per
    flat_shard_rows."""
    from rla4mor_tpu.ops.fwht import srht
    from rla4mor_tpu.parallel import flat_shard_rows, srht_sketch_sharded_flat

    key = jax.random.key(11)
    for n, m, k in [(1000, 3, 32), (2049 * 3, 2, 48), (777, 1, 16)]:
        x = jnp.asarray(rng.normal(size=(n, m)), jnp.float64)
        n_phys, R = flat_shard_rows(n, mesh)
        xp = jnp.pad(x, ((0, n_phys - n), (0, 0)))
        with mesh:
            y = srht_sketch_sharded_flat(key, k, xp, mesh, n=n)
        ref = srht(x.T, k, key).T
        assert np.abs(np.asarray(y - ref)).max() < 1e-10 * np.abs(
            np.asarray(ref)).max(), n


def test_sharded_stable_precond_assembly(mesh, rng):
    """VERDICT r2 item 8: the STABLE (p+T factored) preconditioner ROM
    assembly run with every n-sized operand DoF-sharded over the mesh
    (GSPMD contractions + psum) equals the host assembly exactly."""
    from rla4mor_tpu.core.affine import AffineOp
    from rla4mor_tpu.core.linops import DenseOp
    from rla4mor_tpu.core.orthonormalize import gram_schmidt
    from rla4mor_tpu.core.parameters import ONE, ParameterSpace, \
        ProjectionCoefficient
    from rla4mor_tpu.models.stationary import StationaryFOM
    from rla4mor_tpu.ops import GaussianEmbedding
    from rla4mor_tpu.precond.preconditioned_rom import PreconditionedRom

    n = 64
    mats = []
    for _t in range(2):
        M = rng.normal(size=(n, n))
        mats.append(jnp.asarray(M @ M.T + n * np.eye(n)))
    operator = AffineOp(
        tuple(DenseOp(M) for M in mats),
        tuple(ProjectionCoefficient("diffusion", t) for t in range(2)),
    )
    rhs = AffineOp((DenseOp(jnp.asarray(rng.normal(size=(n, 1)))),), (ONE,))
    space = ParameterSpace.make({"diffusion": 2}, 0.5, 2.0)
    fom = StationaryFOM(operator, rhs, parameter_space=space)

    mus = space.sample_randomly(4, key=5)
    U = gram_schmidt(jnp.stack(
        [jnp.linalg.solve(operator.assemble_dense(mu),
                          rhs.assemble_dense(mu)[:, 0]) for mu in mus],
        axis=1,
    ))
    V1 = gram_schmidt(jnp.asarray(rng.normal(size=(n, 6))))
    V2 = gram_schmidt(jnp.asarray(rng.normal(size=(n, 3))))
    emb = GaussianEmbedding.make(n, range_dim=20, seed=9)

    def assemble(shard):
        basis, v1, v2 = U, V1, V2
        if shard:
            sh = NamedSharding(mesh, P("dof", None))
            basis, v1, v2 = (jax.device_put(a, sh) for a in (U, V1, V2))
        rom_builder = PreconditionedRom(
            fom, basis, emb,
            intermediate_bases={"lhs": v1, "rhs": v2},
            stable_galerkin=True, log_level=30,
        )
        for mu in mus[:2]:
            Pinv = DenseOp(jnp.linalg.inv(operator.assemble_dense(mu)))
            rom_builder.add_preconditioner(Pinv, mu)
        return rom_builder.rom

    rom_h = assemble(shard=False)
    with mesh:
        rom_s = assemble(shard=True)
    for name in ("lhs_left", "lhs_right", "rhs_left", "rhs_right"):
        a = np.asarray(getattr(rom_h, name).stack)
        b = np.asarray(getattr(rom_s, name).stack)
        assert np.abs(a - b).max() < 1e-11 * max(1.0, np.abs(a).max()), name
    # and the assembled ROMs solve identically (mu extended with the
    # preconditioner mixing coefficients)
    mu = dict(space.sample_randomly(1, key=7)[0])
    mu["precond"] = jnp.asarray([0.7, 0.3])
    with mesh:
        us = np.asarray(rom_s.solve(mu))
    assert np.abs(np.asarray(rom_h.solve(mu)) - us).max() < 1e-10


def test_pod_greedy_2d_mesh_matches_host(rng):
    """VERDICT r2 item 8: POD-greedy on a 2-D ('dof','mu') mesh — the CG
    time loop dof-sharded, the estimator sweep mu-sharded — selects the
    same parameters and basis as the unsharded run."""
    from rla4mor_tpu.models import InstationaryStencilFOM
    from rla4mor_tpu.models.instationary import InstationaryReductor, pod_greedy
    from rla4mor_tpu.ops import GaussianEmbedding

    mesh2 = make_mesh(8, ("dof", "mu"), shape=(4, 2))
    n_dof_axis = 4
    num_intervals = 4 * n_dof_axis - 1
    sfom = StencilThermalBlock((2, 2), num_intervals, dtype=jnp.float64)
    pfom = InstationaryStencilFOM(sfom, T=0.1, nt=3)

    from rla4mor_tpu.core.parameters import ParameterSpace
    space = ParameterSpace.make({"diffusion": 4}, 0.1, 1.0)
    mus = space.sample_randomly(8, key=3)

    def run(mesh_or_none):
        kw = dict(tol=1e-10, maxiter=300)
        if mesh_or_none is not None:
            kw["mesh"] = mesh_or_none
        view = pfom.as_reductor_fom(**kw)
        red = InstationaryReductor(
            view, embedding=GaussianEmbedding.make(
                view.solution_dim, range_dim=64, seed=21
            ), log_level=30,
        )
        mu_sh = (None if mesh_or_none is None
                 else NamedSharding(mesh_or_none, P("mu")))
        if mesh_or_none is not None:
            with mesh_or_none:
                rom, hist = pod_greedy(view, red, mus, max_extensions=3,
                                       mu_sharding=mu_sh, log_level=30)
        else:
            rom, hist = pod_greedy(view, red, mus, max_extensions=3,
                                   log_level=30)
        return red, hist

    red_h, hist_h = run(None)
    red_s, hist_s = run(mesh2)
    assert [str(m) for m in hist_h["selected_mus"]] == \
        [str(m) for m in hist_s["selected_mus"]]
    np.testing.assert_allclose(
        np.asarray(red_s.rb), np.asarray(red_h.rb), atol=1e-8
    )


def test_sharded_flat_srht_single_block_derivation(mesh, rng):
    """Round-3 review: ``srht_sketch_sharded_flat`` re-derived its R with
    a formula structurally different from ``flat_shard_rows``; it now
    CALLS the padding helper (single source of truth), so storage padded
    with one block size and sketched with another fails loudly instead of
    splitting differently than the padding assumed."""
    import pytest

    from rla4mor_tpu.ops.fwht import srht
    from rla4mor_tpu.parallel import flat_shard_rows, srht_sketch_sharded_flat

    key = jax.random.key(5)
    n, m, k = 1000, 2, 24
    x = jnp.asarray(rng.normal(size=(n, m)), jnp.float64)

    # explicit block, pad and sketch with the SAME one -> canonical result
    n_phys, R = flat_shard_rows(n, mesh, block=64)
    assert R == 64
    xp = jnp.pad(x, ((0, n_phys - n), (0, 0)))
    with mesh:
        y = np.asarray(srht_sketch_sharded_flat(key, k, xp, mesh, block=64,
                                                n=n))
    ref = np.asarray(srht(x.T, k, key).T)
    assert np.abs(y - ref).max() < 1e-10 * np.abs(ref).max()

    # a DIFFERENT block on the same storage -> loud mismatch, not a
    # silently different split
    if flat_shard_rows(n, mesh, block=256)[0] != n_phys:
        with pytest.raises(AssertionError, match="flat_shard_rows"):
            with mesh:
                srht_sketch_sharded_flat(key, k, xp, mesh, block=256, n=n)


def test_state_to_rom_ships_certified_online_stage():
    """state_to_rom exports the trained greedy state as a StationaryROM
    whose solve/output/estimate_error feed the online layer (serve/UQ/
    optimize) — checks the output-column GS invariant, snapshot
    reproduction at a training mu, estimator-vs-true-residual agreement,
    and a fully rigorous l2 output certificate (min-theta with an
    explicit interior lambda_min anchor) containing the true error."""
    import scipy.linalg as sla

    from rla4mor_tpu.core import mu_stack
    from rla4mor_tpu.core.parameters import ParameterSpace
    from rla4mor_tpu.mor import ConstantDualNorm, MinThetaCoercivity
    from rla4mor_tpu.parallel import state_to_rom

    devices = np.array(jax.devices()[:8]).reshape(4, 2)
    mesh = Mesh(devices, ("dof", "mu"))
    fom = StencilThermalBlock((2, 2), 15, dtype=jnp.float64)
    key = jax.random.key(2)
    state0, step = make_sharded_greedy_step(
        fom, mesh, key, k=48, r_max=4, cg_tol=1e-12, cg_maxiter=800,
        score="exact",
    )
    space = ParameterSpace.make({"diffusion": 4}, 0.1, 1.0)
    train = space.sample_randomly(3, key=11)
    batch = mu_stack(space.sample_randomly(8, key=12))
    with mesh:
        jit_step = jax.jit(step)
        state = state0
        for mu in train:
            state, _, _ = jit_step(state, mu, batch)
    assert int(state.ncols) == 3

    # out-column invariant: out[:, j] == l(U[j]) (score='exact' keeps U)
    for j in range(3):
        want = float(fom.output(state.U[j]))
        assert abs(float(state.out[0, j]) - want) < 1e-10

    rom = state_to_rom(fom, state)
    n = fom.num_intervals + 1
    h = fom.h

    # snapshot reproduction: at a training mu the Galerkin ROM output
    # matches the FOM output to solver/roundoff accuracy
    u_fom = fom.solve_cg(train[0], tol=1e-12, maxiter=800)
    s_fom = float(fom.output(u_fom))
    y0 = rom.solve(train[0])
    s_rom0 = float(jnp.real(rom.output(y0, train[0])[0]))
    assert abs(s_rom0 - s_fom) < 1e-8 * abs(s_fom)

    # estimator vs TRUE l2 residual at held-out mus: equal up to the
    # k=48 Gaussian sketch distortion (seeded -> deterministic)
    mu_test = space.sample_randomly(2, key=13)
    for mu in mu_test:
        y = rom.solve(mu)
        u_r = jnp.einsum("r,rij->ij", y, state.U[:3])
        r_true = float(jnp.linalg.norm(
            fom.apply(mu, u_r) - fom.rhs(dtype=jnp.float64)))
        eta = float(rom.estimate_error(mu))
        assert 0.5 * r_true <= eta <= 1.5 * r_true

    # rigorous l2 certificate: lambda_min of sym A(1) on the interior
    # subspace (the Dirichlet ring is a common kernel), min-theta scaled
    mu_ref = {"diffusion": jnp.ones((4,), jnp.float64)}
    eye = jnp.eye(n * n, dtype=jnp.float64)
    A_ref = np.asarray(jax.vmap(
        lambda e: fom.apply(mu_ref, e.reshape(n, n)).reshape(-1))(eye)).T
    inside = np.asarray(interior_mask(n, jnp.float64)).reshape(-1) > 0
    Ai = 0.5 * (A_ref + A_ref.T)[np.ix_(inside, inside)]
    lam_min = float(sla.eigh(Ai, eigvals_only=True)[0])
    assert lam_min > 0
    alpha = MinThetaCoercivity(fom, mu_ref, alpha_ref=lam_min)
    dual = ConstantDualNorm(h * h * math.sqrt(n * n))
    for mu in mu_test:
        y = rom.solve(mu)
        s_r = float(jnp.real(rom.output(y, mu)[0]))
        u = fom.solve_cg(mu, tol=1e-12, maxiter=800)
        s_f = float(fom.output(u))
        bound = float(dual(mu)) * float(rom.estimate_error(mu, y)) \
            / float(alpha(mu))
        assert abs(s_f - s_r) <= bound

    # the exported ROM drives certified UQ end-to-end (mean bracket
    # contains the dense-FOM mean over the same sample set)
    from rla4mor_tpu.mor import certified_moments
    from rla4mor_tpu.mor.uq import sample_mu_batched

    res = certified_moments(rom, space, alpha, dual, n=32, key=21,
                            batch=32)
    mus32 = sample_mu_batched(space, 32, key=21)
    s_fom_mean = float(np.mean([
        float(fom.output(fom.solve_cg(
            jax.tree.map(lambda x: x[i], mus32), tol=1e-12, maxiter=800)))
        for i in range(32)
    ]))
    assert abs(s_fom_mean - res.mean) <= res.bias_bound + 1e-12


def test_semilinear_newton_sharded_matches_unsharded(mesh):
    """The nonlinear tier's Newton-CG FOM solve runs with the node grid
    DoF-sharded (GSPMD halo exchanges inside the Jacobian CG of the
    while_loop body): same solution as the unsharded run."""
    from rla4mor_tpu.models.semilinear import SemilinearStencilFOM

    fom = SemilinearStencilFOM((2, 2), 31, dtype=jnp.float64,
                               reaction_scale=50.0)
    mu = fom.sample_parameters(1, key=3)[0]
    ref = np.asarray(fom.solve_newton(mu, newton_tol=1e-11))
    with mesh:
        got = np.asarray(fom.solve_newton(mu, newton_tol=1e-11, mesh=mesh))
    assert np.abs(got - ref).max() < 1e-9 * max(1.0, np.abs(ref).max())


def test_semilinear_imex_sharded_matches_unsharded(mesh):
    """The IMEX semilinear time loop with DoF-sharded state matches the
    unsharded trajectory."""
    from rla4mor_tpu.models.semilinear import (
        SemilinearInstationaryFOM,
        SemilinearStencilFOM,
    )

    fom = SemilinearStencilFOM((2, 2), 31, dtype=jnp.float64,
                               reaction_scale=50.0)
    pfom = SemilinearInstationaryFOM(fom, T=0.25, nt=4)
    mu = fom.sample_parameters(1, key=4)[0]
    ref = np.asarray(pfom.solve(mu, tol=1e-12, maxiter=400))
    with mesh:
        got = np.asarray(pfom.solve(mu, tol=1e-12, maxiter=400, mesh=mesh))
    assert np.abs(got - ref).max() < 1e-9 * max(1.0, np.abs(ref).max())
