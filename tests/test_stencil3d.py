"""3-D Q1 stencil thermal block: element-matrix identities, operator
symmetry/PSD oracles, O(h^2) manufactured-solution convergence, and the
rank-generic sharded greedy step."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from rla4mor_tpu.models import StencilThermalBlock3D
from rla4mor_tpu.models.stencil3d import k_el_3d, stencil3d_apply


def test_element_matrix_identities():
    """K_hat is symmetric PSD with zero row sums (rigid mode) and the
    known trilinear diagonal 1/3."""
    K = np.array(k_el_3d())
    assert K.shape == (8, 8)
    assert np.allclose(K, K.T, atol=1e-14)
    assert np.abs(K.sum(axis=1)).max() < 1e-14  # constants in the kernel
    w = np.linalg.eigvalsh(K)
    assert w.min() > -1e-14
    assert np.allclose(np.diag(K), 1.0 / 3.0, atol=1e-14)


def test_operator_symmetry_and_affine_sum():
    """Densified A(kappa=1) is symmetric PSD; the affine terms sum to the
    product operator; the Dirichlet shell is exactly annihilated."""
    fom = StencilThermalBlock3D((2, 2, 2), num_intervals=4,
                                dtype=jnp.float64)
    M = fom.n_nodes
    n = M ** 3

    def densify(apply_fn):
        eye = np.eye(n).reshape(n, M, M, M)
        cols = [np.asarray(apply_fn(jnp.asarray(e))).reshape(-1)
                for e in eye]
        return np.stack(cols, axis=1)

    A = densify(fom.product_apply)
    assert np.allclose(A, A.T, atol=1e-13)
    w = np.linalg.eigvalsh(A)
    assert w.min() > -1e-12

    mu = {"diffusion": jnp.asarray([0.3, 0.7, 1.0, 0.5, 0.9, 0.2, 0.6,
                                    0.4])}
    u = jnp.asarray(np.random.RandomState(0).standard_normal((M,) * 3))
    full = np.asarray(fom.apply(mu, u))
    parts = sum(
        float(mu["diffusion"][b]) * np.asarray(fom.apply_term(b, u))
        for b in range(8)
    )
    assert np.allclose(full, parts, atol=1e-12)
    # shell annihilated
    assert np.abs(full[0]).max() == 0 and np.abs(full[:, :, -1]).max() == 0

    # jacobi_diag equals the dense diagonal
    d = np.asarray(fom.jacobi_diag(mu))
    Amu = densify(lambda v: fom.apply(mu, v))
    mask = np.zeros((M,) * 3)
    mask[1:-1, 1:-1, 1:-1] = 1
    want = np.diag(Amu).reshape(M, M, M)
    assert np.allclose(d * mask, want * mask, atol=1e-13)


def test_manufactured_solution_convergence():
    """-div(grad u) = 3 pi^2 sin(pi x) sin(pi y) sin(pi z): nodal max
    error decays O(h^2) between N=8 and N=16."""
    errs = []
    for N in (8, 16):
        fom = StencilThermalBlock3D((1, 1, 1), num_intervals=N,
                                    dtype=jnp.float64)
        M = fom.n_nodes
        x = np.linspace(0.0, 1.0, M)
        X, Y, Z = np.meshgrid(x, x, x, indexing="ij")
        u_star = np.sin(np.pi * X) * np.sin(np.pi * Y) * np.sin(np.pi * Z)
        f = 3.0 * np.pi ** 2 * u_star
        # lumped load: h^3 f(node) on the interior
        mask = np.zeros((M,) * 3)
        mask[1:-1, 1:-1, 1:-1] = 1
        b = jnp.asarray(fom.h ** 3 * f * mask)
        from rla4mor_tpu.core.solvers import cg

        mu = {"diffusion": jnp.ones(1)}
        diag = fom.jacobi_diag(mu)
        u = cg(lambda v: fom.apply(mu, v), b, precond=lambda r: r / diag,
               tol=1e-12, maxiter=4000).x
        errs.append(float(np.abs(np.asarray(u) - u_star * mask).max()))
    ratio = errs[0] / errs[1]
    assert errs[1] < 2e-2
    assert 3.0 < ratio < 5.5, (errs, ratio)


def test_sharded_greedy_step_3d():
    """The rank-generic driver runs the 3-D family on the CPU mesh; the
    first basis column is the canonical SRHT sketch of the snapshot."""
    from rla4mor_tpu.core import mu_stack
    from rla4mor_tpu.ops.fwht import srht
    from rla4mor_tpu.parallel import make_sharded_greedy_step

    devices = np.array(jax.devices()[:8]).reshape(4, 2)
    mesh = Mesh(devices, ("dof", "mu"))
    fom = StencilThermalBlock3D((2, 2, 2), num_intervals=15,
                                dtype=jnp.float64)  # M = 16, /4 ok
    key = jax.random.key(0)
    k = 32
    state0, step = make_sharded_greedy_step(
        fom, mesh, key, k=k, r_max=3, cg_tol=1e-11, cg_maxiter=1500,
        sketch="srht",
    )
    batch = mu_stack(fom.sample_parameters(6, key=2))
    with mesh:
        jit_step = jax.jit(step)
        state, est1, u = jit_step(
            state0, fom.sample_parameters(1, key=11)[0], batch)
        state, est2, _ = jit_step(
            state, fom.sample_parameters(1, key=12)[0], batch)
    assert int(state.ncols) == 2
    est1, est2 = np.asarray(est1), np.asarray(est2)
    assert np.all(np.isfinite(est1)) and np.all(np.isfinite(est2))
    assert np.median(est2) < np.median(est1)

    su = np.asarray(srht(np.asarray(u).reshape(-1), k,
                         jax.random.fold_in(key, 0)))
    want = su / np.linalg.norm(su)
    assert np.abs(np.asarray(state.srb[:, 0]) - want).max() < 1e-10
