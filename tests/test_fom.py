"""Thermal-block FOM tests (assembly, solves, products, outputs)."""

import jax.numpy as jnp
import numpy as np

from rla4mor_tpu.models import ThermalBlockFOM


def test_uniform_poisson_max():
    """kappa = 1 everywhere: -Lap u = 1 on unit square, u|bnd = 0.
    max u -> 0.07367 (series solution); Q1 on 32x32 is within 0.5%."""
    fom = ThermalBlockFOM((2, 2), 32)
    mu = {"diffusion": jnp.ones(4)}
    u = fom.solve(mu)
    assert abs(float(u.max()) - 0.073671) < 5e-4


def test_affine_consistency():
    """A(mu) == sum_b mu_b A_b and the solve satisfies the residual."""
    fom = ThermalBlockFOM((2, 2), 12)
    mu = {"diffusion": jnp.asarray([0.3, 1.2, 0.7, 2.0])}
    u = fom.solve(mu)
    r = fom.residual_norm(u, mu)
    assert float(r) < 1e-12


def test_block_structure():
    """Scaling one block's kappa only changes that block's term."""
    fom = ThermalBlockFOM((2, 2), 8)
    terms = [t.S.toarray() for t in fom.operator.terms]
    total = sum(terms)
    # partition of unity: all-ones kappa == full stiffness == h1_0 product
    R = np.asarray(fom.h1_0_product.op.matrix())
    assert np.allclose(total, R, atol=1e-12)
    # terms have disjoint-ish support (only interface rows overlap)
    for i in range(len(terms)):
        for j in range(i + 1, len(terms)):
            overlap = (np.abs(terms[i]) > 0) & (np.abs(terms[j]) > 0)
            assert overlap.sum() < 0.2 * (np.abs(terms[i]) > 0).sum()


def test_products_spd():
    fom = ThermalBlockFOM((3, 3), 9)
    for name in ("h1_0", "l2"):
        R = np.asarray(fom.products[name].op.matrix())
        assert np.allclose(R, R.T, atol=1e-12)
        w = np.linalg.eigvalsh(R)
        assert w.min() > 0


def test_symmetry_of_solution():
    """Symmetric kappa pattern -> solution symmetric under x-flip."""
    nx = 16
    fom = ThermalBlockFOM((2, 2), nx)
    mu = {"diffusion": jnp.asarray([1.0, 1.0, 3.0, 3.0])}  # rows constant
    u = np.asarray(fom.solve(mu))
    grid = u.reshape(nx - 1, nx - 1)
    assert np.allclose(grid, grid[:, ::-1], atol=1e-12)


def test_output_is_mean():
    fom = ThermalBlockFOM((2, 2), 16)
    mu = {"diffusion": jnp.ones(4)}
    u = fom.solve(mu)
    s = np.asarray(fom.output_functional.apply(u, mu)).item()
    # integral of u over the domain (load vector = lumped integration)
    assert 0.0 < s < 0.074  # bounded by max(u) * area


def test_block_index_map_matches_masks():
    """Traced iota block ids == stored block_masks (the pod-scale path
    never bakes (B, N, N) literals; this pins the equivalence)."""
    from rla4mor_tpu.models.stencil import (
        StencilThermalBlock,
        block_index_map,
        block_masks,
    )

    for shape, N in (((2, 2), 8), ((3, 2), 12), ((4, 4), 16)):
        masks = np.asarray(block_masks(N, shape, jnp.float64))
        blk = np.asarray(block_index_map(N, shape))
        want = np.argmax(masks, axis=0)
        assert np.array_equal(blk, want)
        # and kappa assembly agrees with the einsum-over-masks form
        st = StencilThermalBlock(shape, N, dtype=jnp.float64)
        theta = np.linspace(0.2, 1.7, st.n_terms)
        mu = {"diffusion": jnp.asarray(theta)}
        want_k = np.einsum("b,byx->yx", theta, masks)
        assert np.allclose(np.asarray(st.kappa(mu)), want_k, atol=1e-14)
