"""Test configuration: CPU backend, 8 virtual devices, float64.

Oracle tests follow the reference's pattern — sketched machinery must equal
hand-composed dense expressions to tight tolerance (reference
preconditioners/tests.py) — which requires f64, hence the CPU backend.
Multi-chip sharding tests use the 8 virtual CPU devices.
"""

import os

# must run before jax initializes. RLA4MOR_TPU_TESTS=1 leaves the live
# (TPU) backend alone for the TPU-only kernel tests (test_gaussian_pallas).
if os.environ.get("RLA4MOR_TPU_TESTS") != "1":
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["JAX_ENABLE_X64"] = "1"

    import jax

    # jax may already be imported by a pytest plugin with env-derived
    # defaults; force the settings through the config API as well.
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
else:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def thermal_fom():
    from rla4mor_tpu.models import ThermalBlockFOM

    return ThermalBlockFOM(grid_shape=(2, 2), num_intervals=16)


@pytest.fixture(scope="session")
def thermal_fom_3x3():
    from rla4mor_tpu.models import ThermalBlockFOM

    return ThermalBlockFOM(grid_shape=(3, 3), num_intervals=18)


@pytest.fixture
def rng():
    return np.random.RandomState(0)


# ---------------------------------------------------------------------------
# Smoke tier: `pytest -m smoke` — a <3-minute subset touching every module
# (one or two fast oracle tests per file), for builder iteration; the full
# suite stays the nightly-style gate. Centralized here (not decorators) so
# the tier is visible and editable in one place.
# ---------------------------------------------------------------------------

SMOKE = {
    "test_advection_diffusion.py": {"test_fom_solve_and_nonsymmetry"},
    "test_bf16_offline.py": {"test_cast_input_op"},
    "test_classical.py": {"test_exact_residual_estimator"},
    "test_complex.py": {"test_complex_fom_solve",
                        "test_complex_sketched_reductor"},
    "test_core.py": {"test_affine_dense_assemble_apply",
                     "test_sparse_cholesky_and_lu_inverse"},
    "test_device_precond.py": {"test_cg_inverse_op_matches_lu"},
    "test_eim.py": {"test_eim_exact_low_rank_reproduction",
                    "test_deim_matches_and_points_distinct"},
    "test_embeddings.py": {"test_apply_equals_matrix"},
    "test_estim.py": {"test_lars_path_matches_sklearn",
                      "test_pbdw_exact_in_span"},
    "test_fom.py": {"test_uniform_poisson_max", "test_output_is_mean"},
    "test_fwht.py": {"test_fwht_matches_hadamard",
                     "test_srht_apply_equals_rows"},
    "test_instationary.py": {"test_implicit_euler_matches_dense_oracle"},
    "test_stencil_helmholtz.py": {
        "test_helmholtz_operator_is_indefinite_and_symmetric"},
    "test_instationary_pd.py": {"test_discrete_adjoint_identity"},
    "test_mdeim.py": {"test_mdeim_reconstructs_operator"},
    "test_multigrid.py": {"test_transfer_adjointness",
                          "test_coarsen_kappa"},
    "test_optimize.py": {"test_output_dual_norm_oracle",
                         "test_output_gradient_matches_finite_differences"},
    "test_parallel.py": {"test_gaussian_sharded_equals_blocked",
                         "test_stencil_matches_assembled",
                         "test_sharded_greedy_step"},
    "test_precond.py": {"test_hs_estimators"},
    "test_primal_dual.py": {"test_dual_fom_is_the_adjoint"},
    "test_properties.py": {"test_affine_adjoint_identity",
                           "test_fwht_parseval"},
    "test_rsvd.py": {"test_rsvd_matches_exact_svd"},
    "test_scm.py": {"test_scm_coercivity_thermal_block"},
    "test_scm_matfree.py": {"test_lobpcg_gen_matches_dense"},
    "test_semilinear.py": {"test_newton_matches_dense_oracle",
                           "test_deim_exact_on_training_parameter"},
    "test_serialization.py": {"test_reductor_roundtrip"},
    "test_serve.py": {"test_serve_stationary_matches_direct",
                      "test_serve_hot_swap_no_recompile"},
    "test_sketched_reductor.py": {"test_sketched_galerkin_system_oracle",
                                  "test_output_functional_projection"},
    "test_srht_pallas.py": {"test_hadamard_rows_helper",
                            "test_onepass_xla_matches_srht"},
    "test_stencil3d.py": {"test_element_matrix_identities",
                          "test_operator_symmetry_and_affine_sum"},
    "test_stencil_advection.py": {"test_bicgstab_nonsymmetric_small",
                                  "test_stencil_advection_matches_host_fom"},
    "test_uq.py": {"test_sample_mu_batched_shapes_and_determinism"},
    "test_wave.py": {"test_rom_exact_basis_reproduces"},
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        fname = item.path.name if hasattr(item, "path") else ""
        base = item.name.split("[")[0]
        if base in SMOKE.get(fname, ()):
            item.add_marker(pytest.mark.smoke)
