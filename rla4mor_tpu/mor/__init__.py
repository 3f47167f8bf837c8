from rla4mor_tpu.mor.sketched_reductor import SketchedReductor
from rla4mor_tpu.mor.classical_reductor import ClassicalReductor
from rla4mor_tpu.mor.greedy import (
    rb_greedy,
    rb_greedy_padded,
    rb_greedy_strong,
    GreedyResult,
)
from rla4mor_tpu.mor.padded_reductor import (
    PaddedSketchedReductor,
    rb_greedy_no_retrace,
)
from rla4mor_tpu.mor.primal_dual import (
    CorrectedOutputROM,
    PrimalDualReductor,
    dual_fom,
    output_greedy,
)
from rla4mor_tpu.mor.bounds import (
    InfSupLowerBound,
    MinThetaCoercivity,
    error_bound,
    inf_sup_error_bound,
    parabolic_error_bound,
    parabolic_output_error_bound,
)
from rla4mor_tpu.mor.scm import (
    ScmCoercivity,
    ScmHermitian,
    ScmInfSup,
)
from rla4mor_tpu.mor.scm_matfree import (
    MatrixFreeScmCoercivity,
    MatrixFreeScmHermitian,
    MatrixFreeScmInfSup,
    l2_interior_scm,
    lobpcg_gen,
    lobpcg_gen_two_stage,
    spectral_interval,
)
from rla4mor_tpu.mor.eim import (
    EimInterpolant,
    MdeimOperator,
    deim,
    deim_points,
    eim_greedy,
    eim_greedy_device,
    eim_greedy_scan,
    eim_rebuild,
    mdeim,
    theta_coefficients,
)
from rla4mor_tpu.mor.optimize import (
    CertifiedOptimum,
    MinimizeResult,
    ConstantDualNorm,
    OutputDualNorm,
    TrustRegionResult,
    certified_minimize,
    make_objective,
    minimize_output,
    minimize_scalar,
    output_error_bound,
    output_gradient,
    trust_region_minimize,
)
from rla4mor_tpu.mor.semilinear_reductor import (
    SemilinearReductor,
    SemilinearResidualEstimator,
    SemilinearROM,
)
from rla4mor_tpu.mor.uq import (
    CertifiedSobolResult,
    ExceedanceResult,
    SobolResult,
    UqResult,
    certified_moments,
    certified_sobol_indices,
    exceedance_probability,
    sample_mu_batched,
    sobol_indices,
)
from rla4mor_tpu.mor.serialization import (
    save_reductor,
    save_rom,
    load_rom,
    load_reductor_state,
    save_instationary_reductor,
    save_primal_dual_reductor,
    save_wave_reductor,
    load_wave_reductor_state,
    load_primal_dual_reductor_state,
    load_instationary_reductor_state,
    save_padded_reductor,
    load_padded_reductor_state,
    save_eim_interpolant,
    load_eim_interpolant,
    save_mdeim_operator,
    load_mdeim_operator,
)

__all__ = [
    "SketchedReductor", "ClassicalReductor", "rb_greedy", "rb_greedy_padded",
    "rb_greedy_strong",
    "GreedyResult",
    "PaddedSketchedReductor", "rb_greedy_no_retrace",
    "PrimalDualReductor", "CorrectedOutputROM", "dual_fom", "output_greedy",
    "MinThetaCoercivity", "error_bound", "InfSupLowerBound",
    "inf_sup_error_bound", "parabolic_error_bound",
    "parabolic_output_error_bound",
    "ScmHermitian", "ScmCoercivity", "ScmInfSup",
    "MatrixFreeScmHermitian", "MatrixFreeScmCoercivity",
    "MatrixFreeScmInfSup", "lobpcg_gen",
    "lobpcg_gen_two_stage", "l2_interior_scm",
    "spectral_interval",
    "CertifiedOptimum", "ConstantDualNorm", "MinimizeResult", "OutputDualNorm",
    "TrustRegionResult", "trust_region_minimize",
    "certified_minimize", "make_objective", "minimize_output",
    "output_error_bound", "output_gradient",
    "UqResult", "ExceedanceResult", "SobolResult", "certified_moments",
    "exceedance_probability", "sample_mu_batched", "sobol_indices",
    "CertifiedSobolResult", "certified_sobol_indices",
    "minimize_scalar",
    "EimInterpolant", "eim_greedy", "eim_greedy_device", "eim_greedy_scan",
    "eim_rebuild", "deim", "deim_points",
    "MdeimOperator", "mdeim", "theta_coefficients",
    "save_reductor", "load_reductor_state",
    "save_rom", "load_rom",
    "save_eim_interpolant", "load_eim_interpolant",
    "save_mdeim_operator", "load_mdeim_operator",
    "save_instationary_reductor", "load_instationary_reductor_state",
    "save_primal_dual_reductor", "load_primal_dual_reductor_state",
    "save_wave_reductor", "load_wave_reductor_state",
    "save_padded_reductor", "load_padded_reductor_state",
    "SemilinearReductor", "SemilinearROM", "SemilinearResidualEstimator",
]
