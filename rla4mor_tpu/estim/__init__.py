from rla4mor_tpu.estim.lars import (
    lars_lasso_path_np,
    lars_lasso_jax,
    lars_weighted_path,
    lars_weighted_path_complex,
    lars_weighted_path_complex_jax,
)
from rla4mor_tpu.estim.manifold_distance import (
    ManifoldDistance,
    ResidualDistanceDiscrete,
    ResidualDistanceAffine,
)
from rla4mor_tpu.estim.recovery_map import (
    RecoveryMap,
    PbdwRecoveryMap,
    DicRecoveryMap,
)

__all__ = [
    "lars_lasso_path_np", "lars_lasso_jax", "lars_weighted_path",
    "lars_weighted_path_complex", "lars_weighted_path_complex_jax",
    "ManifoldDistance", "ResidualDistanceDiscrete", "ResidualDistanceAffine",
    "RecoveryMap", "PbdwRecoveryMap", "DicRecoveryMap",
]
