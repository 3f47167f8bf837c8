from rla4mor_tpu.core.parameters import (
    Mu,
    ParameterSpace,
    Coefficient,
    ConstantCoefficient,
    ProjectionCoefficient,
    ProductCoefficient,
    ExpressionCoefficient,
    ONE,
    eval_coefficients,
    mu_stack,
    mu_unstack,
)
from rla4mor_tpu.core.linops import (
    LinOp,
    IdentityOp,
    DenseOp,
    DiagonalOp,
    AdjointOp,
    ChainOp,
    ScaledOp,
    ZeroOp,
    HostSparseOp,
    HostLUInverse,
    CGInverseOp,
    DeviceCholeskyInverse,
    RecycledCGInverseOp,
    ScipyLinearOperator,
    SparseCholeskyOp,
    sparse_cholesky,
    to_matrix,
)
from rla4mor_tpu.core.affine import (
    AffineOp,
    AffineDense,
    as_affine,
    compose,
    project,
    project_block,
    apply2,
    materialize,
    concat_affine,
)
from rla4mor_tpu.core.products import Product
from rla4mor_tpu.core.orthonormalize import gram_schmidt, pod
from rla4mor_tpu.core.rsvd import (
    range_finder,
    range_finder_adaptive,
    rsvd,
    pod_randomized,
)
from rla4mor_tpu.core.image import estimate_image
from rla4mor_tpu.core.solvers import cg, solve_dense, lstsq_dense, bounded_lstsq

__all__ = [
    "Mu", "ParameterSpace", "Coefficient", "ConstantCoefficient",
    "ProjectionCoefficient", "ProductCoefficient", "ExpressionCoefficient",
    "ONE", "eval_coefficients", "mu_stack", "mu_unstack",
    "LinOp", "IdentityOp", "DenseOp", "DiagonalOp", "AdjointOp", "ChainOp",
    "ScaledOp", "ZeroOp", "HostSparseOp", "HostLUInverse", "CGInverseOp",
    "DeviceCholeskyInverse", "RecycledCGInverseOp",
    "ScipyLinearOperator", "SparseCholeskyOp", "sparse_cholesky", "to_matrix",
    "AffineOp", "AffineDense", "as_affine", "compose", "project",
    "project_block", "apply2", "materialize", "concat_affine",
    "Product", "gram_schmidt", "pod", "estimate_image",
    "range_finder", "range_finder_adaptive", "rsvd", "pod_randomized",
    "cg", "solve_dense", "lstsq_dense", "bounded_lstsq",
]
