from rla4mor_tpu.precond.preconditioned_reductor import PreconditionedReductor
from rla4mor_tpu.precond.preconditioned_rom import (
    PreconditionedRom,
    FactoredROM,
    FactoredResidualEstimator,
)

__all__ = [
    "PreconditionedReductor",
    "PreconditionedRom",
    "FactoredROM",
    "FactoredResidualEstimator",
]
