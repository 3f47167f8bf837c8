from rla4mor_tpu.models.stationary import (
    StationaryFOM,
    StationaryROM,
    ResidualErrorEstimator,
)
from rla4mor_tpu.models.thermal_block import ThermalBlockFOM

__all__ = [
    "StationaryFOM",
    "StationaryROM",
    "ResidualErrorEstimator",
    "ThermalBlockFOM",
]
