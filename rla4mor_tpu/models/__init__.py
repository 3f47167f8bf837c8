from rla4mor_tpu.models.stationary import (
    StationaryFOM,
    StationaryROM,
    ResidualErrorEstimator,
)
from rla4mor_tpu.models.thermal_block import ThermalBlockFOM
from rla4mor_tpu.models.advection_diffusion import AdvectionDiffusionFOM
from rla4mor_tpu.models.helmholtz import helmholtz_fom
from rla4mor_tpu.models.instationary_stencil import InstationaryStencilFOM, MassStencilOp
from rla4mor_tpu.models.stencil_advection import StencilAdvectionDiffusion
from rla4mor_tpu.models.stencil_helmholtz import (
    StencilHelmholtz,
    StencilHelmholtzDamped,
)
from rla4mor_tpu.models.stencil3d import StencilThermalBlock3D
from rla4mor_tpu.models.stencil_nonaffine import (
    EimStencilFOM,
    NonAffineStencilFOM,
    NonAffineStencilFOM3D,
    gaussian_bump_fom,
    gaussian_bump_fom3d,
)
from rla4mor_tpu.models.instationary import (
    InstationaryFOM,
    InstationaryROM,
    InstationaryReductor,
    instationary_thermal_block,
    pod_greedy,
)
from rla4mor_tpu.models.instationary_primal_dual import (
    InstationaryCorrectedOutputROM,
    InstationaryPrimalDualReductor,
    output_pod_greedy,
    solve_dual,
)
from rla4mor_tpu.models.wave import (
    WaveFOM,
    WaveROM,
    WaveReductor,
    wave_thermal_block,
)
from rla4mor_tpu.models.wave_stencil import WaveStencilFOM
from rla4mor_tpu.models.semilinear import SemilinearStencilFOM

__all__ = [
    "StationaryFOM",
    "StationaryROM",
    "ResidualErrorEstimator",
    "ThermalBlockFOM",
    "AdvectionDiffusionFOM",
    "InstationaryFOM", "InstationaryROM", "InstationaryReductor",
    "instationary_thermal_block", "pod_greedy", "InstationaryStencilFOM", "MassStencilOp", "helmholtz_fom",
    "StencilAdvectionDiffusion", "StencilHelmholtz",
    "StencilHelmholtzDamped", "StencilThermalBlock3D",
    "NonAffineStencilFOM", "NonAffineStencilFOM3D", "EimStencilFOM",
    "gaussian_bump_fom", "gaussian_bump_fom3d",
    "InstationaryCorrectedOutputROM", "InstationaryPrimalDualReductor",
    "output_pod_greedy", "solve_dual",
    "WaveFOM", "WaveROM", "WaveReductor", "wave_thermal_block",
    "WaveStencilFOM",
    "SemilinearStencilFOM",
]
