"""qoc_tpu.costs - the extensible cost-function stack (L3).

Parity with /root/reference/qoc/standard/costs/__init__.py:5-14 (all 10
reference costs).
"""

from qoc_tpu.costs.control_costs import (
    ControlArea,
    ControlBandwidthMax,
    ControlNorm,
    ControlVariation,
)
from qoc_tpu.costs.density_costs import (
    ForbidDensities,
    TargetDensityInfidelity,
    TargetDensityInfidelityTime,
)
from qoc_tpu.costs.state_costs import (
    ForbidStates,
    TargetStateInfidelity,
    TargetStateInfidelityTime,
)

__all__ = [
    "ControlArea",
    "ControlBandwidthMax",
    "ControlNorm",
    "ControlVariation",
    "ForbidDensities",
    "ForbidStates",
    "TargetDensityInfidelity",
    "TargetDensityInfidelityTime",
    "TargetStateInfidelity",
    "TargetStateInfidelityTime",
]
