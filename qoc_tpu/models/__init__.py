"""qoc_tpu.models - data models, policies, results (L1)."""

from qoc_tpu.models.cost import Cost
from qoc_tpu.models.hamiltonian import (ConstantLindblad,
                                        EnsembleLinearHamiltonian,
                                        LinearHamiltonian)
from qoc_tpu.models.policies import (
    Dummy,
    InterpolationPolicy,
    LindbladMethod,
    MagnusPolicy,
    OperationPolicy,
    PerformancePolicy,
    ProgramType,
)
from qoc_tpu.models.programstate import (
    EvolveLindbladDiscreteState,
    EvolveSchroedingerDiscreteState,
    GrapeLindbladDiscreteState,
    GrapeSchroedingerDiscreteState,
    GrapeState,
    ProgramState,
)
from qoc_tpu.models.results import (
    EvolveLindbladResult,
    EvolveSchroedingerResult,
    GrapeLindbladResult,
    GrapeSchroedingerResult,
)

__all__ = [
    "ConstantLindblad",
    "EnsembleLinearHamiltonian",
    "Cost",
    "LinearHamiltonian",
    "Dummy",
    "InterpolationPolicy",
    "LindbladMethod",
    "MagnusPolicy",
    "OperationPolicy",
    "PerformancePolicy",
    "ProgramType",
    "ProgramState",
    "GrapeState",
    "EvolveSchroedingerDiscreteState",
    "GrapeSchroedingerDiscreteState",
    "EvolveLindbladDiscreteState",
    "GrapeLindbladDiscreteState",
    "EvolveSchroedingerResult",
    "GrapeSchroedingerResult",
    "EvolveLindbladResult",
    "GrapeLindbladResult",
]
