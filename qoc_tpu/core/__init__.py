"""qoc_tpu.core - solvers and drivers (L2): the four API entry points."""

from qoc_tpu.core.lindblad import (
    evolve_lindblad_discrete,
    grape_lindblad_discrete,
)
from qoc_tpu.core.schroedinger import (
    evolve_schroedinger_discrete,
    grape_schroedinger_discrete,
)
from qoc_tpu.core.unitary import grape_unitary

__all__ = [
    "evolve_lindblad_discrete",
    "grape_lindblad_discrete",
    "evolve_schroedinger_discrete",
    "grape_schroedinger_discrete",
    "grape_unitary",
]
