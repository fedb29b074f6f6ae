"""qoc_tpu.parallel - mesh sharding, ensemble-robust GRAPE, and multistart
(L5)."""

from qoc_tpu.parallel.ensemble import (
    build_ensemble_loss,
    grape_schroedinger_ensemble,
)
from qoc_tpu.parallel.lindblad import (
    build_lindblad_ensemble_loss,
    grape_lindblad_ensemble,
    grape_lindblad_multistart,
)
from qoc_tpu.parallel.multistart import grape_schroedinger_multistart
from qoc_tpu.parallel.sharding import (
    ENSEMBLE_AXIS,
    initialize_distributed,
    make_mesh,
    replicated,
    shard_leading_axis,
)

__all__ = [
    "ENSEMBLE_AXIS",
    "build_ensemble_loss",
    "build_lindblad_ensemble_loss",
    "grape_lindblad_ensemble",
    "grape_lindblad_multistart",
    "grape_schroedinger_ensemble",
    "grape_schroedinger_multistart",
    "initialize_distributed",
    "make_mesh",
    "replicated",
    "shard_leading_axis",
]
