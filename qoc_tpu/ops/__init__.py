"""qoc_tpu.ops - L0 math kernels (linear algebra, expm, Magnus, RKDP5)."""

from qoc_tpu.ops.linalg import (
    commutator,
    conjugate_transpose,
    column_vector_list_to_matrix,
    krons,
    matmuls,
    matrix_to_column_vector_list,
    one_norm,
    rms_norm,
)
from qoc_tpu.ops.expm import (expm, expm_eigh, expm_frechet, expm_pade,
                              expm_taylor)
from qoc_tpu.ops.interpolate import (
    interpolate_linear_points,
    interpolate_linear_set,
)
from qoc_tpu.ops.magnus import magnus_m2, magnus_m4, magnus_m6
from qoc_tpu.ops.lindblad import get_lindbladian, lindblad_superoperator
from qoc_tpu.ops.rkdp5 import (
    integrate_rkdp5,
    integrate_rkdp5_scan,
    integrate_rkdp5_step,
    rkdp5_dense,
)

__all__ = [
    "commutator",
    "conjugate_transpose",
    "column_vector_list_to_matrix",
    "krons",
    "matmuls",
    "matrix_to_column_vector_list",
    "one_norm",
    "rms_norm",
    "expm",
    "expm_eigh",
    "expm_frechet",
    "expm_pade",
    "expm_taylor",
    "interpolate_linear_points",
    "interpolate_linear_set",
    "magnus_m2",
    "magnus_m4",
    "magnus_m6",
    "get_lindbladian",
    "lindblad_superoperator",
    "integrate_rkdp5",
    "integrate_rkdp5_scan",
    "integrate_rkdp5_step",
    "rkdp5_dense",
]
