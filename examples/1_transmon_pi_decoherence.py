"""Transmon pi-pulse with T1 decoherence via Lindblad GRAPE.

qoc_tpu port of the reference benchmark config
/root/reference/examples/1_transmon_pi_dechoerence.py (d=2, T1=10^3 ns,
11 control steps, system_eval_count=2, TargetDensityInfidelity, L-BFGS-B,
max_control_norm=5).

Note (matching the reference's comment): TargetDensityInfidelity uses the
Frobenius inner product, so even a perfect pulse bottoms out at error 0.5
for a pure target at d=2.
"""

import jax.numpy as jnp
import numpy as np

from qoc_tpu import grape_lindblad_discrete
from qoc_tpu.standard import (
    SIGMA_Z,
    LBFGSB,
    TargetDensityInfidelity,
    generate_save_file_path,
    get_annihilation_operator,
    get_creation_operator,
)

# Define the system.
HILBERT_SIZE = 2
ANNIHILATION_OPERATOR = get_annihilation_operator(HILBERT_SIZE)
CREATION_OPERATOR = get_creation_operator(HILBERT_SIZE)
H_SYSTEM_0 = SIGMA_Z / 2

hamiltonian = lambda controls, time: (
    H_SYSTEM_0 + controls[0] * ANNIHILATION_OPERATOR
    + jnp.conjugate(controls[0]) * CREATION_OPERATOR)

# T1-type decoherence (fig. 11 of Koch et al., Ann. Phys. 2017).
LINDBLAD_OPERATORS = np.stack((ANNIHILATION_OPERATOR,))
T1 = 1e3  # ns
GAMMA_1 = 1 / T1
LINDBLAD_DISSIPATORS = np.stack((GAMMA_1,))
lindblad_data = lambda time: (LINDBLAD_DISSIPATORS, LINDBLAD_OPERATORS)

# Define the problem.
INITIAL_STATE_0 = np.array([[1], [0]])
TARGET_STATE_0 = np.array([[0], [1]])
INITIAL_STATES = np.stack((INITIAL_STATE_0,), axis=0)
TARGET_STATES = np.stack((TARGET_STATE_0,), axis=0)
INITIAL_DENSITIES = INITIAL_STATES @ np.conjugate(
    np.swapaxes(INITIAL_STATES, -1, -2))
TARGET_DENSITIES = TARGET_STATES @ np.conjugate(
    np.swapaxes(TARGET_STATES, -1, -2))
COSTS = [TargetDensityInfidelity(TARGET_DENSITIES)]

# Define the optimization.
COMPLEX_CONTROLS = True
MAX_CONTROL_NORMS = np.array((5,))
CONTROL_COUNT = 1
EVOLUTION_TIME = 10  # nanoseconds
CONTROL_EVAL_COUNT = 11
SYSTEM_EVAL_COUNT = 2
ITERATION_COUNT = 100
OPTIMIZER = LBFGSB()

# Define output.
LOG_ITERATION_STEP = 1
SAVE_ITERATION_STEP = 1
SAVE_PATH = "./out"
SAVE_FILE_NAME = "transmon_pi_decoherence"


def main(iteration_count=ITERATION_COUNT, save_path=SAVE_PATH,
         log_iteration_step=LOG_ITERATION_STEP):
    save_file_path = generate_save_file_path(SAVE_FILE_NAME, save_path)
    result = grape_lindblad_discrete(
        CONTROL_COUNT, CONTROL_EVAL_COUNT, COSTS, EVOLUTION_TIME,
        INITIAL_DENSITIES, SYSTEM_EVAL_COUNT,
        complex_controls=COMPLEX_CONTROLS, hamiltonian=hamiltonian,
        iteration_count=iteration_count, lindblad_data=lindblad_data,
        log_iteration_step=log_iteration_step,
        max_control_norms=MAX_CONTROL_NORMS, optimizer=OPTIMIZER,
        save_file_path=save_file_path,
        save_iteration_step=SAVE_ITERATION_STEP)
    print("best error: {} at iteration {}".format(result.best_error,
                                                  result.best_iteration))
    return result


if __name__ == "__main__":
    main()
