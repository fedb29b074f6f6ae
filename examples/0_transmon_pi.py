"""Transmon pi-pulse: ground -> first excited state via Schrödinger GRAPE.

qoc_tpu port of the reference benchmark config
/root/reference/examples/0_transmon_pi.py (d=2, 1 complex control, T=10 ns,
11 control/system steps, TargetStateInfidelity, Adam, 1000 iterations).
The only user-visible differences: jax.numpy instead of autograd.numpy in the
Hamiltonian, and the package name.
"""

import jax.numpy as jnp
import numpy as np

from qoc_tpu import grape_schroedinger_discrete
from qoc_tpu.standard import (
    SIGMA_Z,
    TargetStateInfidelity,
    generate_save_file_path,
    get_annihilation_operator,
    get_creation_operator,
)

# Define the system (eq. 19 of arXiv:1904.06560).
HILBERT_SIZE = 2
ANNIHILATION_OPERATOR = get_annihilation_operator(HILBERT_SIZE)
CREATION_OPERATOR = get_creation_operator(HILBERT_SIZE)
H_SYSTEM_0 = SIGMA_Z / 2

hamiltonian = lambda controls, time: (H_SYSTEM_0
                                      + controls[0] * ANNIHILATION_OPERATOR
                                      + jnp.conjugate(controls[0])
                                      * CREATION_OPERATOR)

# Define the problem.
INITIAL_STATE_0 = np.array([[1], [0]])
TARGET_STATE_0 = np.array([[0], [1]])
INITIAL_STATES = np.stack((INITIAL_STATE_0,), axis=0)
TARGET_STATES = np.stack((TARGET_STATE_0,), axis=0)
COSTS = [TargetStateInfidelity(TARGET_STATES)]

# Define the optimization.
COMPLEX_CONTROLS = True
CONTROL_COUNT = 1
EVOLUTION_TIME = 10  # nanoseconds
CONTROL_EVAL_COUNT = SYSTEM_EVAL_COUNT = EVOLUTION_TIME + 1
ITERATION_COUNT = 1000

# Define output.
LOG_ITERATION_STEP = 1
SAVE_ITERATION_STEP = 1
SAVE_PATH = "./out"
SAVE_FILE_NAME = "transmon_pi"


def main(iteration_count=ITERATION_COUNT, save_path=SAVE_PATH,
         log_iteration_step=LOG_ITERATION_STEP):
    save_file_path = generate_save_file_path(SAVE_FILE_NAME, save_path)
    result = grape_schroedinger_discrete(
        CONTROL_COUNT, CONTROL_EVAL_COUNT, COSTS, EVOLUTION_TIME,
        hamiltonian, INITIAL_STATES, SYSTEM_EVAL_COUNT,
        complex_controls=COMPLEX_CONTROLS, iteration_count=iteration_count,
        log_iteration_step=log_iteration_step,
        save_file_path=save_file_path,
        save_iteration_step=SAVE_ITERATION_STEP)
    print("best error: {} at iteration {}".format(result.best_error,
                                                  result.best_iteration))
    return result


if __name__ == "__main__":
    main()
