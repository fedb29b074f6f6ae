"""Two-qubit iSWAP gate synthesis on coupled transmons (dim-16 Hilbert
space with leakage levels).

BASELINE.json config #3: "two-qubit entangling gate (CZ/iSWAP) on coupled
transmons, dim-16+ Hilbert space". Gate synthesis is posed as multi-state
transfer via the unitary <-> state-batch isomorphism
(qoc_tpu.standard.matrix_to_column_vector_list, the reference's
tests/test_core.py:92-93 pattern): propagate the four computational basis
states and demand they map to the iSWAP images.
"""

import numpy as np
import jax.numpy as jnp

from qoc_tpu import grape_schroedinger_discrete
from qoc_tpu.standard import (
    TargetStateInfidelity,
    get_annihilation_operator,
    get_creation_operator,
)

# Two 4-level transmons (2 computational + 2 leakage levels each): d = 16.
LEVELS = 4
D = LEVELS * LEVELS
A1 = np.kron(get_annihilation_operator(LEVELS), np.eye(LEVELS))
A2 = np.kron(np.eye(LEVELS), get_annihilation_operator(LEVELS))
N1 = A1.conj().T @ A1
N2 = A2.conj().T @ A2

ANHARMONICITY = -0.2 * 2 * np.pi  # GHz
COUPLING = 0.01 * 2 * np.pi

H0 = (ANHARMONICITY / 2 * (A1.conj().T @ A1.conj().T @ A1 @ A1)
      + ANHARMONICITY / 2 * (A2.conj().T @ A2.conj().T @ A2 @ A2)
      + COUPLING * (A1.conj().T @ A2 + A2.conj().T @ A1)).astype(np.complex64)
A1_C = A1.astype(np.complex64)
A2_C = A2.astype(np.complex64)


def hamiltonian(controls, time):
    return (H0
            + controls[0] * A1_C + jnp.conjugate(controls[0]) * A1_C.T
            + controls[1] * A2_C + jnp.conjugate(controls[1]) * A2_C.T)


def _basis(i, j):
    v = np.zeros((D, 1))
    v[i * LEVELS + j] = 1
    return v


# Computational basis |00>, |01>, |10>, |11> and their iSWAP images.
INITIAL_STATES = np.stack([_basis(0, 0), _basis(0, 1), _basis(1, 0),
                           _basis(1, 1)])
TARGET_STATES = np.stack([_basis(0, 0), 1j * _basis(1, 0),
                          1j * _basis(0, 1), _basis(1, 1)])
COSTS = [TargetStateInfidelity(TARGET_STATES)]

EVOLUTION_TIME = 120.0  # ns (~pi / 2g for the iSWAP interaction)
CONTROL_EVAL_COUNT = SYSTEM_EVAL_COUNT = 241
ITERATION_COUNT = 300


def main(iteration_count=ITERATION_COUNT, log_iteration_step=25):
    result = grape_schroedinger_discrete(
        2, CONTROL_EVAL_COUNT, COSTS, EVOLUTION_TIME, hamiltonian,
        INITIAL_STATES, SYSTEM_EVAL_COUNT, complex_controls=True,
        iteration_count=iteration_count,
        log_iteration_step=log_iteration_step,
        max_control_norms=np.array([0.05 * 2 * np.pi, 0.05 * 2 * np.pi]))
    print("best error: {} at iteration {}".format(result.best_error,
                                                  result.best_iteration))
    return result


if __name__ == "__main__":
    main()
