"""Ensemble-robust GRAPE: optimize one pulse against a detuning sweep,
sharded across all local devices.

BASELINE.json config #4: "ensemble-robust GRAPE: batched Hamiltonian
parameter sweep (detuning/amplitude noise), psum-reduced gradients". Each
ensemble member is a (detuning, amplitude-scale) pair; members propagate in
parallel across the mesh and their cost/gradient contributions are psum-
reduced into a single Adam update on the shared controls.
"""

import numpy as np
import jax.numpy as jnp

from qoc_tpu.optim import Adam
from qoc_tpu.parallel import grape_schroedinger_ensemble, make_mesh
from qoc_tpu.standard import (
    SIGMA_Z,
    TargetStateInfidelity,
    get_annihilation_operator,
    get_creation_operator,
)

H0 = np.asarray(SIGMA_Z) / 2
A = get_annihilation_operator(2)
AD = get_creation_operator(2)


def hamiltonian(params, controls, time):
    detuning, amp_scale = params[0], params[1]
    drive = amp_scale * controls[0]
    return ((1.0 + detuning) * H0 + drive * A + jnp.conjugate(drive) * AD)


INITIAL_STATES = np.array([[[1.0], [0.0]]])
TARGET_STATES = np.array([[[0.0], [1.0]]])
COSTS = [TargetStateInfidelity(TARGET_STATES)]

# 16 members: detunings x amplitude miscalibrations.
DETUNINGS = np.linspace(-0.02, 0.02, 4)
AMP_SCALES = np.linspace(0.95, 1.05, 4)
ENSEMBLE_PARAMS = np.array([[d, a] for d in DETUNINGS for a in AMP_SCALES])


def main(iteration_count=500, log_iteration_step=50):
    mesh = make_mesh()  # all local devices
    result = grape_schroedinger_ensemble(
        1, 11, COSTS, 10, hamiltonian, ENSEMBLE_PARAMS, INITIAL_STATES, 11,
        complex_controls=True, iteration_count=iteration_count,
        log_iteration_step=log_iteration_step, mesh=mesh,
        optimizer=Adam(learning_rate=0.01))
    print("ensemble-mean best error: {} at iteration {}"
          "".format(result.best_error, result.best_iteration))
    print("per-member final states shape:",
          result.best_final_states.shape)
    return result


if __name__ == "__main__":
    main()
