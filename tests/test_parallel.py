"""Multi-device tests on the 8-way virtual CPU mesh (SURVEY.md §4): sharded
psum results must equal the single-device computation, and ensemble GRAPE
must optimize the mean error.
"""

import numpy as np

import jax
import jax.numpy as jnp

from qoc_tpu.optim import Adam
from qoc_tpu.parallel import grape_schroedinger_ensemble, make_mesh
from qoc_tpu.standard import (
    SIGMA_Z,
    TargetStateInfidelity,
    get_annihilation_operator,
    get_creation_operator,
)

RNG = np.random.default_rng(21)


def _ensemble_setup():
    h0 = jnp.asarray(np.asarray(SIGMA_Z) / 2)
    a = jnp.asarray(get_annihilation_operator(2))
    ad = jnp.asarray(get_creation_operator(2))

    def hamiltonian(params, c, t):
        detuning = params[0]
        return ((1.0 + detuning) * h0 + c[0] * a + jnp.conjugate(c[0]) * ad)

    initial_states = np.array([[[1.0], [0.0]]])
    target_states = np.array([[[0.0], [1.0]]])
    return hamiltonian, initial_states, target_states


def test_devices_available():
    assert jax.device_count() == 8


def test_ensemble_sharded_matches_single_device():
    hamiltonian, initial_states, target_states = _ensemble_setup()
    costs = [TargetStateInfidelity(target_states)]
    params = RNG.normal(scale=0.05, size=(8, 1))
    kwargs = dict(complex_controls=True, iteration_count=12,
                  log_iteration_step=0,
                  optimizer=Adam(learning_rate=0.01))
    sharded = grape_schroedinger_ensemble(
        1, 11, costs, 10, hamiltonian, params, initial_states, 11,
        mesh=make_mesh(8), **kwargs)
    single = grape_schroedinger_ensemble(
        1, 11, costs, 10, hamiltonian, params, initial_states, 11,
        mesh=make_mesh(1), **kwargs)
    assert np.isclose(sharded.best_error, single.best_error, rtol=1e-9)
    assert np.allclose(sharded.best_controls, single.best_controls,
                       atol=1e-9)
    assert sharded.best_final_states.shape == (8, 1, 2, 1)


def test_ensemble_optimizes_mean_error():
    hamiltonian, initial_states, target_states = _ensemble_setup()
    costs = [TargetStateInfidelity(target_states)]
    params = RNG.normal(scale=0.02, size=(8, 1))
    result = grape_schroedinger_ensemble(
        1, 11, costs, 10, hamiltonian, params, initial_states, 11,
        complex_controls=True, iteration_count=150, log_iteration_step=0,
        mesh=make_mesh(8), optimizer=Adam(learning_rate=0.02))
    assert result.best_error < 0.05


def test_ensemble_member_count_divisibility_checked():
    hamiltonian, initial_states, target_states = _ensemble_setup()
    costs = [TargetStateInfidelity(target_states)]
    params = RNG.normal(size=(6, 1))  # not divisible by 8
    try:
        grape_schroedinger_ensemble(
            1, 5, costs, 5, hamiltonian, params, initial_states, 5,
            complex_controls=True, iteration_count=1, log_iteration_step=0,
            mesh=make_mesh(8))
        raised = False
    except ValueError:
        raised = True
    assert raised


def test_multistart_beats_or_matches_single_start():
    from qoc_tpu.parallel import grape_schroedinger_multistart
    hamiltonian0, initial_states, target_states = _ensemble_setup()
    hamiltonian = lambda c, t: hamiltonian0(np.zeros(1), c, t)
    costs = [TargetStateInfidelity(target_states)]
    result = grape_schroedinger_multistart(
        1, 11, costs, 10, hamiltonian, initial_states, 11, n_starts=8,
        complex_controls=True, iteration_count=60, log_iteration_step=0,
        mesh=make_mesh(8, axis_name="candidate"),
        optimizer=Adam(learning_rate=0.02))
    assert result.errors.shape == (8,)
    assert result.best_error == result.errors.min()
    assert result.best_controls.shape == (11, 1)
    assert np.isfinite(result.best_error)
    # best candidate made progress from ~0.97 initial error
    assert result.best_error < 0.5
