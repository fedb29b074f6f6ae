"""I/O layer tests: H5 schema parity, numeric-prefix save paths, optimizer
state checkpointing (qoc_tpu extension), JSON encoding.
"""

import json
import os

import h5py
import numpy as np

import jax.numpy as jnp

from qoc_tpu import grape_schroedinger_discrete
from qoc_tpu.io import CustomJSONEncoder, H5Checkpointer, generate_save_file_path
from qoc_tpu.standard import SIGMA_Z, TargetStateInfidelity

# Dataset names the reference preallocates for a GRAPE Schrödinger run
# (reference schroedingermodels.py:276-307).
REFERENCE_GRAPE_KEYS = {
    "complex_controls", "control_count", "control_eval_count", "controls",
    "cost_eval_step", "cost_names", "error", "evolution_time",
    "final_states", "grads", "initial_controls", "initial_states",
    "interpolation_policy", "iteration_count", "magnus_policy",
    "max_control_norms", "method", "optimizer", "program_type",
    "system_eval_count",
}


def test_generate_save_file_path_increments(tmp_path):
    p1 = generate_save_file_path("run", str(tmp_path))
    assert p1.endswith("00000_run.h5")
    open(p1, "w").close()
    p2 = generate_save_file_path("run", str(tmp_path))
    assert p2.endswith("00001_run.h5")


def test_grape_h5_schema_parity(tmp_path):
    hamiltonian = lambda c, t: jnp.asarray(SIGMA_Z) / 2 + c[0] * jnp.eye(2)
    initial_states = np.array([[[1.0], [0.0]]])
    target_states = np.array([[[0.0], [1.0]]])
    save_path = str(tmp_path / "00000_test.h5")
    result = grape_schroedinger_discrete(
        1, 5, [TargetStateInfidelity(target_states)], 4, hamiltonian,
        initial_states, 5, complex_controls=True, iteration_count=6,
        log_iteration_step=0, save_file_path=save_path,
        save_iteration_step=2)
    with h5py.File(save_path, "r") as f:
        assert REFERENCE_GRAPE_KEYS.issubset(set(f.keys()))
        # save_count = ceil(6 / 2) = 3
        assert f["controls"].shape == (3, 5, 1)
        assert f["controls"].dtype == np.complex128
        assert f["grads"].shape == (3, 5, 1)
        assert f["final_states"].shape == (3, 1, 2, 1)
        errors = np.asarray(f["error"])
        assert np.all(errors < np.finfo(np.float64).max)
        # iteration 0 row equals the logged first error
        assert np.isclose(errors[0], result.errors[0])
        assert f["method"][()] == b"grape_schroedinger_discrete"
    # the lock file used for live-plotting coordination exists
    assert os.path.exists(save_path + ".lock")


def test_optimizer_state_checkpoint_roundtrip(tmp_path):
    path = str(tmp_path / "ckpt.h5")
    with h5py.File(path, "w") as f:
        f["placeholder"] = 1
    ckpt = H5Checkpointer(path)
    state = {"m": np.arange(4.0), "v": np.ones(4), "t": np.asarray(3)}
    ckpt.save_optimizer_state(state)
    loaded = ckpt.load_optimizer_state()
    assert set(loaded) == {"m", "v", "t"}
    assert np.allclose(loaded["m"], np.arange(4.0))
    assert int(loaded["t"]) == 3


def test_custom_json_encoder():
    blob = json.dumps(
        {"a": np.int64(3), "b": np.float32(0.5), "c": np.arange(3),
         "d": np.complex128(1 + 2j)},
        cls=CustomJSONEncoder)
    decoded = json.loads(blob)
    assert decoded["a"] == 3
    assert decoded["c"] == [0, 1, 2]
    assert decoded["d"] == {"re": 1.0, "im": 2.0}


def test_resume_load_controls(tmp_path):
    from qoc_tpu.io import load_best_controls, load_controls
    hamiltonian = lambda c, t: jnp.asarray(SIGMA_Z) / 2 + c[0] * jnp.eye(2)
    initial_states = np.array([[[1.0], [0.0]]])
    target_states = np.array([[[0.0], [1.0]]])
    save_path = str(tmp_path / "00000_resume.h5")
    result = grape_schroedinger_discrete(
        1, 5, [TargetStateInfidelity(target_states)], 4, hamiltonian,
        initial_states, 5, complex_controls=True, iteration_count=6,
        log_iteration_step=0, save_file_path=save_path, save_iteration_step=1)
    controls, error, index = load_best_controls(save_path)
    assert controls.shape == (5, 1)
    assert np.isclose(error, result.best_error, rtol=1e-6)
    last_controls, last_error = load_controls(save_path, -1)
    assert last_controls.shape == (5, 1)
    # resume from the loaded controls
    resumed = grape_schroedinger_discrete(
        1, 5, [TargetStateInfidelity(target_states)], 4, hamiltonian,
        initial_states, 5, complex_controls=True, iteration_count=3,
        log_iteration_step=0, initial_controls=controls)
    assert resumed.best_error <= error + 1e-9
