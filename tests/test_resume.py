"""Checkpoint/resume and GRAPE intermediate-state recording tests.

Covers the two reference behaviors the drivers must honor end-to-end:
- intermediate states/densities written per save iteration during
  optimization (reference qoc/models/schroedingermodels.py:320-344, called
  from qoc/core/schroedingerdiscrete.py:394-402), verified against an
  evolve-path recomputation of the saved controls;
- resume (qoc_tpu extension improving on the reference's manual
  initial_controls feedback, schroedingerdiscrete.py:164-168): a run killed
  mid-flight restores params + optimizer moments + iteration numbering from
  its save file and reproduces the uninterrupted run's trajectory exactly.
"""

import h5py
import numpy as np
import pytest

import jax.numpy as jnp

from qoc_tpu import (
    evolve_lindblad_discrete,
    evolve_schroedinger_discrete,
    grape_lindblad_discrete,
    grape_schroedinger_discrete,
)
from qoc_tpu.models import LindbladMethod
from qoc_tpu.standard import (
    SIGMA_X,
    SIGMA_Z,
    TargetDensityInfidelity,
    TargetStateInfidelity,
)

_SZ = np.asarray(SIGMA_Z)
_SX = np.asarray(SIGMA_X)


def _hamiltonian(c, t):
    return jnp.asarray(_SZ) / 2 + c[0] * jnp.asarray(_SX)


_INITIAL_STATES = np.array([[[1.0], [0.0]]])
_TARGET_STATES = np.array([[[0.0], [1.0]]])


def _run(save_path, iteration_count=12, **kwargs):
    return grape_schroedinger_discrete(
        1, 5, [TargetStateInfidelity(_TARGET_STATES)], 4.0, _hamiltonian,
        _INITIAL_STATES, 5, complex_controls=True,
        iteration_count=iteration_count, log_iteration_step=0,
        save_file_path=save_path, save_iteration_step=1, **kwargs)


# ---------------------------------------------------------------------------
# Intermediate-state recording
# ---------------------------------------------------------------------------

def test_grape_saves_intermediate_states(tmp_path):
    """intermediate_states[save_step] must match an evolve-path
    recomputation at that row's saved controls (and not be silently
    zero-filled)."""
    save_path = str(tmp_path / "00000_intermediates.h5")
    grape_schroedinger_discrete(
        1, 5, [TargetStateInfidelity(_TARGET_STATES)], 4.0, _hamiltonian,
        _INITIAL_STATES, 5, complex_controls=True, iteration_count=5,
        log_iteration_step=0, save_file_path=save_path,
        save_iteration_step=2, save_intermediate_states=True)
    with h5py.File(save_path, "r") as f:
        stacks = np.asarray(f["intermediate_states"])
        controls_rows = np.asarray(f["controls"])
        finals = np.asarray(f["final_states"])
    assert stacks.shape == (3, 5, 1, 2, 1)
    for save_step in range(3):
        assert np.linalg.norm(stacks[save_step]) > 0.5
        # step 0 is the initial state, the last step the final state row.
        assert np.allclose(stacks[save_step, 0], _INITIAL_STATES)
        assert np.allclose(stacks[save_step, -1], finals[save_step],
                           atol=1e-10)
        ev = evolve_schroedinger_discrete(
            4.0, _hamiltonian, _INITIAL_STATES, 5,
            controls=controls_rows[save_step],
            save_intermediate_states=True)
        assert np.allclose(stacks[save_step], ev.intermediate_states,
                           atol=1e-10)


def test_grape_lindblad_saves_intermediate_densities(tmp_path):
    initial_densities = np.array([[[1.0, 0.0], [0.0, 0.0]]], dtype=complex)
    target_densities = np.array([[[0.0, 0.0], [0.0, 1.0]]], dtype=complex)
    costs = [TargetDensityInfidelity(target_densities)]
    save_path = str(tmp_path / "00000_lindblad.h5")
    grape_lindblad_discrete(
        1, 5, costs, 4.0, initial_densities, 5, complex_controls=True,
        hamiltonian=_hamiltonian, iteration_count=3, log_iteration_step=0,
        save_file_path=save_path, save_iteration_step=2,
        save_intermediate_densities=True,
        method=LindbladMethod.MAGNUS_EXPM)
    with h5py.File(save_path, "r") as f:
        stacks = np.asarray(f["intermediate_densities"])
        controls_rows = np.asarray(f["controls"])
    assert stacks.shape == (2, 5, 1, 2, 2)
    for save_step in range(2):
        assert np.linalg.norm(stacks[save_step]) > 0.5
        ev = evolve_lindblad_discrete(
            4.0, initial_densities, 5, controls=controls_rows[save_step],
            hamiltonian=_hamiltonian, save_intermediate_densities=True,
            method=LindbladMethod.MAGNUS_EXPM)
        assert np.allclose(stacks[save_step], ev.intermediate_densities,
                           atol=1e-10)


# ---------------------------------------------------------------------------
# Resume
# ---------------------------------------------------------------------------

def test_fused_resume_reproduces_uninterrupted_run(tmp_path, monkeypatch):
    """Kill the fused loop after 6 of 12 iterations (host-level crash), then
    resume_from the same file: the H5 rows and best error must match the
    uninterrupted run exactly."""
    full_path = str(tmp_path / "00000_full.h5")
    full = _run(full_path, fused_chunk=3)

    killed_path = str(tmp_path / "00000_killed.h5")
    import qoc_tpu.core.graperunner as gr
    real_log_row = gr._log_row
    calls = {"n": 0}

    def killing_log_row(pstate, iteration, error, grads_norm):
        calls["n"] += 1
        if calls["n"] > 6:
            raise RuntimeError("simulated crash")
        real_log_row(pstate, iteration, error, grads_norm)

    monkeypatch.setattr(gr, "_log_row", killing_log_row)
    with pytest.raises(RuntimeError, match="simulated crash"):
        _run(killed_path, fused_chunk=3)
    monkeypatch.undo()

    resumed = _run(killed_path, fused_chunk=3, resume_from=killed_path)
    # The resumed window re-ran iterations 6..11 with restored Adam moments.
    assert resumed.iteration_count_ran == 6
    assert np.allclose(resumed.errors, full.errors[6:], atol=1e-12)
    assert np.isclose(resumed.best_error, np.min(full.errors[6:]),
                      atol=1e-12)
    with h5py.File(full_path, "r") as f_full, \
            h5py.File(killed_path, "r") as f_res:
        assert np.allclose(np.asarray(f_full["error"]),
                           np.asarray(f_res["error"]), atol=1e-12)
        assert np.allclose(np.asarray(f_full["controls"]),
                           np.asarray(f_res["controls"]), atol=1e-12)


def test_host_resume_reproduces_uninterrupted_run(tmp_path):
    """Same kill-and-resume contract on the host loop (forced by an
    impose_control_conditions hook), restoring Adam's host-side moments."""
    identity_hook = lambda controls: controls
    full_path = str(tmp_path / "00000_full.h5")
    full = _run(full_path, impose_control_conditions=identity_hook)

    calls = {"n": 0}

    def killing_hook(controls):
        calls["n"] += 1
        if calls["n"] > 6:
            raise RuntimeError("simulated crash")
        return controls

    killed_path = str(tmp_path / "00000_killed.h5")
    with pytest.raises(RuntimeError, match="simulated crash"):
        _run(killed_path, impose_control_conditions=killing_hook)

    resumed = _run(killed_path, impose_control_conditions=identity_hook,
                   resume_from=killed_path)
    assert resumed.iteration_count_ran == 7  # re-runs the snapshot iteration
    with h5py.File(full_path, "r") as f_full, \
            h5py.File(killed_path, "r") as f_res:
        assert np.allclose(np.asarray(f_full["error"]),
                           np.asarray(f_res["error"]), atol=1e-12)
        assert np.allclose(np.asarray(f_full["controls"]),
                           np.asarray(f_res["controls"]), atol=1e-12)
    assert np.isclose(resumed.best_error, full.best_error, atol=1e-12)


def test_resume_without_checkpoint_falls_back_to_best_controls(tmp_path):
    """Files without an optimizer_state group (reference-style) resume from
    the lowest-error saved controls with a fresh optimizer."""
    save_path = str(tmp_path / "00000_base.h5")
    first = _run(save_path, iteration_count=6)
    with h5py.File(save_path, "a") as f:
        del f["optimizer_state"]
    resumed = grape_schroedinger_discrete(
        1, 5, [TargetStateInfidelity(_TARGET_STATES)], 4.0, _hamiltonian,
        _INITIAL_STATES, 5, complex_controls=True, iteration_count=6,
        log_iteration_step=0, resume_from=save_path)
    assert resumed.best_error <= first.best_error + 1e-9


def test_iterations_per_s_reported(tmp_path):
    result = _run(None, iteration_count=4)
    assert result.iterations_per_s > 0
    assert result.iterations_per_s_mean > 0


def test_iterations_per_s_is_steady_rate(tmp_path, monkeypatch):
    """result.iterations_per_s must be the meter's STEADY rate (first
    chunk's trace/compile interval excluded), not the cold-start-biased
    mean (VERDICT r4 Weak #4). Wiring test: instrument the RateMeter the
    runner constructs and assert the reported fields come from
    steady_rate/mean_rate respectively."""
    from qoc_tpu import core
    from qoc_tpu.profiler import RateMeter

    class Instrumented(RateMeter):
        steady_calls = 0

        @property
        def steady_rate(self):
            type(self).steady_calls += 1
            return 123.25

        @property
        def mean_rate(self):
            return 45.5

    monkeypatch.setattr(core.graperunner, "RateMeter", Instrumented)
    # Multiple chunks so steady and mean genuinely differ in real runs.
    result = _run(None, iteration_count=6, fused_chunk=2)
    assert Instrumented.steady_calls >= 1
    assert result.iterations_per_s == 123.25
    assert result.iterations_per_s_mean == 45.5


def test_resume_from_non_grape_file_clean_error(tmp_path):
    """resume_from an evolve-format save (no controls/error row datasets,
    no optimizer checkpoint) must raise a clean ValueError naming the file,
    not a raw KeyError from the fallback loader (VERDICT r4 Weak #3
    repro)."""
    evolve_path = str(tmp_path / "00000_evolve.h5")
    controls = np.full((5, 1), 0.1 + 0.0j)
    evolve_schroedinger_discrete(4.0, _hamiltonian, _INITIAL_STATES, 5,
                                 controls=controls,
                                 save_file_path=evolve_path)
    with pytest.raises(ValueError, match="not a GRAPE save file"):
        _run(str(tmp_path / "00000_new.h5"), resume_from=evolve_path)


def test_resume_same_file_with_larger_iteration_count(tmp_path):
    """Extending a finished run (resume_from the same file, larger
    iteration_count) grows the preallocated H5 rows and keeps the old
    ones."""
    save_path = str(tmp_path / "00000_grow.h5")
    first = _run(save_path, iteration_count=6)
    extended = _run(save_path, iteration_count=12, resume_from=save_path)
    assert extended.best_error < first.best_error
    with h5py.File(save_path, "r") as f:
        errors = np.asarray(f["error"])
        assert errors.shape == (12,)
        assert np.all(errors < np.finfo(np.float64).max)
        assert np.isclose(errors[0], first.errors[0], atol=1e-12)
        assert int(np.asarray(f["iteration_count"])) == 12


def test_single_run_resume_rejects_multistart_checkpoint(tmp_path):
    """Reverse direction of the multistart kind check (VERDICT r3 Weak #2):
    a multistart checkpoint fed to the single-run driver's ``resume_from``
    must raise the same clean ValueError, not a reshape TypeError from
    deep inside tracing (the candidate axis on the checkpointed params)."""
    from qoc_tpu.optim import Adam
    from qoc_tpu.parallel import grape_schroedinger_multistart, make_mesh
    path = str(tmp_path / "00000_ms.h5")
    grape_schroedinger_multistart(
        1, 5, [TargetStateInfidelity(_TARGET_STATES)], 4.0, _hamiltonian,
        _INITIAL_STATES, 5, n_starts=8, complex_controls=True,
        iteration_count=4, log_iteration_step=0,
        optimizer=Adam(learning_rate=0.02), save_file_path=path,
        mesh=make_mesh(8, axis_name="candidate"))
    with pytest.raises(ValueError, match="multistart checkpoint"):
        _run(str(tmp_path / "00000_new.h5"), resume_from=path)


def test_checkpoint_kind_tags_written(tmp_path):
    """Both runners stamp a decodable checkpoint_kind tag naming the run
    shape and optimizer into the optimizer_state group."""
    from qoc_tpu.core.graperunner import checkpoint_kind
    from qoc_tpu.io.h5 import H5Checkpointer
    from qoc_tpu.optim import Adam
    from qoc_tpu.parallel import grape_schroedinger_multistart, make_mesh
    single_path = str(tmp_path / "00000_single.h5")
    _run(single_path, iteration_count=4)
    state = H5Checkpointer(single_path).load_optimizer_state()
    assert checkpoint_kind(state) == "single:Adam"
    ms_path = str(tmp_path / "00000_ms.h5")
    grape_schroedinger_multistart(
        1, 5, [TargetStateInfidelity(_TARGET_STATES)], 4.0, _hamiltonian,
        _INITIAL_STATES, 5, n_starts=8, complex_controls=True,
        iteration_count=4, log_iteration_step=0,
        optimizer=Adam(learning_rate=0.02), save_file_path=ms_path,
        mesh=make_mesh(8, axis_name="candidate"))
    state = H5Checkpointer(ms_path).load_optimizer_state()
    assert checkpoint_kind(state) == "multistart:Adam"


def test_resume_finished_run_fills_result(tmp_path, capsys):
    """resume_from a checkpoint already at iteration_count: the driver
    evaluates the restored controls once instead of returning the sentinel
    carry (best_error = floatmax, zero controls), on both the fused and
    host paths."""
    from qoc_tpu.optim import LBFGSB
    path = str(tmp_path / "00000_fin.h5")
    orig = _run(path, iteration_count=8)
    resumed = _run(path, iteration_count=8, resume_from=path)
    out = capsys.readouterr().out
    assert resumed.iteration_count_ran == 0
    assert np.isfinite(resumed.best_error)
    assert resumed.best_error <= orig.errors[-1] + 1e-12
    assert resumed.best_controls is not None
    assert np.isfinite(resumed.best_controls).all()
    # Host path twin (LBFGSB resumes the Adam params; moment-loss notice).
    resumed_h = grape_schroedinger_discrete(
        1, 5, [TargetStateInfidelity(_TARGET_STATES)], 4.0, _hamiltonian,
        _INITIAL_STATES, 5, complex_controls=True, iteration_count=8,
        log_iteration_step=1, optimizer=LBFGSB(), resume_from=path)
    out = capsys.readouterr().out
    assert "restoring params only" in out
    assert "evaluating the restored controls" in out
    assert resumed_h.iteration_count_ran == 0
    assert np.isfinite(resumed_h.best_error)
