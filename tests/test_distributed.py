"""Multi-host bring-up proven single-box: two OS processes join via
``initialize_distributed`` (jax.distributed on localhost), build one global
mesh spanning both processes' devices, and run the psum-reduced ensemble
loss across the process boundary — the qoc_tpu multi-host communication
path (SURVEY.md §5 "distributed comm backend") minus the DCN wire.

Skips (rather than fails) when the local environment cannot host the
coordinator service.
"""

import socket
import subprocess
import sys

import numpy as np
import pytest

_WORKER = r"""
import os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from qoc_tpu.parallel.sharding import initialize_distributed

coordinator, process_id = sys.argv[1], int(sys.argv[2])
initialize_distributed(coordinator_address=coordinator, num_processes=2,
                       process_id=process_id)
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 4, jax.device_count()
assert jax.local_device_count() == 2

import numpy as np
import jax.numpy as jnp

from qoc_tpu.core.common import initialize_controls
from qoc_tpu.models import (GrapeSchroedingerDiscreteState,
                            InterpolationPolicy, MagnusPolicy)
from qoc_tpu.optim import Adam
from qoc_tpu.parallel import build_ensemble_loss, make_mesh
from qoc_tpu.standard import (SIGMA_Z, TargetStateInfidelity,
                              get_annihilation_operator,
                              get_creation_operator)

mesh = make_mesh()           # all 4 global devices, 2 per process
h0 = np.asarray(SIGMA_Z) / 2
a = get_annihilation_operator(2)
ad = get_creation_operator(2)

def hamiltonian(params, c, t):
    return (1.0 + params[0]) * jnp.asarray(h0) + c[0] * jnp.asarray(a) \
        + jnp.conjugate(c[0]) * jnp.asarray(ad)

initial = np.array([[[1.0], [0.0]]])
target = np.array([[[0.0], [1.0]]])
costs = [TargetStateInfidelity(target)]
ensemble_params = np.linspace(-0.05, 0.05, 8).reshape(-1, 1)
initial_controls, max_norms = initialize_controls(True, 1, 5, 4.0,
                                                  (0.3 + 0.1j) * np.ones((5, 1)),
                                                  None)
pstate = GrapeSchroedingerDiscreteState(
    True, 1, 5, 1, costs, 4.0, None, None, initial_controls, initial,
    InterpolationPolicy.LINEAR, 1, 0, max_norms, MagnusPolicy.M2, 0,
    Adam(), None, False, 0, 5)
loss = build_ensemble_loss(pstate, hamiltonian, ensemble_params, mesh)
controls = np.asarray(initial_controls, dtype=complex)
error, _ = jax.jit(loss)(jnp.asarray(controls))
print("DIST_ERROR {:.12e}".format(float(error)), flush=True)
jax.distributed.shutdown()
"""


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_distributed_ensemble_psum(tmp_path):
    coordinator = "127.0.0.1:{}".format(_free_port())
    procs = [
        subprocess.Popen([sys.executable, "-c", _WORKER, coordinator,
                          str(pid)], stdout=subprocess.PIPE,
                         stderr=subprocess.PIPE, text=True)
        for pid in range(2)
    ]
    outs = []
    for proc in procs:
        try:
            out, err = proc.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for p in procs:
                p.kill()
            pytest.skip("jax.distributed workers timed out in this "
                        "environment")
        outs.append((proc.returncode, out, err))
    for code, out, err in outs:
        if code != 0 and "DIST_ERROR" not in out:
            if ("UNAVAILABLE" in err or "DEADLINE_EXCEEDED" in err
                    or "barrier" in err.lower()):
                pytest.skip("jax.distributed unavailable: " + err[-400:])
            raise AssertionError("worker failed:\n" + err[-2000:])
    errors = []
    for _, out, _ in outs:
        for line in out.splitlines():
            if line.startswith("DIST_ERROR"):
                errors.append(float(line.split()[1]))
    assert len(errors) == 2, outs
    # Both processes agree on the psum-reduced global mean error...
    assert np.isclose(errors[0], errors[1], rtol=1e-12)

    # ...and it equals the single-process evaluation of the same ensemble.
    import jax
    import jax.numpy as jnp
    from qoc_tpu.core.common import initialize_controls
    from qoc_tpu.models import (GrapeSchroedingerDiscreteState,
                                InterpolationPolicy, MagnusPolicy)
    from qoc_tpu.optim import Adam
    from qoc_tpu.parallel import build_ensemble_loss
    from qoc_tpu.parallel.sharding import make_mesh
    from qoc_tpu.standard import (SIGMA_Z, TargetStateInfidelity,
                                  get_annihilation_operator,
                                  get_creation_operator)

    h0 = np.asarray(SIGMA_Z) / 2
    a = get_annihilation_operator(2)
    ad = get_creation_operator(2)

    def hamiltonian(params, c, t):
        return ((1.0 + params[0]) * jnp.asarray(h0)
                + c[0] * jnp.asarray(a)
                + jnp.conjugate(c[0]) * jnp.asarray(ad))

    initial = np.array([[[1.0], [0.0]]])
    target = np.array([[[0.0], [1.0]]])
    costs = [TargetStateInfidelity(target)]
    ensemble_params = np.linspace(-0.05, 0.05, 8).reshape(-1, 1)
    initial_controls, max_norms = initialize_controls(
        True, 1, 5, 4.0, (0.3 + 0.1j) * np.ones((5, 1)), None)
    pstate = GrapeSchroedingerDiscreteState(
        True, 1, 5, 1, costs, 4.0, None, None, initial_controls, initial,
        InterpolationPolicy.LINEAR, 1, 0, max_norms, MagnusPolicy.M2, 0,
        Adam(), None, False, 0, 5)
    loss = build_ensemble_loss(pstate, hamiltonian, ensemble_params,
                               make_mesh(4))
    local_error = float(jax.jit(loss)(
        jnp.asarray(np.asarray(initial_controls, dtype=complex)))[0])
    assert np.isclose(errors[0], local_error, rtol=1e-9)


_DRIVER_WORKER = r"""
import os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from qoc_tpu.parallel.sharding import initialize_distributed

coordinator, process_id, phase, workdir = (sys.argv[1], int(sys.argv[2]),
                                           sys.argv[3], sys.argv[4])
initialize_distributed(coordinator_address=coordinator, num_processes=2,
                       process_id=process_id)

import numpy as np
import jax.numpy as jnp

from qoc_tpu.optim import Adam
from qoc_tpu.parallel import grape_schroedinger_ensemble, make_mesh
from qoc_tpu.standard import (SIGMA_Z, TargetStateInfidelity,
                              get_annihilation_operator,
                              get_creation_operator)

h0 = np.asarray(SIGMA_Z) / 2
a = get_annihilation_operator(2)
ad = get_creation_operator(2)

def hamiltonian(params, c, t):
    return (1.0 + params[0]) * jnp.asarray(h0) + c[0] * jnp.asarray(a) \
        + jnp.conjugate(c[0]) * jnp.asarray(ad)

initial = np.array([[[1.0], [0.0]]])
target = np.array([[[0.0], [1.0]]])
costs = [TargetStateInfidelity(target)]
ensemble_params = np.linspace(-0.05, 0.05, 8).reshape(-1, 1)
mesh = make_mesh()            # 4 global devices, 2 per process

kwargs = dict(complex_controls=True, log_iteration_step=1,
              save_iteration_step=1,
              initial_controls=(0.3 + 0.1j) * np.ones((5, 1)),
              optimizer=Adam(learning_rate=0.05), mesh=mesh)

def run(path, iteration_count, **extra):
    return grape_schroedinger_ensemble(
        1, 5, costs, 4.0, hamiltonian, ensemble_params, initial, 5,
        iteration_count=iteration_count, save_file_path=path,
        **kwargs, **extra)

if phase == "full":
    result = run(os.path.join(workdir, "00000_full.h5"), 10)
elif phase == "killed":
    result = run(os.path.join(workdir, "00000_killed.h5"), 6)
elif phase == "resumed":
    path = os.path.join(workdir, "00000_killed.h5")
    result = run(path, 10, resume_from=path)
print("DRIVER_DONE {} {:.12e}".format(phase, float(result.best_error)),
      flush=True)
jax.distributed.shutdown()
"""


def _launch_driver_phase(coordinator, phase, workdir):
    procs = [
        subprocess.Popen([sys.executable, "-c", _DRIVER_WORKER, coordinator,
                          str(pid), phase, workdir],
                         stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                         text=True)
        for pid in range(2)
    ]
    outs = []
    for proc in procs:
        try:
            out, err = proc.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for p in procs:
                p.kill()
            pytest.skip("jax.distributed workers timed out in this "
                        "environment")
        outs.append((proc.returncode, out, err))
    for code, out, err in outs:
        if code != 0 and "DRIVER_DONE" not in out:
            if ("UNAVAILABLE" in err or "DEADLINE_EXCEEDED" in err
                    or "barrier" in err.lower()):
                pytest.skip("jax.distributed unavailable: " + err[-400:])
            raise AssertionError("worker failed:\n" + err[-2000:])
    return outs


def test_two_process_driver_end_to_end(tmp_path):
    """The FULL driver loop runs multi-host (VERDICT r3 Missing #1): a
    2-process ``grape_schroedinger_ensemble`` with per-iteration logging
    and H5 saving completes; exactly one process logs and writes; the H5
    matches a single-process run of the same workload; and a
    kill-at-iteration-6 + cross-process resume reproduces the
    uninterrupted run's rows exactly."""
    import h5py

    workdir = str(tmp_path)
    outs = _launch_driver_phase("127.0.0.1:{}".format(_free_port()),
                                "full", workdir)

    # Both processes agree on the result...
    errors = {}
    for _, out, _ in outs:
        for line in out.splitlines():
            if line.startswith("DRIVER_DONE"):
                errors[out.splitlines().index(line)] = float(line.split()[2])
    done_lines = [line for _, out, _ in outs for line in out.splitlines()
                  if line.startswith("DRIVER_DONE")]
    assert len(done_lines) == 2, outs
    vals = [float(line.split()[2]) for line in done_lines]
    assert np.isclose(vals[0], vals[1], rtol=1e-12)

    # ...but only process 0 logged and announced the save file.
    out0, out1 = outs[0][1], outs[1][1]
    assert "QOC is saving" in out0
    assert "QOC is saving" not in out1
    assert "| " in out0                      # iteration rows
    assert not any("| " in line for line in out1.splitlines()
                   if not line.startswith("DRIVER_DONE")), out1

    # The written H5 matches a single-process run of the same workload.
    import jax
    import jax.numpy as jnp
    from qoc_tpu.optim import Adam
    from qoc_tpu.parallel import grape_schroedinger_ensemble, make_mesh
    from qoc_tpu.standard import (SIGMA_Z, TargetStateInfidelity,
                                  get_annihilation_operator,
                                  get_creation_operator)

    h0 = np.asarray(SIGMA_Z) / 2
    a = get_annihilation_operator(2)
    ad = get_creation_operator(2)

    def hamiltonian(params, c, t):
        return ((1.0 + params[0]) * jnp.asarray(h0)
                + c[0] * jnp.asarray(a)
                + jnp.conjugate(c[0]) * jnp.asarray(ad))

    initial = np.array([[[1.0], [0.0]]])
    target = np.array([[[0.0], [1.0]]])
    costs = [TargetStateInfidelity(target)]
    ensemble_params = np.linspace(-0.05, 0.05, 8).reshape(-1, 1)
    local_path = str(tmp_path / "00000_local.h5")
    local = grape_schroedinger_ensemble(
        1, 5, costs, 4.0, hamiltonian, ensemble_params, initial, 5,
        complex_controls=True, iteration_count=10, log_iteration_step=0,
        save_iteration_step=1, save_file_path=local_path,
        initial_controls=(0.3 + 0.1j) * np.ones((5, 1)),
        optimizer=Adam(learning_rate=0.05), mesh=make_mesh(4))
    assert np.isclose(vals[0], local.best_error, rtol=1e-9)
    dist_path = str(tmp_path / "00000_full.h5")
    with h5py.File(dist_path, "r") as f_dist, \
            h5py.File(local_path, "r") as f_loc:
        for key in ("error", "controls", "final_states"):
            assert np.allclose(np.asarray(f_dist[key]),
                               np.asarray(f_loc[key]), atol=1e-9), key


def test_two_process_driver_kill_and_resume(tmp_path):
    """Cross-process kill+resume: 6 iterations, stop, resume to 10 on a
    fresh 2-process launch; the resumed file's rows equal the
    uninterrupted 2-process run's."""
    import h5py

    workdir = str(tmp_path)
    _launch_driver_phase("127.0.0.1:{}".format(_free_port()), "full",
                         workdir)
    _launch_driver_phase("127.0.0.1:{}".format(_free_port()), "killed",
                         workdir)
    outs = _launch_driver_phase("127.0.0.1:{}".format(_free_port()),
                                "resumed", workdir)
    assert any("DRIVER_DONE" in out for _, out, _ in outs)
    with h5py.File(str(tmp_path / "00000_full.h5"), "r") as f_full, \
            h5py.File(str(tmp_path / "00000_killed.h5"), "r") as f_res:
        assert np.allclose(np.asarray(f_full["error"]),
                           np.asarray(f_res["error"]), atol=1e-12)
        assert np.allclose(np.asarray(f_full["controls"]),
                           np.asarray(f_res["controls"]), atol=1e-12)
        assert np.allclose(np.asarray(f_full["final_states"]),
                           np.asarray(f_res["final_states"]), atol=1e-12)


_MS_WORKER = r"""
import os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from qoc_tpu.parallel.sharding import initialize_distributed

coordinator, process_id, workdir = sys.argv[1], int(sys.argv[2]), sys.argv[3]
initialize_distributed(coordinator_address=coordinator, num_processes=2,
                       process_id=process_id)

import numpy as np
import jax.numpy as jnp

from qoc_tpu.optim import Adam
from qoc_tpu.parallel import grape_schroedinger_multistart, make_mesh
from qoc_tpu.standard import (SIGMA_Z, TargetStateInfidelity,
                              get_annihilation_operator,
                              get_creation_operator)
from qoc_tpu.models import LinearHamiltonian

h0 = np.asarray(SIGMA_Z) / 2
a = get_annihilation_operator(2)
hamiltonian = LinearHamiltonian(h0, np.stack((a,)))
initial = np.array([[[1.0], [0.0]]])
target = np.array([[[0.0], [1.0]]])
costs = [TargetStateInfidelity(target)]

result = grape_schroedinger_multistart(
    1, 21, costs, 10, hamiltonian, initial, 21, n_starts=8,
    complex_controls=True, iteration_count=8, log_iteration_step=2,
    optimizer=Adam(learning_rate=0.02),
    save_file_path=os.path.join(workdir, "00000_ms.h5"),
    save_iteration_step=2,
    mesh=make_mesh(axis_name="candidate"))
print("MS_DONE {:.12e}".format(float(result.best_error)), flush=True)
jax.distributed.shutdown()
"""


def test_two_process_multistart_driver(tmp_path):
    """The sharded multistart engine runs multi-host: candidate-sharded
    rows/carry pulls reshard to replicated inside a jit before the host
    transfer, process 0 owns the winner-row H5 writes, and the result
    equals a single-process run of the same 8 candidates."""
    import h5py

    workdir = str(tmp_path)
    coordinator = "127.0.0.1:{}".format(_free_port())
    procs = [
        subprocess.Popen([sys.executable, "-c", _MS_WORKER, coordinator,
                          str(pid), workdir],
                         stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                         text=True)
        for pid in range(2)
    ]
    outs = []
    for proc in procs:
        try:
            out, err = proc.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for p in procs:
                p.kill()
            pytest.skip("jax.distributed workers timed out in this "
                        "environment")
        outs.append((proc.returncode, out, err))
    for code, out, err in outs:
        if code != 0 and "MS_DONE" not in out:
            if ("UNAVAILABLE" in err or "DEADLINE_EXCEEDED" in err
                    or "barrier" in err.lower()):
                pytest.skip("jax.distributed unavailable: " + err[-400:])
            raise AssertionError("worker failed:\n" + err[-2000:])
    vals = [float(line.split()[1]) for _, out, _ in outs
            for line in out.splitlines() if line.startswith("MS_DONE")]
    assert len(vals) == 2, outs
    assert np.isclose(vals[0], vals[1], rtol=1e-12)
    # Only process 0 logged.
    assert "best" in outs[0][1]
    assert "best" not in outs[1][1]

    # Equals the single-process run (same seeds, same candidate count).
    import jax
    from qoc_tpu.models import LinearHamiltonian
    from qoc_tpu.optim import Adam
    from qoc_tpu.parallel import grape_schroedinger_multistart, make_mesh
    from qoc_tpu.standard import (SIGMA_Z, TargetStateInfidelity,
                                  get_annihilation_operator)
    h0 = np.asarray(SIGMA_Z) / 2
    a = get_annihilation_operator(2)
    hamiltonian = LinearHamiltonian(h0, np.stack((a,)))
    initial = np.array([[[1.0], [0.0]]])
    target = np.array([[[0.0], [1.0]]])
    costs = [TargetStateInfidelity(target)]
    local = grape_schroedinger_multistart(
        1, 21, costs, 10, hamiltonian, initial, 21, n_starts=8,
        complex_controls=True, iteration_count=8, log_iteration_step=0,
        optimizer=Adam(learning_rate=0.02),
        mesh=make_mesh(4, axis_name="candidate"))
    assert np.isclose(vals[0], local.best_error, rtol=1e-9)
    with h5py.File(str(tmp_path / "00000_ms.h5"), "r") as f:
        errs = np.asarray(f["error"])
        assert errs.shape[0] == 4
        assert np.isfinite(errs).all()


_LINDBLAD_WORKER = r"""
import os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from qoc_tpu.parallel.sharding import initialize_distributed

coordinator, process_id, workdir = sys.argv[1], int(sys.argv[2]), sys.argv[3]
initialize_distributed(coordinator_address=coordinator, num_processes=2,
                       process_id=process_id)

import numpy as np
import jax.numpy as jnp

from qoc_tpu.models import (ConstantLindblad, EnsembleLinearHamiltonian,
                            LindbladMethod)
from qoc_tpu.optim import Adam
from qoc_tpu.parallel import grape_lindblad_ensemble, make_mesh
from qoc_tpu.standard import (SIGMA_Z, TargetDensityInfidelity,
                              get_annihilation_operator)

h0 = np.asarray(SIGMA_Z) / 2
a = get_annihilation_operator(2)
ens_ham = EnsembleLinearHamiltonian(h0, np.stack((a,)), [h0])
members = np.linspace(-0.05, 0.05, 4).reshape(-1, 1)
initial = np.array([[[1.0, 0.0], [0.0, 0.0]]], dtype=complex)
target = np.array([[[0.0, 0.0], [0.0, 1.0]]], dtype=complex)
costs = [TargetDensityInfidelity(target)]
lindblad_data = ConstantLindblad(np.array([1e-3]), np.stack([a]))

result = grape_lindblad_ensemble(
    1, 7, costs, 5.0, ens_ham, members, initial, 21,
    complex_controls=True, iteration_count=5,
    lindblad_data=lindblad_data, log_iteration_step=1,
    method=LindbladMethod.MAGNUS_EXPM, mesh=make_mesh(),
    optimizer=Adam(learning_rate=0.05),
    save_file_path=os.path.join(workdir, "00000_lens.h5"),
    save_iteration_step=1)
print("LB_DONE {:.12e}".format(float(result.best_error)), flush=True)
jax.distributed.shutdown()
"""


def test_two_process_lindblad_ensemble_driver(tmp_path):
    """The open-system ensemble driver runs multi-host too: its density
    aux replicates for the member-extended H5 rows, process 0 is the only
    writer, and the result equals a single-process run."""
    import h5py

    coordinator = "127.0.0.1:{}".format(_free_port())
    procs = [
        subprocess.Popen([sys.executable, "-c", _LINDBLAD_WORKER,
                          coordinator, str(pid), str(tmp_path)],
                         stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                         text=True)
        for pid in range(2)
    ]
    outs = []
    for proc in procs:
        try:
            out, err = proc.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for p in procs:
                p.kill()
            pytest.skip("jax.distributed workers timed out in this "
                        "environment")
        outs.append((proc.returncode, out, err))
    for code, out, err in outs:
        if code != 0 and "LB_DONE" not in out:
            if ("UNAVAILABLE" in err or "DEADLINE_EXCEEDED" in err
                    or "barrier" in err.lower()):
                pytest.skip("jax.distributed unavailable: " + err[-400:])
            raise AssertionError("worker failed:\n" + err[-2000:])
    vals = [float(line.split()[1]) for _, out, _ in outs
            for line in out.splitlines() if line.startswith("LB_DONE")]
    assert len(vals) == 2, outs
    assert np.isclose(vals[0], vals[1], rtol=1e-12)
    assert "QOC is saving" in outs[0][1]
    assert "QOC is saving" not in outs[1][1]

    from qoc_tpu.models import (ConstantLindblad, EnsembleLinearHamiltonian,
                                LindbladMethod)
    from qoc_tpu.optim import Adam
    from qoc_tpu.parallel import grape_lindblad_ensemble, make_mesh
    from qoc_tpu.standard import (SIGMA_Z, TargetDensityInfidelity,
                                  get_annihilation_operator)
    h0 = np.asarray(SIGMA_Z) / 2
    a = get_annihilation_operator(2)
    ens_ham = EnsembleLinearHamiltonian(h0, np.stack((a,)), [h0])
    members = np.linspace(-0.05, 0.05, 4).reshape(-1, 1)
    initial = np.array([[[1.0, 0.0], [0.0, 0.0]]], dtype=complex)
    target = np.array([[[0.0, 0.0], [0.0, 1.0]]], dtype=complex)
    local = grape_lindblad_ensemble(
        1, 7, [TargetDensityInfidelity(target)], 5.0, ens_ham, members,
        initial, 21, complex_controls=True, iteration_count=5,
        lindblad_data=ConstantLindblad(np.array([1e-3]), np.stack([a])),
        log_iteration_step=0, method=LindbladMethod.MAGNUS_EXPM,
        mesh=make_mesh(4), optimizer=Adam(learning_rate=0.05))
    assert np.isclose(vals[0], local.best_error, rtol=1e-9)
    with h5py.File(str(tmp_path / "00000_lens.h5"), "r") as f:
        assert np.asarray(f["final_densities"]).shape == (5, 4, 1, 2, 2)
        assert np.isfinite(np.asarray(f["error"])).all()
