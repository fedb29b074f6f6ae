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
