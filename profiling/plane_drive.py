"""TPU drive: Magnus-M4 plane-chain kernel vs the generic blocked-XLA path.

Measures the round-5 generator-plane fusion (VERDICT r4 Missing #2) on a
d=64 / 10-control / 2001-step GRAPE workload under MagnusPolicy.M4: the
plane path builds the M4 generators (nodes + commutator term) at the XLA
level and streams them through the segment-interleaved plane kernels; the
generic path is the round-4 behavior (batched Pallas expm + pairwise tree
reduce). Also validates loss/grad agreement between the paths at f32.

Run on the TPU:  timeout 1800 python profiling/plane_drive.py
"""

import os
import time

os.environ.setdefault("QOC_TPU_MXU_PRECISION", "bf16_3x")

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

D = 64
CONTROL_COUNT = 10
N_STEPS = 2001
EVOLUTION_TIME = 20.0
ITERS = 20


def _problem(magnus_policy):
    from qoc_tpu.core.common import initialize_controls
    from qoc_tpu.models import (GrapeSchroedingerDiscreteState,
                                InterpolationPolicy, LinearHamiltonian)
    from qoc_tpu.optim import Adam
    from qoc_tpu.standard import TargetStateInfidelity

    rng = np.random.default_rng(0)

    def herm(d):
        h = rng.normal(size=(d, d)) + 1j * rng.normal(size=(d, d))
        return ((h + h.conj().T) / 2).astype(np.complex64)

    h0 = herm(D)
    ops = np.stack([herm(D) for _ in range(CONTROL_COUNT)])
    ham = LinearHamiltonian(h0, ops)
    initial = np.zeros((1, D, 1)); initial[0, 0] = 1
    target = np.zeros((1, D, 1)); target[0, -1] = 1
    ic, mn = initialize_controls(True, CONTROL_COUNT, N_STEPS,
                                 EVOLUTION_TIME, None, None)
    pstate = GrapeSchroedingerDiscreteState(
        True, CONTROL_COUNT, N_STEPS, 1, [TargetStateInfidelity(target)],
        EVOLUTION_TIME, ham, None, ic, initial, InterpolationPolicy.LINEAR,
        ITERS, 0, mn, magnus_policy, 0, Adam(), None, False, 0, N_STEPS)
    return pstate, ic


def _time_step(pstate, ic, label):
    from qoc_tpu.core.common import slap_controls_jax, strip_controls
    from qoc_tpu.core.schroedinger import build_schroedinger_loss
    from qoc_tpu.optim import Adam

    loss_controls = build_schroedinger_loss(pstate, log_path=True)
    shape = pstate.controls_shape
    optimizer = Adam()

    @jax.jit
    def step(params, opt_state):
        (error, _), grads = jax.value_and_grad(
            lambda f: loss_controls(slap_controls_jax(True, f, shape)),
            has_aux=True)(params)
        opt_state, params = optimizer.update_jax(opt_state, grads, params)
        return params, opt_state, error

    params = jnp.asarray(strip_controls(True, ic))
    opt_state = optimizer.init_state(params)
    t0 = time.perf_counter()
    params, opt_state, error = step(params, opt_state)
    float(error)
    compile_s = time.perf_counter() - t0
    for _ in range(2):
        params, opt_state, error = step(params, opt_state)
    float(error)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        params, opt_state, error = step(params, opt_state)
    err = float(error)
    dt = (time.perf_counter() - t0) / ITERS
    print("{}: {:.4f} s/it ({:.2f} it/s), compile {:.0f} s, "
          "error@{} = {:.6f}".format(label, dt, 1 / dt, compile_s,
                                     3 + ITERS, err))
    return dt, err


def main():
    from qoc_tpu.models import MagnusPolicy
    from qoc_tpu.ops import chain_pallas

    pstate, ic = _problem(MagnusPolicy.M4)
    dt_fused, err_fused = _time_step(pstate, ic, "M4 fused plane-chain")

    # Generic comparison: same problem with the plane path disabled.
    orig = chain_pallas.plane_chain_ok
    chain_pallas.plane_chain_ok = lambda *a, **k: False
    try:
        pstate2, _ = _problem(MagnusPolicy.M4)
        dt_gen, err_gen = _time_step(pstate2, ic,
                                     "M4 generic blocked-XLA")
    finally:
        chain_pallas.plane_chain_ok = orig

    print("speedup: {:.2f}x; |error diff| = {:.2e}".format(
        dt_gen / dt_fused, abs(err_fused - err_gen)))


if __name__ == "__main__":
    main()
