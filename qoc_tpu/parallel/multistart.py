"""Multi-start GRAPE: many pulse candidates optimized in parallel.

The BASELINE.json north star calls for "thousands of pulse candidates ...
rolled out in parallel". GRAPE landscapes are non-convex and the reference's
answer is rerunning with different ``initial_controls`` by hand; here the
candidate axis is a batch dimension: every candidate carries its own
controls and Adam state, the whole (loss + grad + update) iteration is
``vmap``-ed over candidates and sharded across the mesh, and the best
candidate wins. Per-iteration communication is zero (candidates are
independent); only the final argmin reads across the axis.
"""

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec

from qoc_tpu.config import device_get, np_real_dtype, real_dtype
from qoc_tpu.core.common import (
    clip_control_norms_jax,
    gen_controls_white,
    initialize_controls,
    slap_controls,
    slap_controls_jax,
    strip_controls,
    strip_controls_jax,
)
from qoc_tpu.core.schroedinger import build_schroedinger_loss
from qoc_tpu.models import (
    GrapeSchroedingerDiscreteState,
    GrapeSchroedingerResult,
    InterpolationPolicy,
    MagnusPolicy,
)
from qoc_tpu.optim import Adam
from qoc_tpu.parallel.sharding import make_mesh

__all__ = ["grape_schroedinger_multistart"]

CANDIDATE_AXIS = "candidate"


def grape_schroedinger_multistart(control_count, control_eval_count, costs,
                                  evolution_time, hamiltonian,
                                  initial_states, system_eval_count,
                                  n_starts=8, complex_controls=False,
                                  cost_eval_step=1, initial_controls=None,
                                  interpolation_policy=InterpolationPolicy.LINEAR,
                                  iteration_count=1000,
                                  log_iteration_step=10,
                                  magnus_policy=MagnusPolicy.M2,
                                  max_control_norms=None, mesh=None,
                                  optimizer=None, seed=0):
    """Optimize ``n_starts`` independent pulse candidates in parallel and
    return the best (qoc_tpu extension).

    Candidate 0 uses the reference's flat initial controls (or the supplied
    ``initial_controls``); the rest are white-noise seeds
    (reference common.py:78-108 generator). ``n_starts`` must be divisible
    by the mesh size when a mesh is given.

    Returns a ``GrapeSchroedingerResult`` for the winning candidate, with
    ``result.errors`` holding every candidate's final error.
    """
    costs = list(costs)
    if optimizer is None:
        optimizer = Adam()
    if mesh is None:
        mesh = make_mesh(axis_name=CANDIDATE_AXIS)
    n_devices = int(np.prod(list(mesh.shape.values())))
    if n_starts % n_devices != 0:
        raise ValueError("n_starts {} must be divisible by the mesh size {}"
                         "".format(n_starts, n_devices))

    base_controls, max_control_norms = initialize_controls(
        complex_controls, control_count, control_eval_count, evolution_time,
        initial_controls, max_control_norms)
    pstate = GrapeSchroedingerDiscreteState(
        complex_controls, control_count, control_eval_count, cost_eval_step,
        costs, evolution_time, hamiltonian, None, base_controls,
        initial_states, interpolation_policy, iteration_count,
        log_iteration_step, max_control_norms, magnus_policy, 0.0, optimizer,
        None, False, 0, system_eval_count)
    result = GrapeSchroedingerResult()

    loss_controls = build_schroedinger_loss(pstate)
    cc = complex_controls
    shape = pstate.controls_shape
    rdt = real_dtype()
    mcn = np.asarray(max_control_norms)

    def loss_flat(flat_params):
        return loss_controls(slap_controls_jax(cc, flat_params, shape))

    vg = jax.value_and_grad(loss_flat, has_aux=True)

    def candidate_step(params, opt_state):
        controls = slap_controls_jax(cc, params, shape)
        clipped = clip_control_norms_jax(controls, jnp.asarray(mcn))
        clipped_flat = strip_controls_jax(cc, clipped)
        (error, _), grads = vg(clipped_flat)
        opt_state, params = optimizer.update_jax(opt_state, grads, params)
        # clipped_flat is the evaluated (projected) iterate matching `error`.
        return params, opt_state, error, clipped_flat

    batched_step = jax.jit(jax.vmap(candidate_step))

    # Candidate seeds: reference flat controls + white-noise starts.
    seeds = [strip_controls(cc, base_controls)]
    for i in range(1, n_starts):
        noise = gen_controls_white(cc, control_count, control_eval_count,
                                   evolution_time, mcn, seed=seed + i)
        seeds.append(strip_controls(cc, noise))
    params = jnp.asarray(np.stack(seeds).astype(np_real_dtype()))
    if n_devices > 1:
        sharding = NamedSharding(mesh, PartitionSpec(CANDIDATE_AXIS))
        params = jax.device_put(params, sharding)

    @jax.jit
    def make_opt_state(params_):
        return jax.vmap(optimizer.init_state)(params_)

    opt_state = make_opt_state(params)
    errors = evaluated = None
    for iteration in range(iteration_count):
        params, opt_state, errors, evaluated = batched_step(params,
                                                            opt_state)
        if (pstate.should_log
                and (iteration % pstate.log_iteration_step == 0
                     or iteration == iteration_count - 1)):
            errs = device_get(errors)
            print("{:^6d} | best {:^1.8e} | median {:^1.8e}"
                  "".format(iteration, float(np.min(errs)),
                            float(np.median(errs))))

    errors = device_get(errors)
    winner = int(np.argmin(errors))
    winning_flat = device_get(evaluated[winner])
    result.best_controls = slap_controls(cc, np.asarray(winning_flat), shape)
    result.best_error = float(errors[winner])
    result.best_iteration = iteration_count - 1
    result.errors = errors
    result.iteration_count_ran = iteration_count
    return result
