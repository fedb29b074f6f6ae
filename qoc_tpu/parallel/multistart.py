"""Multi-start GRAPE: many pulse candidates optimized in parallel.

The BASELINE.json north star calls for "thousands of pulse candidates ...
rolled out in parallel". GRAPE landscapes are non-convex and the reference's
answer is rerunning with different ``initial_controls`` by hand; here the
candidate axis is a batch dimension: every candidate carries its own
controls and Adam state, the whole (loss + grad + update) iteration runs
device-resident — candidates sharded over a ``"candidate"`` mesh axis,
optionally crossed with an ``"ensemble"`` axis for robust-GRAPE multistart
(each candidate's error is the psum-reduced ensemble mean) — and the best
candidate wins. Per-iteration communication is zero for plain multistart
(candidates are independent); ensemble multistart psums member partials.
The chunked execution loop, checkpoint/resume, and H5 winner-row machinery
live in parallel/_msrunner.py (shared with the Lindblad multistart).

Fast path: for a declared :class:`LinearHamiltonian` /
:class:`EnsembleLinearHamiltonian` under Magnus-M2, every (candidate ×
member) trajectory is a chain of exp-of-linear-combination
steps, so the whole shard propagates through ONE batched fused Pallas chain
kernel per time block (ops/chain_pallas.py — the flattened candidate×member
axis is the kernel's major grid dimension). The per-candidate gradient falls
out of one value_and_grad of the shard SUM (candidates are independent, so
d(Σ_c err_c)/d(params_c') = d err_c'/d params_c').
"""

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from qoc_tpu.config import (MATMUL_PRECISION, device_get, np_complex_dtype,
                            np_real_dtype, real_dtype)
from qoc_tpu.core.common import initialize_controls, slap_controls_jax
from qoc_tpu.core.schroedinger import build_schroedinger_loss
from qoc_tpu.io.resume import apply_resume
from qoc_tpu.models import (
    EnsembleLinearHamiltonian,
    GrapeSchroedingerDiscreteState,
    GrapeSchroedingerResult,
    InterpolationPolicy,
    LinearHamiltonian,
    MagnusPolicy,
)
from qoc_tpu.ops.interpolate import interpolate_linear_set
from qoc_tpu.optim import Adam
from qoc_tpu.parallel._msrunner import (
    CANDIDATE_AXIS,
    run_multistart,
    validate_multistart_entry,
)
from qoc_tpu.parallel.sharding import ENSEMBLE_AXIS, make_mesh

__all__ = ["grape_schroedinger_multistart"]


def grape_schroedinger_multistart(control_count, control_eval_count, costs,
                                  evolution_time, hamiltonian,
                                  initial_states, system_eval_count,
                                  n_starts=8, complex_controls=False,
                                  cost_eval_step=1,
                                  hamiltonian_params=None,
                                  initial_controls=None,
                                  interpolation_policy=InterpolationPolicy.LINEAR,
                                  iteration_count=1000,
                                  log_iteration_step=10,
                                  magnus_policy=MagnusPolicy.M2,
                                  max_control_norms=None, mesh=None,
                                  min_error=0, optimizer=None,
                                  resume_from=None, save_file_path=None,
                                  save_iteration_step=0, seed=0,
                                  fused_chunk=None, fused_mode=None,
                                  check_vma=True):
    """Optimize ``n_starts`` independent pulse candidates in parallel and
    return the best (qoc_tpu extension).

    Candidate 0 uses the reference's flat initial controls (or the supplied
    ``initial_controls``); the rest are white-noise seeds
    (reference common.py:78-108 generator). ``n_starts`` must be divisible
    by the mesh's "candidate" axis size.

    Robust-GRAPE multistart: pass ``hamiltonian_params`` (n_members, P) and
    an ensemble-contract ``hamiltonian(params_row, controls, t)`` (e.g. an
    :class:`EnsembleLinearHamiltonian`); each candidate then optimizes the
    ensemble-mean error. A 2-D mesh with axes ("candidate", "ensemble")
    shards both axes; the default mesh puts all devices on the candidate
    axis with a size-1 ensemble axis.

    ``min_error`` terminates the run when any candidate's evaluation
    reaches it. ``save_file_path``/``save_iteration_step`` write standard
    GRAPE H5 rows for the PER-ITERATION winning candidate (its evaluated
    error/controls/gradients; final states recomputed by one forward
    dispatch per save row) — live-plottable with the usual tooling. With
    ``hamiltonian_params`` the rows use the member-extended schema
    (``final_states :: (save_count, n_members, K, d, 1)`` plus a
    ``hamiltonian_params`` dataset), exactly like
    ``grape_schroedinger_ensemble``.

    With ``save_file_path`` set, the full candidate state (params, Adam
    moments, done flags, bests) is checkpointed at every chunk boundary;
    ``resume_from=`` restores it and continues, reproducing the
    uninterrupted run exactly.

    Returns a ``GrapeSchroedingerResult`` for the winning candidate, with
    ``result.errors`` holding every candidate's best error and
    ``result.iterations_per_s`` the aggregate candidate-iteration rate.
    """
    costs = list(costs)
    if optimizer is None:
        optimizer = Adam()
    validate_multistart_entry(optimizer, "grape_schroedinger_multistart",
                              "grape_schroedinger_discrete",
                              hamiltonian, hamiltonian_params)
    ensemble = hamiltonian_params is not None
    if mesh is None:
        if ensemble:
            devices = np.asarray(jax.devices()).reshape(-1, 1)
            from jax.sharding import Mesh
            mesh = Mesh(devices, (CANDIDATE_AXIS, ENSEMBLE_AXIS))
        else:
            mesh = make_mesh(axis_name=CANDIDATE_AXIS)
    n_cand_shards = mesh.shape.get(CANDIDATE_AXIS, 1)
    n_ens_shards = mesh.shape.get(ENSEMBLE_AXIS, 1)
    if n_starts % n_cand_shards != 0:
        raise ValueError("n_starts {} must be divisible by the candidate "
                         "mesh axis size {}".format(n_starts, n_cand_shards))
    if ensemble:
        hamiltonian_params = np.asarray(hamiltonian_params)
        n_members = hamiltonian_params.shape[0]
        if n_members % n_ens_shards != 0:
            raise ValueError(
                "ensemble member count {} must be divisible by the ensemble "
                "mesh axis size {}".format(n_members, n_ens_shards))
    else:
        n_members = 1

    base_controls, max_control_norms = initialize_controls(
        complex_controls, control_count, control_eval_count, evolution_time,
        initial_controls, max_control_norms)
    pstate = GrapeSchroedingerDiscreteState(
        complex_controls, control_count, control_eval_count, cost_eval_step,
        costs, evolution_time, hamiltonian, None, base_controls,
        initial_states, interpolation_policy, iteration_count,
        log_iteration_step, max_control_norms, magnus_policy, min_error,
        optimizer, save_file_path, False, save_iteration_step,
        system_eval_count)
    if ensemble:
        # Member-extended H5 schema (as in grape_schroedinger_ensemble):
        # winner rows carry (n_members, K, d, 1) final states plus the
        # hamiltonian_params dataset.
        pstate.evolved_shape = ((n_members,)
                                + np.asarray(initial_states).shape)
        pstate.ensemble_params = hamiltonian_params
    if resume_from is not None:
        apply_resume(pstate, resume_from)
    if pstate.should_save:
        if pstate.checkpointer._writes_enabled:
            print("QOC is saving this optimization run to {}."
                  "".format(save_file_path))
        if not getattr(pstate, "resuming_same_file", False):
            pstate.checkpointer.create_grape_file(pstate,
                                                  pstate._save_count())
    result = GrapeSchroedingerResult()

    cc = complex_controls
    shape = pstate.controls_shape
    c_per_shard = n_starts // n_cand_shards
    vary_axes = ((CANDIDATE_AXIS, ENSEMBLE_AXIS) if ensemble
                 else (CANDIDATE_AXIS,))

    # ---- per-shard loss of the candidate-batch SUM --------------------- --
    # shard_loss_sum(clipped_flat (C_s, nflat)) -> (sum_c err_c, errs (C_s,))
    # in the LOCAL-member partial sense; the ensemble psum/mean is applied
    # by the iteration step.
    shard_loss_sum = _make_shard_loss(
        pstate, hamiltonian, hamiltonian_params, ensemble, cc, shape,
        c_per_shard, n_ens_shards, vary_axes, check_vma)
    if pstate.should_log:
        if getattr(shard_loss_sum, "uses_fused_chain", False):
            print("qoc_tpu: multistart propagation path = fused Pallas "
                  "chain kernel (candidate{}-batched)."
                  "".format("xmember" if ensemble else ""))
        else:
            print("qoc_tpu: multistart propagation path = generic batched "
                  "Magnus+expm under vmap (declare a LinearHamiltonian / "
                  "EnsembleLinearHamiltonian with Magnus M2 for the ~10x "
                  "fused path).")

    states_fn = None
    if pstate.should_save:
        if ensemble:
            members_h = hamiltonian_params.astype(
                np_complex_dtype() if np.iscomplexobj(hamiltonian_params)
                else np_real_dtype())

            def member_states(f, row):
                controls = slap_controls_jax(cc, f, shape)
                override = lambda c, t: hamiltonian(row, c, t)
                mloss = build_schroedinger_loss(
                    pstate, hamiltonian_override=override,
                    allow_plane_chain=False)  # vmapped below
                return mloss(controls)[1]

            # Members embed as a trace-time numpy constant (complex jit
            # arguments are rejected by the axon backend).
            states_fn = jax.jit(lambda f: jax.vmap(
                lambda row: member_states(f, row))(jnp.asarray(members_h)))
        else:
            plain_loss = build_schroedinger_loss(pstate)
            states_fn = jax.jit(
                lambda f: plain_loss(slap_controls_jax(cc, f, shape))[1])

    winning_flat = run_multistart(
        pstate, result, mesh, shard_loss_sum, n_starts, ensemble, n_members,
        "final_states", states_fn=states_fn, seed=seed,
        fused_chunk=fused_chunk, fused_mode=fused_mode, check_vma=check_vma)
    # One forward evaluation of the winner reconstructs its final states
    # (per member for robust multistart) — cheaper than carrying state
    # buffers for every candidate through the optimization.
    result.best_final_states = _winner_final_states(
        pstate, hamiltonian, hamiltonian_params, ensemble, cc, shape,
        winning_flat)
    return result


def _winner_final_states(pstate, hamiltonian, hamiltonian_params, ensemble,
                         cc, shape, winning_flat):
    # Only the flat REAL params cross host->device; the complex controls are
    # rebuilt inside the jit (the axon backend rejects complex arguments).
    flat = jnp.asarray(np.asarray(winning_flat).astype(np_real_dtype()))
    if ensemble:
        members = np.asarray(hamiltonian_params)
        members = members.astype(np_complex_dtype()
                                 if np.iscomplexobj(members)
                                 else np_real_dtype())

        def member_states(flat_params, row):
            controls = slap_controls_jax(cc, flat_params, shape)
            override = lambda c, t: hamiltonian(row, c, t)
            loss = build_schroedinger_loss(pstate,
                                           hamiltonian_override=override,
                                           allow_plane_chain=False)
            return loss(controls)[1]

        states = jax.jit(lambda f, rows: jax.vmap(
            lambda row: member_states(f, row))(rows))(
                flat, jnp.asarray(members))
    else:
        loss = build_schroedinger_loss(pstate)
        states = jax.jit(lambda f: loss(
            slap_controls_jax(cc, f, shape))[1])(flat)
    return np.asarray(device_get(states))


def _make_shard_loss(pstate, hamiltonian, hamiltonian_params, ensemble, cc,
                     shape, c_per_shard, n_ens_shards, vary_axes, check_vma):
    """Build shard_loss_sum: clipped flat candidate params (C_s, nflat) ->
    (Σ_c local-member error sum, per-candidate local errors (C_s,)).

    Fused regime (Linear/EnsembleLinearHamiltonian, Magnus M2, Pallas
    available): all candidate×member trajectories propagate through one
    batched chain kernel per time block — step costs included via the
    kernel's per-step prefixes (round 5). Otherwise the generic
    per-candidate loss runs under vmap.
    """
    fused = _make_fused_shard_loss(pstate, hamiltonian, hamiltonian_params,
                                   ensemble, cc, shape, c_per_shard,
                                   n_ens_shards, vary_axes, check_vma)
    if fused is not None:
        return fused

    if ensemble:
        members = np.asarray(hamiltonian_params)
        m_per_shard = members.shape[0] // n_ens_shards

        def member_loss(controls, params_row):
            override = lambda c, t: hamiltonian(params_row, c, t)
            loss = build_schroedinger_loss(
                pstate, hamiltonian_override=override,
                pvary_axes=vary_axes if check_vma else None,
                allow_plane_chain=False)  # vmapped below
            return loss(controls)[0]

        def shard_loss_sum(clipped_flat):
            def candidate_err(flat):
                controls = slap_controls_jax(cc, flat, shape)
                if ENSEMBLE_AXIS in vary_axes and n_ens_shards > 1:
                    shard_index = lax.axis_index(ENSEMBLE_AXIS)
                    rows = lax.dynamic_slice_in_dim(
                        jnp.asarray(members), shard_index * m_per_shard,
                        m_per_shard, axis=0)
                else:
                    rows = jnp.asarray(members)
                errs = jax.vmap(
                    lambda row: member_loss(controls, row))(rows)
                return jnp.sum(errs)

            errs = jax.vmap(candidate_err)(clipped_flat)
            return jnp.sum(errs), errs

        shard_loss_sum.uses_fused_chain = False
        return shard_loss_sum

    loss = build_schroedinger_loss(
        pstate, pvary_axes=vary_axes if check_vma else None,
        allow_plane_chain=False)  # vmapped over candidates below

    def shard_loss_sum(clipped_flat):
        def candidate_err(flat):
            return loss(slap_controls_jax(cc, flat, shape))[0]

        errs = jax.vmap(candidate_err)(clipped_flat)
        return jnp.sum(errs), errs

    shard_loss_sum.uses_fused_chain = False
    return shard_loss_sum


def _make_fused_shard_loss(pstate, hamiltonian, hamiltonian_params, ensemble,
                           cc, shape, c_per_shard, n_ens_shards, vary_axes,
                           check_vma):
    from qoc_tpu.ops.expm import _EXPM_FORWARD, _pallas_ok

    if ensemble:
        if not isinstance(hamiltonian, EnsembleLinearHamiltonian):
            return None
        params = np.asarray(hamiltonian_params)
        if (params.ndim != 2 or np.iscomplexobj(params)
                or params.shape[1] != hamiltonian.param_count):
            return None
        p_count = hamiltonian.param_count
        m_per_shard = params.shape[0] // n_ens_shards
    else:
        if not isinstance(hamiltonian, LinearHamiltonian):
            return None
        if isinstance(hamiltonian, EnsembleLinearHamiltonian):
            return None
        params = None
        p_count = 0
        m_per_shard = 1
    if pstate.magnus_policy != MagnusPolicy.M2:
        return None
    if pstate.control_eval_times is None:
        return None
    if not (_EXPM_FORWARD["impl"] == "pallas"
            or (_EXPM_FORWARD["impl"] == "auto" and _pallas_ok())):
        return None

    rdt = real_dtype()
    initial_states = np.asarray(pstate.initial_states).astype(
        np_complex_dtype())
    d = initial_states.shape[-2]
    dt = float(pstate.dt)
    n_steps = pstate.system_eval_count - 1
    n_chains = c_per_shard * m_per_shard

    from qoc_tpu.ops.chain_pallas import (chain_block_plan, chain_fused_ok,
                                          make_chain_expm_propagate)
    if not chain_fused_ok(d, n_steps, n_chains):
        return None
    block, remat = chain_block_plan(d, n_steps, n_chains)

    n_blocks = -(-n_steps // block)
    pad = n_blocks * block - n_steps
    cet = np.asarray(pstate.control_eval_times, dtype=rdt)
    costs = pstate.costs
    step_costs = pstate.step_costs
    cost_eval_step = pstate.cost_eval_step
    need_trajectory = bool(step_costs)
    final_step = pstate.final_system_eval_step
    basis = hamiltonian.generator_basis(dt).astype(np_complex_dtype())
    fused_chain = make_chain_expm_propagate(
        basis, return_prefixes=need_trajectory)
    if params is not None:
        params = params.astype(np.dtype(rdt).name)

    def shard_loss_sum(clipped_flat):
        controls = jax.vmap(
            lambda p: slap_controls_jax(cc, p, shape))(clipped_flat)
        if ensemble and ENSEMBLE_AXIS in vary_axes and n_ens_shards > 1:
            shard_index = lax.axis_index(ENSEMBLE_AXIS)
            delta = lax.dynamic_slice_in_dim(
                jnp.asarray(params), shard_index * m_per_shard, m_per_shard,
                axis=0).astype(rdt)
        elif ensemble:
            delta = jnp.asarray(params).astype(rdt)
        else:
            delta = None

        def weights(times, valid):
            """Weight rows (n_chains, B, n_b) at the step midpoints:
            [1, δ_m, Re c, Im c] per (candidate, member) chain."""
            def one_candidate(ctl_row):
                c_mid = jax.vmap(lambda t: interpolate_linear_set(
                    t + dt / 2, cet, ctl_row))(times)
                c_mid = jnp.atleast_2d(c_mid)
                ri = jnp.stack((jnp.real(c_mid), jnp.imag(c_mid)), axis=-1)
                return ri.reshape(
                    c_mid.shape[:-1] + (2 * c_mid.shape[-1],)).astype(rdt)

            ri = jax.vmap(one_candidate)(controls)        # (C_s, B, 2C)
            b = times.shape[0]
            ones = jnp.ones((c_per_shard, b, 1), dtype=rdt)
            if ensemble:
                # (C_s, M_s, B, n_b) -> (C_s*M_s, B, n_b)
                w = jnp.concatenate((
                    jnp.broadcast_to(ones[:, None],
                                     (c_per_shard, m_per_shard, b, 1)),
                    jnp.broadcast_to(delta[None, :, None, :],
                                     (c_per_shard, m_per_shard, b, p_count)),
                    jnp.broadcast_to(ri[:, None],
                                     (c_per_shard, m_per_shard, b,
                                      ri.shape[-1])),
                ), axis=-1).reshape(n_chains, b, 1 + p_count + ri.shape[-1])
            else:
                w = jnp.concatenate((ones, ri), axis=-1)
            return (w * valid[None, :, None].astype(rdt)).astype(jnp.float32)

        def step_cost_values(ctl_row, states_k, k):
            step_error = jnp.asarray(0.0, dtype=rdt)
            for cost in step_costs:
                step_error = step_error + cost.cost(ctl_row, states_k, k)
            is_cost_step = (k % cost_eval_step) == 0
            return jnp.where(is_cost_step, step_error, 0.0)

        def block_body(carry, xs):
            states, errs = carry
            ks_block, valid = xs
            times = (ks_block - 1).astype(rdt) * dt
            if need_trajectory:
                # Per-chain kernel prefixes -> per-step states; prefix
                # cotangents seed the backward kernel per step
                # (ops/chain_pallas.py return_prefixes, batched form).
                prods, prefixes = fused_chain(weights(times, valid))
                states_all = jnp.einsum("mtij,mkjl->mtkil", prefixes,
                                        states, precision=MATMUL_PRECISION)
                # Chain index is candidate-major: candidate c owns chains
                # [c*m_per_shard, (c+1)*m_per_shard).
                ctl_chain = jnp.repeat(controls, m_per_shard, axis=0)

                def chain_block_cost(states_all_m, ctl_row):
                    per_step = jax.vmap(
                        lambda s, k: step_cost_values(ctl_row, s, k)
                    )(states_all_m, ks_block)
                    return jnp.sum(jnp.where(valid, per_step, 0.0))

                errs = errs + jax.vmap(chain_block_cost)(states_all,
                                                         ctl_chain)
            else:
                prods = fused_chain(weights(times, valid))  # (n_chains,...)
            states = jnp.einsum("mij,mkjl->mkil", prods, states,
                                precision=MATMUL_PRECISION)
            return (states, errs), None

        body_fn = jax.checkpoint(block_body) if remat else block_body
        ks = jnp.arange(1, pstate.system_eval_count)
        if pad:
            ks = jnp.concatenate((ks, jnp.full(
                (pad,), pstate.system_eval_count, dtype=ks.dtype)))
        valid = ks < pstate.system_eval_count
        xs = (ks.reshape(n_blocks, block), valid.reshape(n_blocks, block))
        states0 = jnp.broadcast_to(
            jnp.asarray(initial_states)[None],
            (n_chains,) + initial_states.shape)
        errs0 = jnp.zeros((n_chains,), dtype=rdt)
        if check_vma:
            states0 = lax.pcast(states0, vary_axes, to="varying")
            errs0 = lax.pcast(errs0, vary_axes, to="varying")
        (states, step_errs), _ = lax.scan(body_fn, (states0, errs0), xs)

        def chain_cost(states_m, ctl_row):
            err = jnp.asarray(0.0, dtype=rdt)
            for cost in costs:
                if not cost.requires_step_evaluation:
                    err = err + cost.cost(ctl_row, states_m, final_step)
            return err

        states = states.reshape((c_per_shard, m_per_shard)
                                + initial_states.shape)
        errs = jax.vmap(lambda sm, ctl: jnp.sum(
            jax.vmap(lambda s: chain_cost(s, ctl))(sm)))(states, controls)
        errs = errs + jnp.sum(
            step_errs.reshape(c_per_shard, m_per_shard), axis=1)
        return jnp.sum(errs), errs

    shard_loss_sum.uses_fused_chain = True
    return shard_loss_sum
