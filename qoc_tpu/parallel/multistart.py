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

Execution is CHUNKED like core/graperunner.py: a ``lax.scan`` over the chunk
inside the shard (one dispatch per chunk) on CPU-class backends, or a jitted
single-iteration step Python-looped with device row buffers on the axon TPU
tunnel. ``min_error`` terminates when any candidate's evaluation reaches it
(per-candidate freezing keeps already-converged candidates fixed).

Fast path: for a declared :class:`LinearHamiltonian` /
:class:`EnsembleLinearHamiltonian` under Magnus-M2 with no step costs, every
(candidate × member) trajectory is a chain of exp-of-linear-combination
steps, so the whole shard propagates through ONE batched fused Pallas chain
kernel per time block (ops/chain_pallas.py — the flattened candidate×member
axis is the kernel's major grid dimension). The per-candidate gradient falls
out of one value_and_grad of the shard SUM (candidates are independent, so
d(Σ_c err_c)/d(params_c') = d err_c'/d params_c').
"""

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax, shard_map
from jax.sharding import PartitionSpec as P

from qoc_tpu.config import (MATMUL_PRECISION, device_get, np_complex_dtype,
                            np_real_dtype, real_dtype)
from qoc_tpu.core.common import (
    clip_control_norms_jax,
    gen_controls_white,
    initialize_controls,
    slap_controls,
    slap_controls_jax,
    strip_controls,
    strip_controls_jax,
)
from qoc_tpu.core.graperunner import _is_save_iteration
from qoc_tpu.core.schroedinger import build_schroedinger_loss
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
from qoc_tpu.parallel.sharding import ENSEMBLE_AXIS, make_mesh
from qoc_tpu.profiler import RateMeter

__all__ = ["grape_schroedinger_multistart"]

CANDIDATE_AXIS = "candidate"

_DEFAULT_CHUNK = 100


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
                                  save_file_path=None,
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
    dispatch per save row) — live-plottable with the usual tooling. H5
    saving is not yet supported together with ``hamiltonian_params``
    (member-stacked states do not fit the reference schema).
    Returns a ``GrapeSchroedingerResult`` for the winning candidate, with
    ``result.errors`` holding every candidate's best error and
    ``result.iterations_per_s`` the aggregate candidate-iteration rate.
    """
    costs = list(costs)
    if optimizer is None:
        optimizer = Adam()
    if not getattr(optimizer, "supports_fused", False):
        raise ValueError(
            "grape_schroedinger_multistart requires an optimizer with a "
            "traced update rule (optimizer.supports_fused, e.g. Adam/SGD): "
            "every candidate's update runs device-resident inside the "
            "sharded iteration step. {} is host-loop only — run it through "
            "grape_schroedinger_discrete per candidate instead."
            "".format(type(optimizer).__name__))
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
    if ensemble and save_file_path is not None:
        raise ValueError("H5 saving is not yet supported for ensemble "
                         "multistart (member-stacked final states do not "
                         "fit the reference schema).")
    pstate = GrapeSchroedingerDiscreteState(
        complex_controls, control_count, control_eval_count, cost_eval_step,
        costs, evolution_time, hamiltonian, None, base_controls,
        initial_states, interpolation_policy, iteration_count,
        log_iteration_step, max_control_norms, magnus_policy, min_error,
        optimizer, save_file_path, False, save_iteration_step,
        system_eval_count)
    collect_saves = pstate.should_save
    if collect_saves:
        print("QOC is saving this optimization run to {}."
              "".format(save_file_path))
        pstate.checkpointer.create_grape_file(pstate, pstate._save_count())
    result = GrapeSchroedingerResult()

    cc = complex_controls
    shape = pstate.controls_shape
    rdt = real_dtype()
    mcn = np.asarray(max_control_norms)
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
                  "EnsembleLinearHamiltonian with Magnus M2 and no step "
                  "costs for the ~10x fused path).")

    def iteration_step(carry):
        (params, opt_state, done, best_err, best_flat, best_iter,
         it) = carry
        controls = jax.vmap(lambda p: slap_controls_jax(cc, p, shape))(params)
        clipped = jax.vmap(
            lambda c: clip_control_norms_jax(c, jnp.asarray(mcn)))(controls)
        clipped_flat = jax.vmap(lambda c: strip_controls_jax(cc, c))(clipped)
        (_, errors), grads = jax.value_and_grad(
            shard_loss_sum, has_aux=True)(clipped_flat)
        if ensemble:
            errors = lax.psum(errors, ENSEMBLE_AXIS) / n_members
            grads = lax.psum(grads, ENSEMBLE_AXIS) / n_members
        new_opt_state, new_params = jax.vmap(optimizer.update_jax)(
            opt_state, grads, params)
        valid = ~done
        improved = valid & (errors < best_err)
        best_err = jnp.where(improved, errors, best_err)
        best_flat = jnp.where(improved[:, None], clipped_flat, best_flat)
        best_iter = jnp.where(improved, it, best_iter)
        new_done = done | (errors <= min_error)
        freeze = lambda new, old: jnp.where(
            new_done.reshape((-1,) + (1,) * (new.ndim - 1)), old, new)
        params = jax.tree_util.tree_map(freeze, new_params, params)
        opt_state = jax.tree_util.tree_map(freeze, new_opt_state, opt_state)
        carry = (params, opt_state, new_done, best_err, best_flat,
                 best_iter, it + 1)
        active = valid.astype(rdt)
        if collect_saves:
            # This iteration's SHARD-local winner (evaluated iterate, like
            # run_grape's H5 rows); the global argmin happens on host.
            local = jnp.argmin(errors)
            rows = (errors, active, errors[local][None],
                    clipped_flat[local][None], grads[local][None])
        else:
            rows = (errors, active)
        return carry, rows

    # ---- sharded chunk execution ---------------------------------------- -
    carry_specs = (P(CANDIDATE_AXIS), _opt_specs(optimizer),
                   P(CANDIDATE_AXIS), P(CANDIDATE_AXIS), P(CANDIDATE_AXIS),
                   P(CANDIDATE_AXIS), P())

    chunk_cache = {}

    if collect_saves:
        row_specs = (P(CANDIDATE_AXIS), P(CANDIDATE_AXIS), P(CANDIDATE_AXIS),
                     P(CANDIDATE_AXIS, None), P(CANDIDATE_AXIS, None))
    else:
        row_specs = (P(CANDIDATE_AXIS), P(CANDIDATE_AXIS))
    chunk_row_specs = tuple(P(*((None,) + spec)) for spec in row_specs)

    def chunked(length):
        if length not in chunk_cache:
            def shard_chunk(*carry):
                def body(c, _):
                    return iteration_step(c)
                carry_out, rows = lax.scan(body, carry, None, length=length)
                return carry_out + (rows,)

            chunk_cache[length] = jax.jit(shard_map(
                shard_chunk, mesh=mesh, in_specs=carry_specs,
                out_specs=carry_specs + (chunk_row_specs,),
                check_vma=check_vma))
        return chunk_cache[length]

    n_carry = len(carry_specs)

    def stepwise_step():
        # One jitted step for the whole run: the row buffers are jit
        # ARGUMENTS updated in-place at a TRACED index (which crosses the
        # host boundary as a float — the only transfer dtype the axon
        # backend accepts). An eager ``buf.at[i].set`` per Python index
        # would compile a fresh eager op for every distinct i through the
        # tunnel (~0.8 s/iteration measured on the 512-candidate bench).
        if "step" not in chunk_cache:
            def shard_step(*args):
                carry = args[:n_carry]
                rowbufs = args[n_carry:-1]
                i = args[-1].astype(jnp.int32)
                carry_out, rows = iteration_step(carry)
                rowbufs = tuple(buf.at[i].set(row)
                                for buf, row in zip(rowbufs, rows))
                return carry_out + rowbufs

            chunk_cache["step"] = jax.jit(shard_map(
                shard_step, mesh=mesh,
                in_specs=carry_specs + chunk_row_specs + (P(),),
                out_specs=carry_specs + chunk_row_specs,
                check_vma=check_vma))
        return chunk_cache["step"]

    mode = fused_mode
    if mode is None:
        mode = ("stepwise" if jax.default_backend() not in ("cpu",)
                else "scan")

    # Candidate seeds: reference flat controls + white-noise starts.
    seeds = [strip_controls(cc, base_controls)]
    for i in range(1, n_starts):
        noise = gen_controls_white(cc, control_count, control_eval_count,
                                   evolution_time, mcn, seed=seed + i)
        seeds.append(strip_controls(cc, noise))
    params0 = np.stack(seeds).astype(np_real_dtype())

    params = jax.device_put(
        jnp.asarray(params0),
        jax.sharding.NamedSharding(mesh, P(CANDIDATE_AXIS)))

    @jax.jit
    def make_initial_carry(params_):
        opt_state = jax.vmap(optimizer.init_state)(params_)
        done = jnp.zeros((n_starts,), dtype=jnp.bool_)
        best_err = jnp.full((n_starts,),
                            np.finfo(np.dtype(rdt).name).max, dtype=rdt)
        best_flat = jnp.zeros_like(params_)
        best_iter = jnp.zeros((n_starts,), dtype=jnp.int32)
        it = jnp.zeros((), dtype=jnp.int32)
        return opt_state, done, best_err, best_flat, best_iter, it

    opt_state, done, best_err, best_flat, best_iter, it = \
        make_initial_carry(params)
    carry = (params, opt_state, done, best_err, best_flat, best_iter, it)

    states_fn = None
    if collect_saves:
        plain_loss = build_schroedinger_loss(pstate)
        states_fn = jax.jit(
            lambda f: plain_loss(slap_controls_jax(cc, f, shape))[1])

    chunk = int(fused_chunk or _DEFAULT_CHUNK)
    meter = RateMeter().start()
    iterations_left = iteration_count
    iteration = 0
    while iterations_left > 0:
        length = min(chunk, iterations_left)
        if mode == "scan":
            out = chunked(length)(*carry)
            carry, rows = out[:-1], out[-1]
            rows = device_get(rows)
        else:
            step = stepwise_step()
            row_shapes = [
                ((n_starts,), rdt),
                ((n_starts,), rdt),
                ((n_cand_shards,), rdt),
                ((n_cand_shards,) + params0.shape[1:], rdt),
                ((n_cand_shards,) + params0.shape[1:], rdt),
            ][:len(row_specs)]
            # Buffers are chunk-sized regardless of this chunk's length so
            # the step jit compiles ONCE per run (a tail chunk would
            # otherwise re-specialize the whole graph on the new shape).
            rowbufs = tuple(
                jax.device_put(
                    jnp.zeros((chunk,) + sh, dtype=dt),
                    jax.sharding.NamedSharding(mesh, spec))
                for (sh, dt), spec in zip(row_shapes, chunk_row_specs))
            for i in range(length):
                out = step(*carry, *rowbufs,
                           jnp.asarray(float(i), dtype=rdt))
                carry, rowbufs = out[:n_carry], out[n_carry:]
            rows = tuple(np.asarray(buf)[:length]
                         for buf in device_get(rowbufs))
        err_rows = np.asarray(rows[0])                 # (length, n_starts)
        active_rows = np.asarray(rows[1])              # (length, n_starts)
        # Only candidates that actually ran count toward the rate (frozen
        # min_error-done candidates would inflate iterations_per_s).
        n_active = int(np.sum(active_rows > 0.5))
        if n_active:
            meter.tick(n_active)
        for j in range(length):
            it = iteration + j
            if (pstate.should_log
                    and (it % pstate.log_iteration_step == 0
                         or it == iteration_count - 1)):
                print("{:^6d} | best {:^1.8e} | median {:^1.8e}"
                      "".format(it, float(np.min(err_rows[j])),
                                float(np.median(err_rows[j]))))
            if collect_saves and _is_save_iteration(pstate, it):
                werrs, wflats, wgrads = (np.asarray(rows[2]),
                                         np.asarray(rows[3]),
                                         np.asarray(rows[4]))
                shard_winner = int(np.argmin(werrs[j]))
                flat = wflats[j, shard_winner]
                controls_cf = slap_controls(cc, flat, shape)
                grads_cf = slap_controls(cc, wgrads[j, shard_winner], shape)
                final_states = np.asarray(device_get(
                    states_fn(jnp.asarray(flat))))
                save_step = it // pstate.save_iteration_step
                pstate.checkpointer.save_grape_iteration(
                    int(save_step), controls_cf,
                    float(werrs[j, shard_winner]), final_states, grads_cf,
                    "final_states")
        iteration += length
        iterations_left -= length
        if np.min(err_rows) <= min_error and min_error > 0:
            break

    _, _, _, best_err, best_flat, best_iter, _ = carry
    errors = np.asarray(device_get(best_err))
    winner = int(np.argmin(errors))
    winning_flat = np.asarray(device_get(best_flat))[winner]
    result.best_controls = slap_controls(cc, winning_flat, shape)
    result.best_error = float(errors[winner])
    # The winner's actual best iteration (tracked in the carry like the
    # fused single-run path), not the last iteration run.
    result.best_iteration = int(np.asarray(device_get(best_iter))[winner])
    result.errors = errors
    result.iteration_count_ran = iteration
    result.iterations_per_s = meter.mean_rate
    result.iterations_per_s_steady = meter.steady_rate
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
                                           hamiltonian_override=override)
            return loss(controls)[1]

        states = jax.jit(lambda f, rows: jax.vmap(
            lambda row: member_states(f, row))(rows))(
                flat, jnp.asarray(members))
    else:
        loss = build_schroedinger_loss(pstate)
        states = jax.jit(lambda f: loss(
            slap_controls_jax(cc, f, shape))[1])(flat)
    return np.asarray(device_get(states))


def _opt_specs(optimizer):
    """PartitionSpecs for the per-candidate optimizer-state pytree (every
    leaf carries the candidate axis first)."""
    probe = jax.eval_shape(
        lambda: jax.vmap(optimizer.init_state)(jnp.zeros((2, 3))))
    return jax.tree_util.tree_map(lambda _: P(CANDIDATE_AXIS), probe)


def _make_shard_loss(pstate, hamiltonian, hamiltonian_params, ensemble, cc,
                     shape, c_per_shard, n_ens_shards, vary_axes, check_vma):
    """Build shard_loss_sum: clipped flat candidate params (C_s, nflat) ->
    (Σ_c local-member error sum, per-candidate local errors (C_s,)).

    Fused regime (Linear/EnsembleLinearHamiltonian, Magnus M2, no step
    costs, Pallas available): all candidate×member trajectories propagate
    through one batched chain kernel per time block. Otherwise the generic
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
                pvary_axes=vary_axes if check_vma else None)
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
        pstate, pvary_axes=vary_axes if check_vma else None)

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
    if pstate.magnus_policy != MagnusPolicy.M2 or pstate.step_costs:
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
    final_step = pstate.final_system_eval_step
    basis = hamiltonian.generator_basis(dt).astype(np_complex_dtype())
    fused_chain = make_chain_expm_propagate(basis)
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

        def block_body(states, xs):
            ks_block, valid = xs
            times = (ks_block - 1).astype(rdt) * dt
            prods = fused_chain(weights(times, valid))  # (n_chains, d, d)
            states = jnp.einsum("mij,mkjl->mkil", prods, states,
                                precision=MATMUL_PRECISION)
            return states, None

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
        if check_vma:
            states0 = lax.pcast(states0, vary_axes, to="varying")
        states, _ = lax.scan(body_fn, states0, xs)

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
        return jnp.sum(errs), errs

    shard_loss_sum.uses_fused_chain = True
    return shard_loss_sum
