"""Lindblad parallel layer: ensemble-robust GRAPE and multistart for open
systems.

The reference's density driver (/root/reference/qoc/core/lindbladdiscrete.py:
110-256) is its second flagship entry point but — like everything in the
reference — is single-Hamiltonian and single-process. This module applies
the same TPU mandates as the Schrödinger parallel layer (SURVEY.md §2.4) to
the Lindblad path:

- :func:`grape_lindblad_ensemble` — robust GRAPE over an ensemble of
  Hamiltonians: every member integrates the full master equation inside its
  mesh shard, per-shard costs/gradients psum-reduce over the ``"ensemble"``
  axis, one optimizer step updates the replicated controls.
- :func:`grape_lindblad_multistart` — many pulse candidates optimized in
  parallel over a ``"candidate"`` mesh axis (optionally × ``"ensemble"``),
  device-resident Adam per candidate, chunked execution and checkpoint/
  resume shared with the Schrödinger multistart (parallel/_msrunner.py).

Fast path: a :class:`LinearHamiltonian` / :class:`EnsembleLinearHamiltonian`
with constant dissipator data (:class:`ConstantLindblad`) under
``LindbladMethod.MAGNUS_EXPM`` + Magnus-M2 has an affine superoperator
S(c, δ) = S0 + Σ_p δ_p S_p + Σ_i Re(c_i) S_{P_i} + Im(c_i) S_{Q_i}, so every
(candidate × member) density chain propagates through ONE batched fused
Pallas chain kernel per time block (ops/chain_pallas.py) on the vectorized
(d², d²) superoperators — the same kernel the Schrödinger fast path uses,
with the member/candidate axis as the kernel's major grid dimension.
"""

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax, shard_map
from jax.sharding import PartitionSpec as P

from qoc_tpu.config import (device_get, np_complex_dtype, np_real_dtype,
                            real_dtype)
from qoc_tpu.core.common import initialize_controls, slap_controls_jax
from qoc_tpu.core.graperunner import run_grape
from qoc_tpu.core.lindblad import build_lindblad_loss
from qoc_tpu.io.resume import apply_resume
from qoc_tpu.models import (
    ConstantLindblad,
    EnsembleLinearHamiltonian,
    GrapeLindbladDiscreteState,
    GrapeLindbladResult,
    InterpolationPolicy,
    LindbladMethod,
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
from qoc_tpu.parallel.ensemble import _replicate_aux
from qoc_tpu.parallel.sharding import ENSEMBLE_AXIS, make_mesh

__all__ = ["build_lindblad_ensemble_loss", "grape_lindblad_ensemble",
           "grape_lindblad_multistart"]

# JAX 0.9.0's varying-axis checker mis-handles the RKDP5 bounded-scan
# stepper's closed-over member rows under vmap (scan-const pvary of an
# already-varying aval), so the sharded RKDP5 losses run shard_map in
# legacy (check_vma=False) mode. Semantics are identical; only the static
# safety net is off. tests/test_lindblad_parallel.py::
# test_rkdp5_check_vma_workaround_still_needed is a strict-xfail tripwire:
# the day a JAX upgrade makes check_vma=True pass, that test XPASSes and
# fails the suite, and this flag (and both downgrade sites keyed on it)
# should be deleted.
_RKDP5_FORCE_LEGACY_VMA = True


def _fused_eligibility(pstate, hamiltonian, ensemble):
    """None when the fused superoperator chain applies, else the
    human-readable disqualifier (mirrors core/lindblad.py's checks)."""
    from qoc_tpu.ops.expm import _EXPM_FORWARD, _pallas_ok

    want = (EnsembleLinearHamiltonian if ensemble else LinearHamiltonian)
    if not isinstance(hamiltonian, want):
        return "hamiltonian is not a {}".format(want.__name__)
    if not ensemble and isinstance(hamiltonian, EnsembleLinearHamiltonian):
        return "EnsembleLinearHamiltonian without hamiltonian_params"
    if not isinstance(pstate.lindblad_data, (ConstantLindblad, type(None))):
        return "lindblad_data is not a ConstantLindblad"
    if getattr(pstate, "method_", LindbladMethod.RKDP5) \
            != LindbladMethod.MAGNUS_EXPM:
        return "method is not LindbladMethod.MAGNUS_EXPM"
    if getattr(pstate, "magnus_policy_", MagnusPolicy.M2) != MagnusPolicy.M2:
        return "magnus policy {} (fused chain needs M2)".format(
            getattr(pstate, "magnus_policy_", MagnusPolicy.M2))
    if pstate.control_eval_times is None:
        return "no controls"
    if not (_EXPM_FORWARD["impl"] == "pallas"
            or (_EXPM_FORWARD["impl"] == "auto" and _pallas_ok())):
        return "Pallas expm unavailable on this backend"
    return None


def _superop_basis(pstate, hamiltonian):
    """Member-layout superoperator generator basis (numpy complex)."""
    diss, lops = (pstate.lindblad_data(0.0)
                  if pstate.lindblad_data is not None else (None, None))
    return hamiltonian.superoperator_basis(float(pstate.dt), diss,
                                           lops).astype(np_complex_dtype())


def _control_ri_rows(cet, dt, rdt, controls, times):
    """[Re c, Im c] rows (B, 2C) at the step midpoints."""
    c_mid = jax.vmap(
        lambda t: interpolate_linear_set(t + dt / 2, cet, controls))(times)
    c_mid = jnp.atleast_2d(c_mid)
    ri = jnp.stack((jnp.real(c_mid), jnp.imag(c_mid)), axis=-1)
    return ri.reshape(c_mid.shape[:-1] + (2 * c_mid.shape[-1],)).astype(rdt)


def build_lindblad_ensemble_loss(pstate, hamiltonian, hamiltonian_params,
                                 mesh, axis_name=ENSEMBLE_AXIS,
                                 check_vma=True, log_path=False):
    """Build the psum-reduced Lindblad ensemble loss.

    ``hamiltonian(params_row, controls_t, time) -> (d, d)`` defines one
    member's Hamiltonian; the dissipator data (``pstate.lindblad_data``) is
    shared by all members. The loss is ``mean_m error_m`` with the member
    axis sharded over ``mesh``; the aux is the member-stacked final
    densities (n_members, K, d, d) along the sharded ensemble axis.
    """
    hamiltonian_params = np.asarray(hamiltonian_params)
    hamiltonian_params = hamiltonian_params.astype(
        np_complex_dtype() if np.iscomplexobj(hamiltonian_params)
        else np_real_dtype())
    n_members = hamiltonian_params.shape[0]
    n_shards = mesh.shape[axis_name]
    if n_members % n_shards != 0:
        raise ValueError(
            "ensemble member count {} must be divisible by the mesh axis "
            "size {}".format(n_members, n_shards))
    # The adaptive RKDP5 integrator nests a bounded scan + lax.cond stepper
    # inside the time scan; JAX 0.9's varying-axis checker mis-handles its
    # closed-over member rows under vmap (scan-const pvary of an
    # already-varying aval), so that path runs shard_map in legacy
    # (check_vma=False) mode — semantics are identical, only the static
    # check is off.
    if (getattr(pstate, "method_",
                LindbladMethod.RKDP5) == LindbladMethod.RKDP5
            and _RKDP5_FORCE_LEGACY_VMA):
        check_vma = False

    fused, why = _build_fused_lindblad_ensemble_loss(
        pstate, hamiltonian, hamiltonian_params, mesh, axis_name, n_members,
        n_shards, check_vma)
    if fused is not None:
        if log_path:
            print("qoc_tpu: Lindblad ensemble propagation path = fused "
                  "Pallas superoperator chain kernel (member-batched, {} "
                  "members x {} shards).".format(n_members, n_shards))
        return fused
    if log_path:
        print("qoc_tpu: Lindblad ensemble propagation path = generic "
              "per-member integration under vmap ({}).".format(why))

    def member_loss(controls, params_row):
        override = lambda c, t: hamiltonian(params_row, c, t)
        loss = build_lindblad_loss(
            pstate, hamiltonian_override=override,
            pvary_axes=(axis_name,) if check_vma else None,
            allow_plane_chain=False)  # vmapped below; see the builder
        return loss(controls)

    def shard_fn(controls, params_shard):
        errs, densities = jax.vmap(
            lambda row: member_loss(controls, row))(params_shard)
        total = lax.psum(jnp.sum(errs), axis_name)
        return total / n_members, densities

    sharded = shard_map(shard_fn, mesh=mesh,
                        in_specs=(P(), P(axis_name)),
                        out_specs=(P(), P(axis_name)), check_vma=check_vma)

    replicate = _replicate_aux(mesh)

    def loss(controls):
        err, densities = sharded(controls, hamiltonian_params)
        return err, replicate(densities)

    loss.uses_fused_chain = False
    return loss


def _build_fused_lindblad_ensemble_loss(pstate, hamiltonian, params, mesh,
                                        axis_name, n_members, n_shards,
                                        check_vma=True):
    """(fused superop-chain ensemble loss, why-not)."""
    why = _fused_eligibility(pstate, hamiltonian, ensemble=True)
    if why is not None:
        return None, why
    if (params.ndim != 2 or np.iscomplexobj(params)
            or params.shape[1] != hamiltonian.param_count):
        return None, ("hamiltonian_params is not a real (n_members, {}) "
                      "array".format(hamiltonian.param_count))

    rdt = real_dtype()
    initial_densities = np.asarray(pstate.initial_densities).astype(
        np_complex_dtype())
    d = initial_densities.shape[-1]
    sop_dim = d * d
    density_count = initial_densities.shape[0]
    dt = float(pstate.dt)
    n_steps = pstate.system_eval_count - 1
    m_per_shard = n_members // n_shards

    from qoc_tpu.ops.chain_pallas import (chain_block_plan, chain_fused_ok,
                                          make_chain_expm_propagate)
    if not chain_fused_ok(sop_dim, n_steps, m_per_shard):
        return None, ("superoperator size outside kernel limits (padded "
                      "d^2 > 256, too few steps, or member block memory "
                      "over budget)")
    block, remat = chain_block_plan(sop_dim, n_steps, m_per_shard)

    n_blocks = -(-n_steps // block)
    pad = n_blocks * block - n_steps
    cet = np.asarray(pstate.control_eval_times, dtype=rdt)
    costs = pstate.costs
    step_costs = pstate.step_costs
    cost_eval_step = pstate.cost_eval_step
    need_trajectory = bool(step_costs)
    final_step = pstate.final_system_eval_step
    p_count = hamiltonian.param_count
    basis = _superop_basis(pstate, hamiltonian)
    fused_chain = make_chain_expm_propagate(
        basis, return_prefixes=need_trajectory)
    params = params.astype(np.dtype(rdt).name)

    def shard_fn(controls, params_shard):
        delta = params_shard.astype(rdt)               # (M_s, P), varying

        def weights(times, valid):
            """(M_s, B, 1 + P + 2C) weight rows at the step midpoints."""
            ri = _control_ri_rows(cet, dt, rdt, controls, times)
            ones = jnp.ones(ri.shape[:-1] + (1,), dtype=rdt)
            ctl = jnp.concatenate((ones, ri), axis=-1)
            # Controls are replicated; promote to the varying member axis
            # before mixing with the per-shard δ columns.
            if check_vma:
                ctl = lax.pcast(ctl, (axis_name,), to="varying")
            b = times.shape[0]
            w = jnp.concatenate((
                jnp.broadcast_to(ctl[None, :, :1], (m_per_shard, b, 1)),
                jnp.broadcast_to(delta[:, None, :], (m_per_shard, b,
                                                     p_count)),
                jnp.broadcast_to(ctl[None, :, 1:],
                                 (m_per_shard, b, ctl.shape[-1] - 1)),
            ), axis=-1)
            return (w * valid[None, :, None].astype(rdt)).astype(jnp.float32)

        def step_cost_values(densities_k, k):
            step_error = jnp.asarray(0.0, dtype=rdt)
            for cost in step_costs:
                step_error = step_error + cost.cost(controls, densities_k,
                                                    k)
            is_cost_step = (k % cost_eval_step) == 0
            return jnp.where(is_cost_step, step_error, 0.0)

        def block_body(carry, xs):
            vec, errs = carry
            ks_block, valid = xs
            times = (ks_block - 1).astype(rdt) * dt
            if need_trajectory:
                # Per-member kernel prefixes -> per-step densities; prefix
                # cotangents seed the backward kernel per step
                # (ops/chain_pallas.py return_prefixes, batched form).
                prods, prefixes = fused_chain(weights(times, valid))
                vec_all = jnp.einsum("mtij,mkj->mtki", prefixes, vec)
                densities_all = vec_all.reshape(
                    m_per_shard, vec_all.shape[1], density_count, d, d)

                def member_block_cost(densities_all_m):
                    per_step = jax.vmap(step_cost_values)(densities_all_m,
                                                          ks_block)
                    return jnp.sum(jnp.where(valid, per_step, 0.0))

                errs = errs + jax.vmap(member_block_cost)(densities_all)
            else:
                prods = fused_chain(weights(times, valid))  # (M_s, d², d²)
            vec = jnp.einsum("mij,mkj->mki", prods, vec)
            return (vec, errs), None

        body_fn = jax.checkpoint(block_body) if remat else block_body
        ks = jnp.arange(1, pstate.system_eval_count)
        if pad:
            ks = jnp.concatenate((ks, jnp.full(
                (pad,), pstate.system_eval_count, dtype=ks.dtype)))
        valid = ks < pstate.system_eval_count
        xs = (ks.reshape(n_blocks, block), valid.reshape(n_blocks, block))
        vec0 = jnp.broadcast_to(
            jnp.asarray(initial_densities.reshape(density_count,
                                                  sop_dim))[None],
            (m_per_shard, density_count, sop_dim))
        errs0 = jnp.zeros((m_per_shard,), dtype=rdt)
        if check_vma:
            vec0 = lax.pcast(vec0, (axis_name,), to="varying")
            errs0 = lax.pcast(errs0, (axis_name,), to="varying")
        (vec, step_errs), _ = lax.scan(body_fn, (vec0, errs0), xs)
        densities = vec.reshape(m_per_shard, density_count, d, d)

        def member_cost(densities_m):
            err = jnp.asarray(0.0, dtype=rdt)
            for cost in costs:
                if not cost.requires_step_evaluation:
                    err = err + cost.cost(controls, densities_m, final_step)
            return err

        errs = jax.vmap(member_cost)(densities) + step_errs
        total = lax.psum(jnp.sum(errs), axis_name)
        return total / n_members, densities

    sharded = shard_map(shard_fn, mesh=mesh,
                        in_specs=(P(), P(axis_name)),
                        out_specs=(P(), P(axis_name)), check_vma=check_vma)

    replicate = _replicate_aux(mesh)

    def loss(controls):
        err, densities = sharded(controls, jnp.asarray(params))
        return err, replicate(densities)

    loss.uses_fused_chain = True
    return loss, None


def grape_lindblad_ensemble(control_count, control_eval_count, costs,
                            evolution_time, hamiltonian, hamiltonian_params,
                            initial_densities, system_eval_count,
                            complex_controls=False, cost_eval_step=1,
                            impose_control_conditions=None,
                            initial_controls=None,
                            interpolation_policy=InterpolationPolicy.LINEAR,
                            iteration_count=1000, lindblad_data=None,
                            log_iteration_step=10,
                            magnus_policy=MagnusPolicy.M2,
                            max_control_norms=None, mesh=None, min_error=0,
                            optimizer=None, resume_from=None,
                            save_file_path=None,
                            save_intermediate_densities=False,
                            save_iteration_step=0,
                            method=LindbladMethod.RKDP5, atol=1e-12,
                            rtol=0.0, rkdp5_max_steps=16384,
                            fused_chunk=None, fused_mode=None,
                            check_vma=True):
    """Robust GRAPE over an ensemble of Hamiltonians with Lindblad dynamics
    (qoc_tpu extension; the open-system twin of
    :func:`qoc_tpu.grape_schroedinger_ensemble`).

    Same contract as :func:`qoc_tpu.grape_lindblad_discrete` except:
    - ``hamiltonian(params_row, controls_t, time) -> (d, d)`` takes a member
      parameter row first,
    - ``hamiltonian_params`` :: array (n_members, ...) — one row per member;
      the optimized error is the ensemble mean,
    - ``mesh`` :: jax.sharding.Mesh with an "ensemble" axis (default: 1-D
      mesh over all local devices); n_members must divide the axis size,
    - the dissipator data (``lindblad_data``) is shared by all members.

    ``result.best_final_densities`` has shape (n_members, K, d, d) and the
    H5 schema's ``final_densities``/``intermediate_densities`` carry the
    same leading member axis plus a ``hamiltonian_params`` dataset (the
    member-extended schema, as in ``grape_schroedinger_ensemble``).

    The fused fast path needs ``method=LindbladMethod.MAGNUS_EXPM`` with an
    :class:`EnsembleLinearHamiltonian` + :class:`ConstantLindblad`.
    """
    costs = list(costs)
    if optimizer is None:
        optimizer = Adam()
    if mesh is None:
        mesh = make_mesh()
    initial_controls, max_control_norms = initialize_controls(
        complex_controls, control_count, control_eval_count, evolution_time,
        initial_controls, max_control_norms)
    pstate = GrapeLindbladDiscreteState(
        complex_controls, control_count, control_eval_count, cost_eval_step,
        costs, evolution_time, None, impose_control_conditions,
        initial_controls, initial_densities, interpolation_policy,
        iteration_count, lindblad_data, log_iteration_step,
        max_control_norms, min_error, optimizer, save_file_path,
        save_intermediate_densities, save_iteration_step, system_eval_count)
    pstate.method_ = method
    pstate.atol = atol
    pstate.rtol = rtol
    pstate.rkdp5_max_steps = rkdp5_max_steps
    pstate.magnus_policy_ = magnus_policy
    hamiltonian_params = np.asarray(hamiltonian_params)
    pstate.evolved_shape = ((hamiltonian_params.shape[0],)
                            + np.asarray(initial_densities).shape)
    pstate.ensemble_params = hamiltonian_params
    if fused_chunk is not None:
        pstate.fused_chunk = fused_chunk
    if fused_mode is not None:
        pstate.fused_mode = fused_mode
    if resume_from is not None:
        apply_resume(pstate, resume_from)
    loss_controls = build_lindblad_ensemble_loss(
        pstate, hamiltonian, hamiltonian_params, mesh, check_vma=check_vma,
        log_path=pstate.should_log)
    pstate.log_and_save_initial()
    result = GrapeLindbladResult()
    cc = complex_controls
    shape = pstate.controls_shape

    def loss_flat(flat_params):
        controls = slap_controls_jax(cc, flat_params, shape)
        return loss_controls(controls)

    collect_fn = intermediate_saver = None
    if pstate.save_intermediate_densities_:
        members = hamiltonian_params.astype(
            np_complex_dtype() if np.iscomplexobj(hamiltonian_params)
            else np_real_dtype())

        def collect(flat):
            controls = slap_controls_jax(cc, flat, shape)

            def member_intermediates(row):
                override = lambda c, t: hamiltonian(row, c, t)
                closs = build_lindblad_loss(
                    pstate, collect_intermediates=True, differentiable=False,
                    remat=False, hamiltonian_override=override,
                    allow_plane_chain=False)  # vmapped below
                return closs(controls)[2]            # (S, K, d, d)

            inters = jax.vmap(member_intermediates)(jnp.asarray(members))
            return jnp.moveaxis(inters, 0, 1)        # (S, M, K, d, d)

        collect_fn = jax.jit(collect)
        intermediate_saver = pstate.save_intermediate_densities

    run_grape(pstate, result, loss_flat, "final_densities",
              ("best_controls", "best_error", "best_final_densities",
               "best_iteration"),
              collect_fn=collect_fn, intermediate_saver=intermediate_saver)
    return result


# ---------------------------------------------------------------------------
# Lindblad multistart
# ---------------------------------------------------------------------------

def grape_lindblad_multistart(control_count, control_eval_count, costs,
                              evolution_time, initial_densities,
                              system_eval_count, n_starts=8,
                              complex_controls=False, cost_eval_step=1,
                              hamiltonian=None, hamiltonian_params=None,
                              initial_controls=None,
                              interpolation_policy=InterpolationPolicy.LINEAR,
                              iteration_count=1000, lindblad_data=None,
                              log_iteration_step=10,
                              magnus_policy=MagnusPolicy.M2,
                              max_control_norms=None, mesh=None, min_error=0,
                              optimizer=None, resume_from=None,
                              save_file_path=None, save_iteration_step=0,
                              seed=0, method=LindbladMethod.RKDP5,
                              atol=1e-12, rtol=0.0, rkdp5_max_steps=16384,
                              fused_chunk=None, fused_mode=None,
                              check_vma=True):
    """Optimize ``n_starts`` independent pulse candidates of a Lindblad
    GRAPE problem in parallel and return the best (qoc_tpu extension; the
    open-system twin of :func:`grape_schroedinger_multistart`, sharing its
    execution engine, H5 winner rows, and checkpoint/resume semantics).

    Robust multistart: pass ``hamiltonian_params`` (n_members, P) and an
    ensemble-contract ``hamiltonian(params_row, controls, t)``; each
    candidate then optimizes the ensemble-mean error over a 2-D
    ("candidate", "ensemble") mesh. The fused fast path needs
    ``method=LindbladMethod.MAGNUS_EXPM`` with a LinearHamiltonian /
    EnsembleLinearHamiltonian + ConstantLindblad.
    """
    costs = list(costs)
    if optimizer is None:
        optimizer = Adam()
    validate_multistart_entry(optimizer, "grape_lindblad_multistart",
                              "grape_lindblad_discrete",
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
    pstate = GrapeLindbladDiscreteState(
        complex_controls, control_count, control_eval_count, cost_eval_step,
        costs, evolution_time, hamiltonian, None, base_controls,
        initial_densities, interpolation_policy, iteration_count,
        lindblad_data, log_iteration_step, max_control_norms, min_error,
        optimizer, save_file_path, False, save_iteration_step,
        system_eval_count)
    pstate.method_ = method
    pstate.atol = atol
    pstate.rtol = rtol
    pstate.rkdp5_max_steps = rkdp5_max_steps
    pstate.magnus_policy_ = magnus_policy
    if ensemble:
        # Member-extended H5 schema (as in grape_lindblad_ensemble): winner
        # rows carry (n_members, K, d, d) final densities plus the
        # hamiltonian_params dataset.
        pstate.evolved_shape = ((n_members,)
                                + np.asarray(initial_densities).shape)
        pstate.ensemble_params = hamiltonian_params
    if method == LindbladMethod.RKDP5 and _RKDP5_FORCE_LEGACY_VMA:
        # See build_lindblad_ensemble_loss: the adaptive stepper's nested
        # scan/cond structure trips JAX 0.9's varying-axis checker under
        # vmap; run the shard_map in legacy mode (_RKDP5_FORCE_LEGACY_VMA).
        check_vma = False
    if resume_from is not None:
        apply_resume(pstate, resume_from)
    if pstate.should_save:
        if pstate.checkpointer._writes_enabled:
            print("QOC is saving this optimization run to {}."
                  "".format(save_file_path))
        if not getattr(pstate, "resuming_same_file", False):
            pstate.checkpointer.create_grape_file(pstate,
                                                  pstate._save_count())
    result = GrapeLindbladResult()

    cc = complex_controls
    shape = pstate.controls_shape
    c_per_shard = n_starts // n_cand_shards
    vary_axes = ((CANDIDATE_AXIS, ENSEMBLE_AXIS) if ensemble
                 else (CANDIDATE_AXIS,))

    shard_loss_sum = _make_lindblad_shard_loss(
        pstate, hamiltonian, hamiltonian_params, ensemble, cc, shape,
        c_per_shard, n_ens_shards, vary_axes, check_vma)
    if pstate.should_log:
        if getattr(shard_loss_sum, "uses_fused_chain", False):
            print("qoc_tpu: Lindblad multistart propagation path = fused "
                  "Pallas superoperator chain kernel (candidate{}-batched)."
                  "".format("xmember" if ensemble else ""))
        else:
            print("qoc_tpu: Lindblad multistart propagation path = generic "
                  "per-candidate integration under vmap (declare a "
                  "LinearHamiltonian + ConstantLindblad with "
                  "method=LindbladMethod.MAGNUS_EXPM, Magnus M2 "
                  "costs for the fused path).")

    states_fn = None
    if pstate.should_save:
        if ensemble:
            members_h = hamiltonian_params.astype(
                np_complex_dtype() if np.iscomplexobj(hamiltonian_params)
                else np_real_dtype())

            def member_densities_fn(f, row):
                controls = slap_controls_jax(cc, f, shape)
                override = lambda c, t: hamiltonian(row, c, t)
                mloss = build_lindblad_loss(pstate,
                                            hamiltonian_override=override,
                                            allow_plane_chain=False)
                return mloss(controls)[1]

            # Members embed as a trace-time numpy constant (complex jit
            # arguments are rejected by the axon backend).
            states_fn = jax.jit(lambda f: jax.vmap(
                lambda row: member_densities_fn(f, row))(
                    jnp.asarray(members_h)))
        else:
            plain_loss = build_lindblad_loss(pstate)
            states_fn = jax.jit(
                lambda f: plain_loss(slap_controls_jax(cc, f, shape))[1])

    winning_flat = run_multistart(
        pstate, result, mesh, shard_loss_sum, n_starts, ensemble, n_members,
        "final_densities", states_fn=states_fn, seed=seed,
        fused_chunk=fused_chunk, fused_mode=fused_mode, check_vma=check_vma)
    result.best_final_densities = _winner_final_densities(
        pstate, hamiltonian, hamiltonian_params, ensemble, cc, shape,
        winning_flat)
    return result


def _winner_final_densities(pstate, hamiltonian, hamiltonian_params,
                            ensemble, cc, shape, winning_flat):
    flat = jnp.asarray(np.asarray(winning_flat).astype(np_real_dtype()))
    if ensemble:
        members = np.asarray(hamiltonian_params)
        members = members.astype(np_complex_dtype()
                                 if np.iscomplexobj(members)
                                 else np_real_dtype())

        def member_densities(flat_params, row):
            controls = slap_controls_jax(cc, flat_params, shape)
            override = lambda c, t: hamiltonian(row, c, t)
            loss = build_lindblad_loss(pstate, hamiltonian_override=override,
                                       allow_plane_chain=False)
            return loss(controls)[1]

        densities = jax.jit(lambda f, rows: jax.vmap(
            lambda row: member_densities(f, row))(rows))(
                flat, jnp.asarray(members))
    else:
        loss = build_lindblad_loss(pstate)
        densities = jax.jit(lambda f: loss(
            slap_controls_jax(cc, f, shape))[1])(flat)
    return np.asarray(device_get(densities))


def _make_lindblad_shard_loss(pstate, hamiltonian, hamiltonian_params,
                              ensemble, cc, shape, c_per_shard, n_ens_shards,
                              vary_axes, check_vma):
    """Build shard_loss_sum: clipped flat candidate params (C_s, nflat) ->
    (Σ_c local-member error sum, per-candidate local errors (C_s,))."""
    fused = _make_fused_lindblad_shard_loss(
        pstate, hamiltonian, hamiltonian_params, ensemble, cc, shape,
        c_per_shard, n_ens_shards, vary_axes, check_vma)
    if fused is not None:
        return fused

    if ensemble:
        members = np.asarray(hamiltonian_params)
        m_per_shard = members.shape[0] // n_ens_shards

        def member_loss(controls, params_row):
            override = lambda c, t: hamiltonian(params_row, c, t)
            loss = build_lindblad_loss(
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

    loss = build_lindblad_loss(
        pstate, pvary_axes=vary_axes if check_vma else None,
        allow_plane_chain=False)  # vmapped over candidates below

    def shard_loss_sum(clipped_flat):
        def candidate_err(flat):
            return loss(slap_controls_jax(cc, flat, shape))[0]

        errs = jax.vmap(candidate_err)(clipped_flat)
        return jnp.sum(errs), errs

    shard_loss_sum.uses_fused_chain = False
    return shard_loss_sum


def _make_fused_lindblad_shard_loss(pstate, hamiltonian, hamiltonian_params,
                                    ensemble, cc, shape, c_per_shard,
                                    n_ens_shards, vary_axes, check_vma):
    if _fused_eligibility(pstate, hamiltonian, ensemble) is not None:
        return None
    if ensemble:
        params = np.asarray(hamiltonian_params)
        if (params.ndim != 2 or np.iscomplexobj(params)
                or params.shape[1] != hamiltonian.param_count):
            return None
        p_count = hamiltonian.param_count
        m_per_shard = params.shape[0] // n_ens_shards
    else:
        params = None
        p_count = 0
        m_per_shard = 1

    rdt = real_dtype()
    initial_densities = np.asarray(pstate.initial_densities).astype(
        np_complex_dtype())
    d = initial_densities.shape[-1]
    sop_dim = d * d
    density_count = initial_densities.shape[0]
    dt = float(pstate.dt)
    n_steps = pstate.system_eval_count - 1
    n_chains = c_per_shard * m_per_shard

    from qoc_tpu.ops.chain_pallas import (chain_block_plan, chain_fused_ok,
                                          make_chain_expm_propagate)
    if not chain_fused_ok(sop_dim, n_steps, n_chains):
        return None
    block, remat = chain_block_plan(sop_dim, n_steps, n_chains)

    n_blocks = -(-n_steps // block)
    pad = n_blocks * block - n_steps
    cet = np.asarray(pstate.control_eval_times, dtype=rdt)
    costs = pstate.costs
    final_step = pstate.final_system_eval_step
    basis = _superop_basis(pstate, hamiltonian)
    fused_chain = make_chain_expm_propagate(basis)
    vec0_np = initial_densities.reshape(density_count, sop_dim)
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
            """(n_chains, B, n_b) weight rows [1, δ_m, Re c, Im c] per
            (candidate, member) chain at the step midpoints."""
            ri = jax.vmap(lambda ctl: _control_ri_rows(
                cet, dt, rdt, ctl, times))(controls)      # (C_s, B, 2C)
            b = times.shape[0]
            ones = jnp.ones((c_per_shard, b, 1), dtype=rdt)
            if ensemble:
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

        def block_body(vec, xs):
            ks_block, valid = xs
            times = (ks_block - 1).astype(rdt) * dt
            prods = fused_chain(weights(times, valid))  # (n_chains, D, D)
            vec = jnp.einsum("mij,mkj->mki", prods, vec)
            return vec, None

        body_fn = jax.checkpoint(block_body) if remat else block_body
        ks = jnp.arange(1, pstate.system_eval_count)
        if pad:
            ks = jnp.concatenate((ks, jnp.full(
                (pad,), pstate.system_eval_count, dtype=ks.dtype)))
        valid = ks < pstate.system_eval_count
        xs = (ks.reshape(n_blocks, block), valid.reshape(n_blocks, block))
        vec0 = jnp.broadcast_to(jnp.asarray(vec0_np)[None],
                                (n_chains, density_count, sop_dim))
        if check_vma:
            vec0 = lax.pcast(vec0, vary_axes, to="varying")
        vec, _ = lax.scan(body_fn, vec0, xs)
        densities = vec.reshape(c_per_shard, m_per_shard, density_count,
                                d, d)

        def chain_cost(densities_m, ctl_row):
            err = jnp.asarray(0.0, dtype=rdt)
            for cost in costs:
                if not cost.requires_step_evaluation:
                    err = err + cost.cost(ctl_row, densities_m, final_step)
            return err

        errs = jax.vmap(lambda dm, ctl: jnp.sum(
            jax.vmap(lambda dd: chain_cost(dd, ctl))(dm)))(densities,
                                                           controls)
        return jnp.sum(errs), errs

    shard_loss_sum.uses_fused_chain = True
    return shard_loss_sum
