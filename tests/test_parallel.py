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

def test_fused_ensemble_matches_generic_path(monkeypatch):
    """An EnsembleLinearHamiltonian routes the ensemble loss through the
    fused chain kernel (member-batched Pallas dispatch) with loss and
    gradient identical to the generic vmap(magnus+expm) path."""
    from jax.experimental import pallas as pl
    orig = pl.pallas_call
    monkeypatch.setattr(
        pl, "pallas_call",
        lambda *a, **kw: orig(*a, **{**{"interpret": True}, **kw}))

    from qoc_tpu.core.common import initialize_controls
    from qoc_tpu.models import (EnsembleLinearHamiltonian,
                                GrapeSchroedingerDiscreteState,
                                InterpolationPolicy, MagnusPolicy)
    from qoc_tpu.ops.expm import set_expm_forward
    from qoc_tpu.parallel import build_ensemble_loss
    from qoc_tpu.parallel.sharding import make_mesh

    rng = np.random.default_rng(33)
    d, n_c, n_steps, n_members = 4, 2, 25, 8
    h0 = rng.normal(size=(d, d)) + 1j * rng.normal(size=(d, d))
    h0 = (h0 + h0.conj().T) / 2
    ops = 0.4 * (rng.normal(size=(n_c, d, d))
                 + 1j * rng.normal(size=(n_c, d, d)))
    ens_ham = EnsembleLinearHamiltonian(h0, ops, [h0])  # (1+delta) * h0
    params = rng.normal(scale=0.05, size=(n_members, 1))
    initial = np.zeros((1, d, 1), dtype=complex)
    initial[0, 0] = 1
    target = np.zeros((1, d, 1), dtype=complex)
    target[0, -1] = 1
    from qoc_tpu.standard import TargetStateInfidelity
    costs = [TargetStateInfidelity(target)]

    def make_pstate():
        return GrapeSchroedingerDiscreteState(
            True, n_c, n_steps, 1, costs, 2.0, None, None,
            np.zeros((n_steps, n_c), dtype=complex), initial,
            InterpolationPolicy.LINEAR, 1, 0, [10.0] * n_c,
            MagnusPolicy.M2, 0, Adam(), None, False, 0, n_steps)

    controls = (0.3 * (rng.normal(size=(n_steps, n_c))
                       + 1j * rng.normal(size=(n_steps, n_c)))).astype(
                           np.complex64)
    mesh = make_mesh(8)

    try:
        set_expm_forward("pallas")
        loss_fused = build_ensemble_loss(make_pstate(), ens_ham, params,
                                         mesh, check_vma=False)
        assert loss_fused.uses_fused_chain
        err_fused = float(loss_fused(jnp.asarray(controls))[0])
        g_fused = np.asarray(jax.grad(
            lambda c: loss_fused(c)[0])(jnp.asarray(controls)))
    finally:
        set_expm_forward("auto")

    # Generic path: the same object is callable with the
    # (params_row, controls, time) ensemble contract.
    loss_generic = build_ensemble_loss(make_pstate(), ens_ham, params, mesh)
    assert not loss_generic.uses_fused_chain
    err_gen, states_gen = loss_generic(jnp.asarray(controls))
    g_gen = np.asarray(jax.grad(
        lambda c: loss_generic(c)[0])(jnp.asarray(controls)))
    assert abs(err_fused - float(err_gen)) < 1e-4
    assert np.abs(g_fused - g_gen).max() < 1e-3 * max(1.0,
                                                      np.abs(g_gen).max())

    # Sharded == single-device exactness for the fused path.
    try:
        set_expm_forward("pallas")
        loss_single = build_ensemble_loss(make_pstate(), ens_ham, params,
                                          make_mesh(1), check_vma=False)
        assert loss_single.uses_fused_chain
        err_single = float(loss_single(jnp.asarray(controls))[0])
    finally:
        set_expm_forward("auto")
    assert np.isclose(err_fused, err_single, rtol=1e-6)


def test_fused_ensemble_step_costs_match_generic(monkeypatch):
    """Step costs no longer disqualify the fused member-batched ensemble
    path (round 5): ForbidStates in the cost stack, fused == generic in
    value and gradient on a 4-shard mesh."""
    from jax.experimental import pallas as pl
    orig = pl.pallas_call
    monkeypatch.setattr(
        pl, "pallas_call",
        lambda *a, **kw: orig(*a, **{**{"interpret": True}, **kw}))

    from qoc_tpu.models import (EnsembleLinearHamiltonian,
                                GrapeSchroedingerDiscreteState,
                                InterpolationPolicy, MagnusPolicy)
    from qoc_tpu.ops.expm import set_expm_forward
    from qoc_tpu.parallel import build_ensemble_loss
    from qoc_tpu.parallel.sharding import make_mesh
    from qoc_tpu.standard import ForbidStates

    rng = np.random.default_rng(35)
    d, n_c, n_steps, n_members = 4, 1, 25, 4
    h0 = rng.normal(size=(d, d)) + 1j * rng.normal(size=(d, d))
    h0 = (h0 + h0.conj().T) / 2
    ops = 0.4 * (rng.normal(size=(n_c, d, d))
                 + 1j * rng.normal(size=(n_c, d, d)))
    ens_ham = EnsembleLinearHamiltonian(h0, ops, [h0])
    params = rng.normal(scale=0.05, size=(n_members, 1))
    initial = np.zeros((1, d, 1), dtype=complex); initial[0, 0] = 1
    target = np.zeros((1, d, 1), dtype=complex); target[0, -1] = 1
    forb = np.zeros((1, 1, d, 1), dtype=complex); forb[0, 0, 1] = 1
    costs = [TargetStateInfidelity(target), ForbidStates(forb, n_steps)]

    def make_pstate():
        return GrapeSchroedingerDiscreteState(
            True, n_c, n_steps, 1, costs, 2.0, None, None,
            np.zeros((n_steps, n_c), dtype=complex), initial,
            InterpolationPolicy.LINEAR, 1, 0, [10.0] * n_c,
            MagnusPolicy.M2, 0, Adam(), None, False, 0, n_steps)

    controls = (0.3 * (rng.normal(size=(n_steps, n_c))
                       + 1j * rng.normal(size=(n_steps, n_c)))).astype(
                           np.complex64)
    mesh = make_mesh(4)

    try:
        set_expm_forward("pallas")
        loss_fused = build_ensemble_loss(make_pstate(), ens_ham, params,
                                         mesh, check_vma=False)
        assert loss_fused.uses_fused_chain
        err_fused = float(loss_fused(jnp.asarray(controls))[0])
        g_fused = np.asarray(jax.grad(
            lambda c: loss_fused(c)[0])(jnp.asarray(controls)))
    finally:
        set_expm_forward("auto")

    loss_generic = build_ensemble_loss(make_pstate(), ens_ham, params, mesh)
    assert not loss_generic.uses_fused_chain
    err_gen, _ = loss_generic(jnp.asarray(controls))
    g_gen = np.asarray(jax.grad(
        lambda c: loss_generic(c)[0])(jnp.asarray(controls)))
    assert abs(err_fused - float(err_gen)) < 1e-4
    assert np.abs(g_fused - g_gen).max() < 1e-3 * max(1.0,
                                                      np.abs(g_gen).max())


def test_ensemble_m4_does_not_vmap_plane_chain(monkeypatch):
    """The axon TPU backend rejects vmapped pallas_call (raw UNIMPLEMENTED,
    measured round 5), so the generic ensemble member loop — which vmaps
    build_schroedinger_loss — must NOT route M4 members to the plane-chain
    op even with Pallas selected. Regression: the plane op raises if
    reached; the M4 ensemble loss must still evaluate (on the batched-XLA
    path) and match the plain build."""
    from qoc_tpu.core.common import initialize_controls
    from qoc_tpu.models import (EnsembleLinearHamiltonian,
                                GrapeSchroedingerDiscreteState,
                                InterpolationPolicy, MagnusPolicy)
    from qoc_tpu.ops import chain_pallas
    from qoc_tpu.ops.expm import set_expm_forward
    from qoc_tpu.parallel import build_ensemble_loss
    from qoc_tpu.standard import get_annihilation_operator

    from jax.experimental import pallas as pl
    orig = pl.pallas_call
    monkeypatch.setattr(
        pl, "pallas_call",
        lambda *a, **kw: orig(*a, **{**{"interpret": True}, **kw}))

    def boom(*a, **k):
        raise AssertionError("plane op reached inside a vmapped member "
                             "loop (would be UNIMPLEMENTED on TPU)")

    monkeypatch.setattr(chain_pallas, "plane_chain_propagate", boom)
    monkeypatch.setattr(chain_pallas, "plane_chain_propagate_prefixes",
                        boom)

    h0 = np.asarray(SIGMA_Z) / 2
    a = get_annihilation_operator(2)
    ens = EnsembleLinearHamiltonian(h0, np.stack((a,)), [h0])
    members = np.linspace(-0.05, 0.05, 4).reshape(-1, 1)
    ini = np.array([[[1.0], [0.0]]])
    tgt = np.array([[[0.0], [1.0]]])
    ic, mn = initialize_controls(True, 1, 21, 10.0, None, None)

    def make_pstate():
        return GrapeSchroedingerDiscreteState(
            True, 1, 21, 1, [TargetStateInfidelity(tgt)], 10.0, None, None,
            ic, ini, InterpolationPolicy.LINEAR, 1, 0, mn, MagnusPolicy.M4,
            0, Adam(), None, False, 0, 21)

    c = jnp.asarray(np.asarray(ic, dtype=complex))
    mesh = make_mesh(4)
    gen = build_ensemble_loss(make_pstate(), ens, members, mesh,
                              check_vma=False)
    e_g = float(jax.jit(gen)(c)[0])
    try:
        set_expm_forward("pallas")
        fused = build_ensemble_loss(make_pstate(), ens, members, mesh,
                                    check_vma=False)
        # M4 -> not the weight-basis fused path; member loop must stay XLA.
        assert not fused.uses_fused_chain
        e_f = float(jax.jit(fused)(c)[0])
        g_f = jax.jit(jax.grad(lambda x: fused(x)[0]))(c)
        assert np.all(np.isfinite(np.abs(np.asarray(g_f))))
    finally:
        set_expm_forward("auto")
    # f32 interpret-Pallas expm vs x64 XLA member losses.
    assert abs(e_f - e_g) < 1e-4


def test_state_axis_sharding_matches_single_device():
    """mesh= on the plain driver shards the K state axis (gate synthesis:
    K = d unitary columns) with results identical to the unsharded run."""
    from qoc_tpu import grape_schroedinger_discrete
    from qoc_tpu.standard import (column_vector_list_to_matrix,
                                  matrix_to_column_vector_list)
    rng = np.random.default_rng(5)
    d = 8
    h = rng.normal(size=(d, d)) + 1j * rng.normal(size=(d, d))
    h0 = (h + h.conj().T) / 2
    drive = rng.normal(size=(d, d)) + 1j * rng.normal(size=(d, d))
    hamiltonian = lambda c, t: (jnp.asarray(h0) + c[0] * jnp.asarray(drive)
                                + jnp.conjugate(c[0])
                                * jnp.asarray(drive.conj().T))
    initial_states = matrix_to_column_vector_list(np.eye(d))
    target_unitary = np.linalg.qr(
        rng.normal(size=(d, d)) + 1j * rng.normal(size=(d, d)))[0]
    target_states = matrix_to_column_vector_list(target_unitary)
    costs = [TargetStateInfidelity(target_states)]
    kwargs = dict(complex_controls=True, iteration_count=8,
                  log_iteration_step=0, optimizer=Adam(learning_rate=0.02))
    sharded = grape_schroedinger_discrete(
        1, 11, costs, 5, hamiltonian, initial_states, 11,
        mesh=make_mesh(8, axis_name="state"), **kwargs)
    single = grape_schroedinger_discrete(
        1, 11, costs, 5, hamiltonian, initial_states, 11, **kwargs)
    assert np.allclose(sharded.errors, single.errors, atol=1e-9)
    assert np.allclose(sharded.best_controls, single.best_controls,
                       atol=1e-9)
    assert sharded.best_final_states.shape == (8, d, 1)


# ---------------------------------------------------------------------------
# Ensemble H5 saving / resume (VERDICT r2 #1, #7)
# ---------------------------------------------------------------------------

def test_ensemble_h5_saving_member_schema(tmp_path):
    """Ensemble runs write member-stacked final/intermediate states into a
    member-extended GRAPE schema (the reference schema has no ensemble
    concept, schroedingermodels.py:276-307); rows must match per-member
    evolve recomputation at the saved controls."""
    import h5py
    from qoc_tpu import evolve_schroedinger_discrete
    hamiltonian, initial_states, target_states = _ensemble_setup()
    costs = [TargetStateInfidelity(target_states)]
    params = RNG.normal(scale=0.05, size=(4, 1))
    save_path = str(tmp_path / "00000_ensemble.h5")
    grape_schroedinger_ensemble(
        1, 5, costs, 4.0, hamiltonian, params, initial_states, 5,
        complex_controls=True, iteration_count=6, log_iteration_step=0,
        mesh=make_mesh(4), optimizer=Adam(learning_rate=0.01),
        save_file_path=save_path, save_iteration_step=2,
        save_intermediate_states=True)
    with h5py.File(save_path, "r") as f:
        finals = np.asarray(f["final_states"])
        inters = np.asarray(f["intermediate_states"])
        errors = np.asarray(f["error"])
        controls_rows = np.asarray(f["controls"])
        saved_params = np.asarray(f["hamiltonian_params"])
    assert finals.shape == (3, 4, 1, 2, 1)
    assert inters.shape == (3, 5, 4, 1, 2, 1)
    assert np.allclose(saved_params, params)
    assert np.all(errors < np.finfo(np.float64).max)
    for m in range(4):
        member_h = lambda c, t, _row=params[m]: hamiltonian(_row, c, t)
        ev = evolve_schroedinger_discrete(
            4.0, member_h, initial_states, 5, controls=controls_rows[2],
            save_intermediate_states=True)
        assert np.allclose(finals[2, m], ev.final_states, atol=1e-9)
        assert np.allclose(inters[2, :, m], ev.intermediate_states,
                           atol=1e-9)
    # The member-aware plot path reads the 6-D intermediate layout.
    from qoc_tpu.plot import plot_state_population
    plot_state_population(save_path, member=2,
                          save_file_path=str(tmp_path / "pop.png"))


def test_ensemble_resume_reproduces_uninterrupted_run(tmp_path):
    """resume_from on the ensemble driver restores params + Adam moments +
    iteration numbering; the extended run's H5 rows must equal the
    uninterrupted run's."""
    import h5py
    hamiltonian, initial_states, target_states = _ensemble_setup()
    costs = [TargetStateInfidelity(target_states)]
    params = RNG.normal(scale=0.05, size=(4, 1))
    kwargs = dict(complex_controls=True, log_iteration_step=0,
                  mesh=make_mesh(4), save_iteration_step=1, fused_chunk=3)

    def run(path, iteration_count, **extra):
        return grape_schroedinger_ensemble(
            1, 5, costs, 4.0, hamiltonian, params, initial_states, 5,
            iteration_count=iteration_count, save_file_path=path,
            optimizer=Adam(learning_rate=0.01), **kwargs, **extra)

    full_path = str(tmp_path / "00000_full.h5")
    run(full_path, 10)
    part_path = str(tmp_path / "00000_part.h5")
    run(part_path, 5)
    resumed = run(part_path, 10, resume_from=part_path)
    assert resumed.iteration_count_ran == 5
    with h5py.File(full_path, "r") as f_full, \
            h5py.File(part_path, "r") as f_res:
        assert np.allclose(np.asarray(f_full["error"]),
                           np.asarray(f_res["error"]), atol=1e-12)
        assert np.allclose(np.asarray(f_full["controls"]),
                           np.asarray(f_res["controls"]), atol=1e-12)
        assert np.asarray(f_res["final_states"]).shape == (10, 4, 1, 2, 1)


def test_path_selection_logged(capsys):
    """One should_log line states which propagation path the loss compiled
    to and why (VERDICT r2 #8)."""
    hamiltonian, initial_states, target_states = _ensemble_setup()
    costs = [TargetStateInfidelity(target_states)]
    params = RNG.normal(scale=0.05, size=(4, 1))
    grape_schroedinger_ensemble(
        1, 5, costs, 4.0, hamiltonian, params, initial_states, 5,
        complex_controls=True, iteration_count=1, log_iteration_step=1,
        mesh=make_mesh(4), optimizer=Adam(learning_rate=0.01))
    out = capsys.readouterr().out
    assert "ensemble propagation path = generic batched" in out

    from qoc_tpu import grape_schroedinger_discrete
    grape_schroedinger_discrete(
        1, 5, costs, 4.0, lambda c, t: hamiltonian(np.zeros(1), c, t),
        initial_states, 5, complex_controls=True, iteration_count=1,
        log_iteration_step=1)
    out = capsys.readouterr().out
    assert "propagation path = blocked batched Magnus" in out
    assert "not a LinearHamiltonian" in out
