"""Fused chain-propagation kernel tests (interpret mode on CPU; the
compiled kernel is exercised on real TPU by bench/driver runs)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture()
def interpreted_pallas(monkeypatch):
    from jax.experimental import pallas as pl
    orig = pl.pallas_call

    def interp_call(*args, **kwargs):
        kwargs.setdefault("interpret", True)
        return orig(*args, **kwargs)

    monkeypatch.setattr(pl, "pallas_call", interp_call)
    yield


def _random_basis(rng, n_b, d, scale):
    basis = rng.normal(size=(n_b, d, d)) + 1j * rng.normal(size=(n_b, d, d))
    return (scale * basis).astype(np.complex64)


def test_chain_forward_and_grad_match_reference(interpreted_pallas):
    from qoc_tpu.ops.chain_pallas import (chain_expm_propagate_reference,
                                          make_chain_expm_propagate)
    rng = np.random.default_rng(7)
    d, n_b = 8, 5
    basis = _random_basis(rng, n_b, d, 0.01)
    tgt = (rng.normal(size=(d, d))
           + 1j * rng.normal(size=(d, d))).astype(np.complex64)
    for b in (8, 16, 37):  # L=1 seeds, recursion, non-divisible padding
        w = rng.normal(size=(b, n_b)).astype(np.float32)
        prop = make_chain_expm_propagate(basis)
        got = np.asarray(prop(jnp.asarray(w)))
        want = np.asarray(chain_expm_propagate_reference(jnp.asarray(w),
                                                         basis))
        assert np.abs(got - want).max() / np.abs(want).max() < 1e-4

        def loss_fused(ww):
            return jnp.sum(jnp.abs(prop(ww) - tgt) ** 2)

        def loss_ref(ww):
            return jnp.sum(jnp.abs(
                chain_expm_propagate_reference(ww, basis) - tgt) ** 2)

        g_f = np.asarray(jax.grad(loss_fused)(jnp.asarray(w)))
        g_r = np.asarray(jax.grad(loss_ref)(jnp.asarray(w)))
        assert np.abs(g_f - g_r).max() / np.abs(g_r).max() < 1e-3, b


def test_chain_large_norm_squaring_branch(interpreted_pallas):
    from qoc_tpu.ops.chain_pallas import (chain_expm_propagate_reference,
                                          make_chain_expm_propagate)
    rng = np.random.default_rng(8)
    d, n_b = 8, 4
    hs = rng.normal(size=(n_b, d, d)) + 1j * rng.normal(size=(n_b, d, d))
    hs = (hs + np.conj(np.swapaxes(hs, -1, -2))) / 2
    basis = (-1j * 0.8 * hs).astype(np.complex64)  # ||A||_1 of a few
    tgt = (rng.normal(size=(d, d))
           + 1j * rng.normal(size=(d, d))).astype(np.complex64)
    w = rng.normal(size=(24, n_b)).astype(np.float32)
    prop = make_chain_expm_propagate(basis)
    got = np.asarray(prop(jnp.asarray(w)))
    want = np.asarray(chain_expm_propagate_reference(jnp.asarray(w), basis))
    assert np.abs(got - want).max() / np.abs(want).max() < 1e-4

    def lf(ww):
        return jnp.sum(jnp.abs(prop(ww) - tgt) ** 2)

    def lr(ww):
        return jnp.sum(jnp.abs(
            chain_expm_propagate_reference(ww, basis) - tgt) ** 2)

    g_f = np.asarray(jax.grad(lf)(jnp.asarray(w)))
    g_r = np.asarray(jax.grad(lr)(jnp.asarray(w)))
    assert np.abs(g_f - g_r).max() / np.abs(g_r).max() < 1e-3


def test_linear_hamiltonian_callable_formula():
    from qoc_tpu.models import LinearHamiltonian
    rng = np.random.default_rng(9)
    d, n_c = 6, 3
    h0 = rng.normal(size=(d, d)) + 1j * rng.normal(size=(d, d))
    h0 = (h0 + h0.conj().T) / 2
    ops = rng.normal(size=(n_c, d, d)) + 1j * rng.normal(size=(n_c, d, d))
    ham = LinearHamiltonian(h0, ops)
    c = (rng.normal(size=(n_c,)) + 1j * rng.normal(size=(n_c,)))
    got = np.asarray(ham(jnp.asarray(c.astype(np.complex128)), 0.3))
    want = h0.copy()
    for i in range(n_c):
        want = want + c[i] * ops[i] + np.conj(c[i]) * ops[i].conj().T
    assert np.allclose(got, want, atol=1e-10)
    # Hermitian basis reconstruction: H == 1*h0 + sum Re(c) P + Im(c) Q
    basis = ham.hermitian_basis()
    w = np.concatenate([[1.0], np.stack([c.real, c.imag], -1).ravel()])
    recon = np.tensordot(w, basis, axes=(0, 0))
    assert np.allclose(recon, want, atol=1e-10)


def test_fused_loss_matches_generic_path(interpreted_pallas):
    """End-to-end: the fused chain path inside build_schroedinger_loss
    produces the same loss and gradient as the generic magnus+expm+tree
    path for an equivalent callable Hamiltonian."""
    from qoc_tpu.core.schroedinger import build_schroedinger_loss
    from qoc_tpu.models import (GrapeSchroedingerDiscreteState,
                                InterpolationPolicy, LinearHamiltonian,
                                MagnusPolicy)
    from qoc_tpu.optim import Adam
    from qoc_tpu.ops.expm import set_expm_forward
    from qoc_tpu.standard import TargetStateInfidelity

    rng = np.random.default_rng(11)
    d, n_c, n_steps = 4, 2, 25
    h0 = rng.normal(size=(d, d)) + 1j * rng.normal(size=(d, d))
    h0 = (h0 + h0.conj().T) / 2
    ops = (0.5 * (rng.normal(size=(n_c, d, d))
                  + 1j * rng.normal(size=(n_c, d, d))))
    ham_lin = LinearHamiltonian(h0, ops)
    initial = np.zeros((1, d, 1), dtype=complex)
    initial[0, 0] = 1
    target = np.zeros((1, d, 1), dtype=complex)
    target[0, -1] = 1
    costs = [TargetStateInfidelity(target)]

    def make_pstate(ham):
        return GrapeSchroedingerDiscreteState(
            True, n_c, n_steps, 1, costs, 2.0, ham, None,
            np.zeros((n_steps, n_c), dtype=complex), initial,
            InterpolationPolicy.LINEAR, 1, 0, [10.0] * n_c,
            MagnusPolicy.M2, 0, Adam(), None, False, 0, n_steps)

    controls = (0.3 * (rng.normal(size=(n_steps, n_c))
                       + 1j * rng.normal(size=(n_steps, n_c)))).astype(
                           np.complex64)

    loss_generic = build_schroedinger_loss(make_pstate(ham_lin))

    try:
        set_expm_forward("pallas")
        loss_fused_fn = build_schroedinger_loss(make_pstate(ham_lin),
                                                time_block_size=10)
        err_fused, _ = loss_fused_fn(jnp.asarray(controls))
        g_fused = jax.grad(lambda c: loss_fused_fn(c)[0])(
            jnp.asarray(controls))
        err_fused = float(err_fused)
        g_fused = np.asarray(g_fused)
    finally:
        set_expm_forward("auto")

    err_gen, _ = loss_generic(jnp.asarray(controls))
    g_gen = np.asarray(jax.grad(lambda c: loss_generic(c)[0])(
        jnp.asarray(controls)))
    assert abs(err_fused - float(err_gen)) < 1e-4
    assert np.abs(g_fused - g_gen).max() < 1e-3 * max(
        1.0, np.abs(g_gen).max())


def test_fused_lindblad_matches_generic_path(interpreted_pallas):
    """The fused superoperator chain inside build_lindblad_loss matches the
    generic MAGNUS_EXPM path (value and gradient)."""
    from qoc_tpu.core.lindblad import build_lindblad_loss
    from qoc_tpu.models import (ConstantLindblad,
                                GrapeLindbladDiscreteState,
                                InterpolationPolicy, LindbladMethod,
                                LinearHamiltonian, MagnusPolicy)
    from qoc_tpu.optim import Adam
    from qoc_tpu.ops.expm import set_expm_forward
    from qoc_tpu.standard import TargetDensityInfidelity

    rng = np.random.default_rng(17)
    d, n_c, n_steps = 3, 2, 21
    h0 = rng.normal(size=(d, d)) + 1j * rng.normal(size=(d, d))
    h0 = (h0 + h0.conj().T) / 2
    ops = 0.4 * (rng.normal(size=(n_c, d, d))
                 + 1j * rng.normal(size=(n_c, d, d)))
    gammas = np.array([0.05, 0.02])
    lops = 0.3 * (rng.normal(size=(2, d, d))
                  + 1j * rng.normal(size=(2, d, d)))
    ham = LinearHamiltonian(h0, ops)
    lind = ConstantLindblad(gammas, lops)
    rho0 = np.zeros((1, d, d), dtype=complex)
    rho0[0, 0, 0] = 1
    target = np.zeros((1, d, d), dtype=complex)
    target[0, -1, -1] = 1
    costs = [TargetDensityInfidelity(target)]

    def make_pstate():
        p = GrapeLindbladDiscreteState(
            True, n_c, n_steps, 1, costs, 2.0, ham, None,
            np.zeros((n_steps, n_c), dtype=complex), rho0,
            InterpolationPolicy.LINEAR, 1, lind, 0, [10.0] * n_c, 0,
            Adam(), None, False, 0, n_steps)
        p.method_ = LindbladMethod.MAGNUS_EXPM
        p.magnus_policy_ = MagnusPolicy.M2
        return p

    controls = (0.2 * (rng.normal(size=(n_steps, n_c))
                       + 1j * rng.normal(size=(n_steps, n_c)))).astype(
                           np.complex64)

    loss_generic = build_lindblad_loss(make_pstate())
    err_gen, _ = loss_generic(jnp.asarray(controls))
    g_gen = np.asarray(jax.grad(lambda c: loss_generic(c)[0])(
        jnp.asarray(controls)))

    try:
        set_expm_forward("pallas")
        loss_fused = build_lindblad_loss(make_pstate())
        err_fused = float(loss_fused(jnp.asarray(controls))[0])
        g_fused = np.asarray(jax.grad(lambda c: loss_fused(c)[0])(
            jnp.asarray(controls)))
    finally:
        set_expm_forward("auto")

    assert abs(err_fused - float(err_gen)) < 1e-4
    assert np.abs(g_fused - g_gen).max() < 1e-3 * max(
        1.0, np.abs(g_gen).max())


def test_chain_block_plan():
    """Block/remat plan: padded-plane HBM accounting, segment floor, block
    cap, remat threshold (ops/chain_pallas.chain_block_plan)."""
    from qoc_tpu.ops.chain_pallas import chain_block_plan

    # Headline-class problem (d=64, 10^4 steps, one chain): ~n_steps/6
    # blocks, residuals tiny -> no remat.
    block, remat = chain_block_plan(64, 10_000)
    assert block == -(-10_000 // 6)
    assert not remat

    # 512-chain multistart-class problem: the 512 MB/block cap binds at the
    # 2*SEGMENTS floor; padded residuals 64 KB * 512 * 200 = 6.4 GB < 8 GB
    # -> residuals stored (measured faster than remat).
    block, remat = chain_block_plan(64, 200, n_chains=512)
    assert block == 16
    assert not remat

    # Same chains, 2x the steps: padded residuals 12.8 GB -> remat.
    block, remat = chain_block_plan(64, 400, n_chains=512)
    assert remat

    # Short meshes floor at the kernel's 2*SEGMENTS requirement, never
    # exceeding n_steps.
    block, _ = chain_block_plan(64, 20)
    assert block == 16
    block, _ = chain_block_plan(64, 16)
    assert block == 16

    # Lane padding: d=64 planes pad to 128 lanes (2x), d=128 do not -- the
    # d=128 plan flips to remat at exactly 2x the d=64 step budget.
    _, remat_64 = chain_block_plan(64, 300, n_chains=512)
    _, remat_128 = chain_block_plan(128, 300, n_chains=256)
    assert remat_64 == remat_128


def test_stream_chain_forward_and_grad_match_reference(interpreted_pallas):
    """Streamed-generator regime (256 < padded d <= 512, VERDICT r3
    Missing #2): forward products and exact VJP match the XLA reference
    above the basis-resident kernel's d <= 256 limit, including batched
    members and the no-multiple-of-64 padding path."""
    from qoc_tpu.ops.chain_pallas import (chain_expm_propagate_reference,
                                          chain_fused_ok,
                                          make_chain_expm_propagate)
    rng = np.random.default_rng(11)
    d, n_b, b = 260, 3, 3                     # dp = 320 > 256
    assert chain_fused_ok(d, b)
    basis = _random_basis(rng, n_b, d, 0.01 / n_b)
    prop = make_chain_expm_propagate(basis)
    w = rng.normal(size=(b, n_b)).astype(np.float32)
    got = np.asarray(prop(jnp.asarray(w)))
    want = np.asarray(chain_expm_propagate_reference(jnp.asarray(w), basis))
    assert np.abs(got - want).max() / np.abs(want).max() < 1e-4

    tgt = (rng.normal(size=(d, d))
           + 1j * rng.normal(size=(d, d))).astype(np.complex64)

    def loss_fused(ww):
        return jnp.sum(jnp.abs(prop(ww) - tgt) ** 2)

    def loss_ref(ww):
        return jnp.sum(jnp.abs(
            chain_expm_propagate_reference(ww, basis) - tgt) ** 2)

    g_f = np.asarray(jax.grad(loss_fused)(jnp.asarray(w)))
    g_r = np.asarray(jax.grad(loss_ref)(jnp.asarray(w)))
    assert np.abs(g_f - g_r).max() / np.abs(g_r).max() < 1e-3

    # Batched members: (M, B, n_b) -> (M, d, d), per-member independent.
    wm = rng.normal(size=(2, b, n_b)).astype(np.float32)
    got_m = np.asarray(prop(jnp.asarray(wm)))
    for m in range(2):
        want_m = np.asarray(chain_expm_propagate_reference(
            jnp.asarray(wm[m]), basis))
        assert np.abs(got_m[m] - want_m).max() / np.abs(want_m).max() < 1e-4


def test_stream_chain_squaring_branch(interpreted_pallas):
    """Large step norms fall through to per-matrix scaling-and-squaring in
    the streamed regime too."""
    from qoc_tpu.ops.chain_pallas import (chain_expm_propagate_reference,
                                          make_chain_expm_propagate)
    rng = np.random.default_rng(12)
    d, n_b, b = 260, 2, 2
    basis = _random_basis(rng, n_b, d, 2.0 / (n_b * np.sqrt(d)))
    prop = make_chain_expm_propagate(basis)
    w = rng.normal(size=(b, n_b)).astype(np.float32)
    got = np.asarray(prop(jnp.asarray(w)))
    want = np.asarray(chain_expm_propagate_reference(jnp.asarray(w), basis))
    assert np.abs(got - want).max() / np.abs(want).max() < 2e-4

    tgt = (rng.normal(size=(d, d))
           + 1j * rng.normal(size=(d, d))).astype(np.complex64)
    g_f = np.asarray(jax.grad(
        lambda ww: jnp.sum(jnp.abs(prop(ww) - tgt) ** 2))(jnp.asarray(w)))
    g_r = np.asarray(jax.grad(
        lambda ww: jnp.sum(jnp.abs(chain_expm_propagate_reference(
            ww, basis) - tgt) ** 2))(jnp.asarray(w)))
    assert np.abs(g_f - g_r).max() / np.abs(g_r).max() < 1e-3


def test_stream_eligibility_and_plan():
    """chain_fused_ok / chain_block_plan cover the streamed regime: no
    segment floor, cap-respecting blocks, ineligible above _STREAM_MAX."""
    from qoc_tpu.ops.chain_pallas import (_STREAM_MAX, chain_block_plan,
                                          chain_fused_ok)
    assert chain_fused_ok(300, 1)             # no 16-step floor
    assert chain_fused_ok(_STREAM_MAX, 10)
    assert not chain_fused_ok(_STREAM_MAX + 1, 10)
    block, remat = chain_block_plan(300, 2001)
    assert 1 <= block <= 2001
    assert not remat                          # 2001*320*320*8 ~ 1.6 GB < 8
    _, remat_big = chain_block_plan(512, 200_000)
    assert remat_big


def test_stream_path_selected_by_driver(capsys):
    """build_schroedinger_loss routes a d=260 LinearHamiltonian problem to
    the fused chain path (the streamed regime) — no silent fallback to the
    generic XLA path above d=256."""
    from qoc_tpu.core.common import initialize_controls
    from qoc_tpu.core.schroedinger import build_schroedinger_loss
    from qoc_tpu.models import (GrapeSchroedingerDiscreteState,
                                InterpolationPolicy, LinearHamiltonian,
                                MagnusPolicy)
    from qoc_tpu.optim import Adam
    from qoc_tpu.ops.expm import set_expm_forward
    from qoc_tpu.standard import TargetStateInfidelity

    rng = np.random.default_rng(13)
    d = 260
    h0 = _random_basis(rng, 1, d, 0.01)[0]
    ops = _random_basis(rng, 2, d, 0.01)
    ham = LinearHamiltonian(h0, ops)
    initial = np.zeros((1, d, 1), dtype=complex); initial[0, 0] = 1
    target = np.zeros((1, d, 1), dtype=complex); target[0, -1] = 1
    ic, mn = initialize_controls(True, 2, 5, 4.0, None, None)
    pstate = GrapeSchroedingerDiscreteState(
        True, 2, 5, 1, [TargetStateInfidelity(target)], 4.0, ham, None, ic,
        initial, InterpolationPolicy.LINEAR, 1, 0, mn, MagnusPolicy.M2, 0,
        Adam(), None, False, 0, 5)
    try:
        set_expm_forward("pallas")
        build_schroedinger_loss(pstate, log_path=True)
    finally:
        set_expm_forward("auto")
    out = capsys.readouterr().out
    assert "fused Pallas chain kernel" in out, out
    assert "d=260" in out, out


@pytest.mark.slow
def test_stream_chain_inside_shard_map_ensemble(interpreted_pallas):
    """The streamed kernel composes with shard_map: the fused ensemble loss
    at d=260 (stream regime) on a 2-shard mesh matches the generic
    per-member XLA path in value and gradient."""
    from qoc_tpu.core.common import initialize_controls
    from qoc_tpu.models import (EnsembleLinearHamiltonian,
                                GrapeSchroedingerDiscreteState,
                                InterpolationPolicy, MagnusPolicy)
    from qoc_tpu.optim import Adam
    from qoc_tpu.ops.expm import set_expm_forward
    from qoc_tpu.parallel import build_ensemble_loss, make_mesh
    from qoc_tpu.standard import TargetStateInfidelity

    rng = np.random.default_rng(21)
    d = 260
    h0 = _random_basis(rng, 1, d, 0.02)[0]
    h0 = (h0 + h0.conj().T) / 2
    ops = _random_basis(rng, 1, d, 0.02)
    ens_ham = EnsembleLinearHamiltonian(h0, ops, [h0])
    members = np.array([[-0.03], [0.05]])
    initial = np.zeros((1, d, 1), dtype=complex); initial[0, 0] = 1
    target = np.zeros((1, d, 1), dtype=complex); target[0, 1] = 1
    ic, mn = initialize_controls(True, 1, 4, 2.0, None, None)
    pstate = GrapeSchroedingerDiscreteState(
        True, 1, 4, 1, [TargetStateInfidelity(target)], 2.0, None, None,
        ic, initial, InterpolationPolicy.LINEAR, 1, 0, mn, MagnusPolicy.M2,
        0, Adam(), None, False, 0, 4)
    mesh = make_mesh(2)
    controls = jnp.asarray(np.asarray(ic, dtype=complex))

    # check_vma=False: interpreted Pallas kernels mis-track varying manual
    # axes through ref slicing (same limitation the small-d fused tests at
    # tests/test_parallel.py:151 work around); semantics are unchanged.
    generic = build_ensemble_loss(pstate, ens_ham, members, mesh,
                                  check_vma=False)
    assert not generic.uses_fused_chain
    e_g, s_g = jax.jit(generic)(controls)
    g_g = jax.grad(lambda c: generic(c)[0])(controls)
    try:
        set_expm_forward("pallas")
        fused = build_ensemble_loss(pstate, ens_ham, members, mesh,
                                    check_vma=False)
        assert fused.uses_fused_chain
        e_f, s_f = jax.jit(fused)(controls)
        g_f = jax.grad(lambda c: fused(c)[0])(controls)
    finally:
        set_expm_forward("auto")
    assert abs(float(e_f) - float(e_g)) < 1e-5
    assert np.abs(np.asarray(s_f) - np.asarray(s_g)).max() < 1e-4
    assert np.abs(np.asarray(g_f) - np.asarray(g_g)).max() < 1e-4
