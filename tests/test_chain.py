"""Fused chain-propagation kernel tests (interpret mode on CPU; the
compiled kernel is exercised on real TPU by bench/driver runs)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture()
def interpreted_pallas(monkeypatch):
    # Fresh trace/executable caches per test: the interpret-mode kernel
    # graphs are enormous, and letting them accumulate across this file
    # reproducibly segfaults XLA:CPU's compiler around the 14th test
    # (jax 0.9.0; crash is in backend_compile_and_load, not our code).
    jax.clear_caches()
    from jax.experimental import pallas as pl
    orig = pl.pallas_call

    def interp_call(*args, **kwargs):
        kwargs.setdefault("interpret", True)
        return orig(*args, **kwargs)

    monkeypatch.setattr(pl, "pallas_call", interp_call)
    yield
    jax.clear_caches()


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


def test_chain_prefixes_forward_and_grad_match_reference(interpreted_pallas):
    """return_prefixes=True (VERDICT r4 Missing #1): the full per-step
    prefix stack matches the reference scan, and a loss touching MANY
    prefixes (the step-cost shape) gets exact gradients through the
    per-step-seeded adjoint recursion — resident regime, including the
    segment-composition and padding paths."""
    from qoc_tpu.ops.chain_pallas import (chain_expm_propagate_reference,
                                          make_chain_expm_propagate)
    rng = np.random.default_rng(31)
    d, n_b = 8, 4
    basis = _random_basis(rng, n_b, d, 0.02)
    tgt = (rng.normal(size=(d, d))
           + 1j * rng.normal(size=(d, d))).astype(np.complex64)
    for b in (16, 37):  # exact multiple and padded-segment cases
        w = rng.normal(size=(b, n_b)).astype(np.float32)
        prop = make_chain_expm_propagate(basis, return_prefixes=True)
        total, prefixes = prop(jnp.asarray(w))
        r_total, r_pref = chain_expm_propagate_reference(
            jnp.asarray(w), basis, return_prefixes=True)
        assert prefixes.shape == (b, d, d)
        scale = np.abs(np.asarray(r_pref)).max()
        assert np.abs(np.asarray(prefixes)
                      - np.asarray(r_pref)).max() / scale < 1e-4
        assert np.abs(np.asarray(total)
                      - np.asarray(r_total)).max() / scale < 1e-4

        # Step-cost-shaped loss: weighted sum over EVERY prefix plus a
        # final-product term (both cotangent paths exercised at once).
        coeff = rng.normal(size=(b,)).astype(np.float32)

        def loss_fused(ww):
            tot, prefs = prop(ww)
            step = jnp.sum(jnp.asarray(coeff)
                           * jnp.sum(jnp.abs(prefs - tgt) ** 2, axis=(1, 2)))
            return step + jnp.sum(jnp.abs(tot - tgt) ** 2)

        def loss_ref(ww):
            tot, prefs = chain_expm_propagate_reference(
                ww, basis, return_prefixes=True)
            step = jnp.sum(jnp.asarray(coeff)
                           * jnp.sum(jnp.abs(prefs - tgt) ** 2, axis=(1, 2)))
            return step + jnp.sum(jnp.abs(tot - tgt) ** 2)

        g_f = np.asarray(jax.grad(loss_fused)(jnp.asarray(w)))
        g_r = np.asarray(jax.grad(loss_ref)(jnp.asarray(w)))
        assert np.abs(g_f - g_r).max() / np.abs(g_r).max() < 1e-3, b

    # Batched members.
    wm = rng.normal(size=(2, 16, n_b)).astype(np.float32)
    prop = make_chain_expm_propagate(basis, return_prefixes=True)
    total_m, pref_m = prop(jnp.asarray(wm))
    assert pref_m.shape == (2, 16, d, d)
    for m in range(2):
        _, want = chain_expm_propagate_reference(jnp.asarray(wm[m]), basis,
                                                 return_prefixes=True)
        assert np.abs(np.asarray(pref_m[m]) - np.asarray(want)).max() < 1e-4


def test_stream_chain_prefixes_match_reference(interpreted_pallas):
    """return_prefixes in the streamed regime (256 < padded d <= 512):
    per-step prefixes and per-step-seeded gradients match the reference."""
    from qoc_tpu.ops.chain_pallas import (chain_expm_propagate_reference,
                                          make_chain_expm_propagate)
    rng = np.random.default_rng(33)
    d, n_b, b = 260, 3, 3
    basis = _random_basis(rng, n_b, d, 0.01 / n_b)
    prop = make_chain_expm_propagate(basis, return_prefixes=True)
    w = rng.normal(size=(b, n_b)).astype(np.float32)
    total, prefixes = prop(jnp.asarray(w))
    r_total, r_pref = chain_expm_propagate_reference(
        jnp.asarray(w), basis, return_prefixes=True)
    scale = np.abs(np.asarray(r_pref)).max()
    assert np.abs(np.asarray(prefixes)
                  - np.asarray(r_pref)).max() / scale < 1e-4

    coeff = rng.normal(size=(b,)).astype(np.float32)
    tgt = (rng.normal(size=(d, d))
           + 1j * rng.normal(size=(d, d))).astype(np.complex64)

    def loss_fused(ww):
        tot, prefs = prop(ww)
        return (jnp.sum(jnp.asarray(coeff) * jnp.sum(
            jnp.abs(prefs - tgt) ** 2, axis=(1, 2)))
            + jnp.sum(jnp.abs(tot - tgt) ** 2))

    def loss_ref(ww):
        tot, prefs = chain_expm_propagate_reference(ww, basis,
                                                    return_prefixes=True)
        return (jnp.sum(jnp.asarray(coeff) * jnp.sum(
            jnp.abs(prefs - tgt) ** 2, axis=(1, 2)))
            + jnp.sum(jnp.abs(tot - tgt) ** 2))

    g_f = np.asarray(jax.grad(loss_fused)(jnp.asarray(w)))
    g_r = np.asarray(jax.grad(loss_ref)(jnp.asarray(w)))
    assert np.abs(g_f - g_r).max() / np.abs(g_r).max() < 1e-3


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


def test_chain_grouped_members_match_reference(interpreted_pallas):
    """Member-grouped resident regime (round 5, the many-chain multistart
    packing): batched w with >= 8 members — including short chains BELOW
    the old 16-step segment floor and a non-multiple-of-8 member count —
    matches the reference per member in totals, prefixes, and per-step
    seeded gradients."""
    from qoc_tpu.ops.chain_pallas import (chain_expm_propagate_reference,
                                          chain_fused_ok,
                                          make_chain_expm_propagate)
    rng = np.random.default_rng(71)
    d, n_b = 8, 4
    basis = _random_basis(rng, n_b, d, 0.02)
    tgt = (rng.normal(size=(d, d))
           + 1j * rng.normal(size=(d, d))).astype(np.complex64)
    assert chain_fused_ok(d, 3, n_chains=8)     # no step floor when grouped
    assert not chain_fused_ok(d, 3, n_chains=1)
    for m, b in ((8, 3), (10, 20)):  # exact group + padded members
        w = rng.normal(size=(m, b, n_b)).astype(np.float32)
        prop = make_chain_expm_propagate(basis)
        got = np.asarray(prop(jnp.asarray(w)))
        assert got.shape == (m, d, d)
        for k in range(m):
            want = np.asarray(chain_expm_propagate_reference(
                jnp.asarray(w[k]), basis))
            assert np.abs(got[k] - want).max() / np.abs(want).max() < 1e-4

        def loss_fused(ww):
            return jnp.sum(jnp.abs(prop(ww) - tgt) ** 2)

        def loss_ref(ww):
            return jnp.sum(jax.vmap(lambda row: jnp.sum(jnp.abs(
                chain_expm_propagate_reference(row, basis) - tgt) ** 2))(ww))

        g_f = np.asarray(jax.grad(loss_fused)(jnp.asarray(w)))
        g_r = np.asarray(jax.grad(loss_ref)(jnp.asarray(w)))
        assert np.abs(g_f - g_r).max() / np.abs(g_r).max() < 1e-3, (m, b)

        # Prefix variant with per-step cotangents.
        prop_p = make_chain_expm_propagate(basis, return_prefixes=True)
        total_p, prefs = prop_p(jnp.asarray(w))
        assert prefs.shape == (m, b, d, d)
        coeff = rng.normal(size=(b,)).astype(np.float32)

        def loss_fused_p(ww):
            tot, prefs_ = prop_p(ww)
            return (jnp.sum(jnp.asarray(coeff)[None, :] * jnp.sum(
                jnp.abs(prefs_ - tgt) ** 2, axis=(2, 3)))
                + jnp.sum(jnp.abs(tot - tgt) ** 2))

        def loss_ref_p(ww):
            def one(row):
                tot, prefs_ = chain_expm_propagate_reference(
                    row, basis, return_prefixes=True)
                return (jnp.sum(jnp.asarray(coeff) * jnp.sum(
                    jnp.abs(prefs_ - tgt) ** 2, axis=(1, 2)))
                    + jnp.sum(jnp.abs(tot - tgt) ** 2))
            return jnp.sum(jax.vmap(one)(ww))

        for k in range(m):
            _, want_p = chain_expm_propagate_reference(
                jnp.asarray(w[k]), basis, return_prefixes=True)
            assert np.abs(np.asarray(prefs[k])
                          - np.asarray(want_p)).max() < 1e-4
        g_fp = np.asarray(jax.grad(loss_fused_p)(jnp.asarray(w)))
        g_rp = np.asarray(jax.grad(loss_ref_p)(jnp.asarray(w)))
        assert np.abs(g_fp - g_rp).max() / np.abs(g_rp).max() < 1e-3, (m, b)


def _plane_reference(a):
    """XLA oracle for the plane chain: expm each plane, scan the product."""
    from qoc_tpu.ops.expm import expm
    us = expm(a)
    d = us.shape[-1]

    def body(carry, u):
        new = u @ carry
        return new, new

    total, prefixes = jax.lax.scan(body, jnp.eye(d, dtype=us.dtype), us)
    return total, prefixes


def test_plane_chain_forward_and_grad_match_reference(interpreted_pallas):
    """Generator-plane chain op (VERDICT r4 Missing #2 infrastructure):
    totals and plane cotangents match AD through the XLA reference, across
    segment counts (plane counts straddling the interleave floor) and
    padding."""
    from qoc_tpu.ops.chain_pallas import plane_chain_propagate
    rng = np.random.default_rng(51)
    d = 8
    tgt = (rng.normal(size=(d, d))
           + 1j * rng.normal(size=(d, d))).astype(np.complex64)
    for b in (3, 16, 37):  # S=1, S=8 exact, S=8 padded
        a = (0.05 * (rng.normal(size=(b, d, d))
                     + 1j * rng.normal(size=(b, d, d)))).astype(np.complex64)
        got = np.asarray(plane_chain_propagate(jnp.asarray(a)))
        want = np.asarray(_plane_reference(jnp.asarray(a))[0])
        assert np.abs(got - want).max() / np.abs(want).max() < 1e-4, b

        def loss_fused(x):
            return jnp.sum(jnp.abs(plane_chain_propagate(x) - tgt) ** 2)

        def loss_ref(x):
            return jnp.sum(jnp.abs(_plane_reference(x)[0] - tgt) ** 2)

        g_f = jax.grad(loss_fused)(jnp.asarray(a))
        g_r = jax.grad(loss_ref)(jnp.asarray(a))
        assert np.abs(np.asarray(g_f) - np.asarray(g_r)).max() \
            / np.abs(np.asarray(g_r)).max() < 1e-3, b

    # Batched members.
    am = (0.05 * (rng.normal(size=(2, 16, d, d))
                  + 1j * rng.normal(size=(2, 16, d, d)))).astype(
                      np.complex64)
    tot_m = np.asarray(plane_chain_propagate(jnp.asarray(am)))
    for m in range(2):
        want_m = np.asarray(_plane_reference(jnp.asarray(am[m]))[0])
        assert np.abs(tot_m[m] - want_m).max() / np.abs(want_m).max() < 1e-4


def test_plane_chain_prefixes_and_step_seeds(interpreted_pallas):
    """Prefix variant: per-step stacks match, and a loss over EVERY prefix
    (the step-cost shape) gets exact plane cotangents through the
    per-step-seeded adjoint."""
    from qoc_tpu.ops.chain_pallas import plane_chain_propagate_prefixes
    rng = np.random.default_rng(53)
    d, b = 8, 20
    a = (0.05 * (rng.normal(size=(b, d, d))
                 + 1j * rng.normal(size=(b, d, d)))).astype(np.complex64)
    tgt = (rng.normal(size=(d, d))
           + 1j * rng.normal(size=(d, d))).astype(np.complex64)
    coeff = rng.normal(size=(b,)).astype(np.float32)

    total, prefixes = plane_chain_propagate_prefixes(jnp.asarray(a))
    r_total, r_pref = _plane_reference(jnp.asarray(a))
    scale = np.abs(np.asarray(r_pref)).max()
    assert np.abs(np.asarray(prefixes) - np.asarray(r_pref)).max() \
        / scale < 1e-4

    def loss_fused(x):
        tot, prefs = plane_chain_propagate_prefixes(x)
        return (jnp.sum(jnp.asarray(coeff) * jnp.sum(
            jnp.abs(prefs - tgt) ** 2, axis=(1, 2)))
            + jnp.sum(jnp.abs(tot - tgt) ** 2))

    def loss_ref(x):
        tot, prefs = _plane_reference(x)
        return (jnp.sum(jnp.asarray(coeff) * jnp.sum(
            jnp.abs(prefs - tgt) ** 2, axis=(1, 2)))
            + jnp.sum(jnp.abs(tot - tgt) ** 2))

    g_f = np.asarray(jax.grad(loss_fused)(jnp.asarray(a)))
    g_r = np.asarray(jax.grad(loss_ref)(jnp.asarray(a)))
    assert np.abs(g_f - g_r).max() / np.abs(g_r).max() < 1e-3


def test_plane_chain_composes_with_plane_build_ad(interpreted_pallas):
    """The intended composition: ordinary AD through a differentiable plane
    build (here the exact Magnus-M4 formula with commutator term) into the
    op's custom VJP matches full AD through the XLA reference."""
    from qoc_tpu.ops.chain_pallas import plane_chain_propagate
    rng = np.random.default_rng(55)
    d, n_b, b = 6, 3, 16
    basis = _random_basis(rng, n_b, d, 0.05)
    w1 = rng.normal(size=(b, n_b)).astype(np.float32)
    w2 = rng.normal(size=(b, n_b)).astype(np.float32)
    tgt = (rng.normal(size=(d, d))
           + 1j * rng.normal(size=(d, d))).astype(np.complex64)

    def planes(w):
        a1 = jnp.einsum("jk,kab->jab", w, jnp.asarray(basis))
        a2 = jnp.einsum("jk,kab->jab", jnp.asarray(w2), jnp.asarray(basis))
        comm = a2 @ a1 - a1 @ a2
        return 0.5 * (a1 + a2) + 0.1 * comm

    def loss_fused(w):
        return jnp.sum(jnp.abs(plane_chain_propagate(planes(w)) - tgt) ** 2)

    def loss_ref(w):
        return jnp.sum(jnp.abs(_plane_reference(planes(w))[0] - tgt) ** 2)

    g_f = np.asarray(jax.grad(loss_fused)(jnp.asarray(w1)))
    g_r = np.asarray(jax.grad(loss_ref)(jnp.asarray(w1)))
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


def test_fused_step_cost_loss_matches_generic(interpreted_pallas, capsys):
    """Step-cost workloads now ride the fused chain path (VERDICT r4
    Missing #1): a loss with ForbidStates + TargetStateInfidelityTime on
    the fused path matches the generic prefix-scan path in value and
    gradient, and the path log proves fusion was selected."""
    from qoc_tpu.core.schroedinger import build_schroedinger_loss
    from qoc_tpu.models import (GrapeSchroedingerDiscreteState,
                                InterpolationPolicy, LinearHamiltonian,
                                MagnusPolicy)
    from qoc_tpu.optim import Adam
    from qoc_tpu.ops.expm import set_expm_forward
    from qoc_tpu.standard import (ForbidStates, TargetStateInfidelity,
                                  TargetStateInfidelityTime)

    rng = np.random.default_rng(41)
    d, n_c, n_steps = 4, 2, 25
    h0 = rng.normal(size=(d, d)) + 1j * rng.normal(size=(d, d))
    h0 = (h0 + h0.conj().T) / 2
    ops = 0.5 * (rng.normal(size=(n_c, d, d))
                 + 1j * rng.normal(size=(n_c, d, d)))
    ham_lin = LinearHamiltonian(h0, ops)
    initial = np.zeros((1, d, 1), dtype=complex); initial[0, 0] = 1
    target = np.zeros((1, d, 1), dtype=complex); target[0, -1] = 1
    forb = np.zeros((1, 1, d, 1), dtype=complex); forb[0, 0, 1] = 1
    costs = [TargetStateInfidelity(target),
             TargetStateInfidelityTime(n_steps, target),
             ForbidStates(forb, n_steps)]

    def make_pstate():
        return GrapeSchroedingerDiscreteState(
            True, n_c, n_steps, 1, costs, 2.0, ham_lin, None,
            np.zeros((n_steps, n_c), dtype=complex), initial,
            InterpolationPolicy.LINEAR, 1, 0, [10.0] * n_c,
            MagnusPolicy.M2, 0, Adam(), None, False, 0, n_steps)

    controls = (0.3 * (rng.normal(size=(n_steps, n_c))
                       + 1j * rng.normal(size=(n_steps, n_c)))).astype(
                           np.complex64)

    loss_generic = build_schroedinger_loss(make_pstate())
    err_gen, _ = loss_generic(jnp.asarray(controls))
    g_gen = np.asarray(jax.grad(lambda c: loss_generic(c)[0])(
        jnp.asarray(controls)))

    try:
        set_expm_forward("pallas")
        loss_fused_fn = build_schroedinger_loss(make_pstate(),
                                                time_block_size=16,
                                                log_path=True)
        out = capsys.readouterr().out
        assert "fused Pallas chain kernel" in out, out
        assert "per-step prefixes" in out, out
        err_fused = float(loss_fused_fn(jnp.asarray(controls))[0])
        g_fused = np.asarray(jax.grad(lambda c: loss_fused_fn(c)[0])(
            jnp.asarray(controls)))
    finally:
        set_expm_forward("auto")

    assert abs(err_fused - float(err_gen)) < 1e-4
    assert np.abs(g_fused - g_gen).max() < 1e-3 * max(
        1.0, np.abs(g_gen).max())


def test_fused_step_cost_thinning_matches_generic(interpreted_pallas):
    """cost_eval_step > 1 (the reference's step-cost thinning,
    schroedingerdiscrete.py:61-63) through the fused per-step-prefix path:
    value and gradient match the generic path with the same thinning."""
    from qoc_tpu.core.schroedinger import build_schroedinger_loss
    from qoc_tpu.models import (GrapeSchroedingerDiscreteState,
                                InterpolationPolicy, LinearHamiltonian,
                                MagnusPolicy)
    from qoc_tpu.optim import Adam
    from qoc_tpu.ops.expm import set_expm_forward
    from qoc_tpu.standard import ForbidStates, TargetStateInfidelity

    rng = np.random.default_rng(49)
    d, n_c, n_steps = 4, 1, 25
    h0 = rng.normal(size=(d, d)) + 1j * rng.normal(size=(d, d))
    h0 = (h0 + h0.conj().T) / 2
    ops = 0.5 * (rng.normal(size=(n_c, d, d))
                 + 1j * rng.normal(size=(n_c, d, d)))
    ham = LinearHamiltonian(h0, ops)
    initial = np.zeros((1, d, 1), dtype=complex); initial[0, 0] = 1
    target = np.zeros((1, d, 1), dtype=complex); target[0, -1] = 1
    forb = np.zeros((1, 1, d, 1), dtype=complex); forb[0, 0, 1] = 1
    costs = [TargetStateInfidelity(target),
             ForbidStates(forb, n_steps, cost_eval_step=3)]

    def make_pstate():
        return GrapeSchroedingerDiscreteState(
            True, n_c, n_steps, 3, costs, 2.0, ham, None,
            np.zeros((n_steps, n_c), dtype=complex), initial,
            InterpolationPolicy.LINEAR, 1, 0, [10.0] * n_c,
            MagnusPolicy.M2, 0, Adam(), None, False, 0, n_steps)

    controls = (0.3 * (rng.normal(size=(n_steps, n_c))
                       + 1j * rng.normal(size=(n_steps, n_c)))).astype(
                           np.complex64)
    loss_generic = build_schroedinger_loss(make_pstate())
    err_gen, _ = loss_generic(jnp.asarray(controls))
    g_gen = np.asarray(jax.grad(lambda c: loss_generic(c)[0])(
        jnp.asarray(controls)))
    try:
        set_expm_forward("pallas")
        loss_fused = build_schroedinger_loss(make_pstate(),
                                             time_block_size=16)
        err_fused = float(loss_fused(jnp.asarray(controls))[0])
        g_fused = np.asarray(jax.grad(lambda c: loss_fused(c)[0])(
            jnp.asarray(controls)))
    finally:
        set_expm_forward("auto")
    assert abs(err_fused - float(err_gen)) < 1e-4
    assert np.abs(g_fused - g_gen).max() < 1e-3 * max(
        1.0, np.abs(g_gen).max())


def test_fused_collect_intermediates_matches_generic(interpreted_pallas):
    """Intermediate-state collection rides the fused chain path and returns
    the same (system_eval_count, K, d, 1) stack as the generic path."""
    from qoc_tpu.core.schroedinger import build_schroedinger_loss
    from qoc_tpu.models import (GrapeSchroedingerDiscreteState,
                                InterpolationPolicy, LinearHamiltonian,
                                MagnusPolicy)
    from qoc_tpu.optim import Adam
    from qoc_tpu.ops.expm import set_expm_forward
    from qoc_tpu.standard import TargetStateInfidelity

    rng = np.random.default_rng(43)
    d, n_c, n_steps = 4, 1, 20
    h0 = rng.normal(size=(d, d)) + 1j * rng.normal(size=(d, d))
    h0 = (h0 + h0.conj().T) / 2
    ops = 0.5 * (rng.normal(size=(n_c, d, d))
                 + 1j * rng.normal(size=(n_c, d, d)))
    ham = LinearHamiltonian(h0, ops)
    initial = np.zeros((2, d, 1), dtype=complex)
    initial[0, 0] = 1; initial[1, 1] = 1
    target = np.zeros((2, d, 1), dtype=complex)
    target[0, -1] = 1; target[1, 0] = 1
    costs = [TargetStateInfidelity(target)]

    def make_pstate():
        return GrapeSchroedingerDiscreteState(
            True, n_c, n_steps, 1, costs, 2.0, ham, None,
            np.zeros((n_steps, n_c), dtype=complex), initial,
            InterpolationPolicy.LINEAR, 1, 0, [10.0] * n_c,
            MagnusPolicy.M2, 0, Adam(), None, False, 0, n_steps)

    controls = (0.3 * (rng.normal(size=(n_steps, n_c))
                       + 1j * rng.normal(size=(n_steps, n_c)))).astype(
                           np.complex64)

    gen = build_schroedinger_loss(make_pstate(), collect_intermediates=True,
                                  remat=False)
    _, _, inter_gen = gen(jnp.asarray(controls))
    try:
        set_expm_forward("pallas")
        fus = build_schroedinger_loss(make_pstate(),
                                      collect_intermediates=True,
                                      remat=False, time_block_size=16)
        _, _, inter_fus = fus(jnp.asarray(controls))
    finally:
        set_expm_forward("auto")
    assert inter_fus.shape == (n_steps, 2, d, 1)
    assert np.abs(np.asarray(inter_fus) - np.asarray(inter_gen)).max() < 1e-4


def _schro_pstate_factory(rng, d, n_c, n_steps, costs, ham, magnus_policy,
                          n_states=1):
    from qoc_tpu.models import (GrapeSchroedingerDiscreteState,
                                InterpolationPolicy)
    from qoc_tpu.optim import Adam
    initial = np.zeros((n_states, d, 1), dtype=complex)
    for k in range(n_states):
        initial[k, k] = 1
    return GrapeSchroedingerDiscreteState(
        True, n_c, n_steps, 1, costs, 2.0, ham, None,
        np.zeros((n_steps, n_c), dtype=complex), initial,
        InterpolationPolicy.LINEAR, 1, 0, [10.0] * n_c, magnus_policy, 0,
        Adam(), None, False, 0, n_steps)


@pytest.mark.parametrize("policy_name", ["M4", "M6"])
def test_fused_magnus_high_order_matches_generic(interpreted_pallas, capsys,
                                                 policy_name):
    """Magnus M4/M6 workloads ride the fused plane-chain path (VERDICT r4
    Missing #2): value and gradient match the generic Magnus+expm path, and
    the path log proves the fused kernel was selected."""
    from qoc_tpu.core.schroedinger import build_schroedinger_loss
    from qoc_tpu.models import LinearHamiltonian, MagnusPolicy
    from qoc_tpu.ops.expm import set_expm_forward
    from qoc_tpu.standard import TargetStateInfidelity

    policy = getattr(MagnusPolicy, policy_name)
    rng = np.random.default_rng(61)
    d, n_c, n_steps = 4, 2, 25
    h0 = rng.normal(size=(d, d)) + 1j * rng.normal(size=(d, d))
    h0 = (h0 + h0.conj().T) / 2
    ops = 0.5 * (rng.normal(size=(n_c, d, d))
                 + 1j * rng.normal(size=(n_c, d, d)))
    ham = LinearHamiltonian(h0, ops)
    target = np.zeros((1, d, 1), dtype=complex); target[0, -1] = 1
    costs = [TargetStateInfidelity(target)]
    controls = (0.3 * (rng.normal(size=(n_steps, n_c))
                       + 1j * rng.normal(size=(n_steps, n_c)))).astype(
                           np.complex64)

    loss_generic = build_schroedinger_loss(
        _schro_pstate_factory(rng, d, n_c, n_steps, costs, ham, policy))
    err_gen, _ = loss_generic(jnp.asarray(controls))
    g_gen = np.asarray(jax.grad(lambda c: loss_generic(c)[0])(
        jnp.asarray(controls)))

    try:
        set_expm_forward("pallas")
        loss_fused = build_schroedinger_loss(
            _schro_pstate_factory(rng, d, n_c, n_steps, costs, ham, policy),
            log_path=True)
        out = capsys.readouterr().out
        assert "fused Pallas plane-chain kernel" in out, out
        assert policy_name.lower() in out.lower(), out
        err_fused = float(loss_fused(jnp.asarray(controls))[0])
        g_fused = np.asarray(jax.grad(lambda c: loss_fused(c)[0])(
            jnp.asarray(controls)))
    finally:
        set_expm_forward("auto")

    assert abs(err_fused - float(err_gen)) < 1e-4
    assert np.abs(g_fused - g_gen).max() < 1e-3 * max(
        1.0, np.abs(g_gen).max())


def test_fused_plane_path_arbitrary_hamiltonian(interpreted_pallas, capsys):
    """A plain callable Hamiltonian (no LinearHamiltonian declaration, even
    time-dependent) now fuses through the plane-chain path — previously
    only the generic XLA path served it."""
    from qoc_tpu.core.schroedinger import build_schroedinger_loss
    from qoc_tpu.models import MagnusPolicy
    from qoc_tpu.ops.expm import set_expm_forward
    from qoc_tpu.standard import TargetStateInfidelity

    rng = np.random.default_rng(63)
    d, n_c, n_steps = 4, 1, 25
    h0 = rng.normal(size=(d, d)) + 1j * rng.normal(size=(d, d))
    h0 = (h0 + h0.conj().T) / 2
    v = rng.normal(size=(d, d)) + 1j * rng.normal(size=(d, d))
    v = (v + v.conj().T) / 2

    def ham(c, t):
        # Time-dependent drift + real-quadrature drive: outside every
        # structured fast path the weight kernel can express.
        return (jnp.asarray(h0) * jnp.cos(0.3 * t)
                + jnp.real(c[0]) * jnp.asarray(v))

    target = np.zeros((1, d, 1), dtype=complex); target[0, -1] = 1
    costs = [TargetStateInfidelity(target)]
    controls = (0.3 * (rng.normal(size=(n_steps, n_c))
                       + 1j * rng.normal(size=(n_steps, n_c)))).astype(
                           np.complex64)

    loss_generic = build_schroedinger_loss(
        _schro_pstate_factory(rng, d, n_c, n_steps, costs, ham,
                              MagnusPolicy.M2))
    err_gen, _ = loss_generic(jnp.asarray(controls))
    g_gen = np.asarray(jax.grad(lambda c: loss_generic(c)[0])(
        jnp.asarray(controls)))

    try:
        set_expm_forward("pallas")
        loss_fused = build_schroedinger_loss(
            _schro_pstate_factory(rng, d, n_c, n_steps, costs, ham,
                                  MagnusPolicy.M2), log_path=True)
        out = capsys.readouterr().out
        assert "fused Pallas plane-chain kernel" in out, out
        err_fused = float(loss_fused(jnp.asarray(controls))[0])
        g_fused = np.asarray(jax.grad(lambda c: loss_fused(c)[0])(
            jnp.asarray(controls)))
    finally:
        set_expm_forward("auto")

    assert abs(err_fused - float(err_gen)) < 1e-4
    assert np.abs(g_fused - g_gen).max() < 1e-3 * max(
        1.0, np.abs(g_gen).max())


def test_fused_lindblad_m4_matches_generic(interpreted_pallas, capsys):
    """Lindblad MAGNUS_EXPM under M4 rides the superoperator plane-chain
    path and matches the generic path in value and gradient."""
    from qoc_tpu.core.lindblad import build_lindblad_loss
    from qoc_tpu.models import (ConstantLindblad,
                                GrapeLindbladDiscreteState,
                                InterpolationPolicy, LindbladMethod,
                                LinearHamiltonian, MagnusPolicy)
    from qoc_tpu.optim import Adam
    from qoc_tpu.ops.expm import set_expm_forward
    from qoc_tpu.standard import TargetDensityInfidelity

    rng = np.random.default_rng(67)
    d, n_c, n_steps = 3, 1, 21
    h0 = rng.normal(size=(d, d)) + 1j * rng.normal(size=(d, d))
    h0 = (h0 + h0.conj().T) / 2
    ops = 0.4 * (rng.normal(size=(n_c, d, d))
                 + 1j * rng.normal(size=(n_c, d, d)))
    ham = LinearHamiltonian(h0, ops)
    lind = ConstantLindblad(np.array([0.05]),
                            0.3 * (rng.normal(size=(1, d, d))
                                   + 1j * rng.normal(size=(1, d, d))))
    rho0 = np.zeros((1, d, d), dtype=complex); rho0[0, 0, 0] = 1
    target = np.zeros((1, d, d), dtype=complex); target[0, -1, -1] = 1
    costs = [TargetDensityInfidelity(target)]

    def make_pstate():
        p = GrapeLindbladDiscreteState(
            True, n_c, n_steps, 1, costs, 2.0, ham, None,
            np.zeros((n_steps, n_c), dtype=complex), rho0,
            InterpolationPolicy.LINEAR, 1, lind, 0, [10.0] * n_c, 0,
            Adam(), None, False, 0, n_steps)
        p.method_ = LindbladMethod.MAGNUS_EXPM
        p.magnus_policy_ = MagnusPolicy.M4
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
        loss_fused = build_lindblad_loss(make_pstate(), log_path=True)
        out = capsys.readouterr().out
        assert "superoperator plane-chain kernel" in out, out
        assert "m4" in out.lower(), out
        err_fused = float(loss_fused(jnp.asarray(controls))[0])
        g_fused = np.asarray(jax.grad(lambda c: loss_fused(c)[0])(
            jnp.asarray(controls)))
    finally:
        set_expm_forward("auto")

    assert abs(err_fused - float(err_gen)) < 1e-4
    assert np.abs(g_fused - g_gen).max() < 1e-3 * max(
        1.0, np.abs(g_gen).max())


def test_fused_lindblad_step_costs_match_generic(interpreted_pallas, capsys):
    """Lindblad step costs (ForbidDensities + TargetDensityInfidelityTime)
    ride the fused superoperator chain and match the generic path."""
    from qoc_tpu.core.lindblad import build_lindblad_loss
    from qoc_tpu.models import (ConstantLindblad,
                                GrapeLindbladDiscreteState,
                                InterpolationPolicy, LindbladMethod,
                                LinearHamiltonian, MagnusPolicy)
    from qoc_tpu.optim import Adam
    from qoc_tpu.ops.expm import set_expm_forward
    from qoc_tpu.standard import (ForbidDensities, TargetDensityInfidelity,
                                  TargetDensityInfidelityTime)

    rng = np.random.default_rng(47)
    d, n_c, n_steps = 3, 1, 21
    h0 = rng.normal(size=(d, d)) + 1j * rng.normal(size=(d, d))
    h0 = (h0 + h0.conj().T) / 2
    ops = 0.4 * (rng.normal(size=(n_c, d, d))
                 + 1j * rng.normal(size=(n_c, d, d)))
    gammas = np.array([0.05])
    lops = 0.3 * (rng.normal(size=(1, d, d))
                  + 1j * rng.normal(size=(1, d, d)))
    ham = LinearHamiltonian(h0, ops)
    lind = ConstantLindblad(gammas, lops)
    rho0 = np.zeros((1, d, d), dtype=complex); rho0[0, 0, 0] = 1
    target = np.zeros((1, d, d), dtype=complex); target[0, -1, -1] = 1
    forb = np.zeros((1, 1, d, d), dtype=complex); forb[0, 0, 1, 1] = 1
    costs = [TargetDensityInfidelity(target),
             TargetDensityInfidelityTime(n_steps, target),
             ForbidDensities(forb, n_steps)]

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
        loss_fused = build_lindblad_loss(make_pstate(), log_path=True)
        out = capsys.readouterr().out
        assert "fused Pallas superoperator chain" in out, out
        assert "per-step prefixes" in out, out
        err_fused = float(loss_fused(jnp.asarray(controls))[0])
        g_fused = np.asarray(jax.grad(lambda c: loss_fused(c)[0])(
            jnp.asarray(controls)))
    finally:
        set_expm_forward("auto")

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

    # 512-chain multistart-class problem (grouped-member packing, no
    # segment floor): the 512 MB/block cap binds at 16 steps (512 MB /
    # 32 MB-per-step); padded residuals 64 KB * 512 * 200 = 6.4 GB < 8 GB
    # -> residuals stored (measured faster than remat).
    block, remat = chain_block_plan(64, 200, n_chains=512)
    assert block == 16
    assert not remat

    # 1024/2048-chain workloads (the BASELINE "thousands of candidates"
    # axis): eligible through the grouped packing — the per-block cap
    # shrinks the block instead of disqualifying the kernel.
    from qoc_tpu.ops.chain_pallas import chain_fused_ok
    for n_chains in (1024, 2048):
        assert chain_fused_ok(64, 200, n_chains)
        block_n, remat_n = chain_block_plan(64, 200, n_chains=n_chains)
        assert 1 <= block_n <= 8
        assert remat_n                     # 13-27 GB of residuals -> remat

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


def test_chain_rejects_padded_d_above_stream_max():
    """Direct callers past chain_fused_ok's limit get a clear ValueError,
    not an obscure Mosaic VMEM compile failure (ADVICE r4)."""
    from qoc_tpu.ops.chain_pallas import (_STREAM_MAX, chain_expm_propagate,
                                          plane_chain_propagate)
    rng = np.random.default_rng(99)
    d = _STREAM_MAX + 1
    basis = np.zeros((1, d, d), dtype=np.complex64)
    w = rng.normal(size=(2, 1)).astype(np.float32)
    with pytest.raises(ValueError, match="padded d <= 512"):
        chain_expm_propagate(jnp.asarray(w), basis)
    planes = jnp.zeros((2, d, d), dtype=jnp.complex64)
    with pytest.raises(ValueError, match="padded d <= 512"):
        plane_chain_propagate(planes)
