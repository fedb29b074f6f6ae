"""Pallas fused-expm kernel tests (interpret mode on CPU; the compiled
kernel is exercised on real TPU by bench/driver runs)."""

import numpy as np
import pytest
import scipy.linalg as sla

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


def test_pallas_expm_matches_scipy(interpreted_pallas):
    from qoc_tpu.ops.expm_pallas import expm_taylor_pallas
    rng = np.random.default_rng(3)
    a = ((rng.normal(size=(4, 24, 24))
          + 1j * rng.normal(size=(4, 24, 24))) * 1.5).astype(np.complex64)
    got = np.asarray(expm_taylor_pallas(jnp.asarray(a)))
    for i in range(4):
        ref = sla.expm(a[i].astype(np.complex128))
        rel = np.abs(got[i] - ref).max() / np.abs(ref).max()
        assert rel < 1e-4  # float32 kernel


def test_pallas_expm_large_norm_squaring(interpreted_pallas):
    from qoc_tpu.ops.expm_pallas import expm_taylor_pallas
    rng = np.random.default_rng(4)
    a = ((rng.normal(size=(2, 8, 8))
          + 1j * rng.normal(size=(2, 8, 8))) * 8.0).astype(np.complex64)
    got = np.asarray(expm_taylor_pallas(jnp.asarray(a)))
    for i in range(2):
        ref = sla.expm(a[i].astype(np.complex128))
        rel = np.abs(got[i] - ref).max() / np.abs(ref).max()
        assert rel < 1e-3


def test_pallas_expm_unbatched_shape(interpreted_pallas):
    from qoc_tpu.ops.expm_pallas import expm_taylor_pallas
    a = (np.eye(6) * 0.5).astype(np.complex64)
    got = np.asarray(expm_taylor_pallas(jnp.asarray(a)))
    assert got.shape == (6, 6)
    assert np.allclose(np.diag(got), np.exp(0.5), atol=1e-5)


def test_pallas_frechet_matches_xla(interpreted_pallas):
    from qoc_tpu.ops.expm import expm_frechet
    from qoc_tpu.ops.expm_pallas import expm_frechet_pallas
    rng = np.random.default_rng(5)
    for scale in (0.1, 3.0):  # deg-8/no-squaring and deg-19/squaring paths
        b = ((rng.normal(size=(3, 16, 16))
              + 1j * rng.normal(size=(3, 16, 16))) * scale).astype(
                  np.complex64)
        g = ((rng.normal(size=(3, 16, 16))
              + 1j * rng.normal(size=(3, 16, 16)))).astype(np.complex64)
        got = np.asarray(expm_frechet_pallas(jnp.asarray(b), jnp.asarray(g)))
        want = np.asarray(expm_frechet(jnp.asarray(b), jnp.asarray(g)))
        rel = np.abs(got - want).max() / np.abs(want).max()
        assert rel < 1e-4, (scale, rel)


def test_pallas_expm_gradient_matches_xla(interpreted_pallas):
    from qoc_tpu.ops.expm import expm, set_expm_forward
    rng = np.random.default_rng(6)
    h = rng.normal(size=(8, 8)) + 1j * rng.normal(size=(8, 8))
    h = ((h + h.conj().T) / 2).astype(np.complex64)
    x0 = np.float32(0.37)

    def loss(x):
        u = expm(-1j * x * jnp.asarray(h))
        return jnp.sum(jnp.abs(u - jnp.eye(8, dtype=u.dtype)) ** 2)

    try:
        set_expm_forward("pallas")
        g_pallas = float(jax.grad(loss)(x0))
        v_pallas = float(loss(x0))
    finally:
        set_expm_forward("auto")
    g_xla = float(jax.grad(loss)(x0))
    v_xla = float(loss(x0))
    assert abs(v_pallas - v_xla) < 1e-4 * max(1.0, abs(v_xla))
    assert abs(g_pallas - g_xla) < 1e-3 * max(1.0, abs(g_xla))


def test_pallas_expm_degree_ladder_accuracy(interpreted_pallas):
    """Every rung of the f32 Taylor degree ladder (4/8/12/19/general) must
    match scipy at f32 tolerance on norms targeted inside its bracket."""
    from qoc_tpu.ops.expm_pallas import expm_taylor_pallas
    rng = np.random.default_rng(12)
    d = 12
    h = rng.normal(size=(d, d)) + 1j * rng.normal(size=(d, d))
    h = (h + h.conj().T) / 2
    a0 = -1j * h
    norm0 = np.abs(a0).sum(axis=0).max()
    for target_norm in (0.03, 0.3, 0.9, 2.2, 9.0):
        a = (a0 * (target_norm / norm0)).astype(np.complex64)[None]
        got = np.asarray(expm_taylor_pallas(jnp.asarray(a)))[0]
        ref = sla.expm(a[0].astype(np.complex128))
        rel = np.abs(got - ref).max() / np.abs(ref).max()
        assert rel < 5e-5, (target_norm, rel)


def test_pallas_frechet_degree_ladder_accuracy(interpreted_pallas):
    from qoc_tpu.ops.expm import expm_frechet, set_expm_forward
    from qoc_tpu.ops.expm_pallas import expm_frechet_pallas
    rng = np.random.default_rng(13)
    d = 10
    h = rng.normal(size=(d, d)) + 1j * rng.normal(size=(d, d))
    h = (h + h.conj().T) / 2
    b0 = -1j * h
    norm0 = np.abs(b0).sum(axis=0).max()
    g = (rng.normal(size=(d, d))
         + 1j * rng.normal(size=(d, d))).astype(np.complex64)[None]
    for target_norm in (0.03, 0.3, 0.9, 2.2, 9.0):
        b = (b0 * (target_norm / norm0)).astype(np.complex64)[None]
        got = np.asarray(expm_frechet_pallas(jnp.asarray(b),
                                             jnp.asarray(g)))
        want = np.asarray(expm_frechet(jnp.asarray(b.astype(np.complex64)),
                                       jnp.asarray(g)))
        rel = np.abs(got - want).max() / np.abs(want).max()
        assert rel < 5e-4, (target_norm, rel)


def test_pallas_bf16_3x_mode_accuracy(interpreted_pallas, monkeypatch):
    """QOC_TPU_MXU_PRECISION=bf16_3x (3-pass split-multiply MXU dots) must
    stay within ~2^-16/product of the exact-f32 kernels; it is the bench's
    opt-in speed mode so its numerics are pinned here. The env var is read
    at import; tests flip the module global and drop the jit caches."""
    import qoc_tpu.ops.expm_pallas as ep
    from qoc_tpu.ops.chain_pallas import (chain_expm_propagate_reference,
                                          make_chain_expm_propagate)
    rng = np.random.default_rng(21)
    a = ((rng.normal(size=(3, 16, 16))
          + 1j * rng.normal(size=(3, 16, 16))) * 0.05).astype(np.complex64)
    n_b, d, steps = 4, 8, 24
    basis = ((rng.normal(size=(n_b, d, d))
              + 1j * rng.normal(size=(n_b, d, d))) * 0.02).astype(
                  np.complex64)
    w = rng.normal(size=(steps, n_b)).astype(np.float32)
    monkeypatch.setattr(ep, "_MXU_MODE", "bf16_3x")
    jax.clear_caches()
    try:
        got_expm = np.asarray(ep.expm_taylor_pallas(jnp.asarray(a)))
        prop = make_chain_expm_propagate(basis)
        got_chain, vjp = jax.vjp(prop, jnp.asarray(w))
        gbar = jnp.ones_like(got_chain)
        got_wbar = np.asarray(vjp(gbar)[0])
    finally:
        monkeypatch.setattr(ep, "_MXU_MODE", "highest")
        jax.clear_caches()
    for i in range(3):
        ref = sla.expm(a[i].astype(np.complex128))
        assert np.abs(got_expm[i] - ref).max() / np.abs(ref).max() < 2e-4
    want_chain, vjp_ref = jax.vjp(
        lambda ww: chain_expm_propagate_reference(ww, basis),
        jnp.asarray(w))
    want_wbar = np.asarray(vjp_ref(jnp.ones_like(want_chain))[0])
    rel = np.abs(np.asarray(got_chain) - np.asarray(want_chain)).max() \
        / np.abs(np.asarray(want_chain)).max()
    assert rel < 1e-3, rel
    grel = np.abs(got_wbar - want_wbar).max() / np.abs(want_wbar).max()
    assert grel < 5e-3, grel


def test_pallas_size_guard_falls_back_to_xla():
    """Above d=256 the fused kernels would exceed VMEM; expm must fall back
    to the XLA core even when the pallas impl is forced."""
    from qoc_tpu.ops.expm import expm, set_expm_forward
    rng = np.random.default_rng(14)
    d = 300
    a = (0.01 * (rng.normal(size=(d, d)) + 1j * rng.normal(size=(d, d)))
         ).astype(np.complex64)
    try:
        set_expm_forward("pallas")
        got = np.asarray(expm(jnp.asarray(a)))  # must not hit pallas_call
    finally:
        set_expm_forward("auto")
    ref = sla.expm(a.astype(np.complex128))
    assert np.abs(got - ref).max() / np.abs(ref).max() < 1e-4


def test_pallas_platform_guard_mixed_backends(monkeypatch):
    """_pallas_ok must respect a forced-CPU jax_platforms config even when
    default_backend() reports an accelerator (mixed-backend processes: the
    driver's virtual-device dry run initializes CPU after the TPU)."""
    import importlib
    expm_mod = importlib.import_module("qoc_tpu.ops.expm")
    monkeypatch.setattr(expm_mod.jax, "default_backend", lambda: "axon")
    # jax_platforms is "cpu" under the test conftest; the platform guard is
    # checked before anything backend-derived, so this must short-circuit.
    assert expm_mod._pallas_ok() is False


# NOTE: pallas-inside-shard_map is validated COMPILED on the real TPU by the
# driver entry / scratch drives (the interpret-mode HLO interpreter cannot
# run kernels under shard_map(check_vma=True): its internal dynamic_slice
# mixes varying and unvarying operands — a JAX limitation, not ours). The
# _struct helper propagates the input vma so the compiled path composes.


def test_xla_taylor_bf16_3x_split_mul(monkeypatch):
    """The XLA Taylor path (the d>256 fallback above the Pallas embedding
    limit) honors QOC_TPU_MXU_PRECISION=bf16_3x via the split-multiply
    _mul: value and exact-adjoint gradient must stay within the mode's
    ~2^-16/product error envelope of the HIGHEST-precision result, on
    complex64 inputs; f64 inputs must be untouched by the mode."""
    import qoc_tpu.ops.expm_pallas as ep
    from qoc_tpu.ops.expm import expm_taylor, expm

    rng = np.random.default_rng(33)
    a = ((rng.normal(size=(3, 32, 32))
          + 1j * rng.normal(size=(3, 32, 32))) * 0.2).astype(np.complex64)

    def loss(x):
        return jnp.real(jnp.sum(expm(x) * jnp.conj(expm(x))))

    want = np.asarray(expm_taylor(jnp.asarray(a)))
    gwant = np.asarray(jax.grad(lambda x: loss(x).astype(jnp.float32),
                                holomorphic=False)(jnp.asarray(a)))
    monkeypatch.setattr(ep, "_MXU_MODE", "bf16_3x")
    jax.clear_caches()
    try:
        got = np.asarray(expm_taylor(jnp.asarray(a)))
        ggot = np.asarray(jax.grad(lambda x: loss(x).astype(jnp.float32),
                                   holomorphic=False)(jnp.asarray(a)))
        # f64 input: the dtype guard must keep HIGHEST semantics.
        a64 = a.astype(np.complex128)
        got64 = np.asarray(expm_taylor(jnp.asarray(a64)))
    finally:
        monkeypatch.setattr(ep, "_MXU_MODE", "highest")
        jax.clear_caches()
    rel = np.abs(got - want).max() / np.abs(want).max()
    assert rel < 1e-3, rel
    grel = np.abs(ggot - gwant).max() / np.abs(gwant).max()
    assert grel < 5e-3, grel
    ref64 = sla.expm(a64[0])
    assert np.abs(got64[0] - ref64).max() / np.abs(ref64).max() < 1e-12
