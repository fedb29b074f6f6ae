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
