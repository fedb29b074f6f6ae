"""Cost-stack unit tests: each cost checked against an independent numpy
evaluation of its documented formula, plus hand-computable special cases
(mirroring the reference's hand-valued strategy, test_standard.py:40-223).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from qoc_tpu.costs import (
    ControlArea,
    ControlBandwidthMax,
    ControlNorm,
    ControlVariation,
    ForbidDensities,
    ForbidStates,
    TargetDensityInfidelity,
    TargetDensityInfidelityTime,
    TargetStateInfidelity,
    TargetStateInfidelityTime,
)

RNG = np.random.default_rng(7)


def _rand_states(k, d):
    states = RNG.normal(size=(k, d, 1)) + 1j * RNG.normal(size=(k, d, 1))
    states /= np.linalg.norm(states, axis=1, keepdims=True)
    return states


def _rand_densities(k, d):
    states = _rand_states(k, d)
    return states @ np.conjugate(np.swapaxes(states, -1, -2))


# -- target state infidelity ------------------------------------------------

def test_target_state_infidelity_orthogonal_is_one():
    target = np.array([[[0.0], [1.0]]])
    state = jnp.asarray(np.array([[[1.0 + 0j], [0.0]]]))
    cost = TargetStateInfidelity(target)
    assert np.isclose(float(cost.cost(None, state, 0)), 1.0)


def test_target_state_infidelity_matched_is_zero():
    target = _rand_states(3, 4)
    cost = TargetStateInfidelity(target)
    assert np.isclose(float(cost.cost(None, jnp.asarray(target), 0)), 0.0,
                      atol=1e-12)


def test_target_state_infidelity_coherent_formula():
    k, d = 3, 5
    target = _rand_states(k, d)
    states = _rand_states(k, d)
    cost = TargetStateInfidelity(target, cost_multiplier=1.7)
    ips = np.array([np.vdot(target[i], states[i]) for i in range(k)])
    expected = (1 - np.abs(ips.sum()) ** 2 / k ** 2) * 1.7
    assert np.isclose(float(cost.cost(None, jnp.asarray(states), 0)),
                      expected, atol=1e-12)


def test_target_state_infidelity_incoherent_formula():
    k, d = 4, 3
    target = _rand_states(k, d)
    states = _rand_states(k, d)
    # the reference's public (typo'd) keyword must be accepted
    cost = TargetStateInfidelity(target, neglect_relative_pahse=True)
    ips = np.array([np.vdot(target[i], states[i]) for i in range(k)])
    expected = 1 - np.sum(np.abs(ips) ** 2) / k
    assert np.isclose(float(cost.cost(None, jnp.asarray(states), 0)),
                      expected, atol=1e-12)


def test_target_state_infidelity_time_normalization():
    k, d, s = 2, 3, 11
    target = _rand_states(k, d)
    states = _rand_states(k, d)
    cost = TargetStateInfidelityTime(s, target)
    plain = TargetStateInfidelity(target)
    assert cost.requires_step_evaluation
    got = float(cost.cost(None, jnp.asarray(states), 4))
    expected = float(plain.cost(None, jnp.asarray(states), 4)) / (s - 1)
    assert np.isclose(got, expected, atol=1e-12)


# -- target density infidelity ----------------------------------------------

def test_target_density_infidelity_formula():
    k, d = 3, 4
    target = _rand_densities(k, d)
    dens = _rand_densities(k, d)
    cost = TargetDensityInfidelity(target)
    traces = np.array([np.trace(np.conjugate(target[i].T) @ dens[i])
                       for i in range(k)])
    expected = 1 - np.sum(np.abs(traces)) / (k * d)
    assert np.isclose(float(cost.cost(None, jnp.asarray(dens), 0)), expected,
                      atol=1e-12)


def test_target_density_infidelity_identical_pure_states_floor():
    # Identical pure-state densities: Tr(rho^2) = 1 => fidelity 1/d, the
    # documented nonzero floor (reference examples/1:47-50).
    dens = _rand_densities(1, 2)
    cost = TargetDensityInfidelity(dens)
    assert np.isclose(float(cost.cost(None, jnp.asarray(dens), 0)), 0.5,
                      atol=1e-12)


def test_target_density_infidelity_time_is_step_cost():
    # DIVERGENCE from reference defect: the Time variant must actually be a
    # step cost (SURVEY.md §2.6).
    k, d, s = 2, 3, 21
    target = _rand_densities(k, d)
    dens = _rand_densities(k, d)
    cost = TargetDensityInfidelityTime(s, target)
    assert cost.requires_step_evaluation
    plain = TargetDensityInfidelity(target)
    got = float(cost.cost(None, jnp.asarray(dens), 3))
    expected = float(plain.cost(None, jnp.asarray(dens), 3)) / (s - 1)
    assert np.isclose(got, expected, atol=1e-12)


# -- forbid costs -----------------------------------------------------------

def test_forbid_states_formula_uniform():
    k, f, d, s = 2, 3, 4, 11
    forbidden = np.stack([_rand_states(f, d) for _ in range(k)])
    states = _rand_states(k, d)
    cost = ForbidStates(forbidden, s)
    expected = 0.0
    for i in range(k):
        fids = [np.abs(np.vdot(forbidden[i, j], states[i])) ** 2
                for j in range(f)]
        expected += np.sum(fids) / f
    expected /= (s - 1) * k
    assert np.isclose(float(cost.cost(None, jnp.asarray(states), 1)),
                      expected, atol=1e-12)


def test_forbid_states_ragged():
    d, s = 3, 6
    forbidden = [_rand_states(2, d), _rand_states(4, d)]
    states = _rand_states(2, d)
    cost = ForbidStates(forbidden, s)
    expected = 0.0
    for i, fset in enumerate(forbidden):
        fids = [np.abs(np.vdot(fset[j], states[i])) ** 2
                for j in range(fset.shape[0])]
        expected += np.sum(fids) / fset.shape[0]
    expected /= (s - 1) * 2
    assert np.isclose(float(cost.cost(None, jnp.asarray(states), 1)),
                      expected, atol=1e-12)


def test_forbid_densities_formula():
    k, f, d, s = 2, 2, 3, 9
    forbidden = np.stack([_rand_densities(f, d) for _ in range(k)])
    dens = _rand_densities(k, d)
    cost = ForbidDensities(forbidden, s)
    expected = 0.0
    for i in range(k):
        fids = [np.abs(np.trace(np.conjugate(forbidden[i, j].T) @ dens[i])
                       / d) ** 2 for j in range(f)]
        expected += np.sum(fids) / f
    expected /= (s - 1) * k
    assert np.isclose(float(cost.cost(None, jnp.asarray(dens), 1)), expected,
                      atol=1e-12)


# -- control costs ----------------------------------------------------------

def _rand_controls(e, c):
    return RNG.normal(size=(e, c)) + 1j * RNG.normal(size=(e, c))


def test_control_norm_formula():
    e, c = 7, 3
    controls = _rand_controls(e, c)
    norms = np.abs(RNG.normal(size=c)) + 1.0
    weights = RNG.uniform(0.1, 1.0, size=(e, c))
    cost = ControlNorm(c, e, control_weights=weights,
                       max_control_norms=norms)
    scaled = (controls / norms) * weights
    expected = np.sum(np.abs(scaled) ** 2) / (e * c)
    assert np.isclose(float(cost.cost(jnp.asarray(controls), None, 0)),
                      expected, atol=1e-12)


def test_control_area_formula_and_no_norms_path():
    e, c = 6, 2
    controls = _rand_controls(e, c)
    # The reference crashes with max_control_norms=None (controlarea.py:58);
    # qoc_tpu must not (SURVEY.md §2.6).
    cost = ControlArea(c, e)
    expected = np.sum(np.abs(controls.sum(axis=0))) / (e * c)
    assert np.isclose(float(cost.cost(jnp.asarray(controls), None, 0)),
                      expected, atol=1e-12)


def test_control_variation_formula():
    e, c, order = 8, 2, 2
    controls = _rand_controls(e, c)
    norms = np.abs(RNG.normal(size=c)) + 1.0
    cost = ControlVariation(c, e, max_control_norms=norms, order=order)
    diffs = np.diff(controls / norms, axis=0, n=order)
    expected = np.sum(np.abs(diffs) ** 2) / (c * (e - order) * 2 ** order)
    assert np.isclose(float(cost.cost(jnp.asarray(controls), None, 0)),
                      expected, atol=1e-12)


def test_control_bandwidth_max_formula():
    e, c, t = 16, 1, 10.0
    controls = _rand_controls(e, c)
    max_bw = np.array([0.3])
    cost = ControlBandwidthMax(c, e, t, max_bw)
    freqs = np.fft.fftfreq(e, d=t / (e - 1))
    fft_sq = np.abs(np.fft.fft(controls[:, 0]))
    idx = np.nonzero(freqs >= max_bw[0])[0]
    penalized = fft_sq[idx]
    expected = (np.sum(penalized) / (idx.shape[0] * penalized.max())) / c
    assert np.isclose(float(cost.cost(jnp.asarray(controls), None, 0)),
                      expected, atol=1e-12)


def test_bandwidth_above_nyquist_zero_cost():
    """A channel whose max_bandwidth is at/above Nyquist has an empty
    penalty set and must contribute zero (the reference crashes with a
    zero-size reduction; fixed defect, docs/migration.md — VERDICT r4
    Weak #2 repro)."""
    e, c, t = 11, 1, 10.0
    controls = _rand_controls(e, c)
    cost = ControlBandwidthMax(c, e, t, np.array([0.6]))  # Nyquist = 0.5
    assert float(cost.cost(jnp.asarray(controls), None, 0)) == 0.0


def test_bandwidth_mixed_nyquist_channels():
    """Only the channel with a real penalty set contributes; the empty one
    is a clean zero, not a crash."""
    e, c, t = 16, 2, 10.0
    controls = _rand_controls(e, c)
    cost = ControlBandwidthMax(c, e, t, np.array([0.3, 9.9]))
    only_first = ControlBandwidthMax(1, e, t, np.array([0.3]))
    expected = float(only_first.cost(jnp.asarray(controls[:, :1]), None, 0))
    # Normalization divides by control_count (2 here vs 1 there).
    assert np.isclose(float(cost.cost(jnp.asarray(controls), None, 0)),
                      expected / 2, atol=1e-12)


def test_bandwidth_concentrated_line_scores_low():
    # The reference normalization sum/(count*max) measures band *flatness*:
    # a single concentrated in-band line scores ~1/count (max dominates the
    # sum), while flat leakage scores ~1. Assert the concentrated case.
    e, c, t = 64, 1, 10.0
    times = np.linspace(0, t, e)
    fast = np.cos(2 * np.pi * 1.2 * times)[:, None]
    cost = ControlBandwidthMax(c, e, t, np.array([0.5]))
    value = float(cost.cost(jnp.asarray(fast), None, 0))
    assert np.isfinite(value)
    assert value < 0.5


def test_cost_dimension_mismatch_raises_cleanly():
    """A cost built for the wrong Hilbert dimension fails at pstate
    construction with a named ValueError, not an opaque dot_general
    TypeError from inside the traced loss (round-5 probe)."""
    import jax.numpy as jnp
    from qoc_tpu import grape_schroedinger_discrete, grape_lindblad_discrete
    from qoc_tpu.standard import SIGMA_X, SIGMA_Z

    def ham(c, t):
        sx = jnp.asarray(np.asarray(SIGMA_X), dtype=complex)
        return (jnp.asarray(np.asarray(SIGMA_Z), dtype=complex) / 2
                + c[0] * sx + jnp.conj(c[0]) * sx)

    ini = np.array([[[1.0], [0.0]]])
    bad_tgt = np.zeros((1, 3, 1), dtype=complex); bad_tgt[0, 2] = 1
    with pytest.raises(ValueError, match="Hilbert dimension 3"):
        grape_schroedinger_discrete(
            1, 5, [TargetStateInfidelity(bad_tgt)], 4.0, ham, ini, 5,
            complex_controls=True, iteration_count=1, log_iteration_step=0)

    bad_forb = np.zeros((1, 1, 5, 1), dtype=complex); bad_forb[0, 0, 4] = 1
    with pytest.raises(ValueError, match="ForbidStates.*dimension 5"):
        grape_schroedinger_discrete(
            1, 5, [ForbidStates(bad_forb, 5)], 4.0, ham, ini, 5,
            complex_controls=True, iteration_count=1, log_iteration_step=0)

    rho0 = np.array([[[1.0, 0.0], [0.0, 0.0]]], dtype=complex)
    bad_rho = np.zeros((1, 4, 4), dtype=complex); bad_rho[0, 3, 3] = 1
    with pytest.raises(ValueError, match="Hilbert dimension 4"):
        grape_lindblad_discrete(
            1, 5, [TargetDensityInfidelity(bad_rho)], 4.0, rho0, 2,
            complex_controls=True, hamiltonian=ham, iteration_count=1,
            log_iteration_step=0)
