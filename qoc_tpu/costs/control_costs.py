"""Control-regularization cost functions.

Parity with /root/reference/qoc/standard/costs/{controlnorm,controlarea,
controlvariation,controlbandwidthmax}.py.

Deliberate divergence from a reference defect (SURVEY.md §2.6):
``ControlArea`` does not crash when ``max_control_norms is None`` (the
reference's ``normalized_control`` typo, controlarea.py:58).
"""

import numpy as np

import jax.numpy as jnp

from qoc_tpu.models import Cost

__all__ = ["ControlNorm", "ControlArea", "ControlVariation",
           "ControlBandwidthMax"]


class ControlNorm(Cost):
    """Mean squared modulus of the (optionally normalized, weighted)
    controls (reference controlnorm.py:11-73)."""
    name = "control_norm"
    requires_step_evaluation = False

    def __init__(self, control_count, control_eval_count,
                 control_weights=None, cost_multiplier=1.0,
                 max_control_norms=None):
        super().__init__(cost_multiplier=cost_multiplier)
        self.control_weights = (np.asarray(control_weights)
                                if control_weights is not None else None)
        self.controls_size = control_eval_count * control_count
        self.max_control_norms = (np.asarray(max_control_norms)
                                  if max_control_norms is not None else None)

    def cost(self, controls, states, system_eval_step):
        if self.max_control_norms is not None:
            controls = controls / self.max_control_norms
        if self.control_weights is not None:
            controls = controls * self.control_weights
        total = jnp.sum(jnp.real(controls * jnp.conjugate(controls)))
        return (total / self.controls_size) * self.cost_multiplier


class ControlArea(Cost):
    """Modulus of the discrete integral of each control channel
    (reference controlarea.py:11-67, with its NameError fixed)."""
    name = "control_area"
    requires_step_evaluation = False

    def __init__(self, control_count, control_eval_count,
                 cost_multiplier=1.0, max_control_norms=None):
        super().__init__(cost_multiplier=cost_multiplier)
        self.control_count = control_count
        self.control_size = control_count * control_eval_count
        self.max_control_norms = (np.asarray(max_control_norms)
                                  if max_control_norms is not None else None)

    def cost(self, controls, states, system_eval_step):
        if self.max_control_norms is not None:
            normalized_controls = controls / self.max_control_norms
        else:
            normalized_controls = controls
        # sum over time per channel, modulus, sum over channels.
        total = jnp.sum(jnp.abs(jnp.sum(normalized_controls, axis=0)))
        return (total / self.control_size) * self.cost_multiplier


class ControlVariation(Cost):
    """Squared modulus of order-n differences of the controls along time
    (reference controlvariation.py:11-75)."""
    name = "control_variation"
    requires_step_evaluation = False

    def __init__(self, control_count, control_eval_count,
                 cost_multiplier=1.0, max_control_norms=None, order=1):
        super().__init__(cost_multiplier=cost_multiplier)
        self.max_control_norms = (np.asarray(max_control_norms)
                                  if max_control_norms is not None else None)
        self.diffs_size = control_count * (control_eval_count - order)
        self.order = order
        # |delta|^2 <= 2^order for unit-modulus-bounded controls (triangle
        # inequality), hence the 2^order normalization.
        self.cost_normalization_constant = self.diffs_size * (2 ** order)

    def cost(self, controls, states, system_eval_step):
        if self.max_control_norms is not None:
            normalized_controls = controls / self.max_control_norms
        else:
            normalized_controls = controls
        diffs = jnp.diff(normalized_controls, axis=0, n=self.order)
        total = jnp.sum(jnp.real(diffs * jnp.conjugate(diffs)))
        return (total / self.cost_normalization_constant
                ) * self.cost_multiplier


class ControlBandwidthMax(Cost):
    """Penalize spectral weight of each control above its maximum bandwidth.

    FFT per channel; frequencies >= max_bandwidth (positive side only,
    matching the reference's ``freqs >= max_bandwidth`` selection,
    controlbandwidthmax.py:70) are summed and normalized by their count and
    peak (reference :67-75). The penalized index sets are static (computed
    from fftfreq at construction), so the jitted cost is a fixed gather +
    reduction.

    Deliberate divergence from a reference defect (docs/migration.md): a
    channel whose ``max_bandwidth`` is at or above the Nyquist frequency
    has an EMPTY penalty set and contributes zero cost here; the reference
    crashes on the empty reduction (``zero-size array to reduction
    operation``, controlbandwidthmax.py:70-75).
    """
    name = "control_bandwidth_max"
    requires_step_evaluation = False

    def __init__(self, control_count, control_eval_count, evolution_time,
                 max_bandwidths, cost_multiplier=1.0):
        super().__init__(cost_multiplier=cost_multiplier)
        self.max_bandwidths = np.asarray(max_bandwidths)
        self.control_count = control_count
        dt = evolution_time / (control_eval_count - 1)
        self.freqs = np.fft.fftfreq(control_eval_count, d=dt)
        self.penalty_indices = [
            np.nonzero(self.freqs >= float(max_bandwidth))[0]
            for max_bandwidth in self.max_bandwidths
        ]

    def cost(self, controls, states, system_eval_step):
        total = 0.0
        for i, indices in enumerate(self.penalty_indices):
            if indices.size == 0:
                # Bound at/above Nyquist: nothing to penalize (see class
                # docstring — the reference crashes here).
                continue
            control_fft_sq = jnp.abs(jnp.fft.fft(controls[:, i]))
            penalized = control_fft_sq[jnp.asarray(indices)]
            penalty = jnp.sum(penalized)
            penalty_normalized = penalty / (indices.shape[0]
                                            * jnp.max(penalized))
            total = total + penalty_normalized
        return (total / self.control_count) * self.cost_multiplier
