"""Adam optimizer.

Parity with /root/reference/qoc/standard/optimizers/adam.py:9-165 (textbook
Adam with bias correction, plus the reference's extras: exponential
learning-rate decay, gradient norm-rescaling, elementwise gradient clipping,
and per-iteration termination).

Two execution paths:
- ``run``/``update``: host loop on numpy — the reference-parity interface,
  used when a non-traceable ``impose_control_conditions`` hook forces
  per-iteration host work.
- ``init_state``/``update_jax``: a pure pytree step used inside the fused
  on-device ``lax.scan`` optimizer loop (qoc_tpu's fast path), bitwise the
  same update rule.
"""

import jax.numpy as jnp
import numpy as np

__all__ = ["Adam"]


class Adam:
    name = "adam"
    supports_fused = True

    def __init__(self, beta_1=0.9, beta_2=0.999, clip_grads=None,
                 epsilon=1e-8, learning_rate=1e-3, learning_rate_decay=None,
                 operation_policy=None, scale_grads=None):
        self.apply_scale_grads = scale_grads is not None
        self.apply_clip_grads = clip_grads is not None
        self.apply_learning_rate_decay = learning_rate_decay is not None
        self.beta_1 = beta_1
        self.beta_2 = beta_2
        self.clip_grads = clip_grads
        self.epsilon = epsilon
        self.gradient_moment = None
        self.gradient_square_moment = None
        self.initial_learning_rate = learning_rate
        self.iteration_count = 0
        self.learning_rate = learning_rate
        self.learning_rate_decay = learning_rate_decay
        self.scale_grads = scale_grads

    def __str__(self):
        return ("{}, beta_1: {}, beta_2: {}, epsilon: {}, lr0: {}, "
                "lr_decay: {}, clip_grads: {}, scale_grads: {}"
                "".format(self.name, self.beta_1, self.beta_2, self.epsilon,
                          self.initial_learning_rate,
                          self.learning_rate_decay, self.clip_grads,
                          self.scale_grads))

    # -- host path (reference adam.py:83-165) ------------------------------

    def run(self, function, iteration_count, initial_params, jacobian,
            args=()):
        """Minimize ``function``; ``jacobian`` returns (grads, terminate).

        When ``self._warm_start`` is set (by the resume machinery after
        ``load_state_dict``), the moments/step count carried over from the
        checkpoint are kept instead of being re-zeroed; the flag is consumed.
        """
        if getattr(self, "_warm_start", False):
            self._warm_start = False
        else:
            self.iteration_count = 0
            self.gradient_moment = np.zeros_like(initial_params)
            self.gradient_square_moment = np.zeros_like(initial_params)
        params = initial_params
        for _ in range(iteration_count):
            grads, terminate = jacobian(params, *args)
            if terminate:
                break
            params = self.update(grads, params)

    def update(self, grads, params):
        """One host-side Adam update (reference adam.py:110-165)."""
        if self.apply_learning_rate_decay:
            learning_rate = (self.initial_learning_rate
                             * np.exp(-self.iteration_count
                                      / self.learning_rate_decay))
        else:
            learning_rate = self.initial_learning_rate
        if self.apply_scale_grads:
            grads = (grads / np.linalg.norm(grads)) * self.scale_grads
        if self.apply_clip_grads:
            grads = np.clip(grads, -self.clip_grads, self.clip_grads)

        self.iteration_count += 1
        t = self.iteration_count
        b1, b2 = self.beta_1, self.beta_2
        self.gradient_moment = (b1 * self.gradient_moment + (1 - b1) * grads)
        self.gradient_square_moment = (b2 * self.gradient_square_moment
                                       + (1 - b2) * np.square(grads))
        m_hat = self.gradient_moment / (1 - b1 ** t)
        v_hat = self.gradient_square_moment / (1 - b2 ** t)
        return params - learning_rate * m_hat / (np.sqrt(v_hat) + self.epsilon)

    # -- fused on-device path ----------------------------------------------

    def init_state(self, params):
        """Optimizer state pytree for the fused scan."""
        return {
            "m": jnp.zeros_like(params),
            "v": jnp.zeros_like(params),
            "t": jnp.zeros((), dtype=jnp.int32),
        }

    def update_jax(self, state, grads, params):
        """Traced twin of :meth:`update`; state threads through lax.scan."""
        t = state["t"]
        if self.apply_learning_rate_decay:
            learning_rate = (self.initial_learning_rate
                             * jnp.exp(-t.astype(grads.dtype)
                                       / self.learning_rate_decay))
        else:
            learning_rate = self.initial_learning_rate
        if self.apply_scale_grads:
            grads = (grads / jnp.linalg.norm(grads)) * self.scale_grads
        if self.apply_clip_grads:
            grads = jnp.clip(grads, -self.clip_grads, self.clip_grads)

        t = t + 1
        b1, b2 = self.beta_1, self.beta_2
        tf = t.astype(grads.dtype)
        m = b1 * state["m"] + (1 - b1) * grads
        v = b2 * state["v"] + (1 - b2) * jnp.square(grads)
        m_hat = m / (1 - b1 ** tf)
        v_hat = v / (1 - b2 ** tf)
        params = params - learning_rate * m_hat / (jnp.sqrt(v_hat)
                                                   + self.epsilon)
        return {"m": m, "v": v, "t": t}, params

    # -- checkpoint support (qoc_tpu extension) ----------------------------

    def state_dict(self):
        return {
            "gradient_moment": self.gradient_moment,
            "gradient_square_moment": self.gradient_square_moment,
            "iteration_count": np.asarray(self.iteration_count),
        }

    def load_state_dict(self, state):
        self.gradient_moment = np.asarray(state["gradient_moment"])
        self.gradient_square_moment = np.asarray(
            state["gradient_square_moment"])
        self.iteration_count = int(state["iteration_count"])
