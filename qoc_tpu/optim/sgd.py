"""Stochastic gradient descent.

Parity with /root/reference/qoc/standard/optimizers/sgd.py:7-59.
"""

__all__ = ["SGD"]


class SGD:
    name = "sgd"
    supports_fused = True

    def __init__(self, learning_rate=1e-3):
        self.learning_rate = learning_rate

    def __str__(self):
        return "{}, lr: {}".format(self.name, self.learning_rate)

    def run(self, function, iteration_count, initial_params, jacobian,
            args=()):
        params = initial_params
        for _ in range(iteration_count):
            grads, terminate = jacobian(params, *args)
            if terminate:
                break
            params = self.update(grads, params)

    def update(self, grads, params):
        return params - self.learning_rate * grads

    def init_state(self, params):
        return {}

    def update_jax(self, state, grads, params):
        return state, params - self.learning_rate * grads

    def state_dict(self):
        return {}

    def load_state_dict(self, state):
        pass
