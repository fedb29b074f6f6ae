"""L-BFGS-B via scipy, driving the jitted device loss/grad.

Parity with /root/reference/qoc/standard/optimizers/lbfgsb.py:7-49: a thin
``scipy.optimize.minimize(method="L-BFGS-B")`` wrapper over the same
``run(function, iteration_count, initial_params, jacobian, args)`` interface.
scipy's line search runs on host and schedules loss/gradient evaluations on
its own cadence; each evaluation is a single jitted device dispatch.

Like the reference, the per-iteration ``terminate`` flag is discarded
(``min_error`` is not supported under L-BFGS-B, reference lbfgsb.py:39-42).
"""

from scipy.optimize import minimize

__all__ = ["LBFGSB"]


class LBFGSB:
    name = "lbfgsb"
    supports_fused = False

    def __init__(self, **minimize_options):
        self.minimize_options = minimize_options

    def __str__(self):
        return self.name

    def run(self, function, iteration_count, initial_params, jacobian,
            args=()):
        function_ = lambda *a, **k: function(*a, **k)[0]
        jacobian_ = lambda *a, **k: jacobian(*a, **k)[0]
        options = {"maxiter": iteration_count}
        options.update(self.minimize_options)
        return minimize(function_, initial_params, args=args,
                        method="L-BFGS-B", jac=jacobian_, options=options)
