"""Cost function base class.

Parity with /root/reference/qoc/models/cost.py:5-51. Concrete costs are pure
jax-traceable functions of (controls, states, system_eval_step); any data they
need (targets, normalization constants) is precomputed at construction time so
the per-step work is pure device math.
"""

__all__ = ["Cost"]


class Cost:
    """Base class for GRAPE cost functions.

    Fields:
    cost_multiplier :: float - weight of this cost in the total error.
    name :: str - identifier.
    requires_step_evaluation :: bool - True if the cost must be evaluated at
        every cost evaluation step (e.g. occupation penalties), False if only
        at the end of evolution (e.g. target infidelity).
    """
    name = "parent_cost"
    requires_step_evaluation = False

    def __init__(self, cost_multiplier=1.0):
        self.cost_multiplier = cost_multiplier

    def __str__(self):
        return self.name

    def cost(self, controls, states, system_eval_step):
        """Compute the penalty (a real scalar, jax-traceable).

        Arguments:
        controls :: array (control_eval_count, control_count) or None.
        states :: array - evolving states (K, d, 1) or densities (K, d, d).
        system_eval_step :: int - current step index (may be a tracer).
        """
        raise NotImplementedError("The cost {} has not implemented "
                                  "an evaluation method.".format(self))
