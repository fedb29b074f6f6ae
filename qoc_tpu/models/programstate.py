"""Program-state containers for the four entry points.

Parity with /root/reference/qoc/models/{programstate,schroedingermodels,
lindbladmodels}.py, with the I/O responsibilities extracted into
``qoc_tpu.io.h5.H5Checkpointer`` (the reference writes H5 from inside these
classes — SURVEY.md §1 notes the inversion).

These objects are *static* configuration: everything a jitted loss closes
over. Traced data (controls, states) flows through function arguments.
"""

import numpy as np

from qoc_tpu.models.cost import validate_cost_dimensions
from qoc_tpu.models.policies import ProgramType
from qoc_tpu.io.h5 import H5Checkpointer

__all__ = [
    "ProgramState",
    "GrapeState",
    "EvolveSchroedingerDiscreteState",
    "GrapeSchroedingerDiscreteState",
    "EvolveLindbladDiscreteState",
    "GrapeLindbladDiscreteState",
]


class ProgramState:
    """Shared configuration (reference programstate.py:11-61)."""

    def __init__(self, control_eval_count, cost_eval_step, costs,
                 evolution_time, hamiltonian, interpolation_policy,
                 program_type, save_file_path, system_eval_count):
        self.control_eval_count = control_eval_count
        if control_eval_count:
            self.control_eval_times = np.linspace(0, evolution_time,
                                                  control_eval_count)
        else:
            self.control_eval_times = None
        self.cost_eval_step = cost_eval_step
        self.costs = costs
        self.dt = evolution_time / (system_eval_count - 1)
        self.evolution_time = evolution_time
        self.final_system_eval_step = system_eval_count - 1
        self.hamiltonian = hamiltonian
        self.interpolation_policy = interpolation_policy
        self.program_type = program_type
        self.save_file_path = save_file_path
        self.checkpointer = (H5Checkpointer(save_file_path)
                             if save_file_path is not None else None)
        self.system_eval_count = system_eval_count
        self.step_costs = []
        self.step_cost_indices = []
        for i, cost in enumerate(costs):
            if cost.requires_step_evaluation:
                self.step_costs.append(cost)
                self.step_cost_indices.append(i)


class GrapeState(ProgramState):
    """Optimization-specific configuration (reference programstate.py:64-134)."""

    def __init__(self, complex_controls, control_count, control_eval_count,
                 cost_eval_step, costs, evolution_time, hamiltonian,
                 impose_control_conditions, initial_controls,
                 interpolation_policy, iteration_count, log_iteration_step,
                 max_control_norms, min_error, optimizer, save_file_path,
                 save_iteration_step, system_eval_count):
        super().__init__(control_eval_count, cost_eval_step, costs,
                         evolution_time, hamiltonian, interpolation_policy,
                         ProgramType.GRAPE, save_file_path, system_eval_count)
        self.complex_controls = complex_controls
        self.control_count = control_count
        self.controls_shape = (control_eval_count, control_count)
        self.final_iteration = iteration_count - 1
        self.impose_control_conditions = impose_control_conditions
        self.initial_controls = initial_controls
        self.iteration_count = iteration_count
        self.log_iteration_step = log_iteration_step
        self.max_control_norms = max_control_norms
        self.min_error = min_error
        self.optimizer = optimizer
        self.save_iteration_step = save_iteration_step
        # Logging is host-side only, so gating it on the I/O process keeps
        # the compiled SPMD program identical across hosts while silencing
        # duplicate rows. should_save is NOT gated — it shapes the traced
        # computation (row collection, states_fn) which must match on every
        # process; the H5Checkpointer's writes no-op off process 0 instead.
        from qoc_tpu.config import is_io_process
        self.should_log = log_iteration_step != 0 and is_io_process()
        self.should_save = (save_iteration_step != 0
                            and save_file_path is not None)

    def _save_count(self):
        """Number of preallocated H5 rows (reference
        schroedingermodels.py:266-271)."""
        save_count, remainder = np.divmod(self.iteration_count,
                                          self.save_iteration_step)
        if remainder != 0:
            save_count += 1
        return int(save_count)

    def log_and_save_initial(self):
        if self.should_save:
            if self.checkpointer._writes_enabled:
                print("QOC is saving this optimization run to {}."
                      "".format(self.save_file_path))
            # Resuming into the same file: keep the preallocated schema and
            # fill its remaining rows in place (io/resume.py:apply_resume).
            if not getattr(self, "resuming_same_file", False):
                self.checkpointer.create_grape_file(self, self._save_count())
        if self.should_log:
            print("iter   |   total error  |    grads_l2   \n"
                  "=========================================")

    def log_and_save(self, controls, error, final_evolved, grads, iteration,
                     evolved_key):
        """Stdout row + H5 row on the configured cadences (reference
        schroedingermodels.py:209-256)."""
        if iteration > self.final_iteration:
            return
        is_final_iteration = iteration == self.final_iteration
        if (self.should_log
                and (np.mod(iteration, self.log_iteration_step) == 0
                     or is_final_iteration)):
            grads_norm = np.linalg.norm(np.asarray(grads))
            print("{:^6d} | {:^1.8e} | {:^1.8e}"
                  "".format(iteration, float(error), grads_norm))
        if (self.should_save
                and (np.mod(iteration, self.save_iteration_step) == 0
                     or is_final_iteration)):
            save_step, _ = np.divmod(iteration, self.save_iteration_step)
            self.checkpointer.save_grape_iteration(
                int(save_step), controls, error, final_evolved, grads,
                evolved_key)


class EvolveSchroedingerDiscreteState(ProgramState):
    """Reference schroedingermodels.py:15-110."""
    method = "evolve_schroedinger_discrete"

    def __init__(self, control_eval_count, cost_eval_step, costs,
                 evolution_time, hamiltonian, initial_states,
                 interpolation_policy, magnus_policy, save_file_path,
                 save_intermediate_states_, system_eval_count):
        super().__init__(control_eval_count, cost_eval_step, costs,
                         evolution_time, hamiltonian, interpolation_policy,
                         ProgramType.EVOLVE, save_file_path,
                         system_eval_count)
        self.initial_states = initial_states
        validate_cost_dimensions(costs, np.asarray(initial_states).shape[-2])
        self.magnus_policy = magnus_policy
        self.save_intermediate_states_ = (save_file_path is not None
                                          and save_intermediate_states_)

    def save_initial(self, controls):
        if self.save_file_path is not None:
            if self.checkpointer._writes_enabled:
                print("QOC is saving this evolution to {}."
                      "".format(self.save_file_path))
            self.checkpointer.create_evolve_file(self, controls)

    def save_intermediate_states(self, states_stack):
        """Write the full (system_eval_count, K, d, 1) stack at once.

        The reference writes step-by-step from inside the hot loop
        (schroedingermodels.py:97-110); qoc_tpu materializes the stack as a
        scan output on device and writes it once — no host round-trips inside
        the propagation.
        """
        if self.save_intermediate_states_:
            self.checkpointer.save_intermediate(
                "intermediate_states", slice(None), states_stack)


class GrapeSchroedingerDiscreteState(GrapeState):
    """Reference schroedingermodels.py:134-344."""
    method = "grape_schroedinger_discrete"

    def __init__(self, complex_controls, control_count, control_eval_count,
                 cost_eval_step, costs, evolution_time, hamiltonian,
                 impose_control_conditions, initial_controls, initial_states,
                 interpolation_policy, iteration_count, log_iteration_step,
                 max_control_norms, magnus_policy, min_error, optimizer,
                 save_file_path, save_intermediate_states_,
                 save_iteration_step, system_eval_count):
        super().__init__(complex_controls, control_count, control_eval_count,
                         cost_eval_step, costs, evolution_time, hamiltonian,
                         impose_control_conditions, initial_controls,
                         interpolation_policy, iteration_count,
                         log_iteration_step, max_control_norms, min_error,
                         optimizer, save_file_path, save_iteration_step,
                         system_eval_count)
        self.hilbert_size = initial_states[0].shape[0]
        self.initial_states = initial_states
        validate_cost_dimensions(costs, np.asarray(initial_states).shape[-2])
        self.magnus_policy = magnus_policy
        self.save_intermediate_states_ = (self.should_save
                                          and save_intermediate_states_)

    def save_intermediate_states(self, iteration, states_stack):
        if iteration > self.final_iteration or not self.save_intermediate_states_:
            return
        is_final_iteration = iteration == self.final_iteration
        if (np.mod(iteration, self.save_iteration_step) == 0
                or is_final_iteration):
            save_step, _ = np.divmod(iteration, self.save_iteration_step)
            self.checkpointer.save_intermediate(
                "intermediate_states", int(save_step), states_stack)


class EvolveLindbladDiscreteState(ProgramState):
    """Reference lindbladmodels.py:14-103."""
    method = "evolve_lindblad_discrete"

    def __init__(self, control_eval_count, cost_eval_step, costs,
                 evolution_time, hamiltonian, initial_densities,
                 interpolation_policy, lindblad_data, save_file_path,
                 save_intermediate_densities_, system_eval_count):
        super().__init__(control_eval_count, cost_eval_step, costs,
                         evolution_time, hamiltonian, interpolation_policy,
                         ProgramType.EVOLVE, save_file_path,
                         system_eval_count)
        self.initial_densities = initial_densities
        validate_cost_dimensions(costs,
                                 np.asarray(initial_densities).shape[-1])
        self.lindblad_data = lindblad_data
        self.save_intermediate_densities_ = (save_intermediate_densities_
                                             and save_file_path is not None)

    def save_initial(self, controls):
        if self.save_file_path is not None:
            if self.checkpointer._writes_enabled:
                print("QOC is saving this evolution to {}."
                      "".format(self.save_file_path))
            self.checkpointer.create_evolve_file(self, controls)

    def save_intermediate_densities(self, densities_stack):
        if self.save_intermediate_densities_:
            self.checkpointer.save_intermediate(
                "intermediate_densities", slice(None), densities_stack)


class GrapeLindbladDiscreteState(GrapeState):
    """Reference lindbladmodels.py:125-339."""
    method = "grape_lindblad_discrete"

    def __init__(self, complex_controls, control_count, control_eval_count,
                 cost_eval_step, costs, evolution_time, hamiltonian,
                 impose_control_conditions, initial_controls,
                 initial_densities, interpolation_policy, iteration_count,
                 lindblad_data, log_iteration_step, max_control_norms,
                 min_error, optimizer, save_file_path,
                 save_intermediate_densities_, save_iteration_step,
                 system_eval_count):
        super().__init__(complex_controls, control_count, control_eval_count,
                         cost_eval_step, costs, evolution_time, hamiltonian,
                         impose_control_conditions, initial_controls,
                         interpolation_policy, iteration_count,
                         log_iteration_step, max_control_norms, min_error,
                         optimizer, save_file_path, save_iteration_step,
                         system_eval_count)
        self.hilbert_size = initial_densities[0].shape[0]
        self.initial_densities = initial_densities
        validate_cost_dimensions(costs,
                                 np.asarray(initial_densities).shape[-1])
        self.lindblad_data = lindblad_data
        self.save_intermediate_densities_ = (self.should_save
                                             and save_intermediate_densities_)

    def save_intermediate_densities(self, iteration, densities_stack):
        if (iteration > self.final_iteration
                or not self.save_intermediate_densities_):
            return
        is_final_iteration = iteration == self.final_iteration
        if (np.mod(iteration, self.save_iteration_step) == 0
                or is_final_iteration):
            save_step, _ = np.divmod(iteration, self.save_iteration_step)
            self.checkpointer.save_intermediate(
                "intermediate_densities", int(save_step), densities_stack)
