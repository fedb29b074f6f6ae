"""Example scripts stay importable and API-consistent (module-level setup
only; heavy main() loops are exercised in docs/verify flows)."""

import importlib
import sys
import os

EXAMPLES_DIR = os.path.join(os.path.dirname(__file__), "..", "examples")


def _import_example(name):
    sys.path.insert(0, EXAMPLES_DIR)
    try:
        if name in sys.modules:
            return importlib.reload(sys.modules[name])
        return importlib.import_module(name)
    finally:
        sys.path.pop(0)


def test_examples_import():
    for name in ("0_transmon_pi", "1_transmon_pi_decoherence", "tutorial",
                 "2_iswap_gate", "3_ensemble_robust", "4_cavity_transfer",
                 "5_multistart_robust"):
        module = _import_example(name)
        assert hasattr(module, "main")
        assert callable(module.hamiltonian)


def test_transmon_example_runs_short(tmp_path, monkeypatch):
    module = _import_example("0_transmon_pi")
    result = module.grape_schroedinger_discrete(
        module.CONTROL_COUNT, module.CONTROL_EVAL_COUNT, module.COSTS,
        module.EVOLUTION_TIME, module.hamiltonian, module.INITIAL_STATES,
        module.SYSTEM_EVAL_COUNT, complex_controls=True, iteration_count=5,
        log_iteration_step=0)
    assert result.best_error < 1.0
