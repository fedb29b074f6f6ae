"""Plot-module tests: render controls/populations from real save files
(matplotlib Agg backend; asserts files are produced and readable)."""

import os

import numpy as np

import jax.numpy as jnp

from qoc_tpu import evolve_schroedinger_discrete, grape_schroedinger_discrete
from qoc_tpu.plot import (plot_controls, plot_density_population,
                          plot_state_population)
from qoc_tpu import evolve_lindblad_discrete
from qoc_tpu.standard import (SIGMA_Z, TargetStateInfidelity,
                              get_annihilation_operator,
                              get_creation_operator)


def _grape_save_file(tmp_path):
    h0 = np.asarray(SIGMA_Z) / 2
    a = get_annihilation_operator(2)
    ad = get_creation_operator(2)
    hamiltonian = lambda c, t: (h0 + c[0] * a + jnp.conjugate(c[0]) * ad)
    initial = np.array([[[1.0], [0.0]]])
    target = np.array([[[0.0], [1.0]]])
    path = str(tmp_path / "00000_plot.h5")
    grape_schroedinger_discrete(
        1, 7, [TargetStateInfidelity(target)], 5, hamiltonian, initial, 7,
        complex_controls=True, iteration_count=6, log_iteration_step=0,
        save_file_path=path, save_iteration_step=2,
        save_intermediate_states=True)
    return path


def test_plot_controls_and_state_population(tmp_path):
    h5 = _grape_save_file(tmp_path)
    png1 = str(tmp_path / "controls.png")
    plot_controls(h5, save_file_path=png1)
    assert os.path.getsize(png1) > 0
    png2 = str(tmp_path / "pops.png")
    plot_state_population(h5, save_file_path=png2)
    assert os.path.getsize(png2) > 0


def test_plot_density_population(tmp_path):
    gamma = 0.1
    a = get_annihilation_operator(2)
    lindblad_data = lambda t: (np.array([gamma]), np.stack([a]))
    rho0 = np.array([[[0.0, 0.0], [0.0, 1.0]]], dtype=complex)
    h5 = str(tmp_path / "00000_lind.h5")
    evolve_lindblad_discrete(1.0, rho0, 5, lindblad_data=lindblad_data,
                             save_file_path=h5,
                             save_intermediate_densities=True)
    png = str(tmp_path / "dens.png")
    plot_density_population(h5, save_file_path=png)
    assert os.path.getsize(png) > 0


def test_plot_missing_intermediates_raises(tmp_path):
    h0 = np.asarray(SIGMA_Z) / 2
    hamiltonian = lambda c, t: h0 + c[0] * np.eye(2)
    initial = np.array([[[1.0], [0.0]]])
    path = str(tmp_path / "00000_noint.h5")
    controls = np.full((5, 1), 0.1)
    evolve_schroedinger_discrete(1.0, hamiltonian, initial, 5,
                                 controls=controls, save_file_path=path)
    try:
        plot_state_population(path)
        raised = False
    except ValueError:
        raised = True
    assert raised


def test_live_plotting_during_optimization(tmp_path):
    # The reference's designed use: a second process plots while the
    # optimization is writing (tutorial.py:240-243). Exercise the FileLock
    # coordination by plotting concurrently with a running GRAPE.
    import threading

    h0 = np.asarray(SIGMA_Z) / 2
    a = get_annihilation_operator(2)
    ad = get_creation_operator(2)
    hamiltonian = lambda c, t: (h0 + c[0] * a + jnp.conjugate(c[0]) * ad)
    initial = np.array([[[1.0], [0.0]]])
    target = np.array([[[0.0], [1.0]]])
    path = str(tmp_path / "00000_live.h5")

    def optimize():
        grape_schroedinger_discrete(
            1, 7, [TargetStateInfidelity(target)], 5, hamiltonian, initial,
            7, complex_controls=True, iteration_count=40,
            log_iteration_step=0, save_file_path=path, save_iteration_step=1)

    worker = threading.Thread(target=optimize)
    worker.start()
    rendered = 0
    errors = []
    while worker.is_alive():
        if os.path.exists(path):
            try:
                plot_controls(path,
                              save_file_path=str(tmp_path / "live.png"))
                rendered += 1
            except Exception as exc:  # pragma: no cover
                errors.append(exc)
    worker.join()
    plot_controls(path, save_file_path=str(tmp_path / "live.png"))
    assert not errors
    assert os.path.getsize(str(tmp_path / "live.png")) > 0
