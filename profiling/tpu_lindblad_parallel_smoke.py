"""TPU smoke: the new Lindblad parallel layer on the real chip (1 device).

Drives grape_lindblad_ensemble (fused superoperator chain) and
grape_lindblad_multistart through the public API on the axon TPU and
reports iteration rates. Single-device mesh — the sharding collapses to
identity, but the fused kernels and the device-resident runner run for
real on hardware.
"""
import time

import numpy as np

import qoc_tpu  # noqa: F401  (configures the axon workarounds)
from qoc_tpu import (ConstantLindblad, EnsembleLinearHamiltonian,
                     grape_lindblad_ensemble, grape_lindblad_multistart)
from qoc_tpu.models import LindbladMethod
from qoc_tpu.optim import Adam
from qoc_tpu.standard import (SIGMA_Z, TargetDensityInfidelity,
                              get_annihilation_operator)

D = 8          # Hilbert dim -> 64-dim superoperators (one MXU tile padded)
N_MEMBERS = 4
STEPS = 200

rng = np.random.default_rng(0)
h0 = np.diag(np.arange(D).astype(float))
a = get_annihilation_operator(D)
ops = np.stack((a + a.conj().T,))
ens_ham = EnsembleLinearHamiltonian(h0, ops, [h0])
members = np.linspace(-0.02, 0.02, N_MEMBERS).reshape(-1, 1)
dens0 = np.zeros((1, D, D), dtype=complex)
dens0[0, 0, 0] = 1.0
denst = np.zeros((1, D, D), dtype=complex)
denst[0, 1, 1] = 1.0
lb = ConstantLindblad(np.array([1e-3]), np.stack([a]))
costs = [TargetDensityInfidelity(denst)]

print("=== grape_lindblad_ensemble (fused superop chain) ===", flush=True)
t0 = time.perf_counter()
res = grape_lindblad_ensemble(
    1, 51, costs, 10.0, ens_ham, members, dens0, STEPS + 1,
    complex_controls=True, iteration_count=30, lindblad_data=lb,
    log_iteration_step=10, method=LindbladMethod.MAGNUS_EXPM,
    optimizer=Adam(learning_rate=0.01))
t1 = time.perf_counter()
print("best_error={:.6f} iters/s={:.2f} wall={:.1f}s".format(
    float(res.best_error), res.iterations_per_s or -1, t1 - t0), flush=True)
assert np.isfinite(res.best_error)
assert res.best_final_densities.shape == (N_MEMBERS, 1, D, D)

print("=== grape_lindblad_multistart (16 candidates) ===", flush=True)
t0 = time.perf_counter()
ms = grape_lindblad_multistart(
    1, 51, costs, 10.0, dens0, STEPS + 1, n_starts=16,
    complex_controls=True, iteration_count=20, hamiltonian=ens_ham,
    hamiltonian_params=members, lindblad_data=lb, log_iteration_step=5,
    method=LindbladMethod.MAGNUS_EXPM, optimizer=Adam(learning_rate=0.01),
    fused_chunk=5)
t1 = time.perf_counter()
print("best_error={:.6f} cand-iters/s={:.1f} wall={:.1f}s".format(
    float(ms.best_error), ms.iterations_per_s or -1, t1 - t0), flush=True)
assert ms.errors.shape == (16,)
assert np.isfinite(ms.best_error)
print("TPU LINDBLAD PARALLEL SMOKE: ALL OK", flush=True)
