"""TPU drive: LBFGS through the public API on the fused-chain workload.

Validates that the needs_loss iteration step (1 value_and_grad + ls_steps
forward losses of the Pallas chain kernel in ONE jit) compiles on the axon
tunnel and converges, and measures its per-iteration cost vs Adam.
"""
import time
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from qoc_tpu import grape_schroedinger_discrete
from qoc_tpu.models import LinearHamiltonian
from qoc_tpu.optim import LBFGS, Adam
from qoc_tpu.standard import TargetStateInfidelity

rng = np.random.default_rng(0)
d, nc, steps = 64, 10, 2001


def herm():
    h = rng.normal(size=(d, d)) + 1j * rng.normal(size=(d, d))
    return ((h + h.conj().T) / 2).astype(np.complex64)


ham = LinearHamiltonian(herm(), np.stack([herm() for _ in range(nc)]))
ini = np.zeros((1, d, 1)); ini[0, 0] = 1
tgt = np.zeros((1, d, 1)); tgt[0, -1] = 1
costs = [TargetStateInfidelity(tgt)]

for name, opt, iters in (("adam", Adam(), 40), ("lbfgs", LBFGS(), 40)):
    t0 = time.perf_counter()
    res = grape_schroedinger_discrete(
        nc, steps, costs, 20.0, ham, ini, steps, complex_controls=True,
        iteration_count=iters, log_iteration_step=10, optimizer=opt,
        min_error=1e-5, fused_chunk=10)
    dt_ = time.perf_counter() - t0
    print("{}: best_error={:.3e} at iter {} of {} ran, wall {:.1f}s, "
          "{:.2f} it/s".format(name, res.best_error, res.best_iteration,
                               res.iteration_count_ran, dt_,
                               res.iterations_per_s or 0))
