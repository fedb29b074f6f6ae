"""Decompose the d=2^10 Table-1 step (VERDICT r3 Missing #2, second half).

Times, on the real chip: the full train step, the forward-only loss, a
bare jitted expm forward at d=1024, the exact Fréchet backward, and a raw
complex-matmul ladder (the machine rate all of these are made of). The
goal is a measured statement of whether the XLA Taylor path at d=1024 is
compute-bound (a Pallas kernel cannot win; VMEM cannot hold 2048^2-plane
working sets anyway) or overhead-bound (worth attacking).

Run: PYTHONPATH=/root/repo:/root/.axon_site python profiling/d1024_profile.py
"""

import os
import time

os.environ.setdefault("QOC_TPU_MXU_PRECISION", "bf16_3x")

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

D = 1024
N = 20


@jax.jit
def _scalarize(x):
    # Born-inside-a-jit real f32 scalar: the axon tunnel rejects complex
    # (and lazy complex-intermediate) transfers.
    return jnp.sum(jnp.abs(x)).astype(jnp.float32)


def sync(x):
    return float(_scalarize(x))


def timeit(fn, *args):
    # device_put the (real f32) arguments ONCE: passing host numpy into
    # each call re-transfers megabytes through the tunnel per dispatch and
    # dominates the measurement (a 20-chain 1024^2 matmul read 24 ms/matmul
    # with host args vs the ~0.5 ms compute).
    args = tuple(jax.device_put(a) for a in args)
    out = fn(*args)
    out = fn(*args)
    sync(out if not isinstance(out, tuple) else out[0])
    start = time.perf_counter()
    for _ in range(N):
        out = fn(*args)
    sync(out if not isinstance(out, tuple) else out[0])
    return (time.perf_counter() - start) / N


def main():
    rng = np.random.default_rng(0)

    # All jit arguments are REAL f32 pairs (complex jit arguments raise
    # UNIMPLEMENTED on the axon tunnel); complex is rebuilt on device.
    a64 = (rng.normal(size=(D, D)) + 1j * rng.normal(size=(D, D))).astype(
        np.complex64) * 0.01

    @jax.jit
    def matmul_chain(xr, xi):
        x = xr + 1j * xi
        y = x
        for _ in range(20):
            y = y @ x
        return y

    ar = np.real(a64).astype(np.float32)
    ai = np.imag(a64).astype(np.float32)
    t = timeit(matmul_chain, ar, ai)
    print("complex {d}x{d} matmul (HIGHEST default): {t:.1f} us".format(
        d=D, t=t / 20 * 1e6), flush=True)

    from qoc_tpu.ops.expm import expm, expm_frechet

    # Bench-workload generator: -i H dt with the bench's UNnormalized
    # random Hermitian (1-norm ~ 50 -> scaling-and-squaring regime).
    h = (rng.normal(size=(D, D)) + 1j * rng.normal(size=(D, D)))
    h = ((h + h.conj().T) / 2).astype(np.complex64)
    a_bench = (-1j * 0.05) * h
    n1 = float(np.max(np.abs(a_bench).sum(axis=0)))
    print("bench-workload ||A||_1 = {:.1f}".format(n1), flush=True)

    expm_j = jax.jit(lambda xr, xi: expm((xr + 1j * xi)[None]))
    abr = np.real(a_bench).astype(np.float32)
    abi = np.imag(a_bench).astype(np.float32)
    t_fwd = timeit(expm_j, abr, abi)
    print("expm fwd (bench norm):   {:.2f} ms".format(t_fwd * 1e3),
          flush=True)

    fre_j = jax.jit(lambda xr, xi, gr, gi: expm_frechet(
        (xr + 1j * xi)[None], (gr + 1j * gi)[None]))
    t_bwd = timeit(fre_j, abr, abi, ar, ai)
    print("expm Frechet (bench norm): {:.2f} ms".format(t_bwd * 1e3),
          flush=True)

    # Small-norm regime for comparison (degree ladder, no squarings).
    scale = 0.25 / n1
    t_fwd_s = timeit(expm_j, abr * scale, abi * scale)
    t_bwd_s = timeit(fre_j, abr * scale, abi * scale, ar, ai)
    print("expm fwd (norm 0.25):    {:.2f} ms".format(t_fwd_s * 1e3),
          flush=True)
    print("expm Frechet (norm 0.25): {:.2f} ms".format(t_bwd_s * 1e3),
          flush=True)

    # Full bench train step and forward-only, from bench.py's problem.
    import bench

    pstate, *_ = bench._bench_problem(1024, 10, 2, 2, 0.05)
    step, params, opt_state = bench._train_step(pstate)
    for _ in range(2):
        params, opt_state, error = step(params, opt_state)
    float(error)
    start = time.perf_counter()
    for _ in range(N):
        params, opt_state, error = step(params, opt_state)
    float(error)
    print("full train step:         {:.2f} ms".format(
        (time.perf_counter() - start) / N * 1e3), flush=True)

    from qoc_tpu.core.common import slap_controls_jax
    from qoc_tpu.core.schroedinger import build_schroedinger_loss
    loss = build_schroedinger_loss(pstate, log_path=True)
    shape = pstate.controls_shape

    @jax.jit
    def fwd_only(p):
        return loss(slap_controls_jax(True, p, shape))[0]

    t_loss = timeit(fwd_only, params)
    print("forward-only loss:       {:.2f} ms".format(t_loss * 1e3),
          flush=True)


if __name__ == "__main__":
    main()
