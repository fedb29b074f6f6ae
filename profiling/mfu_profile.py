"""MFU profile of the headline workload (VERDICT r2 #10).

Decomposes the d=64 / 10-control / 10^4-step GRAPE iteration into
  (a) the full train step (loss + exact grad + Adam)   — what bench.py times
  (b) the forward-only loss
  (c) the fused chain kernel alone, forward             (same blocks/weights)
  (d) the fused chain kernel alone, forward + backward
so the per-iteration XLA glue (weight interpolation, segment merges,
adjoint seeds, cost, optimizer) is (a) - (d), and publishes a measured MFU
from the kernel's static per-step matmul count at the dispatched Taylor
degree.

Run on the axon TPU:  PYTHONPATH=/root/repo:/root/.axon_site python ...
"""
import time

import numpy as np

import os
os.environ.setdefault("QOC_TPU_MXU_PRECISION", "bf16_3x")  # bench mode

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import bench
from qoc_tpu.ops.chain_pallas import chain_block_plan, make_chain_expm_propagate
from qoc_tpu.ops.chain_pallas import _exact_norm_max, _ladder_index, _F32_LADDER
from qoc_tpu.ops.interpolate import interpolate_linear_set
from qoc_tpu.core.common import strip_controls

D, C, T = bench.D, bench.CONTROL_COUNT, bench.SYSTEM_EVAL_COUNT
N_TIMED = 20

pstate, hamiltonian, initial, costs, initial_controls, _ = \
    bench._bench_problem(D, C, bench.CONTROL_EVAL_COUNT, T,
                         bench.EVOLUTION_TIME)
dt = float(pstate.dt)
n_steps = T - 1
block, remat = chain_block_plan(D, n_steps)
n_blocks = -(-n_steps // block)
pad = n_blocks * block - n_steps
basis = hamiltonian.generator_basis(dt).astype(np.complex64)
n_b = basis.shape[0]
print("block={} remat={} n_blocks={} pad={} n_b={}".format(
    block, remat, n_blocks, pad, n_b), flush=True)

# The exact weight rows of the bench loss (fused_weights in
# core/schroedinger.py), blocked the same way.
cet = np.asarray(pstate.control_eval_times, dtype=np.float32)
controls = np.asarray(initial_controls).astype(np.complex64)


@jax.jit
def make_weights():
    ks = jnp.arange(1, T)
    ks = jnp.concatenate((ks, jnp.full((pad,), T, dtype=ks.dtype)))
    valid = (ks < T).astype(jnp.float32)
    times = (ks - 1).astype(jnp.float32) * dt
    c_mid = jax.vmap(
        lambda t: interpolate_linear_set(t + dt / 2, jnp.asarray(cet),
                                         jnp.asarray(controls)))(times)
    ones = jnp.ones(c_mid.shape[:-1] + (1,), dtype=jnp.float32)
    ri = jnp.stack((jnp.real(c_mid), jnp.imag(c_mid)), axis=-1)
    ri = ri.reshape(c_mid.shape[:-1] + (2 * C,)).astype(jnp.float32)
    w = jnp.concatenate((ones, ri), axis=-1) * valid[:, None]
    return w.reshape(n_blocks, block, n_b)


w_blocks = make_weights()
n1, ninf = jax.jit(lambda w: _exact_norm_max(w.reshape(-1, n_b)[None],
                                             jnp.asarray(basis)))(w_blocks)
idx_fwd = int(float(jax.jit(lambda x: _ladder_index(x) * 1.0)(n1)))
idx_bwd = int(float(jax.jit(lambda x: _ladder_index(x) * 1.0)(ninf)))
print("norm1_max={:.4f} norminf_max={:.4f} ladder: fwd deg={} bwd deg={}"
      "".format(float(n1), float(ninf),
                _F32_LADDER[idx_fwd][0] if idx_fwd < len(_F32_LADDER) else 19,
                _F32_LADDER[idx_bwd][0] if idx_bwd < len(_F32_LADDER) else 19),
      flush=True)

fused = make_chain_expm_propagate(basis)


@jax.jit
def kernel_fwd(w):
    def body(total, wb):
        return fused(wb) @ total, None
    total, _ = jax.lax.scan(body, jnp.eye(D, dtype=jnp.complex64), w)
    return jnp.sum(jnp.abs(total) ** 2)


kernel_fwdbwd = jax.jit(jax.value_and_grad(kernel_fwd))


def timed(fn, *args, n=N_TIMED, pull=lambda r: float(r)):
    r = fn(*args)
    pull(r)
    start = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
    pull(r)
    return (time.perf_counter() - start) / n


t_kfwd = timed(kernel_fwd, w_blocks)
print("kernel fwd      : {:8.2f} ms".format(t_kfwd * 1e3), flush=True)
t_kfb = timed(kernel_fwdbwd, w_blocks,
              pull=lambda r: float(r[0]))
print("kernel fwd+bwd  : {:8.2f} ms".format(t_kfb * 1e3), flush=True)

# Forward-only loss and the full train step (the bench's timed unit).
from qoc_tpu.core.common import slap_controls_jax
from qoc_tpu.core.schroedinger import build_schroedinger_loss

loss_controls = build_schroedinger_loss(pstate)
shape = pstate.controls_shape
fwd_loss = jax.jit(lambda f: loss_controls(
    slap_controls_jax(True, f, shape))[0])
params0 = jnp.asarray(strip_controls(True, pstate.initial_controls))
t_fwd = timed(fwd_loss, params0)
print("full loss fwd   : {:8.2f} ms".format(t_fwd * 1e3), flush=True)

train_step, params, opt_state = bench._train_step(pstate)


def step_once(_):
    global params, opt_state
    params, opt_state, error = train_step(params, opt_state)
    return error


t_full = timed(step_once, None)
print("full train step : {:8.2f} ms   ({:.2f} it/s)".format(
    t_full * 1e3, 1.0 / t_full), flush=True)

# --- MFU model ------------------------------------------------------------
# Embedded 2dp x 2dp f32 matmuls per time step at Taylor degree k:
#   forward: expm dots (4->2, 8->3, 12->4, 19->7) + 1 chain product
#   backward: 1 recurrence dot + 1 T*P^T dot + 3x expm dots (dual numbers)
DOTS = {4: 2, 8: 3, 12: 4, 19: 7}
deg_f = _F32_LADDER[idx_fwd][0] if idx_fwd < len(_F32_LADDER) else 19
deg_b = _F32_LADDER[idx_bwd][0] if idx_bwd < len(_F32_LADDER) else 19
dots_fwd = DOTS[deg_f] + 1
dots_bwd = 2 + 3 * DOTS[deg_b]
dp2 = 128  # embedded padded dim
flop_dot = 2 * dp2 ** 3
fl_fwd = n_steps * dots_fwd * flop_dot
fl_fb = n_steps * (dots_fwd + dots_bwd) * flop_dot
PEAK_BF16 = 197e12  # v5e
for name, fl, t in (("kernel fwd", fl_fwd, t_kfwd),
                    ("kernel fwd+bwd", fl_fb, t_kfb),
                    ("full step (kernel flops)", fl_fb, t_full)):
    logical = fl / t
    # each logical f32 dot = 3 bf16 MXU passes in bf16_3x mode
    print("{:26s}: {:6.1f} TF/s logical f32, {:6.1f} TF/s bf16-pass "
          "= {:4.1f}% of v5e peak".format(
              name, logical / 1e12, 3 * logical / 1e12,
              100 * 3 * logical / PEAK_BF16), flush=True)
print("glue (full - kernel fwd+bwd): {:.2f} ms = {:.1f}% of the iteration"
      "".format((t_full - t_kfb) * 1e3, 100 * (t_full - t_kfb) / t_full),
      flush=True)
