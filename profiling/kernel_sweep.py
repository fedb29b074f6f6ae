"""Chain-kernel experiments on the headline shapes (d=64, 21 basis terms,
10^4 steps): segment-count sweep + generator-build isolation.

Questions:
1. Does raising/lowering _SEGMENTS (independent interleaved chains per grid
   step) change MXU occupancy? (8 today)
2. How much of the per-grid-step time is the _build_m einsum
   ("sk,kab->sab", 21 terms — potentially VPU-bound) vs the Taylor dots?

Run: PYTHONPATH=/root/repo:/root/.axon_site python scratch/kernel_sweep.py
"""
import time
import os

os.environ.setdefault("QOC_TPU_MXU_PRECISION", "bf16_3x")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import bench
from qoc_tpu.ops import chain_pallas as cp

D, C = bench.D, bench.CONTROL_COUNT
T = bench.SYSTEM_EVAL_COUNT
N = 10

pstate, hamiltonian, *_ = bench._bench_problem(
    D, C, bench.CONTROL_EVAL_COUNT, T, bench.EVOLUTION_TIME)
dt = float(pstate.dt)
basis = hamiltonian.generator_basis(dt).astype(np.complex64)
n_b = basis.shape[0]
n_steps = T - 1
block, _ = cp.chain_block_plan(D, n_steps)
n_blocks = -(-n_steps // block)
pad = n_blocks * block - n_steps

rng = np.random.default_rng(1)
# Weight scale chosen to land in the same degree-12 ladder rung as the
# bench (norm ~0.7).
w_np = np.zeros((n_blocks * block, n_b), dtype=np.float32)
w_np[:n_steps, 0] = 1.0
w_np[:n_steps, 1:] = rng.normal(scale=0.05, size=(n_steps, n_b - 1))
w_blocks = jnp.asarray(w_np.reshape(n_blocks, block, n_b))


def timed(fn, *args, n=N, pull=lambda r: float(r)):
    r = fn(*args)
    pull(r)
    start = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
    pull(r)
    return (time.perf_counter() - start) / n


def build_and_time(tag):
    fused = cp.make_chain_expm_propagate(basis)

    @jax.jit
    def fwd(w):
        def body(total, wb):
            return fused(wb) @ total, None
        total, _ = jax.lax.scan(body, jnp.eye(D, dtype=jnp.complex64), w)
        return jnp.sum(jnp.abs(total) ** 2)

    fb = jax.jit(jax.value_and_grad(fwd))
    t_f = timed(fwd, w_blocks)
    t_b = timed(fb, w_blocks, pull=lambda r: float(r[0]))
    print("{:24s}: fwd {:7.2f} ms   fwd+bwd {:7.2f} ms".format(
        tag, t_f * 1e3, t_b * 1e3), flush=True)
    return t_f, t_b


print("headline shapes: d={} n_b={} steps={} block={} blocks={}".format(
    D, n_b, n_steps, block, n_blocks), flush=True)

orig_segments = cp._SEGMENTS
if os.environ.get("QOC_SWEEP_SEGMENTS", "1") == "1":
    for segs in (4, 8, 16):
        cp._SEGMENTS = segs
        build_and_time("segments={}".format(segs))
    cp._SEGMENTS = orig_segments

# ---- generator-build isolation -------------------------------------------
# A stripped kernel: per grid step ONLY _build_m (no Taylor, no chain dot).
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from qoc_tpu.ops.chain_pallas import (_basis_stacks, _build_m, _reorder,
                                      _pallas_call, _struct)


def buildm_only(w, emb, dp, segments):
    w_ord, length, bp = _reorder(w[None].astype(jnp.float32), segments)
    n_members = 1

    def kernel(w_ref, basis_ref, out_ref):
        m_all = _build_m(w_ref[0, 0], basis_ref)
        out_ref[0, 0] = m_all[:, :dp, :dp]

    w_spec = pl.BlockSpec((1, 1, segments, n_b), lambda m, t: (m, t, 0, 0),
                          memory_space=pltpu.VMEM)
    basis_spec = pl.BlockSpec((n_b, 2 * dp, 2 * dp), lambda m, t: (0, 0, 0),
                              memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, 1, segments, dp, dp),
                            lambda m, t: (m, t, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    return _pallas_call(
        kernel, grid=(n_members, length),
        in_specs=[w_spec, basis_spec],
        out_specs=out_spec,
        out_shape=_struct((n_members, length, segments, dp, dp), w_ord),
    )(w_ord, emb)


w_flat = jnp.asarray(w_np)
dp = -(-D // cp._ALIGN) * cp._ALIGN


@jax.jit
def run_buildm(w):
    # _basis_stacks runs INSIDE the jit: the complex basis stays a host
    # numpy constant until trace time (eager complex ops raise on axon).
    emb, _, _, _ = _basis_stacks(basis)
    out = buildm_only(w, emb, dp, 8)
    return jnp.sum(out)


t_bm = timed(run_buildm, w_flat)
print("build_m only (S=8)      : {:7.2f} ms  ({:.2f} us/grid-step over {} "
      "steps)".format(t_bm * 1e3, t_bm * 1e6 / (n_blocks * block / 8),
                      n_blocks * block // 8), flush=True)
