"""MFU of the streamed-generator chain kernel (d=300 drive workload).

Times the kernel alone (forward and forward+backward) on the
profiling/stream_drive.py Schrödinger workload's exact weights, reads the
dispatched Taylor degree, and converts the static per-step MXU-pass count
into a measured model-FLOPs utilization of the v5e's 197 TFLOP/s bf16
peak (bf16_3x mode: 3 passes per logical f32 product).

Run: PYTHONPATH=/root/repo:/root/.axon_site python profiling/stream_mfu.py
"""

import os
import time

os.environ.setdefault("QOC_TPU_MXU_PRECISION", "bf16_3x")

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from qoc_tpu.ops.chain_pallas import (_F32_LADDER, _exact_norm_max,
                                      _ladder_index, chain_block_plan,
                                      make_chain_expm_propagate)

D = 300
STEPS = 2001
CONTROLS = 10
V5E_BF16_PEAK = 197e12

# Taylor-dot counts per step at each ladder degree (forward: taylor dots +
# 1 chain-product dot; backward: dual-taylor (3 plain dots per dual dot,
# minus the eye-side savings ~ none here) + adjoint recursion dot +
# T.P^T dot).
_FWD_DOTS = {4: 2 + 1, 8: 3 + 1, 12: 4 + 1, 19: 7 + 1}
_BWD_DOTS = {4: 3 * 2 + 2, 8: 3 * 3 + 2, 12: 3 * 4 + 2, 19: 3 * 7 + 2}


def main():
    rng = np.random.default_rng(0)

    def rand_h(d):
        h = rng.normal(size=(d, d)) + 1j * rng.normal(size=(d, d))
        return ((h + h.conj().T) / (2 * np.sqrt(d))).astype(np.complex64)

    dt = 20.0 / (STEPS - 1)
    h0 = rand_h(D)
    ops = np.stack([rand_h(D) for _ in range(CONTROLS)])
    from qoc_tpu.models import LinearHamiltonian
    basis = LinearHamiltonian(h0, ops).generator_basis(dt).astype(
        np.complex64)
    n_b = basis.shape[0]
    dp = -(-D // 64) * 64
    block, remat = chain_block_plan(D, STEPS)
    print("dp={} 2dp={} block={} remat={} n_b={}".format(
        dp, 2 * dp, block, remat, n_b), flush=True)

    w = (0.1 * rng.normal(size=(STEPS, n_b))).astype(np.float32)

    # Jit the norm/ladder probe and pull floats only (eager device ops and
    # int transfers stall/fail on the tunnel).
    @jax.jit
    def norm_info(wj):
        n1, _ = _exact_norm_max(wj[None], basis)
        return _ladder_index(n1).astype(jnp.float32), n1

    idx_f, norm1 = norm_info(jnp.asarray(w))
    idx = int(float(idx_f))
    degree = _F32_LADDER[idx][0] if idx < len(_F32_LADDER) else None
    print("batch 1-norm max = {:.3f} -> Taylor degree {}".format(
        float(norm1), degree), flush=True)

    prop = make_chain_expm_propagate(basis)
    n_blocks = STEPS // block + (1 if STEPS % block else 0)
    wpad = np.zeros((n_blocks * block, n_b), dtype=np.float32)
    wpad[:STEPS] = w
    wb = wpad.reshape(n_blocks, block, n_b)

    @jax.jit
    def fwd(wb_):
        def body(c, x):
            return c @ prop(x), None
        eye = jnp.eye(D, dtype=jnp.complex64)
        out, _ = jax.lax.scan(body, eye, wb_)
        return jnp.sum(jnp.abs(out))

    @jax.jit
    def fwdbwd(wb_):
        return jax.grad(lambda x: jnp.real(fwd(x)))(wb_)

    def timed(fn, pull):
        r = fn(jnp.asarray(wb)); r = fn(jnp.asarray(wb))
        pull(r)
        start = time.perf_counter()
        n = 10
        for _ in range(n):
            r = fn(jnp.asarray(wb))
        pull(r)
        return (time.perf_counter() - start) / n

    t_f = timed(fwd, lambda r: float(r))
    t_fb = timed(fwdbwd, lambda r: float(jnp.sum(jnp.abs(r))))
    print("kernel fwd:      {:.1f} ms".format(t_f * 1e3), flush=True)
    print("kernel fwd+bwd:  {:.1f} ms".format(t_fb * 1e3), flush=True)

    pass_flop = 3 * 2 * (2 * dp) ** 3        # bf16_3x: 3 passes per dot
    fwd_flop = STEPS * _FWD_DOTS[degree] * pass_flop
    fb_flop = STEPS * (_FWD_DOTS[degree] + _BWD_DOTS[degree]) * pass_flop
    print("fwd MFU:     {:.0f} TF/s = {:.0f}% of bf16 peak".format(
        fwd_flop / t_f / 1e12, 100 * fwd_flop / t_f / V5E_BF16_PEAK),
        flush=True)
    print("fwd+bwd MFU: {:.0f} TF/s = {:.0f}% of bf16 peak".format(
        fb_flop / t_fb / 1e12, 100 * fb_flop / t_fb / V5E_BF16_PEAK),
        flush=True)


if __name__ == "__main__":
    main()
