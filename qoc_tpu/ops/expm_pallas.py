"""Pallas TPU kernel: fused scaling-and-squaring matrix exponential.

The XLA path (ops/expm.py Taylor-19) lowers to ~10 separate batched matmuls,
each round-tripping (B, d, d) buffers through HBM. This kernel keeps one
matrix's whole chain — powers, Paterson-Stockmeyer accumulation, and the
squaring loop — resident in VMEM: one HBM read of A and one write of exp(A)
per matrix.

TPU Pallas has no complex dtype, so matrices travel as (real, imag) float32
pairs and every complex matmul is four MXU ``jnp.dot`` calls. Inputs are
zero-padded to the 128-lane MXU width by the wrapper (exp of a zero-padded
block-diagonal embedding is the block-diagonal of the exponentials, so
padding is exact, not approximate).

Forward-only: :func:`qoc_tpu.ops.expm.expm` wires it in as an alternative
forward under the same exact Fréchet-adjoint custom VJP.
"""

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from qoc_tpu.ops.expm import _TAYLOR_COEFFS, _THETA_TAYLOR

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAVE_PALLAS = True
except ImportError:  # pragma: no cover
    _HAVE_PALLAS = False

__all__ = ["expm_taylor_pallas"]

_MAX_SQUARINGS = 30
_LANE = 128


def _expm_kernel(ar_ref, ai_ref, er_ref, ei_ref):
    ar = ar_ref[0]
    ai = ai_ref[0]
    d = ar.shape[0]

    def dot(x, y):
        # HIGHEST precision: multi-pass bf16 on the MXU (~f32 accurate).
        # Mosaic's default single-pass bf16 multiply loses ~3 decimal digits
        # per matmul, which compounds through the Taylor/squaring chain.
        return jnp.dot(x, y, preferred_element_type=jnp.float32,
                       precision=lax.Precision.HIGHEST)

    def cmul(x, y):
        xr, xi = x
        yr, yi = y
        rr = dot(xr, yr) - dot(xi, yi)
        ri = dot(xr, yi) + dot(xi, yr)
        return rr, ri

    # Scaling: s = ceil(log2(max(norm1 / theta, 1))).
    norm1 = jnp.max(jnp.sum(jnp.sqrt(ar * ar + ai * ai), axis=0))
    s = jnp.ceil(
        jnp.log2(jnp.maximum(norm1 / _THETA_TAYLOR, 1.0))).astype(jnp.int32)
    s = jnp.clip(s, 0, _MAX_SQUARINGS)
    scale = jnp.exp2(-s.astype(jnp.float32))
    a = (ar * scale, ai * scale)

    eye = jnp.eye(d, dtype=jnp.float32)
    a2 = cmul(a, a)
    a3 = cmul(a2, a)
    a4 = cmul(a2, a2)
    c = _TAYLOR_COEFFS

    def chunk(k):
        return (c[k] * eye + c[k + 1] * a[0] + c[k + 2] * a2[0]
                + c[k + 3] * a3[0],
                c[k + 1] * a[1] + c[k + 2] * a2[1] + c[k + 3] * a3[1])

    def add(x, y):
        return x[0] + y[0], x[1] + y[1]

    p = chunk(16)
    p = add(cmul(p, a4), chunk(12))
    p = add(cmul(p, a4), chunk(8))
    p = add(cmul(p, a4), chunk(4))
    p = add(cmul(p, a4), chunk(0))

    def square(i, r):
        return jax.lax.cond(i < s, lambda: cmul(r, r), lambda: r)

    p = jax.lax.fori_loop(0, _MAX_SQUARINGS, square, p)
    er_ref[0] = p[0]
    ei_ref[0] = p[1]


@functools.partial(jax.jit, static_argnames=())
def expm_taylor_pallas(a):
    """exp(a) for a batch of complex matrices via the fused Pallas kernel.

    ``a`` :: complex array (..., d, d). Computed in float32 regardless of x64
    mode (it is a TPU kernel). Returns the same shape/dtype as ``a``.
    """
    if not _HAVE_PALLAS:  # pragma: no cover
        raise ImportError("Pallas is unavailable in this JAX build.")
    batch_shape = a.shape[:-2]
    d = a.shape[-1]
    b = int(np.prod(batch_shape)) if batch_shape else 1
    dp = -(-d // _LANE) * _LANE  # pad to the 128-lane MXU width

    ar = jnp.real(a).astype(jnp.float32).reshape(b, d, d)
    ai = jnp.imag(a).astype(jnp.float32).reshape(b, d, d)
    if dp != d:
        pad = ((0, 0), (0, dp - d), (0, dp - d))
        ar = jnp.pad(ar, pad)
        ai = jnp.pad(ai, pad)

    spec = pl.BlockSpec((1, dp, dp), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    er, ei = pl.pallas_call(
        _expm_kernel,
        grid=(b,),
        in_specs=[spec, spec],
        out_specs=(spec, spec),
        out_shape=(jax.ShapeDtypeStruct((b, dp, dp), jnp.float32),
                   jax.ShapeDtypeStruct((b, dp, dp), jnp.float32)),
    )(ar, ai)

    if dp != d:
        er = er[:, :d, :d]
        ei = ei[:, :d, :d]
    out = (er + 1j * ei).astype(a.dtype)
    return out.reshape(batch_shape + (d, d))
