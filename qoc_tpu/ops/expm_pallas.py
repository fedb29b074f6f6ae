"""Pallas TPU kernels: fused scaling-and-squaring matrix exponential and its
exact Fréchet adjoint.

The XLA path (ops/expm.py Taylor) lowers to ~10 separate batched matmuls,
each round-tripping (B, d, d) buffers through HBM; measured on a v5e the
batched d=64 matmul runs at roughly half the HBM roofline, so the whole
chain is bandwidth-bound. These kernels keep one matrix's entire chain —
powers, Paterson-Stockmeyer accumulation, and the squaring loop — resident
in VMEM: one HBM read of A and one write of exp(A) per matrix.

TPU Pallas has no complex dtype. Instead of the 4-real-dot complex product
(each dot zero-padded from d to the 128 MXU lanes, so 1/4 utilized at the
qoc-typical d=64), matrices are embedded as real block matrices

    E(X + iY) = [[X, -Y], [Y, X]]        (a ring homomorphism)

so one complex product is ONE fully-utilized (2d, 2d) real MXU dot — for
d = 64 exactly the 128x128 systolic tile. Zero-padding d up to a multiple
of 64 is exact (exp of a block-diagonal embedding is block-diagonal).

Forward: norm-adaptive Taylor (degree 8 when ||A||_1 <= 0.25 — the GRAPE
propagation regime — else degree 19) on the 2^-s-scaled matrix, then s
masked squarings, mirroring ops/expm.py's XLA implementation.

Backward (`expm_frechet_pallas`): the SAME chain evaluated on dual numbers
(V, dV) computes the exact Fréchet derivative L(B, G) for any norm —
including through the squaring chain ((V, dV) -> (V^2, V dV + dV V)) — at
~3x forward cost. ops/expm.py uses it with B = A^T, G = cotangent, which
equals the exact expm adjoint (the transposed-polynomial identity
sum_k c_k sum_{i+j=k-1} (A^T)^i G (A^T)^j = L_P(A^T, G), and likewise for
the squaring reversal). No transposes are needed inside the kernel, which
matters because the real embedding does not commute with plain transpose
(E(X)^T = E(X^H), not E(X^T)).

Parity anchor: reference expm (qoc/standard/functions/expm.py:83-276),
reimplemented TPU-first; gradients replace autograd-through-the-algorithm
(the reference report's 313 s-vs-0.039 s blowup, report.tex:245-255).
"""

import functools
import os

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from qoc_tpu.ops.expm import (_MAX_SQUARINGS, _TAYLOR_COEFFS, _THETA_TAYLOR,
                              _THETA_TAYLOR_8)

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAVE_PALLAS = True
except ImportError:  # pragma: no cover
    _HAVE_PALLAS = False

__all__ = ["expm_taylor_pallas", "expm_frechet_pallas"]


def _pallas_call(*args, **kwargs):
    """pl.pallas_call, forced into interpret mode by
    QOC_TPU_PALLAS_INTERPRET=1 (checked per call): lets CPU processes — the
    driver's virtual-device multichip dry run, debugging sessions — execute
    the fused kernels without TPU hardware."""
    if os.environ.get("QOC_TPU_PALLAS_INTERPRET", "0") == "1":
        kwargs.setdefault("interpret", True)
    return pl.pallas_call(*args, **kwargs)

_ALIGN = 64  # pad d so the embedded 2d is a multiple of the 128 MXU lanes
_GROUP = 8   # matrices per grid step: amortizes per-step overhead and gives
             # the MXU independent dot chains to interleave (ILP)

# f32-calibrated Taylor degree ladder. These kernels always compute in
# float32, so the truncation error only needs to sit below f32 roundoff
# (~6e-8): theta_n solves theta^(n+1)/(n+1)! * e^theta <= ~1e-8, with a
# safety margin. (The XLA path keeps the f64-calibrated thresholds because
# it also serves x64 parity mode.) Degrees and their Paterson-Stockmeyer
# MXU dot counts: 4 -> 2 dots, 8 -> 4, 12 -> 5, 19 -> 7.
_F32_LADDER = ((4, 0.05), (8, 0.45), (12, 1.2), (19, 3.0))


# MXU pass count for every in-kernel dot. "highest" (6-pass bf16 = exact
# f32, lax.Precision.HIGHEST) is the default. "bf16_3x" halves the MXU
# passes with a manual split-multiply (Mosaic rejects Precision.HIGH, so
# the 3-pass product x·y ≈ x_hi·y_hi + x_hi·y_lo + x_lo·y_hi is emulated
# with single-pass bf16 dots): ~2^-16 relative error per product. Mosaic's
# plain single-pass bf16 default (~2^-8/product) compounds visibly through
# the Taylor/squaring chain and is never used here.
_MXU_MODE = os.environ.get("QOC_TPU_MXU_PRECISION", "highest").lower()
if _MXU_MODE not in ("highest", "bf16_3x"):  # pragma: no cover
    raise ValueError(
        f"QOC_TPU_MXU_PRECISION must be 'highest' or 'bf16_3x', "
        f"got {_MXU_MODE!r}")


def _split_bf16(x):
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _dot(x, y):
    if _MXU_MODE == "bf16_3x":
        xh, xl = _split_bf16(x)
        yh, yl = _split_bf16(y)

        def d(a, b):
            return jnp.dot(a, b, preferred_element_type=jnp.float32)

        return d(xh, yh) + d(xh, yl) + d(xl, yh)
    return jnp.dot(x, y, preferred_element_type=jnp.float32,
                   precision=lax.Precision.HIGHEST)


def _embed(xr, xi):
    """E(X + iY) = [[X, -Y], [Y, X]] on the trailing two axes."""
    top = jnp.concatenate((xr, -xi), axis=-1)
    bot = jnp.concatenate((xi, xr), axis=-1)
    return jnp.concatenate((top, bot), axis=-2)


def _scaling_count(ar, ai):
    """Squaring count s and scale 2^-s from the complex 1-norm."""
    norm1 = jnp.max(jnp.sum(jnp.sqrt(ar * ar + ai * ai), axis=0))
    s = jnp.ceil(
        jnp.log2(jnp.maximum(norm1 / _THETA_TAYLOR, 1.0))).astype(jnp.int32)
    s = jnp.clip(s, 0, _MAX_SQUARINGS)
    return s, jnp.exp2(-s.astype(jnp.float32)), norm1


def _taylor4_m(m, eye):
    """Degree-4 Paterson-Stockmeyer on the embedded real matrix (2 dots)."""
    c = _TAYLOR_COEFFS
    m2 = _dot(m, m)
    return (c[0] * eye + c[1] * m + c[2] * m2
            + _dot(m2, c[3] * m + c[4] * m2))


# Low-product-count exact-Taylor evaluation schemes (Bader/Blanes/Casas-
# style, arXiv:1710.10989): polynomial compositions whose expansion equals
# the degree-m Taylor polynomial EXACTLY (so the _F32_LADDER truncation
# thetas apply unchanged) in fewer MXU products than Paterson-Stockmeyer.
# Coefficients solved numerically (exact to f64 roundoff) and selected for
# minimal f32 evaluation rounding over candidate gauge orbits.
#
# Degree 8 in 3 products (PS needs 4):
#   A2 = M^2;  A4 = A2 (x1 M + x2 A2)
#   A8 = (x3 A2 + A4)(x4 I + x5 M + x6 A2 + x7 A4)
#   T8(M) = y0 I + y1 M + y2 A2 + A8
# Measured f32 error at theta=0.45 matches 4-dot PS (5.7e-8 vs 5.8e-8),
# so it replaces PS in every MXU mode.
_D8X = (-0.2791515105738877, -0.06978787764347194, 1.9965103670821102,
        -1.0443935504465197, -0.06254782056757438, -0.024382370915357013,
        0.005092363918911529, 1.0, 1.0, 2.585142563711936)

# Degree 12 in 4 products (PS needs 5):
#   A2 = M^2;  A3 = A2 M;  B_i = a_i0 I + a_i1 M + a_i2 A2 + a_i3 A3
#   A6 = B3 + B4^2;  T12(M) = B1 + (B2 + A6) A6
# Measured f32 evaluation rounding at theta=1.2 is ~8e-7 (vs 5.7e-8 for
# 5-dot PS): far below the ~1.5e-5/product error of the bf16_3x MXU mode,
# but above exact-f32 roundoff — so this scheme is used only when the MXU
# mode is already the fast/approximate one, and PS keeps the "highest" path.
_D12A = ((2.50924541e+00, 2.50145758e+00, 6.68628695e-01, 6.22278884e-02),
         (5.58758752e+00, 1.71336946e+00, 1.60849759e-01, -1.44147961e-03),
         (-2.84603020e-01, -2.02022795e-01, 1.89875093e-02, 1.23719677e-02),
         (0.0, 1.31810610e-01, 2.02785554e-02, 6.75951847e-03))


def _taylor8_m(m, eye):
    """Degree-8 exact-Taylor evaluation in 3 MXU dots (see _D8X)."""
    x1, x2, x3, x4, x5, x6, x7, y0, y1, y2 = _D8X
    m2 = _dot(m, m)
    m4 = _dot(m2, x1 * m + x2 * m2)
    m8 = _dot(x3 * m2 + m4, x4 * eye + x5 * m + x6 * m2 + x7 * m4)
    return y0 * eye + y1 * m + y2 * m2 + m8


def _taylor12_ps_m(m, eye):
    """Degree-12 Paterson-Stockmeyer on the embedded real matrix (5 dots)."""
    c = _TAYLOR_COEFFS
    m2 = _dot(m, m)
    m3 = _dot(m2, m)
    m4 = _dot(m2, m2)

    def chunk(k):
        return c[k] * eye + c[k + 1] * m + c[k + 2] * m2 + c[k + 3] * m3

    x2 = chunk(8) + c[12] * m4
    x1 = chunk(4) + _dot(m4, x2)
    return chunk(0) + _dot(m4, x1)


def _taylor12_fast_m(m, eye):
    """Degree-12 exact-Taylor evaluation in 4 MXU dots (see _D12A)."""
    a = _D12A
    m2 = _dot(m, m)
    m3 = _dot(m2, m)

    def lin(i):
        return a[i][0] * eye + a[i][1] * m + a[i][2] * m2 + a[i][3] * m3

    b4 = lin(3)
    a6 = lin(2) + _dot(b4, b4)
    return lin(0) + _dot(lin(1) + a6, a6)


def _taylor12_m(m, eye):
    if _MXU_MODE == "bf16_3x":
        return _taylor12_fast_m(m, eye)
    return _taylor12_ps_m(m, eye)


def _taylor19_m(m, eye):
    """Degree-19 Paterson-Stockmeyer on the embedded real matrix (7 dots)."""
    c = _TAYLOR_COEFFS
    m2 = _dot(m, m)
    m3 = _dot(m2, m)
    m4 = _dot(m2, m2)

    def chunk(k):
        return c[k] * eye + c[k + 1] * m + c[k + 2] * m2 + c[k + 3] * m3

    p = chunk(16)
    p = _dot(p, m4) + chunk(12)
    p = _dot(p, m4) + chunk(8)
    p = _dot(p, m4) + chunk(4)
    p = _dot(p, m4) + chunk(0)
    return p


def _squarings(s, p, dual):
    """s squarings as a while_loop: free when s = 0 (the GRAPE regime)."""
    def cond(carry):
        return carry[0] < s

    def body(carry):
        i, r = carry
        return i + 1, (_dual_dot(r, r) if dual else _dot(r, r))

    return lax.while_loop(cond, body, (jnp.int32(0), p))[1]


def _taylor_by_degree(degree):
    return {4: _taylor4_m, 8: _taylor8_m, 12: _taylor12_m,
            19: _taylor19_m}[degree]


def _taylor_dual_by_degree(degree):
    return {4: _taylor4_dual, 8: _taylor8_dual, 12: _taylor12_dual,
            19: _taylor19_dual}[degree]


def _ladder_index(norm_max):
    """Runtime index into the f32 degree ladder (+1 past-the-end for the
    general scaling-and-squaring kernel)."""
    idx = jnp.int32(len(_F32_LADDER))
    for j in range(len(_F32_LADDER) - 1, -1, -1):
        idx = jnp.where(norm_max <= _F32_LADDER[j][1], jnp.int32(j), idx)
    return idx


def _fast_expm_kernel(degree, ar_ref, ai_ref, er_ref, ei_ref):
    """Straight-line kernel for the no-squaring regime (whole batch below
    the degree's theta): no per-matrix norm, cond, or loop — the dispatch
    happened once at the XLA level. ~2x faster than the general kernel."""
    d = ar_ref.shape[-1]
    eye = jnp.eye(2 * d, dtype=jnp.float32)
    taylor = _taylor_by_degree(degree)
    for j in range(ar_ref.shape[0]):  # static unroll over the group
        p = taylor(_embed(ar_ref[j], ai_ref[j]), eye)
        er_ref[j] = p[:d, :d]
        ei_ref[j] = p[d:, :d]


def _expm_kernel(ar_ref, ai_ref, er_ref, ei_ref):
    d = ar_ref.shape[-1]
    eye = jnp.eye(2 * d, dtype=jnp.float32)
    for j in range(ar_ref.shape[0]):  # static unroll over the group
        ar = ar_ref[j]
        ai = ai_ref[j]
        s, scale, norm1 = _scaling_count(ar, ai)
        m = _embed(ar * scale, ai * scale)
        # Norm-adaptive degree: 8 in the small-norm propagation regime, 19
        # otherwise (one branch executes; scaled norm = norm1 * scale).
        p = lax.cond(norm1 * scale <= _THETA_TAYLOR_8,
                     lambda mm: _taylor8_m(mm, eye),
                     lambda mm: _taylor19_m(mm, eye), m)
        p = _squarings(s, p, dual=False)
        er_ref[j] = p[:d, :d]
        ei_ref[j] = p[d:, :d]


def _dual_dot(x, y):
    """(V, dV) x (W, dW) -> (VW, dV W + V dW)."""
    v, dv = x
    w, dw = y
    return _dot(v, w), _dot(dv, w) + _dot(v, dw)


def _taylor4_dual(m, eye):
    c = _TAYLOR_COEFFS
    m2 = _dual_dot(m, m)
    inner = (c[3] * m[0] + c[4] * m2[0], c[3] * m[1] + c[4] * m2[1])
    tail = _dual_dot(m2, inner)
    return (c[0] * eye + c[1] * m[0] + c[2] * m2[0] + tail[0],
            c[1] * m[1] + c[2] * m2[1] + tail[1])


def _taylor12_ps_dual(m, eye):
    c = _TAYLOR_COEFFS
    zero = jnp.zeros_like(eye)
    m2 = _dual_dot(m, m)
    m3 = _dual_dot(m2, m)
    m4 = _dual_dot(m2, m2)

    def chunk(k):
        return (c[k] * eye + c[k + 1] * m[0] + c[k + 2] * m2[0]
                + c[k + 3] * m3[0],
                c[k + 1] * m[1] + c[k + 2] * m2[1] + c[k + 3] * m3[1])

    def add(x, y):
        return x[0] + y[0], x[1] + y[1]

    q8 = chunk(8)
    x2 = (q8[0] + c[12] * m4[0], q8[1] + c[12] * m4[1])
    x1 = add(chunk(4), _dual_dot(m4, x2))
    return add(chunk(0), _dual_dot(m4, x1))


def _taylor12_fast_dual(m, eye):
    """Degree-12 dual-number evaluation in 4 dual dots (see _D12A)."""
    a = _D12A

    def lin(i):
        return (a[i][0] * eye + a[i][1] * m[0] + a[i][2] * m2[0]
                + a[i][3] * m3[0],
                a[i][1] * m[1] + a[i][2] * m2[1] + a[i][3] * m3[1])

    m2 = _dual_dot(m, m)
    m3 = _dual_dot(m2, m)
    b4 = lin(3)
    b3 = lin(2)
    b4sq = _dual_dot(b4, b4)
    a6 = (b3[0] + b4sq[0], b3[1] + b4sq[1])
    b2 = lin(1)
    tail = _dual_dot((b2[0] + a6[0], b2[1] + a6[1]), a6)
    b1 = lin(0)
    return b1[0] + tail[0], b1[1] + tail[1]


def _taylor12_dual(m, eye):
    if _MXU_MODE == "bf16_3x":
        return _taylor12_fast_dual(m, eye)
    return _taylor12_ps_dual(m, eye)


def _taylor8_dual(m, eye):
    """Degree-8 dual-number evaluation in 3 dual dots (see _D8X)."""
    x1, x2, x3, x4, x5, x6, x7, y0, y1, y2 = _D8X
    m2 = _dual_dot(m, m)
    m4 = _dual_dot(m2, (x1 * m[0] + x2 * m2[0], x1 * m[1] + x2 * m2[1]))
    left = (x3 * m2[0] + m4[0], x3 * m2[1] + m4[1])
    right = (x4 * eye + x5 * m[0] + x6 * m2[0] + x7 * m4[0],
             x5 * m[1] + x6 * m2[1] + x7 * m4[1])
    m8 = _dual_dot(left, right)
    return (y0 * eye + y1 * m[0] + y2 * m2[0] + m8[0],
            y1 * m[1] + y2 * m2[1] + m8[1])


def _taylor19_dual(m, eye):
    c = _TAYLOR_COEFFS
    zero = jnp.zeros_like(eye)
    m2 = _dual_dot(m, m)
    m3 = _dual_dot(m2, m)
    m4 = _dual_dot(m2, m2)

    def chunk(k):
        return (c[k] * eye + c[k + 1] * m[0] + c[k + 2] * m2[0]
                + c[k + 3] * m3[0],
                c[k + 1] * m[1] + c[k + 2] * m2[1] + c[k + 3] * m3[1])

    def step(p, k):
        pm = _dual_dot(p, m4)
        q = chunk(k)
        return pm[0] + q[0], pm[1] + q[1]

    p = chunk(16)
    p = step(p, 12)
    p = step(p, 8)
    p = step(p, 4)
    p = step(p, 0)
    return p


def _fast_frechet_kernel(degree, br_ref, bi_ref, gr_ref, gi_ref,
                         lr_ref, li_ref):
    """Straight-line dual-number Fréchet kernel for the no-squaring regime."""
    d = br_ref.shape[-1]
    eye = jnp.eye(2 * d, dtype=jnp.float32)
    taylor = _taylor_dual_by_degree(degree)
    for j in range(br_ref.shape[0]):  # static unroll over the group
        m = (_embed(br_ref[j], bi_ref[j]), _embed(gr_ref[j], gi_ref[j]))
        tan = taylor(m, eye)[1]
        lr_ref[j] = tan[:d, :d]
        li_ref[j] = tan[d:, :d]


def _frechet_kernel(br_ref, bi_ref, gr_ref, gi_ref, lr_ref, li_ref):
    """L(B, G): Fréchet derivative of expm at B in direction G, via a
    dual-number evaluation of the full scaling-squaring-Taylor chain."""
    d = br_ref.shape[-1]
    eye = jnp.eye(2 * d, dtype=jnp.float32)
    for j in range(br_ref.shape[0]):  # static unroll over the group
        br = br_ref[j]
        bi = bi_ref[j]
        s, scale, norm1 = _scaling_count(br, bi)
        m = (_embed(br * scale, bi * scale),
             _embed(gr_ref[j] * scale, gi_ref[j] * scale))
        p = lax.cond(norm1 * scale <= _THETA_TAYLOR_8,
                     lambda mm: _taylor8_dual(mm, eye),
                     lambda mm: _taylor19_dual(mm, eye), m)
        p = _squarings(s, p, dual=True)
        tan = p[1]
        lr_ref[j] = tan[:d, :d]
        li_ref[j] = tan[d:, :d]


def _group_for(dp, dual):
    """Group size bounded so the kernel's VMEM working set stays ~<= 4 MB."""
    per_matrix = (2 * dp) * (2 * dp) * 4 * (12 if dual else 6)
    return max(1, min(_GROUP, (4 * 1024 * 1024) // per_matrix))


def _struct(shape, like):
    """f32 out_shape struct, propagating the input's varying-manual-axes
    set so the kernels compose with ``shard_map(check_vma=True)`` (e.g. the
    ensemble path: per-shard propagation on a device mesh)."""
    vma = getattr(jax.typeof(like), "vma", None) \
        if hasattr(jax, "typeof") else None
    if vma:
        return jax.ShapeDtypeStruct(shape, jnp.float32, vma=vma)
    return jax.ShapeDtypeStruct(shape, jnp.float32)


def _split_pad(a, dp, g):
    batch_shape = a.shape[:-2]
    d = a.shape[-1]
    b = int(np.prod(batch_shape)) if batch_shape else 1
    bp = -(-b // g) * g
    ar = jnp.real(a).astype(jnp.float32).reshape(b, d, d)
    ai = jnp.imag(a).astype(jnp.float32).reshape(b, d, d)
    if dp != d or bp != b:
        pad = ((0, bp - b), (0, dp - d), (0, dp - d))
        ar = jnp.pad(ar, pad)
        ai = jnp.pad(ai, pad)
    return ar, ai, b, bp


def _vmem_spec(dp, g):
    return pl.BlockSpec((g, dp, dp), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)


@jax.jit
def expm_taylor_pallas(a):
    """exp(a) for a batch of complex matrices via the fused Pallas kernel.

    ``a`` :: complex array (..., d, d). Computed in float32 regardless of x64
    mode (it is a TPU kernel). Returns the same shape/dtype as ``a``.
    """
    if not _HAVE_PALLAS:  # pragma: no cover
        raise ImportError("Pallas is unavailable in this JAX build.")
    batch_shape = a.shape[:-2]
    d = a.shape[-1]
    dp = -(-d // _ALIGN) * _ALIGN
    g = _group_for(dp, dual=False)
    ar, ai, b, bp = _split_pad(a, dp, g)
    spec = _vmem_spec(dp, g)
    shapes = (_struct((bp, dp, dp), ar), _struct((bp, dp, dp), ar))

    def call(kernel):
        def branch(xr, xi):
            return _pallas_call(
                kernel,
                grid=(bp // g,),
                in_specs=[spec, spec],
                out_specs=(spec, spec),
                out_shape=shapes,
            )(xr, xi)
        return branch

    # One batch-level norm reduction picks the kernel: a straight-line
    # degree from the f32 ladder in the no-squaring regimes (the GRAPE
    # propagation case — no per-matrix norm/cond/while bookkeeping), the
    # general scaling-and-squaring kernel otherwise.
    norm_max = jnp.max(jnp.sum(jnp.sqrt(ar * ar + ai * ai), axis=-2))
    branches = [call(functools.partial(_fast_expm_kernel, deg))
                for deg, _ in _F32_LADDER] + [call(_expm_kernel)]
    er, ei = lax.switch(_ladder_index(norm_max), branches, ar, ai)
    if dp != d or bp != b:
        er = er[:b, :d, :d]
        ei = ei[:b, :d, :d]
    out = (er + 1j * ei).astype(a.dtype)
    return out.reshape(batch_shape + (d, d))


@jax.jit
def expm_frechet_pallas(b_mat, g):
    """Fréchet derivative L(B, G) batched over leading axes (float32).

    Exact for any input norm: the dual pair runs through the same scaling,
    norm-adaptive Taylor, and squaring chain as the forward kernel. The expm
    custom VJP calls this with ``B = swapaxes(A)``, ``G = cotangent``.
    """
    if not _HAVE_PALLAS:  # pragma: no cover
        raise ImportError("Pallas is unavailable in this JAX build.")
    batch_shape = b_mat.shape[:-2]
    d = b_mat.shape[-1]
    dp = -(-d // _ALIGN) * _ALIGN
    grp = _group_for(dp, dual=True)
    br, bi, b, bp = _split_pad(b_mat, dp, grp)
    gr, gi, _, _ = _split_pad(g, dp, grp)
    spec = _vmem_spec(dp, grp)
    shapes = (_struct((bp, dp, dp), br), _struct((bp, dp, dp), br))

    def call(kernel):
        def branch(*refs):
            return _pallas_call(
                kernel,
                grid=(bp // grp,),
                in_specs=[spec, spec, spec, spec],
                out_specs=(spec, spec),
                out_shape=shapes,
            )(*refs)
        return branch

    norm_max = jnp.max(jnp.sum(jnp.sqrt(br * br + bi * bi), axis=-2))
    branches = [call(functools.partial(_fast_frechet_kernel, deg))
                for deg, _ in _F32_LADDER] + [call(_frechet_kernel)]
    lr, li = lax.switch(_ladder_index(norm_max), branches, br, bi, gr, gi)
    if dp != d or bp != b:
        lr = lr[:b, :d, :d]
        li = li[:b, :d, :d]
    out = (lr + 1j * li).astype(b_mat.dtype)
    return out.reshape(batch_shape + (d, d))
