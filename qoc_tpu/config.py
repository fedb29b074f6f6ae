"""Global numerics configuration for qoc_tpu.

The reference implementation (/root/reference/qoc) is float64/complex128
throughout (numpy defaults). TPUs natively compute in float32 (and bfloat16 on
the MXU), and float64 is software-emulated and slow. qoc_tpu therefore derives
its working dtypes from JAX's x64 mode:

- ``jax.config.jax_enable_x64 == True``  -> float64 / complex128 (parity mode,
  used by the CPU test-suite against scipy oracles)
- ``jax.config.jax_enable_x64 == False`` -> float32 / complex64 (TPU speed
  mode; matmuls in the hot path request ``lax.Precision.HIGHEST`` so the MXU
  runs the 6-pass bfloat16 algorithm, which is ~f32 accurate)
"""

import jax
import jax.numpy as jnp
from jax import lax

__all__ = [
    "real_dtype",
    "complex_dtype",
    "MATMUL_PRECISION",
]

# Precision for MXU matmuls in the propagation hot path. HIGHEST = multi-pass
# bf16 accumulation, which is required for quantum-fidelity-grade accuracy in
# f32 mode and is a no-op for f64 (emulated) inputs.
MATMUL_PRECISION = lax.Precision.HIGHEST


def real_dtype():
    """The working real dtype (float64 under x64 mode, else float32)."""
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


def complex_dtype():
    """The working complex dtype (complex128 under x64 mode, else complex64)."""
    return jnp.complex128 if jax.config.jax_enable_x64 else jnp.complex64
