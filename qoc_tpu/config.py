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

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

__all__ = [
    "as_complex",
    "real_dtype",
    "complex_dtype",
    "np_real_dtype",
    "np_complex_dtype",
    "device_get",
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


def np_real_dtype():
    return np.float64 if jax.config.jax_enable_x64 else np.float32


def np_complex_dtype():
    return np.complex128 if jax.config.jax_enable_x64 else np.complex64


def _to_host(x):
    # The axon TPU tunnel backend only reliably transfers floating-point
    # arrays to the host (complex and bool raise UNIMPLEMENTED). Route
    # everything through floats:
    # - complex: split into real/imag on device, recombine on host;
    # - bool/int: cast to float32/float64 on device, cast back on host
    #   (exact for |v| < 2^24 / 2^53 — iteration counters and flags).
    if not hasattr(x, "dtype"):
        return np.asarray(x)
    dtype = x.dtype
    if jnp.issubdtype(dtype, jnp.complexfloating):
        real = np.asarray(jnp.real(x))
        imag = np.asarray(jnp.imag(x))
        return real + 1j * imag
    if dtype == jnp.bool_:
        return np.asarray(x.astype(jnp.float32)) > 0.5
    if jnp.issubdtype(dtype, jnp.integer):
        via = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
        return np.asarray(x.astype(via)).astype(np.dtype(dtype.name))
    return np.asarray(x)


def as_complex(x):
    """Cast to the working complex dtype without an on-device dtype cast at
    the transfer boundary (the axon TPU backend only accepts complex64
    host->device transfers; complex128 or cast-during-transfer raises
    UNIMPLEMENTED). Host data stays numpy (jitted code embeds it as a
    constant); traced/device data casts on device."""
    if isinstance(x, (jax.Array, jax.core.Tracer)):
        return x.astype(complex_dtype())
    return np.asarray(x).astype(np_complex_dtype())


def device_get(tree):
    """Complex-safe replacement for ``jax.device_get`` / ``np.asarray``.

    Use this for EVERY device->host pull of possibly-complex arrays: the
    axon TPU backend raises UNIMPLEMENTED on direct complex transfers.
    Accepts a single array or an arbitrary pytree.
    """
    return jax.tree_util.tree_map(_to_host, tree)


def is_io_process():
    """True on the process that owns stdout logging and H5 writes.

    Single-host runs are trivially the I/O process. Under
    ``jax.distributed`` every process executes the same SPMD program, but
    only process 0 may talk to the save file and the terminal — otherwise
    an N-host run prints N copies of every log row and races N writers on
    one H5 file (the FileLock in io/h5.py is per-host, not cross-host).
    Reads (``resume_from``) stay un-gated: the save file must live on a
    filesystem every process can read (shared FS), and each process loads
    the same checkpoint so the restored params agree everywhere.
    """
    return jax.process_index() == 0
