"""Test configuration: CPU backend, float64 parity mode, 8 virtual devices.

The test suite runs against the CPU backend in x64 mode so numerics can be
compared to scipy oracles at double precision (the reference is
float64/complex128 throughout). The 8 virtual host devices exercise the
multi-chip sharding paths (SURVEY.md §4: sharded psum result == single-device
result) without TPU hardware.

NOTE: this environment pins JAX_PLATFORMS=axon (TPU tunnel); the env var
cannot be overridden from outside, so the platform is forced via jax.config
here, before any backend initialization.
"""

import os

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
