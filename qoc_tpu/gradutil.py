"""Gradient utilities.

Parity with /root/reference/qoc/standard/utils/autogradutil.py:10-31:
``ans_jacobian(f, argnum)`` returns a function computing ``(value,
jacobian)`` in one pass — in the reference that is one autograd forward
trace + one reverse sweep; here it is ``jax.value_and_grad`` (scalar
outputs) or ``jax.vjp`` + a basis sweep (array outputs).

Gradient convention for complex inputs matches autograd's: for a real-valued
``f`` of complex ``z = x + iy``, the returned gradient is du/dx - i du/dy
(the reference conjugates it afterwards for optimization,
schroedingerdiscrete.py:320-324 — qoc_tpu's drivers avoid the issue
entirely by differentiating w.r.t. stripped real parameters).
"""

import jax
import jax.numpy as jnp

__all__ = ["ans_jacobian"]


def ans_jacobian(function, argnum=0):
    """Wrap ``function`` to return ``(value, jacobian)`` w.r.t. argument
    ``argnum``."""

    def wrapped(*args, **kwargs):
        wrt = args[argnum]

        def partial(x):
            new_args = list(args)
            new_args[argnum] = x
            return function(*new_args, **kwargs)

        probe = jax.eval_shape(partial, wrt)
        if probe.shape == () and not jnp.issubdtype(probe.dtype,
                                                    jnp.complexfloating):
            return jax.value_and_grad(partial)(wrt)
        # Array (or complex scalar) output: full Jacobian via a vjp basis
        # sweep, one reverse pass per output element (exactly the
        # reference's strategy).
        value, vjp_fn = jax.vjp(partial, wrt)
        flat = jnp.ravel(value)
        basis = jnp.eye(flat.size, dtype=value.dtype)
        rows = jax.vmap(
            lambda e: vjp_fn(jnp.reshape(e, value.shape))[0])(basis)
        jacobian = jnp.reshape(rows, value.shape + wrt.shape)
        return value, jacobian

    return wrapped
