"""Control-lifecycle tests: strip/slap round trips over a shape grid, norm
clipping, initial-control generation and validation (reference
test_core.py:6-60 strategy).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from qoc_tpu.core.common import (
    clip_control_norms,
    clip_control_norms_jax,
    gen_controls_cos,
    gen_controls_flat,
    gen_controls_white,
    initialize_controls,
    slap_controls,
    slap_controls_jax,
    strip_controls,
    strip_controls_jax,
)

RNG = np.random.default_rng(11)


@pytest.mark.parametrize("complex_controls", [False, True])
def test_strip_slap_roundtrip_grid(complex_controls):
    for e in (2, 5, 17):
        for c in (1, 3, 8):
            if complex_controls:
                controls = RNG.normal(size=(e, c)) + 1j * RNG.normal(
                    size=(e, c))
            else:
                controls = RNG.normal(size=(e, c))
            flat = strip_controls(complex_controls, controls)
            assert flat.dtype.kind == "f"
            assert flat.size == controls.size * (2 if complex_controls else 1)
            back = slap_controls(complex_controls, flat, (e, c))
            assert np.allclose(back, controls)
            # traced twins agree with host versions
            flat_j = strip_controls_jax(complex_controls,
                                        jnp.asarray(controls))
            assert np.allclose(np.asarray(flat_j), flat)
            back_j = slap_controls_jax(complex_controls, jnp.asarray(flat),
                                       (e, c))
            assert np.allclose(np.asarray(back_j), controls)


def test_clip_control_norms_complex():
    controls = np.array([[3 + 4j, 0.1], [0.5j, -2.0]], dtype=complex)
    max_norms = np.array([1.0, 1.5])
    clipped = clip_control_norms(controls, max_norms)
    # offending points rescaled onto the norm, preserving phase
    assert np.isclose(abs(clipped[0, 0]), 1.0)
    assert np.isclose(np.angle(clipped[0, 0]), np.angle(3 + 4j))
    # non-offending untouched
    assert clipped[1, 0] == 0.5j
    assert np.isclose(abs(clipped[1, 1]), 1.5)
    # jax twin identical
    clipped_j = np.asarray(clip_control_norms_jax(jnp.asarray(controls),
                                                  max_norms))
    assert np.allclose(clipped_j, clipped)


def test_gen_controls_flat_default_amplitude():
    controls = gen_controls_flat(False, 2, 5, 1.0, np.array([2.0, 4.0]))
    assert np.allclose(controls[:, 0], 0.2)
    assert np.allclose(controls[:, 1], 0.4)
    complex_controls = gen_controls_flat(True, 1, 5, 1.0, np.array([1.0]))
    assert np.iscomplexobj(complex_controls)
    assert np.allclose(np.abs(complex_controls), 0.1)


def test_gen_controls_respect_norms():
    norms = np.array([1.0, 3.0])
    for gen in (gen_controls_cos, gen_controls_flat):
        controls = gen(True, 2, 20, 1.0, norms)
        assert (np.abs(controls) <= norms + 1e-10).all()


def test_initialize_controls_defaults():
    controls, norms = initialize_controls(False, 2, 4, 1.0, None, None)
    assert controls.shape == (4, 2)
    assert np.allclose(norms, 1.0)


def test_initialize_controls_dtype_validation():
    with pytest.raises(ValueError):
        initialize_controls(True, 1, 3, 1.0, np.ones((3, 1)), None)
    with pytest.raises(ValueError):
        initialize_controls(False, 1, 3, 1.0, np.ones((3, 1)) * 1j, None)


def test_initialize_controls_norm_validation():
    with pytest.raises(ValueError):
        initialize_controls(False, 1, 3, 1.0, np.full((3, 1), 2.0),
                            np.array([1.0]))
    # within tolerance passes
    controls, _ = initialize_controls(False, 1, 3, 1.0,
                                      np.full((3, 1), 1.0 + 1e-11),
                                      np.array([1.0]))
    assert controls.shape == (3, 1)
