"""Optimizer tests: hand-computed Adam/SGD update sequences (reference
test_standard.py:252-310 strategy) and host-vs-fused-path equivalence.
"""

import numpy as np

import jax.numpy as jnp

from qoc_tpu.optim import Adam, LBFGSB, SGD


def test_sgd_update():
    opt = SGD(learning_rate=0.1)
    params = np.array([1.0, -2.0])
    grads = np.array([0.5, 0.5])
    new = opt.update(grads, params)
    assert np.allclose(new, [0.95, -2.05])


def _manual_adam_step(params, grads, m, v, t, lr=1e-3, b1=0.9, b2=0.999,
                      eps=1e-8):
    t = t + 1
    m = b1 * m + (1 - b1) * grads
    v = b2 * v + (1 - b2) * grads ** 2
    m_hat = m / (1 - b1 ** t)
    v_hat = v / (1 - b2 ** t)
    return params - lr * m_hat / (np.sqrt(v_hat) + eps), m, v, t


def test_adam_update_sequence_matches_manual():
    opt = Adam()
    params = np.array([0.3, -0.8, 1.2])
    opt.gradient_moment = np.zeros_like(params)
    opt.gradient_square_moment = np.zeros_like(params)
    opt.iteration_count = 0
    m = np.zeros_like(params)
    v = np.zeros_like(params)
    t = 0
    rng = np.random.default_rng(0)
    p_manual = params.copy()
    p_opt = params.copy()
    for _ in range(5):
        grads = rng.normal(size=3)
        p_opt = opt.update(grads, p_opt)
        p_manual, m, v, t = _manual_adam_step(p_manual, grads, m, v, t)
        assert np.allclose(p_opt, p_manual, atol=1e-14)


def test_adam_fused_path_matches_host_path():
    opt_host = Adam(learning_rate=0.01, learning_rate_decay=50.0,
                    clip_grads=0.3, scale_grads=1.0)
    opt_fused = Adam(learning_rate=0.01, learning_rate_decay=50.0,
                     clip_grads=0.3, scale_grads=1.0)
    params = np.array([0.5, -0.5, 2.0])
    opt_host.gradient_moment = np.zeros_like(params)
    opt_host.gradient_square_moment = np.zeros_like(params)
    opt_host.iteration_count = 0
    state = opt_fused.init_state(jnp.asarray(params))
    rng = np.random.default_rng(3)
    p_host = params.copy()
    p_fused = jnp.asarray(params)
    for _ in range(6):
        grads = rng.normal(size=3)
        p_host = opt_host.update(grads, p_host)
        state, p_fused = opt_fused.update_jax(state, jnp.asarray(grads),
                                              p_fused)
        assert np.allclose(np.asarray(p_fused), p_host, atol=1e-12)


def test_adam_run_terminates_on_flag():
    opt = Adam(learning_rate=0.1)
    calls = {"n": 0}

    def jacobian(params):
        calls["n"] += 1
        return np.ones_like(params), calls["n"] >= 3

    opt.run(None, 10, np.zeros(2), jacobian)
    assert calls["n"] == 3


def test_lbfgsb_minimizes_quadratic():
    opt = LBFGSB()

    def function(params):
        return float(np.sum((params - 2.0) ** 2)), False

    def jacobian(params):
        return 2 * (params - 2.0), False

    res = opt.run(function, 100, np.zeros(3), jacobian)
    assert np.allclose(res.x, 2.0, atol=1e-6)


def test_adam_state_dict_roundtrip():
    opt = Adam()
    opt.gradient_moment = np.array([1.0, 2.0])
    opt.gradient_square_moment = np.array([3.0, 4.0])
    opt.iteration_count = 7
    state = opt.state_dict()
    opt2 = Adam()
    opt2.load_state_dict(state)
    assert np.allclose(opt2.gradient_moment, [1.0, 2.0])
    assert opt2.iteration_count == 7
