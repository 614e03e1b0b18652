"""Solver parity tests — closed-form trajectories, mirroring the reference's
test_gradient_based_solver.cpp strategy (compare updates against hand-computed
values on a tiny problem)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videovector_tpu.config import parse
from videovector_tpu.solver import (
    SolverConfig, init_solver_state, learning_rate, solver_update,
)


def test_lr_policies():
    cfg = SolverConfig(base_lr=0.1, lr_policy="fixed")
    assert float(learning_rate(cfg, 500)) == pytest.approx(0.1)

    cfg = SolverConfig(base_lr=0.1, lr_policy="step", gamma=0.5, stepsize=10)
    assert float(learning_rate(cfg, 0)) == pytest.approx(0.1)
    assert float(learning_rate(cfg, 25)) == pytest.approx(0.1 * 0.25)

    cfg = SolverConfig(base_lr=0.1, lr_policy="exp", gamma=0.9)
    assert float(learning_rate(cfg, 3)) == pytest.approx(0.1 * 0.9 ** 3, rel=1e-5)

    # the flagship schedule: inv, gamma .001, power .75
    cfg = SolverConfig(base_lr=0.001, lr_policy="inv", gamma=0.001, power=0.75)
    assert float(learning_rate(cfg, 200000)) == pytest.approx(
        0.001 * (1 + 0.001 * 200000) ** -0.75, rel=1e-5)


def _run_steps(cfg, w0, grad_fn, n):
    params = {"w": jnp.asarray(w0, jnp.float32)}
    state = init_solver_state(cfg, params)
    traj = []
    for _ in range(n):
        grads = {"w": jnp.asarray(grad_fn(np.asarray(params["w"])), jnp.float32)}
        params, state = solver_update(cfg, params, grads, state)
        traj.append(np.asarray(params["w"]).copy())
    return traj


def test_sgd_momentum_matches_caffe_formula():
    """h = m·h + lr·(g + wd·w); w -= h (ref ComputeUpdateValue :486-576)."""
    cfg = SolverConfig(base_lr=0.1, momentum=0.9, weight_decay=0.01)
    g = np.array([1.0, -2.0], np.float32)
    w = np.array([0.5, 0.5], np.float32)
    h = np.zeros(2, np.float32)
    expect = []
    we = w.copy()
    for _ in range(3):
        d = g + 0.01 * we
        h = 0.9 * h + 0.1 * d
        we = we - h
        expect.append(we.copy())
    traj = _run_steps(cfg, w, lambda w_: g, 3)
    for a, b in zip(traj, expect):
        np.testing.assert_allclose(a, b, rtol=1e-5)


def test_sgd_l1_regularization():
    cfg = SolverConfig(base_lr=0.1, weight_decay=0.5, regularization_type="L1")
    traj = _run_steps(cfg, [1.0, -1.0], lambda w: np.zeros(2, np.float32), 1)
    np.testing.assert_allclose(traj[0], [1.0 - 0.05, -1.0 + 0.05], rtol=1e-5)


def test_nesterov_matches_caffe_formula():
    cfg = SolverConfig(solver_type="NESTEROV", base_lr=0.1, momentum=0.9)
    g = np.array([1.0], np.float32)
    h = np.zeros(1, np.float32)
    we = np.array([0.0], np.float32)
    expect = []
    for _ in range(4):
        h_prev = h.copy()
        h = 0.9 * h + 0.1 * g
        we = we - ((1.9) * h - 0.9 * h_prev)
        expect.append(we.copy())
    traj = _run_steps(cfg, [0.0], lambda w: g, 4)
    for a, b in zip(traj, expect):
        np.testing.assert_allclose(a, b, rtol=1e-5)


def test_adagrad_matches_caffe_formula():
    cfg = SolverConfig(solver_type="ADAGRAD", base_lr=0.5, delta=1e-8)
    g = np.array([2.0], np.float32)
    h = np.zeros(1, np.float32)
    we = np.array([1.0], np.float32)
    expect = []
    for _ in range(3):
        h = h + g * g
        we = we - 0.5 * g / (np.sqrt(h) + 1e-8)
        expect.append(we.copy())
    traj = _run_steps(cfg, [1.0], lambda w: g, 3)
    for a, b in zip(traj, expect):
        np.testing.assert_allclose(a, b, rtol=1e-4)


def test_solver_converges_least_squares(rng):
    """SGD on ½‖Xw − y‖² converges (the reference's LeastSquares fixture)."""
    X = rng.randn(20, 4).astype(np.float32)
    w_true = rng.randn(4).astype(np.float32)
    y = X @ w_true
    cfg = SolverConfig(base_lr=0.02, momentum=0.9)
    params = {"w": jnp.zeros(4)}
    state = init_solver_state(cfg, params)

    def loss(p):
        return 0.5 * jnp.sum((jnp.asarray(X) @ p["w"] - jnp.asarray(y)) ** 2)

    step = jax.jit(lambda p, s: solver_update(cfg, p, jax.grad(loss)(p), s))
    for _ in range(200):
        params, state = step(params, state)
    assert float(loss(params)) < 1e-3
    np.testing.assert_allclose(np.asarray(params["w"]), w_true, atol=0.01)


def test_solver_config_from_flagship_prototxt():
    text = open("/root/reference/projects/videovec_embedding/"
                "mednet_embedding_train_solver.prototxt").read()
    cfg = SolverConfig.from_message(parse(text))
    assert cfg.lr_policy == "inv"
    assert cfg.base_lr == pytest.approx(0.001)
    assert cfg.momentum == pytest.approx(0.9)
    assert cfg.max_iter == 200000
    assert cfg.solver_type == "SGD"


def test_adagrad_rejects_momentum():
    """ref AdaGradSolver::constructor_sanity_check
    (include/caffe/solver.hpp:120-123): momentum is silently dead in the
    AdaGrad update rule, so a nonzero value is a config error."""
    import pytest
    with pytest.raises(ValueError, match="AdaGrad"):
        SolverConfig(solver_type="ADAGRAD", base_lr=0.1, momentum=0.9)
