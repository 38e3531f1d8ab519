"""Optimizer parity vs torch.optim (same grads, same trajectories) and LR
schedule parity."""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

torch = pytest.importorskip("torch")

from segtpu.train.optim import (
    cosine_annealing_lr,
    get_optimizer,
    lr_finder_schedule,
    step_learning_rate,
)


def _run_optax(tx, w0, grads_seq, lr):
    params = {"w": jnp.asarray(w0)}
    state = tx.init(params)
    for g in grads_seq:
        state.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
        updates, state = tx.update({"w": jnp.asarray(g)}, state, params)
        params = optax.apply_updates(params, updates)
    return np.asarray(params["w"])


def _run_torch(make_opt, w0, grads_seq):
    w = torch.nn.Parameter(torch.tensor(w0))
    opt = make_opt([w])
    for g in grads_seq:
        opt.zero_grad()
        w.grad = torch.tensor(g)
        opt.step()
    return w.detach().numpy()


@pytest.fixture
def grads_seq():
    rng = np.random.RandomState(0)
    return [rng.randn(5).astype(np.float32) for _ in range(7)]


@pytest.fixture
def w0():
    return np.array([0.5, -1.0, 2.0, 0.0, 3.0], dtype=np.float32)


def test_sgd_matches_torch(w0, grads_seq):
    got = _run_optax(get_optimizer("sgd", 1e-2), w0, grads_seq, 1e-2)
    exp = _run_torch(lambda p: torch.optim.SGD(p, lr=1e-2), w0, grads_seq)
    np.testing.assert_allclose(got, exp, rtol=1e-6)


def test_rmsprop_matches_torch(w0, grads_seq):
    got = _run_optax(get_optimizer("rms", 1e-3), w0, grads_seq, 1e-3)
    exp = _run_torch(lambda p: torch.optim.RMSprop(p, lr=1e-3), w0, grads_seq)
    np.testing.assert_allclose(got, exp, rtol=1e-4, atol=1e-7)


def test_adam_matches_torch(w0, grads_seq):
    got = _run_optax(get_optimizer("adam", 1e-3), w0, grads_seq, 1e-3)
    exp = _run_torch(lambda p: torch.optim.Adam(p, lr=1e-3), w0, grads_seq)
    np.testing.assert_allclose(got, exp, rtol=1e-5, atol=1e-7)


def test_cosine_annealing_matches_torch_closed_form():
    base = 1e-3
    for epoch in range(12):
        got = cosine_annealing_lr(epoch, base, t_max=10, eta_min=1e-8)
        exp = 1e-8 + (base - 1e-8) * (1 + math.cos(math.pi * epoch / 10)) / 2
        assert abs(got - exp) < 1e-12


def test_step_lr_decay():
    assert step_learning_rate(0, 1e-2) == 1e-2
    assert abs(step_learning_rate(10, 1e-2) - 1e-3) < 1e-12
    assert abs(step_learning_rate(25, 1e-2) - 1e-4) < 1e-12


def test_lr_finder_schedule_doubles():
    lrs = lr_finder_schedule(30)
    assert len(lrs) == 30
    for a, b in zip(lrs, lrs[1:]):
        assert abs(b / a - 2.0) < 1e-9


def test_unknown_optimizer_raises():
    with pytest.raises(ValueError):
        get_optimizer("adagrad", 1e-3)
