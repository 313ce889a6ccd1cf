"""Tests for the future-discounted loss against a torch oracle."""

import numpy as np
import jax.numpy as jnp
import pytest
import torch

from routeformer_tpu.losses import (
    FutureDiscountedLoss,
    future_discounted_loss,
    resolve_discount_factor,
)


def torch_oracle(y_pred, y_true, gamma, epsilon, loss_function):
    """Reference semantics re-derived with torch primitives."""
    y_pred = torch.tensor(y_pred)
    y_true = torch.tensor(y_true)
    add_dims = y_pred.ndim - 2
    factors = torch.pow(torch.tensor(gamma), torch.arange(y_pred.shape[1])).view(
        1, -1, *([1] * add_dims)
    )
    error = y_pred - y_true
    if epsilon is not None:
        error = torch.where(error.abs() < epsilon, torch.zeros_like(error), error)
    if loss_function == "mae":
        return float((error.abs() * factors).mean())
    if loss_function == "mse":
        return float((error.pow(2) * factors).mean())
    # smooth_l1 on RAW pred/true — the reference ignores epsilon here
    loss = torch.nn.SmoothL1Loss(reduction="none")(y_pred, y_true)
    return float((loss * factors).mean())


@pytest.mark.parametrize("loss_function", ["mse", "mae", "smooth_l1"])
@pytest.mark.parametrize("epsilon", [None, 0.5])
def test_matches_torch(rng, loss_function, epsilon):
    y_pred = rng.normal(size=(4, 30, 2)).astype(np.float32)
    y_true = rng.normal(size=(4, 30, 2)).astype(np.float32)
    got = float(
        future_discounted_loss(
            jnp.asarray(y_pred), jnp.asarray(y_true), 0.97, epsilon, loss_function
        )
    )
    expected = torch_oracle(y_pred, y_true, 0.97, epsilon, loss_function)
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_discount_weights_future_less(rng):
    """Error at the last step should cost less than at the first step."""
    base = np.zeros((1, 10, 2), dtype=np.float32)
    early = base.copy()
    early[0, 0] = 1.0
    late = base.copy()
    late[0, -1] = 1.0
    z = jnp.zeros((1, 10, 2))
    l_early = float(future_discounted_loss(jnp.asarray(early), z, 0.9, None, "mse"))
    l_late = float(future_discounted_loss(jnp.asarray(late), z, 0.9, None, "mse"))
    assert l_early > l_late


def test_schedule_resolution():
    sched = {0: 0.97, 100: 0.98, 200: 0.99}
    assert float(resolve_discount_factor(sched, 0)) == pytest.approx(0.97)
    assert float(resolve_discount_factor(sched, 50)) == pytest.approx(0.97)
    assert float(resolve_discount_factor(sched, 100)) == pytest.approx(0.98)
    assert float(resolve_discount_factor(sched, 150)) == pytest.approx(0.98)
    assert float(resolve_discount_factor(sched, 250)) == pytest.approx(0.99)


def test_schedule_requires_epoch_zero():
    with pytest.raises(ValueError):
        FutureDiscountedLoss({10: 0.9})


def test_class_wrapper_uses_epoch(rng):
    y_pred = jnp.asarray(rng.normal(size=(2, 5, 2)).astype(np.float32))
    y_true = jnp.zeros_like(y_pred)
    loss = FutureDiscountedLoss({0: 0.5, 10: 1.0}, epsilon=None, loss_function="mse")
    l0 = float(loss(y_pred, y_true, epoch=0))
    l10 = float(loss(y_pred, y_true, epoch=10))
    assert l10 > l0  # gamma=1.0 weights future steps fully
