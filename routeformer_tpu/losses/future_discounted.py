"""Future-discounted displacement loss (JAX).

Capability parity with reference ``routeformer/losses/future_discounted_mse.py:9-95``:
per-timestep weights ``gamma^t`` (t = 0 at the first predicted step, so *far*
future is discounted *more*), an epsilon-insensitive zone that zeroes errors
with ``|err| < eps``, and mse / mae / smooth-l1 error functions.

Two reference behaviors preserved exactly:

1. the discount factor is **epoch-scheduled** via a ``{epoch: gamma}`` dict
   with "sticky" updates (the factor last set at-or-below the current epoch
   wins, reference lines 44-48, 71-74);
2. for ``smooth_l1`` the epsilon zone is **not** applied (the reference
   computes smooth-l1 on the raw pred/true, bypassing the zeroed error —
   reference lines 85-95).

TPU-first design: the reference mutates ``self.current_discount_factor``
from ``self.current_epoch`` inside ``forward`` — a trace-breaking pattern.
Here the schedule is resolved to a *scalar input* (``gamma`` or ``epoch``)
of the pure loss function, so the jitted train step never recompiles across
epochs: :func:`resolve_discount_factor` converts the dict schedule into a
piecewise-constant ``jnp.where`` lookup over a traced epoch scalar.
"""

from typing import Dict, Optional, Union

import jax.numpy as jnp


def resolve_discount_factor(
    discount_factor: Union[float, Dict[int, float]],
    epoch: Union[int, jnp.ndarray],
) -> jnp.ndarray:
    """Resolve an ``{epoch: gamma}`` schedule at a (possibly traced) epoch.

    Sticky semantics matching the reference: the value at the largest
    schedule key <= epoch applies. (The reference only updates when the
    epoch is exactly a key, but since training visits every epoch in order
    the observable behavior is this piecewise-constant schedule. A key for
    epoch 0 is required, as in the reference.)
    """
    if isinstance(discount_factor, (float, int)):
        return jnp.float32(discount_factor)
    if 0 not in discount_factor:
        raise ValueError("Discount factor schedule must have a key for epoch 0.")
    keys = sorted(discount_factor.keys())
    gamma = jnp.float32(discount_factor[keys[0]])
    epoch = jnp.asarray(epoch)
    for k in keys[1:]:
        gamma = jnp.where(epoch >= k, jnp.float32(discount_factor[k]), gamma)
    return gamma


def _smooth_l1(pred: jnp.ndarray, true: jnp.ndarray, beta: float = 1.0) -> jnp.ndarray:
    """Elementwise smooth-L1 (Huber/beta=1), matching ``torch.nn.SmoothL1Loss``."""
    diff = jnp.abs(pred - true)
    return jnp.where(diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta)


def future_discounted_loss(
    y_pred: jnp.ndarray,
    y_true: jnp.ndarray,
    gamma: Union[float, jnp.ndarray],
    epsilon: Optional[float] = None,
    loss_function: str = "mse",
) -> jnp.ndarray:
    """Pure functional future-discounted loss.

    Parameters
    ----------
    y_pred, y_true : jnp.ndarray
        Shape ``(B, T, *)``.
    gamma : float or scalar array
        Discount factor (use :func:`resolve_discount_factor` for schedules).
    epsilon : float, optional
        Epsilon-insensitive zone: errors with ``|err| < epsilon`` contribute 0
        (ignored for ``smooth_l1``, preserving the reference quirk).
    loss_function : str
        One of ``"mse"``, ``"mae"``, ``"smooth_l1"``.
    """
    if loss_function not in ("mae", "mse", "smooth_l1"):
        raise ValueError(f"Unknown loss function {loss_function}")

    add_dims = y_pred.ndim - 2
    assert add_dims >= 0
    t = jnp.arange(y_pred.shape[1], dtype=jnp.float32)
    factors = jnp.power(jnp.asarray(gamma, dtype=jnp.float32), t)
    factors = factors.reshape((1, -1) + (1,) * add_dims)

    error = y_pred - y_true
    if epsilon is not None:
        error = jnp.where(jnp.abs(error) < epsilon, jnp.zeros_like(error), error)

    if loss_function == "mae":
        return (jnp.abs(error) * factors).mean()
    elif loss_function == "mse":
        return (jnp.square(error) * factors).mean()
    else:  # smooth_l1 — computed on raw pred/true (reference behavior)
        return (_smooth_l1(y_pred, y_true) * factors).mean()


class FutureDiscountedLoss:
    """Stateless, callable wrapper mirroring the reference class API.

    Unlike the reference (a LightningModule reading ``self.current_epoch``),
    the epoch is an explicit argument so the call stays jit-pure.
    """

    def __init__(
        self,
        discount_factor: Union[float, Dict[int, float]] = 0.9,
        epsilon: Optional[float] = None,
        loss_function: str = "mse",
    ):
        if loss_function not in ("mae", "mse", "smooth_l1"):
            raise ValueError(f"Unknown loss function {loss_function}")
        if isinstance(discount_factor, dict) and 0 not in discount_factor:
            raise ValueError("Discount factor schedule must have a key for epoch 0.")
        self.discount_factor = discount_factor
        self.epsilon = epsilon
        self.loss_function = loss_function

    def __call__(
        self,
        y_pred: jnp.ndarray,
        y_true: jnp.ndarray,
        epoch: Union[int, jnp.ndarray] = 0,
    ) -> jnp.ndarray:
        gamma = resolve_discount_factor(self.discount_factor, epoch)
        return future_discounted_loss(
            y_pred, y_true, gamma, self.epsilon, self.loss_function
        )
