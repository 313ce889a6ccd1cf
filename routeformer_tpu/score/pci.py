"""Path Complexity Index (PCI).

Capability parity with reference ``routeformer/score/pci.py``: extrapolate a
"regular" trajectory from the last ``lookback_length`` input points
(linear / quadratic / constrained-quadratic, reference pci.py:123-217) and
measure the Fréchet (or MSE) distance between it and the real future
(reference pci.py:94-120, 220-275).

TPU-first design: the reference recomputes PCI with pure-Python ``frdist``
for every candidate window at every ``GEMDataset`` construction (reference
``io/dataset.py:991-1031``). Here the linear/quadratic paths have a
closed-form least-squares fit, so ``estimate_pci_batch`` jit-compiles the
*entire* index-build scoring — polynomial fit, extrapolation and the Fréchet
DP — and ``vmap``s it over all windows in one device call. The
scipy-SLSQP-constrained variant stays host-side (it is an offline analysis
mode, not on the training path).
"""

from typing import Literal, Optional

import jax
import jax.numpy as jnp
import numpy as np
from functools import partial

from routeformer_tpu.score.frechet import frechet_distance, frechet_distance_batch


def fit_quadratic_with_constraints(t, y, max_speed, max_accel, domain=None):
    """Least-squares quadratic fit with |speed| and |accel| inequality bounds.

    Host-side scipy path (reference pci.py:26-91): minimizes squared error of
    ``a t^2 + b t + c`` subject to ``max |2 a t + b| <= max_speed`` over the
    domain and ``|2 a| <= max_accel``. Returns ``[a, b, c]``.
    """
    from scipy.optimize import minimize

    t = np.asarray(t, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    if domain is None:
        domain = [t.min(), t.max()]

    probe = np.linspace(domain[0], domain[1], 10)

    def objective(params):
        a, b, c = params
        return np.sum((y - (a * t**2 + b * t + c)) ** 2)

    constraints = (
        {
            "type": "ineq",
            "fun": lambda p: max_speed - np.max(np.abs(2 * p[0] * probe + p[1])),
        },
        {"type": "ineq", "fun": lambda p: max_accel - np.abs(2 * p[0])},
    )
    result = minimize(objective, [0.0, 0.0, 0.0], constraints=constraints)
    return result.x


def pci(
    real_trajectory,
    regular_trajectory,
    measure: Literal["mse", "frechet"] = "frechet",
) -> float:
    """PCI of a regular trajectory vs the real one (reference pci.py:94-120)."""
    if measure == "mse":
        return float(np.mean((np.asarray(real_trajectory) - np.asarray(regular_trajectory)) ** 2))
    elif measure == "frechet":
        return float(
            frechet_distance(jnp.asarray(real_trajectory), jnp.asarray(regular_trajectory))
        )
    else:
        raise ValueError("Invalid pci measure.")


def estimate_regular_trajectory(
    input_trajectory: np.ndarray,
    time_steps: int,
    curve_type: Literal["linear", "quadratic", "constrained_quadratic"] = "linear",
    lookback_length: int = 6,
    constraints: Optional[dict] = None,
    frequency: float = 30,
) -> np.ndarray:
    """Extrapolate the last segment of the input into a "regular" trajectory.

    Host-side numpy path (reference pci.py:123-217). Fits x(t), y(t) over the
    last ``lookback_length`` points on the reference's domain convention
    (``numpy.polynomial.Polynomial.fit`` with domain = [t0, t_last]) and
    evaluates at the following ``time_steps`` points.
    """
    input_trajectory = np.asarray(input_trajectory)
    if input_trajectory.shape[0] < lookback_length:
        raise ValueError(
            "Lookback length is greater than the number of points in the trajectory."
        )

    lookback_points = input_trajectory[-lookback_length:]
    time = np.arange(lookback_length + time_steps) / frequency
    input_time = time[:lookback_length]
    target_time = time[lookback_length:]
    x = lookback_points[:, 0]
    y = lookback_points[:, 1]

    if curve_type == "constrained_quadratic":
        if constraints is None:
            raise ValueError(
                "Constraints must be provided if curve_type is constrained_quadratic."
            )
        fx = fit_quadratic_with_constraints(
            input_time, x, constraints["max_speed"], constraints["max_accel"],
            domain=[time[0], time[-1]],
        )
        fy = fit_quadratic_with_constraints(
            input_time, y, constraints["max_speed"], constraints["max_accel"],
            domain=[time[0], time[-1]],
        )
        new_x = fx[0] * target_time**2 + fx[1] * target_time + fx[2]
        new_y = fy[0] * target_time**2 + fy[1] * target_time + fy[2]
    else:
        degree = {"linear": 1, "quadratic": 2}.get(curve_type)
        if degree is None:
            raise ValueError(
                "Invalid curve_type. Choose from 'linear', 'quadratic', "
                "'constrained_quadratic'."
            )
        fit_x = np.polynomial.Polynomial.fit(
            input_time, x, degree, domain=[input_time[0], input_time[-1]]
        )
        fit_y = np.polynomial.Polynomial.fit(
            input_time, y, degree, domain=[input_time[0], input_time[-1]]
        )
        new_x = fit_x(target_time)
        new_y = fit_y(target_time)

    return np.stack((new_x, new_y), axis=-1)


def estimate_pci(
    input_trajectory,
    target_trajectory,
    curve_type: Literal["linear", "quadratic", "constrained_quadratic"] = "linear",
    lookback_length: int = 6,
    constraints: Optional[dict] = None,
    frequency: float = 30,
    measure: Literal["mse", "frechet"] = "frechet",
    return_regular_trajectory: bool = False,
):
    """Estimate the PCI of a target trajectory from an input trajectory.

    Reference API (pci.py:220-275). For bulk index builds prefer
    :func:`estimate_pci_batch`.
    """
    regular_trajectory = estimate_regular_trajectory(
        input_trajectory,
        len(target_trajectory),
        curve_type,
        lookback_length,
        constraints,
        frequency,
    )
    trajectory_pci = pci(np.asarray(target_trajectory), regular_trajectory, measure)
    if return_regular_trajectory:
        return trajectory_pci, regular_trajectory
    return trajectory_pci


def _polyfit_extrapolate(
    lookback: jnp.ndarray,
    input_time: jnp.ndarray,
    target_time: jnp.ndarray,
    degree: int,
) -> jnp.ndarray:
    """Closed-form least-squares polynomial fit + extrapolation (jittable).

    Matches ``numpy.polynomial.Polynomial.fit`` numerics: the fit runs in the
    mapped variable s in [-1, 1] over domain [t0, t_last] for conditioning.

    lookback: (L, 2); returns (T, 2).
    """
    t0 = input_time[0]
    t1 = input_time[-1]
    scale = 2.0 / (t1 - t0)
    s_in = (input_time - t0) * scale - 1.0  # (L,)
    s_out = (target_time - t0) * scale - 1.0  # (T,)

    # Vandermonde in the mapped variable.
    powers = jnp.arange(degree + 1)
    v_in = s_in[:, None] ** powers[None, :]  # (L, deg+1)
    v_out = s_out[:, None] ** powers[None, :]  # (T, deg+1)

    # Normal equations (L is tiny — 6 — so this is exact & cheap). Matmuls
    # pinned to highest precision: on TPU the default bf16 MXU passes cost
    # ~0.2% PCI error, which matters near filtering thresholds.
    hi = jax.lax.Precision.HIGHEST
    gram = jnp.matmul(v_in.T, v_in, precision=hi)  # (deg+1, deg+1)
    rhs = jnp.matmul(v_in.T, lookback, precision=hi)  # (deg+1, 2)
    coeffs = jnp.linalg.solve(gram, rhs)  # (deg+1, 2)
    return jnp.matmul(v_out, coeffs, precision=hi)  # (T, 2)


@partial(jax.jit, static_argnames=("degree", "lookback_length", "frequency"))
def _estimate_pci_batch_jit(
    inputs: jnp.ndarray,
    targets: jnp.ndarray,
    degree: int,
    lookback_length: int,
    frequency: float,
) -> jnp.ndarray:
    n_target = targets.shape[1]
    time = jnp.arange(lookback_length + n_target, dtype=jnp.float32) / frequency
    input_time = time[:lookback_length]
    target_time = time[lookback_length:]

    lookback = inputs[:, -lookback_length:, :].astype(jnp.float32)
    regular = jax.vmap(
        lambda lb: _polyfit_extrapolate(lb, input_time, target_time, degree)
    )(lookback)
    return frechet_distance_batch(targets.astype(jnp.float32), regular)


def estimate_pci_batch(
    inputs,
    targets,
    curve_type: Literal["linear", "quadratic"] = "linear",
    lookback_length: int = 6,
    frequency: float = 30,
) -> np.ndarray:
    """Batched, jitted PCI for index builds: ``(B, Lin, 2) x (B, T, 2) -> (B,)``.

    One XLA call replaces the reference's per-window Python loop
    (reference ``io/dataset.py:991-1031``). Fréchet measure only (the
    reference's default and the only measure it uses on the data path).
    """
    degree = {"linear": 1, "quadratic": 2}[curve_type]
    out = _estimate_pci_batch_jit(
        jnp.asarray(inputs), jnp.asarray(targets), degree, lookback_length, float(frequency)
    )
    return np.asarray(out)
