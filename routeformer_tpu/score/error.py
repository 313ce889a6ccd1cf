"""Average and Final Displacement Error metrics (JAX).

Capability parity with reference ``routeformer/score/error.py:10-51``. The
reference's ``fde`` indexes ``[-1]`` on dim 0 and is therefore only correct
when called per-sample on a ``(T, 2)`` trajectory — exactly how the driver
uses it (reference ``experiments/full_comparison.py:667-674``). We keep that
per-sample contract and additionally expose batched variants used by the
vectorized eval loop (one fused XLA reduction instead of a Python loop over
samples).
"""

import jax.numpy as jnp


def ade(predicted_trajectory: jnp.ndarray, ground_truth_trajectory: jnp.ndarray):
    """Average Displacement Error: mean L2 distance over all points.

    Accepts any shape ``(..., 2)``; reduces to a scalar, matching the
    reference (reference score/error.py:10-30).
    """
    assert predicted_trajectory.shape == ground_truth_trajectory.shape, (
        "Predicted and ground truth trajectories must be of the same shape"
    )
    return jnp.linalg.norm(
        predicted_trajectory - ground_truth_trajectory, axis=-1
    ).mean()


def fde(predicted_trajectory: jnp.ndarray, ground_truth_trajectory: jnp.ndarray):
    """Final Displacement Error on a single ``(T, D)`` trajectory.

    L2 distance between the final points (reference score/error.py:32-51;
    per-sample call contract per full_comparison.py:667-674).
    """
    assert predicted_trajectory.shape == ground_truth_trajectory.shape, (
        "Predicted and ground truth trajectories must be of the same shape"
    )
    return jnp.linalg.norm(
        predicted_trajectory[-1] - ground_truth_trajectory[-1]
    )


def ade_per_sample(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Batched ADE: ``(B, T, D) -> (B,)`` mean displacement per sample."""
    assert pred.shape == target.shape
    return jnp.linalg.norm(pred - target, axis=-1).mean(axis=-1)


def fde_per_sample(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Batched FDE: ``(B, T, D) -> (B,)`` final-step displacement per sample."""
    assert pred.shape == target.shape
    return jnp.linalg.norm(pred[:, -1] - target[:, -1], axis=-1)
