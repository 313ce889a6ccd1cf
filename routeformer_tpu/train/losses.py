"""Training-loss composition for Routeformer-family models.

Capability parity with the loss half of the reference training step
(``experiments/full_comparison.py:445-531``):

- trajectory loss: future-discounted smooth-l1 on predicted vs target GPS
  (``epsilon`` zone), epoch-scheduled discount;
- dense feature loss (when ``dense_prediction``): same loss on predicted vs
  *detached* target visual features (``visual_epsilon``), with the adaptive
  weight ``ratio * traj / max(dense, 1e-6)`` (detached), activated only
  after epoch 10 (reference :499-508);
- autoregressive models: losses computed on the first
  ``autoregressive_step_size`` steps and the trajectory loss rescaled by
  ``pred_len / step_size`` (reference :490-498).

All epoch-dependence enters through a traced scalar so the train step never
recompiles across epochs.
"""

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

from routeformer_tpu.losses import FutureDiscountedLoss
from routeformer_tpu.score.error import ade, fde_per_sample


@dataclass
class TrainingLosses:
    """The loss bundle the reference trainer builds once
    (full_comparison.py:445-468)."""

    trajectory_loss: FutureDiscountedLoss
    dense_loss: FutureDiscountedLoss

    @classmethod
    def from_config(cls, config) -> "TrainingLosses":
        return cls(
            trajectory_loss=FutureDiscountedLoss(
                config.discount_factor, config.epsilon, loss_function="smooth_l1"
            ),
            dense_loss=FutureDiscountedLoss(
                config.discount_factor, config.visual_epsilon,
                loss_function="smooth_l1",
            ),
        )


def routeformer_training_loss(
    model,
    input_batch: dict,
    target_batch: dict,
    epoch,
    losses: Optional[TrainingLosses] = None,
):
    """One model's training loss + metrics on one batch.

    Returns ``(total_loss, metrics_dict)``. ``epoch`` may be a traced scalar.
    """
    cfg = model.configs
    if losses is None:
        losses = TrainingLosses.from_config(cfg)

    target_gps = target_batch["gps"].astype(jnp.float32)
    metrics = {}

    if cfg.dense_prediction:
        future_gps, future_visual = model(input_batch)
        _, target_visual = model.preprocess_batch(target_batch, training=False)
        target_visual = target_visual[:, : future_visual.shape[1]]

        step = cfg.autoregressive_step_size
        if cfg.autoregressive:
            future_gps = future_gps[:, :step]
            target_gps_t = target_gps[:, :step]
        else:
            target_gps_t = target_gps
        traj = losses.trajectory_loss(future_gps, target_gps_t, epoch)
        if cfg.autoregressive:
            traj = traj * (cfg.gps_backbone_config.pred_len / step)

        target_visual = jax.lax.stop_gradient(target_visual)
        if cfg.autoregressive:
            future_visual = future_visual[:, :step]
            target_visual = target_visual[:, :step]
        dense = losses.dense_loss(future_visual, target_visual, epoch)
        dense_weight = jax.lax.stop_gradient(
            cfg.dense_loss_ratio * traj / jnp.maximum(dense, 1e-6)
        )
        dense_weight = jnp.where(jnp.asarray(epoch) < 10, 0.0, dense_weight)
        metrics["dense_loss"] = dense
        total = traj + dense_weight * dense
        target_gps_m = target_gps_t
    else:
        future_gps = model(input_batch)
        traj = losses.trajectory_loss(future_gps, target_gps, epoch)
        total = traj
        target_gps_m = target_gps

    metrics["loss"] = traj
    metrics["ade"] = ade(future_gps, target_gps_m)
    # The reference logs fde on the whole batch through the per-sample-only
    # fde (full_comparison.py:531 with error.py:32); we log the batch mean of
    # per-sample FDEs, which is the intended quantity.
    metrics["fde"] = fde_per_sample(future_gps, target_gps_m).mean()
    return total, metrics
