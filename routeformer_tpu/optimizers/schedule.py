"""Linear-warmup + cosine-annealing LR schedule (optax).

Capability parity with reference ``routeformer/optimizers/lr_scheduler.py:27-139``
(the lightning-bolts ``LinearWarmupCosineAnnealingLR``), using its *closed
form* (reference lines 113-139):

- epoch < warmup:  ``warmup_start_lr + epoch * (base - warmup_start) / max(1, warmup_epochs - 1)``
- epoch >= warmup: ``eta_min + 0.5 * (base - eta_min) * (1 + cos(pi * (epoch - warmup) / (max - warmup)))``

Note the reference's warmup denominator is ``warmup_epochs - 1`` (it reaches
the base LR one epoch *before* warmup ends), preserved here.

The schedule is an ``optax`` step-indexed schedule; ``steps_per_epoch``
converts the reference's per-epoch stepping into per-step granularity
(``steps_per_epoch=1`` reproduces per-epoch stepping exactly).
"""

import jax.numpy as jnp


def linear_warmup_cosine_annealing(
    base_lr: float,
    warmup_epochs: int,
    max_epochs: int,
    warmup_start_lr: float = 0.0,
    eta_min: float = 0.0,
    steps_per_epoch: int = 1,
):
    """Build the schedule as an ``optax``-compatible ``step -> lr`` callable."""

    def schedule(step):
        epoch = jnp.asarray(step, dtype=jnp.float32) / float(steps_per_epoch)
        epoch = jnp.floor(epoch)

        warmup_denom = max(1, warmup_epochs - 1)
        warmup_lr = warmup_start_lr + epoch * (base_lr - warmup_start_lr) / warmup_denom

        progress = (epoch - warmup_epochs) / max(1, max_epochs - warmup_epochs)
        cosine_lr = eta_min + 0.5 * (base_lr - eta_min) * (
            1.0 + jnp.cos(jnp.pi * progress)
        )

        return jnp.where(epoch < warmup_epochs, warmup_lr, cosine_lr)

    return schedule
