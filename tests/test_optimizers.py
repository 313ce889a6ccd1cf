"""Tests for the LR schedule (vs the reference's closed form) and optimizer."""

import math

import jax.numpy as jnp
import numpy as np
import optax

from routeformer_tpu.optimizers import build_optimizer, linear_warmup_cosine_annealing


def closed_form_reference(epoch, base_lr, warmup_epochs, max_epochs, warmup_start_lr=0.0, eta_min=0.0):
    """The lightning-bolts closed form (reference lr_scheduler.py:113-139)."""
    if epoch < warmup_epochs:
        return warmup_start_lr + epoch * (base_lr - warmup_start_lr) / max(
            1, warmup_epochs - 1
        )
    return eta_min + 0.5 * (base_lr - eta_min) * (
        1 + math.cos(math.pi * (epoch - warmup_epochs) / (max_epochs - warmup_epochs))
    )


def test_schedule_matches_closed_form():
    sched = linear_warmup_cosine_annealing(1e-5, warmup_epochs=2, max_epochs=200)
    for epoch in [0, 1, 2, 3, 50, 100, 199, 200]:
        got = float(sched(epoch))
        expected = closed_form_reference(epoch, 1e-5, 2, 200)
        # schedule computes in float32; near cos(pi) the absolute value is
        # ~1e-10 of base_lr so allow a small absolute slack too
        np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-12)


def test_schedule_steps_per_epoch():
    sched = linear_warmup_cosine_annealing(1.0, 2, 10, steps_per_epoch=100)
    assert float(sched(0)) == float(sched(99))  # same epoch
    assert float(sched(100)) != float(sched(99))


def test_optimizer_param_groups():
    params = {
        "gps_backbone": {"w": jnp.ones((4, 4))},
        "video_backbone": {"w": jnp.ones((4, 4))},
    }
    tx = build_optimizer(
        learning_rate=1e-2,
        video_backbone_lr=1e-6,
        warmup_epochs=0,
        max_epochs=100,
        gradient_clip_val=None,
    )
    state = tx.init(params)
    grads = {
        "gps_backbone": {"w": jnp.ones((4, 4))},
        "video_backbone": {"w": jnp.ones((4, 4))},
    }
    updates, _ = tx.update(grads, state, params)
    # video-backbone updates must be ~4 orders of magnitude smaller
    main = float(jnp.abs(updates["gps_backbone"]["w"]).mean())
    video = float(jnp.abs(updates["video_backbone"]["w"]).mean())
    assert video < main * 1e-2


def test_gradient_clipping():
    params = {"w": jnp.ones((2,))}
    tx = build_optimizer(
        learning_rate=1.0,
        video_backbone_lr=None,
        warmup_epochs=0,
        max_epochs=10,
        gradient_clip_val=0.001,
    )
    state = tx.init(params)
    huge = {"w": jnp.full((2,), 1e6)}
    updates, _ = tx.update(huge, state, params)
    assert np.all(np.isfinite(np.asarray(updates["w"])))
