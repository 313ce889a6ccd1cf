"""Grouped AdamW optimizer builder (optax).

Capability parity with the reference training driver's optimizer wiring
(reference ``experiments/full_comparison.py:681-711``): AdamW with weight
decay, a *separate low-LR parameter group* for the video backbone (the
reference hardcodes 1e-6 there), warmup-cosine scheduling, and global
grad-norm clipping (reference ``full_comparison.py:829-830``, clip 2.5 —
Lightning clips before the optimizer; here clipping is the first link of the
optax chain, same effective semantics).

Param groups are selected by a label function over the parameter path
(``optax.multi_transform``), replacing torch's param-group lists.
"""

from typing import Callable, Optional

import optax

from routeformer_tpu.optimizers.schedule import linear_warmup_cosine_annealing


def build_optimizer(
    learning_rate: float = 1e-5,
    weight_decay: float = 1e-4,
    video_backbone_lr: Optional[float] = 1e-6,
    warmup_epochs: int = 2,
    max_epochs: int = 200,
    steps_per_epoch: int = 1,
    gradient_clip_val: Optional[float] = 2.5,
    label_fn: Optional[Callable] = None,
) -> optax.GradientTransformation:
    """Build the training optimizer.

    Parameters
    ----------
    label_fn : callable, optional
        Maps the param pytree to a pytree of labels in
        ``{"default", "video_backbone"}``. Defaults to labeling any path that
        contains a ``video_backbone`` key as the low-LR group — matching how
        the reference selects ``model.video_backbone.parameters()``.
    """

    def make_group(base_lr):
        sched = linear_warmup_cosine_annealing(
            base_lr,
            warmup_epochs=warmup_epochs,
            max_epochs=max_epochs,
            steps_per_epoch=steps_per_epoch,
        )
        return optax.adamw(learning_rate=sched, weight_decay=weight_decay)

    if video_backbone_lr is None:
        tx = make_group(learning_rate)
    else:
        if label_fn is None:
            def label_fn(params):
                import jax

                flat = jax.tree_util.tree_flatten_with_path(params)[0]
                labels = {}

                def assign(path):
                    return (
                        "video_backbone"
                        if any("video_backbone" in str(k) for k in path)
                        else "default"
                    )

                paths = [p for p, _ in flat]
                treedef = jax.tree_util.tree_structure(params)
                labels = jax.tree_util.tree_unflatten(
                    treedef, [assign(p) for p in paths]
                )
                return labels

        tx = optax.multi_transform(
            {
                "default": make_group(learning_rate),
                "video_backbone": make_group(video_backbone_lr),
            },
            label_fn,
        )

    if gradient_clip_val is not None:
        tx = optax.chain(optax.clip_by_global_norm(gradient_clip_val), tx)
    return tx
