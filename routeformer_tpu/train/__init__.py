"""Training layer: loss composition, train/eval steps, the multi-model
lockstep trainer, checkpointing and metric reporting.

Replaces the reference's Lightning ``ParallelTrainer``
(``experiments/full_comparison.py:152-711``) with pure-functional jitted
steps over a device mesh.
"""

from routeformer_tpu.train.losses import TrainingLosses, routeformer_training_loss


def __getattr__(name):
    if name == "ParallelTrainer":
        from routeformer_tpu.train.trainer import ParallelTrainer

        return ParallelTrainer
    if name == "CheckpointManager":
        from routeformer_tpu.train.checkpoints import CheckpointManager

        return CheckpointManager
    if name == "MetricsLogger":
        from routeformer_tpu.train.logging import MetricsLogger

        return MetricsLogger
    if name == "maybe_split_video":
        from routeformer_tpu.train.trainer import maybe_split_video

        return maybe_split_video
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


__all__ = [
    "TrainingLosses",
    "routeformer_training_loss",
    "ParallelTrainer",
    "CheckpointManager",
    "MetricsLogger",
    "maybe_split_video",
]
