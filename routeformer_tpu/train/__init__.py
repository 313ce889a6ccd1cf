"""Training layer: loss composition, train/eval steps, the multi-model
lockstep trainer, checkpointing and metric reporting.

Replaces the reference's Lightning ``ParallelTrainer``
(``experiments/full_comparison.py:152-711``) with pure-functional jitted
steps over a device mesh.
"""

from routeformer_tpu.train.losses import TrainingLosses, routeformer_training_loss

__all__ = ["TrainingLosses", "routeformer_training_loss"]
