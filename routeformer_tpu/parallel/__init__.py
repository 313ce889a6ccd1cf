"""Parallelism layer: device meshes, shardings, and distributed train steps.

Replaces the reference's only parallelism — Lightning
``DDPStrategy(process_group_backend="nccl")`` (reference
``experiments/full_comparison.py:794``) — with ``jax.sharding.Mesh`` +
jit shardings. Gradient all-reduce becomes an XLA ``psum`` over ICI inserted
by GSPMD; no explicit collectives are written by hand.

Beyond the reference's DP-only design, parameters can additionally be
sharded over a ``model`` axis (tensor parallelism via GSPMD partitioning of
the large FF/attention weights), which the reference has no equivalent for.
"""

from routeformer_tpu.parallel.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    make_mesh,
    shard_batch,
    shard_params,
)
from routeformer_tpu.parallel.train_step import make_train_step, make_eval_step

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "make_mesh",
    "shard_batch",
    "shard_params",
    "make_train_step",
    "make_eval_step",
]
