"""Device mesh construction and sharding rules.

TPU-first replacement for the reference's NCCL/DDP wiring (reference
``experiments/full_comparison.py:794,823-837``): a 1-D or 2-D
``jax.sharding.Mesh`` with

- a ``data`` axis — batch dimension sharding (DP; gradient psum over ICI),
- an optional ``model`` axis — tensor-parallel sharding of large weight
  matrices (GSPMD inserts the all-gathers/reduce-scatters).

Sharding rules are structural: any 2-D+ parameter whose largest dim is
divisible by the model-axis size and at least ``min_shard_dim`` is sharded
along that dim; everything else is replicated. This keeps the rule robust
across the whole model zoo without per-layer annotations.
"""

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Create a ``(data, model)`` mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    assert n_data * n_model <= len(devices), (
        f"mesh {n_data}x{n_model} needs {n_data * n_model} devices, "
        f"have {len(devices)}"
    )
    grid = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def batch_spec() -> P:
    """PartitionSpec sharding the leading (batch) dim over the data axis."""
    return P(DATA_AXIS)


def shard_batch(batch, mesh: Mesh):
    """Device-put a batch pytree with batch-dim sharding over ``data``."""
    sharding = NamedSharding(mesh, P(DATA_AXIS))

    def put(x):
        spec = P(DATA_AXIS, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    del sharding
    return jax.tree.map(put, batch)


def param_spec(x, n_model: int, min_shard_dim: int = 512) -> P:
    """Structural tensor-parallel rule for one parameter."""
    if n_model <= 1 or x.ndim < 2:
        return P()
    dims = list(x.shape)
    largest = int(np.argmax(dims))
    if dims[largest] % n_model == 0 and dims[largest] >= min_shard_dim:
        spec = [None] * x.ndim
        spec[largest] = MODEL_AXIS
        return P(*spec)
    return P()


def shard_params(params, mesh: Mesh, min_shard_dim: int = 512):
    """Device-put a parameter pytree: TP-shard large matrices, replicate rest."""
    n_model = mesh.shape[MODEL_AXIS]

    def put(x):
        spec = param_spec(x, n_model, min_shard_dim)
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, params)


def param_shardings(params, mesh: Mesh, min_shard_dim: int = 512):
    """NamedSharding pytree matching :func:`shard_params` (for jit in_shardings)."""
    n_model = mesh.shape[MODEL_AXIS]
    return jax.tree.map(
        lambda x: NamedSharding(mesh, param_spec(x, n_model, min_shard_dim)), params
    )
