"""Ahead-of-time model export for serving (StableHLO via ``jax.export``).

The reference has no deployment story (inference = calling the Lightning
module in Python). For a TPU-native production pipeline, the natural
artifact is an exported StableHLO computation: compiled once, serialized,
and reloaded without the Python model code — loadable from any
jax.export-compatible runtime (including future jax versions per its
compatibility guarantees).

The exported function is ``(params_and_state, batch) -> predictions`` on
the model in eval mode, with MC-sampling disabled (deterministic serving).
"""

from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx


def _eval_forward(model):
    """Split an eval-mode model into a pure forward over FLAT state leaves.

    jax.export can only serialize standard pytree containers, so the
    exported function signature is ``(list_of_arrays, dict_of_arrays)``;
    the nnx State treedef stays in the Python closure (and is rebuilt from
    the architecture template at load time).
    """
    model.eval()
    graphdef, state = nnx.split(model)
    leaves, treedef = jax.tree.flatten(state)

    def forward(leaves, batch):
        st = jax.tree.unflatten(treedef, leaves)
        m = nnx.merge(graphdef, st)
        out = m(batch)
        return out[0] if isinstance(out, tuple) else out

    return forward, leaves


def export_model(
    model,
    example_batch: Dict[str, jnp.ndarray],
    platforms: Optional[Sequence[str]] = None,
) -> bytes:
    """Export an eval-mode forward to a serialized StableHLO artifact.

    ``platforms`` defaults to the current backend; pass e.g. ``("tpu",)`` or
    ``("cpu", "tpu")`` to fix the deployment targets.
    """
    from jax import export as jax_export

    forward, leaves = _eval_forward(model)
    batch = {k: jnp.asarray(v) for k, v in example_batch.items()}
    exported = jax_export.export(
        jax.jit(forward),
        platforms=tuple(platforms) if platforms else None,
    )(leaves, batch)
    return bytes(exported.serialize())


class ExportedModel:
    """A deserialized serving artifact: holds the weight leaves captured at
    load time and exposes ``__call__(batch)``."""

    def __init__(self, data: bytes, leaves):
        from jax import export as jax_export

        self._exported = jax_export.deserialize(data)
        self._leaves = list(leaves)

    def __call__(self, batch: Dict[str, jnp.ndarray]) -> jnp.ndarray:
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        return self._exported.call(self._leaves, batch)


def _is_key(leaf) -> bool:
    return jnp.issubdtype(jnp.asarray(leaf).dtype, jax.dtypes.prng_key)


def save_serving_bundle(path, model, example_batch, platforms=None) -> None:
    """Write a self-contained serving bundle: StableHLO + weight leaves.

    Typed rng-key leaves are stored as ``None`` (they are not picklable as
    plain arrays and serving is deterministic); the loader keeps the
    template's keys at those positions.
    """
    import pickle
    from pathlib import Path

    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    data = export_model(model, example_batch, platforms=platforms)
    (path / "model.stablehlo").write_bytes(data)
    _, leaves = _eval_forward(model)
    payload = [None if _is_key(v) else np.asarray(v) for v in leaves]
    with open(path / "state.pkl", "wb") as fh:
        pickle.dump(payload, fh)


def load_serving_bundle(path, model_template) -> ExportedModel:
    """Load a bundle saved by :func:`save_serving_bundle`.

    ``model_template`` is a freshly constructed model of the same
    architecture (provides the leaf structure; its weights are replaced by
    the bundle's).
    """
    import pickle
    from pathlib import Path

    path = Path(path)
    data = (path / "model.stablehlo").read_bytes()
    _, template = _eval_forward(model_template)
    with open(path / "state.pkl", "rb") as fh:
        payload = pickle.load(fh)
    if len(payload) != len(template):
        raise ValueError(
            f"bundle has {len(payload)} leaves, template {len(template)} — "
            "architecture mismatch"
        )
    leaves = [
        t if p is None else jnp.asarray(p) for t, p in zip(template, payload)
    ]
    return ExportedModel(data, leaves)
