"""Routeformer-TPU: a TPU-native (JAX/XLA/Pallas/pjit) multimodal ego-trajectory
prediction framework.

Re-implements the full capability surface of the reference implementation of
"Leveraging Driver Field-of-View for Multimodal Ego-Trajectory Prediction"
(ICLR 2025) — datasets, model zoo, metrics, losses and the training driver —
re-designed TPU-first:

- compute path: JAX + XLA with Pallas kernels for the hot ops,
- parallelism: ``jax.sharding.Mesh`` + jit shardings (data / tensor axes)
  instead of DDP/NCCL,
- all train-time dynamism (epoch-scheduled discount, view/gaze dropout,
  autoregressive decode) is reformulated as *static-shape*, step-indexed
  inputs so one compiled XLA program covers the whole schedule.

Public surface mirrors the reference package root
(``/root/reference/routeformer/__init__.py:1-14``): ``GEMDataset``,
``DreyeveDataset``, ``Routeformer``, ``set_logger_config``.
"""

from routeformer_tpu.utils.logging import set_logger_config

# Configure logging from ROUTEFORMER_* env vars at import, matching the
# reference package root behavior (reference routeformer/__init__.py:14).
set_logger_config()


def __getattr__(name):
    # Lazy imports keep `import routeformer_tpu` light (no jax trace-time cost
    # and no io deps) while preserving the reference's flat public surface.
    if name == "Routeformer":
        from routeformer_tpu.models import Routeformer

        return Routeformer
    if name == "RouteformerConfig":
        from routeformer_tpu.models import RouteformerConfig

        return RouteformerConfig
    if name == "GEMDataset":
        from routeformer_tpu.io import GEMDataset

        return GEMDataset
    if name == "DreyeveDataset":
        from routeformer_tpu.io import DreyeveDataset

        return DreyeveDataset
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


__all__ = [
    "GEMDataset",
    "DreyeveDataset",
    "Routeformer",
    "RouteformerConfig",
    "set_logger_config",
]

__version__ = "0.1.0"
