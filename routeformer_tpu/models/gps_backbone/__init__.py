"""GPS backbone zoo (reference ``routeformer/models/gps_backbone/__init__.py``).

Eight backbones: Informer (flagship), Transformer, Autoformer, FEDformer,
PatchTST, DLinear, NLinear, plus the Stationary/Linear trivial baselines.
"""

from routeformer_tpu.models.gps_backbone.config import (
    FEDFormerBackboneConfig,
    GPSBackboneConfig,
    LinearBackboneConfig,
    PatchTSTBackboneConfig,
)
from routeformer_tpu.models.gps_backbone.baselines import (
    LinearBaseline,
    StationaryBaseline,
)
from routeformer_tpu.models.gps_backbone.informer import Informer
from routeformer_tpu.models.gps_backbone.linear import DLinear, NLinear
from routeformer_tpu.models.gps_backbone.transformer import Transformer


def __getattr__(name):
    # Heavier backbones import lazily (wavelet filter tabulation etc.).
    if name == "Autoformer":
        from routeformer_tpu.models.gps_backbone.autoformer import Autoformer

        return Autoformer
    if name == "FEDformer":
        from routeformer_tpu.models.gps_backbone.fedformer import FEDformer

        return FEDformer
    if name == "PatchTST":
        from routeformer_tpu.models.gps_backbone.patchtst import PatchTST

        return PatchTST
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


__all__ = [
    "GPSBackboneConfig",
    "PatchTSTBackboneConfig",
    "FEDFormerBackboneConfig",
    "LinearBackboneConfig",
    "Autoformer",
    "FEDformer",
    "Informer",
    "LinearBaseline",
    "StationaryBaseline",
    "DLinear",
    "NLinear",
    "PatchTST",
    "Transformer",
]
