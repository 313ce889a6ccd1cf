"""Model layer (L3): Routeformer, GPS backbones, video backbones, fusion."""

from routeformer_tpu.models.cross_modal import PerceiveDecoder, PerceiveEncoder


def __getattr__(name):
    if name == "Routeformer":
        from routeformer_tpu.models.routeformer import Routeformer

        return Routeformer
    if name == "RouteformerConfig":
        from routeformer_tpu.models.config import RouteformerConfig

        return RouteformerConfig
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


__all__ = [
    "Routeformer",
    "RouteformerConfig",
    "PerceiveEncoder",
    "PerceiveDecoder",
]
