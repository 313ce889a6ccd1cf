"""External baseline zoo (reference ``experiments/{autobots,gimo,multimodal_transformer}``)."""

from routeformer_tpu.baselines.autobots import AutoBotAdapted, AutoBotEgo
from routeformer_tpu.baselines.gimo import AdaptedGIMO
from routeformer_tpu.baselines.multimodal_transformer import MultiModalTransformer

__all__ = [
    "AutoBotEgo",
    "AutoBotAdapted",
    "AdaptedGIMO",
    "MultiModalTransformer",
]
