"""Scoring/metrics layer (L2): displacement errors and Path Complexity Index."""

from routeformer_tpu.score.error import ade, ade_per_sample, fde, fde_per_sample
from routeformer_tpu.score.frechet import frechet_distance, frechet_distance_batch
from routeformer_tpu.score.pci import (
    estimate_pci,
    estimate_pci_batch,
    estimate_regular_trajectory,
    pci,
)

__all__ = [
    "ade",
    "fde",
    "ade_per_sample",
    "fde_per_sample",
    "frechet_distance",
    "frechet_distance_batch",
    "estimate_pci",
    "estimate_pci_batch",
    "estimate_regular_trajectory",
    "pci",
]
