"""Data ingestion layer (L1): datasets, parsers, resampling, synthetic data."""

from routeformer_tpu.io.synthetic import SyntheticDataset, synthetic_batch


def __getattr__(name):
    if name == "GEMDataset":
        from routeformer_tpu.io.dataset import GEMDataset

        return GEMDataset
    if name == "DreyeveDataset":
        from routeformer_tpu.io.dataset_dreyeve import DreyeveDataset

        return DreyeveDataset
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


__all__ = ["GEMDataset", "DreyeveDataset", "SyntheticDataset", "synthetic_batch"]
