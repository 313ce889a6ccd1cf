"""PCI-bucketed metric reporting.

Capability parity with the reference's eval reporting
(``experiments/full_comparison.py:563-651``): per-model loss/ADE/FDE are
bucketed by each sample's PCI into (a) dataset-specific quartile buckets
(<25%, 25-50%, 50-75%, 75-95%, >95%) and (b) absolute PCI bins (<20i,
20-40i, 40-60i, 60-80i, >80i); each family also reports the mean of bucket
means (``avg%`` / ``avgi``). Empty buckets report 0, matching the
reference's "log_dict is not happy" fallback (full_comparison.py:586-599).

Vectorized with masked reductions — jit-safe, no Python branching on data.
"""

from typing import Dict

import jax.numpy as jnp

# Hardcoded PCI quartile cutoffs (reference full_comparison.py:113-134).
GEM_QUARTILES = {"25%": 24.84, "50%": 31.27, "75%": 41.19, "95%": 62.55}
DREYEVE_QUARTILES = {"25%": 26.79, "50%": 36.33, "75%": 50.77, "95%": 78.02}


def _masked_mean(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    count = mask.sum()
    return jnp.where(count > 0, (x * mask).sum() / jnp.maximum(count, 1), 0.0)


def quartile_buckets(pcis: jnp.ndarray, quartiles: Dict[str, float]):
    return {
        "<25%": pcis < quartiles["25%"],
        "25-50%": (pcis > quartiles["25%"]) & (pcis < quartiles["50%"]),
        "50-75%": (pcis > quartiles["50%"]) & (pcis < quartiles["75%"]),
        "75-95%": (pcis > quartiles["75%"]) & (pcis < quartiles["95%"]),
        ">95%": pcis >= quartiles["95%"],
    }


def absolute_buckets(pcis: jnp.ndarray):
    return {
        "<20i": pcis < 20,
        "20-40i": (pcis > 20) & (pcis < 40),
        "40-60i": (pcis > 40) & (pcis < 60),
        "60-80i": (pcis > 60) & (pcis < 80),
        ">80i": pcis >= 80,
    }


def report_split(prefix, metrics, buckets, losses, ades, fdes, final_suffix):
    """Masked per-bucket means + mean-of-bucket-means
    (reference full_comparison.py:563-610)."""
    avg_losses, avg_ades, avg_fdes = [], [], []
    for suffix, mask in buckets.items():
        mask = mask.astype(jnp.float32)
        bucket_loss = _masked_mean(losses, mask)
        bucket_ade = _masked_mean(ades, mask)
        bucket_fde = _masked_mean(fdes, mask)
        avg_losses.append(bucket_loss)
        avg_ades.append(bucket_ade)
        avg_fdes.append(bucket_fde)
        metrics[f"{prefix}_loss_{suffix}"] = bucket_loss
        metrics[f"{prefix}_ade_{suffix}"] = bucket_ade
        metrics[f"{prefix}_fde_{suffix}"] = bucket_fde

    metrics[f"{prefix}_loss_{final_suffix}"] = jnp.stack(avg_losses).mean()
    metrics[f"{prefix}_ade_{final_suffix}"] = jnp.stack(avg_ades).mean()
    metrics[f"{prefix}_fde_{final_suffix}"] = jnp.stack(avg_fdes).mean()


def bucketed_eval_metrics(
    prefix: str,
    pcis: jnp.ndarray,
    losses: jnp.ndarray,
    ades: jnp.ndarray,
    fdes: jnp.ndarray,
    quartiles: Dict[str, float],
) -> Dict[str, jnp.ndarray]:
    """Full per-model eval metric dict (reference full_comparison.py:611-651)."""
    metrics = {
        f"{prefix}_loss": losses.mean(),
        f"{prefix}_ade": ades.mean(),
        f"{prefix}_fde": fdes.mean(),
    }
    report_split(
        prefix, metrics, quartile_buckets(pcis, quartiles), losses, ades, fdes, "avg%"
    )
    report_split(
        prefix, metrics, absolute_buckets(pcis), losses, ades, fdes, "avgi"
    )
    return metrics
