"""Metric streaming: JSONL logs + optional Weights & Biases.

Plays the role of the reference's ``WandbLogger`` wiring
(``experiments/full_comparison.py:772-791``). W&B is optional (zero-egress
environments get a local JSONL stream with the same content); run config is
recorded like the reference's ``save_hyperparameters``
(full_comparison.py:439-443).
"""

import json
import time
from pathlib import Path
from typing import Dict, Optional

from routeformer_tpu.utils.logging import get_logger

logger = get_logger("train.metrics")


class MetricsLogger:
    def __init__(
        self,
        log_dir,
        project: str = "routeformer_tpu",
        experiment: str = "run",
        config: Optional[dict] = None,
        use_wandb: bool = False,
    ):
        self.log_dir = Path(log_dir)
        self.log_dir.mkdir(parents=True, exist_ok=True)
        self.path = self.log_dir / f"{experiment}.metrics.jsonl"
        self._fh = open(self.path, "a")
        self._wandb = None

        if config is not None:
            (self.log_dir / f"{experiment}.config.json").write_text(
                json.dumps(_to_jsonable(config), indent=2, default=str)
            )

        if use_wandb:
            try:
                import wandb

                self._wandb = wandb.init(
                    project=project, name=experiment, config=config
                )
            except Exception as e:  # noqa: BLE001
                logger.warning("wandb unavailable (%s); falling back to JSONL", e)

    def log(self, metrics: Dict, step: int, split: str = "train"):
        record = {
            "time": time.time(),
            "step": step,
            "split": split,
            **{k: float(v) for k, v in metrics.items()},
        }
        self._fh.write(json.dumps(record) + "\n")
        self._fh.flush()
        if self._wandb is not None:
            self._wandb.log(record, step=step)

    def close(self):
        self._fh.close()
        if self._wandb is not None:
            self._wandb.finish()


def _to_jsonable(obj):
    if hasattr(obj, "to_dict"):
        return obj.to_dict()
    if isinstance(obj, dict):
        return {k: _to_jsonable(v) for k, v in obj.items()}
    return obj
