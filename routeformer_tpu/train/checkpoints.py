"""Checkpoint/resume via orbax.

Capability parity + extension over the reference's Lightning
``ModelCheckpoint`` wiring (``experiments/full_comparison.py:795-821``):
per-model checkpoints monitoring ``val_{model}_ade`` with ``save_top_k=1``
and full state. The reference never passes ``ckpt_path`` to ``fit``
(no resume); this implementation adds explicit ``restore`` wiring — the
resume path the reference lacks (SURVEY §5).
"""

import json
from pathlib import Path
from typing import Dict

import jax
import numpy as np

from routeformer_tpu.utils.logging import get_logger

logger = get_logger("train.checkpoints")


def _is_key_array(x) -> bool:
    import jax.dtypes

    return hasattr(x, "dtype") and jax.dtypes.issubdtype(
        x.dtype, jax.dtypes.prng_key
    )


def _rng_key_data(state):
    """RngState subtree with typed PRNG keys unwrapped to raw uint32."""
    from flax import nnx

    rng_state, _ = nnx.filter_state(state, nnx.RngState, ...)
    pure = rng_state.to_pure_dict()
    return jax.tree.map(
        lambda x: np.asarray(jax.random.key_data(x))
        if _is_key_array(x)
        else np.asarray(x),
        pure,
    )


def _restore_rng(state, restored_rng: dict):
    """Write restored key_data/counts back into the live RngState."""
    from flax import nnx

    rng_state, _ = nnx.filter_state(state, nnx.RngState, ...)
    pure = rng_state.to_pure_dict()

    def rebuild(old, new):
        if _is_key_array(old):
            impl = jax.random.key_impl(old)
            return jax.random.wrap_key_data(jnp_asarray_u32(new), impl=impl)
        return jax.numpy.asarray(new)

    merged = jax.tree.map(rebuild, pure, restored_rng)
    # merge into the FULL state dict and write through the top-level State
    # (the filtered view does not alias the parent's VariableStates)
    full = state.to_pure_dict()
    _deep_update(full, merged)
    state.replace_by_pure_dict(full)


def jnp_asarray_u32(x):
    import jax.numpy as jnp

    return jnp.asarray(x, dtype=jnp.uint32)


def _deep_update(dst: dict, src: dict):
    for k, v in src.items():
        if isinstance(v, dict) and isinstance(dst.get(k), dict):
            _deep_update(dst[k], v)
        else:
            dst[k] = v


class CheckpointManager:
    """Best-metric checkpointing for a ParallelTrainer's model dict."""

    def __init__(
        self,
        directory,
        monitor: str = "val_{name}_ade",
        mode: str = "min",
    ):
        self.directory = Path(directory)
        self.directory.mkdir(parents=True, exist_ok=True)
        self.monitor = monitor
        self.mode = mode
        self._best: Dict[str, float] = {}
        self._load_index()

        import orbax.checkpoint as ocp

        self._checkpointer = ocp.StandardCheckpointer()

    def _index_path(self) -> Path:
        return self.directory / "index.json"

    def _load_index(self):
        if self._index_path().exists():
            self._best = json.loads(self._index_path().read_text())

    def _save_index(self):
        self._index_path().write_text(json.dumps(self._best, indent=2))

    def _is_better(self, value: float, best: float) -> bool:
        return value < best if self.mode == "min" else value > best

    def maybe_save(self, trainer, val_metrics: Dict, epoch: int) -> Dict[str, bool]:
        """Save each model whose monitored metric improved.

        Returns {model_name: saved?}.
        """
        saved = {}
        for name in trainer.model_names:
            key = self.monitor.format(name=name)
            if key not in val_metrics:
                continue
            value = float(val_metrics[key])
            best = self._best.get(name, {}).get("value", np.inf if self.mode == "min" else -np.inf)
            if isinstance(best, dict):
                best = best["value"]
            if self._is_better(value, best):
                self._save_model(trainer, name, epoch, value)
                self._best[name] = {"value": value, "epoch": epoch, "metric": key}
                self._save_index()
                saved[name] = True
                logger.info("checkpointed %s at epoch %d (%s=%.4f)", name, epoch, key, value)
            else:
                saved[name] = False
        return saved

    def _model_dir(self, name: str) -> Path:
        return (self.directory / name).absolute()

    @staticmethod
    def _savable_state(trainer, name):
        """Model state minus rng keys/counters (keys are reseeded, never
        restored — typed PRNG arrays are not checkpoint-serializable)."""
        from flax import nnx

        _, rest = nnx.filter_state(
            trainer.states[name], nnx.RngState, ...
        )
        return rest

    def _save_model(self, trainer, name: str, epoch: int, value: float):
        target = self._model_dir(name)
        payload = {
            "params": jax.tree.map(np.asarray, trainer.params[name].to_pure_dict()),
            "state": jax.tree.map(
                np.asarray, self._savable_state(trainer, name).to_pure_dict()
            ),
        }
        path = target / "ckpt"
        if path.exists():
            import shutil

            shutil.rmtree(path)
        self._checkpointer.save(path, payload)
        self._checkpointer.wait_until_finished()

    def restore(self, trainer, name: str) -> bool:
        """Restore a model's best checkpoint into the trainer. Returns
        success."""
        path = self._model_dir(name) / "ckpt"
        if not path.exists():
            return False
        savable = self._savable_state(trainer, name)
        payload = {
            "params": jax.tree.map(np.asarray, trainer.params[name].to_pure_dict()),
            "state": jax.tree.map(np.asarray, savable.to_pure_dict()),
        }
        restored = self._checkpointer.restore(path, payload)
        trainer.params[name].replace_by_pure_dict(restored["params"])
        # merge restored non-rng state into the live state (rng keys kept)
        full = trainer.states[name].to_pure_dict()
        _deep_update(full, restored["state"])
        trainer.states[name].replace_by_pure_dict(full)
        return True

    def restore_all(self, trainer) -> int:
        """Restore every model with a saved checkpoint; return the epoch to
        resume from (1 past the newest restored checkpoint, 0 if none).

        This is the resume entry point the reference lacks (it never passes
        ``ckpt_path`` to ``fit``, full_comparison.py:838-842).
        """
        resume_epoch = 0
        for name in trainer.model_names:
            if self.restore(trainer, name):
                entry = self._best.get(name, {})
                resume_epoch = max(resume_epoch, int(entry.get("epoch", -1)) + 1)
                logger.info("restored %s (best %s)", name, entry)
        return resume_epoch

    # ------------------------------------------------------------------ #
    # latest-state (exact-resume) checkpointing
    # ------------------------------------------------------------------ #

    def _latest_dir(self) -> Path:
        return (self.directory / "_latest").absolute()

    def save_latest(self, trainer, epoch: int, next_batch: int = 0):
        """Full training-state snapshot for exact (mid-epoch) resume:
        every model's params + non-rng state, the optimizer state, and the
        input-pipeline position (epoch, next batch index). Extension over
        both the best-ADE snapshots above and the reference (which has no
        resume at all, and no dataset-state checkpointing — SURVEY §5).

        The write is crash-safe: the snapshot is written to a fresh temp
        directory and atomically renamed over ``_latest`` only after orbax
        reports it durable — a preemption mid-save leaves the previous
        snapshot intact instead of losing the only exact-resume state."""
        payload = {
            "params": {
                n: jax.tree.map(np.asarray, trainer.params[n].to_pure_dict())
                for n in trainer.model_names
            },
            "state": {
                n: jax.tree.map(
                    np.asarray, self._savable_state(trainer, n).to_pure_dict()
                )
                for n in trainer.model_names
            },
            # rng streams too (typed PRNG keys as raw key_data): resume is
            # then BIT-exact — without them, ProbSparse's sampled backward
            # accumulates in a different order and AdamW amplifies the f32
            # noise (the Lightning-checkpoint rng-state role).
            "rng": {
                n: jax.tree.map(np.asarray, _rng_key_data(trainer.states[n]))
                for n in trainer.model_names
            },
            "opt_state": jax.tree.map(np.asarray, trainer.opt_state),
        }
        import os
        import shutil

        final = self._latest_dir()
        tmp = final.with_name("_latest.tmp")
        old = final.with_name("_latest.old")
        # Crash recovery BEFORE treating tmp/old as stale: a crash inside a
        # previous save's two-rename swap can leave a complete snapshot
        # only under _latest.old (or a fully written _latest.tmp) with no
        # _latest at all — promote it instead of destroying the only
        # exact-resume state.
        if not final.exists():
            promoted = self._promotable(tmp, old)
            if promoted is not None:
                os.rename(promoted, final)
                logger.warning(
                    "recovered interrupted snapshot swap: promoted %s to "
                    "_latest", promoted.name,
                )
        for stale in (tmp, old):
            if stale.exists():
                shutil.rmtree(stale)
        tmp.mkdir(parents=True)
        self._checkpointer.save(tmp / "ckpt", payload)
        self._checkpointer.wait_until_finished()
        (tmp / "position.json").write_text(
            json.dumps({"epoch": int(epoch), "next_batch": int(next_batch)})
        )
        # Durable -> swap into place; delete the previous snapshot last.
        if final.exists():
            os.rename(final, old)
        os.rename(tmp, final)
        if old.exists():
            shutil.rmtree(old)

    def restore_latest(self, trainer):
        """Restore the latest full snapshot; returns ``(epoch, next_batch)``
        or ``None`` when no snapshot exists or its tree structure no longer
        matches the live trainer (e.g. an optimizer/rng config change since
        the save) — callers then fall back to ``restore_all``."""
        try:
            return self._restore_latest(trainer)
        except Exception as exc:  # noqa: BLE001 — degrade to best-ckpt path
            logger.warning(
                "latest-snapshot restore failed (%s: %s); falling back to "
                "best-metric checkpoints",
                type(exc).__name__,
                exc,
            )
            return None

    @staticmethod
    def _promotable(tmp: Path, old: Path):
        """A complete snapshot left behind by an interrupted swap, if any.

        ``position.json`` is written only after orbax reports the ckpt
        durable, so its presence marks a complete snapshot. ``tmp`` wins
        over ``old``: it is the newer state (the swap had not finished).
        """
        for cand in (tmp, old):
            if (cand / "ckpt").exists() and (cand / "position.json").exists():
                return cand
        return None

    def _restore_latest(self, trainer):
        latest = self._latest_dir()
        if not (latest / "ckpt").exists() or not (
            latest / "position.json"
        ).exists():
            # Interrupted swap: a complete snapshot may exist only under
            # _latest.tmp / _latest.old — promote and restore from it.
            import os

            promoted = self._promotable(
                latest.with_name("_latest.tmp"), latest.with_name("_latest.old")
            )
            if promoted is None:
                return None
            if latest.exists():
                import shutil

                shutil.rmtree(latest)
            os.rename(promoted, latest)
            logger.warning(
                "recovered interrupted snapshot swap: promoted %s to _latest",
                promoted.name,
            )
        path = self._latest_dir() / "ckpt"
        pos_path = self._latest_dir() / "position.json"
        if not path.exists() or not pos_path.exists():
            return None
        template = {
            "params": {
                n: jax.tree.map(np.asarray, trainer.params[n].to_pure_dict())
                for n in trainer.model_names
            },
            "state": {
                n: jax.tree.map(
                    np.asarray, self._savable_state(trainer, n).to_pure_dict()
                )
                for n in trainer.model_names
            },
            "rng": {
                n: jax.tree.map(np.asarray, _rng_key_data(trainer.states[n]))
                for n in trainer.model_names
            },
            "opt_state": jax.tree.map(np.asarray, trainer.opt_state),
        }
        restored = self._checkpointer.restore(path, template)
        for n in trainer.model_names:
            trainer.params[n].replace_by_pure_dict(restored["params"][n])
            full = trainer.states[n].to_pure_dict()
            _deep_update(full, restored["state"][n])
            trainer.states[n].replace_by_pure_dict(full)
            _restore_rng(trainer.states[n], restored["rng"][n])
        import jax.numpy as jnp

        trainer.opt_state = jax.tree.map(jnp.asarray, restored["opt_state"])
        pos = json.loads(pos_path.read_text())
        logger.info("restored latest snapshot at %s", pos)
        return int(pos["epoch"]), int(pos["next_batch"])

    @property
    def best(self) -> Dict:
        return dict(self._best)
