"""Multi-model lockstep trainer.

Capability parity with the reference ``ParallelTrainer``
(``experiments/full_comparison.py:152-711``): a dict of candidate models is
trained *simultaneously on identical batches with one optimizer* — same
data, same shuffle, one summed loss — and evaluated with the 5-forward
Monte-Carlo protocol under a fixed seed, with PCI-bucketed reporting.

TPU-native design:

- the combined train step (all models' forwards + one summed backward +
  AdamW) is ONE jitted program; models named ``*baseline*`` are excluded
  from the loss, as in the reference (full_comparison.py:477);
- epoch is a traced scalar (discount schedule, dense-loss activation, LR
  schedule) — no recompiles across the 200-epoch run;
- eval MC-averaging reproduces the reference's ``torch.manual_seed(12345)``
  + 5 stochastic forwards (full_comparison.py:654-679): in eval the only
  stochastic component is ProbSparse key sampling, so eval re-enables it
  with a reseeded stream and averages 5 forwards inside one jit;
- DDP is replaced by the (data, model) mesh of ``routeformer_tpu.parallel``:
  pass ``mesh=`` and the lockstep step jits with the batch sharded over the
  ``data`` axis and large parameters tensor-sharded over ``model`` (GSPMD
  inserts the gradient psum that NCCL all-reduce did).
"""

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import nnx
from jax.sharding import NamedSharding, PartitionSpec as P

from routeformer_tpu.models.layers.attention import ProbAttention
from routeformer_tpu.score.error import ade_per_sample, fde_per_sample
from routeformer_tpu.train.losses import TrainingLosses, routeformer_training_loss
from routeformer_tpu.train.metrics import GEM_QUARTILES, bucketed_eval_metrics
from routeformer_tpu.utils.logging import get_logger

logger = get_logger("trainer")

EVAL_SEED = 12345  # reference full_comparison.py:655
MC_SAMPLES = 5


def set_mc_sampling(model: nnx.Module, enabled: bool) -> None:
    """Toggle ProbSparse sampling stochasticity for eval MC-averaging."""
    for _, module in nnx.iter_modules(model):
        if isinstance(module, ProbAttention):
            module.deterministic = not enabled


def maybe_split_video(batch: dict, enabled: bool = True) -> dict:
    """DR(eye)VE left-video split (reference full_comparison.py:534-551):
    the garmin view is cut into left/right halves to feed the two-view
    model. Non-mutating: returns a new batch dict (the input's phase dicts
    are never written), so callers may cache and reuse batch dicts across
    epochs; feeding the returned batch back in is a no-op (``right_video``
    already present)."""
    if not enabled:
        return batch
    out = dict(batch)
    for phase in ("train", "target"):
        videos = batch.get(phase, {})
        if "left_video" not in videos or "right_video" in videos:
            continue
        videos = dict(videos)
        full = videos["left_video"]
        width = full.shape[3]
        videos["right_video"] = full[:, :, :, int(0.5 * width) :]
        videos["left_video"] = full[:, :, :, : int(0.5 * width)]
        out[phase] = videos
    return out


class ParallelTrainer:
    """Train all candidate models in lockstep with one optimizer."""

    def __init__(
        self,
        models: Dict[str, nnx.Module],
        tx: optax.GradientTransformation,
        config,
        quartiles: Optional[Dict[str, float]] = None,
        loss_fn: Optional[Callable] = None,
        mesh=None,
        min_shard_dim: int = 512,
        unfreeze_epoch: Optional[int] = 10,
        feature_cache_active: bool = False,
        fsdp: bool = False,
    ):
        self.model_names = list(models.keys())
        self.config = config
        self.quartiles = quartiles or GEM_QUARTILES
        self.losses = TrainingLosses.from_config(config)
        self.tx = tx
        self._loss_fn = loss_fn or self._default_loss_fn
        self.mesh = mesh
        self.min_shard_dim = min_shard_dim
        # Reference epoch-10 video-backbone unfreeze threshold
        # (TimmBackbone.py:123: requires_grad_(current_epoch > 10));
        # None disables the unfreeze entirely.
        self.unfreeze_epoch = unfreeze_epoch
        # An active feature precomputer / embedding cache serves frozen
        # construction-time features: unfreezing would train a backbone
        # whose outputs the step never sees. Fail FAST here — not at the
        # epoch boundary, which would kill a long cached run after ~10
        # epochs of compute and wedge resume (restore lands back on the
        # boundary). Callers must pass unfreeze_epoch=None for cached runs.
        self.feature_cache_active = feature_cache_active
        if feature_cache_active and unfreeze_epoch is not None:
            raise ValueError(
                "feature_cache_active with unfreeze_epoch="
                f"{unfreeze_epoch}: cached runs keep serving frozen "
                "construction-time features past the unfreeze boundary and "
                "would silently diverge. Pass unfreeze_epoch=None (train "
                "fully frozen) or disable the embedding cache."
            )
        self._unfrozen = False

        self.graphdefs = {}
        self.params = {}
        self.states = {}
        for name, model in models.items():
            model.train()
            gd, p, s = nnx.split(model, nnx.Param, ...)
            self.graphdefs[name] = gd
            self.params[name] = p
            self.states[name] = s

        self.opt_state = tx.init(self.params)

        self._shardings = None
        if mesh is not None:
            from routeformer_tpu.parallel.mesh import param_shardings

            # fsdp: large params + optimizer slots shard over the data
            # axis too (ZeRO-3 memory regime; GSPMD inserts the
            # all-gathers/reduce-scatters — identical math to plain DP).
            # param_shardings is the single source of the structural rule.
            replicated = NamedSharding(mesh, P())
            p_shard = param_shardings(
                self.params, mesh, min_shard_dim, fsdp=fsdp
            )
            s_shard = jax.tree.map(lambda x: replicated, self.states)
            o_shard = param_shardings(
                self.opt_state, mesh, min_shard_dim, fsdp=fsdp
            )
            self.params = jax.tree.map(jax.device_put, self.params, p_shard)
            self.states = jax.tree.map(jax.device_put, self.states, s_shard)
            self.opt_state = jax.tree.map(
                jax.device_put, self.opt_state, o_shard
            )
            self._shardings = (p_shard, s_shard, o_shard)

        self._train_step = None
        self._apply_step = None
        self._eval_steps = {}
        self._zero_grads: Dict[str, object] = {}
        self.epoch = 0

    def _place_batch(self, batch):
        """Shard the batch dim over the mesh ``data`` axis (DDP input split,
        reference full_comparison.py:766-768, 794)."""
        if self.mesh is None:
            return jax.tree.map(jnp.asarray, batch)
        from routeformer_tpu.parallel.mesh import place_batch_leaf

        return jax.tree.map(
            lambda x: place_batch_leaf(jnp.asarray(x), self.mesh), batch
        )

    # ------------------------------------------------------------------ #

    def _default_loss_fn(self, name, model, inp, tgt, epoch):
        # GIMO/MultiModal models use their own loss objects in the reference
        # (full_comparison.py:480-489) but those are configured identically
        # to the trajectory loss; the dispatch is kept for parity.
        return routeformer_training_loss(model, inp, tgt, epoch, self.losses)

    def _build_grad_step(self, name):
        """Per-model gradient program: loss + grads, NO optimizer update.

        The lockstep step is deliberately split into one program per model
        plus one optimizer program (``_build_apply_step``) rather than one
        monolith: the math is identical (the gradient of the summed loss is
        the per-model gradients side by side; the global clip happens in
        the optimizer program over ALL models' grads), but each compiled
        program stays small — the 13-model monolith took the remote-tunnel
        compiler minutes, and its thousands of independent collectives
        deadlocked XLA:CPU's concurrent thunk executor on the virtual mesh
        (devices entered independent collectives in different orders).
        """
        graphdef = self.graphdefs[name]
        loss_fn = self._loss_fn

        def grad_step(params, state, inp, tgt, epoch):
            from routeformer_tpu.ops.image import dequantize_videos

            # uint8 wire-format batches convert on-device (trace-time
            # dtype dispatch; f16 batches pass through untouched)
            inp, tgt = dequantize_videos(inp), dequantize_videos(tgt)
            model = nnx.merge(graphdef, params, state)

            def model_loss(m):
                return loss_fn(name, m, inp, tgt, epoch)

            (loss, metrics), grads = nnx.value_and_grad(
                model_loss, has_aux=True
            )(model)
            _, _, new_state = nnx.split(model, nnx.Param, ...)
            return grads, new_state, loss, metrics

        if self._shardings is not None:
            p_shard, s_shard, _ = self._shardings
            return jax.jit(
                grad_step,
                in_shardings=(p_shard[name], s_shard[name], None, None, None),
                # grads leave with the params' shardings so the optimizer
                # program consumes them without resharding
                out_shardings=(p_shard[name], s_shard[name], None, None),
                donate_argnums=(1,),
            )
        return jax.jit(grad_step, donate_argnums=(1,))

    def _build_apply_step(self):
        """One optimizer program over the full model dict: the summed-loss
        update with ONE global gradient clip across all models (reference
        full_comparison.py:470-531 + Lightning grad-clip 2.5 :829-830)."""
        tx = self.tx

        baseline_names = frozenset(
            n for n in self.model_names if "baseline" in n
        )

        def apply_step(params, grads, opt_state):
            updates, new_opt = tx.update(grads, opt_state, params)
            # Baselines are excluded from optimization in the reference
            # (full_comparison.py:470-531 never materializes their grads);
            # zeroing their UPDATES (not just grads) keeps AdamW's
            # decoupled weight decay from shrinking any parameters a
            # baseline might carry.
            updates = {
                n: (
                    jax.tree.map(jnp.zeros_like, u)
                    if n in baseline_names
                    else u
                )
                for n, u in updates.items()
            }
            return optax.apply_updates(params, updates), new_opt

        if self._shardings is not None:
            p_shard, _, o_shard = self._shardings
            return jax.jit(
                apply_step,
                in_shardings=(p_shard, p_shard, o_shard),
                donate_argnums=(0, 2),
            )
        return jax.jit(apply_step, donate_argnums=(0, 2))

    def _apply_unfreeze(self):
        """Flip the epoch-10 video-backbone unfreeze when the boundary is
        crossed (reference TimmBackbone.py:123:
        ``self.Backbone.requires_grad_(self.current_epoch > 10)``).

        Flipping ``unfreeze`` on the backbone modules removes their
        ``stop_gradient`` (photometric augs stay gated on
        ``train_backbone`` only, matching reference TimmBackbone.py:174-175
        — an unfreeze-only run never augments); the changed graphdef
        forces a ONE-TIME recompile of the train/eval programs at the
        boundary (the alternative — a traced-epoch grad mask — would keep
        one program but pay the full backbone backward on every pre-10
        step). The 1e-6 video-backbone optimizer group
        (optimizers/optimizer.py, reference full_comparison.py:697-699)
        engages automatically once gradients flow."""
        if self.unfreeze_epoch is None:
            return
        want = self.epoch > self.unfreeze_epoch
        if want == self._unfrozen:
            return
        # Normally unreachable (the constructor rejects the combination);
        # kept as a safety net for post-construction mutation of
        # feature_cache_active (e.g. a driver enabling a cache mid-run).
        if want and self.feature_cache_active:
            raise RuntimeError(
                f"epoch {self.epoch}: video-backbone unfreeze crossed while "
                "a feature precomputer/embedding cache is active — cached "
                "runs would keep serving frozen construction-time features "
                "and silently diverge from non-cache runs. Disable the "
                "embedding cache for runs past the unfreeze epoch, or pass "
                "unfreeze_epoch=None to train fully frozen."
            )
        any_changed = False
        for name in self.model_names:
            model = nnx.merge(
                self.graphdefs[name], self.params[name], self.states[name]
            )
            changed = False
            for _, module in nnx.iter_modules(model):
                # Only modules that opt in (epoch_unfreeze=True, the
                # timm-encoder backbones) flip: the reference's epoch-10
                # unfreeze exists only in TimmBackbone.forward
                # (TimmBackbone.py:123); InverseForm keeps its static
                # partial-freeze semantics.
                if (
                    getattr(module, "epoch_unfreeze", False)
                    and hasattr(module, "unfreeze")
                    and module.unfreeze != want
                ):
                    module.unfreeze = want
                    changed = True
            if changed:
                gd, p, s = nnx.split(model, nnx.Param, ...)
                self.graphdefs[name] = gd
                self.params[name] = p
                self.states[name] = s
                any_changed = True
        self._unfrozen = want
        if any_changed:
            logger.info(
                "epoch %d: video-backbone unfreeze -> %s (one-time recompile)",
                self.epoch,
                want,
            )
            self._train_step = None
            self._eval_steps = {}

    def training_step(self, batch: dict) -> Dict[str, float]:
        """One lockstep update on one batch (reference full_comparison.py:470-531)."""
        self._apply_unfreeze()
        if self._train_step is None:
            self._train_step = {
                n: self._build_grad_step(n)
                for n in self.model_names
                if "baseline" not in n
            }
            self._apply_step = self._build_apply_step()
        inp = self._place_batch(batch["train"])
        tgt = self._place_batch(batch["target"])
        epoch = jnp.asarray(self.epoch)

        metrics: Dict[str, jnp.ndarray] = {}
        grads = {}
        total = 0.0
        for name in self.model_names:
            if "baseline" in name:
                # Baseline models have no loss -> zero grads for optax
                # (their UPDATES are also zeroed in the apply step so
                # weight decay never touches them). Cached: grads are not
                # donated, so one zero tree serves every step.
                if name not in self._zero_grads:
                    self._zero_grads[name] = jax.tree.map(
                        jnp.zeros_like, self.params[name]
                    )
                grads[name] = self._zero_grads[name]
                continue
            g, self.states[name], loss, m_metrics = self._train_step[name](
                self.params[name], self.states[name], inp, tgt, epoch
            )
            grads[name] = g
            total = total + loss
            for k, v in m_metrics.items():
                metrics[f"train_{k}_{name}"] = v

        self.params, self.opt_state = self._apply_step(
            self.params, grads, self.opt_state
        )
        metrics["train_total_loss"] = total
        return metrics

    # ------------------------------------------------------------------ #

    def eval_batch_raw(self, batch: dict):
        """Per-sample MC-averaged eval arrays for one batch.

        Returns ``(pcis, {model: (losses, ades, fdes)})`` with one entry per
        sample — the raw material for epoch-level aggregation (the reference
        logs per-step and lets Lightning's ``log_dict(sync_dist=True)``
        average over the epoch, full_comparison.py:645-651)."""
        inp = self._place_batch(batch["train"])
        target_gps = jnp.asarray(batch["target"]["gps"]).astype(jnp.float32)
        pcis = jnp.asarray(batch["pci"])
        epoch = jnp.asarray(self.epoch)

        raw = {}
        for name in self.model_names:
            if name not in self._eval_steps:
                # Switch the model into eval-with-MC-sampling mode ONCE —
                # the graphdef captures the mode; the reseed (the
                # torch.manual_seed(12345) equivalent) happens INSIDE the
                # jitted step, so per-batch host work is just the step call
                # (no re-merge/re-split per model per batch).
                model = nnx.merge(
                    self.graphdefs[name], self.params[name], self.states[name]
                )
                model.eval()
                set_mc_sampling(model, True)
                gd, _, _ = nnx.split(model, nnx.Param, ...)
                self._eval_steps[name] = self._build_eval_step_from(gd)
            step_fn = self._eval_steps[name]
            losses, ades, fdes = step_fn(
                self.params[name], self.states[name], inp, target_gps, epoch
            )
            raw[name] = (losses, ades, fdes)
        return pcis, raw

    def eval_step(self, batch: dict, split: str = "val") -> Dict[str, jnp.ndarray]:
        """MC-averaged eval of one batch + PCI-bucketed metrics
        (reference full_comparison.py:553-679)."""
        return self.evaluate([batch], split)

    def evaluate(self, batches, split: str = "val") -> Dict[str, jnp.ndarray]:
        """Epoch-level eval: accumulate per-sample arrays over all batches,
        then bucket ONCE — so the reported metric is the sample-weighted
        epoch mean, not the last batch (the reference's
        ``log_dict(sync_dist=True)`` epoch reduction,
        full_comparison.py:645-651)."""
        all_pcis = []
        acc: Dict[str, list] = {name: [] for name in self.model_names}
        for batch in batches:
            pcis, raw = self.eval_batch_raw(batch)
            all_pcis.append(np.asarray(pcis))
            for name, arrs in raw.items():
                acc[name].append(tuple(np.asarray(a) for a in arrs))
        if not all_pcis:
            return {}
        pcis = jnp.asarray(np.concatenate(all_pcis))
        metrics: Dict[str, jnp.ndarray] = {}
        for name in self.model_names:
            losses, ades, fdes = (
                jnp.asarray(np.concatenate([t[i] for t in acc[name]]))
                for i in range(3)
            )
            metrics.update(
                bucketed_eval_metrics(
                    f"{split}_{name}", pcis, losses, ades, fdes, self.quartiles
                )
            )
        return metrics

    def _build_eval_step_from(self, graphdef):
        losses = self.losses

        def eval_step(params, state, inp, target_gps, epoch):
            from routeformer_tpu.ops.image import dequantize_videos

            inp = dequantize_videos(inp)
            model = nnx.merge(graphdef, params, state)
            # Reseed dropout/sampling streams for reproducible MC eval
            # inside the compiled program (match_shape: scanned layer
            # stacks carry stacked keys). Every batch starts from the same
            # fixed stream — the reference's torch.manual_seed(12345)
            # before its 5 forwards (full_comparison.py:655).
            nnx.reseed(model, policy="match_shape", dropout=EVAL_SEED)
            preds = []
            for _ in range(MC_SAMPLES):
                out = model(inp)
                preds.append(out[0] if isinstance(out, tuple) else out)
            future_gps = jnp.stack(preds).mean(axis=0)

            per_sample_loss = jax.vmap(
                lambda p, t: losses.trajectory_loss(p[None], t[None], epoch)
            )(future_gps, target_gps)
            ades = ade_per_sample(future_gps, target_gps)
            fdes = fde_per_sample(future_gps, target_gps)
            return per_sample_loss, ades, fdes

        return jax.jit(eval_step)

    # ------------------------------------------------------------------ #

    def fit(
        self,
        train_batches,
        val_batches=None,
        epochs: int = 1,
        log_every: int = 10,
        on_metrics: Optional[Callable] = None,
    ):
        """Simple epoch loop over batch iterables (the Lightning Trainer role)."""
        history = []
        for epoch in range(self.epoch, self.epoch + epochs):
            self.epoch = epoch
            for i, batch in enumerate(train_batches):
                metrics = self.training_step(batch)
                if i % log_every == 0:
                    loss = float(metrics["train_total_loss"])
                    logger.info("epoch %d step %d loss %.4f", epoch, i, loss)
                    if on_metrics:
                        on_metrics("train", epoch, i, metrics)
            if val_batches is not None:
                val_metrics = self.evaluate(val_batches, "val")
                history.append(val_metrics)
                if on_metrics:
                    on_metrics("val", epoch, 0, val_metrics)
            # advance PAST the trained epoch: a second fit() continues from
            # the next one instead of re-training the last (and repeated
            # fit(epochs=1) calls actually progress the epoch-dependent
            # schedule — discount, dense-loss activation, unfreeze)
            self.epoch = epoch + 1
        return history
