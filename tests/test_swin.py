"""Tests for the faithful SwinV2 backbone."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from flax import nnx

from routeformer_tpu.models.video_backbone import SwinV2Backbone, TimmBackboneConfig
from routeformer_tpu.models.video_backbone.swin import (
    _shift_attn_mask,
    window_partition,
    window_reverse,
)


def tiny_cfg(**kw):
    defaults = dict(
        model_type="swinv2_tiny_test", cache_enabled=False,
        compute_dtype="float32",
    )
    defaults.update(kw)
    return TimmBackboneConfig(**defaults)


class TestWindows:
    def test_partition_roundtrip(self, rng):
        x = jnp.asarray(rng.normal(size=(2, 8, 8, 3)).astype(np.float32))
        wins = window_partition(x, 4)
        assert wins.shape == (2 * 4, 4, 4, 3)
        back = window_reverse(wins, 4, 8, 8)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(x))

    def test_shift_mask_blocks_wrapped_regions(self):
        mask = _shift_attn_mask(8, 8, 4, 2)
        assert mask.shape == (4, 16, 16)
        # the top-left window has no wrapping -> zero mask
        np.testing.assert_array_equal(mask[0], 0.0)
        # the bottom-right window mixes 4 regions -> some -100 entries
        assert (mask[-1] == -100.0).any()


class TestSwinV2Backbone:
    def test_feature_shape_and_hierarchy(self, rng):
        model = SwinV2Backbone(tiny_cfg(), rngs=nnx.Rngs(0))
        model.eval()
        # tiny preset: img 32, patch 4 -> 8; one merge -> 4; dims 16 -> 32
        assert model.output_feature_shape == (4, 4, 32)
        x = jnp.asarray(rng.uniform(size=(2, 48, 64, 3)).astype(np.float32))
        out = model(x)
        assert out.shape == (2, 4, 4, 32)
        assert np.isfinite(np.asarray(out)).all()

    def test_frozen_by_default(self, rng):
        model = SwinV2Backbone(tiny_cfg(), rngs=nnx.Rngs(0))
        model.eval()
        x = jnp.asarray(rng.uniform(size=(1, 64, 64, 3)).astype(np.float32))
        grads = nnx.grad(lambda m: (m(x) ** 2).mean())(model)
        assert all(float(jnp.abs(g).max()) == 0.0 for g in jax.tree.leaves(grads))

    def test_shift_changes_receptive_field(self, rng):
        """With shifted windows, a pixel outside a window's patch must be
        able to influence outputs across the window boundary (2 blocks)."""
        model = SwinV2Backbone(tiny_cfg(), rngs=nnx.Rngs(0))
        model.eval()
        x = jnp.asarray(rng.uniform(size=(1, 64, 64, 3)).astype(np.float32))
        base = np.asarray(model(x))
        # perturb a single input patch far from the (0,0) output cell's
        # un-shifted window; cross-window mixing must propagate it
        x2 = x.at[:, 40:44, 40:44, :].set(0.0)
        pert = np.asarray(model(x2))
        assert np.abs(base - pert)[0, 0, 0].max() > 0

    def test_works_in_routeformer(self, rng):
        from routeformer_tpu.models import RouteformerConfig
        from routeformer_tpu.models.gps_backbone import GPSBackboneConfig
        from routeformer_tpu.models.routeformer import Routeformer

        gps_cfg = GPSBackboneConfig(
            seq_len=40, label_len=40, pred_len=30, d_model=16, n_heads=4,
            e_layers=1, d_layers=1, d_ff=32, factor=4, dropout=0.0,
        )
        cfg = RouteformerConfig(
            gps_backbone_config=gps_cfg,
            video_backbone_config=tiny_cfg(),
            with_video=True, encoder_hidden_size=16, image_embedding_size=16,
            encoder_heads=4, encoder_layers=1, encoder_d_ff=32,
        )
        model = Routeformer(
            cfg, video_backbone=SwinV2Backbone, rngs=nnx.Rngs(0, dropout=1)
        )
        model.eval()
        batch = {
            "gps": jnp.asarray(rng.normal(size=(1, 40, 2)).astype(np.float32)),
            "left_video": jnp.asarray(
                rng.uniform(size=(1, 40, 24, 32, 3)).astype(np.float32)
            ),
        }
        assert model(batch).shape == (1, 30, 2)


class TestScanAndRemat:
    def test_odd_stage_depth_rejected(self):
        from routeformer_tpu.models.video_backbone.swin import SwinStage

        with pytest.raises(ValueError, match="even"):
            SwinStage(16, 2, 4, 3, (8, 8), rngs=nnx.Rngs(0))

    def test_remat_matches_plain_gradients(self, rng):
        """remat only changes the memory/recompute schedule, not the math."""
        x = jnp.asarray(rng.uniform(size=(2, 48, 64, 3)).astype(np.float32))

        def grads(remat):
            cfg = tiny_cfg(train_backbone=True, cache_enabled=False, remat=remat)
            model = SwinV2Backbone(cfg, rngs=nnx.Rngs(0))

            def loss_fn(m):
                return jnp.sum(m(x) ** 2)

            return nnx.grad(loss_fn)(model)

        g_plain = grads(False)
        g_remat = grads(True)
        flat_plain = jax.tree.leaves(g_plain)
        flat_remat = jax.tree.leaves(g_remat)
        assert len(flat_plain) == len(flat_remat)
        for a, b in zip(flat_plain, flat_remat):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


class TestBadGeometryGuard:
    """Known-bad frame batches must auto-fall back to the einsum window
    path for the whole encode (docs/PERF.md batch-8 kernel fault) — no env
    var required, and numerics stay identical to the einsum path."""

    def test_flash_dispatch_suppressed_inside_guard(self, monkeypatch):
        from routeformer_tpu.models.video_backbone import swin

        monkeypatch.setattr(swin.jax, "default_backend", lambda: "tpu")
        assert swin._use_window_flash(1 << 12, 256, "1") is True
        with swin._force_einsum_windows():
            assert swin._use_window_flash(1 << 12, 256, "1") is False
            with swin._force_einsum_windows():  # re-entrant
                assert swin._use_window_flash(1 << 12, 256, "1") is False
            assert swin._use_window_flash(1 << 12, 256, "1") is False
        assert swin._use_window_flash(1 << 12, 256, "1") is True

    def test_bad_frame_counts_env_override(self, monkeypatch):
        from routeformer_tpu.models.video_backbone import swin

        assert swin._bad_frame_counts() == frozenset({144, 192})
        monkeypatch.setenv("ROUTEFORMER_SWIN_FLASH_BAD_FRAMES", "8,40")
        assert swin._bad_frame_counts() == frozenset({8, 40})
        monkeypatch.setenv("ROUTEFORMER_SWIN_FLASH_BAD_FRAMES", "")
        assert swin._bad_frame_counts() == frozenset()

    def test_guarded_encode_matches_unguarded(self, rng, monkeypatch):
        from routeformer_tpu.models.video_backbone import swin

        model = SwinV2Backbone(tiny_cfg(), rngs=nnx.Rngs(0))
        model.eval()
        x = jnp.asarray(rng.uniform(size=(4, 32, 32, 3)).astype(np.float32))
        feats = model.preprocess_frames(x)
        golden = np.asarray(model.encode_frames(feats))
        # mark batch 4 as known-bad on a (mocked) tpu backend: the guard
        # engages and the encode still produces identical results (CPU
        # takes the einsum path either way — this checks the guard wiring,
        # not kernel numerics)
        monkeypatch.setenv("ROUTEFORMER_SWIN_FLASH_BAD_FRAMES", "4")
        monkeypatch.setattr(swin.jax, "default_backend", lambda: "tpu")
        guarded = np.asarray(model.encode_frames(feats))
        np.testing.assert_array_equal(guarded, golden)
        assert getattr(swin._flash_guard, "active", 0) == 0  # context exited


class TestTrainingGeometryLever:
    """The 192-px training-geometry ablation (docs/PERF.md cold-step
    lever): the base-preset family exposes a 192/window-12 variant and the
    fusion stack is feature-map-geometry agnostic — a full train step runs
    at either geometry."""

    def test_192_preset_shapes(self):
        m = SwinV2Backbone(
            tiny_cfg(model_type="swinv2_base_192"), rngs=nnx.Rngs(0)
        )
        assert m.preset.img_size == 192 and m.preset.window == 12
        assert m.output_feature_shape == (6, 6, 1024)

    def test_env_switch_retargets_base(self, monkeypatch):
        monkeypatch.setenv("ROUTEFORMER_SWIN_GEOMETRY", "192")
        m = SwinV2Backbone(
            tiny_cfg(model_type="swinv2_base_window12to16_192to256"),
            rngs=nnx.Rngs(0),
        )
        assert m.preset.img_size == 192
        monkeypatch.delenv("ROUTEFORMER_SWIN_GEOMETRY")
        m = SwinV2Backbone(
            tiny_cfg(model_type="swinv2_base_window12to16_192to256"),
            rngs=nnx.Rngs(0),
        )
        assert m.preset.img_size == 256

    @pytest.mark.parametrize(
        "preset", ["swinv2_tiny_test", "swinv2_parity_test"]
    )
    def test_train_step_runs_at_both_geometries(self, rng, preset):
        """Tiny stand-ins for the 256/192 pair: identical model code, only
        the backbone feature-map geometry differs ((4,4) vs (8,8) tokens);
        the flagship fusion stack consumes both and one optimizer step
        produces finite losses."""
        from routeformer_tpu.models import RouteformerConfig
        from routeformer_tpu.models.gps_backbone import (
            GPSBackboneConfig,
            Informer,
        )
        from routeformer_tpu.models.routeformer import Routeformer
        from routeformer_tpu.optimizers import build_optimizer
        from routeformer_tpu.parallel import make_train_step
        from routeformer_tpu.train import (
            TrainingLosses,
            routeformer_training_loss,
        )

        cfg = RouteformerConfig(
            gps_backbone_config=GPSBackboneConfig(
                seq_len=20, label_len=20, pred_len=10, d_model=16,
                n_heads=4, e_layers=1, d_layers=1, d_ff=32, factor=4,
                dropout=0.0, activation="relu",
            ),
            video_backbone_config=tiny_cfg(model_type=preset),
            with_video=True, with_gaze=False,
            discount_factor={0: 0.97}, epsilon=1.0,
            encoder_hidden_size=16, encoder_heads=4, encoder_layers=1,
            encoder_d_ff=32, cross_modal_decoder_heads=4,
            cross_modal_decoder_layers=1, image_embedding_size=16,
            output_fps=5, video_fps=1, gaze_fps=1,
        )
        model = Routeformer(
            cfg, gps_backbone=Informer,
            video_backbone=SwinV2Backbone, rngs=nnx.Rngs(0, dropout=1),
        )
        tx = build_optimizer(
            learning_rate=1e-4, video_backbone_lr=1e-6,
            warmup_epochs=0, max_epochs=10, gradient_clip_val=2.5,
        )
        losses = TrainingLosses.from_config(cfg)

        def loss_fn(m, inp, tgt, epoch):
            return routeformer_training_loss(m, inp, tgt, epoch, losses)

        step_fn, params, state, opt_state = make_train_step(
            model, tx, loss_fn
        )
        vid = lambda: jnp.asarray(  # noqa: E731
            rng.uniform(size=(2, 20, 24, 32, 3)).astype(np.float32)
        )
        inp = {
            "gps": jnp.asarray(rng.normal(size=(2, 20, 2)).astype(np.float32)),
            "left_video": vid(), "right_video": vid(),
        }
        tgt = {
            "gps": jnp.asarray(rng.normal(size=(2, 10, 2)).astype(np.float32)),
            "left_video": vid()[:, :10], "right_video": vid()[:, :10],
        }
        _, _, _, metrics = step_fn(
            params, state, opt_state, inp, tgt, jnp.asarray(0)
        )
        assert np.isfinite(float(metrics["total_loss"]))


class TestHeadRepackLever:
    """The head-dim repacking ablation (docs/PERF.md cold-step lever #2):
    ``ROUTEFORMER_SWIN_HEADS=<d>`` repacks each stage into fewer, wider
    heads — same qkv/proj widths and FLOPs, wider MXU contraction."""

    def test_env_repacks_heads(self, rng, monkeypatch):
        # tiny preset head dim is 16/2 = 8 -> target 16 halves the counts
        monkeypatch.setenv("ROUTEFORMER_SWIN_HEADS", "16")
        m = SwinV2Backbone(tiny_cfg(), rngs=nnx.Rngs(0))
        assert m.preset.heads == (1, 2)
        assert m.output_feature_shape == (4, 4, 32)  # widths unchanged
        m.eval()
        x = jnp.asarray(rng.uniform(size=(2, 32, 32, 3)).astype(np.float32))
        out = m(x)
        assert out.shape == (2, 4, 4, 32)
        assert np.isfinite(np.asarray(out)).all()

    def test_noop_when_already_at_target(self, monkeypatch):
        monkeypatch.setenv("ROUTEFORMER_SWIN_HEADS", "8")
        m = SwinV2Backbone(tiny_cfg(), rngs=nnx.Rngs(0))
        assert m.preset.heads == (2, 4)

    def test_rejects_non_multiple_target(self, monkeypatch):
        monkeypatch.setenv("ROUTEFORMER_SWIN_HEADS", "12")
        with pytest.raises(ValueError, match="not a multiple"):
            SwinV2Backbone(tiny_cfg(), rngs=nnx.Rngs(0))

    def test_rejects_indivisible_head_counts(self, monkeypatch):
        # factor 4 would need heads (2, 4) -> (0.5, 1): rejected
        monkeypatch.setenv("ROUTEFORMER_SWIN_HEADS", "32")
        with pytest.raises(ValueError, match="not divisible"):
            SwinV2Backbone(tiny_cfg(), rngs=nnx.Rngs(0))

    def test_composes_with_192_geometry(self, monkeypatch):
        monkeypatch.setenv("ROUTEFORMER_SWIN_GEOMETRY", "192")
        monkeypatch.setenv("ROUTEFORMER_SWIN_HEADS", "64")
        m = SwinV2Backbone(
            tiny_cfg(model_type="swinv2_base"), rngs=nnx.Rngs(0)
        )
        assert m.preset.img_size == 192 and m.preset.window == 12
        assert m.preset.heads == (2, 4, 8, 16)
        assert m.output_feature_shape == (6, 6, 1024)
