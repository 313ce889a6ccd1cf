"""Mesh validation at FLAGSHIP geometry (round-2 VERDICT #5).

The round-2 mesh evidence was tiny-config only (``vit_tiny_test`` dryrun +
a d32 DDP-equivalence test); the TP sharding rule had never been checked
against the d832/d_ff-3328 Informer or the SwinV2-base stage weights. Here:

- ``TestFlagshipParamSpecs`` builds the REAL flagship models abstractly
  (``nnx.eval_shape`` — no 88M-param materialization) and asserts
  ``param_spec`` at ``min_shard_dim=512`` produces non-trivial
  ``PartitionSpec``s with correct divisors for the big matrices and
  replication for the small ones.
- ``TestFlagshipInformerMesh`` runs a REAL train + eval step of the
  flagship-geometry (d832/e6/3328) GPS-only Routeformer on the virtual
  8-device ``(data=4, model=2)`` mesh.
"""

import numpy as np
import jax
import pytest
from flax import nnx
from jax.sharding import PartitionSpec as P

from routeformer_tpu.parallel.mesh import MODEL_AXIS, param_spec

MIN_SHARD = 512
N_MODEL = 2


def _flagship_cfg():
    import sys

    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import _flagship_config

    return _flagship_config()


def _abstract_params(build_fn):
    """Parameter tree of ShapeDtypeStructs for a model built abstractly."""
    model = nnx.eval_shape(build_fn)
    return nnx.to_flat_state(nnx.state(model, nnx.Param))


def _spec_of(flat, suffix):
    """param_spec of the unique parameter whose path ends with ``suffix``."""
    hits = [
        (path, var)
        for path, var in flat
        if ".".join(str(p) for p in path).endswith(suffix)
    ]
    assert hits, f"no parameter matching {suffix}"
    path, var = hits[0]
    return param_spec(var.value, N_MODEL, MIN_SHARD), tuple(var.value.shape)


class TestFlagshipParamSpecs:
    """Structural TP rule against the real flagship parameter trees."""

    def test_informer_d832_shards(self):
        from routeformer_tpu.models.gps_backbone import Informer
        from routeformer_tpu.models.routeformer import Routeformer

        cfg = _flagship_cfg().override(
            with_video=False, with_gaze=False, with_scene=False,
            dense_prediction=False,
        )
        flat = _abstract_params(
            lambda: Routeformer(cfg, gps_backbone=Informer, rngs=nnx.Rngs(0, dropout=1))
        )

        # FFN up-projection (832, 3328): shard the 3328 dim over model=2
        spec, shape = _spec_of(flat, "encoder.attn_layers.0.ff1.kernel")
        assert shape == (832, 3328)
        assert spec == P(None, MODEL_AXIS), spec

        # FFN down-projection (3328, 832): shard the 3328 dim
        spec, shape = _spec_of(flat, "encoder.attn_layers.0.ff2.kernel")
        assert shape == (3328, 832)
        assert spec == P(MODEL_AXIS, None), spec

        # attention projections (832, 832): square, >= 512 -> sharded
        spec, shape = _spec_of(
            flat, "attn_layers.0.attention.query_projection.kernel"
        )
        assert shape == (832, 832)
        assert MODEL_AXIS in tuple(spec), spec

        # small heads stay replicated (decoder projection c_out=66)
        spec, shape = _spec_of(flat, "decoder.projection.kernel")
        assert shape[0] == 832 and spec != P(), (
            "decoder projection's d_model dim is shardable"
        )

        # every sharded dim must divide by the model-axis size
        n_sharded = 0
        for path, var in flat:
            spec = param_spec(var.value, N_MODEL, MIN_SHARD)
            for axis, name in zip(var.value.shape, tuple(spec)):
                if name == MODEL_AXIS:
                    assert axis % N_MODEL == 0, (path, var.value.shape)
                    assert axis >= MIN_SHARD
                    n_sharded += 1
        # the d832 Informer must be substantially TP-sharded
        assert n_sharded >= 40, f"only {n_sharded} sharded params"

    def test_swinv2_base_stage_shards(self):
        from routeformer_tpu.models.video_backbone import (
            SwinV2Backbone,
            TimmBackboneConfig,
        )

        cfg = TimmBackboneConfig(
            model_type="swinv2_base_window12to16_192to256.ms_in22k_ft_in1k",
            cache_enabled=False,
        )
        flat = _abstract_params(
            lambda: SwinV2Backbone(cfg, rngs=nnx.Rngs(0, dropout=1))
        )

        # stage-2 (dim 512, 18 blocks scanned as 9 pairs): qkv (9, 512, 1536)
        spec, shape = _spec_of(flat, "stages.2.pairs.block_a.attn.qkv.kernel")
        assert shape == (9, 512, 1536)
        assert spec == P(None, None, MODEL_AXIS), spec

        # stage-2 MLP fc1 (9, 512, 2048)
        spec, shape = _spec_of(flat, "stages.2.pairs.block_a.fc1.kernel")
        assert shape == (9, 512, 2048)
        assert spec == P(None, None, MODEL_AXIS), spec

        # stage-3 (dim 1024) fc1 (1, 1024, 4096)
        spec, shape = _spec_of(flat, "stages.3.pairs.block_a.fc1.kernel")
        assert shape == (1, 1024, 4096)
        assert spec == P(None, None, MODEL_AXIS), spec

        # patch-merging reductions: stage0 (512, 256) -> sharded dim0;
        spec, shape = _spec_of(flat, "merges.0.reduction.kernel")
        assert shape == (512, 256)
        assert spec == P(MODEL_AXIS, None), spec

        # tiny CPB MLPs stay replicated (512-in but heads-out dim is small;
        # the largest dim 512 IS shardable -> verify the rule's actual
        # decision is divisor-correct either way)
        for path, var in flat:
            spec = param_spec(var.value, N_MODEL, MIN_SHARD)
            for axis, name in zip(var.value.shape, tuple(spec)):
                if name == MODEL_AXIS:
                    assert axis % N_MODEL == 0 and axis >= MIN_SHARD


class TestFlagshipInformerMesh:
    """REAL train + eval steps at flagship Informer geometry on the mesh."""

    def test_d832_informer_train_and_eval_on_mesh(self):
        if len(jax.devices()) < 8:
            pytest.skip("needs 8 (virtual) devices")
        from routeformer_tpu.io.synthetic import synthetic_batch
        from routeformer_tpu.models.gps_backbone import Informer
        from routeformer_tpu.models.routeformer import Routeformer
        from routeformer_tpu.optimizers import build_optimizer
        from routeformer_tpu.parallel import make_mesh
        from routeformer_tpu.train.trainer import ParallelTrainer

        cfg = _flagship_cfg().override(
            with_video=False, with_gaze=False, with_scene=False,
            dense_prediction=False,
        )
        models = {
            "flagship_gps": Routeformer(
                cfg, gps_backbone=Informer, rngs=nnx.Rngs(0, dropout=1)
            )
        }
        tx = build_optimizer(
            learning_rate=1e-5, video_backbone_lr=None,
            warmup_epochs=0, max_epochs=10, gradient_clip_val=2.5,
        )
        mesh = make_mesh(n_data=4, n_model=2)
        trainer = ParallelTrainer(
            models, tx, cfg, mesh=mesh, min_shard_dim=MIN_SHARD
        )

        # the d832/3328 weights must actually live sharded on the mesh
        sharded = 0
        for leaf in jax.tree.leaves(trainer.params["flagship_gps"]):
            spec = leaf.sharding.spec if hasattr(leaf.sharding, "spec") else None
            if spec and MODEL_AXIS in tuple(spec):
                sharded += 1
        assert sharded >= 40, f"only {sharded} sharded leaves on the mesh"

        batch = synthetic_batch(0, batch_size=8, seq_len=40, pred_len=30)
        metrics = trainer.training_step(batch)
        assert np.isfinite(float(metrics["train_total_loss"]))

        eval_metrics = trainer.eval_step(batch, "val")
        assert np.isfinite(float(eval_metrics["val_flagship_gps_ade"]))
