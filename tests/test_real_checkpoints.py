"""Checkpoint-gated smoke tests for real timm weights.

This container ships no pretrained checkpoints (zero egress), so these
tests SKIP unless weights are dropped into ``$ROUTEFORMER_TIMM_CKPT_DIR``
(default ``/root/checkpoints``) — they run the moment weights exist:

- ``swinv2_base_window12to16_192to256*.pth`` -> load_timm_swin into the
  flagship SwinV2Backbone (reference experiments/full_comparison.py:231-240)
- ``dinov2*.pth`` -> load_timm_vit into the DinoV2 preset @518
  (reference full_comparison.py:241-248)
- ``samvit*.pth`` -> load_timm_vit into the SAM-ViT preset
"""

import os
from pathlib import Path

import numpy as np
import jax.numpy as jnp
import pytest
from flax import nnx

CKPT_DIR = Path(os.getenv("ROUTEFORMER_TIMM_CKPT_DIR", "/root/checkpoints"))


def _find(pattern: str):
    if not CKPT_DIR.is_dir():
        return None
    hits = sorted(CKPT_DIR.glob(pattern))
    return hits[0] if hits else None


def _load_state_dict(path):
    import torch

    state = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(state, dict) and "state_dict" in state:
        state = state["state_dict"]
    if isinstance(state, dict) and "model" in state:
        state = state["model"]
    return state


@pytest.mark.skipif(
    _find("*swinv2_base*") is None,
    reason=f"no swinv2_base checkpoint under {CKPT_DIR}",
)
def test_load_real_swinv2_checkpoint():
    from routeformer_tpu.models.video_backbone import (
        SwinV2Backbone,
        TimmBackboneConfig,
    )
    from routeformer_tpu.models.video_backbone.convert import load_timm_swin

    cfg = TimmBackboneConfig(
        model_type="swinv2_base_window12to16_192to256.ms_in22k_ft_in1k",
        cache_enabled=False, compute_dtype="float32",
    )
    model = SwinV2Backbone(cfg, rngs=nnx.Rngs(0))
    model.eval()
    n_loaded = load_timm_swin(model, _load_state_dict(_find("*swinv2_base*")))
    assert n_loaded > 100, f"only {n_loaded} params matched"

    x = jnp.asarray(np.random.RandomState(0).rand(1, 192, 256, 3), jnp.float32)
    out = model(x)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.skipif(
    _find("*dinov2*") is None,
    reason=f"no dinov2 checkpoint under {CKPT_DIR}",
)
def test_load_real_dinov2_checkpoint():
    from routeformer_tpu.models.video_backbone import (
        DinoV2,
        TimmBackboneConfig,
    )
    from routeformer_tpu.models.video_backbone.convert import load_timm_vit

    cfg = TimmBackboneConfig(
        model_type="vit_base_patch14_dinov2.lvd142m",
        cache_enabled=False, compute_dtype="float32",
    )
    model = DinoV2(cfg, rngs=nnx.Rngs(0, dropout=1))
    model.eval()
    assert model.preset.img_size == 518  # reference geometry
    n_loaded = load_timm_vit(model, _load_state_dict(_find("*dinov2*")))
    assert n_loaded > 50, f"only {n_loaded} params matched"

    x = jnp.asarray(np.random.RandomState(0).rand(1, 518, 518, 3), jnp.float32)
    out = model(x)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.skipif(
    _find("*hr16*") is None,
    reason=f"no hr16s checkpoint under {CKPT_DIR}",
)
def test_load_real_inverseform_checkpoint():
    """The published Qualcomm hr16s_4k_slim.pth trunk
    (reference InverseForm.py:44-49 download URL)."""
    from routeformer_tpu.models.video_backbone import (
        InverseForm,
        InverseFormBackboneConfig,
    )

    cfg = InverseFormBackboneConfig(
        cache_enabled=False, model_path=str(_find("*hr16*"))
    )
    model = InverseForm(cfg, rngs=nnx.Rngs(0))
    model.eval()
    x = jnp.asarray(np.random.RandomState(0).rand(1, 224, 224, 3), jnp.float32)
    out = model(x)
    assert out.shape == (1, 8, 8, 240)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.skipif(
    _find("*samvit*") is None,
    reason=f"no samvit checkpoint under {CKPT_DIR}",
)
def test_load_real_samvit_checkpoint():
    from routeformer_tpu.models.video_backbone import Sam, TimmBackboneConfig
    from routeformer_tpu.models.video_backbone.convert import load_timm_vit

    cfg = TimmBackboneConfig(
        model_type="samvit_base_patch16.sa1b",
        cache_enabled=False, compute_dtype="float32",
    )
    model = Sam(cfg, rngs=nnx.Rngs(0, dropout=1))
    model.eval()
    n_loaded = load_timm_vit(model, _load_state_dict(_find("*samvit*")))
    assert n_loaded > 50, f"only {n_loaded} params matched"
