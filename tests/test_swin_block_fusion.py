"""Fused SwinV2 block kernel (ops/swin_block_fusion.py): interpret-mode
parity against the XLA twin and against the production SwinBlock module."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from flax import nnx

from routeformer_tpu.ops.swin_block_fusion import (
    fused_swin_block_forward,
    swin_block_reference,
)


def _params(c, h, key, f_mult=4):
    ks = jax.random.split(key, 8)

    def rnd(k, shape, s=0.15):
        return jax.random.normal(k, shape, jnp.float32) * s

    return {
        "wqkv": rnd(ks[0], (c, 3 * c)),
        "bqkv": rnd(ks[1], (3 * c,)),
        "wproj": rnd(ks[2], (c, c)),
        "bproj": rnd(ks[3], (c,)),
        "ln1_scale": 1.0 + rnd(ks[4], (c,), 0.05),
        "ln1_bias": rnd(ks[4], (c,), 0.05),
        "wfc1": rnd(ks[5], (c, f_mult * c)),
        "bfc1": rnd(ks[5], (f_mult * c,)),
        "wfc2": rnd(ks[6], (f_mult * c, c)),
        "bfc2": rnd(ks[6], (c,)),
        "ln2_scale": 1.0 + rnd(ks[7], (c,), 0.05),
        "ln2_bias": rnd(ks[7], (c,), 0.05),
        "logit_scale": jnp.exp(
            jnp.minimum(rnd(jax.random.fold_in(key, 9), (h,), 0.5) + 2.3,
                        np.log(100.0))
        ),
    }


class TestFusedBlockParity:
    @pytest.mark.parametrize("b,n,c,h", [(3, 64, 128, 4), (2, 64, 256, 8)])
    def test_interpret_matches_reference_f32(self, b, n, c, h):
        key = jax.random.PRNGKey(b * 10 + h)
        p = _params(c, h, key)
        x = jax.random.normal(jax.random.fold_in(key, 1), (b, n, c),
                              jnp.float32)
        bias = jax.random.normal(jax.random.fold_in(key, 2), (h, n, n),
                                 jnp.float32)
        want = swin_block_reference(x, p, n_heads=h, bias=bias)
        got = fused_swin_block_forward(
            x, p, n_heads=h, bias=bias, compute_bf16=False, interpret=True
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=3e-5, rtol=1e-5)

    def test_interpret_bf16_close_to_f32_reference(self):
        key = jax.random.PRNGKey(0)
        c, h, n, b = 128, 4, 64, 2
        p = _params(c, h, key)
        x = jax.random.normal(jax.random.fold_in(key, 1), (b, n, c),
                              jnp.float32)
        bias = jax.random.normal(jax.random.fold_in(key, 2), (h, n, n),
                                 jnp.float32)
        want = swin_block_reference(x, p, n_heads=h, bias=bias)
        got = fused_swin_block_forward(
            x, p, n_heads=h, bias=bias, compute_bf16=True, interpret=True
        )
        scale = float(jnp.max(jnp.abs(want))) + 1e-9
        rel = float(jnp.max(jnp.abs(got - want))) / scale
        assert rel < 2e-2, rel

    def test_matches_production_swin_block(self):
        """The XLA twin reproduces the real SwinBlock module (shift=0,
        window == feature map — the stage-2/3 geometry) bit-for-tolerance,
        so kernel parity vs the twin implies parity vs production."""
        from routeformer_tpu.models.video_backbone.swin import SwinBlock

        c, h, win = 64, 4, 4
        blk = SwinBlock(
            c, h, win, shift=0, input_hw=(win, win), gelu_approximate=True,
            rngs=nnx.Rngs(0),
        )
        frames = 3
        x = jax.random.normal(jax.random.PRNGKey(5), (frames, win, win, c),
                              jnp.float32)
        want = blk(x)

        qkv_bias = jnp.concatenate(
            [blk.attn.q_bias[...], jnp.zeros((c,)), blk.attn.v_bias[...]]
        )
        p = {
            "wqkv": blk.attn.qkv.kernel[...],
            "bqkv": qkv_bias,
            "wproj": blk.attn.proj.kernel[...],
            "bproj": blk.attn.proj.bias[...],
            "ln1_scale": blk.norm1.scale[...],
            "ln1_bias": blk.norm1.bias[...],
            "wfc1": blk.fc1.kernel[...],
            "bfc1": blk.fc1.bias[...],
            "wfc2": blk.fc2.kernel[...],
            "bfc2": blk.fc2.bias[...],
            "ln2_scale": blk.norm2.scale[...],
            "ln2_bias": blk.norm2.bias[...],
            "logit_scale": jnp.exp(
                jnp.minimum(blk.attn.logit_scale[...], np.log(100.0))
            ).reshape(h),
        }
        bias = blk.attn.get_bias()
        xw = x.reshape(frames, win * win, c)
        got = fused_swin_block_forward(
            xw, p, n_heads=h, bias=bias, compute_bf16=False, interpret=True
        ).reshape(frames, win, win, c)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=5e-5, rtol=1e-4)


class TestModuleDispatch:
    """ROUTEFORMER_SWIN_BLOCK_FUSION=interpret drives SwinBlock through
    the fused kernel on CPU: outputs match the plain path and gradients
    flow through the XLA-recompute backward."""

    def _block(self, c=64, h=4, win=4):
        from routeformer_tpu.models.video_backbone.swin import SwinBlock

        return SwinBlock(
            c, h, win, shift=0, input_hw=(win, win), gelu_approximate=True,
            rngs=nnx.Rngs(0),
        )

    def test_dispatch_matches_plain_path(self, monkeypatch):
        blk = self._block()
        x = jax.random.normal(jax.random.PRNGKey(3), (2, 4, 4, 64),
                              jnp.float32)
        monkeypatch.setenv("ROUTEFORMER_SWIN_BLOCK_FUSION", "0")
        want = blk(x)
        monkeypatch.setenv("ROUTEFORMER_SWIN_BLOCK_FUSION", "interpret")
        got = blk(x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=5e-5, rtol=1e-4)

    def test_shifted_block_dispatch_matches(self, monkeypatch):
        """SW-MSA blocks (shift>0, per-window-kind CPB+mask bias) run the
        fused kernel too and match the plain path."""
        from routeformer_tpu.models.video_backbone.swin import SwinBlock

        blk = SwinBlock(
            64, 4, 4, shift=2, input_hw=(8, 8), gelu_approximate=True,
            rngs=nnx.Rngs(0),
        )
        assert blk.shift == 2 and blk.attn_mask is not None
        x = jax.random.normal(jax.random.PRNGKey(3), (2, 8, 8, 64),
                              jnp.float32)
        monkeypatch.setenv("ROUTEFORMER_SWIN_BLOCK_FUSION", "0")
        want = blk(x)
        monkeypatch.setenv("ROUTEFORMER_SWIN_BLOCK_FUSION", "interpret")
        got = blk(x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=5e-5, rtol=1e-4)

    def test_exact_gelu_falls_back(self, monkeypatch):
        from routeformer_tpu.models.video_backbone.swin import SwinBlock

        blk = SwinBlock(
            64, 4, 4, shift=0, input_hw=(4, 4), gelu_approximate=False,
            rngs=nnx.Rngs(0),
        )
        monkeypatch.setenv("ROUTEFORMER_SWIN_BLOCK_FUSION", "interpret")
        assert blk._fused_block_mode(64) is None

    def test_grads_flow_through_fused_dispatch(self, monkeypatch):
        monkeypatch.setenv("ROUTEFORMER_SWIN_BLOCK_FUSION", "interpret")
        blk = self._block()
        x = np.random.default_rng(0).normal(
            size=(2, 4, 4, 64)
        ).astype(np.float32)

        def loss(m, x):
            return jnp.sum(m(jnp.asarray(x)) ** 2)

        g = nnx.grad(loss)(blk, x)
        leaves = jax.tree.leaves(g)
        assert leaves and all(
            np.isfinite(np.asarray(a)).all() for a in leaves
        )
        # grads match the plain path's (same math, recompute backward)
        monkeypatch.setenv("ROUTEFORMER_SWIN_BLOCK_FUSION", "0")
        g0 = nnx.grad(loss)(blk, x)
        for a, b in zip(jax.tree.leaves(g0), leaves):
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), atol=5e-4, rtol=5e-3
            )

    def test_bad_geometry_guard_disables_fusion(self, monkeypatch):
        """Inside the known-bad-geometry einsum fallback (the batch-8
        worker-fault registry), the fused-block dispatch must stay off —
        no Pallas kernels in that encode's schedule at all."""
        from routeformer_tpu.models.video_backbone.swin import (
            _force_einsum_windows,
        )

        monkeypatch.setenv("ROUTEFORMER_SWIN_BLOCK_FUSION", "interpret")
        blk = self._block()
        assert blk._fused_block_mode(64) == "interpret"
        with _force_einsum_windows():
            assert blk._fused_block_mode(64) is None
        assert blk._fused_block_mode(64) == "interpret"
