"""Tests for attention ops: dense (jax + pallas-interpret), ProbSparse,
AutoCorrelation. Oracles are independent numpy/torch implementations."""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from routeformer_tpu.ops.attention import (
    autocorrelation_attention,
    dot_product_attention,
    prob_sparse_attention,
)


def torch_full_attention(q, k, v, causal):
    """Oracle with the reference's conventions: scale=1/sqrt(E), blhe layout."""
    q, k, v = map(torch.tensor, (q, k, v))
    e = q.shape[-1]
    scores = torch.einsum("blhe,bshe->bhls", q, k)
    if causal:
        l_q, l_k = q.shape[1], k.shape[1]
        mask = torch.triu(torch.ones(l_q, l_k, dtype=torch.bool), diagonal=1)
        scores = scores.masked_fill(mask, float("-inf"))
    a = torch.softmax(scores / math.sqrt(e), dim=-1)
    return torch.einsum("bhls,bshd->blhd", a, v).numpy()


class TestDenseAttention:
    @pytest.mark.parametrize("causal", [False, True])
    def test_matches_torch(self, rng, causal):
        q = rng.normal(size=(2, 16, 4, 8)).astype(np.float32)
        k = rng.normal(size=(2, 16, 4, 8)).astype(np.float32)
        v = rng.normal(size=(2, 16, 4, 8)).astype(np.float32)
        out, _ = dot_product_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), causal=causal, impl="jax"
        )
        expected = torch_full_attention(q, k, v, causal)
        np.testing.assert_allclose(np.asarray(out), expected, atol=2e-5)

    def test_cross_attention_shapes(self, rng):
        q = jnp.asarray(rng.normal(size=(2, 10, 4, 8)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(2, 33, 4, 8)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(2, 33, 4, 16)).astype(np.float32))
        out, _ = dot_product_attention(q, k, v, impl="jax")
        assert out.shape == (2, 10, 4, 16)

    def test_weights_sum_to_one(self, rng):
        q = jnp.asarray(rng.normal(size=(1, 8, 2, 4)).astype(np.float32))
        out, w = dot_product_attention(q, q, q, need_weights=True, impl="jax")
        np.testing.assert_allclose(np.asarray(w.sum(-1)), 1.0, atol=1e-5)

    def test_dropout_changes_output(self, rng):
        q = jnp.asarray(rng.normal(size=(1, 8, 2, 4)).astype(np.float32))
        out1, _ = dot_product_attention(
            q, q, q, dropout_rate=0.5, deterministic=False,
            dropout_rng=jax.random.PRNGKey(0), impl="jax",
        )
        out2, _ = dot_product_attention(q, q, q, impl="jax")
        assert not np.allclose(np.asarray(out1), np.asarray(out2))


class TestFlashKernel:
    @pytest.mark.parametrize("causal", [False, True])
    @pytest.mark.parametrize("shape", [(2, 16, 4, 8), (1, 130, 2, 104)])
    def test_interpret_matches_jax(self, rng, causal, shape):
        """Pallas kernel in interpreter mode (CPU) vs the jax path."""
        from jax.experimental.pallas import tpu as pltpu

        b, l, h, e = shape
        q = jnp.asarray(rng.normal(size=shape).astype(np.float32))
        k = jnp.asarray(rng.normal(size=shape).astype(np.float32))
        v = jnp.asarray(rng.normal(size=shape).astype(np.float32))
        ref, _ = dot_product_attention(q, k, v, causal=causal, impl="jax")
        with pltpu.force_tpu_interpret_mode():
            got, _ = dot_product_attention(q, k, v, causal=causal, impl="flash")
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


class TestBiasedFlashKernel:
    def test_interpret_matches_einsum(self, rng):
        """Window kernel (interpret mode) vs the plain einsum formulation,
        with the SwinV2 bias-broadcast layout: batch row b uses
        bias[b % NB]."""
        from jax.experimental.pallas import tpu as pltpu

        from routeformer_tpu.ops.flash_attention import flash_window_attention

        reps, nb, h, n, d = 3, 4, 2, 16, 8
        b = reps * nb
        q = jnp.asarray(rng.normal(size=(b, h, n, d)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(b, h, n, d)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(b, h, n, d)).astype(np.float32))
        bias = jnp.asarray(rng.normal(size=(nb, h, n, n)).astype(np.float32))

        s = jnp.einsum("bhnd,bhmd->bhnm", q, k) + jnp.tile(bias, (reps, 1, 1, 1))
        ref = jnp.einsum("bhnm,bhmd->bhnd", jax.nn.softmax(s, axis=-1), v)

        with pltpu.force_tpu_interpret_mode():
            got = flash_window_attention(q, k, v, bias)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)

    def test_grads_match_einsum(self, rng):
        from jax.experimental.pallas import tpu as pltpu

        from routeformer_tpu.ops.flash_attention import flash_window_attention

        q = jnp.asarray(rng.normal(size=(4, 2, 8, 8)).astype(np.float32))
        bias = jnp.asarray(rng.normal(size=(2, 2, 8, 8)).astype(np.float32))

        def loss_flash(q, bias):
            with pltpu.force_tpu_interpret_mode():
                return (flash_window_attention(q, q, q, bias) ** 2).sum()

        def loss_ref(q, bias):
            s = jnp.einsum("bhnd,bhmd->bhnm", q, q) + jnp.tile(
                bias, (2, 1, 1, 1)
            )
            out = jnp.einsum(
                "bhnm,bhmd->bhnd", jax.nn.softmax(s, axis=-1), q
            )
            return (out**2).sum()

        gq, gb = jax.grad(loss_flash, argnums=(0, 1))(q, bias)
        rq, rb = jax.grad(loss_ref, argnums=(0, 1))(q, bias)
        np.testing.assert_allclose(np.asarray(gq), np.asarray(rq), atol=1e-3)
        np.testing.assert_allclose(np.asarray(gb), np.asarray(rb), atol=1e-3)

    def test_window_attention_flash_path_matches(self, rng, monkeypatch):
        """SwinV2 WindowAttention: flash path == einsum path (interpret)."""
        from jax.experimental.pallas import tpu as pltpu
        from flax import nnx

        from routeformer_tpu.models.video_backbone.swin import (
            WindowAttention,
            _shift_attn_mask,
        )

        attn = WindowAttention(16, 4, 2, rngs=nnx.Rngs(0))
        x = jnp.asarray(rng.normal(size=(8, 16, 16)).astype(np.float32))
        mask = jnp.asarray(_shift_attn_mask(8, 8, 4, 2))

        monkeypatch.setenv("ROUTEFORMER_SWIN_FLASH", "0")
        ref = attn(x, mask)
        monkeypatch.setenv("ROUTEFORMER_SWIN_FLASH", "1")
        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        with pltpu.force_tpu_interpret_mode():
            got = attn(x, mask)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-4
        )


class TestProbSparse:
    def test_full_u_equals_dense(self, rng):
        """When u == L_q (small L, large factor), every query is selected and
        ProbSparse must equal dense attention (non-causal)."""
        q = jnp.asarray(rng.normal(size=(2, 8, 2, 16)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(2, 8, 2, 16)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(2, 8, 2, 16)).astype(np.float32))
        sparse, _ = prob_sparse_attention(q, k, v, factor=5, causal=False)
        dense, _ = dot_product_attention(q, k, v, impl="jax")
        np.testing.assert_allclose(np.asarray(sparse), np.asarray(dense), atol=2e-5)

    def test_causal_full_u_matches_dense_causal(self, rng):
        q = jnp.asarray(rng.normal(size=(1, 8, 2, 16)).astype(np.float32))
        sparse, _ = prob_sparse_attention(q, q, q, factor=5, causal=True)
        dense, _ = dot_product_attention(q, q, q, causal=True, impl="jax")
        np.testing.assert_allclose(np.asarray(sparse), np.asarray(dense), atol=2e-5)

    def test_unselected_queries_get_mean_value(self, rng):
        """With factor=1 on a longer sequence, most queries should carry the
        mean of V (non-causal initial context)."""
        L = 64
        q = jnp.asarray(rng.normal(size=(1, L, 1, 8)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(1, L, 1, 8)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(1, L, 1, 8)).astype(np.float32))
        out, _ = prob_sparse_attention(q, k, v, factor=1, causal=False)
        v_mean = np.asarray(v.mean(axis=1))  # (1, 1, 8)
        matches = np.isclose(
            np.asarray(out), v_mean[:, None], atol=1e-5
        ).all(axis=-1).sum()
        u = min(int(1 * math.ceil(math.log(L))), L)
        assert matches >= L - u

    def test_jit_static_shapes(self, rng):
        q = jnp.asarray(rng.normal(size=(2, 40, 8, 104)).astype(np.float32))
        f = jax.jit(lambda a: prob_sparse_attention(a, a, a, factor=4, causal=False)[0])
        out = f(q)
        assert out.shape == q.shape
        assert np.isfinite(np.asarray(out)).all()

    @pytest.mark.parametrize("causal", [False, True])
    @pytest.mark.parametrize("factor", [1, 3, 100])
    def test_masked_formulation_matches_dense(self, rng, monkeypatch, causal, factor):
        """The threshold-select ("masked") formulation must equal the
        top-u scatter ("dense") formulation bit-for-tolerance at every
        sparsity level — same measure, same selected set (float ties are
        measure-zero), same context rows."""
        L = 48
        q = jnp.asarray(rng.normal(size=(2, L, 2, 16)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(2, L, 2, 16)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(2, L, 2, 16)).astype(np.float32))
        key = jax.random.PRNGKey(3)

        monkeypatch.setenv("ROUTEFORMER_PROBSPARSE", "dense")
        ref, _ = prob_sparse_attention(
            q, k, v, factor=factor, causal=causal, sample_rng=key
        )
        monkeypatch.setenv("ROUTEFORMER_PROBSPARSE", "masked")
        got, _ = prob_sparse_attention(
            q, k, v, factor=factor, causal=causal, sample_rng=key
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-4
        )


def numpy_autocorrelation(q, k, v, factor, training):
    """Independent numpy oracle for AutoCorrelation (time-last layout)."""
    b, l, h, e = q.shape
    qt = q.transpose(0, 2, 3, 1)
    kt = k.transpose(0, 2, 3, 1)
    vt = v.transpose(0, 2, 3, 1)
    corr = np.fft.irfft(
        np.fft.rfft(qt, axis=-1) * np.conj(np.fft.rfft(kt, axis=-1)), n=l, axis=-1
    )
    top_k = int(factor * math.log(l))
    mean_value = corr.mean(axis=(1, 2))  # (B, L)
    out = np.zeros_like(vt)
    if training:
        delay = np.argsort(-mean_value.mean(axis=0))[:top_k]
        w = mean_value[:, delay]  # (B, k)
        sm = np.exp(w - w.max(-1, keepdims=True))
        sm /= sm.sum(-1, keepdims=True)
        for i, d in enumerate(delay):
            out += np.roll(vt, -int(d), axis=-1) * sm[:, i][:, None, None, None]
    else:
        for bi in range(b):
            delay = np.argsort(-mean_value[bi])[:top_k]
            w = mean_value[bi, delay]
            sm = np.exp(w - w.max())
            sm /= sm.sum()
            for i, d in enumerate(delay):
                out[bi] += np.roll(vt[bi], -int(d), axis=-1) * sm[i]
    return out.transpose(0, 3, 1, 2)


class TestAutoCorrelation:
    @pytest.mark.parametrize("training", [True, False])
    def test_matches_numpy_oracle(self, rng, training):
        q = rng.normal(size=(2, 16, 2, 4)).astype(np.float32)
        k = rng.normal(size=(2, 16, 2, 4)).astype(np.float32)
        v = rng.normal(size=(2, 16, 2, 4)).astype(np.float32)
        out, _ = autocorrelation_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), factor=1, training=training
        )
        expected = numpy_autocorrelation(q, k, v, 1, training)
        np.testing.assert_allclose(np.asarray(out), expected, atol=1e-4)

    def test_shorter_kv_padded(self, rng):
        q = jnp.asarray(rng.normal(size=(1, 24, 2, 4)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(1, 12, 2, 4)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(1, 12, 2, 4)).astype(np.float32))
        out, corr = autocorrelation_attention(q, k, v, factor=1)
        assert out.shape == (1, 24, 2, 4)
        assert corr.shape == (1, 24, 2, 4)


class TestFlashVJP:
    def test_flash_grads_match_jax_path(self, rng):
        """custom_vjp backward of the flash path == jax path gradients."""
        from jax.experimental.pallas import tpu as pltpu

        q = jnp.asarray(rng.normal(size=(2, 16, 2, 8)).astype(np.float32))

        def loss_flash(q):
            with pltpu.force_tpu_interpret_mode():
                out, _ = dot_product_attention(q, q, q, causal=True, impl="flash")
            return (out**2).mean()

        def loss_jax(q):
            out, _ = dot_product_attention(q, q, q, causal=True, impl="jax")
            return (out**2).mean()

        g_flash = jax.grad(loss_flash)(q)
        g_jax = jax.grad(loss_jax)(q)
        np.testing.assert_allclose(np.asarray(g_flash), np.asarray(g_jax), atol=2e-5)
