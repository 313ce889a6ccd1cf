"""Tests for the transformer layer library (embed/attention/encdec)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
from flax import nnx

from routeformer_tpu.models.layers import (
    AttentionLayer,
    ConvLayer,
    DataEmbedding,
    Encoder,
    EncoderLayer,
    FullAttention,
    PositionalEmbedding,
    ProbAttention,
    TokenEmbedding,
)
from routeformer_tpu.models.gps_backbone.linear import moving_average, series_decomp


def make_rngs(seed=0):
    return nnx.Rngs(seed, dropout=seed + 1)


class TestEmbeddings:
    def test_positional_matches_torch_formula(self):
        d_model = 16
        pe_mod = PositionalEmbedding(d_model)
        out = np.asarray(pe_mod(jnp.zeros((1, 10, 3))))[0]

        import math

        position = torch.arange(10).float().unsqueeze(1)
        div_term = (
            torch.arange(0, d_model, 2).float() * -(math.log(10000.0) / d_model)
        ).exp()
        expected = torch.zeros(10, d_model)
        expected[:, 0::2] = torch.sin(position * div_term)
        expected[:, 1::2] = torch.cos(position * div_term)
        np.testing.assert_allclose(out, expected.numpy(), atol=1e-6)

    def test_token_embedding_circular_conv(self, rng):
        """Circular conv: shifting the input circularly shifts the output."""
        emb = TokenEmbedding(4, 8, rngs=make_rngs())
        x = jnp.asarray(rng.normal(size=(1, 12, 4)).astype(np.float32))
        out = emb(x)
        assert out.shape == (1, 12, 8)
        shifted = jnp.roll(x, 3, axis=1)
        out_shifted = emb(shifted)
        np.testing.assert_allclose(
            np.asarray(out_shifted), np.asarray(jnp.roll(out, 3, axis=1)), atol=1e-5
        )

    def test_data_embedding_timef(self, rng):
        emb = DataEmbedding(5, 32, embed_type="timeF", freq="m", rngs=make_rngs())
        emb.eval()
        x = jnp.asarray(rng.normal(size=(2, 10, 5)).astype(np.float32))
        marks = jnp.broadcast_to(
            jnp.arange(10, dtype=jnp.float32)[None, :, None], (2, 10, 1)
        )
        out = emb(x, marks)
        assert out.shape == (2, 10, 32)
        assert np.isfinite(np.asarray(out)).all()


class TestConvLayer:
    def test_distil_length_torch_parity(self, rng):
        """Output length must match torch's Conv1d(pad=2,circular)+MaxPool."""
        for L in [40, 21, 12, 7]:
            layer = ConvLayer(6, rngs=make_rngs())
            layer.eval()
            x = jnp.asarray(rng.normal(size=(2, L, 6)).astype(np.float32))
            out = layer(x)

            conv = torch.nn.Conv1d(6, 6, 3, padding=2, padding_mode="circular")
            pool = torch.nn.MaxPool1d(3, stride=2, padding=1)
            tout = pool(conv(torch.zeros(2, 6, L)))
            assert out.shape == (2, tout.shape[-1], 6), (L, out.shape, tout.shape)

    def test_numerical_parity_with_torch(self, rng):
        """Port weights into a torch replica and compare outputs."""
        c = 4
        layer = ConvLayer(c, rngs=make_rngs())
        layer.eval()

        kernel = np.asarray(layer.conv.kernel[...])  # (3, c_in, c_out)
        bias = np.asarray(layer.conv.bias[...])

        conv = torch.nn.Conv1d(c, c, 3, padding=2, padding_mode="circular")
        with torch.no_grad():
            conv.weight.copy_(torch.tensor(kernel).permute(2, 1, 0))
            conv.bias.copy_(torch.tensor(bias))
        bn = torch.nn.BatchNorm1d(c).eval()
        pool = torch.nn.MaxPool1d(3, stride=2, padding=1)

        x = rng.normal(size=(2, 10, c)).astype(np.float32)
        got = np.asarray(layer(jnp.asarray(x)))
        with torch.no_grad():
            t = conv(torch.tensor(x).permute(0, 2, 1))
            t = torch.nn.functional.elu(bn(t))
            expected = pool(t).permute(0, 2, 1).numpy()
        np.testing.assert_allclose(got, expected, atol=1e-4)


class TestEncoderStack:
    def test_encoder_with_distil_shapes(self, rng):
        d_model, heads = 32, 4
        rngs = make_rngs()
        enc = Encoder(
            [
                EncoderLayer(
                    AttentionLayer(
                        ProbAttention(False, 5, rngs=rngs),
                        d_model, heads, mix=True, rngs=rngs,
                    ),
                    d_model, 64, rngs=rngs,
                )
                for _ in range(3)
            ],
            [ConvLayer(d_model, rngs=rngs) for _ in range(2)],
            norm_layer=nnx.LayerNorm(d_model, rngs=rngs),
        )
        enc.eval()
        x = jnp.asarray(rng.normal(size=(2, 40, d_model)).astype(np.float32))
        out, attns = enc(x)
        # 40 -> conv -> 21 -> conv -> 12
        assert out.shape == (2, 12, d_model)
        assert len(attns) == 3

    def test_attention_layer_grad_flows(self, rng):
        rngs = make_rngs()
        layer = AttentionLayer(FullAttention(False, rngs=rngs), 16, 4, rngs=rngs)
        layer.eval()
        x = jnp.asarray(rng.normal(size=(2, 8, 16)).astype(np.float32))

        def loss_fn(model):
            out, _ = model(x, x, x)
            return (out**2).mean()

        grads = nnx.grad(loss_fn)(layer)
        flat = jax.tree.leaves(grads)
        assert all(np.isfinite(np.asarray(g)).all() for g in flat)
        assert any(float(jnp.abs(g).max()) > 0 for g in flat)


class TestMovingAverage:
    def test_matches_torch_avgpool(self, rng):
        x = rng.normal(size=(2, 30, 3)).astype(np.float32)
        for k in [5, 25]:
            got = np.asarray(moving_average(jnp.asarray(x), k))
            tx = torch.tensor(x)
            pad = (k - 1) // 2
            front = tx[:, :1].repeat(1, pad, 1)
            end = tx[:, -1:].repeat(1, pad, 1)
            padded = torch.cat([front, tx, end], 1)
            expected = (
                torch.nn.AvgPool1d(k, stride=1)(padded.permute(0, 2, 1))
                .permute(0, 2, 1)
                .numpy()
            )
            np.testing.assert_allclose(got, expected, atol=1e-5)

    def test_decomp_sums(self, rng):
        x = jnp.asarray(rng.normal(size=(1, 20, 2)).astype(np.float32))
        res, trend = series_decomp(x, 5)
        np.testing.assert_allclose(np.asarray(res + trend), np.asarray(x), atol=1e-5)
