"""Tests for the GPS backbone zoo: shapes, determinism, jit, gradients."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from flax import nnx

from routeformer_tpu.models.gps_backbone import (
    DLinear,
    GPSBackboneConfig,
    Informer,
    LinearBackboneConfig,
    LinearBaseline,
    NLinear,
    StationaryBaseline,
    Transformer,
)


def small_config(**kwargs):
    defaults = dict(
        seq_len=40,
        label_len=40,
        pred_len=30,
        d_model=32,
        n_heads=4,
        e_layers=2,
        d_layers=1,
        d_ff=64,
        factor=4,
        dropout=0.1,
        activation="relu",
        distil=True,
    )
    defaults.update(kwargs)
    return GPSBackboneConfig(**defaults)


@pytest.fixture
def x(rng):
    return jnp.asarray(rng.normal(size=(2, 40, 5)).astype(np.float32))


class TestInformer:
    def test_forward_shape(self, x):
        cfg = small_config()
        model = Informer(cfg, rngs=nnx.Rngs(0, dropout=1))
        model.eval()
        out = model(x)
        assert out.shape == (2, 30, 2)
        assert np.isfinite(np.asarray(out)).all()

    def test_smart_decoder(self, x):
        cfg = small_config()
        cfg.smart_decoder = True
        model = Informer(cfg, rngs=nnx.Rngs(0, dropout=1))
        model.eval()
        out = model(x)
        assert out.shape == (2, 30, 2)

    def test_no_distil(self, x):
        cfg = small_config(distil=False)
        model = Informer(cfg, rngs=nnx.Rngs(0, dropout=1))
        model.eval()
        assert model(x).shape == (2, 30, 2)

    def test_eval_deterministic(self, x):
        model = Informer(small_config(), rngs=nnx.Rngs(0, dropout=1))
        model.eval()
        np.testing.assert_array_equal(np.asarray(model(x)), np.asarray(model(x)))

    def test_train_stochastic(self, x):
        model = Informer(small_config(), rngs=nnx.Rngs(0, dropout=1))
        model.train()
        a, b = np.asarray(model(x)), np.asarray(model(x))
        assert not np.array_equal(a, b)

    def test_jit_and_grad(self, x):
        model = Informer(small_config(), rngs=nnx.Rngs(0, dropout=1))
        model.eval()

        @nnx.jit
        def loss_fn(model, x):
            return (model(x) ** 2).mean()

        @nnx.jit
        def grad_fn(model, x):
            return nnx.grad(lambda m: (m(x) ** 2).mean())(model)

        loss = loss_fn(model, x)
        assert np.isfinite(float(loss))
        grads = grad_fn(model, x)
        leaves = jax.tree.leaves(grads)
        assert all(np.isfinite(np.asarray(g)).all() for g in leaves)

    def test_dense_prediction_output_dim(self, rng):
        cfg = small_config()
        cfg.with_video = True
        cfg.dense_prediction = True
        cfg.encoder_hidden_size = 16
        # enc_in = 5 + 16 = 21; c_out = 21 - 3 = 18
        assert cfg.enc_in == 21 and cfg.c_out == 18
        model = Informer(cfg, rngs=nnx.Rngs(0, dropout=1))
        model.eval()
        x = jnp.asarray(rng.normal(size=(2, 40, 21)).astype(np.float32))
        assert model(x).shape == (2, 30, 18)


class TestTransformer:
    def test_forward_shape(self, x):
        model = Transformer(small_config(), rngs=nnx.Rngs(0, dropout=1))
        model.eval()
        out = model(x)
        assert out.shape == (2, 30, 2)
        assert np.isfinite(np.asarray(out)).all()


def linear_config(**kwargs):
    defaults = dict(seq_len=40, label_len=40, pred_len=30, kernel_size=25)
    defaults.update(kwargs)
    return LinearBackboneConfig(**defaults)


class TestLinearFamily:
    def test_dlinear_shape(self, x):
        model = DLinear(linear_config(), rngs=nnx.Rngs(0))
        assert model(x).shape == (2, 30, 2)

    def test_nlinear_shift_invariance(self, x):
        """NLinear subtracts the last value: adding a constant shifts output."""
        model = NLinear(linear_config(), rngs=nnx.Rngs(0))
        out1 = np.asarray(model(x))
        out2 = np.asarray(model(x + 10.0))
        np.testing.assert_allclose(out2, out1 + 10.0, atol=1e-4)

    def test_individual_heads(self, x):
        model = DLinear(linear_config(individual=True), rngs=nnx.Rngs(0))
        assert model(x).shape == (2, 30, 2)


class TestBaselines:
    def test_stationary_zeros(self, x):
        model = StationaryBaseline(small_config())
        out = np.asarray(model(x))
        assert out.shape == (2, 30, 2)
        assert (out == 0).all()

    def test_linear_repeats_mean(self, x):
        model = LinearBaseline(small_config())
        out = np.asarray(model(x))
        expected = np.asarray(x[:, -5:, :2]).mean(axis=1)
        np.testing.assert_allclose(out[:, 0], expected, atol=1e-6)
        np.testing.assert_allclose(out[:, -1], expected, atol=1e-6)


class TestConfig:
    def test_enc_in_modality_switches(self):
        cfg = small_config()
        assert cfg.enc_in == 5
        cfg.with_video = True
        assert cfg.enc_in == 5 + cfg.encoder_hidden_size
        cfg._enc_in = 99
        assert cfg.enc_in == 99

    def test_c_out(self):
        cfg = small_config()
        assert cfg.c_out == 2
        cfg.with_video = True
        cfg.dense_prediction = True
        assert cfg.c_out == cfg.enc_in - 3
