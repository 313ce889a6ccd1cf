"""Tests for Autoformer, FEDformer (Fourier + Wavelets) and PatchTST."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from flax import nnx

from routeformer_tpu.models.gps_backbone import (
    Autoformer,
    FEDformer,
    FEDFormerBackboneConfig,
    GPSBackboneConfig,
    PatchTST,
    PatchTSTBackboneConfig,
)
from routeformer_tpu.models.layers.autoformer_layers import (
    SeasonalLayerNorm,
    autoformer_moving_avg,
)
from routeformer_tpu.models.layers.multiwavelet import get_filter

SEQ, PRED = 40, 30
COMMON = dict(
    seq_len=SEQ, label_len=SEQ, pred_len=PRED,
    d_model=32, n_heads=4, e_layers=2, d_layers=1, d_ff=64,
    moving_avg=25, factor=1, dropout=0.0, activation="gelu",
)


@pytest.fixture
def x(rng):
    return jnp.asarray(rng.normal(size=(2, SEQ, 5)).astype(np.float32).cumsum(1))


class TestAutoformerPieces:
    def test_moving_avg_matches_torch_convention(self, rng):
        import torch
        import math

        x = rng.normal(size=(2, 20, 3)).astype(np.float32)
        for k in [4, 25]:  # even kernel exercises the asymmetric padding
            got = np.asarray(autoformer_moving_avg(jnp.asarray(x), k))
            tx = torch.tensor(x)
            end = math.floor((k - 1) // 2)
            front = k - 1 - end
            padded = torch.cat(
                [tx[:, :1].repeat(1, front, 1), tx, tx[:, -1:].repeat(1, end, 1)], 1
            )
            expected = (
                torch.nn.AvgPool1d(k, stride=1)(padded.permute(0, 2, 1))
                .permute(0, 2, 1)
                .numpy()
            )
            assert got.shape == expected.shape
            np.testing.assert_allclose(got, expected, atol=1e-5)

    def test_seasonal_layernorm_zero_mean(self, rng):
        norm = SeasonalLayerNorm(8, rngs=nnx.Rngs(0))
        x = jnp.asarray(rng.normal(size=(2, 10, 8)).astype(np.float32))
        out = np.asarray(norm(x))
        np.testing.assert_allclose(out.mean(axis=1), 0.0, atol=1e-5)


class TestAutoformer:
    def test_forward_shape_train_and_eval(self, x):
        cfg = GPSBackboneConfig(**COMMON)
        model = Autoformer(cfg, rngs=nnx.Rngs(0, dropout=1))
        model.train()
        out_t = model(x)
        model.eval()
        out_e = model(x)
        assert out_t.shape == (2, PRED, 2)
        assert out_e.shape == (2, PRED, 2)
        assert np.isfinite(np.asarray(out_t)).all()
        assert np.isfinite(np.asarray(out_e)).all()

    def test_grad_flows(self, x):
        cfg = GPSBackboneConfig(**COMMON)
        model = Autoformer(cfg, rngs=nnx.Rngs(0, dropout=1))
        model.eval()
        grads = nnx.grad(lambda m: (m(x) ** 2).mean())(model)
        leaves = jax.tree.leaves(grads)
        assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
        assert any(float(jnp.abs(g).max()) > 0 for g in leaves)


class TestWaveletFilters:
    def test_legendre_filters_orthogonality(self):
        """Perfect-reconstruction identity: analysis then synthesis is exact
        for the wavelet transform pair."""
        k = 4
        H0, H1, G0, G1, PHI0, PHI1 = get_filter("legendre", k)
        # two-scale orthogonality: H0 H0^T + H1 H1^T = I, G0 G0^T + G1 G1^T = I
        np.testing.assert_allclose(H0 @ H0.T + H1 @ H1.T, np.eye(k), atol=1e-7)
        np.testing.assert_allclose(G0 @ G0.T + G1 @ G1.T, np.eye(k), atol=1e-7)
        # cross terms vanish
        np.testing.assert_allclose(H0 @ G0.T + H1 @ G1.T, 0.0, atol=1e-7)

    def test_roundtrip_reconstruction(self, rng):
        """analysis (ec) then synthesis (rc) reproduces the input block."""
        from routeformer_tpu.models.layers.multiwavelet import (
            _even_odd,
            _reconstruction_filters,
            _wavelet_transform,
        )

        k = 8
        ec_s, ec_d, rc_e, rc_o = map(
            jnp.asarray, _reconstruction_filters("legendre", k)
        )
        x = jnp.asarray(rng.normal(size=(1, 16, 2, k)).astype(np.float32))
        d, s = _wavelet_transform(x, ec_d, ec_s)
        merged = jnp.concatenate([s, d], axis=-1)
        back = _even_odd(merged, rc_e, rc_o, k)
        np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-4)

    def test_chebyshev_filters_exist(self):
        H0, H1, G0, G1, PHI0, PHI1 = get_filter("chebyshev", 4)
        for m in (H0, H1, G0, G1, PHI0, PHI1):
            assert np.isfinite(m).all()


class TestFEDformer:
    @pytest.mark.parametrize("version", ["Fourier", "Wavelets"])
    def test_forward_shape(self, x, version):
        cfg = FEDFormerBackboneConfig(**COMMON, version=version, modes=8)
        model = FEDformer(cfg, rngs=nnx.Rngs(0, dropout=1))
        model.eval()
        out = model(x)
        assert out.shape == (2, PRED, 2)
        assert np.isfinite(np.asarray(out)).all()

    def test_fourier_grad(self, x):
        cfg = FEDFormerBackboneConfig(**COMMON, version="Fourier", modes=8)
        model = FEDformer(cfg, rngs=nnx.Rngs(0, dropout=1))
        model.eval()
        grads = nnx.grad(lambda m: (m(x) ** 2).mean())(model)
        leaves = jax.tree.leaves(grads)
        assert all(np.isfinite(np.asarray(g)).all() for g in leaves)


class TestPatchTST:
    def patch_cfg(self, **kw):
        params = dict(COMMON)
        params.update(
            fc_dropout=0.0, head_dropout=0.0, patch_len_ratio=0.25,
            stride_ratio=0.125, padding_patch="end", revin=True, affine=False,
            subtract_last=False, decomposition=False, kernel_size=25,
        )
        params.update(kw)
        return PatchTSTBackboneConfig(**params)

    def test_forward_shape(self, x):
        model = PatchTST(self.patch_cfg(), rngs=nnx.Rngs(0, dropout=1))
        model.eval()
        out = model(x)
        assert out.shape == (2, PRED, 2)
        assert np.isfinite(np.asarray(out)).all()

    def test_decomposition_mode(self, x):
        model = PatchTST(
            self.patch_cfg(decomposition=True), rngs=nnx.Rngs(0, dropout=1)
        )
        model.eval()
        assert model(x).shape == (2, PRED, 2)

    def test_revin_shift_robustness(self, x):
        """RevIN normalizes per instance: large constant input shifts should
        shift outputs near-linearly, not explode."""
        model = PatchTST(self.patch_cfg(), rngs=nnx.Rngs(0, dropout=1))
        model.eval()
        a = np.asarray(model(x))
        b = np.asarray(model(x + 1000.0))
        assert np.isfinite(b).all()
        # RevIN denorm re-adds the instance mean, so the +1000 shift passes
        # through the (c_in -> c_out) projection — bounded, not exploding.
        assert np.abs(b - a).max() < 10000.0
        assert np.abs(b - a).min() > 1.0

    def test_jit(self, x):
        model = PatchTST(self.patch_cfg(), rngs=nnx.Rngs(0, dropout=1))
        model.eval()

        @nnx.jit
        def f(m, x):
            return m(x)

        assert f(model, x).shape == (2, PRED, 2)
