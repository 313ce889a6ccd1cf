"""Fused Perceive-stack kernel: parity vs the pure-JAX twin and the module
scan path (interpret mode — the same kernel code Mosaic compiles on TPU).

The twin (``stack_reference``) shares every helper with the kernel body, so
these tests pin the kernel's blocking/grid/accumulation logic; the
twin-vs-module tests pin the twin's math against the independently written
nnx layer stack (EncoderLayer + masked ProbSparse, ops/attention.py).
"""

import math
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from routeformer_tpu.models.cross_modal import PerceiveEncoder
from routeformer_tpu.ops import fusion_stack as fs


def _make_weights(n, d, f, key, scale=0.2):
    ks = jax.random.split(key, 16)

    def rnd(k, shape, s=scale):
        return jax.random.normal(k, shape, jnp.float32) * s

    return fs.StackWeights(
        wq=rnd(ks[0], (n, d, d)), bq=rnd(ks[1], (n, d)),
        wk=rnd(ks[2], (n, d, d)), bk=rnd(ks[3], (n, d)),
        wv=rnd(ks[4], (n, d, d)), bv=rnd(ks[5], (n, d)),
        wout=rnd(ks[6], (n, d, d)), bout=rnd(ks[7], (n, d)),
        ln1_scale=1.0 + rnd(ks[8], (n, d), 0.05),
        ln1_bias=rnd(ks[9], (n, d)),
        wff1=rnd(ks[10], (n, d, f)), bff1=rnd(ks[11], (n, f)),
        wff2=rnd(ks[12], (n, f, d)), bff2=rnd(ks[13], (n, d)),
        ln2_scale=1.0 + rnd(ks[14], (n, d), 0.05),
        ln2_bias=rnd(ks[15], (n, d)),
    )


def _u_for(l, factor=5):
    return min(int(factor * math.ceil(math.log(l))), l)


class TestOpParity:
    @pytest.mark.parametrize(
        "r,l,d,f,n",
        [
            (10, 17, 64, 128, 3),   # odd sizes, R pads to chunk
            (3, 65, 128, 256, 2),   # flagship frame-encoder geometry slice
            (2, 40, 64, 96, 1),     # single layer
        ],
    )
    def test_forward_matches_twin(self, r, l, d, f, n):
        key = jax.random.PRNGKey(r * 100 + l)
        w = _make_weights(n, d, f, key)
        x = jax.random.normal(jax.random.PRNGKey(1), (r, l, d), jnp.float32)
        cnt = fs.sample_count_matrices(
            jax.random.split(key, n), n, l, l, _u_for(l)
        )
        u = _u_for(l)
        y_twin = fs.stack_reference(
            x, w, cnt, None, heads=8, u=u, dropout_rate=0.0,
            compute_bf16=False,
        )
        y_kern = fs.fused_perceive_stack(
            x, w, cnt, None, heads=8, dropout_rate=0.0,
            compute_bf16=False, interpret=True,
        )
        np.testing.assert_allclose(y_kern, y_twin, atol=2e-5, rtol=1e-5)

    def test_grads_match_twin_autodiff(self):
        r, l, d, f, n = 6, 17, 64, 128, 2
        key = jax.random.PRNGKey(0)
        w = _make_weights(n, d, f, key)
        x = jax.random.normal(jax.random.PRNGKey(1), (r, l, d), jnp.float32)
        u = _u_for(l)
        cnt = fs.sample_count_matrices(jax.random.split(key, n), n, l, l, u)

        def loss_twin(x, wt):
            y = fs.stack_reference(
                x, fs.StackWeights(*wt), cnt, None, heads=8, u=u,
                dropout_rate=0.0, compute_bf16=False,
            )
            return jnp.sum(jnp.sin(y))

        def loss_kern(x, wt):
            y = fs._fused_stack(
                x, wt, cnt, None, 8, u, 0.0, "gelu", False, True
            )
            return jnp.sum(jnp.sin(y))

        gt = jax.grad(loss_twin, argnums=(0, 1))(x, tuple(w))
        gk = jax.grad(loss_kern, argnums=(0, 1))(x, tuple(w))
        np.testing.assert_allclose(gk[0], gt[0], atol=1e-4, rtol=1e-4)
        # one global scale: per-tensor relative checks misfire on grads
        # that are analytically ~0 (e.g. bk — softmax and the sparsity
        # measure are invariant to a uniform key shift)
        gscale = max(
            float(max(jnp.max(jnp.abs(a)) for a in gt[1])), 1e-12
        )
        for a, b in zip(gt[1], gk[1]):
            assert float(jnp.max(jnp.abs(a - b))) < 1e-5 * gscale + 1e-4

    def test_train_dropout_grads_match_masked_twin(self):
        r, l, d, f, n = 5, 17, 64, 128, 2
        p = 0.1
        key = jax.random.PRNGKey(3)
        w = _make_weights(n, d, f, key)
        x = jax.random.normal(jax.random.PRNGKey(4), (r, l, d), jnp.float32)
        u = _u_for(l)
        cnt = fs.sample_count_matrices(jax.random.split(key, n), n, l, l, u)
        masks = fs.make_dropout_masks(jax.random.PRNGKey(5), n, r, l, d, f, p)

        def loss_twin(x, wt):
            y = fs.stack_reference(
                x, fs.StackWeights(*wt), cnt, masks, heads=8, u=u,
                dropout_rate=p, compute_bf16=False,
            )
            return jnp.sum(y ** 2)

        def loss_kern(x, wt):
            y = fs._fused_stack(
                x, wt, cnt, masks, 8, u, p, "gelu", False, True
            )
            return jnp.sum(y ** 2)

        y_t = fs.stack_reference(
            x, w, cnt, masks, heads=8, u=u, dropout_rate=p,
            compute_bf16=False,
        )
        y_k = fs._fused_stack(x, tuple(w), cnt, masks, 8, u, p, "gelu",
                              False, True)
        np.testing.assert_allclose(y_k, y_t, atol=2e-5, rtol=1e-5)

        gt = jax.grad(loss_twin, argnums=(0, 1))(x, tuple(w))
        gk = jax.grad(loss_kern, argnums=(0, 1))(x, tuple(w))
        np.testing.assert_allclose(gk[0], gt[0], atol=1e-3, rtol=1e-4)
        gscale = max(
            float(max(jnp.max(jnp.abs(a)) for a in gt[1])), 1e-12
        )
        for a, b in zip(gt[1], gk[1]):
            assert float(jnp.max(jnp.abs(a - b))) < 1e-5 * gscale + 1e-3

    def test_bf16_forward_matches_bf16_twin(self):
        r, l, d, f, n = 4, 33, 128, 256, 2
        key = jax.random.PRNGKey(6)
        w = _make_weights(n, d, f, key)
        x = jax.random.normal(jax.random.PRNGKey(7), (r, l, d), jnp.float32)
        u = _u_for(l)
        cnt = fs.sample_count_matrices(jax.random.split(key, n), n, l, l, u)
        y_twin = fs.stack_reference(
            x, w, cnt, None, heads=8, u=u, dropout_rate=0.0,
            compute_bf16=True,
        )
        y_kern = fs.fused_perceive_stack(
            x, w, cnt, None, heads=8, dropout_rate=0.0,
            compute_bf16=True, interpret=True,
        )
        scale = float(jnp.max(jnp.abs(y_twin)))
        assert float(jnp.max(jnp.abs(y_kern - y_twin))) < 3e-2 * max(scale, 1.0)

    def test_selection_ties_included(self):
        """Tied sparsity measures at the top-u boundary: the rank test must
        select every tied row, exactly like ``m >= thresh`` in
        ops/attention.py:186-187."""
        l, u_part = 8, 4
        # Duplicate token rows => identical m values (guaranteed ties).
        x_row = jax.random.normal(jax.random.PRNGKey(8), (1, 1, 16))
        x = jnp.tile(x_row, (1, l, 1))
        w = _make_weights(1, 16, 32, jax.random.PRNGKey(9))
        cnt = fs.sample_count_matrices(
            jax.random.split(jax.random.PRNGKey(10), 1), 1, l, l, u_part
        )
        y_twin = fs.stack_reference(
            x, w, cnt, None, heads=8, u=_u_for(l), dropout_rate=0.0,
            compute_bf16=False,
        )
        y_kern = fs.fused_perceive_stack(
            x, w, cnt, None, heads=8, dropout_rate=0.0,
            compute_bf16=False, interpret=True,
        )
        np.testing.assert_allclose(y_kern, y_twin, atol=2e-5, rtol=1e-5)


class TestModuleParity:
    """PerceiveEncoder: fused-kernel path vs the nnx scan path."""

    def _build(self, layers=3, d_model=64, compute_dtype=None, seed=0):
        return PerceiveEncoder(
            in_channels=24, out_channels=16, out_len=5, factor=5,
            d_model=d_model, n_heads=8, layers=layers, d_ff=2 * d_model,
            dropout=0.05, compute_dtype=compute_dtype, rngs=nnx.Rngs(seed),
        )

    def test_eval_parity_f32(self, monkeypatch):
        enc = self._build()
        enc.eval()
        x = jax.random.normal(jax.random.PRNGKey(7), (6, 17, 24))
        monkeypatch.setenv("ROUTEFORMER_FUSION_KERNEL", "0")
        y_scan = enc(x)
        monkeypatch.setenv("ROUTEFORMER_FUSION_KERNEL", "interpret")
        y_kern = enc(x)
        # kernel gelu uses XLA's rational erf expansion (~1e-6), the scan
        # path the lax.erf primitive — allow that drift through 3 layers
        np.testing.assert_allclose(y_kern, y_scan, atol=5e-5, rtol=1e-5)

    def test_eval_parity_bf16(self, monkeypatch):
        enc = self._build(compute_dtype="bfloat16")
        enc.eval()
        x = jax.random.normal(jax.random.PRNGKey(8), (4, 23, 24))
        monkeypatch.setenv("ROUTEFORMER_FUSION_KERNEL", "0")
        y_scan = enc(x)
        monkeypatch.setenv("ROUTEFORMER_FUSION_KERNEL", "interpret")
        y_kern = enc(x)
        scale = float(jnp.max(jnp.abs(y_scan)))
        assert float(jnp.max(jnp.abs(y_kern - y_scan))) < 3e-2 * max(scale, 1.0)

    def test_train_grads_flow_and_are_finite(self, monkeypatch):
        monkeypatch.setenv("ROUTEFORMER_FUSION_KERNEL", "interpret")
        enc = self._build()
        enc.train()
        x = jax.random.normal(jax.random.PRNGKey(9), (6, 17, 24))

        def loss(m, x):
            return jnp.sum(m(x) ** 2)

        g = nnx.grad(loss)(enc, x)
        leaves = jax.tree.leaves(g)
        assert all(bool(jnp.isfinite(leaf).all()) for leaf in leaves)
        flat = jax.tree_util.tree_flatten_with_path(g)[0]
        stacked_nonzero = [
            v for k, v in flat
            if "stacked" in jax.tree_util.keystr(k)
            and float(jnp.abs(v).max()) > 0.0
        ]
        assert len(stacked_nonzero) >= 16

    def test_train_reproducible_across_identical_modules(self, monkeypatch):
        monkeypatch.setenv("ROUTEFORMER_FUSION_KERNEL", "interpret")
        x = jax.random.normal(jax.random.PRNGKey(10), (3, 17, 24))
        a, b = self._build(seed=1), self._build(seed=1)
        a.train(), b.train()
        np.testing.assert_array_equal(np.asarray(a(x)), np.asarray(b(x)))

    def test_gather_formulation_falls_back_to_scan(self, monkeypatch):
        monkeypatch.setenv("ROUTEFORMER_FUSION_KERNEL", "interpret")
        monkeypatch.setenv("ROUTEFORMER_PROBSPARSE", "gather")
        enc = self._build()
        assert enc._fused_kernel_mode() is None

    def test_disabled_by_env(self, monkeypatch):
        monkeypatch.setenv("ROUTEFORMER_FUSION_KERNEL", "0")
        enc = self._build()
        assert enc._fused_kernel_mode() is None


class TestHybridBackward:
    """Kernel forward + XLA per-layer-recompute backward (round 5): the
    dispatch path that needs no Mosaic backward compile. Gradients must
    match twin autodiff exactly at f32 (same math, same recompute
    strategy)."""

    def test_hybrid_grads_match_twin_autodiff(self):
        r, l, d, f, n = 6, 17, 64, 128, 2
        key = jax.random.PRNGKey(0)
        w = _make_weights(n, d, f, key)
        x = jax.random.normal(jax.random.PRNGKey(1), (r, l, d), jnp.float32)
        u = _u_for(l)
        cnt = fs.sample_count_matrices(jax.random.split(key, n), n, l, l, u)

        def loss_twin(x, wt):
            y = fs.stack_reference(
                x, fs.StackWeights(*wt), cnt, None, heads=8, u=u,
                dropout_rate=0.0, compute_bf16=False,
            )
            return jnp.sum(jnp.sin(y))

        def loss_hyb(x, wt):
            y = fs._fused_stack_hybrid(
                x, wt, cnt, None, 8, u, 0.0, "gelu", False, True
            )
            return jnp.sum(jnp.sin(y))

        gt = jax.grad(loss_twin, argnums=(0, 1))(x, tuple(w))
        gh = jax.jit(jax.grad(loss_hyb, argnums=(0, 1)))(x, tuple(w))
        np.testing.assert_allclose(gh[0], gt[0], atol=1e-4, rtol=1e-4)
        gscale = max(
            float(max(jnp.max(jnp.abs(a)) for a in gt[1])), 1e-12
        )
        for a, b in zip(gt[1], gh[1]):
            assert float(jnp.max(jnp.abs(a - b))) < 1e-5 * gscale + 1e-4

    def test_hybrid_train_dropout_grads(self):
        r, l, d, f, n = 5, 17, 64, 128, 2
        p = 0.1
        key = jax.random.PRNGKey(3)
        w = _make_weights(n, d, f, key)
        x = jax.random.normal(jax.random.PRNGKey(4), (r, l, d), jnp.float32)
        u = _u_for(l)
        cnt = fs.sample_count_matrices(jax.random.split(key, n), n, l, l, u)
        masks = fs.make_dropout_masks(jax.random.PRNGKey(5), n, r, l, d, f, p)

        def loss_twin(x, wt):
            y = fs.stack_reference(
                x, fs.StackWeights(*wt), cnt, masks, heads=8, u=u,
                dropout_rate=p, compute_bf16=False,
            )
            return jnp.sum(y ** 2)

        def loss_hyb(x, wt):
            y = fs._fused_stack_hybrid(
                x, wt, cnt, masks, 8, u, p, "gelu", False, True
            )
            return jnp.sum(y ** 2)

        gt = jax.grad(loss_twin, argnums=(0, 1))(x, tuple(w))
        gh = jax.grad(loss_hyb, argnums=(0, 1))(x, tuple(w))
        np.testing.assert_allclose(gh[0], gt[0], atol=1e-3, rtol=1e-4)
        gscale = max(
            float(max(jnp.max(jnp.abs(a)) for a in gt[1])), 1e-12
        )
        for a, b in zip(gt[1], gh[1]):
            assert float(jnp.max(jnp.abs(a - b))) < 1e-5 * gscale + 1e-3

    def test_module_hybrid_interpret_dispatch(self, monkeypatch):
        """ROUTEFORMER_FUSION_KERNEL=hybrid-interpret drives the module
        path end-to-end on CPU: outputs match the scan formulation in eval
        and train grads are finite."""
        from flax import nnx

        enc = TestModuleParity._build(None, layers=2)
        enc.eval()
        x = jax.random.normal(jax.random.PRNGKey(7), (3, 20, 24))
        monkeypatch.setenv("ROUTEFORMER_FUSION_KERNEL", "0")
        y_scan = enc(x)
        monkeypatch.setenv("ROUTEFORMER_FUSION_KERNEL", "hybrid-interpret")
        y_hyb = enc(x)
        np.testing.assert_allclose(
            np.asarray(y_hyb), np.asarray(y_scan), atol=2e-4, rtol=1e-4
        )

        enc.train()

        def loss(m, x):
            return jnp.sum(m(x) ** 2)

        g = nnx.grad(loss)(enc, x)
        leaves = jax.tree.leaves(g)
        assert leaves and all(
            np.isfinite(np.asarray(a)).all() for a in leaves
        )
