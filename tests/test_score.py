"""Tests for metrics: ADE/FDE, Fréchet distance, PCI.

The Fréchet oracle is an independent O(PQ) numpy DP implementing the textbook
discrete-Fréchet recursion (same semantics as the `frechetdist` package the
reference uses).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from routeformer_tpu.score import (
    ade,
    ade_per_sample,
    estimate_pci,
    estimate_pci_batch,
    estimate_regular_trajectory,
    fde,
    fde_per_sample,
    frechet_distance,
    frechet_distance_batch,
)


def frechet_oracle(p: np.ndarray, q: np.ndarray) -> float:
    """Textbook discrete Fréchet DP (iterative, numpy)."""
    n, m = len(p), len(q)
    d = np.linalg.norm(p[:, None, :] - q[None, :, :], axis=-1)
    ca = np.full((n, m), np.inf)
    ca[0, 0] = d[0, 0]
    for j in range(1, m):
        ca[0, j] = max(ca[0, j - 1], d[0, j])
    for i in range(1, n):
        ca[i, 0] = max(ca[i - 1, 0], d[i, 0])
        for j in range(1, m):
            ca[i, j] = max(min(ca[i - 1, j], ca[i - 1, j - 1], ca[i, j - 1]), d[i, j])
    return float(ca[-1, -1])


class TestErrors:
    def test_ade_zero(self):
        x = jnp.ones((5, 2))
        assert float(ade(x, x)) == 0.0

    def test_ade_known(self):
        pred = jnp.array([[0.0, 0.0], [0.0, 0.0]])
        true = jnp.array([[3.0, 4.0], [0.0, 1.0]])
        np.testing.assert_allclose(float(ade(pred, true)), 3.0, atol=1e-6)

    def test_fde_last_point(self):
        pred = jnp.array([[0.0, 0.0], [1.0, 1.0]])
        true = jnp.array([[9.0, 9.0], [4.0, 5.0]])
        np.testing.assert_allclose(float(fde(pred, true)), 5.0, atol=1e-6)

    def test_batched_match_per_sample(self, rng):
        pred = rng.normal(size=(4, 30, 2)).astype(np.float32)
        true = rng.normal(size=(4, 30, 2)).astype(np.float32)
        a = np.asarray(ade_per_sample(jnp.asarray(pred), jnp.asarray(true)))
        f = np.asarray(fde_per_sample(jnp.asarray(pred), jnp.asarray(true)))
        for i in range(4):
            np.testing.assert_allclose(
                a[i], float(ade(jnp.asarray(pred[i]), jnp.asarray(true[i]))), rtol=1e-5
            )
            np.testing.assert_allclose(
                f[i], float(fde(jnp.asarray(pred[i]), jnp.asarray(true[i]))), rtol=1e-5
            )


class TestFrechet:
    def test_identical(self, rng):
        p = rng.normal(size=(20, 2)).astype(np.float32)
        assert float(frechet_distance(jnp.asarray(p), jnp.asarray(p))) == pytest.approx(
            0.0, abs=1e-6
        )

    def test_matches_oracle(self, rng):
        for _ in range(10):
            p = rng.normal(size=(15, 2)).astype(np.float32)
            q = rng.normal(size=(23, 2)).astype(np.float32)
            got = float(frechet_distance(jnp.asarray(p), jnp.asarray(q)))
            np.testing.assert_allclose(got, frechet_oracle(p, q), rtol=1e-5)

    def test_batch(self, rng):
        p = rng.normal(size=(6, 12, 2)).astype(np.float32)
        q = rng.normal(size=(6, 12, 2)).astype(np.float32)
        got = np.asarray(frechet_distance_batch(jnp.asarray(p), jnp.asarray(q)))
        expected = [frechet_oracle(p[i], q[i]) for i in range(6)]
        np.testing.assert_allclose(got, expected, rtol=1e-5)


class TestPCI:
    def test_straight_line_is_simple(self, rng):
        """A perfectly linear continuation has ~zero PCI."""
        t = np.arange(70, dtype=np.float64) / 30.0
        traj = np.stack([3.0 * t + 1.0, -2.0 * t + 0.5], axis=-1)
        score = estimate_pci(traj[:40], traj[40:], curve_type="linear")
        assert score < 1e-4

    def test_turn_has_high_pci(self):
        t = np.arange(40, dtype=np.float64) / 30.0
        inp = np.stack([t, np.zeros_like(t)], axis=-1)
        # future turns 90 degrees
        tt = np.arange(1, 31, dtype=np.float64) / 30.0
        fut = np.stack([np.full_like(tt, t[-1]), tt], axis=-1)
        score = estimate_pci(inp, fut, curve_type="linear")
        assert score > 0.3

    def test_regular_trajectory_matches_numpy_polyfit(self, rng):
        traj = rng.normal(size=(40, 2)).astype(np.float64).cumsum(axis=0)
        reg = estimate_regular_trajectory(traj, 30, "quadratic", lookback_length=8)
        # independent check: fit last 8 points with numpy Polynomial on the
        # same time base
        time = np.arange(8 + 30) / 30.0
        fit_x = np.polynomial.Polynomial.fit(
            time[:8], traj[-8:, 0], 2, domain=[time[0], time[7]]
        )
        np.testing.assert_allclose(reg[:, 0], fit_x(time[8:]), rtol=1e-6, atol=1e-8)

    def test_batch_matches_scalar(self, rng):
        inputs = rng.normal(size=(5, 40, 2)).astype(np.float64).cumsum(axis=1)
        targets = rng.normal(size=(5, 30, 2)).astype(np.float64).cumsum(axis=1)
        batch = estimate_pci_batch(inputs, targets, curve_type="linear")
        for i in range(5):
            single = estimate_pci(inputs[i], targets[i], curve_type="linear")
            np.testing.assert_allclose(batch[i], single, rtol=1e-3, atol=1e-4)

    def test_constrained_quadratic_respects_bounds(self):
        t = np.arange(10, dtype=np.float64) / 30.0
        traj = np.stack([50.0 * t**2, np.zeros_like(t)], axis=-1)
        reg = estimate_regular_trajectory(
            traj,
            10,
            "constrained_quadratic",
            lookback_length=6,
            constraints={"max_speed": 5.0, "max_accel": 2.0},
        )
        assert reg.shape == (10, 2)
        # with tight accel constraint the curve is flatter than unconstrained
        unconstrained = estimate_regular_trajectory(
            traj, 10, "quadratic", lookback_length=6
        )
        assert np.abs(reg[-1, 0]) <= np.abs(unconstrained[-1, 0]) + 1e-6

    def test_lookback_validation(self):
        with pytest.raises(ValueError):
            estimate_regular_trajectory(np.zeros((3, 2)), 5, lookback_length=6)
