"""Tests for fixation detection, camera models (vs cv2 oracle), and the
image/heatmap ops."""

import numpy as np
import jax.numpy as jnp
import pytest

from routeformer_tpu.io.gaze import (
    Dummy_Camera,
    Radial_Dist_Camera,
    detect_fixations,
    vector_dispersion,
)
from routeformer_tpu.ops.heatmap import overlay_heatmap_on_frame, rasterize_gaze_heatmap
from routeformer_tpu.ops.image import (
    crop_horizontal,
    resize_video,
    to_float16,
    undistort_grid,
    undistort_video,
)

K = [[800.0, 0.0, 544.0], [0.0, 800.0, 540.0], [0.0, 0.0, 1.0]]
D = [-0.12, 0.05, 0.001, -0.002, 0.01]


class TestCameraModel:
    def test_unproject_matches_cv2(self, rng):
        import cv2

        cam = Radial_Dist_Camera("test", (1088, 1080), K, D)
        pts = rng.uniform(100, 900, size=(20, 2)).astype(np.float64)
        got = cam.unprojectPoints(pts)
        und = cv2.undistortPoints(
            pts.reshape(-1, 1, 2).astype(np.float32), np.array(K), np.array(D)
        ).reshape(-1, 2)
        expected = np.concatenate([und, np.ones((20, 1))], axis=-1)
        np.testing.assert_allclose(got, expected, atol=1e-4)

    def test_project_unproject_roundtrip(self, rng):
        cam = Radial_Dist_Camera("test", (1088, 1080), K, D)
        pts = rng.uniform(200, 800, size=(10, 2))
        rays = cam.unprojectPoints(pts)
        back = cam.projectPoints(rays)
        np.testing.assert_allclose(back, pts, atol=1e-3)

    def test_dummy_camera_is_pinhole(self):
        cam = Dummy_Camera("d", (640, 480))
        rays = cam.unprojectPoints(np.array([[320.0, 240.0]]))
        np.testing.assert_allclose(rays, [[0.0, 0.0, 1.0]], atol=1e-9)


class TestSolvePnP:
    """Numpy solvePnP (reference gaze.py:344-374, cv2 as oracle): DLT or
    homography init + LM refinement recovers the pose through the full
    distortion model."""

    RVEC_GT = np.array([0.2, -0.3, 0.1])
    TVEC_GT = np.array([0.3, -0.2, 4.0])

    def _cam(self):
        return Radial_Dist_Camera("test", (1088, 1080), K, D)

    def _check(self, cam, obj, atol=1e-8):
        img = cam.projectPoints(obj, rvec=self.RVEC_GT, tvec=self.TVEC_GT)
        ok, r, t = cam.solvePnP(obj, img)
        assert ok
        np.testing.assert_allclose(r.ravel(), self.RVEC_GT, atol=atol)
        np.testing.assert_allclose(t.ravel(), self.TVEC_GT, atol=atol)
        assert r.shape == (3, 1) and t.shape == (3, 1)  # cv2 contract

    def test_general_cloud(self, rng):
        self._check(self._cam(), rng.uniform(-1, 1, (20, 3)))

    def test_planar_board(self):
        board = np.stack(
            np.meshgrid(np.linspace(-1, 1, 5), np.linspace(-1, 1, 4)), -1
        ).reshape(-1, 2)
        self._check(
            self._cam(),
            np.concatenate([board, np.zeros((board.shape[0], 1))], axis=1),
        )

    def test_minimal_four_points(self):
        self._check(
            self._cam(),
            np.array([[-1, -1, 0], [1, -1, 0], [1, 1, 0], [-1, 1, 0]], float),
        )

    def test_matches_cv2(self, rng):
        import cv2

        cam = self._cam()
        obj = rng.uniform(-1, 1, (15, 3))
        img = cam.projectPoints(obj, rvec=self.RVEC_GT, tvec=self.TVEC_GT)
        _, r_cv, t_cv = cv2.solvePnP(
            obj.reshape(1, -1, 3), img.reshape(1, -1, 2),
            np.asarray(K, np.float64), np.asarray(D, np.float64),
        )
        _, r, t = cam.solvePnP(obj, img)
        np.testing.assert_allclose(r, r_cv, atol=1e-6)
        np.testing.assert_allclose(t, t_cv, atol=1e-6)

    def test_extrinsic_guess(self, rng):
        cam = self._cam()
        obj = rng.uniform(-1, 1, (12, 3))
        img = cam.projectPoints(obj, rvec=self.RVEC_GT, tvec=self.TVEC_GT)
        ok, r, t = cam.solvePnP(
            obj, img, useExtrinsicGuess=True,
            rvec=self.RVEC_GT + 0.05, tvec=self.TVEC_GT - 0.3,
        )
        assert ok
        np.testing.assert_allclose(r.ravel(), self.RVEC_GT, atol=1e-8)

    def test_input_validation(self):
        cam = self._cam()
        with pytest.raises(ValueError, match="not the same"):
            cam.solvePnP(np.zeros((5, 3)), np.zeros((4, 2)))
        with pytest.raises(ValueError, match="3d points"):
            cam.solvePnP(np.zeros((5, 4)), np.zeros((5, 2)))

    def test_pi_rotation_poses(self, rng):
        """180-degree poses: the inverse-Rodrigues near-pi branch used to
        zero the axis (all skew terms vanish at exactly pi) and seed the LM
        refinement with NaN. Poses about principal and oblique axes must
        solve with a finite rvec and tiny reprojection error."""
        cam = self._cam()
        obj = rng.uniform(-1, 1, (12, 3))
        tvec = np.array([0.1, 0.2, 8.0])
        axes = [
            np.array([0.0, 0.0, 1.0]),
            np.array([0.0, 1.0, 0.0]),
            np.array([1.0, 0.0, 0.0]),
            np.array([1.0, 1.0, 0.0]) / np.sqrt(2),
        ]
        for axis in axes:
            rvec = axis * np.pi
            img = cam.projectPoints(obj, rvec=rvec, tvec=tvec)
            ok, r, t = cam.solvePnP(obj, img)
            assert ok, axis
            assert np.all(np.isfinite(r)) and np.all(np.isfinite(t)), axis
            re = cam.projectPoints(obj, rvec=r.ravel(), tvec=t.ravel())
            np.testing.assert_allclose(re, img, atol=1e-5)


class TestFixationDetection:
    def make_gaze(self, clusters, hz=200.0, noise=0.0005, seed=0):
        """clusters: list of (duration_s, x, y) dwell segments."""
        rng = np.random.default_rng(seed)
        data = []
        t = 0.0
        for duration, x, y in clusters:
            n = int(duration * hz)
            for _ in range(n):
                data.append(
                    {
                        "timestamp": t,
                        "confidence": 1.0,
                        "norm_pos": (
                            x + rng.normal(0, noise),
                            y + rng.normal(0, noise),
                        ),
                    }
                )
                t += 1.0 / hz
        return data

    def capture(self):
        return {
            "frame_size": (1088, 1080),
            "intrinsics": {"(1088, 1080)": {
                "cam_type": "radial", "camera_matrix": K, "dist_coefs": D,
            }},
        }

    def test_detects_dwells_not_saccades(self):
        gaze = self.make_gaze(
            [(0.3, 0.4, 0.5), (0.05, 0.8, 0.2), (0.3, 0.6, 0.6)]
        )
        is_fix = detect_fixations(self.capture(), gaze)
        n = len(gaze)
        first = is_fix[: int(0.25 * 200)]
        middle = is_fix[int(0.31 * 200) : int(0.34 * 200)]
        last = is_fix[int(0.4 * 200) : n - 10]
        assert first.mean() > 0.8   # dwell 1 is fixation
        assert middle.mean() < 0.5  # saccade segment mostly not
        assert last.mean() > 0.8    # dwell 2 is fixation

    def test_low_confidence_excluded(self):
        gaze = self.make_gaze([(0.3, 0.5, 0.5)])
        for g in gaze:
            g["confidence"] = 0.1
        result = detect_fixations(self.capture(), gaze)
        assert result[0] == "Fixation detection failed"

    def test_dispersion_of_identical_vectors_is_zero(self):
        v = np.tile([[0.1, 0.2, 1.0]], (5, 1))
        v = v + np.random.default_rng(0).normal(0, 1e-9, v.shape)
        assert vector_dispersion(v) < 1e-4


class TestImageOps:
    def test_undistort_grid_matches_cv2(self):
        """The remap grid equals cv2.initUndistortRectifyMap to ~4e-6 px."""
        import cv2

        k = np.array([[100.0, 0, 48.0], [0, 100.0, 32.0], [0, 0, 1.0]])
        d = np.array([-0.2, 0.05, 0.001, -0.002, 0.01])
        grid = undistort_grid(k, d, 64, 96)
        mx, my = cv2.initUndistortRectifyMap(k, d, None, k, (96, 64), cv2.CV_32FC1)
        np.testing.assert_allclose(grid[..., 0], mx, atol=1e-4)
        np.testing.assert_allclose(grid[..., 1], my, atol=1e-4)

    def test_undistort_matches_cv2_on_smooth_image(self):
        """Value-level parity on a smooth image (cv2 remap quantizes
        coordinates to 1/32 px, so high-gradient images differ by design)."""
        import cv2

        ys, xs = np.mgrid[0:64, 0:96].astype(np.float32)
        img = np.stack([np.sin(xs / 9), np.cos(ys / 7), xs / 96 + ys / 64], -1) * 0.5
        k = np.array([[100.0, 0, 48.0], [0, 100.0, 32.0], [0, 0, 1.0]])
        d = np.array([-0.2, 0.05, 0.0, 0.0, 0.0])
        got = np.asarray(undistort_video(jnp.asarray(img[None]), k, d))[0]
        expected = cv2.undistort(img, k, d)
        np.testing.assert_allclose(
            got[8:-8, 8:-8], expected[8:-8, 8:-8], atol=3e-3
        )

    def test_identity_undistort(self, rng):
        img = rng.uniform(0, 1, size=(32, 32, 3)).astype(np.float32)
        k = np.array([[50.0, 0, 16.0], [0, 50.0, 16.0], [0, 0, 1.0]])
        got = np.asarray(undistort_video(jnp.asarray(img[None]), k, np.zeros(5)))[0]
        np.testing.assert_allclose(got, img, atol=1e-5)

    def test_resize_and_crop(self, rng):
        frames = jnp.asarray(rng.uniform(size=(2, 40, 60, 3)).astype(np.float32))
        resized = resize_video(frames, (20, 30))
        assert resized.shape == (2, 20, 30, 3)
        cropped = crop_horizontal(frames)
        assert cropped.shape == (2, 40, 24, 3)  # 0.3..0.7 of 60

    def test_to_float16(self):
        frames = np.array([[[[0, 128, 255]]]], dtype=np.uint8)
        out = np.asarray(to_float16(frames))
        assert out.dtype == np.float16
        np.testing.assert_allclose(out[0, 0, 0], [0, 128 / 255, 1.0], atol=1e-3)

    def test_to_float16_matches_host_conversion_for_all_values(self):
        # the uint8 wire format relies on the on-device conversion being
        # bit-identical to the host-side one (reference dataset.py:1522)
        u = np.arange(256, dtype=np.uint8).reshape(1, 16, 16, 1)
        host = u.astype(np.float16) / 255.0
        np.testing.assert_array_equal(np.asarray(to_float16(u)), host)

    def test_dequantize_videos_dispatch(self):
        from routeformer_tpu.ops.image import dequantize_videos

        u8_video = jnp.asarray(
            np.random.default_rng(0).integers(0, 256, (2, 3, 4, 4, 3), np.uint8)
        )
        f16_video = jnp.asarray(
            np.random.default_rng(1).random((2, 3, 4, 4, 3)).astype(np.float16)
        )
        gps = jnp.zeros((2, 5, 2), jnp.float32)
        u8_not_video = jnp.asarray(np.arange(4, dtype=np.uint8))
        batch = {
            "left_video": u8_video,
            "front_video": f16_video,
            "gps": gps,
            "mask": u8_not_video,
            "nested": {"right_video": u8_video},
        }
        out = dequantize_videos(batch)
        assert out["left_video"].dtype == jnp.float16
        np.testing.assert_array_equal(
            np.asarray(out["left_video"]),
            np.asarray(u8_video).astype(np.float16) / 255.0,
        )
        assert out["front_video"] is f16_video  # pass-through
        assert out["gps"] is gps
        assert out["mask"] is u8_not_video  # only *video* keys convert
        assert out["nested"]["right_video"].dtype == jnp.float16


class TestHeatmap:
    def test_peak_at_gaze_point(self):
        pts = jnp.array([[[30.0, 10.0]]])  # (B=1, N=1, xy)
        heat = np.asarray(rasterize_gaze_heatmap(pts, height=32, width=64, sigma=3.0))
        assert heat.shape == (1, 32, 64)
        y, x = np.unravel_index(heat[0].argmax(), heat[0].shape)
        assert (x, y) == (30, 10)
        np.testing.assert_allclose(heat[0, 10, 30], 1.0, atol=1e-5)

    def test_multiple_points_weighted(self):
        pts = jnp.array([[[10.0, 10.0], [50.0, 20.0]]])
        w = jnp.array([[1.0, 0.2]])
        heat = np.asarray(
            rasterize_gaze_heatmap(pts, height=32, width=64, sigma=2.0, weights=w)
        )
        assert heat[0, 10, 10] > heat[0, 20, 50]

    def test_overlay_shapes(self, rng):
        frame = jnp.asarray(rng.uniform(size=(32, 64, 3)).astype(np.float32))
        heat = rasterize_gaze_heatmap(jnp.array([[[32.0, 16.0]]]), 32, 64)
        out = overlay_heatmap_on_frame(frame, heat[0])
        assert out.shape == (32, 64, 3)
        assert np.isfinite(np.asarray(out)).all()
