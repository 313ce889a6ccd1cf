"""Stitcher failure envelope: ORB+MAGSAC vs ground-truth homographies.

The reference stitches with kornia's LoFTR deep matcher
(``/root/reference/routeformer/io/image_stitcher.py:54-139``), chosen for
hard correspondence cases; this build substitutes ORB+ratio-test+MAGSAC
(no LoFTR weights offline). Round-2 VERDICT #9: the old evidence was one
synthetic pure-translation pair — exactly where ORB is easy. This sweep
measures reprojection error against ground truth across
rotation x perspective on textured AND low-texture frames, and pins the
supported envelope (documented in docs/PARITY.md).

Measured envelope (this suite, 240x320 textured frames, 30 px baseline):
ORB+MAGSAC holds < 1 px mean reprojection error for rotations <= 20 deg
combined with perspective tilt |H[2,0]| <= 5e-4. On low-texture frames
(smooth gradient + sigma-0.005 noise) matching collapses: estimation
either raises (too few correspondences) or exceeds the bound — the region
LoFTR's learned matcher is claimed to cover and this build does not.
"""

import numpy as np
import pytest

from routeformer_tpu.io.stitcher import RobustHomography, _match_orb

H_PX, W_PX = 240, 320
BASELINE_SHIFT = 30.0  # px, the stereo-pair translation component

ROTATIONS_DEG = (0.0, 2.0, 5.0, 10.0, 15.0, 20.0)
PERSPECTIVES = (0.0, 2e-4, 5e-4)
SUPPORTED_BOUND_PX = 1.0


def _textured(seed=0):
    """Feature-rich frame: multi-scale waves + speckle (ORB-friendly)."""
    rng = np.random.default_rng(seed)
    ys, xs = np.mgrid[0:H_PX, 0:W_PX].astype(np.float32)
    img = (
        0.30 * np.sin(xs / 7 + ys / 13)
        + 0.25 * np.cos(xs / 23) * np.sin(ys / 5)
        + 0.20 * np.sin((xs + 2 * ys) / 31)
    )
    img = np.stack([img, np.roll(img, 7, 1), np.roll(img, 13, 0)], -1)
    img = img * 0.5 + 0.5
    speckle = rng.uniform(size=img.shape[:2]) > 0.985
    img = np.clip(img + speckle[..., None] * 0.5, 0, 1)
    return img.astype(np.float32)


def _low_texture(seed=0):
    """Smooth gradient + faint noise — the ORB failure region."""
    rng = np.random.default_rng(seed)
    ys, xs = np.mgrid[0:H_PX, 0:W_PX].astype(np.float32)
    img = np.stack(
        [xs / W_PX, 0.5 + 0.3 * ys / H_PX, 0.4 + 0.2 * xs / W_PX], -1
    )
    img = img + rng.normal(0, 0.005, img.shape)
    return np.clip(img, 0, 1).astype(np.float32)


def _gt_homography(rot_deg: float, persp: float) -> np.ndarray:
    """right -> left map: translation (stereo baseline) o rotation o tilt."""
    import cv2

    t = np.eye(3)
    t[0, 2] = BASELINE_SHIFT
    r = np.eye(3)
    r[:2] = cv2.getRotationMatrix2D((W_PX / 2, H_PX / 2), rot_deg, 1.0)
    p = np.eye(3)
    p[2, 0] = persp
    return t @ r @ p


def _make_right(left: np.ndarray, h_gt: np.ndarray) -> np.ndarray:
    """right(x) = left(H_gt @ x)."""
    import cv2

    return cv2.warpPerspective(
        left, h_gt.astype(np.float64), (W_PX, H_PX),
        flags=cv2.INTER_LINEAR | cv2.WARP_INVERSE_MAP,
    )


def _reproj_error_px(h_est: np.ndarray, h_gt: np.ndarray) -> float:
    """Mean |H_est p - H_gt p| over a grid of right-image points."""
    ys, xs = np.mgrid[20 : H_PX - 20 : 20, 20 : W_PX - 20 : 20]
    pts = np.stack([xs.ravel(), ys.ravel(), np.ones(xs.size)], axis=-1)

    def apply(h):
        q = pts @ h.T
        return q[:, :2] / q[:, 2:3]

    return float(np.linalg.norm(apply(h_est) - apply(h_gt), axis=-1).mean())


def _estimate(left, right):
    pts_r, pts_l = _match_orb(right, left)
    h_est, mask = RobustHomography().estimate(pts_r, pts_l)
    return h_est, int(np.sum(mask)) if mask is not None else 0


def _sweep(base) -> dict:
    table = {}
    for rot in ROTATIONS_DEG:
        for persp in PERSPECTIVES:
            h_gt = _gt_homography(rot, persp)
            right = _make_right(base, h_gt)
            try:
                h_est, n_inliers = _estimate(base, right)
                err = _reproj_error_px(h_est, h_gt)
            except ValueError:
                err, n_inliers = np.inf, 0
            table[(rot, persp)] = (err, n_inliers)
    return table


class TestStitcherEnvelope:
    def test_textured_supported_envelope(self):
        """Bound over the full rotation x perspective sweep on textured
        frames: mean reprojection error < 1 px everywhere in the envelope."""
        table = _sweep(_textured())
        failures = {
            k: v for k, v in table.items() if v[0] > SUPPORTED_BOUND_PX
        }
        assert not failures, f"outside envelope: {failures} (full: {table})"

    def test_low_texture_is_outside_envelope(self):
        """Low-texture frames are OUTSIDE the ORB envelope (LoFTR's claimed
        territory): at moderate rotation the estimate must either fail
        outright or blow past the bound — never silently land inside it and
        mask the gap."""
        base = _low_texture()
        outcomes = []
        for rot, persp in [(5.0, 2e-4), (10.0, 5e-4), (20.0, 5e-4)]:
            h_gt = _gt_homography(rot, persp)
            right = _make_right(base, h_gt)
            try:
                h_est, _ = _estimate(base, right)
                outcomes.append(_reproj_error_px(h_est, h_gt))
            except ValueError:
                outcomes.append(np.inf)
        assert max(outcomes) > SUPPORTED_BOUND_PX, (
            "low-texture unexpectedly inside the envelope — update the "
            f"PARITY.md note: {outcomes}"
        )

    def test_failure_is_detectable_by_inlier_count(self):
        """A degraded estimate must be detectable upstream: textured pairs
        yield far more MAGSAC inliers than low-texture ones, so callers can
        gate on correspondence count."""
        h_gt = _gt_homography(5.0, 2e-4)
        textured_right = _make_right(_textured(), h_gt)
        try:
            _, n_textured = _estimate(_textured(), textured_right)
        except ValueError:
            pytest.fail("textured estimation must succeed")

        low = _low_texture()
        low_right = _make_right(low, h_gt)
        try:
            _, n_low = _estimate(low, low_right)
        except ValueError:
            n_low = 0
        assert n_textured >= 4 * max(n_low, 1), (n_textured, n_low)
