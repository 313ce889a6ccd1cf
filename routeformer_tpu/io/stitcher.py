"""Panorama stitching of left/right views.

Capability parity with reference ``routeformer/io/image_stitcher.py``:
``ImageStitcher.stitch_pair`` (:64-110) estimates one homography between
the first left/right frame pair and reuses it to warp every subsequent
frame onto a shared canvas (homography reuse is the reference's main
performance trick — :112-139).

Matcher substitution: the reference uses kornia's LoFTR deep matcher with a
cv2 MAGSAC wrapper (``CV2RANSAC`` :13-44); LoFTR weights are not available
offline, so correspondences come from ORB features + ratio-test BFMatcher,
with the same MAGSAC-robust homography estimation. The warp itself runs
through this framework's device remap kernel.
"""

from typing import Optional

import numpy as np

from routeformer_tpu.utils.logging import get_logger

logger = get_logger("io.stitcher")


class RobustHomography:
    """MAGSAC homography from point correspondences (reference CV2RANSAC
    :13-44 role)."""

    def __init__(self, threshold: float = 0.5):
        self.threshold = threshold

    def estimate(self, keypoints1: np.ndarray, keypoints2: np.ndarray):
        import cv2

        if len(keypoints1) < 4:
            raise ValueError("need at least 4 correspondences for a homography")
        method = getattr(cv2, "USAC_MAGSAC", cv2.RANSAC)
        H, mask = cv2.findHomography(
            np.asarray(keypoints1, dtype=np.float64),
            np.asarray(keypoints2, dtype=np.float64),
            method,
            self.threshold,
        )
        if H is None:
            raise ValueError("homography estimation failed")
        return H, mask


def _match_orb(img1: np.ndarray, img2: np.ndarray, n_features: int = 2000):
    """ORB + ratio-test correspondences (LoFTR substitute)."""
    import cv2

    def to_u8_gray(img):
        if img.dtype != np.uint8:
            img = (np.clip(img, 0, 1) * 255).astype(np.uint8)
        if img.ndim == 3:
            img = cv2.cvtColor(img, cv2.COLOR_RGB2GRAY)
        return img

    orb = cv2.ORB_create(nfeatures=n_features)
    k1, d1 = orb.detectAndCompute(to_u8_gray(img1), None)
    k2, d2 = orb.detectAndCompute(to_u8_gray(img2), None)
    if d1 is None or d2 is None:
        return np.zeros((0, 2)), np.zeros((0, 2))
    matcher = cv2.BFMatcher(cv2.NORM_HAMMING)
    matches = matcher.knnMatch(d1, d2, k=2)
    good = [m for m, n in (p for p in matches if len(p) == 2) if m.distance < 0.75 * n.distance]
    pts1 = np.array([k1[m.queryIdx].pt for m in good])
    pts2 = np.array([k2[m.trainIdx].pt for m in good])
    return pts1, pts2


def _to_gray_f32(img: np.ndarray) -> np.ndarray:
    import cv2

    if img.dtype == np.uint8:
        img = img.astype(np.float32) / 255.0
    img = img.astype(np.float32)
    if img.ndim == 3:
        img = cv2.cvtColor(img, cv2.COLOR_RGB2GRAY)
    return img


def _highpass(img: np.ndarray, sigma: float = 12.0) -> np.ndarray:
    """Remove smooth shading (the part of a low-texture frame that carries
    no alignment information) so NCC locks onto the weak structure left."""
    import cv2

    return img - cv2.GaussianBlur(img, (0, 0), sigma)


def _match_patches(
    gl: np.ndarray,
    gr: np.ndarray,
    H: Optional[np.ndarray],
    patch: int,
    search: int,
    min_score: float,
    step: int = 28,
):
    """Dense NCC template correspondences between high-passed grays.

    A grid of ``patch``-sized left patches is located in the right image
    (pre-warped by ``H`` when given) via ``cv2.matchTemplate``
    (TM_CCOEFF_NORMED — patch-mean-normalized, so smooth shading and the
    ORB-defeating low contrast don't bias the peak) within a ``search``
    margin. Returns (left points, points in the warped-right frame)."""
    import cv2

    h_px, w_px = gl.shape
    grw = (
        gr
        if H is None
        else cv2.warpPerspective(gr, H.astype(np.float64), (w_px, h_px))
    )
    pts_l, pts_w = [], []
    half = patch // 2
    for cy in range(half + 8, h_px - half - 8, step):
        for cx in range(half + 8, w_px - half - 8, step):
            tmpl = gl[cy - half : cy + half, cx - half : cx + half]
            if tmpl.std() < 1e-4:
                continue
            y0 = max(0, cy - half - search)
            y1 = min(h_px, cy + half + search)
            x0 = max(0, cx - half - search)
            x1 = min(w_px, cx + half + search)
            res = cv2.matchTemplate(
                grw[y0:y1, x0:x1], tmpl, cv2.TM_CCOEFF_NORMED
            )
            _, mx, _, loc = cv2.minMaxLoc(res)
            if mx < min_score:
                continue
            pts_l.append((cx, cy))
            pts_w.append((x0 + loc[0] + half, y0 + loc[1] + half))
    return np.asarray(pts_l, np.float64), np.asarray(pts_w, np.float64)


# (patch px, search px, min NCC score, MAGSAC threshold) per round: a
# small-patch wide-search bootstrap (rotation-tolerant), then two
# large-patch narrow-search refinements against the pre-warped right.
_DENSE_ROUNDS = ((24, 70, 0.40, 3.0), (40, 16, 0.55, 1.0), (40, 8, 0.55, 1.0))
_DENSE_MIN_MATCHES = 8


def _dense_match_homography(left: np.ndarray, right: np.ndarray):
    """Non-learned dense fallback for frames where sparse features
    collapse — the region the reference covers with LoFTR
    (image_stitcher.py:54-139). Iterated NCC patch correspondences +
    MAGSAC: measured on the envelope sweep
    (tests/test_stitcher_envelope.py) it recovers low-texture pairs to
    < 1 px across rotations <= 20 deg x perspective <= 5e-4 where ORB
    finds ZERO correspondences. Raises ValueError (explicit gate) when
    the frames carry too little structure to match."""
    gl = _highpass(_to_gray_f32(left))
    gr = _highpass(_to_gray_f32(right))
    H = None
    estimator = None
    for rnd, (patch, search, score, thr) in enumerate(_DENSE_ROUNDS):
        pts_l, pts_w = _match_patches(
            gl, gr, H, patch=patch, search=search, min_score=score
        )
        if len(pts_l) < _DENSE_MIN_MATCHES:
            raise ValueError(
                f"dense fallback: only {len(pts_l)} patch matches in round "
                f"{rnd} (needs {_DENSE_MIN_MATCHES}) — frames carry too "
                "little structure to align"
            )
        if H is None:
            pts_r = pts_w
        else:
            # warped-right frame -> original right coords
            q = np.concatenate(
                [pts_w, np.ones((len(pts_w), 1))], axis=1
            ) @ np.linalg.inv(H).T
            pts_r = q[:, :2] / q[:, 2:3]
        estimator = RobustHomography(threshold=thr)
        H, mask = estimator.estimate(pts_r, pts_l)
    return H, int(mask.sum())


class ImageStitcher:
    """Stitch left/right frame sequences with a reused homography."""

    # Below these, sparse estimation is considered degraded and the dense
    # NCC fallback takes over (the low-texture gate measured in
    # tests/test_stitcher_envelope.py: textured pairs produce >= 4x more).
    MIN_CORRESPONDENCES = 20
    MIN_INLIERS = 12

    # While degraded (last estimation failed), re-attempt a full estimate
    # every Nth stitched frame instead of every frame: the dense NCC
    # fallback costs ~100 ms/frame, and a structureless video would
    # otherwise pay it 5x/second for nothing.
    RETRY_PERIOD = 25

    def __init__(self, threshold: float = 0.5, blend: str = "feather"):
        self.homography = RobustHomography(threshold)
        self.blend = blend
        self._cached_h: Optional[np.ndarray] = None
        # observability: "orb"/"dense"/"orb-degraded"/"reuse-cached"/
        # "side-by-side"
        self.last_method: Optional[str] = None
        self._degraded = False
        self._frames_since_retry = 0

    def estimate(self, left: np.ndarray, right: np.ndarray) -> np.ndarray:
        """Estimate (and cache) the right->left-canvas homography.

        Sparse ORB+MAGSAC first; when correspondences or MAGSAC inliers
        fall under the degradation gate (low-texture frames), the dense
        NCC patch-match fallback recovers the LoFTR region instead of
        hard-failing. Truly structureless frames still raise ValueError
        (the explicit gate)."""
        pts_r, pts_l = _match_orb(right, left)
        H = None
        sparse_h = None
        if len(pts_r) >= 4:
            try:
                sparse_h, mask = self.homography.estimate(pts_r, pts_l)
                n_inliers = int(mask.sum()) if mask is not None else 0
                if (
                    len(pts_r) >= self.MIN_CORRESPONDENCES
                    and n_inliers >= self.MIN_INLIERS
                ):
                    H = sparse_h
                    self.last_method = "orb"
            except ValueError:
                sparse_h = None
        if H is None:
            logger.info(
                "sparse matching degraded (%d correspondences); using the "
                "dense NCC patch-match fallback", len(pts_r),
            )
            try:
                H, _ = _dense_match_homography(left, right)
                self.last_method = "dense"
            except ValueError:
                if sparse_h is None:
                    raise
                # degraded but usable sparse estimate (e.g. frames too
                # small for the dense patch grid): best-effort, as before
                # the gate existed
                logger.warning(
                    "dense fallback gated too; keeping the degraded sparse "
                    "homography (%d correspondences)", len(pts_r),
                )
                H = sparse_h
                self.last_method = "orb-degraded"
        self._cached_h = H
        self._degraded = False
        self._frames_since_retry = 0
        return H

    def _estimate_for_stitch(self, left: np.ndarray, right: np.ndarray):
        """Per-frame estimation policy for the dataset path: NEVER raises.

        The reference runs the stitcher inside the per-sample hot loop
        (reference dataset.py:1548-1604) and never throws mid-epoch —
        LoFTR always returns an estimate. Here an estimation failure falls
        back to the homography cached from earlier frames; with no history
        at all, to the neutral side-by-side placement (right frame pasted
        beside the left on the canvas). Either fallback marks the stitcher
        degraded so a full re-estimate is retried every RETRY_PERIOD
        frames (self-heal once the footage regains structure)."""
        try:
            return self.estimate(left, right)
        except ValueError as e:
            self._degraded = True
            self._frames_since_retry = 0
            if self._cached_h is not None:
                logger.warning(
                    "homography estimation failed (%s); reusing the cached "
                    "homography from an earlier frame", e,
                )
                self.last_method = "reuse-cached"
                return self._cached_h
            logger.warning(
                "homography estimation failed with no cached estimate "
                "(%s); degrading to side-by-side placement", e,
            )
            h = np.eye(3)
            h[0, 2] = float(left.shape[1])
            self._cached_h = h
            self.last_method = "side-by-side"
            return h

    def stitch_pair(
        self, left: np.ndarray, right: np.ndarray, reuse: bool = True
    ) -> np.ndarray:
        """Stitch one left/right pair onto a double-width canvas
        (reference image_stitcher.py:64-110). Never raises: estimation
        failures degrade per ``_estimate_for_stitch``."""
        import jax.numpy as jnp

        from routeformer_tpu.ops.image import remap

        h_px, w_px = left.shape[:2]
        if self._cached_h is None or not reuse:
            self._estimate_for_stitch(left, right)
        elif self._degraded:
            self._frames_since_retry += 1
            if self._frames_since_retry >= self.RETRY_PERIOD:
                self._estimate_for_stitch(left, right)
        H = self._cached_h

        canvas_w = 2 * w_px
        # Inverse-warp: for each canvas pixel, source coordinate in `right`.
        hinv = np.linalg.inv(H)
        ys, xs = np.mgrid[0:h_px, 0:canvas_w].astype(np.float64)
        ones = np.ones_like(xs)
        coords = np.stack([xs, ys, ones], axis=-1) @ hinv.T
        grid = coords[..., :2] / np.maximum(coords[..., 2:3], 1e-9)

        right_warped = np.asarray(
            remap(
                jnp.asarray(right[None], dtype=jnp.float32),
                jnp.asarray(grid, dtype=jnp.float32),
            )
        )[0]
        in_bounds = (
            (grid[..., 0] >= 0) & (grid[..., 0] < w_px)
            & (grid[..., 1] >= 0) & (grid[..., 1] < h_px)
        )[..., None]
        right_warped = right_warped * in_bounds

        canvas = np.zeros((h_px, canvas_w, left.shape[2]), dtype=np.float32)
        canvas[:, :w_px] = left
        left_mask = np.zeros((h_px, canvas_w, 1), dtype=np.float32)
        left_mask[:, :w_px] = 1.0
        overlap = left_mask * in_bounds
        canvas = np.where(
            overlap > 0,
            0.5 * canvas + 0.5 * right_warped,
            canvas + right_warped * (1 - left_mask),
        )
        return canvas

    def stitch_sequence(self, left_frames, right_frames) -> np.ndarray:
        """Stitch aligned sequences, estimating H once (reference
        dataset.py:1548-1604 usage)."""
        out = []
        for i, (lf, rf) in enumerate(zip(left_frames, right_frames)):
            out.append(self.stitch_pair(lf, rf, reuse=i > 0))
        return np.stack(out)
