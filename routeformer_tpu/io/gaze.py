"""Gaze fixation detection and camera models.

Capability parity with reference ``routeformer/io/gaze.py`` (a trimmed
pupil-labs vendoring): dispersion-based I-DT fixation detection with binary
search for the fixation end (``detect_fixations`` :74-176,
``vector_dispersion`` :48), and radial-distortion camera models
(``Radial_Dist_Camera`` :255, ``Dummy_Camera`` :377).

The camera math is implemented in numpy (Brown-Conrady radial-tangential
model with iterative inverse distortion) instead of cv2 calls — the same
model cv2.undistortPoints evaluates — so the device-side input pipeline can
reuse it; cv2 remains only a test oracle.
"""

import enum
from collections import deque
from typing import Dict, Sequence, Tuple

import numpy as np
from scipy.spatial.distance import pdist

from routeformer_tpu.utils.logging import get_logger

logger = get_logger("io.gaze")


class FixationDetectionMethod(enum.Enum):
    GAZE_2D = "2d gaze"
    GAZE_3D = "3d gaze"


def vector_dispersion(vectors: np.ndarray) -> float:
    """Angular dispersion: arccos(1 - max cosine distance)
    (reference gaze.py:48-51)."""
    distances = pdist(vectors, metric="cosine")
    return float(np.arccos(1.0 - distances.max()))


# --------------------------------------------------------------------------- #
# Camera models
# --------------------------------------------------------------------------- #


class CameraModel:
    """Pinhole camera with Brown-Conrady radial-tangential distortion."""

    cam_type = "radial"

    def __init__(self, name: str, resolution: Tuple[int, int], K, D):
        self.name = name
        self.resolution = tuple(resolution)
        self.K = np.asarray(K, dtype=np.float64).reshape(3, 3)
        self.D = np.asarray(D, dtype=np.float64).reshape(-1)

    def __repr__(self):
        return (
            f"<{type(self).__name__} {self.name} @ "
            f"{self.resolution[0]}x{self.resolution[1]}>"
        )

    @property
    def focal_length(self) -> float:
        return (self.K[0, 0] + self.K[1, 1]) / 2

    # -- distortion model -------------------------------------------------- #

    def _dist_coeffs(self, use_distortion: bool) -> np.ndarray:
        if not use_distortion:
            return np.zeros(5)
        d = np.zeros(max(5, self.D.size))
        d[: self.D.size] = self.D
        return d

    def distort_normalized(self, xy: np.ndarray, use_distortion=True) -> np.ndarray:
        """Forward distortion on normalized image coords (N, 2)."""
        k1, k2, p1, p2, k3 = self._dist_coeffs(use_distortion)[:5]
        x, y = xy[:, 0], xy[:, 1]
        r2 = x * x + y * y
        radial = 1 + k1 * r2 + k2 * r2**2 + k3 * r2**3
        xd = x * radial + 2 * p1 * x * y + p2 * (r2 + 2 * x * x)
        yd = y * radial + p1 * (r2 + 2 * y * y) + 2 * p2 * x * y
        return np.stack([xd, yd], axis=-1)

    def undistort_normalized(
        self, xy: np.ndarray, use_distortion=True, iterations: int = 40
    ) -> np.ndarray:
        """Inverse distortion by fixed-point iteration (cv2.undistortPoints
        model)."""
        k1, k2, p1, p2, k3 = self._dist_coeffs(use_distortion)[:5]
        x0, y0 = xy[:, 0], xy[:, 1]
        x, y = x0.copy(), y0.copy()
        for _ in range(iterations):
            r2 = x * x + y * y
            radial = 1 + k1 * r2 + k2 * r2**2 + k3 * r2**3
            dx = 2 * p1 * x * y + p2 * (r2 + 2 * x * x)
            dy = p1 * (r2 + 2 * y * y) + 2 * p2 * x * y
            x = (x0 - dx) / radial
            y = (y0 - dy) / radial
        return np.stack([x, y], axis=-1)

    # -- public api (reference Radial_Dist_Camera) ------------------------- #

    def unprojectPoints(self, pts_2d, use_distortion=True, normalize=False):
        """Pixel points (N, 2) -> 3-D rays (N, 3) (reference gaze.py:275-306)."""
        pts = np.asarray(pts_2d, dtype=np.float64).reshape(-1, 2)
        fx, fy = self.K[0, 0], self.K[1, 1]
        cx, cy = self.K[0, 2], self.K[1, 2]
        norm = np.stack([(pts[:, 0] - cx) / fx, (pts[:, 1] - cy) / fy], axis=-1)
        und = self.undistort_normalized(norm, use_distortion)
        pts_3d = np.concatenate([und, np.ones((und.shape[0], 1))], axis=-1)
        if normalize:
            pts_3d /= np.linalg.norm(pts_3d, axis=1, keepdims=True)
        return pts_3d

    def projectPoints(self, object_points, rvec=None, tvec=None, use_distortion=True):
        """3-D points -> pixels (reference gaze.py:308-343)."""
        pts = np.asarray(object_points, dtype=np.float64).reshape(-1, 3)
        if rvec is not None:
            pts = pts @ _rodrigues(np.asarray(rvec).reshape(3)).T
        if tvec is not None:
            pts = pts + np.asarray(tvec).reshape(1, 3)
        xy = pts[:, :2] / pts[:, 2:3]
        xyd = self.distort_normalized(xy, use_distortion)
        fx, fy = self.K[0, 0], self.K[1, 1]
        cx, cy = self.K[0, 2], self.K[1, 2]
        return np.stack([xyd[:, 0] * fx + cx, xyd[:, 1] * fy + cy], axis=-1)

    def undistort_points_to_ideal_point_coordinates(self, points):
        pts = np.asarray(points, dtype=np.float64).reshape(-1, 2)
        fx, fy = self.K[0, 0], self.K[1, 1]
        cx, cy = self.K[0, 2], self.K[1, 2]
        norm = np.stack([(pts[:, 0] - cx) / fx, (pts[:, 1] - cy) / fy], axis=-1)
        return self.undistort_normalized(norm)

    def undistort(self, img: np.ndarray) -> np.ndarray:
        """Undistort an image (gather-based remap; the on-device fast path is
        ``routeformer_tpu.ops.image.undistort_image``)."""
        from routeformer_tpu.ops.image import undistort_image_numpy

        return undistort_image_numpy(img, self.K, self.D)


def _rodrigues(rvec: np.ndarray) -> np.ndarray:
    theta = np.linalg.norm(rvec)
    if theta < 1e-12:
        return np.eye(3)
    k = rvec / theta
    kx = np.array(
        [[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]]
    )
    return np.eye(3) + np.sin(theta) * kx + (1 - np.cos(theta)) * (kx @ kx)


class Radial_Dist_Camera(CameraModel):
    """Name-compatible alias (reference gaze.py:255)."""

    @staticmethod
    def _from_raw_intrinsics(cam_name, resolution, intrinsics: Dict):
        cam_type = intrinsics.get("cam_type", "dummy")
        if cam_type == "radial":
            return Radial_Dist_Camera(
                cam_name, resolution,
                intrinsics["camera_matrix"], intrinsics["dist_coefs"],
            )
        logger.warning("Unknown camera type %r; using dummy intrinsics", cam_type)
        return Dummy_Camera(cam_name, resolution)


class Dummy_Camera(Radial_Dist_Camera):
    """Idealized pinhole, no distortion (reference gaze.py:377-391)."""

    cam_type = "dummy"

    def __init__(self, name, resolution, K=None, D=None):
        camera_matrix = K or [
            [1000.0, 0.0, resolution[0] / 2.0],
            [0.0, 1000.0, resolution[1] / 2.0],
            [0.0, 0.0, 1.0],
        ]
        dist_coefs = D or [0.0, 0.0, 0.0, 0.0, 0.0]
        super().__init__(name, resolution, camera_matrix, dist_coefs)


# --------------------------------------------------------------------------- #
# Fixation detection (I-DT with binary search)
# --------------------------------------------------------------------------- #


def _resolve_intrinsics(capture: Dict) -> CameraModel:
    intr = capture["intrinsics"]
    if isinstance(intr, CameraModel):
        return intr
    # The reference hardcodes the "(1088, 1080)" resolution key
    # (gaze.py:95-97).
    for key in ("(1088, 1080)",):
        if isinstance(intr, dict) and key in intr:
            return Radial_Dist_Camera._from_raw_intrinsics(
                "dummy", capture["frame_size"], intr[key]
            )
    if isinstance(intr, dict) and "cam_type" in intr:
        return Radial_Dist_Camera._from_raw_intrinsics(
            "dummy", capture["frame_size"], intr
        )
    return Dummy_Camera("dummy", capture["frame_size"])


def gaze_dispersion(
    capture: Dict, gaze_subset: Sequence, method=FixationDetectionMethod.GAZE_2D
) -> float:
    """Angular dispersion of a gaze subset (reference gaze.py:54-71)."""
    if method is FixationDetectionMethod.GAZE_3D:
        vectors = np.array([gp["gaze_point_3d"] for _, gp in gaze_subset])
    elif method is FixationDetectionMethod.GAZE_2D:
        precomputed = capture.get("_unprojected")
        if precomputed is not None:
            # detect_fixations unprojects every point ONCE up front;
            # re-unprojecting each sliding-window slice (the reference's
            # structure) costs 40 fixed-point iterations per call and
            # dominated dataset init. Identical math: unprojection is
            # per-point.
            vectors = np.array(
                [precomputed[idx] for idx, _ in gaze_subset]
            )
        else:
            locations = np.array(
                [gp["norm_pos"] for _, gp in gaze_subset], dtype=np.float64
            )
            width, height = capture["frame_size"]
            locations[:, 0] *= width
            locations[:, 1] = (1.0 - locations[:, 1]) * height
            vectors = capture["_camera"].unprojectPoints(locations)
    else:
        raise ValueError(f"Unknown method '{method}'")
    return vector_dispersion(vectors)


def detect_fixations(
    capture: Dict,
    gaze_data: Sequence,
    max_dispersion: float = np.deg2rad(1.50),
    min_duration: float = 80 / 1000,
    max_duration: float = 1000 / 1000,
    min_data_confidence: float = 0.6,
):
    """Dispersion-based fixation detection (reference gaze.py:74-176).

    Sliding window grows until ``min_duration``; if its angular dispersion
    stays below ``max_dispersion`` the window is extended up to
    ``max_duration`` and the exact fixation end is found by binary search.
    Returns a boolean array marking fixation samples (or the reference's
    failure tuple when no confident data exists).
    """
    capture = dict(capture)
    capture["_camera"] = _resolve_intrinsics(capture)

    indexed = [(idx, datum) for idx, datum in enumerate(gaze_data)]
    is_fixation = np.zeros(len(indexed), dtype=bool)
    filtered = [
        (idx, d) for idx, d in indexed if d["confidence"] > min_data_confidence
    ]
    if not filtered:
        logger.warning("No data available to find fixations")
        return "Fixation detection failed", ()

    # Unproject all confident points in one batched call (see
    # gaze_dispersion: per-window re-unprojection dominated dataset init).
    locations = np.array(
        [d["norm_pos"] for _, d in filtered], dtype=np.float64
    )
    width, height = capture["frame_size"]
    locations[:, 0] *= width
    locations[:, 1] = (1.0 - locations[:, 1]) * height
    all_vectors = capture["_camera"].unprojectPoints(locations)
    capture["_unprojected"] = {
        idx: all_vectors[i] for i, (idx, _) in enumerate(filtered)
    }

    working: deque = deque()
    remaining: deque = deque(filtered)

    while remaining:
        if (
            len(working) < 2
            or (working[-1][1]["timestamp"] - working[0][1]["timestamp"])
            < min_duration
        ):
            working.append(remaining.popleft())
            continue

        if gaze_dispersion(capture, working) > max_dispersion:
            working.popleft()
            continue

        left_idx = len(working)
        # extend to the maximum duration
        while remaining:
            if (
                remaining[0][1]["timestamp"]
                > working[0][1]["timestamp"] + max_duration
            ):
                break
            working.append(remaining.popleft())

        if gaze_dispersion(capture, working) <= max_dispersion:
            for idx, _ in working:
                is_fixation[idx] = True
            working.clear()
            continue

        slicable = list(working)
        right_idx = len(working)
        while left_idx < right_idx - 1:
            middle_idx = (left_idx + right_idx) // 2
            if gaze_dispersion(capture, slicable[: middle_idx + 1]) <= max_dispersion:
                left_idx = middle_idx
            else:
                right_idx = middle_idx

        final_base = slicable[:left_idx]
        put_back = slicable[left_idx:]
        for idx, _ in final_base:
            is_fixation[idx] = True
        working.clear()
        remaining.extendleft(reversed(put_back))

    logger.info(
        "Found %d fixations out of %d samples", int(is_fixation.sum()), len(is_fixation)
    )
    return is_fixation
