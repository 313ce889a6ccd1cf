"""Image/video preprocessing ops: resize, undistort-remap, crop, dtype.

Plays the role of the reference's OpenCV input-path kernels
(``routeformer/io/dataset.py``): per-frame undistortion via
``cv2.undistort`` fanned out over a multiprocessing pool (:1976-2027),
``cv2.resize`` scaling (:1439-1504), the 30%-70% horizontal crop
(:1324-1338) and the uint8 -> float16/255 conversion (:1506-1523).

TPU-first design: undistortion and resize are pure gather+interpolation
kernels; here they run as vectorized XLA ops over whole frame batches on
device (the remap grid is precomputed once per camera), replacing the
reference's per-frame CPU pool. Numpy twins are provided for host-side
callers (e.g. the camera model's image undistort).
"""

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


# --------------------------------------------------------------------------- #
# Remap grids
# --------------------------------------------------------------------------- #


def undistort_grid(K, D, h: int, w: int) -> np.ndarray:
    """Source-pixel sampling grid for undistortion, shape (h, w, 2) [x, y].

    For each undistorted output pixel, the distorted source location —
    the same mapping cv2.undistort's internal initUndistortRectifyMap
    builds (forward distortion of the ideal grid).
    """
    K = np.asarray(K, dtype=np.float64).reshape(3, 3)
    D = np.asarray(D, dtype=np.float64).reshape(-1)
    d = np.zeros(5)
    d[: D.size] = D
    k1, k2, p1, p2, k3 = d[:5]

    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]

    xs = (np.arange(w) - cx) / fx
    ys = (np.arange(h) - cy) / fy
    x, y = np.meshgrid(xs, ys)
    r2 = x * x + y * y
    radial = 1 + k1 * r2 + k2 * r2**2 + k3 * r2**3
    xd = x * radial + 2 * p1 * x * y + p2 * (r2 + 2 * x * x)
    yd = y * radial + p1 * (r2 + 2 * y * y) + 2 * p2 * x * y
    return np.stack([xd * fx + cx, yd * fy + cy], axis=-1)


# --------------------------------------------------------------------------- #
# Bilinear gather (remap)
# --------------------------------------------------------------------------- #


def _bilinear_gather(img: jnp.ndarray, grid_x: jnp.ndarray, grid_y: jnp.ndarray):
    """Sample img (H, W, C) at float coords; out-of-range clamps to border."""
    h, w = img.shape[:2]
    x0 = jnp.floor(grid_x).astype(jnp.int32)
    y0 = jnp.floor(grid_y).astype(jnp.int32)
    x1, y1 = x0 + 1, y0 + 1
    wx = (grid_x - x0)[..., None]
    wy = (grid_y - y0)[..., None]

    x0c = jnp.clip(x0, 0, w - 1)
    x1c = jnp.clip(x1, 0, w - 1)
    y0c = jnp.clip(y0, 0, h - 1)
    y1c = jnp.clip(y1, 0, h - 1)

    tl = img[y0c, x0c]
    tr = img[y0c, x1c]
    bl = img[y1c, x0c]
    br = img[y1c, x1c]
    top = tl * (1 - wx) + tr * wx
    bot = bl * (1 - wx) + br * wx
    return top * (1 - wy) + bot * wy


@functools.partial(jax.jit, static_argnames=())
def remap(frames: jnp.ndarray, grid: jnp.ndarray) -> jnp.ndarray:
    """Batched remap: frames (N, H, W, C) sampled at grid (H, W, 2)."""
    gx = grid[..., 0]
    gy = grid[..., 1]
    return jax.vmap(lambda f: _bilinear_gather(f, gx, gy))(frames)


def undistort_video(frames: jnp.ndarray, K, D) -> jnp.ndarray:
    """Undistort a frame batch (N, H, W, C) on device (reference :1976-2027)."""
    h, w = int(frames.shape[1]), int(frames.shape[2])
    grid = jnp.asarray(undistort_grid(K, D, h, w), dtype=jnp.float32)
    return remap(frames, grid)


def undistort_image_numpy(img: np.ndarray, K, D) -> np.ndarray:
    """Host-side single-image undistort (camera-model convenience)."""
    out = np.asarray(
        remap(jnp.asarray(img[None], dtype=jnp.float32),
              jnp.asarray(undistort_grid(K, D, img.shape[0], img.shape[1]),
                          dtype=jnp.float32))
    )[0]
    return out.astype(img.dtype)


# --------------------------------------------------------------------------- #
# Resize / crop / dtype
# --------------------------------------------------------------------------- #


def resize_video(frames: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """Bilinear resize of a frame batch (N, H, W, C) (reference :1439-1504)."""
    n, _, _, c = frames.shape
    return jax.image.resize(
        frames, (n, out_hw[0], out_hw[1], c), method="bilinear"
    )


def crop_horizontal(
    frames: jnp.ndarray, start: float = 0.3, end: float = 0.7
) -> jnp.ndarray:
    """The reference's 30%-70% width crop (dataset.py:1324-1338).

    frames: (..., H, W, C).
    """
    w = frames.shape[-2]
    return frames[..., int(start * w) : int(end * w), :]


def to_float16(frames) -> jnp.ndarray:
    """uint8 [0,255] -> float16 [0,1] (reference :1506-1523)."""
    return (jnp.asarray(frames).astype(jnp.float32) / 255.0).astype(jnp.float16)


def dequantize_videos(batch: dict) -> dict:
    """uint8 wire-format videos -> float16 [0,1], on device, inside jit.

    With ``video_dtype="uint8"`` the datasets keep frames uint8 through the
    sample cache and the host->device transfer (half the bytes of the
    reference's host-side f16 conversion, dataset.py:1506-1523) and the
    conversion happens here, at the top of the jitted step. Dispatch is on
    the traced dtype, so f16 batches pass through untouched and the two
    wire formats compile to distinct programs. ``to_float16`` divides in
    f32 and rounds once, which reproduces the host conversion bit-exactly
    for all 256 values on every backend (tests/test_gaze_and_image.py).
    """
    return {
        k: (
            dequantize_videos(v)
            if isinstance(v, dict)
            else to_float16(v)
            if "video" in k and getattr(v, "dtype", None) == jnp.uint8
            else v
        )
        for k, v in batch.items()
    }


# --------------------------------------------------------------------------- #
# Host-side (cv2) twins for the dataset's threaded input path.
#
# The device kernels above serve on-device pipelines and are cv2-parity
# tested; the dataset itself runs in DataLoader threads on the HOST, where a
# per-sample jnp round-trip would ship every frame batch through the (tunnel)
# device transfer path and serialize against the train step. cv2 releases
# the GIL, matching the reference's mp.Pool cv2 fan-out
# (reference dataset.py:1487,2011).
# --------------------------------------------------------------------------- #

_undistort_map_cache: dict = {}


def resize_video_numpy(video: np.ndarray, out_hw: Tuple[int, int]) -> np.ndarray:
    """cv2 bilinear resize of a frame batch (N, H, W, C), host-side."""
    import cv2

    out = np.empty(
        (video.shape[0], out_hw[0], out_hw[1], video.shape[3]),
        dtype=np.float32,
    )
    for i in range(video.shape[0]):
        cv2.resize(
            video[i].astype(np.float32),
            (out_hw[1], out_hw[0]),
            dst=out[i],
            interpolation=cv2.INTER_LINEAR,
        )
    return out.astype(video.dtype)


def undistort_video_numpy(video: np.ndarray, K, D) -> np.ndarray:
    """cv2 undistort of a frame batch (N, H, W, C), host-side.

    Uses the same sampling grid as the device kernel (parity-tested);
    per-size maps are cached across samples.
    """
    import cv2

    h, w = video.shape[1:3]
    # Key on the calibration *bytes*: two distinct (K, D) pairs whose sums
    # collide must not share remap grids (silent frame corruption).
    key = (
        np.asarray(K, np.float64).tobytes(),
        np.asarray(D, np.float64).tobytes(),
        h,
        w,
    )
    maps = _undistort_map_cache.get(key)
    if maps is None:
        grid = np.asarray(undistort_grid(K, D, h, w), dtype=np.float32)
        maps = (
            np.ascontiguousarray(grid[..., 0]),
            np.ascontiguousarray(grid[..., 1]),
        )
        _undistort_map_cache[key] = maps
    out = np.empty_like(video, dtype=np.float32)
    for i in range(video.shape[0]):
        cv2.remap(
            video[i].astype(np.float32), maps[0], maps[1],
            interpolation=cv2.INTER_LINEAR, dst=out[i],
        )
    return out.astype(video.dtype)
