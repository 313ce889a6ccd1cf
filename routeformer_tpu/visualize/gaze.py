"""Gaze heatmap overlays.

Capability parity with reference ``routeformer/visualize/gaze.py:6-38``:
``overlay_heatmap_on_frame`` splats normalized gaze points into a Gaussian
heatmap and alpha-blends a colormapped version onto the frame (only where
the heatmap exceeds the 0.2 threshold, as in the reference).

The rasterization runs on the device op
(``routeformer_tpu.ops.heatmap.rasterize_gaze_heatmap``); the colormap is a
jet-like ramp computed in numpy (cv2-free).
"""

import numpy as np

from routeformer_tpu.ops.heatmap import rasterize_gaze_heatmap


def _jet(values: np.ndarray) -> np.ndarray:
    """Minimal jet colormap: values in [0,1] -> BGR uint8 (cv2 convention)."""
    v = np.clip(values, 0.0, 1.0)
    r = np.clip(1.5 - np.abs(4 * v - 3), 0, 1)
    g = np.clip(1.5 - np.abs(4 * v - 2), 0, 1)
    b = np.clip(1.5 - np.abs(4 * v - 1), 0, 1)
    return (np.stack([b, g, r], axis=-1) * 255).astype(np.uint8)


def overlay_heatmap_on_frame(frame: np.ndarray, gaze_points, sigma: float = 10.0):
    """Overlay a gaze heatmap on a frame (reference visualize/gaze.py:6-38).

    frame: (H, W, 3) BGR uint8. gaze_points: (N, 2) normalized (w, h) with
    (0, 0) the bottom-left corner, matching the reference convention.
    """
    frame = np.asarray(frame)
    h, w = frame.shape[:2]
    pts = np.asarray(gaze_points, dtype=np.float64).reshape(-1, 2)
    # normalized (x from left, y from bottom) -> pixel (x, y from top)
    px = pts[:, 0] * w
    py = (1.0 - pts[:, 1]) * h
    heat = np.asarray(
        rasterize_gaze_heatmap(
            np.stack([px, py], axis=-1)[None], height=h, width=w, sigma=sigma
        )
    )[0]

    colored = _jet(heat)
    overlaid = (frame.astype(np.float32) * 0.6 + colored.astype(np.float32) * 0.4)
    overlaid = overlaid.astype(np.uint8)
    mask = heat[..., None] > 0.2
    return np.where(mask, overlaid, frame)
