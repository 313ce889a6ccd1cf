"""Gaze Gaussian-heatmap rasterization.

Device-side promotion of the reference's visualization-only heatmap
(``routeformer/visualize/gaze.py:6-38`` draws per-point Gaussians with cv2)
into an input-path op: rasterize a batch of gaze points into dense heatmaps
with one fused XLA expression (outer-product Gaussians accumulated over
points), suitable both for model inputs (driver-FoV attention priors) and
for visualization overlays.
"""

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("height", "width"))
def rasterize_gaze_heatmap(
    points: jnp.ndarray,
    height: int,
    width: int,
    sigma: float = 10.0,
    weights=None,
) -> jnp.ndarray:
    """Splat gaze points into Gaussian heatmaps.

    Parameters
    ----------
    points : (B, N, 2) pixel coordinates (x, y); NaN or out-of-range points
        contribute ~0 naturally through the Gaussian falloff.
    height, width : output raster size.
    sigma : Gaussian std in pixels.
    weights : optional (B, N) per-point weights (e.g. confidence).

    Returns
    -------
    (B, height, width) float32 heatmaps, max-normalized per batch item.
    """
    points = jnp.asarray(points, dtype=jnp.float32)
    xs = jnp.arange(width, dtype=jnp.float32)
    ys = jnp.arange(height, dtype=jnp.float32)

    # Separable Gaussians: exp over x and y distances, contracted over points
    # with one matmul — keeps the raster on the MXU for large N.
    dx = points[..., 0:1] - xs[None, None, :]  # (B, N, W)
    dy = points[..., 1:2] - ys[None, None, :]  # (B, N, H)
    gx = jnp.exp(-0.5 * (dx / sigma) ** 2)
    gy = jnp.exp(-0.5 * (dy / sigma) ** 2)
    if weights is not None:
        gy = gy * weights[..., None]
    heat = jnp.einsum("bnh,bnw->bhw", gy, gx)

    peak = heat.max(axis=(1, 2), keepdims=True)
    return heat / jnp.maximum(peak, 1e-12)


def overlay_heatmap_on_frame(
    frame: jnp.ndarray, heatmap: jnp.ndarray, alpha: float = 0.5
) -> jnp.ndarray:
    """Blend a heatmap onto a frame (reference visualize/gaze.py:6-38 role).

    frame: (H, W, 3) float in [0, 1]; heatmap: (H, W) in [0, 1].
    """
    # simple red-yellow colormap
    h = jnp.clip(heatmap, 0.0, 1.0)
    colored = jnp.stack([h, h * 0.6, jnp.zeros_like(h)], axis=-1)
    mask = (h > 1e-3)[..., None] * alpha
    return frame * (1 - mask) + colored * mask
