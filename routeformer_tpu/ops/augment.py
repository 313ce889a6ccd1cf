"""Photometric train-time augmentations (jittable, per-frame randomness).

Plays the role of the reference's torchvision pipeline applied when the
video backbone is being trained (reference
``routeformer/models/video_backbone/TimmBackbone.py:58-67``):
RandomAdjustSharpness(2, p=0.5) -> RandomAutocontrast(p=0.5) ->
ColorJitter(brightness=0.2, contrast=0.2, saturation=0.2, hue=0.1) ->
RandomErasing(p=1.0, scale=(0.02, 0.2), ratio=(0.3, 3.3), value=0).

Each op matches the torchvision float-image formula (blend/clamp semantics,
ITU-R 601 grayscale, log-uniform erase aspect). Two deliberate differences,
both TPU-first:

- randomness is per-frame (vmapped, one fold of the key per image) instead
  of torchvision's per-minibatch shared draw — strictly more augmentation
  diversity and no host loop;
- RandomErasing clamps the sampled rectangle to the frame instead of
  torchvision's sample-retry loop (data-dependent control flow does not
  trace); the erased box keeps the sampled area/aspect whenever it fits.

Everything is ``jnp.where``-gated so one compiled program covers all random
decisions.
"""

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

# ---------------------------------------------------------------------- #
# color-space helpers
# ---------------------------------------------------------------------- #


def rgb_to_grayscale(img: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) -> (..., 1), ITU-R 601 weights (torchvision's choice)."""
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    return (0.2989 * r + 0.587 * g + 0.114 * b)[..., None]


def rgb_to_hsv(img: jnp.ndarray) -> jnp.ndarray:
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    maxc = jnp.maximum(jnp.maximum(r, g), b)
    minc = jnp.minimum(jnp.minimum(r, g), b)
    v = maxc
    delta = maxc - minc
    safe_delta = jnp.where(delta == 0, 1.0, delta)
    s = jnp.where(maxc == 0, 0.0, delta / jnp.where(maxc == 0, 1.0, maxc))
    rc = (maxc - r) / safe_delta
    gc = (maxc - g) / safe_delta
    bc = (maxc - b) / safe_delta
    h = jnp.where(
        maxc == r, bc - gc, jnp.where(maxc == g, 2.0 + rc - bc, 4.0 + gc - rc)
    )
    h = jnp.where(delta == 0, 0.0, h)
    h = (h / 6.0) % 1.0
    return jnp.stack([h, s, v], axis=-1)


def hsv_to_rgb(img: jnp.ndarray) -> jnp.ndarray:
    h, s, v = img[..., 0], img[..., 1], img[..., 2]
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [t, v, v, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


# ---------------------------------------------------------------------- #
# single-image ops (H, W, 3) float in [0, 1]
# ---------------------------------------------------------------------- #


def _blend(img1: jnp.ndarray, img2: jnp.ndarray, ratio) -> jnp.ndarray:
    return jnp.clip(ratio * img1 + (1.0 - ratio) * img2, 0.0, 1.0)


def adjust_brightness(img: jnp.ndarray, factor) -> jnp.ndarray:
    return _blend(img, jnp.zeros_like(img), factor)


def adjust_contrast(img: jnp.ndarray, factor) -> jnp.ndarray:
    mean = rgb_to_grayscale(img).mean()
    return _blend(img, jnp.full_like(img, mean), factor)


def adjust_saturation(img: jnp.ndarray, factor) -> jnp.ndarray:
    return _blend(img, jnp.broadcast_to(rgb_to_grayscale(img), img.shape), factor)


def adjust_hue(img: jnp.ndarray, shift) -> jnp.ndarray:
    hsv = rgb_to_hsv(img)
    hsv = hsv.at[..., 0].set((hsv[..., 0] + shift) % 1.0)
    return hsv_to_rgb(hsv)


def adjust_sharpness(img: jnp.ndarray, factor) -> jnp.ndarray:
    """torchvision kernel [[1,1,1],[1,5,1],[1,1,1]]/13; border rows/cols
    keep the original pixels."""
    kernel = jnp.array([[1.0, 1.0, 1.0], [1.0, 5.0, 1.0], [1.0, 1.0, 1.0]]) / 13.0
    x = jnp.pad(img, ((1, 1), (1, 1), (0, 0)), mode="edge")
    blurred = jax.lax.conv_general_dilated(
        x[None].transpose(0, 3, 1, 2),
        jnp.broadcast_to(kernel, (img.shape[-1], 1, 3, 3)),
        window_strides=(1, 1),
        padding="VALID",
        feature_group_count=img.shape[-1],
    )[0].transpose(1, 2, 0)
    h, w = img.shape[:2]
    interior = (
        (jnp.arange(h)[:, None, None] > 0) & (jnp.arange(h)[:, None, None] < h - 1)
        & (jnp.arange(w)[None, :, None] > 0) & (jnp.arange(w)[None, :, None] < w - 1)
    )
    degenerate = jnp.where(interior, jnp.clip(blurred, 0.0, 1.0), img)
    return _blend(img, degenerate, factor)


def autocontrast(img: jnp.ndarray) -> jnp.ndarray:
    minimum = img.min(axis=(0, 1), keepdims=True)
    maximum = img.max(axis=(0, 1), keepdims=True)
    scale = jnp.where(maximum == minimum, 1.0, 1.0 / (maximum - minimum))
    offset = jnp.where(maximum == minimum, 0.0, minimum)
    return jnp.clip((img - offset) * scale, 0.0, 1.0)


def random_erase(img: jnp.ndarray, key, scale=(0.02, 0.2), ratio=(0.3, 3.3),
                 value: float = 0.0) -> jnp.ndarray:
    """Zero a random rectangle (torchvision sampling, clamped not retried)."""
    h, w = img.shape[:2]
    k_area, k_aspect, k_i, k_j = jax.random.split(key, 4)
    area = h * w * jax.random.uniform(k_area, minval=scale[0], maxval=scale[1])
    log_ratio = jax.random.uniform(
        k_aspect, minval=jnp.log(ratio[0]), maxval=jnp.log(ratio[1])
    )
    aspect = jnp.exp(log_ratio)
    eh = jnp.clip(jnp.round(jnp.sqrt(area * aspect)), 1, h).astype(jnp.int32)
    ew = jnp.clip(jnp.round(jnp.sqrt(area / aspect)), 1, w).astype(jnp.int32)
    i = jax.random.randint(k_i, (), 0, h)  # top-left row
    i = jnp.minimum(i, h - eh)
    j = jax.random.randint(k_j, (), 0, w)
    j = jnp.minimum(j, w - ew)
    rows = jnp.arange(h)[:, None, None]
    cols = jnp.arange(w)[None, :, None]
    inside = (rows >= i) & (rows < i + eh) & (cols >= j) & (cols < j + ew)
    return jnp.where(inside, value, img)


# ---------------------------------------------------------------------- #
# the pipeline
# ---------------------------------------------------------------------- #


def _color_jitter(img, key, brightness, contrast, saturation, hue):
    """torchvision ColorJitter: random factors, random op order."""
    k_perm, k_b, k_c, k_s, k_h = jax.random.split(key, 5)
    fb = jax.random.uniform(
        k_b, minval=max(0.0, 1.0 - brightness), maxval=1.0 + brightness
    )
    fc = jax.random.uniform(
        k_c, minval=max(0.0, 1.0 - contrast), maxval=1.0 + contrast
    )
    fs = jax.random.uniform(
        k_s, minval=max(0.0, 1.0 - saturation), maxval=1.0 + saturation
    )
    fh = jax.random.uniform(k_h, minval=-hue, maxval=hue)

    branches = (
        lambda x: adjust_brightness(x, fb),
        lambda x: adjust_contrast(x, fc),
        lambda x: adjust_saturation(x, fs),
        lambda x: adjust_hue(x, fh),
    )
    order = jax.random.permutation(k_perm, 4)

    def body(x, op_index):
        return jax.lax.switch(op_index, branches, x), None

    out, _ = jax.lax.scan(body, img, order)
    return out


def _augment_one(img, key, *, sharpness_p, autocontrast_p, brightness,
                 contrast, saturation, hue, erase_scale, erase_ratio):
    k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)
    do_sharp = jax.random.bernoulli(k1, sharpness_p)
    img = jnp.where(do_sharp, adjust_sharpness(img, 2.0), img)
    do_auto = jax.random.bernoulli(k2, autocontrast_p)
    img = jnp.where(do_auto, autocontrast(img), img)
    img = _color_jitter(img, k3, brightness, contrast, saturation, hue)
    img = random_erase(img, k4, scale=erase_scale, ratio=erase_ratio)
    del k5, k6
    return img


@partial(
    jax.jit,
    static_argnames=(
        "sharpness_p", "autocontrast_p", "brightness", "contrast",
        "saturation", "hue", "erase_scale", "erase_ratio",
    ),
)
def photometric_augment(
    images: jnp.ndarray,
    key,
    sharpness_p: float = 0.5,
    autocontrast_p: float = 0.5,
    brightness: float = 0.2,
    contrast: float = 0.2,
    saturation: float = 0.2,
    hue: float = 0.1,
    erase_scale: Tuple[float, float] = (0.02, 0.2),
    erase_ratio: Tuple[float, float] = (0.3, 3.3),
) -> jnp.ndarray:
    """Apply the reference's train-time pipeline to (N, H, W, 3) in [0, 1]."""
    keys = jax.random.split(key, images.shape[0])
    fn = partial(
        _augment_one,
        sharpness_p=sharpness_p, autocontrast_p=autocontrast_p,
        brightness=brightness, contrast=contrast, saturation=saturation,
        hue=hue, erase_scale=erase_scale, erase_ratio=erase_ratio,
    )
    return jax.vmap(fn)(images, keys)
