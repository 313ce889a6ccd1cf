"""Vector utilities for 2-D trajectories (JAX).

Capability parity with reference ``routeformer/utils/vector.py`` (rotate:
lines 6-54, estimate_angle: 57-83, estimate_angle_and_norm: 86-110), with the
same float32-compute / original-dtype-return contract the reference enforces
via ``autocast(enabled=False)``.

TPU notes: ``rotate`` is expressed as a single batched 2x2 einsum so XLA maps
it onto one fused VPU/MXU op; no per-batch Python loops.
"""

import jax.numpy as jnp


def rotate(tensor: jnp.ndarray, angle: jnp.ndarray) -> jnp.ndarray:
    """Rotate 2-D vectors by per-batch angles.

    Parameters
    ----------
    tensor : jnp.ndarray
        Shape ``(batch, length, 2)``.
    angle : jnp.ndarray
        Angles in radians, shape ``(batch, 1)`` (or ``(batch,)``).

    Returns
    -------
    jnp.ndarray
        Rotated tensor, same shape and dtype as the input.
    """
    original_dtype = tensor.dtype
    t = tensor.astype(jnp.float32)
    a = jnp.reshape(angle.astype(jnp.float32), (t.shape[0],))

    cos = jnp.cos(a)
    sin = jnp.sin(a)
    # Rotation matrix [[cos, -sin], [sin, cos]] applied to row vectors (x, y):
    # out = R @ v for column vectors, matching the reference's matmul layout.
    rot = jnp.stack(
        [jnp.stack([cos, -sin], axis=-1), jnp.stack([sin, cos], axis=-1)],
        axis=-2,
    )  # (batch, 2, 2)
    out = jnp.einsum("bij,blj->bli", rot, t)
    return out.astype(original_dtype)


def estimate_angle(tensor: jnp.ndarray) -> jnp.ndarray:
    """Angle (radians) of 2-D vectors.

    Parameters
    ----------
    tensor : jnp.ndarray
        Shape ``(*, 2)``.

    Returns
    -------
    jnp.ndarray
        Angle in radians, shape ``(*, 1)``, float32.
    """
    t = tensor.astype(jnp.float32)
    angle = jnp.arctan2(t[..., 1], t[..., 0])
    return angle[..., None]


def estimate_angle_and_norm(tensor: jnp.ndarray):
    """Angle (radians) and L2 norm of 2-D vectors.

    Parameters
    ----------
    tensor : jnp.ndarray
        Shape ``(*, 2)``.

    Returns
    -------
    (jnp.ndarray, jnp.ndarray)
        Angle and norm, each shape ``(*, 1)``, float32.
    """
    t = tensor.astype(jnp.float32)
    angle = jnp.arctan2(t[..., 1], t[..., 0])
    norm = jnp.linalg.norm(t, axis=-1)
    return angle[..., None], norm[..., None]
