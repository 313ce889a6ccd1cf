"""Time-series filters (JAX).

Capability parity with reference ``routeformer/utils/filter.py:5-52``
(``median_downsampler``), including torch's *lower-median* convention for
even-sized windows (``torch.median`` returns the smaller of the two middle
values, unlike ``numpy.median`` which averages).

TPU notes: the reference loops over output windows in Python; here the input
is reshaped to ``(batch, target, stride, channels)`` and reduced with one
sort — a single fused XLA op, vmappable and grad-safe.
"""

import jax.numpy as jnp


def median_downsampler(tensor: jnp.ndarray, target_length: int) -> jnp.ndarray:
    """Downsample along time by taking the (lower) median of each window.

    Parameters
    ----------
    tensor : jnp.ndarray
        Shape ``(batch, time_steps, channels)``.
    target_length : int
        Target number of time steps; must be < ``time_steps``.

    Returns
    -------
    jnp.ndarray
        Shape ``(batch, target_length, channels)``, same dtype.
    """
    batch, time_steps, channels = tensor.shape
    if target_length >= time_steps:
        raise ValueError("Target length must be less than the current time steps.")

    stride = time_steps // target_length
    # The reference takes windows [i*stride, i*stride + stride); trailing
    # samples beyond target_length * stride are dropped, same as here.
    windows = tensor[:, : target_length * stride, :].reshape(
        batch, target_length, stride, channels
    )
    # Lower median (torch semantics): element at index (n - 1) // 2 of the
    # sorted window.
    sorted_windows = jnp.sort(windows, axis=2)
    return sorted_windows[:, :, (stride - 1) // 2, :]
