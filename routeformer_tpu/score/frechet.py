"""Discrete Fréchet distance as a jit-able dynamic program (JAX).

The reference computes PCI with ``frechetdist.frdist`` — an O(P*Q) pure-Python
recursion evaluated once per candidate window at dataset-index-build time
(reference ``routeformer/score/pci.py:118``, called from
``routeformer/io/dataset.py:991-1031`` for *every* slidable window). Here the
same dynamic program

    ca[i, j] = max(d(p_i, q_j), min(ca[i-1, j], ca[i-1, j-1], ca[i, j-1]))

is expressed as a ``lax.scan`` over rows with an inner scan along the row, so
it jit-compiles once and ``vmap``s over thousands of windows — the index build
becomes one batched XLA call instead of hours of Python.
"""

import jax
import jax.numpy as jnp
from functools import partial


@partial(jax.jit, static_argnames=())
def frechet_distance(p: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """Discrete Fréchet distance between polylines ``p`` (P, D) and ``q`` (Q, D).

    Matches ``frechetdist.frdist`` semantics (Euclidean ground metric).
    """
    p = p.astype(jnp.float32)
    q = q.astype(jnp.float32)
    # Pairwise distances d[i, j] = ||p_i - q_j||.
    d = jnp.linalg.norm(p[:, None, :] - q[None, :, :], axis=-1)  # (P, Q)

    inf = jnp.float32(jnp.inf)

    def row_step(prev_row, d_row):
        # prev_row: ca[i-1, :] (Q,); d_row: d[i, :] (Q,)
        # Within the row: ca[i, j] = max(d[i, j], min(prev_row[j],
        #                                prev_row[j-1], ca[i, j-1]))
        # The prev_row[j-1] term is a static shift; the ca[i, j-1] term is the
        # sequential carry of the inner scan.
        shifted_prev = jnp.concatenate([jnp.array([inf]), prev_row[:-1]])
        m = jnp.minimum(prev_row, shifted_prev)  # min over the two "up" terms

        def cell(carry, inputs):
            m_j, d_j = inputs
            val = jnp.maximum(d_j, jnp.minimum(m_j, carry))
            return val, val

        _, row = jax.lax.scan(cell, inf, (m, d_row))
        return row, None

    # First row: ca[0, j] = max(d[0, j], ca[0, j-1]) == running max.
    first_row = jax.lax.associative_scan(jnp.maximum, d[0])
    last_row, _ = jax.lax.scan(row_step, first_row, d[1:])
    return last_row[-1]


@partial(jax.jit, static_argnames=())
def frechet_distance_batch(p: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """Batched Fréchet distance: ``(B, P, D) x (B, Q, D) -> (B,)``."""
    return jax.vmap(frechet_distance)(p, q)
