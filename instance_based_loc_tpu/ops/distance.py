"""Pairwise distance primitives.

All geometry kernels route their Gram matrices through these helpers: JAX
matmuls default to bf16-precision MXU passes, which is catastrophically wrong
for metric computations on world-frame coordinates. `Precision.HIGHEST` forces
the 3/6-pass f32 decomposition — still MXU, still fast for the 3-wide
contractions used here.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

HIGHEST = jax.lax.Precision.HIGHEST


def gram(a: jax.Array, b: jax.Array) -> jax.Array:
    """a @ b.T at full f32 precision. a: (N, D), b: (M, D) -> (N, M)."""
    return jax.lax.dot_general(
        a, b,
        dimension_numbers=(((1,), (1,)), ((), ())),
        precision=HIGHEST,
        preferred_element_type=jnp.float32,
    )


def matmul_hp(a: jax.Array, b: jax.Array) -> jax.Array:
    """a @ b at full f32 precision (use for any metric-bearing matmul,
    e.g. applying rotations to points)."""
    return jnp.matmul(a, b, precision=HIGHEST)


def pairwise_sq_dists(a: jax.Array, b: jax.Array) -> jax.Array:
    """Squared euclidean distances (N, M), clamped at 0."""
    sq_a = jnp.sum(a * a, axis=-1)
    sq_b = jnp.sum(b * b, axis=-1)
    d2 = sq_a[:, None] + sq_b[None, :] - 2.0 * gram(a, b)
    return jnp.maximum(d2, 0.0)


def masked_nearest(a: jax.Array, b: jax.Array, b_mask: jax.Array,
                   big: float = 1e30) -> tuple[jax.Array, jax.Array]:
    """For each row of a, the index and squared distance of the nearest valid
    row of b. Returns (idx (N,), sqdist (N,))."""
    d2 = pairwise_sq_dists(a, b)
    d2 = jnp.where(b_mask[None, :], d2, big)
    idx = jnp.argmin(d2, axis=1)
    return idx, jnp.take_along_axis(d2, idx[:, None], axis=1)[:, 0]
