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


import os

# Column-chunked nearest-neighbor: 0 = one (N, M) distance matrix (XLA
# materializes it in HBM — 33 MB at the registration shapes); >0 = unrolled
# column tiles of this width with a running (min, argmin), so each tile's
# build+reduce can fuse without materializing the full matrix. Opt-in via
# env pending a trace-exact win (PERF.md).
NN_CHUNK = int(os.environ.get("IBL_NN_CHUNK", "0"))


def masked_nearest(a: jax.Array, b: jax.Array, b_mask: jax.Array,
                   big: float = 1e30) -> tuple[jax.Array, jax.Array]:
    """For each row of a, the index and squared distance of the nearest valid
    row of b. Returns (idx (N,), sqdist (N,))."""
    m = b.shape[0]
    chunk = NN_CHUNK
    if chunk <= 0 or chunk >= m or m % chunk != 0:
        d2 = pairwise_sq_dists(a, b)
        d2 = jnp.where(b_mask[None, :], d2, big)
        # min + argmin fuse into one reduction pass over the (N, M) matrix;
        # a take_along_axis gather here would re-read all 33 MB of it
        return jnp.argmin(d2, axis=1), jnp.min(d2, axis=1)

    n = a.shape[0]
    sq_a = jnp.sum(a * a, axis=-1)
    best_v = jnp.full((n,), big, jnp.float32)
    best_i = jnp.zeros((n,), jnp.int32)
    for c in range(m // chunk):
        b_c = jax.lax.dynamic_slice_in_dim(b, c * chunk, chunk, 0)
        m_c = jax.lax.dynamic_slice_in_dim(b_mask, c * chunk, chunk, 0)
        d2 = sq_a[:, None] + jnp.sum(b_c * b_c, -1)[None, :] - 2.0 * gram(a, b_c)
        d2 = jnp.where(m_c[None, :], jnp.maximum(d2, 0.0), big)
        i = jnp.argmin(d2, axis=1)
        v = jnp.min(d2, axis=1)
        upd = v < best_v
        best_v = jnp.where(upd, v, best_v)
        best_i = jnp.where(upd, i.astype(jnp.int32) + c * chunk, best_i)
    return best_i, best_v
