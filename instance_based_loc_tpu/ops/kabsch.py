"""Closed-form rigid alignment (Kabsch / Umeyama via SVD).

Replaces reference `utils/fpfh_register.py:24-82` (`get_transformation`,
`get_SVD_transform`) and serves as the inner solver for RANSAC hypotheses and
ICP updates. Fully vmappable: the (3,3) SVD is tiny, so thousands of RANSAC
hypotheses solve in one batched call.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .pointcloud import masked_mean


def kabsch_transform(p: jax.Array, q: jax.Array,
                     weights: jax.Array | None = None) -> jax.Array:
    """Best-fit rigid transform T (4x4) with T @ [p;1] ~= q for row-wise
    corresponding points p, q of shape (N, 3).

    Matches reference `get_SVD_transform` (fpfh_register.py:67-82):
    W = sum q'_i p'_i^T, SVD(W) = U S Vh, R = U diag(1,1,det(U)det(Vh)) Vh,
    t = mean(q) - R mean(p).
    """
    if weights is None:
        weights = jnp.ones(p.shape[0], p.dtype)
    w = weights[:, None]
    wsum = jnp.maximum(jnp.sum(weights), 1e-12)
    u_p = jnp.sum(p * w, axis=0) / wsum
    u_q = jnp.sum(q * w, axis=0) / wsum
    p_c = p - u_p
    q_c = q - u_q
    cov = jnp.matmul((q_c * w).T, p_c, precision=jax.lax.Precision.HIGHEST)
    uu, _, vh = jnp.linalg.svd(cov, full_matrices=True)
    d = jnp.linalg.det(uu) * jnp.linalg.det(vh)
    m = jnp.diag(jnp.array([1.0, 1.0, 1.0], cov.dtype)).at[2, 2].set(d)
    r = uu @ m @ vh
    t = u_q - r @ u_p
    top = jnp.concatenate([r, t[:, None]], axis=1)
    bottom = jnp.array([[0.0, 0.0, 0.0, 1.0]], cov.dtype)
    return jnp.concatenate([top, bottom], axis=0)


def kabsch_masked(p: jax.Array, q: jax.Array, mask: jax.Array) -> jax.Array:
    """Masked variant for padded correspondence sets."""
    return kabsch_transform(p, q, weights=mask.astype(p.dtype))


def apply_transform(points: jax.Array, transform: jax.Array) -> jax.Array:
    """Apply a 4x4 homogeneous transform to (N, 3) points."""
    return jnp.matmul(points, transform[:3, :3].T,
                      precision=jax.lax.Precision.HIGHEST) + transform[:3, 3]
