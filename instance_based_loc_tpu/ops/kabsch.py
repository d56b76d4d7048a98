"""Closed-form rigid alignment (Kabsch / Umeyama via SVD).

Replaces reference `utils/fpfh_register.py:24-82` (`get_transformation`,
`get_SVD_transform`) and serves as the inner solver for RANSAC hypotheses and
ICP updates. Fully vmappable: the (3,3) SVD is tiny, so thousands of RANSAC
hypotheses solve in one batched call.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


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
    # analytic 3x3 SVD: jnp.linalg.svd lowers to an iterative solver that is
    # ~100x slower for the thousands of tiny SVDs RANSAC/ICP issue on TPU
    from .eigen3 import svd3x3
    uu, _, vh = svd3x3(cov)
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


def kabsch_numpy(p, q):
    """Host numpy Kabsch for tiny correspondence sets (e.g. the 2-7 object
    centroids of a localise assignment): running the jax version eagerly from
    host code costs hundreds of per-primitive dispatches over the device
    tunnel; 3x3 numpy SVD is microseconds."""
    import numpy as np
    p = np.asarray(p, np.float64)
    q = np.asarray(q, np.float64)
    u_p = p.mean(0)
    u_q = q.mean(0)
    cov = (q - u_q).T @ (p - u_p)
    uu, _, vh = np.linalg.svd(cov)
    d = np.linalg.det(uu) * np.linalg.det(vh)
    r = uu @ np.diag([1.0, 1.0, d]) @ vh
    t = u_q - r @ u_p
    out = np.eye(4, dtype=np.float32)
    out[:3, :3] = r
    out[:3, 3] = t
    return out


def apply_transform(points: jax.Array, transform: jax.Array) -> jax.Array:
    """Apply a 4x4 homogeneous transform to (N, 3) points."""
    return jnp.matmul(points, transform[:3, :3].T,
                      precision=jax.lax.Precision.HIGHEST) + transform[:3, 3]
