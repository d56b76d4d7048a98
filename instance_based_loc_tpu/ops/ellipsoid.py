"""Ellipsoid fitting (reference `clip_loc/ellipsoid_utils.py:4-55`):
PCA of the covariance gives axes, sqrt-eigenvalues give initial semi-axis
lengths, then iterative 1.05x inflation until every point lies inside.
(The reference caps at 20 inflations and silently returns a non-enclosing
ellipsoid for heavy-tailed clouds; we default to 60, enough for ~18x.)

TPU-native: the containment check is one vectorized reduction instead of the
reference's per-point Python loop; the inflate loop is a `lax.while_loop`.
The ellipsoid is kept parametrically (center, axes, lengths) — the reference
materializes a 40k-point surface cloud per object."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .pointcloud import masked_mean


@jax.jit
def fit_ellipsoid(points: jax.Array, mask: jax.Array,
                  scaling_factor: float = 1.05, max_iterations: int = 60):
    """Returns (center (3,), axes (3,3) columns, lengths (3,) semi-axes)."""
    center = masked_mean(points, mask)
    centered = (points - center) * mask[:, None]
    n = jnp.maximum(jnp.sum(mask.astype(jnp.float32)) - 1.0, 1.0)
    cov = jnp.matmul(centered.T, centered,
                     precision=jax.lax.Precision.HIGHEST) / n
    # np.cov ddof=1 like the reference; SVD of symmetric PSD cov == eigh
    from .eigen3 import eigh3x3
    w_asc, v_asc = eigh3x3(cov)
    s = jnp.maximum(w_asc[::-1], 0.0)
    u = v_asc[:, ::-1]
    lengths = jnp.sqrt(jnp.maximum(s, 1e-12)) * scaling_factor

    proj = jnp.matmul(points - center, u, precision=jax.lax.Precision.HIGHEST)

    def contains_all(lens):
        r = jnp.linalg.norm(proj / lens, axis=-1)
        return jnp.all(jnp.where(mask, r <= 1.0, True))

    def cond(carry):
        lens, it = carry
        return (~contains_all(lens)) & (it < max_iterations)

    def body(carry):
        lens, it = carry
        return lens * scaling_factor, it + 1

    lengths, _ = jax.lax.while_loop(cond, body, (lengths, jnp.int32(0)))
    return center, u, lengths


def sample_ellipsoid_surface(center, axes, lengths, n_u: int = 40,
                             n_v: int = 20) -> np.ndarray:
    """Surface points for visualization / projection scoring."""
    u = np.linspace(0, 2 * np.pi, n_u)
    v = np.linspace(0, np.pi, n_v)
    uu, vv = np.meshgrid(u, v)
    local = np.stack([
        lengths[0] * np.cos(uu) * np.sin(vv),
        lengths[1] * np.sin(uu) * np.sin(vv),
        lengths[2] * np.cos(vv),
    ], axis=-1).reshape(-1, 3)
    return local @ np.asarray(axes).T + np.asarray(center)
