"""Closed-form 3x3 symmetric eigendecomposition and SVD.

`jnp.linalg.eigh/svd` lower to iterative QR/Jacobi loops — fine for one big
matrix, terrible for the tens of thousands of tiny 3x3 problems this pipeline
solves per frame (one per RANSAC hypothesis Kabsch, per point normal, per
OBB/ellipsoid fit). The analytic path (Cardano's trigonometric solution for
the characteristic cubic + cross-product eigenvectors) is branch-free
element-wise VPU math that vmaps to millions of matrices.

Accuracy: ~1e-6 relative for well-conditioned inputs; degenerate (repeated
eigenvalue) cases fall back to stable orthogonal completion.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def eigh3x3(a: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Eigen-decomposition of symmetric 3x3 (batched over leading dims).

    Returns (w (..., 3) ascending, v (..., 3, 3) with eigenvectors in
    COLUMNS), matching jnp.linalg.eigh's convention.
    """
    a = 0.5 * (a + jnp.swapaxes(a, -1, -2))  # enforce symmetry
    q = jnp.trace(a, axis1=-2, axis2=-1)[..., None, None] / 3.0
    b = a - q * jnp.eye(3, dtype=a.dtype)
    p2 = jnp.sum(b * b, axis=(-2, -1)) / 6.0
    p = jnp.sqrt(jnp.maximum(p2, 1e-30))
    # r = det(B / p) / 2 in [-1, 1]
    det_b = jnp.linalg.det(b)
    r = jnp.clip(det_b / (2.0 * p ** 3 + 1e-30), -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0

    q_s = q[..., 0, 0]
    w2 = q_s + 2.0 * p * jnp.cos(phi)                       # largest
    w0 = q_s + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)  # smallest
    w1 = 3.0 * q_s - w0 - w2
    w = jnp.stack([w0, w1, w2], axis=-1)

    # eigenvector for eigenvalue wi: any nonzero column of the adjugate of
    # (A - wi I); equivalently cross products of two rows
    def eigvec(wi):
        m = a - wi[..., None, None] * jnp.eye(3, dtype=a.dtype)
        c0 = jnp.cross(m[..., 0, :], m[..., 1, :])
        c1 = jnp.cross(m[..., 0, :], m[..., 2, :])
        c2 = jnp.cross(m[..., 1, :], m[..., 2, :])
        n0 = jnp.sum(c0 * c0, axis=-1)
        n1 = jnp.sum(c1 * c1, axis=-1)
        n2 = jnp.sum(c2 * c2, axis=-1)
        best = jnp.argmax(jnp.stack([n0, n1, n2], axis=-1), axis=-1)
        cand = jnp.stack([c0, c1, c2], axis=-2)
        idx = jnp.broadcast_to(best[..., None, None], best.shape + (1, 3))
        vec = jnp.take_along_axis(cand, idx, axis=-2)[..., 0, :]
        norm = jnp.linalg.norm(vec, axis=-1, keepdims=True)
        return vec / jnp.maximum(norm, 1e-30), norm[..., 0]

    v0, n0 = eigvec(w[..., 0])
    v2, n2 = eigvec(w[..., 2])
    # fully-degenerate guard (e.g. multiples of I: every adjugate row is 0)
    ez = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], a.dtype), v2.shape)
    v2 = jnp.where((n2 > 1e-20)[..., None], v2, ez)
    # degenerate handling: if v0 is unreliable (repeated eigenvalue), build it
    # orthogonal to v2 instead; and vice versa
    alt = _any_orthogonal(v2)
    v0 = jnp.where((n0 > 1e-20)[..., None], v0, alt)
    # re-orthogonalize v0 against v2 (costless when already orthogonal)
    v0 = v0 - jnp.sum(v0 * v2, axis=-1, keepdims=True) * v2
    v0n = jnp.linalg.norm(v0, axis=-1, keepdims=True)
    v0 = jnp.where(v0n > 1e-20, v0 / jnp.maximum(v0n, 1e-30),
                   _any_orthogonal(v2))
    v1 = jnp.cross(v2, v0)
    v = jnp.stack([v0, v1, v2], axis=-1)  # columns
    return w, v


def _any_orthogonal(u: jax.Array) -> jax.Array:
    """A unit vector orthogonal to unit vector u (batched)."""
    ex = jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0], u.dtype), u.shape)
    ey = jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0], u.dtype), u.shape)
    pick = jnp.abs(u[..., 0:1]) < 0.9
    base = jnp.where(pick, ex, ey)
    v = jnp.cross(u, base)
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-30)


def svd3x3(a: jax.Array) -> tuple[jax.Array, jax.Array, jax.Array]:
    """SVD of general 3x3 (batched): returns (u, s, vT) with s descending.

    Via eigh3x3(A^T A): V and singular values, then U = A V / s with
    orthogonal completion for near-zero singular values. Sign conventions may
    differ from LAPACK (valid SVD regardless).
    """
    ata = jnp.einsum("...ji,...jk->...ik", a, a)
    w, v_asc = eigh3x3(ata)
    # descending order
    s = jnp.sqrt(jnp.maximum(w[..., ::-1], 0.0))
    v = v_asc[..., ::-1]

    u_raw = jnp.einsum("...ij,...jk->...ik", a, v)
    u0 = _safe_normalize(u_raw[..., :, 0], s[..., 0])
    u1_raw = u_raw[..., :, 1]
    u1_raw = u1_raw - jnp.sum(u1_raw * u0, axis=-1, keepdims=True) * u0
    u1 = _safe_normalize(u1_raw, s[..., 1], fallback_orth=u0)
    # u2 = A v2 / s2 when s2 is healthy (signs then reproduce A exactly, even
    # for det(A) < 0 — U is orthogonal but not necessarily right-handed);
    # orthogonal completion when s2 ~ 0.
    av2 = u_raw[..., :, 2]
    av2 = av2 - jnp.sum(av2 * u0, axis=-1, keepdims=True) * u0
    av2 = av2 - jnp.sum(av2 * u1, axis=-1, keepdims=True) * u1
    norm2 = jnp.linalg.norm(av2, axis=-1, keepdims=True)
    u2 = jnp.where(norm2 > 1e-12, av2 / jnp.maximum(norm2, 1e-30),
                   jnp.cross(u0, u1))
    u = jnp.stack([u0, u1, u2], axis=-1)
    return u, s, jnp.swapaxes(v, -1, -2)


def _safe_normalize(vec, scale, fallback_orth=None):
    norm = jnp.linalg.norm(vec, axis=-1, keepdims=True)
    ok = norm > 1e-12
    safe = vec / jnp.maximum(norm, 1e-30)
    if fallback_orth is None:
        fb = _any_orthogonal(jnp.broadcast_to(
            jnp.array([0.0, 0.0, 1.0], vec.dtype), vec.shape))
    else:
        fb = _any_orthogonal(fallback_orth)
    return jnp.where(ok, safe, fb)
