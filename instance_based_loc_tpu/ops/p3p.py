"""Perspective-three-point (P3P) camera pose estimation in pure JAX.

Replaces OpenCV C++ `cv2.solveP3P` / `cv2.Rodrigues` (reference
`clip_loc/loc_utils.py:7,16-43`). Grunert's classical formulation:

    a^2 = s2^2 + s3^2 - 2 s2 s3 cos(alpha)
    b^2 = s1^2 + s3^2 - 2 s1 s3 cos(beta)
    c^2 = s1^2 + s2^2 - 2 s1 s2 cos(gamma)

with u = s2/s1, v = s3/s1 reduces to a quartic in v. Rather than hard-coding
the published coefficient tables, the quartic is DERIVED in code by
polynomial-coefficient convolution of

    N(v)^2 - 2 cos(gamma) N(v) D(v) + M(v) D(v)^2 = 0

where u = N/D (N quadratic, D linear, M quadratic) — each step is plain
algebra that the unit tests verify against synthetic camera geometry. All
four roots come from a fixed-iteration Durand–Kerner complex solver
(jittable — TPUs have no nonsymmetric eigendecomposition for companion
matrices), depths follow, and the pose comes from Kabsch.

Everything is vmappable: a whole RANSAC batch of P3P problems (the reference
loops 100 rounds on host through OpenCV) solves in ONE device call.
Convention: returned poses are camera-to-world 4x4 matrices (the reference's
`get_camera_pose` actually stores world-to-camera extrinsics and later
inverts them inconsistently — loc_utils.py:7-14 vs :66; we use one convention
throughout and document it).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .kabsch import kabsch_transform


def _polymul(p, q):
    """Coefficient convolution, highest degree first."""
    n = len(p) + len(q) - 1
    out = [0.0] * n
    for i, pi in enumerate(p):
        for j, qj in enumerate(q):
            out[i + j] = out[i + j] + pi * qj
    return out


def _polyadd(p, q):
    n = max(len(p), len(q))
    p = [0.0] * (n - len(p)) + list(p)
    q = [0.0] * (n - len(q)) + list(q)
    return [a + b for a, b in zip(p, q)]


def durand_kerner_quartic(coeffs: jax.Array, iters: int = 50) -> jax.Array:
    """All 4 complex roots of a quartic. coeffs: (5,) [a4, a3, a2, a1, a0]."""
    lead = jnp.where(jnp.abs(coeffs[0]) > 1e-12, coeffs[0],
                     jnp.complex64(1e-12))
    a = coeffs / lead

    def poly(z):
        return ((((z + a[1]) * z + a[2]) * z + a[3]) * z + a[4])

    w = jnp.complex64(0.4 + 0.9j)
    z0 = jnp.stack([w, w ** 2, w ** 3, w ** 4])

    def step(z, _):
        def update(i, zz):
            zi = zz[i]
            diff = jnp.where(jnp.arange(4) == i, 1.0 + 0j, zi - zz)
            denom = jnp.prod(diff)
            denom = jnp.where(jnp.abs(denom) > 1e-12, denom,
                              jnp.complex64(1e-12))
            return zz.at[i].set(zi - poly(zi) / denom)
        z = jax.lax.fori_loop(0, 4, update, z)
        return z, None

    roots, _ = jax.lax.scan(step, z0, None, length=iters)
    return roots


def p3p_grunert(world_pts: jax.Array, bearings: jax.Array):
    """Solve P3P: world_pts (3, 3), bearings (3, 3) unit camera-frame rays.

    Returns (poses (4, 4, 4) camera-to-world candidates, valid (4,) bool).
    Invalid slots hold identity.
    """
    p1, p2, p3 = world_pts[0], world_pts[1], world_pts[2]
    f1, f2, f3 = bearings[0], bearings[1], bearings[2]

    a2 = jnp.sum((p2 - p3) ** 2)
    b2 = jnp.sum((p1 - p3) ** 2)
    c2 = jnp.sum((p1 - p2) ** 2)
    ca = jnp.dot(f2, f3)   # cos(alpha)
    cb = jnp.dot(f1, f3)   # cos(beta)
    cg = jnp.dot(f1, f2)   # cos(gamma)

    b2_safe = jnp.maximum(b2, 1e-12)
    A = a2 / b2_safe
    B = c2 / b2_safe

    # u = N(v) / D(v):
    #   N(v) = (A-B-1) v^2 + (-2 (A-B) cb) v + (A-B+1)
    #   D(v) = -2 ca v + 2 cg
    # and M(v) = 1 - B(1 + v^2 - 2 v cb) = -B v^2 + 2 B cb v + (1 - B)
    N = [A - B - 1.0, -2.0 * (A - B) * cb, A - B + 1.0]
    D = [-2.0 * ca, 2.0 * cg]
    M = [-B, 2.0 * B * cb, 1.0 - B]

    # quartic: N^2 - 2 cg N D + M D^2 = 0   (from u^2 - 2 u cg + M = 0)
    quartic = _polyadd(
        _polymul(N, N),
        _polyadd([-2.0 * cg * x for x in _polymul(N, D)], _polymul(M, _polymul(D, D))))
    coeffs = jnp.stack(quartic).astype(jnp.complex64)
    roots = durand_kerner_quartic(coeffs)

    real_ok = jnp.abs(roots.imag) < 1e-3 * (1.0 + jnp.abs(roots.real))
    v = roots.real

    # Newton polish of the real roots (f32 Durand-Kerner leaves ~1e-3 error
    # on near-degenerate configurations)
    cr = jnp.stack(quartic)

    def newton(_, vv):
        f = (((cr[0] * vv + cr[1]) * vv + cr[2]) * vv + cr[3]) * vv + cr[4]
        df = ((4.0 * cr[0] * vv + 3.0 * cr[1]) * vv + 2.0 * cr[2]) * vv + cr[3]
        return vv - f / jnp.where(jnp.abs(df) > 1e-9, df, 1e-9)

    v = jax.lax.fori_loop(0, 6, newton, v)

    denom_s1 = 1.0 + v * v - 2.0 * v * cb
    s1 = jnp.sqrt(jnp.maximum(b2 / jnp.maximum(denom_s1, 1e-12), 0.0))
    d_v = -2.0 * ca * v + 2.0 * cg
    n_v = (A - B - 1.0) * v * v - 2.0 * (A - B) * cb * v + (A - B + 1.0)
    u = n_v / jnp.where(jnp.abs(d_v) > 1e-9, d_v, 1e-9)
    s2 = u * s1
    s3 = v * s1

    valid = (real_ok & (v > 1e-6) & (u > 1e-6)
             & (s1 > 1e-6) & jnp.isfinite(s1) & jnp.isfinite(s2))

    def pose_from_depths(si):
        s1_, s2_, s3_ = si
        cam_pts = jnp.stack([s1_ * f1, s2_ * f2, s3_ * f3])
        E = kabsch_transform(world_pts, cam_pts)  # world -> camera
        R = E[:3, :3]
        t = E[:3, 3]
        return jnp.eye(4).at[:3, :3].set(R.T).at[:3, 3].set(-R.T @ t)

    poses = jax.vmap(pose_from_depths)(jnp.stack([s1, s2, s3], axis=-1))
    poses = jnp.where(valid[:, None, None], poses, jnp.eye(4))
    return poses, valid


def pixel_bearings(pixels: jax.Array, intrinsics: jax.Array) -> jax.Array:
    """Unit bearing vectors from pixel coords (N, 2) and 3x3 K (CV convention:
    x right, y down, z forward)."""
    k_inv = jnp.linalg.inv(intrinsics)
    ones = jnp.ones((pixels.shape[0], 1), pixels.dtype)
    homo = jnp.concatenate([pixels, ones], axis=1)
    rays = homo @ k_inv.T
    return rays / jnp.linalg.norm(rays, axis=-1, keepdims=True)


@jax.jit
def batched_p3p(world_pts: jax.Array, pixels: jax.Array, intrinsics: jax.Array):
    """Solve S independent P3P problems: world_pts (S, 3, 3), pixels (S, 3, 2).
    Returns (poses (S, 4, 4, 4), valid (S, 4))."""
    def solve(w, px):
        return p3p_grunert(w, pixel_bearings(px.astype(jnp.float32), intrinsics))
    return jax.vmap(solve)(world_pts, pixels)


@jax.jit
def refine_pnp(pose: jax.Array, world_pts: jax.Array, pixels: jax.Array,
               weights: jax.Array, intrinsics: jax.Array,
               iters: int = 10, damping: float = 1e-3) -> jax.Array:
    """Gauss–Newton reprojection refinement of a camera-to-world pose over
    weighted 2D-3D correspondences. Fixes the f32 P3P hypothesis imprecision
    (clustered quartic roots) and improves on the reference, which returns the
    raw unrefined P3P pose (clip_loc_object_memory.py:212-215)."""

    def residuals(params):
        w, t = params[:3], params[3:]
        angle = jnp.linalg.norm(w) + 1e-12
        axis = w / angle
        kx = jnp.array([[0, -axis[2], axis[1]],
                        [axis[2], 0, -axis[0]],
                        [-axis[1], axis[0], 0]])
        R = (jnp.eye(3) + jnp.sin(angle) * kx
             + (1 - jnp.cos(angle)) * (kx @ kx))
        cam = (world_pts - t) @ R  # world -> camera with camera-to-world (R, t)
        z = jnp.where(jnp.abs(cam[:, 2]) > 1e-9, cam[:, 2], 1e-9)
        px = (cam @ intrinsics.T)[:, :2] / z[:, None]
        return ((px - pixels) * weights[:, None]).reshape(-1)

    # init params from pose
    R0 = pose[:3, :3]
    t0 = pose[:3, 3]
    trace = jnp.clip((jnp.trace(R0) - 1) / 2, -1 + 1e-6, 1 - 1e-6)
    angle0 = jnp.arccos(trace)
    axis0 = jnp.array([R0[2, 1] - R0[1, 2], R0[0, 2] - R0[2, 0],
                       R0[1, 0] - R0[0, 1]])
    axis0 = axis0 / (jnp.linalg.norm(axis0) + 1e-12)
    params = jnp.concatenate([axis0 * angle0, t0])

    def gn_step(_, p):
        r = residuals(p)
        J = jax.jacfwd(residuals)(p)
        H = J.T @ J + damping * jnp.eye(6)
        g = J.T @ r
        return p - jnp.linalg.solve(H, g)

    params = jax.lax.fori_loop(0, iters, gn_step, params)
    w, t = params[:3], params[3:]
    angle = jnp.linalg.norm(w) + 1e-12
    axis = w / angle
    kx = jnp.array([[0, -axis[2], axis[1]],
                    [axis[2], 0, -axis[0]],
                    [-axis[1], axis[0], 0]])
    R = jnp.eye(3) + jnp.sin(angle) * kx + (1 - jnp.cos(angle)) * (kx @ kx)
    return jnp.eye(4).at[:3, :3].set(R).at[:3, 3].set(t)


@jax.jit
def project_points(points: jax.Array, intrinsics: jax.Array,
                   camera_pose: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Project world points through a camera-to-world pose. Returns
    (pixels (N, 2), in_front (N,) bool) — CV convention
    (reference loc_utils.py:45-88, with the pose convention fixed)."""
    R = camera_pose[:3, :3]
    t = camera_pose[:3, 3]
    cam = (points - t) @ R  # world -> camera
    z = cam[:, 2]
    zs = jnp.where(jnp.abs(z) > 1e-9, z, 1e-9)
    px = cam @ intrinsics.T
    return px[:, :2] / zs[:, None], z > 0
