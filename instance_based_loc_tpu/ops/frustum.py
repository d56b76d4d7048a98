"""Vectorised frustum culling.

Replaces the per-point Python loop copied into all five reference dataloaders
(`tum_dataloader.py:128-165`, `real:116-153`, `synthetic:101-137`,
`eightroom:134-170`, `hm3d:120-156`): transform the map cloud into the camera
frame and keep points inside the FOV cone between the near/far clip planes.
One jnp.where mask instead of a loop — SURVEY.md §2.1.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .pointcloud import PointCloud
from .transforms import quat_xyzw_to_rotmat, quat_normalize


@jax.jit
def visible_mask(points: jax.Array,
                 mask: jax.Array,
                 pose7: jax.Array,
                 fov_deg,
                 near_clip,
                 far_clip) -> tuple[jax.Array, jax.Array]:
    """Returns (camera-frame points, visibility mask).

    Matches the reference math: p_cam = (p - t) @ R_inv.T with R_inv = R.T,
    visible iff near <= z <= far and |x/z|, |y/z| <= tan(fov/2).
    """
    t = pose7[:3]
    q = quat_normalize(pose7[3:])
    r = quat_xyzw_to_rotmat(q)
    from .distance import matmul_hp
    p_cam = matmul_hp(points - t, r)  # == (p - t) @ (R^T)^T
    x, y, z = p_cam[:, 0], p_cam[:, 1], p_cam[:, 2]
    tan_half = jnp.tan(jnp.deg2rad(jnp.float32(fov_deg)) / 2.0)
    zsafe = jnp.where(z == 0, 1e-12, z)
    ok = (
        (z >= near_clip)
        & (z <= far_clip)
        & (jnp.abs(x / zsafe) <= tan_half)
        & (jnp.abs(y / zsafe) <= tan_half)
    )
    return p_cam, mask & ok


def get_visible_pointcloud(cloud: PointCloud, pose7, fov_deg, near_clip, far_clip) -> PointCloud:
    """Camera-frame visible subset of `cloud` (reference returns camera-frame
    points, not world-frame)."""
    p_cam, vis = visible_mask(cloud.points, cloud.mask, jnp.asarray(pose7, jnp.float32),
                              fov_deg, near_clip, far_clip)
    return PointCloud(p_cam, cloud.colors, vis)
