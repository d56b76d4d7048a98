"""Depth-image backprojection with the reference's centered-pixel convention.

The reference (`utils/depth_utils.py:12-90`) unprojects with a *centered*
pixel grid rather than an optical-center intrinsic:

    w, h = depth.shape            # note: w = #rows, h = #cols (their naming)
    horizontal = linspace(-h/2, h/2, h)       # per column
    vertical   = linspace( w/2, -w/2, w)      # per row (y points up)
    X = horizontal * depth / fx
    Y = vertical   * depth / fy
    Z = depth

and drops z == 0 points. We reproduce those exact coordinates so poses and
registration targets match the reference bit-for-bit, but batched: one jitted
call produces per-mask padded clouds for *all* SAM masks at once instead of
the reference's per-mask Python loop (`utils/depth_utils.py:176-206`).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .pointcloud import PointCloud
from .outliers import radius_outlier_keep_mask, DEFAULT_OUTLIER_REMOVAL_CONFIG


def centered_pixel_grid(rows: int, cols: int) -> tuple[jax.Array, jax.Array]:
    """The reference's linspace grid: horizontal per column, vertical per row."""
    horizontal = jnp.linspace(-cols / 2, cols / 2, cols, dtype=jnp.float32)
    vertical = jnp.linspace(rows / 2, -rows / 2, rows, dtype=jnp.float32)
    return horizontal[None, :], vertical[:, None]


@partial(jax.jit, static_argnames=())
def backproject(depth: jax.Array, fx: jax.Array, fy: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Unproject a (rows, cols) depth image.

    Returns (points, valid): points (rows*cols, 3) in the reference camera
    frame; valid marks depth != 0 (the reference's z==0 filter).
    """
    rows, cols = depth.shape
    horizontal, vertical = centered_pixel_grid(rows, cols)
    x = horizontal * depth / fx
    y = vertical * depth / fy
    z = depth
    points = jnp.stack([x, y, z], axis=-1).reshape(-1, 3)
    valid = (depth != 0).reshape(-1)
    return points.astype(jnp.float32), valid


def pointcloud_from_depth(depth: jax.Array,
                          fx, fy,
                          rgb: jax.Array | None = None,
                          outlier_removal_config: dict | None = DEFAULT_OUTLIER_REMOVAL_CONFIG,
                          ) -> PointCloud:
    """Reference `get_(coloured_)pointcloud_from_depth`: backproject, drop z==0,
    optionally radius-outlier-filter. Result keeps full rows*cols capacity with
    a validity mask (no host repacking needed inside the pipeline)."""
    points, valid = backproject(jnp.asarray(depth, jnp.float32),
                                jnp.float32(fx), jnp.float32(fy))
    if rgb is not None:
        colors = (jnp.asarray(rgb, jnp.float32) / 255.0).reshape(-1, 3)
    else:
        colors = jnp.zeros_like(points)
    cloud = PointCloud(points, colors, valid)
    if outlier_removal_config is not None:
        keep = radius_outlier_keep_mask(
            cloud.points, cloud.mask,
            radius=outlier_removal_config["radius"],
            nb_points=outlier_removal_config["radius_nb_points"],
        )
        cloud = PointCloud(cloud.points, cloud.colors, cloud.mask & keep)
    return cloud


@partial(jax.jit, static_argnames=("apply_outlier_removal", "radius_nb_points"))
def mask_pointclouds_from_depth(depth: jax.Array,
                                rgb: jax.Array,
                                masks: jax.Array,
                                fx: jax.Array,
                                fy: jax.Array,
                                apply_outlier_removal: bool = True,
                                radius: float = 0.05,
                                radius_nb_points: int = 12) -> PointCloud:
    """Batched replacement for the reference per-mask loop
    (`utils/depth_utils.py:176-206`).

    Args:
      depth: (rows, cols) float depth (already divided by the depth factor).
      rgb:   (rows, cols, 3) uint8/float RGB.
      masks: (M, rows, cols) bool/0-1 segmentation masks.

    Returns a batched PointCloud with leading mask axis:
      points (M, P, 3), colors (M, P, 3), mask (M, P) where P = rows*cols.
    One compiled kernel computes every object's cloud; the per-object radius
    outlier filter runs vmapped (brute-force tiled neighbor count on the MXU).
    """
    depth = jnp.asarray(depth, jnp.float32)
    points, valid = backproject(depth, fx, fy)  # (P, 3), (P,)
    colors = (jnp.asarray(rgb, jnp.float32) / 255.0).reshape(-1, 3)

    m = masks.reshape(masks.shape[0], -1).astype(bool)  # (M, P)
    # reference computes depth*mask then drops z==0, equivalent to valid & mask
    per_mask_valid = m & valid[None, :]

    pts_b = jnp.broadcast_to(points[None], (m.shape[0],) + points.shape)
    cols_b = jnp.broadcast_to(colors[None], (m.shape[0],) + colors.shape)

    if apply_outlier_removal:
        keep = jax.vmap(
            lambda msk: radius_outlier_keep_mask(points, msk, radius=radius,
                                                 nb_points=radius_nb_points)
        )(per_mask_valid)
        per_mask_valid = per_mask_valid & keep

    return PointCloud(pts_b, cols_b, per_mask_valid)
