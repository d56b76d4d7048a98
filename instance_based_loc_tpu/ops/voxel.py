"""Colour-preserving voxel downsampling via sort + segment-sum.

Replaces two reference implementations:
* Open3D C++ `voxel_down_sample` (reference `tum_dataloader.py:112`),
* the pure-Python dict-binning `voxel_down_sample_with_colors`
  (reference `utils/depth_utils.py:211-265`) — the per-point Python loop that
  SURVEY.md ranks among the hot spots.

TPU-native design: voxel integer coordinates are lexsorted (int32 — JAX
defaults to 32-bit ints and TPUs have no native int64), segment boundaries
become segment ids via a cumsum, and per-voxel means come from
`jax.ops.segment_sum` — one fused, static-shape kernel. Output order is
sorted-by-voxel-coord (the reference's dict insertion order is unspecified
downstream; only the set of voxel means matters).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .pointcloud import PointCloud


def voxel_coords(points: jax.Array, voxel_size, mask: jax.Array) -> jax.Array:
    """floor(p / voxel) per axis as int32; invalid rows get INT32_MAX so they
    sort to the end and never merge with real voxels."""
    coords = jnp.floor(points / jnp.float32(voxel_size)).astype(jnp.int32)
    return jnp.where(mask[:, None], coords, jnp.iinfo(jnp.int32).max)


@partial(jax.jit, static_argnames=())
def voxel_downsample(cloud: PointCloud, voxel_size) -> PointCloud:
    """Average points (and colors) per voxel. Capacity is preserved: output
    row i is the mean of the i-th occupied voxel (sorted by coord), rows past
    the number of occupied voxels are masked out."""
    n = cloud.capacity
    coords = voxel_coords(cloud.points, voxel_size, cloud.mask)
    # lexsort: primary key z, then y, then x (any consistent order works)
    order = jnp.lexsort((coords[:, 2], coords[:, 1], coords[:, 0]))
    coords_s = coords[order]
    pts_s = cloud.points[order]
    cols_s = cloud.colors[order]
    msk_s = cloud.mask[order]

    # Segment ids: a new segment starts where any coordinate changes.
    changed = jnp.any(coords_s[1:] != coords_s[:-1], axis=1)
    first = jnp.concatenate([jnp.array([True]), changed])
    seg = jnp.cumsum(first.astype(jnp.int32)) - 1  # (n,) in [0, n)

    w = msk_s.astype(jnp.float32)[:, None]
    sum_pts = jax.ops.segment_sum(pts_s * w, seg, num_segments=n)
    sum_cols = jax.ops.segment_sum(cols_s * w, seg, num_segments=n)
    counts = jax.ops.segment_sum(w[:, 0], seg, num_segments=n)

    valid = counts > 0
    denom = jnp.maximum(counts, 1.0)[:, None]
    return PointCloud(sum_pts / denom, sum_cols / denom, valid)


def voxel_downsample_points(points: jax.Array, mask: jax.Array, voxel_size):
    """Positions-only variant; returns (points, mask)."""
    cloud = PointCloud(points, jnp.zeros_like(points), mask)
    out = voxel_downsample(cloud, voxel_size)
    return out.points, out.mask


def voxel_downsample_numpy(points, colors, voxel_size):
    """Host-side colour-preserving voxel mean (same semantics as the device
    kernel; used by memory consolidation where clouds live on host — routing
    small irregular bookkeeping through a tunneled device costs ~32 ms per
    touch). Prefers the native C++ helper, falls back to numpy segment sums.
    Returns (points (K, 3), colors (K, 3))."""
    import numpy as np

    points = np.asarray(points, np.float32).reshape(-1, 3)
    colors = (np.zeros_like(points) if colors is None
              else np.asarray(colors, np.float32).reshape(-1, 3))
    if len(points) == 0:
        return points, colors

    from .native import voxel_downsample_native
    out = voxel_downsample_native(points, colors, voxel_size)
    if out is not None:
        return out

    keys = np.floor(points / np.float32(voxel_size)).astype(np.int64)
    _, inv = np.unique(keys, axis=0, return_inverse=True)
    k = int(inv.max()) + 1
    counts = np.bincount(inv, minlength=k).astype(np.float32)[:, None]
    sum_pts = np.zeros((k, 3), np.float64)
    sum_cols = np.zeros((k, 3), np.float64)
    np.add.at(sum_pts, inv, points)
    np.add.at(sum_cols, inv, colors)
    return ((sum_pts / counts).astype(np.float32),
            (sum_cols / counts).astype(np.float32))
