"""Fixed-capacity padded point clouds.

The reference pipeline passes `open3d.geometry.PointCloud` objects between
every stage (e.g. reference `utils/depth_utils.py`, `object_memory/object_info.py`).
Open3D clouds are dynamically sized host objects; under XLA everything must be
static-shaped, so the TPU-native equivalent is a pytree of

    points : (N, 3) float32
    colors : (N, 3) float32
    mask   : (N,)   bool      -- True where the row holds a real point

with `N` a fixed capacity (typically rounded up to a power of two so repeated
calls hit the jit cache). Invalid rows hold zeros and must never influence a
result: every op in this package consumes and produces masks explicitly.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def round_up_pow2(n: int, minimum: int = 8) -> int:
    """Round `n` up to a power of two (>= minimum) for jit-cache-friendly capacities."""
    n = max(int(n), minimum)
    return 1 << (n - 1).bit_length()


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PointCloud:
    """A padded, masked point cloud. All fields are jax or numpy arrays.

    `points[i]` / `colors[i]` are meaningful only where `mask[i]` is True.
    """

    points: jax.Array  # (N, 3) float32
    colors: jax.Array  # (N, 3) float32
    mask: jax.Array    # (N,)   bool

    # ------------------------------------------------------------------ #
    # construction
    # ------------------------------------------------------------------ #
    @staticmethod
    def from_numpy(points: np.ndarray,
                   colors: np.ndarray | None = None,
                   capacity: int | None = None) -> "PointCloud":
        points = np.asarray(points, dtype=np.float32).reshape(-1, 3)
        n = points.shape[0]
        if colors is None:
            colors = np.zeros_like(points)
        else:
            colors = np.asarray(colors, dtype=np.float32).reshape(-1, 3)
            assert colors.shape[0] == n, "points/colors length mismatch"
        if capacity is None:
            capacity = round_up_pow2(n)
        assert capacity >= n, f"capacity {capacity} < {n} points"
        pts = np.zeros((capacity, 3), dtype=np.float32)
        cols = np.zeros((capacity, 3), dtype=np.float32)
        msk = np.zeros((capacity,), dtype=bool)
        pts[:n] = points
        cols[:n] = colors
        msk[:n] = True
        return PointCloud(jnp.asarray(pts), jnp.asarray(cols), jnp.asarray(msk))

    @staticmethod
    def empty(capacity: int = 8) -> "PointCloud":
        return PointCloud(
            jnp.zeros((capacity, 3), jnp.float32),
            jnp.zeros((capacity, 3), jnp.float32),
            jnp.zeros((capacity,), bool),
        )

    # ------------------------------------------------------------------ #
    # basic queries (jit-safe)
    # ------------------------------------------------------------------ #
    @property
    def capacity(self) -> int:
        return self.points.shape[0]

    def count(self) -> jax.Array:
        """Number of valid points (traced scalar)."""
        return jnp.sum(self.mask.astype(jnp.int32))

    def centroid(self) -> jax.Array:
        """Mean of valid points; zeros if empty."""
        return masked_mean(self.points, self.mask)

    def bounds(self) -> tuple[jax.Array, jax.Array]:
        """(min, max) over valid points; (+inf, -inf) rows where empty."""
        big = jnp.float32(jnp.inf)
        m = self.mask[:, None]
        mn = jnp.min(jnp.where(m, self.points, big), axis=0)
        mx = jnp.max(jnp.where(m, self.points, -big), axis=0)
        return mn, mx

    # ------------------------------------------------------------------ #
    # host-side utilities
    # ------------------------------------------------------------------ #
    def to_numpy(self) -> tuple[np.ndarray, np.ndarray]:
        """Return (points, colors) of only the valid rows, as numpy arrays."""
        mask = np.asarray(self.mask)
        return np.asarray(self.points)[mask], np.asarray(self.colors)[mask]

    def compact(self, capacity: int | None = None) -> "PointCloud":
        """Host-side repack: drop invalid rows, re-pad to a (new) capacity."""
        pts, cols = self.to_numpy()
        return PointCloud.from_numpy(pts, cols, capacity=capacity)

    def pad_to(self, capacity: int) -> "PointCloud":
        """Grow capacity (host-side concat of zero rows)."""
        cur = self.capacity
        assert capacity >= cur
        if capacity == cur:
            return self
        extra = capacity - cur
        return PointCloud(
            jnp.concatenate([self.points, jnp.zeros((extra, 3), jnp.float32)]),
            jnp.concatenate([self.colors, jnp.zeros((extra, 3), jnp.float32)]),
            jnp.concatenate([self.mask, jnp.zeros((extra,), bool)]),
        )


def masked_mean(values: jax.Array, mask: jax.Array, axis: int = 0) -> jax.Array:
    """Mean of `values` rows where mask is True; zeros when no valid rows."""
    mask_f = mask.astype(values.dtype)
    while mask_f.ndim < values.ndim:
        mask_f = mask_f[..., None]
    total = jnp.sum(values * mask_f, axis=axis)
    count = jnp.maximum(jnp.sum(mask_f, axis=axis), 1.0)
    return total / count


def concatenate(clouds: list[PointCloud], capacity: int | None = None) -> PointCloud:
    """Concatenate clouds into one padded cloud (static capacities, jit-safe
    if `capacity` equals the sum of input capacities)."""
    pts = jnp.concatenate([c.points for c in clouds], axis=0)
    cols = jnp.concatenate([c.colors for c in clouds], axis=0)
    msk = jnp.concatenate([c.mask for c in clouds], axis=0)
    out = PointCloud(pts, cols, msk)
    if capacity is not None and capacity != out.capacity:
        assert capacity > out.capacity
        out = out.pad_to(capacity)
    return out


@partial(jax.jit, static_argnames=())
def apply_point_mask(cloud: PointCloud, keep: jax.Array) -> PointCloud:
    """Restrict the cloud to rows where `keep` is True (in-place mask update)."""
    return PointCloud(cloud.points, cloud.colors, cloud.mask & keep)
