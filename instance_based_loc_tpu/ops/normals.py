"""Surface normal estimation (replaces Open3D C++ `estimate_normals`, used at
reference `utils/fpfh_register.py:91-92` with KDTreeSearchParamHybrid(radius,
max_nn=30)).

TPU-native design: brute-force K-nearest-neighbors via tiled pairwise
distances + `lax.top_k` (MXU-friendly; the registration clouds are a few
thousand points, where brute force beats any tree), neighborhood covariance,
and a batched 3x3 eigendecomposition — the normal is the smallest-eigenvalue
eigenvector. A hybrid-search radius mask reproduces Open3D's
radius-AND-max_nn semantics.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .distance import pairwise_sq_dists


@partial(jax.jit, static_argnames=("k", "row_tile"))
def knn_hybrid(points: jax.Array, mask: jax.Array, radius, k: int = 30,
               row_tile: int = 1024):
    """Hybrid KNN: for each point, up to `k` nearest valid points within
    `radius` (self included, as Open3D's search returns the query too).

    Returns (idx (N, k) int32, neighbor_mask (N, k) bool). Rows are processed
    in tiles so peak memory is O(row_tile * N).
    """
    n = points.shape[0]
    r2 = jnp.float32(radius) ** 2
    big = jnp.float32(1e30)

    rem = (-n) % row_tile
    pts_pad = jnp.pad(points, ((0, rem), (0, 0)))
    npad = pts_pad.shape[0]

    def tile_fn(rows):
        d2 = pairwise_sq_dists(rows, points)                 # (T, N)
        d2 = jnp.where(mask[None, :], d2, big)
        # approx_min_k lowers to the TPU PartialReduce op — one pass instead
        # of top_k's O(k) passes (k=100 for FPFH made top_k the single most
        # expensive stage of registration)
        d2k, idx = jax.lax.approx_min_k(d2, k, recall_target=0.95)
        ok = (d2k <= r2) & (d2k < big / 2)
        return idx.astype(jnp.int32), ok

    tiles = pts_pad.reshape(-1, row_tile, 3)
    idx, ok = jax.lax.map(tile_fn, tiles)
    idx = idx.reshape(npad, k)[:n]
    ok = ok.reshape(npad, k)[:n]
    ok = ok & mask[:, None]
    return idx, ok


@partial(jax.jit, static_argnames=("max_nn", "row_tile"))
def estimate_normals(points: jax.Array, mask: jax.Array, radius,
                     max_nn: int = 30, row_tile: int = 1024) -> jax.Array:
    """Per-point unit normals from the neighborhood covariance.

    Sign convention: Open3D leaves tangent-plane normal signs arbitrary; we
    orient towards the origin (-p direction, i.e. towards a camera at the
    world origin) for determinism, falling back to +z for points at origin.
    Degenerate neighborhoods (< 3 points) produce (0, 0, 1).
    """
    idx, ok = knn_hybrid(points, mask, radius, k=max_nn, row_tile=row_tile)
    nbrs = points[idx]                                       # (N, k, 3)
    w = ok.astype(jnp.float32)[..., None]
    count = jnp.maximum(jnp.sum(w, axis=1), 1.0)             # (N, 1)
    mean = jnp.sum(nbrs * w, axis=1) / count
    centered = (nbrs - mean[:, None, :]) * w
    cov = jnp.einsum("nki,nkj->nij", centered, centered,
                     precision=jax.lax.Precision.HIGHEST) / count[..., None]
    from .eigen3 import eigh3x3  # analytic: N tiny eighs are slow via LAPACK path
    _, vecs = eigh3x3(cov)                                   # ascending
    normal = vecs[..., 0]                                    # smallest eigval

    degenerate = jnp.sum(ok, axis=1) < 3
    normal = jnp.where(degenerate[:, None],
                       jnp.array([0.0, 0.0, 1.0]), normal)

    # orient towards origin; ties (p ~ 0) keep the eigh sign
    flip = jnp.sum(normal * points, axis=-1) > 0
    normal = jnp.where(flip[:, None], -normal, normal)
    norm = jnp.linalg.norm(normal, axis=-1, keepdims=True)
    return normal / jnp.maximum(norm, 1e-12)
