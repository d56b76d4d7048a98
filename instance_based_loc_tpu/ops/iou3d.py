"""3D IoU ops: axis-aligned IoU / strict overlap, PCA oriented boxes, and an
exact oriented-box IoU via halfspace clipping.

Replaces reference `utils/IoU_ops.py`:
* `calculate_3d_IoU` / `calculate_strict_overlap` (AABB, :9-95) -> masked jnp.
* `calculate_obj_aligned_3d_IoU` (:97-145), which fits Open3D OBBs and runs
  the Objectron polytope IoU -> here a PCA OBB fit (eigh of the covariance;
  Open3D uses PCA of the convex hull — a documented, benign deviation) and a
  Sutherland–Hodgman box-box intersection volume computed with fixed-size
  padded polygon buffers, so the whole O(N^2) reclustering IoU matrix
  (reference `object_memory.py:710-747`) becomes ONE vmapped device call
  instead of a nested Python loop over Objectron.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .pointcloud import masked_mean

_MAX_POLY_VERTS = 16  # a quad clipped by 6 planes has at most 10 verts


# --------------------------------------------------------------------------- #
# axis-aligned (reference IoU_ops.py:9-95)
# --------------------------------------------------------------------------- #
def _masked_bounds(points, mask):
    big = jnp.float32(1e30)
    m = mask[:, None]
    mn = jnp.min(jnp.where(m, points, big), axis=0)
    mx = jnp.max(jnp.where(m, points, -big), axis=0)
    return mn, mx


@jax.jit
def aabb_iou(points1, mask1, points2, mask2):
    mn1, mx1 = _masked_bounds(points1, mask1)
    mn2, mx2 = _masked_bounds(points2, mask2)
    omn = jnp.maximum(mn1, mn2)
    omx = jnp.minimum(mx1, mx2)
    overlap = jnp.where(jnp.any(omn > omx), 0.0, jnp.prod(omx - omn))
    v1 = jnp.prod(mx1 - mn1)
    v2 = jnp.prod(mx2 - mn2)
    denom = v1 + v2 - overlap
    iou = jnp.where(denom > 0, overlap / denom, 0.0)
    empty = (jnp.sum(mask1) == 0) | (jnp.sum(mask2) == 0)
    return jnp.where(empty, 0.0, iou)


@jax.jit
def strict_overlap(points1, mask1, points2, mask2):
    mn1, mx1 = _masked_bounds(points1, mask1)
    mn2, mx2 = _masked_bounds(points2, mask2)
    omn = jnp.maximum(mn1, mn2)
    omx = jnp.minimum(mx1, mx2)
    overlap = jnp.where(jnp.any(omn > omx), 0.0, jnp.prod(omx - omn))
    v1 = jnp.prod(mx1 - mn1)
    v2 = jnp.prod(mx2 - mn2)
    denom = jnp.minimum(v1, v2)
    ov = jnp.where(denom > 0, overlap / denom, 0.0)
    empty = (jnp.sum(mask1) == 0) | (jnp.sum(mask2) == 0)
    return jnp.where(empty, 0.0, ov)


# --------------------------------------------------------------------------- #
# PCA oriented bounding box
# --------------------------------------------------------------------------- #
def pca_obb(points: jax.Array, mask: jax.Array):
    """Fit an oriented box: returns (center(3,), rot(3,3) columns=axes,
    extents(3,) full side lengths). Degenerate inputs give zero extents."""
    mu = masked_mean(points, mask)
    centered = (points - mu) * mask[:, None]
    n = jnp.maximum(jnp.sum(mask.astype(jnp.float32)), 1.0)
    cov = jnp.matmul(centered.T, centered, precision=jax.lax.Precision.HIGHEST) / n
    from .eigen3 import eigh3x3
    _, vecs = eigh3x3(cov)  # columns = axes, ascending eigenvalue
    # eigh may return a left-handed basis; a mirrored frame flips face
    # orientations downstream (negative clipped volumes), so fix the sign.
    det = jnp.linalg.det(vecs)
    vecs = vecs.at[:, 2].multiply(jnp.where(det < 0, -1.0, 1.0))
    proj = jnp.matmul(points - mu, vecs, precision=jax.lax.Precision.HIGHEST)
    big = jnp.float32(1e30)
    pm = mask[:, None]
    lo = jnp.min(jnp.where(pm, proj, big), axis=0)
    hi = jnp.max(jnp.where(pm, proj, -big), axis=0)
    center = mu + vecs @ ((lo + hi) / 2.0)
    extents = jnp.maximum(hi - lo, 0.0)
    return center, vecs, extents


def obb_volume(extents):
    return jnp.prod(extents)


# --------------------------------------------------------------------------- #
# oriented box-box intersection volume (Sutherland–Hodgman, fixed buffers)
# --------------------------------------------------------------------------- #
# Unit-box face quads (outward CCW) in the box's local frame, coords in
# {-0.5, +0.5}. Faces: +x, -x, +y, -y, +z, -z.
_FACE_QUADS = jnp.array([
    [[+.5, -.5, -.5], [+.5, +.5, -.5], [+.5, +.5, +.5], [+.5, -.5, +.5]],
    [[-.5, -.5, -.5], [-.5, -.5, +.5], [-.5, +.5, +.5], [-.5, +.5, -.5]],
    [[-.5, +.5, -.5], [-.5, +.5, +.5], [+.5, +.5, +.5], [+.5, +.5, -.5]],
    [[-.5, -.5, -.5], [+.5, -.5, -.5], [+.5, -.5, +.5], [-.5, -.5, +.5]],
    [[-.5, -.5, +.5], [+.5, -.5, +.5], [+.5, +.5, +.5], [-.5, +.5, +.5]],
    [[-.5, -.5, -.5], [-.5, +.5, -.5], [+.5, +.5, -.5], [+.5, -.5, -.5]],
], dtype=jnp.float32)  # (6, 4, 3)


def _box_faces_world(center, rot, extents):
    """(6, 4, 3) world-space face quads, outward CCW."""
    local = _FACE_QUADS * extents[None, None, :]
    return jnp.matmul(local, rot.T, precision=jax.lax.Precision.HIGHEST) + center[None, None, :]


def _box_halfspaces(center, rot, extents):
    """(6,) halfspaces n.x <= d covering the box interior."""
    axes = rot.T  # rows = axes
    normals = jnp.concatenate([axes, -axes], axis=0)  # (6,3)
    half = extents / 2.0
    d = jnp.concatenate([axes @ center + half, -(axes @ center) + half])
    return normals, d


def _clip_polygon(verts, count, normal, d):
    """Clip a padded polygon (verts (V,3), valid count) by n.x <= d.

    Fully vectorized Sutherland–Hodgman: compute, for every edge in parallel,
    the two candidate emissions (current vertex if inside; crossing point if
    the edge crosses), then compact them with a prefix-sum scatter. No scalar
    fori_loop / cond chains — those made XLA compile times explode (~5 min for
    one obb_iou on TPU); this version compiles in seconds.
    """
    v_max = verts.shape[0]
    eps = 1e-7

    idx = jnp.arange(v_max)
    valid = idx < count
    nxt_idx = jnp.where(idx + 1 >= count, 0, idx + 1)
    cur = verts
    nxt = verts[nxt_idx]

    s_cur = cur @ normal
    s_nxt = nxt @ normal
    cur_in = s_cur <= d + eps
    nxt_in = s_nxt <= d + eps
    denom = s_nxt - s_cur
    t = jnp.where(jnp.abs(denom) > eps, (d - s_cur) / denom, 0.0)
    inter = cur + jnp.clip(t, 0.0, 1.0)[:, None] * (nxt - cur)

    emit_cur = valid & cur_in                 # first emission per edge
    emit_int = valid & (cur_in != nxt_in)     # second emission per edge

    # Interleave candidates [cur_0, int_0, cur_1, int_1, ...] with flags,
    # then stable-compact the flagged rows to the front.
    cand = jnp.stack([cur, inter], axis=1).reshape(2 * v_max, 3)
    flags = jnp.stack([emit_cur, emit_int], axis=1).reshape(2 * v_max)
    pos = jnp.cumsum(flags.astype(jnp.int32)) - 1          # target slot
    target = jnp.where(flags, pos, 2 * v_max - 1)          # dump rejects at end
    out = jnp.zeros((2 * v_max, 3), verts.dtype)
    # Scatter; rejected rows all collide at the last slot which we then zero.
    out = out.at[target].set(cand, mode="drop")
    m = jnp.sum(flags.astype(jnp.int32))
    out = jnp.where((jnp.arange(2 * v_max) < m)[:, None], out, 0.0)
    return out[:v_max], jnp.minimum(m, v_max)


def _clipped_face_volume_contrib(quad, normals, ds):
    """Clip one face quad by 6 halfspaces; return its signed-volume
    contribution (sum of origin-tetrahedra over the fan triangulation)."""
    verts = jnp.zeros((_MAX_POLY_VERTS, 3), quad.dtype).at[:4].set(quad)
    count = jnp.int32(4)

    for k in range(normals.shape[0]):  # static 6 planes — unroll for fusion
        verts, count = _clip_polygon(verts, count, normals[k], ds[k])

    idx = jnp.arange(_MAX_POLY_VERTS)
    tri_valid = (idx >= 1) & (idx + 1 < count)
    v0 = verts[0]
    a = verts
    b = jnp.roll(verts, -1, axis=0)
    dets = jnp.einsum("i,ni->n", v0, jnp.cross(a, b))
    return jnp.sum(jnp.where(tri_valid, dets, 0.0)) / 6.0


@jax.jit
def box_intersection_volume(center1, rot1, ext1, center2, rot2, ext2):
    """Exact intersection volume of two oriented boxes.

    The boundary of A∩B is (∂A ∩ B) ∪ (∂B ∩ A); where ∂A and ∂B coincide
    (identical boxes, touching axis-aligned boxes) the piece must be counted
    once. We keep coincident pieces on A's side by clipping A's faces with a
    slightly *enlarged* B and B's faces with a slightly *shrunk* A.
    """
    scale = jnp.maximum(jnp.max(ext1), jnp.max(ext2)) + 1.0
    eps = 1e-5 * scale
    faces1 = _box_faces_world(center1, rot1, ext1)
    faces2 = _box_faces_world(center2, rot2, ext2)
    n1, d1 = _box_halfspaces(center1, rot1, ext1)
    n2, d2 = _box_halfspaces(center2, rot2, ext2)
    contrib_a = jax.vmap(lambda q: _clipped_face_volume_contrib(q, n2, d2 + eps))(faces1)
    contrib_b = jax.vmap(lambda q: _clipped_face_volume_contrib(q, n1, d1 - eps))(faces2)
    vol = jnp.sum(contrib_a) + jnp.sum(contrib_b)
    return jnp.maximum(vol, 0.0)


@jax.jit
def obb_iou(points1, mask1, points2, mask2):
    """Object-aligned 3D IoU between two point clouds — the TPU-native
    equivalent of reference `calculate_obj_aligned_3d_IoU` (IoU_ops.py:97-145)."""
    c1, r1, e1 = pca_obb(points1, mask1)
    c2, r2, e2 = pca_obb(points2, mask2)
    inter = box_intersection_volume(c1, r1, e1, c2, r2, e2)
    v1 = obb_volume(e1)
    v2 = obb_volume(e2)
    denom = v1 + v2 - inter
    iou = jnp.where(denom > 1e-12, inter / denom, 0.0)
    empty = (jnp.sum(mask1) < 4) | (jnp.sum(mask2) < 4)
    return jnp.where(empty, 0.0, jnp.clip(iou, 0.0, 1.0))


_PAIR_BLOCK = 2048


@partial(jax.jit, static_argnames=("pair_block",))
def _pairwise_obb_iou_blocked(points, masks, ii, jj, pair_block: int):
    """Upper-triangle IoUs over a padded pair list, processed in fixed
    `pair_block`-sized device programs via lax.map. Every program has the
    SAME shape regardless of K — this is the r4 fix for the r3 TPU worker
    kernel fault: the previous row-major tiling vmapped the clip kernel
    over all K columns per row, so per-program size grew with K and
    reproducibly crashed the v5e worker at K >= ~800. Fixed blocks keep
    the clip state at O(pair_block) forever."""
    centers, rots, exts = jax.vmap(pca_obb)(points, masks)
    vols = jax.vmap(obb_volume)(exts)
    valid = jnp.sum(masks, axis=1) >= 4

    def pair(i, j):
        inter = box_intersection_volume(centers[i], rots[i], exts[i],
                                        centers[j], rots[j], exts[j])
        denom = vols[i] + vols[j] - inter
        iou = jnp.where(denom > 1e-12, inter / denom, 0.0)
        return jnp.where(valid[i] & valid[j], jnp.clip(iou, 0.0, 1.0), 0.0)

    def block(idx):
        bi, bj = idx
        return jax.vmap(pair)(bi, bj)

    n_blocks = ii.shape[0] // pair_block
    flat = jax.lax.map(block, (ii.reshape(n_blocks, pair_block),
                               jj.reshape(n_blocks, pair_block)))
    return flat.reshape(-1), valid


def pairwise_obb_iou(points: jax.Array, masks: jax.Array,
                     pair_block: int = _PAIR_BLOCK) -> jax.Array:
    """(K, K) IoU matrix over K padded clouds (points (K,N,3), masks (K,N)).
    Fits each OBB once, then runs the clip kernel over the K(K-1)/2 unique
    pairs in fixed-size blocks — replaces the reference's nested Python loop
    over Objectron (object_memory.py:710-722) and stays on-device at any K
    (r3's host fallback for K >= 800 is retired; see
    `_pairwise_obb_iou_blocked` for the kernel-fault history)."""
    import numpy as np
    k = points.shape[0]
    if k < 2:
        return jnp.zeros((k, k), jnp.float32)
    iu, ju = np.triu_indices(k, 1)
    n_pairs = len(iu)
    block = min(pair_block, max(256, n_pairs))
    pad = (-n_pairs) % block
    ii = jnp.asarray(np.concatenate([iu, np.zeros(pad)]).astype(np.int32))
    jj = jnp.asarray(np.concatenate([ju, np.zeros(pad)]).astype(np.int32))
    flat, valid = _pairwise_obb_iou_blocked(points, masks, ii, jj, block)
    flat = flat[:n_pairs]
    mat = jnp.zeros((k, k), flat.dtype).at[iu, ju].set(flat)
    mat = mat + mat.T
    # diagonal: a valid box has IoU 1 with itself (degenerate clouds 0)
    return mat + jnp.diag(jnp.where(valid, 1.0, 0.0))
