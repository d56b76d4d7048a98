"""Feature-matching RANSAC for coarse registration, replacing Open3D C++
`registration_ransac_based_on_feature_matching`
(reference `utils/fpfh_register.py:110-119`: mutual_filter=True, point-to-point
estimation over ransac_n=3 samples, edge-length checker 0.9, distance checker
at the RANSAC distance threshold).

TPU-native design: instead of Open3D's sequential 4M-iteration loop with
early-exit confidence, we draw a fixed batch of hypotheses and evaluate them
ALL in parallel:

  1. correspondences = nearest neighbor in 33-dim FPFH space (one matmul),
     optionally mutual-filtered;
  2. each hypothesis samples 3 correspondences (vmapped Kabsch on 3 pairs);
  3. cheap checkers (edge-length ratio, post-transform distance) mask bad
     hypotheses before scoring;
  4. score = inlier count over the correspondence set (one batched matmul) —
     Open3D's fitness over correspondences;
  5. best hypothesis by (fitness, then rmse).

A few thousand parallel hypotheses match the effective sample diversity of
Open3D's early-exiting millions for these object-sized clouds.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .distance import masked_nearest
from .kabsch import kabsch_transform, apply_transform


@partial(jax.jit, static_argnames=("mutual",))
def feature_correspondences(feat_src: jax.Array, mask_src: jax.Array,
                            feat_tgt: jax.Array, mask_tgt: jax.Array,
                            mutual: bool = True):
    """(idx_tgt (N,), valid (N,)): for each source point its nearest target in
    feature space; with mutual filtering only pairs that are mutual NNs."""
    idx_st, _ = masked_nearest(feat_src, feat_tgt, mask_tgt)
    valid = mask_src
    if mutual:
        idx_ts, _ = masked_nearest(feat_tgt, feat_src, mask_src)
        valid = valid & (idx_ts[idx_st] == jnp.arange(feat_src.shape[0]))
    return idx_st, valid


@partial(jax.jit, static_argnames=("num_hypotheses", "ransac_n"))
def ransac_registration(src_pts: jax.Array, src_mask: jax.Array,
                        tgt_pts: jax.Array,
                        corr_idx: jax.Array, corr_valid: jax.Array,
                        distance_threshold,
                        key: jax.Array,
                        num_hypotheses: int = 4096,
                        ransac_n: int = 3,
                        edge_length_ratio: float = 0.9):
    """Returns (T (4,4), fitness, inlier_rmse) over the correspondence set."""
    n = src_pts.shape[0]
    thr2 = jnp.float32(distance_threshold) ** 2

    # sample correspondence indices proportional to validity
    probs = corr_valid.astype(jnp.float32)
    probs = probs / jnp.maximum(probs.sum(), 1.0)
    samples = jax.random.choice(key, n, shape=(num_hypotheses, ransac_n), p=probs)

    s = src_pts[samples]                       # (H, 3, 3)
    t = tgt_pts[corr_idx[samples]]             # (H, 3, 3)

    # edge-length checker (both directions), Open3D similarity 0.9
    def edge_ok(a, b):
        ea = jnp.linalg.norm(a - jnp.roll(a, 1, axis=0), axis=-1)
        eb = jnp.linalg.norm(b - jnp.roll(b, 1, axis=0), axis=-1)
        lo = jnp.minimum(ea, eb)
        hi = jnp.maximum(ea, eb)
        return jnp.all((lo > edge_length_ratio * hi) & (hi > 1e-9))

    edges_valid = jax.vmap(edge_ok)(s, t)
    sample_valid = jnp.all(corr_valid[samples], axis=1) & edges_valid

    transforms = jax.vmap(kabsch_transform)(s, t)                 # (H, 4, 4)

    # distance checker on the sampled pairs themselves
    s_tf = jax.vmap(apply_transform)(s, transforms)
    pair_ok = jnp.all(jnp.sum((s_tf - t) ** 2, axis=-1) <= thr2, axis=1)
    sample_valid = sample_valid & pair_ok

    # score over the full correspondence set
    corr_src = src_pts                                            # (N, 3)
    corr_tgt = tgt_pts[corr_idx]                                  # (N, 3)

    def score(T, ok):
        d2 = jnp.sum((apply_transform(corr_src, T) - corr_tgt) ** 2, axis=-1)
        inlier = (d2 <= thr2) & corr_valid
        count = jnp.sum(inlier.astype(jnp.float32))
        rmse = jnp.sqrt(jnp.sum(jnp.where(inlier, d2, 0.0)) / jnp.maximum(count, 1.0))
        count = jnp.where(ok, count, -1.0)
        return count, rmse

    counts, rmses = jax.vmap(score)(transforms, sample_valid)
    # maximize count; tie-break on rmse
    best = jnp.argmax(counts - rmses / (jnp.max(rmses) + 1.0))
    T = transforms[best]
    n_corr = jnp.maximum(jnp.sum(corr_valid.astype(jnp.float32)), 1.0)
    fitness = jnp.maximum(counts[best], 0.0) / n_corr
    # identity fallback if nothing valid
    none_valid = jnp.max(counts) < 0
    T = jnp.where(none_valid, jnp.eye(4, dtype=T.dtype), T)
    return T, fitness, rmses[best]
