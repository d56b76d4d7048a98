"""Fast Point Feature Histograms (33-dim), replacing Open3D C++
`compute_fpfh_feature` (reference `utils/fpfh_register.py:94-97`,
KDTreeSearchParamHybrid(radius = 5 * voxel, max_nn = 100)).

Implements Rusu's FPFH with the PCL/Open3D conventions:

* pair features over the hybrid neighborhood (radius AND max_nn):
  with d = p_t - p_s, swap (s, t) if |n_s . d| < |n_t . d| (PCL's rule so the
  "source" normal makes the smaller angle with the connecting line);
  u = n_s, v = unit(d x u), w = u x v,
  f1 = v . n_t  in [-1, 1]
  f3 = u . d/|d| in [-1, 1]
  f4 = atan2(w . n_t, u . n_t) in [-pi, pi]
* SPFH: each of f1/f3/f4 binned into 11 bins, weight 100/(k-1), concatenated
  to 33 dims.
* FPFH(p) = SPFH(p) + (1/k) sum_q SPFH(q) / ||p - q||, then each point's
  33-vector renormalized blockwise to sum 100 per 11-bin block is Open3D's
  *pairwise* normalization; we normalize the full histogram to sum 100
  (documented simplification — downstream use is nearest-neighbor matching,
  which is invariant to any fixed global scaling).

Everything is one fused jitted kernel over (N, k) neighbor arrays — no
per-point host loops.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .normals import knn_hybrid

FPFH_BINS = 11
FPFH_DIM = 3 * FPFH_BINS

# Opt-in bf16 for the (N, k, bins) one-hot/gather tensors — the largest
# HBM traffic in the FPFH stage (trace: the six (N*k, 33) broadcast fusions,
# PERF.md). Histogram increments are ~100/(k-1) and FPFH only seeds the
# RANSAC coarse basin, so the ~0.4% bf16 relative error is far below the
# matching noise floor; accumulations stay f32.
import os
FPFH_BF16 = bool(int(os.environ.get("IBL_FPFH_BF16", "0")))


def _pair_features(p_s, n_s, p_t, n_t):
    """PCL pair features (f1, f3, f4) for source/target points+normals.
    Inputs are broadcastable (..., 3)."""
    d = p_t - p_s
    dist = jnp.linalg.norm(d, axis=-1, keepdims=True)
    dsafe = jnp.where(dist > 1e-12, d / jnp.maximum(dist, 1e-12), 0.0)

    # swap rule: source should have the smaller angle to the line
    a_s = jnp.abs(jnp.sum(n_s * dsafe, axis=-1))
    a_t = jnp.abs(jnp.sum(n_t * dsafe, axis=-1))
    swap = a_s < a_t
    u = jnp.where(swap[..., None], n_t, n_s)
    nt = jnp.where(swap[..., None], n_s, n_t)
    dd = jnp.where(swap[..., None], -dsafe, dsafe)

    v = jnp.cross(dd, u)
    vnorm = jnp.linalg.norm(v, axis=-1, keepdims=True)
    v = v / jnp.maximum(vnorm, 1e-12)
    w = jnp.cross(u, v)

    f1 = jnp.sum(v * nt, axis=-1)
    f3 = jnp.sum(u * dd, axis=-1)
    f4 = jnp.arctan2(jnp.sum(w * nt, axis=-1), jnp.sum(u * nt, axis=-1))
    return f1, f3, f4, dist[..., 0]


def _bin_index(value, lo, hi):
    idx = jnp.floor(FPFH_BINS * (value - lo) / (hi - lo)).astype(jnp.int32)
    return jnp.clip(idx, 0, FPFH_BINS - 1)


@partial(jax.jit, static_argnames=("max_nn", "row_tile"))
def compute_fpfh(points: jax.Array, normals: jax.Array, mask: jax.Array,
                 radius, max_nn: int = 100, row_tile: int = 1024) -> jax.Array:
    """(N, 33) FPFH features; invalid points get zero vectors."""
    n = points.shape[0]
    idx, ok = knn_hybrid(points, mask, radius, k=max_nn, row_tile=row_tile)

    # exclude self-pairs (distance 0)
    self_pair = idx == jnp.arange(n, dtype=jnp.int32)[:, None]
    ok = ok & ~self_pair

    p_s = points[:, None, :]                      # (N, 1, 3)
    n_s = normals[:, None, :]
    p_t = points[idx]                             # (N, k, 3)
    n_t = normals[idx]
    f1, f3, f4, dist = _pair_features(p_s, n_s, p_t, n_t)

    b1 = _bin_index(f1, -1.0, 1.0)
    b3 = _bin_index(f3, -1.0, 1.0)
    b4 = _bin_index(f4, -jnp.pi, jnp.pi)

    k_valid = jnp.sum(ok.astype(jnp.float32), axis=1)            # (N,)
    incr = jnp.where(k_valid > 0, 100.0 / jnp.maximum(k_valid, 1.0), 0.0)

    hdt = jnp.bfloat16 if FPFH_BF16 else jnp.float32
    w = (ok.astype(jnp.float32) * incr[:, None]).astype(hdt)     # (N, k)
    oh1 = jax.nn.one_hot(b1, FPFH_BINS, dtype=hdt) * w[..., None]
    oh3 = jax.nn.one_hot(b3, FPFH_BINS, dtype=hdt) * w[..., None]
    oh4 = jax.nn.one_hot(b4, FPFH_BINS, dtype=hdt) * w[..., None]
    spfh = jnp.concatenate([oh1.sum(1, dtype=jnp.float32),
                            oh3.sum(1, dtype=jnp.float32),
                            oh4.sum(1, dtype=jnp.float32)], axis=-1)  # (N, 33)

    # FPFH aggregation: spfh(p) + (1/k) sum_q spfh(q) / dist(p, q)
    inv_d = jnp.where(ok & (dist > 1e-12), 1.0 / jnp.maximum(dist, 1e-12), 0.0)
    neigh = spfh.astype(hdt)[idx]                                # (N, k, 33)
    agg = jnp.einsum("nk,nkf->nf", inv_d.astype(hdt), neigh,
                     precision=(None if FPFH_BF16
                                else jax.lax.Precision.HIGHEST),
                     preferred_element_type=jnp.float32)
    fpfh = spfh + agg / jnp.maximum(k_valid, 1.0)[:, None]

    # normalize to sum 100 (scale-invariant for NN matching)
    total = jnp.sum(fpfh, axis=-1, keepdims=True)
    fpfh = jnp.where(total > 1e-12, 100.0 * fpfh / jnp.maximum(total, 1e-12), 0.0)
    return jnp.where(mask[:, None], fpfh, 0.0)
