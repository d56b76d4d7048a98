"""Iterative Closest Point refinement, replacing Open3D C++
`registration_colored_icp` / `registration_icp` / `evaluate_registration`
(reference `utils/fpfh_register.py:132-150`).

TPU-native design: a fixed-iteration `lax.scan` (Open3D's default criteria is
30 iterations) where each step is

    nearest-neighbor matmul -> masked (optionally color-weighted) Kabsch

so the whole refinement compiles to one XLA program. The "colored" variant
follows the *intent* of Open3D's colored ICP (color disambiguates sliding
along geometrically-flat regions) by down-weighting correspondences with
mismatched colors inside the weighted Kabsch solve, rather than solving the
joint photometric-geometric Gauss-Newton system (documented deviation; the
fitness/rmse semantics that drive assignment selection are identical).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .distance import masked_nearest
from .kabsch import kabsch_transform, apply_transform

DEFAULT_ICP_ITERS = 30
COLOR_SIGMA = 0.25


@partial(jax.jit, static_argnames=("max_iterations", "use_colors",
                                   "early_exit"))
def icp(src_pts: jax.Array, src_mask: jax.Array,
        tgt_pts: jax.Array, tgt_mask: jax.Array,
        max_correspondence_distance,
        init_transform: jax.Array | None = None,
        src_colors: jax.Array | None = None,
        tgt_colors: jax.Array | None = None,
        max_iterations: int = DEFAULT_ICP_ITERS,
        use_colors: bool = False,
        early_exit: bool = False):
    """Returns (T (4,4), fitness, inlier_rmse).

    fitness / inlier_rmse follow Open3D semantics: computed over source points
    whose nearest target neighbor lies within `max_correspondence_distance`
    after the final transform; fitness = inliers / #valid source points.

    early_exit=True swaps the fixed-length scan for a while_loop with
    Open3D's ICPConvergenceCriteria (stop when BOTH the relative fitness and
    relative rmse change drop below 1e-6, Open3D's defaults) — same result
    on converged problems, fewer sequential iterations on device. Off by
    default: under vmap the loop runs until every lane converges, so the
    saving only materialises when most lanes converge early.
    """
    thr2 = jnp.float32(max_correspondence_distance) ** 2
    T0 = jnp.eye(4, dtype=jnp.float32) if init_transform is None else init_transform

    def correspond(T):
        moved = apply_transform(src_pts, T)
        nn_idx, nn_d2 = masked_nearest(moved, tgt_pts, tgt_mask)
        inlier = src_mask & (nn_d2 <= thr2)
        return nn_idx, nn_d2, inlier

    def solve(T, nn_idx, inlier):
        w = inlier.astype(jnp.float32)
        if use_colors and src_colors is not None and tgt_colors is not None:
            cd2 = jnp.sum((src_colors - tgt_colors[nn_idx]) ** 2, axis=-1)
            w = w * jnp.exp(-cd2 / (2.0 * COLOR_SIGMA ** 2))
        matched_tgt = tgt_pts[nn_idx]
        # solve on ORIGINAL source points for the full transform directly
        enough = jnp.sum(inlier) >= 3
        T_new = kabsch_transform(src_pts, matched_tgt, weights=w)
        return jnp.where(enough, T_new, T)

    def step(T, _):
        nn_idx, _, inlier = correspond(T)
        return solve(T, nn_idx, inlier), None

    if not early_exit:
        T, _ = jax.lax.scan(step, T0, None, length=max_iterations)
    else:
        def metrics(nn_d2, inlier):
            cnt = jnp.sum(inlier.astype(jnp.float32))
            rmse = jnp.sqrt(jnp.sum(jnp.where(inlier, nn_d2, 0.0))
                            / jnp.maximum(cnt, 1.0))
            fit = cnt / jnp.maximum(
                jnp.sum(src_mask.astype(jnp.float32)), 1.0)
            return fit, rmse

        def cond(state):
            _, i, fit, rmse, prev_fit, prev_rmse = state
            # Open3D ICPConvergenceCriteria compares the CHANGE against the
            # criteria values absolutely (relative_fitness / relative_rmse
            # both default 1e-6), not scaled by the current magnitude
            unconverged = ((jnp.abs(prev_fit - fit) > 1e-6)
                           | (jnp.abs(prev_rmse - rmse) > 1e-6))
            return (i < max_iterations) & (unconverged | (i < 2))

        def body(state):
            T, i, fit, rmse, _, _ = state
            nn_idx, nn_d2, inlier = correspond(T)
            new_fit, new_rmse = metrics(nn_d2, inlier)
            return (solve(T, nn_idx, inlier), i + 1,
                    new_fit, new_rmse, fit, rmse)

        state = (T0, jnp.int32(0), jnp.float32(0.0), jnp.float32(0.0),
                 jnp.float32(-1.0), jnp.float32(-1.0))
        T, *_ = jax.lax.while_loop(cond, body, state)

    rmse, fitness = evaluate_transform_arrays(
        src_pts, src_mask, tgt_pts, tgt_mask, T, max_correspondence_distance)
    return T, fitness, rmse


@partial(jax.jit, static_argnames=("use_colors",))
def icp_scheduled(src_pts: jax.Array, src_mask: jax.Array,
                  tgt_pts: jax.Array, tgt_mask: jax.Array,
                  thresholds: jax.Array,
                  init_transform: jax.Array | None = None,
                  src_colors: jax.Array | None = None,
                  tgt_colors: jax.Array | None = None,
                  use_colors: bool = False):
    """Multi-scale ICP as ONE scan: `thresholds` (T,) gives each iteration's
    max correspondence distance, so a coarse->fine schedule runs the exact
    same iteration sequence as consecutive `icp` calls while paying one
    loop's setup instead of two (the registration program's ICP loops are
    its largest sequential cost — PERF.md). Returns (T, fitness, rmse)
    evaluated at thresholds[-1]."""
    T0 = jnp.eye(4, dtype=jnp.float32) if init_transform is None else init_transform

    def step(T, thr):
        thr2 = thr * thr
        moved = apply_transform(src_pts, T)
        nn_idx, nn_d2 = masked_nearest(moved, tgt_pts, tgt_mask)
        inlier = src_mask & (nn_d2 <= thr2)
        w = inlier.astype(jnp.float32)
        if use_colors and src_colors is not None and tgt_colors is not None:
            cd2 = jnp.sum((src_colors - tgt_colors[nn_idx]) ** 2, axis=-1)
            w = w * jnp.exp(-cd2 / (2.0 * COLOR_SIGMA ** 2))
        T_new = kabsch_transform(src_pts, tgt_pts[nn_idx], weights=w)
        return jnp.where(jnp.sum(inlier) >= 3, T_new, T), None

    T, _ = jax.lax.scan(step, T0, thresholds)
    rmse, fitness = evaluate_transform_arrays(
        src_pts, src_mask, tgt_pts, tgt_mask, T, thresholds[-1])
    return T, fitness, rmse


@partial(jax.jit, static_argnames=("max_iterations",))
def semantic_icp(src_pts: jax.Array, src_labels: jax.Array, src_mask: jax.Array,
                 tgt_pts: jax.Array, tgt_labels: jax.Array, tgt_mask: jax.Array,
                 max_correspondence_distance,
                 init_transform: jax.Array | None = None,
                 max_iterations: int = DEFAULT_ICP_ITERS):
    """Label-constrained ICP: correspondences may only pair points with the
    SAME semantic label (e.g. the assignment's object index). The reference
    declares this path but never implements it (`perform_semantic_icp`
    raises NotImplementedError — object_memory.py:1039-1040); here it works:
    the label constraint enters as an additive penalty on the pairwise
    distance matrix, everything else matches `icp`.

    Returns (T (4,4), fitness, inlier_rmse).
    """
    from .distance import pairwise_sq_dists

    thr2 = jnp.float32(max_correspondence_distance) ** 2
    T0 = jnp.eye(4, dtype=jnp.float32) if init_transform is None else init_transform
    big = jnp.float32(1e30)

    def nearest_same_label(moved):
        d2 = pairwise_sq_dists(moved, tgt_pts)
        mismatch = src_labels[:, None] != tgt_labels[None, :]
        d2 = jnp.where(mismatch | ~tgt_mask[None, :], big, d2)
        idx = jnp.argmin(d2, axis=1)
        return idx, jnp.take_along_axis(d2, idx[:, None], axis=1)[:, 0]

    def step(T, _):
        moved = apply_transform(src_pts, T)
        nn_idx, nn_d2 = nearest_same_label(moved)
        inlier = src_mask & (nn_d2 <= thr2)
        w = inlier.astype(jnp.float32)
        T_new = kabsch_transform(src_pts, tgt_pts[nn_idx], weights=w)
        return jnp.where(jnp.sum(inlier) >= 3, T_new, T), None

    T, _ = jax.lax.scan(step, T0, None, length=max_iterations)
    moved = apply_transform(src_pts, T)
    _, nn_d2 = nearest_same_label(moved)
    inlier = src_mask & (nn_d2 <= thr2)
    count = jnp.sum(inlier.astype(jnp.float32))
    rmse = jnp.sqrt(jnp.sum(jnp.where(inlier, nn_d2, 0.0)) / jnp.maximum(count, 1.0))
    fitness = count / jnp.maximum(jnp.sum(src_mask.astype(jnp.float32)), 1.0)
    return T, fitness, rmse


@jax.jit
def evaluate_transform_arrays(src_pts, src_mask, tgt_pts, tgt_mask,
                              transform, threshold):
    """Open3D `evaluate_registration` (fpfh_register.py:145-150):
    returns (inlier_rmse, fitness)."""
    thr2 = jnp.float32(threshold) ** 2
    moved = apply_transform(src_pts, transform)
    _, nn_d2 = masked_nearest(moved, tgt_pts, tgt_mask)
    inlier = src_mask & (nn_d2 <= thr2)
    count = jnp.sum(inlier.astype(jnp.float32))
    n_src = jnp.maximum(jnp.sum(src_mask.astype(jnp.float32)), 1.0)
    rmse = jnp.sqrt(jnp.sum(jnp.where(inlier, nn_d2, 0.0)) / jnp.maximum(count, 1.0))
    fitness = count / n_src
    return rmse, fitness
