"""The full coarse-to-fine registration pipeline, mirroring reference
`utils/fpfh_register.py:86-150`:

    register_point_clouds(source, target, voxel_size,
                          global_dist_factor=1.5, local_dist_factor=0.4)
      -> normals(2*voxel, nn30) -> FPFH(5*voxel, nn100)
      -> feature-matching RANSAC (threshold = voxel*global_dist_factor)
      -> colored-ICP refine     (threshold = voxel*local_dist_factor)
      -> (transform, inlier_rmse, fitness)

plus `evaluate_transform(source, target, T, threshold=0.02)`.

Note the reference's `downsample_and_compute_fpfh` never actually voxel-
downsamples despite its name (fpfh_register.py:88 deep-copies); we match that
behavior — voxel_size only sets the search radii and thresholds.

The whole pipeline is one jitted call per (source_cap, target_cap) shape
bucket; clouds are padded to power-of-two capacities by the host wrapper.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .pointcloud import PointCloud, round_up_pow2
from .normals import estimate_normals
from .fpfh import compute_fpfh
from .ransac import feature_correspondences, ransac_registration
from .icp import icp, evaluate_transform_arrays


@partial(jax.jit, static_argnames=("num_hypotheses", "icp_iterations"))
def _register_impl(src_pts, src_cols, src_mask,
                   tgt_pts, tgt_cols, tgt_mask,
                   voxel_size, global_dist_factor, local_dist_factor,
                   key,
                   num_hypotheses: int = 4096,
                   icp_iterations: int = 30):
    radius_normal = voxel_size * 2.0
    radius_feature = voxel_size * 5.0
    distance_threshold = voxel_size * global_dist_factor

    src_n = estimate_normals(src_pts, src_mask, radius_normal, max_nn=30)
    tgt_n = estimate_normals(tgt_pts, tgt_mask, radius_normal, max_nn=30)
    src_f = compute_fpfh(src_pts, src_n, src_mask, radius_feature, max_nn=100)
    tgt_f = compute_fpfh(tgt_pts, tgt_n, tgt_mask, radius_feature, max_nn=100)

    corr_idx, corr_valid = feature_correspondences(src_f, src_mask, tgt_f, tgt_mask,
                                                   mutual=True)
    T_ransac, _, _ = ransac_registration(
        src_pts, src_mask, tgt_pts, corr_idx, corr_valid,
        distance_threshold, key, num_hypotheses=num_hypotheses)

    T, fitness, rmse = icp(
        src_pts, src_mask, tgt_pts, tgt_mask,
        voxel_size * local_dist_factor,
        init_transform=T_ransac,
        src_colors=src_cols, tgt_colors=tgt_cols,
        max_iterations=icp_iterations, use_colors=True)
    return T, rmse, fitness


def register_point_clouds(source: PointCloud, target: PointCloud,
                          voxel_size: float,
                          global_dist_factor: float = 1.5,
                          local_dist_factor: float = 0.4,
                          seed: int = 0,
                          num_hypotheses: int = 4096,
                          icp_iterations: int = 30):
    """Reference `register_point_clouds` (fpfh_register.py:100-143).
    Returns (transform (4,4) np, inlier_rmse float, fitness float)."""
    key = jax.random.PRNGKey(seed)
    T, rmse, fitness = _register_impl(
        source.points, source.colors, source.mask,
        target.points, target.colors, target.mask,
        jnp.float32(voxel_size), jnp.float32(global_dist_factor),
        jnp.float32(local_dist_factor), key,
        num_hypotheses=num_hypotheses, icp_iterations=icp_iterations)
    return np.asarray(T), float(rmse), float(fitness)


@partial(jax.jit, static_argnames=("icp_iterations",))
def _refine_impl(src_pts, src_cols, src_mask, tgt_pts, tgt_cols, tgt_mask,
                 init_T, coarse_dist, fine_dist, icp_iterations: int = 30):
    """Multi-scale ICP from a given init: coarse correspondence distance to
    pull into the basin, then fine distance to polish."""
    T, _, _ = icp(src_pts, src_mask, tgt_pts, tgt_mask, coarse_dist,
                  init_transform=init_T, src_colors=src_cols, tgt_colors=tgt_cols,
                  max_iterations=icp_iterations, use_colors=True)
    T, fitness, rmse = icp(src_pts, src_mask, tgt_pts, tgt_mask, fine_dist,
                           init_transform=T, src_colors=src_cols,
                           tgt_colors=tgt_cols,
                           max_iterations=icp_iterations, use_colors=True)
    return T, rmse, fitness


def refine_registration(source: PointCloud, target: PointCloud,
                        init_transform, voxel_size: float,
                        local_dist_factor: float = 0.4,
                        coarse_factor: float = 4.0,
                        icp_iterations: int = 30):
    """ICP-only registration from an external coarse init (e.g. the
    assignment-centroid Kabsch init used by ObjectMemory.localise — a
    correspondence-free coarse alignment the FPFH path can't provide on
    feature-poor geometry). Returns (transform, inlier_rmse, fitness) with
    fitness/rmse at voxel_size * local_dist_factor, like register_point_clouds."""
    T, rmse, fitness = _refine_impl(
        source.points, source.colors, source.mask,
        target.points, target.colors, target.mask,
        jnp.asarray(init_transform, jnp.float32),
        jnp.float32(voxel_size * coarse_factor),
        jnp.float32(voxel_size * local_dist_factor),
        icp_iterations=icp_iterations)
    return np.asarray(T), float(rmse), float(fitness)


def evaluate_transform(source: PointCloud, target: PointCloud,
                       trans_init, threshold: float = 0.02):
    """Reference `evaluate_transform` (fpfh_register.py:145-150):
    returns (inlier_rmse, fitness)."""
    rmse, fitness = evaluate_transform_arrays(
        source.points, source.mask, target.points, target.mask,
        jnp.asarray(trans_init, jnp.float32), jnp.float32(threshold))
    return float(rmse), float(fitness)


@partial(jax.jit, static_argnames=("num_hypotheses", "icp_iterations"))
def _register_assignments_impl(src_pts, src_cols, src_mask,
                               tgt_pts, tgt_cols, tgt_mask,
                               init_T, has_init,
                               det_means, mem_means,
                               eval_src_pts, eval_src_mask,
                               eval_tgt_pts, eval_tgt_mask,
                               voxel_size, global_dist_factor,
                               local_dist_factor, key,
                               num_hypotheses: int = 4096,
                               icp_iterations: int = 30):
    """ALL of a localisation query's assignment registrations in ONE compiled
    program (the serial per-assignment loop costs a device dispatch + compile
    cache hit each — at ~250 ms per assignment that capped the pipeline at
    <1 fps; batched, the A assignments vmap across the chip).

    Per assignment a (leading axis A):
      cand1 = FPFH + RANSAC + colored ICP   (the reference path)
      cand2 = multi-scale ICP from the centroid-Kabsch init (if has_init[a])
      T[a]  = better-fitness candidate
      full fitness/rmse of the composed global transform vs the full clouds.
    """
    a = src_pts.shape[0]
    keys = jax.random.split(key, a)

    def one(sp, sc, sm, tp, tc, tm, iT, hi, dmean, mmean, k):
        t1, r1, f1 = _register_impl(sp, sc, sm, tp, tc, tm,
                                    voxel_size, global_dist_factor,
                                    local_dist_factor, k,
                                    num_hypotheses=num_hypotheses,
                                    icp_iterations=icp_iterations)
        t2, r2, f2 = _refine_impl(sp, sc, sm, tp, tc, tm, iT,
                                  voxel_size * 4.0,
                                  voxel_size * local_dist_factor,
                                  icp_iterations=icp_iterations)
        f2 = jnp.where(hi, f2, -1.0)
        use2 = f2 > f1
        T = jnp.where(use2, t2, t1)
        rmse = jnp.where(use2, r2, r1)
        fitness = jnp.where(use2, f2, f1)

        # compose the global-frame transform (mean-centering accounted)
        R = T[:3, :3]
        tx = T[:3, 3]
        gT = jnp.eye(4).at[:3, :3].set(R).at[:3, 3].set(
            tx + mmean - R @ dmean)
        full_rmse, full_fitness = evaluate_transform_arrays(
            eval_src_pts, eval_src_mask, eval_tgt_pts, eval_tgt_mask,
            gT, 0.02)
        return T, rmse, fitness, full_rmse, full_fitness

    return jax.vmap(one, in_axes=(0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0))(
        src_pts, src_cols, src_mask, tgt_pts, tgt_cols, tgt_mask,
        init_T, has_init, det_means, mem_means, keys)


def register_assignments_batched(src: PointCloud, tgt: PointCloud,
                                 init_T: np.ndarray, has_init: np.ndarray,
                                 det_means: np.ndarray, mem_means: np.ndarray,
                                 eval_src: PointCloud, eval_tgt: PointCloud,
                                 voxel_size: float,
                                 global_dist_factor: float = 1.5,
                                 local_dist_factor: float = 0.4,
                                 seed: int = 0,
                                 num_hypotheses: int = 4096,
                                 icp_iterations: int = 30):
    """Host wrapper: src/tgt are BATCHED PointClouds with leading assignment
    axis A. Returns numpy (T (A,4,4), rmse, fitness, full_rmse, full_fitness)."""
    out = _register_assignments_impl(
        src.points, src.colors, src.mask,
        tgt.points, tgt.colors, tgt.mask,
        jnp.asarray(init_T, jnp.float32), jnp.asarray(has_init),
        jnp.asarray(det_means, jnp.float32), jnp.asarray(mem_means, jnp.float32),
        eval_src.points, eval_src.mask, eval_tgt.points, eval_tgt.mask,
        jnp.float32(voxel_size), jnp.float32(global_dist_factor),
        jnp.float32(local_dist_factor), jax.random.PRNGKey(seed),
        num_hypotheses=num_hypotheses, icp_iterations=icp_iterations)
    return tuple(np.asarray(x) for x in out)


def pad_for_registration(cloud: PointCloud, capacity: int | None = None) -> PointCloud:
    """Host-side: compact + pad to a power-of-two capacity so repeated
    registrations hit the jit cache."""
    pts, cols = cloud.to_numpy()
    cap = capacity or round_up_pow2(max(len(pts), 128))
    return PointCloud.from_numpy(pts, cols, capacity=cap)
