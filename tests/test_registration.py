"""Registration stack tests: normals, FPFH invariances, ICP, RANSAC, and the
full coarse-to-fine pipeline recovering known rigid transforms (SURVEY.md §7
stage 3 — 'the hardest numerics; validate transforms/fitness')."""

import numpy as np
import jax
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from instance_based_loc_tpu.ops.pointcloud import PointCloud
from instance_based_loc_tpu.ops.normals import estimate_normals, knn_hybrid
from instance_based_loc_tpu.ops.fpfh import compute_fpfh
from instance_based_loc_tpu.ops.icp import icp, evaluate_transform_arrays
from instance_based_loc_tpu.ops.ransac import feature_correspondences, ransac_registration
from instance_based_loc_tpu.ops.registration import (
    register_point_clouds, evaluate_transform, pad_for_registration)
from instance_based_loc_tpu.ops.kabsch import apply_transform


def sample_box_surface(rng, n=600, size=(1.0, 0.6, 0.4)):
    """Points on the surface of a box — distinctive geometry for FPFH."""
    size = np.asarray(size)
    face = rng.integers(0, 6, size=n)
    uv = rng.uniform(-0.5, 0.5, size=(n, 2))
    pts = np.zeros((n, 3))
    axis = face % 3
    sign = np.where(face < 3, 0.5, -0.5)
    for i in range(n):
        a = axis[i]
        others = [j for j in range(3) if j != a]
        pts[i, a] = sign[i] * size[a]
        pts[i, others[0]] = uv[i, 0] * size[others[0]]
        pts[i, others[1]] = uv[i, 1] * size[others[1]]
    return pts.astype(np.float32)


def rigid(rng=None, angle=0.8, t_scale=1.0):
    r = Rotation.from_euler("xyz", [0.3, -0.5, 0.7] if rng is None
                            else rng.uniform(-angle, angle, 3)).as_matrix()
    t = np.array([0.4, -0.2, 0.3]) if rng is None else rng.uniform(-t_scale, t_scale, 3)
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = r
    T[:3, 3] = t
    return T


# --------------------------------------------------------------------------- #
# normals
# --------------------------------------------------------------------------- #
def test_normals_on_plane(rng):
    pts = np.zeros((400, 3), np.float32)
    pts[:, :2] = rng.uniform(-1, 1, size=(400, 2))
    pts[:, 2] = 5.0  # plane z = 5 -> normal +-z; oriented towards origin => -z
    mask = np.ones(400, bool)
    normals = np.asarray(estimate_normals(jnp.asarray(pts), jnp.asarray(mask), 0.3))
    np.testing.assert_allclose(np.abs(normals[:, 2]), 1.0, atol=1e-4)
    assert (normals[:, 2] < 0).all()  # oriented towards origin


def test_knn_hybrid_radius_cut(rng):
    pts = np.array([[0, 0, 0], [0.1, 0, 0], [5, 5, 5]], np.float32)
    mask = np.ones(3, bool)
    idx, ok = knn_hybrid(jnp.asarray(pts), jnp.asarray(mask), radius=0.5, k=3,
                         row_tile=4)
    ok = np.asarray(ok)
    assert ok[0].sum() == 2  # self + near point, far point outside radius
    assert ok[2].sum() == 1  # only self


# --------------------------------------------------------------------------- #
# FPFH
# --------------------------------------------------------------------------- #
def test_fpfh_rotation_invariance(rng):
    pts = sample_box_surface(rng)
    mask = np.ones(len(pts), bool)
    radius = 0.5

    def fpfh_of(p):
        n = estimate_normals(jnp.asarray(p), jnp.asarray(mask), 0.25)
        return np.asarray(compute_fpfh(jnp.asarray(p), n, jnp.asarray(mask), radius))

    f1 = fpfh_of(pts)
    T = rigid()
    pts_r = (pts @ T[:3, :3].T).astype(np.float32)  # rotation only: normals
    # orientation flips can differ near the origin, so keep pure rotation
    f2 = fpfh_of(pts_r)
    # histograms should match point-for-point under rotation
    err = np.linalg.norm(f1 - f2, axis=1) / (np.linalg.norm(f1, axis=1) + 1e-6)
    assert np.median(err) < 0.15, f"median rel err {np.median(err)}"


def test_fpfh_distinguishes_corner_from_face(rng):
    pts = sample_box_surface(rng, n=800)
    mask = np.ones(len(pts), bool)
    n = estimate_normals(jnp.asarray(pts), jnp.asarray(mask), 0.25)
    f = np.asarray(compute_fpfh(jnp.asarray(pts), n, jnp.asarray(mask), 0.4))
    assert np.isfinite(f).all()
    assert (f.sum(1) > 0).all()
    # feature space has non-trivial structure (not all identical)
    assert np.std(f, axis=0).max() > 1.0


# --------------------------------------------------------------------------- #
# ICP
# --------------------------------------------------------------------------- #
def test_icp_refines_small_misalignment(rng):
    src = sample_box_surface(rng)
    T_true = np.eye(4, dtype=np.float32)
    T_true[:3, :3] = Rotation.from_euler("xyz", [0.05, -0.04, 0.06]).as_matrix()
    T_true[:3, 3] = [0.03, -0.02, 0.04]
    tgt = src @ T_true[:3, :3].T + T_true[:3, 3]

    sp = PointCloud.from_numpy(src, capacity=1024)
    tp = PointCloud.from_numpy(tgt, capacity=1024)
    T, fitness, rmse = icp(sp.points, sp.mask, tp.points, tp.mask, 0.2,
                           max_iterations=30)
    T = np.asarray(T)
    np.testing.assert_allclose(T, T_true, atol=2e-3)
    assert float(fitness) > 0.99
    assert float(rmse) < 1e-2


def test_icp_scheduled_matches_consecutive_calls(rng):
    """icp_scheduled with a [coarse]*a + [fine]*b threshold schedule must run
    the exact iteration sequence of two consecutive icp() calls (the merged
    form _register_one uses — instance_based_loc_tpu/ops/localise_kernels.py)."""
    from instance_based_loc_tpu.ops.icp import icp_scheduled

    src = sample_box_surface(rng)
    T_true = np.eye(4, dtype=np.float32)
    T_true[:3, :3] = Rotation.from_euler("xyz", [0.08, -0.05, 0.03]).as_matrix()
    T_true[:3, 3] = [0.05, -0.03, 0.02]
    tgt = src @ T_true[:3, :3].T + T_true[:3, 3]

    sp = PointCloud.from_numpy(src, capacity=1024)
    tp = PointCloud.from_numpy(tgt, capacity=1024)
    colors = jnp.asarray(rng.uniform(0, 1, size=(1024, 3)).astype(np.float32))

    coarse, fine, a, b = 0.3, 0.1, 5, 7
    T1, _, _ = icp(sp.points, sp.mask, tp.points, tp.mask, coarse,
                   src_colors=colors, tgt_colors=colors,
                   max_iterations=a, use_colors=True)
    T1, fit1, rmse1 = icp(sp.points, sp.mask, tp.points, tp.mask, fine,
                          init_transform=T1, src_colors=colors,
                          tgt_colors=colors, max_iterations=b,
                          use_colors=True)

    schedule = jnp.concatenate([jnp.full((a,), coarse, jnp.float32),
                                jnp.full((b,), fine, jnp.float32)])
    T2, fit2, rmse2 = icp_scheduled(sp.points, sp.mask, tp.points, tp.mask,
                                    schedule, src_colors=colors,
                                    tgt_colors=colors, use_colors=True)

    np.testing.assert_allclose(np.asarray(T2), np.asarray(T1), atol=1e-5)
    np.testing.assert_allclose(float(fit2), float(fit1), atol=1e-6)
    np.testing.assert_allclose(float(rmse2), float(rmse1), atol=1e-5)


def test_evaluate_transform_semantics(rng):
    src = rng.uniform(-1, 1, size=(100, 3)).astype(np.float32)
    sp = PointCloud.from_numpy(src, capacity=128)
    # identity on identical clouds: perfect fitness, zero rmse
    rmse, fitness = evaluate_transform_arrays(
        sp.points, sp.mask, sp.points, sp.mask, jnp.eye(4), 0.02)
    assert float(fitness) == 1.0
    # matmul-identity distances carry ~1e-4 fp noise even on identical clouds
    assert float(rmse) < 1e-3
    # large offset: nothing within threshold
    T = np.eye(4, dtype=np.float32)
    T[:3, 3] = [10, 0, 0]
    rmse2, fitness2 = evaluate_transform_arrays(
        sp.points, sp.mask, sp.points, sp.mask, jnp.asarray(T), 0.02)
    assert float(fitness2) == 0.0


# --------------------------------------------------------------------------- #
# RANSAC + full pipeline
# --------------------------------------------------------------------------- #
def test_ransac_with_perfect_correspondences(rng):
    src = sample_box_surface(rng, n=300)
    T_true = rigid()
    tgt = src @ T_true[:3, :3].T + T_true[:3, 3]
    sp = PointCloud.from_numpy(src, capacity=512)
    tp = PointCloud.from_numpy(tgt, capacity=512)
    # identity correspondences (same ordering)
    corr_idx = jnp.arange(512)
    corr_valid = sp.mask
    T, fitness, rmse = ransac_registration(
        sp.points, sp.mask, tp.points, corr_idx, corr_valid,
        distance_threshold=0.05, key=jax.random.PRNGKey(0),
        num_hypotheses=256)
    np.testing.assert_allclose(np.asarray(T), T_true, atol=1e-2)
    assert float(fitness) > 0.95


def test_full_registration_recovers_transform(rng):
    src = sample_box_surface(rng, n=700, size=(1.0, 0.5, 0.3))
    T_true = rigid()
    noise = rng.normal(scale=0.003, size=src.shape).astype(np.float32)
    tgt = (src @ T_true[:3, :3].T + T_true[:3, 3] + noise).astype(np.float32)

    sp = pad_for_registration(PointCloud.from_numpy(src), capacity=1024)
    tp = pad_for_registration(PointCloud.from_numpy(tgt), capacity=1024)

    T, rmse, fitness = register_point_clouds(sp, tp, voxel_size=0.05,
                                             num_hypotheses=2048,
                                             icp_iterations=30)
    # check alignment quality rather than exact matrix equality
    moved = src @ T[:3, :3].T + T[:3, 3]
    err = np.linalg.norm(moved - tgt, axis=1)
    assert np.median(err) < 0.02, f"median alignment err {np.median(err):.4f}"
    assert fitness > 0.8

    # evaluate_transform agrees
    rmse_e, fit_e = evaluate_transform(sp, tp, T, threshold=0.05)
    assert fit_e > 0.8


def test_semantic_icp_uses_labels(rng):
    """Label-constrained ICP must recover a transform that plain geometry
    would confuse: two identical clusters, distinguishable only by label."""
    from instance_based_loc_tpu.ops.icp import semantic_icp
    from scipy.spatial.transform import Rotation as _R

    blob = sample_box_surface(rng, n=120, size=(0.5, 0.4, 0.3))
    # source: box A at origin (label 0), an IDENTICAL box B at +x (label 1)
    src = np.concatenate([blob, blob + [2.0, 0, 0]]).astype(np.float32)
    labels = np.concatenate([np.zeros(120, np.int32), np.ones(120, np.int32)])
    # target: everything shifted by t_true. Plain ICP from identity would
    # lock A onto B's position (distance 0 matches); labels forbid that.
    t_true = np.array([2.0, 0.3, -0.1], np.float32)
    tgt = (src + t_true).astype(np.float32)
    tgt_labels = labels.copy()

    sp = PointCloud.from_numpy(src, capacity=256)
    tp = PointCloud.from_numpy(tgt, capacity=256)
    lab_s = np.zeros(256, np.int32); lab_s[:240] = labels
    lab_t = np.zeros(256, np.int32); lab_t[:240] = tgt_labels

    T, fitness, rmse = semantic_icp(
        sp.points, jnp.asarray(lab_s), sp.mask,
        tp.points, jnp.asarray(lab_t), tp.mask,
        max_correspondence_distance=3.0,
        max_iterations=30)
    T = np.asarray(T)
    np.testing.assert_allclose(T[:3, 3], t_true, atol=5e-2)
    np.testing.assert_allclose(T[:3, :3], np.eye(3), atol=5e-2)
    assert float(fitness) > 0.9
