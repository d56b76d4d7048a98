"""Geometry kernels vs brute-force numpy references (SURVEY.md §4 test plan:
'unit tests for every geometry kernel vs numpy/Open3D-equivalent references')."""

import numpy as np
import jax.numpy as jnp

from instance_based_loc_tpu.ops.pointcloud import PointCloud
from instance_based_loc_tpu.ops import backprojection as bp
from instance_based_loc_tpu.ops.outliers import radius_neighbor_counts, radius_outlier_keep_mask
from instance_based_loc_tpu.ops.voxel import voxel_downsample
from instance_based_loc_tpu.ops.frustum import get_visible_pointcloud
from instance_based_loc_tpu.ops.kabsch import kabsch_transform, apply_transform
from instance_based_loc_tpu.ops import iou3d
from scipy.spatial.transform import Rotation


# --------------------------------------------------------------------------- #
# backprojection — must equal the reference's centered-grid formula
# --------------------------------------------------------------------------- #
def _ref_backproject(depth, fx, fy):
    """Verbatim reference math (utils/depth_utils.py:18-34)."""
    w, h = depth.shape
    horizontal = np.linspace(-h / 2, h / 2, h, dtype=np.float32)
    vertical = np.linspace(w / 2, -w / 2, w, dtype=np.float32).reshape(-1, 1)
    horizontal = np.tile(horizontal, (w, 1))
    vertical = np.tile(vertical, (1, h))
    X = horizontal * depth / fx
    Y = vertical * depth / fy
    Z = depth
    pts = np.stack([X, Y, Z], axis=2).reshape(-1, 3)
    return pts[pts[:, 2] != 0]


def test_backproject_matches_reference(rng):
    depth = rng.uniform(0, 5, size=(24, 32)).astype(np.float32)
    depth[depth < 1.0] = 0.0
    fx = fy = 300.0
    pts, valid = bp.backproject(jnp.asarray(depth), fx, fy)
    ours = np.asarray(pts)[np.asarray(valid)]
    theirs = _ref_backproject(depth, fx, fy)
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_mask_pointclouds_batched(rng):
    depth = rng.uniform(1, 5, size=(16, 20)).astype(np.float32)
    rgb = rng.integers(0, 255, size=(16, 20, 3)).astype(np.uint8)
    masks = np.zeros((2, 16, 20), bool)
    masks[0, :8] = True
    masks[1, 8:] = True
    out = bp.mask_pointclouds_from_depth(
        jnp.asarray(depth), jnp.asarray(rgb), jnp.asarray(masks),
        jnp.float32(300.0), jnp.float32(300.0), apply_outlier_removal=False)
    assert out.points.shape == (2, 16 * 20, 3)
    # each mask's valid points = reference per-mask loop result
    for i in range(2):
        theirs = _ref_backproject(depth * masks[i], 300.0, 300.0)
        ours = np.asarray(out.points[i])[np.asarray(out.mask[i])]
        np.testing.assert_allclose(np.sort(ours, axis=0), np.sort(theirs, axis=0), atol=1e-5)


# --------------------------------------------------------------------------- #
# radius outlier removal
# --------------------------------------------------------------------------- #
def test_radius_neighbor_counts_bruteforce(rng):
    pts = rng.normal(size=(200, 3)).astype(np.float32)
    mask = np.ones(200, bool)
    mask[150:] = False
    counts = np.asarray(radius_neighbor_counts(jnp.asarray(pts), jnp.asarray(mask), 0.5,
                                               row_tile=64, col_tile=128))
    d = np.linalg.norm(pts[:, None] - pts[None, :], axis=-1)
    # fp boundary tolerance: pairs within 1e-4 of the radius may land either way
    lo = ((d <= 0.5 - 1e-4) & mask[None, :]).sum(1)
    hi = ((d <= 0.5 + 1e-4) & mask[None, :]).sum(1)
    assert (counts >= lo).all() and (counts <= hi).all()


def test_radius_outlier_keeps_cluster_drops_strays(rng):
    cluster = rng.normal(scale=0.01, size=(50, 3)).astype(np.float32)
    strays = rng.normal(scale=5.0, size=(5, 3)).astype(np.float32) + 100.0
    pts = np.concatenate([cluster, strays])
    mask = np.ones(len(pts), bool)
    keep = np.asarray(radius_outlier_keep_mask(jnp.asarray(pts), jnp.asarray(mask),
                                               radius=0.05, nb_points=12,
                                               row_tile=32, col_tile=64))
    assert keep[:50].all()
    assert not keep[50:].any()


# --------------------------------------------------------------------------- #
# voxel downsampling
# --------------------------------------------------------------------------- #
def test_voxel_downsample_means(rng):
    pts = rng.uniform(-1, 1, size=(300, 3)).astype(np.float32)
    cols = rng.uniform(0, 1, size=(300, 3)).astype(np.float32)
    cloud = PointCloud.from_numpy(pts, cols, capacity=512)
    voxel = 0.25
    out = voxel_downsample(cloud, voxel)
    got_pts, got_cols = out.to_numpy()

    # reference dict-binning (depth_utils.py:211-265)
    vox = np.floor(pts / voxel).astype(np.int64)
    ref = {}
    for p, c, v in zip(pts, cols, vox):
        ref.setdefault(tuple(v), []).append((p, c))
    ref_pts = np.array([np.mean([p for p, _ in vals], axis=0) for vals in ref.values()])
    ref_cols = np.array([np.mean([c for _, c in vals], axis=0) for vals in ref.values()])

    assert len(got_pts) == len(ref_pts)
    order_got = np.lexsort(got_pts.T)
    order_ref = np.lexsort(ref_pts.T)
    np.testing.assert_allclose(got_pts[order_got], ref_pts[order_ref], atol=1e-5)
    np.testing.assert_allclose(got_cols[order_got], ref_cols[order_ref], atol=1e-5)


def test_voxel_downsample_ignores_masked(rng):
    pts = np.array([[0.1, 0.1, 0.1], [0.11, 0.11, 0.11], [10, 10, 10]], np.float32)
    cloud = PointCloud.from_numpy(pts, capacity=8)
    cloud = PointCloud(cloud.points, cloud.colors,
                       cloud.mask & jnp.asarray([True, True, False] + [False] * 5))
    out = voxel_downsample(cloud, 1.0)
    got, _ = out.to_numpy()
    assert len(got) == 1
    np.testing.assert_allclose(got[0], [0.105, 0.105, 0.105], atol=1e-6)


# --------------------------------------------------------------------------- #
# frustum culling — vs the reference per-point loop
# --------------------------------------------------------------------------- #
def test_frustum_matches_reference_loop(rng):
    pts = rng.uniform(-5, 5, size=(500, 3)).astype(np.float32)
    cols = rng.uniform(0, 1, size=(500, 3)).astype(np.float32)
    q = Rotation.from_euler("xyz", [0.1, 0.4, -0.2]).as_quat()
    t = np.array([0.5, -0.3, 1.0])
    pose = np.concatenate([t, q]).astype(np.float32)
    fov, near, far = 90.0, 0.1, 6.0

    cloud = PointCloud.from_numpy(pts, cols, capacity=512)
    vis = get_visible_pointcloud(cloud, pose, fov, near, far)
    got_pts, _ = vis.to_numpy()

    # reference loop (synthetic_dataloader.py:101-137)
    r = Rotation.from_quat(q / np.linalg.norm(q)).as_matrix()
    transformed = np.dot(pts - t, r)  # == (p-t) @ R_inv.T with R_inv = R.T
    tan_half = np.tan(np.deg2rad(fov) / 2)
    ref = []
    for p in transformed:
        x, y, z = p
        if z < near or z > far:
            continue
        if abs(x / z) > tan_half or abs(y / z) > tan_half:
            continue
        ref.append(p)
    ref = np.array(ref) if ref else np.zeros((0, 3))
    assert len(got_pts) == len(ref)
    if len(ref):
        np.testing.assert_allclose(np.sort(got_pts, axis=0), np.sort(ref, axis=0), atol=1e-4)


# --------------------------------------------------------------------------- #
# Kabsch
# --------------------------------------------------------------------------- #
def test_kabsch_recovers_known_transform(rng):
    p = rng.normal(size=(40, 3)).astype(np.float64)
    r = Rotation.from_euler("xyz", [0.3, -0.5, 1.2]).as_matrix()
    t = np.array([1.0, -2.0, 0.5])
    q = p @ r.T + t
    T = np.asarray(kabsch_transform(jnp.asarray(p), jnp.asarray(q)))
    np.testing.assert_allclose(T[:3, :3], r, atol=1e-5)
    np.testing.assert_allclose(T[:3, 3], t, atol=1e-5)
    np.testing.assert_allclose(np.asarray(apply_transform(jnp.asarray(p), jnp.asarray(T))),
                               q, atol=1e-5)


# --------------------------------------------------------------------------- #
# 3D IoU
# --------------------------------------------------------------------------- #
def _cube(center, size, n=200, rng=None):
    return (rng.uniform(-0.5, 0.5, size=(n, 3)) * size + center).astype(np.float32)


def test_aabb_iou_known_value(rng):
    # two unit cubes offset by 0.5 in x: intersection 0.5, union 1.5
    a = np.array([[0, 0, 0], [1, 1, 1]], np.float32)
    b = np.array([[0.5, 0, 0], [1.5, 1, 1]], np.float32)
    pa = PointCloud.from_numpy(a, capacity=8)
    pb = PointCloud.from_numpy(b, capacity=8)
    got = float(iou3d.aabb_iou(pa.points, pa.mask, pb.points, pb.mask))
    np.testing.assert_allclose(got, 0.5 / 1.5, atol=1e-6)
    ov = float(iou3d.strict_overlap(pa.points, pa.mask, pb.points, pb.mask))
    np.testing.assert_allclose(ov, 0.5, atol=1e-6)


def test_box_intersection_volume_axis_aligned():
    c1 = jnp.zeros(3)
    c2 = jnp.array([0.5, 0.0, 0.0])
    ident = jnp.eye(3)
    ext = jnp.ones(3)
    vol = float(iou3d.box_intersection_volume(c1, ident, ext, c2, ident, ext))
    np.testing.assert_allclose(vol, 0.5, atol=1e-4)
    # identical boxes
    vol2 = float(iou3d.box_intersection_volume(c1, ident, ext, c1, ident, ext))
    np.testing.assert_allclose(vol2, 1.0, atol=1e-4)
    # disjoint
    c3 = jnp.array([5.0, 0.0, 0.0])
    vol3 = float(iou3d.box_intersection_volume(c1, ident, ext, c3, ident, ext))
    np.testing.assert_allclose(vol3, 0.0, atol=1e-6)


def test_box_intersection_volume_rotated():
    # unit cube vs the same cube rotated 45 deg about z:
    # intersection is a regular octagon prism, area = 2*(sqrt(2)-1)... known:
    # A = 8 * (sqrt(2) - 1) / 2 ... compute numerically instead via Monte Carlo.
    rot = Rotation.from_euler("z", np.pi / 4).as_matrix().astype(np.float32)
    c = jnp.zeros(3)
    ext = jnp.ones(3)
    vol = float(iou3d.box_intersection_volume(c, jnp.eye(3), ext, c, jnp.asarray(rot), ext))
    # Monte Carlo reference
    rng = np.random.default_rng(1)
    samples = rng.uniform(-0.5, 0.5, size=(200000, 3))
    inside = np.all(np.abs(samples @ rot) <= 0.5 + 1e-9, axis=1)
    mc = inside.mean() * 1.0
    np.testing.assert_allclose(vol, mc, atol=5e-3)


def test_obb_iou_identical_clouds(rng):
    pts = _cube([0, 0, 0], [2, 1, 0.5], rng=rng)
    pc = PointCloud.from_numpy(pts, capacity=256)
    val = float(iou3d.obb_iou(pc.points, pc.mask, pc.points, pc.mask))
    np.testing.assert_allclose(val, 1.0, atol=1e-4)


def test_obb_iou_disjoint(rng):
    a = _cube([0, 0, 0], 1, rng=rng)
    b = _cube([10, 0, 0], 1, rng=rng)
    pa = PointCloud.from_numpy(a, capacity=256)
    pb = PointCloud.from_numpy(b, capacity=256)
    val = float(iou3d.obb_iou(pa.points, pa.mask, pb.points, pb.mask))
    assert val == 0.0


def test_pairwise_obb_iou(rng):
    a = _cube([0, 0, 0], 1, rng=rng)
    b = _cube([0.2, 0, 0], 1, rng=rng)
    c = _cube([30, 0, 0], 1, rng=rng)
    pts = np.stack([a, b, c])
    masks = np.ones(pts.shape[:2], bool)
    m = np.asarray(iou3d.pairwise_obb_iou(jnp.asarray(pts), jnp.asarray(masks)))
    assert m.shape == (3, 3)
    np.testing.assert_allclose(np.diag(m), 1.0, atol=1e-3)
    assert m[0, 1] > 0.3
    assert m[0, 2] == 0.0
    np.testing.assert_allclose(m, m.T, atol=1e-4)
