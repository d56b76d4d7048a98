"""clip_loc pipeline tests: P3P solver, PnP refinement, ellipsoid fit, and
the end-to-end detect->match->RANSAC->P3P localisation on the fixture."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from instance_based_loc_tpu.ops.p3p import (
    batched_p3p, refine_pnp, project_points, pixel_bearings)
from instance_based_loc_tpu.ops.ellipsoid import fit_ellipsoid, sample_ellipsoid_surface

K = np.array([[300.0, 0, 160], [0, 300.0, 120], [0, 0, 1]], np.float32)


def random_problem(rng):
    r = Rotation.from_euler("xyz", rng.uniform(-0.5, 0.5, 3)).as_matrix()
    t = rng.uniform(-2, 2, 3)
    pose = np.eye(4)
    pose[:3, :3] = r
    pose[:3, 3] = t
    cam_pts = rng.uniform(-1, 1, (3, 3))
    cam_pts[:, 2] = rng.uniform(2, 5, 3)
    world = cam_pts @ r.T + t
    px = cam_pts @ K.T
    px = px[:, :2] / px[:, 2:3]
    return pose, world.astype(np.float32), px.astype(np.float32)


def test_p3p_recovers_pose(rng):
    recovered = 0
    for _ in range(20):
        pose, world, px = random_problem(rng)
        poses, valid = batched_p3p(jnp.asarray(world[None]),
                                   jnp.asarray(px[None]), jnp.asarray(K))
        poses = np.asarray(poses)[0]
        valid = np.asarray(valid)[0]
        errs = [np.abs(p - pose).max() for p, v in zip(poses, valid) if v]
        if errs and min(errs) < 5e-2:
            recovered += 1
    assert recovered >= 16, f"only {recovered}/20 recovered"


def test_refine_pnp_fixes_noisy_pose(rng):
    pose, world, px = random_problem(rng)
    noisy = pose.copy()
    noisy[:3, 3] += rng.normal(0, 0.1, 3)
    perturb = Rotation.from_euler("xyz", rng.normal(0, 0.05, 3)).as_matrix()
    noisy[:3, :3] = noisy[:3, :3] @ perturb
    refined = np.asarray(refine_pnp(jnp.asarray(noisy, jnp.float32),
                                    jnp.asarray(world), jnp.asarray(px),
                                    jnp.ones(3), jnp.asarray(K), iters=15))
    assert np.abs(refined - pose).max() < np.abs(noisy - pose).max()
    # reprojection after refinement is tight
    px2, front = project_points(jnp.asarray(world), jnp.asarray(K),
                                jnp.asarray(refined))
    assert np.abs(np.asarray(px2) - px).max() < 1.0


def test_project_points_roundtrip(rng):
    pose, world, px = random_problem(rng)
    px2, front = project_points(jnp.asarray(world), jnp.asarray(K),
                                jnp.asarray(pose, jnp.float32))
    np.testing.assert_allclose(np.asarray(px2), px, atol=1e-2)
    assert np.asarray(front).all()


def test_pixel_bearings_inverse_of_projection(rng):
    pose, world, px = random_problem(rng)
    bearings = np.asarray(pixel_bearings(jnp.asarray(px), jnp.asarray(K)))
    cam = (world - pose[:3, 3]) @ pose[:3, :3]
    cam_dir = cam / np.linalg.norm(cam, axis=1, keepdims=True)
    np.testing.assert_allclose(bearings, cam_dir, atol=1e-4)


def test_ellipsoid_contains_points(rng):
    pts = rng.normal(size=(300, 3)).astype(np.float32) * np.array([2, 1, 0.5], np.float32)
    from instance_based_loc_tpu.ops.pointcloud import PointCloud
    pc = PointCloud.from_numpy(pts, capacity=512)
    center, axes, lengths = fit_ellipsoid(pc.points, pc.mask)
    center, axes, lengths = map(np.asarray, (center, axes, lengths))
    r = np.linalg.norm((pts - center) @ axes / lengths, axis=1)
    assert (r <= 1.0 + 1e-4).all()
    # surface sampler produces points on the unit shell
    surf = sample_ellipsoid_surface(center, axes, lengths, 12, 6)
    rs = np.linalg.norm((surf - center) @ axes / lengths, axis=1)
    np.testing.assert_allclose(rs, 1.0, atol=1e-4)


def test_clip_loc_end_to_end(rng):
    """Fixture world -> ObjectMemory -> ClipLocObjectMemory -> localize a
    held-out view (reference synth_clip_loc_trial flow)."""
    from instance_based_loc_tpu.data.synthetic import (
        default_scene, render_scene, ring_poses)
    from instance_based_loc_tpu.memory import ObjectMemory, ColorRegionDetector
    from instance_based_loc_tpu.memory.clip_loc import ClipLocObjectMemory
    from instance_based_loc_tpu.models.embedders import get_embedder
    from instance_based_loc_tpu.ops.transforms import quaternion_error

    focal, h, w = 200.0, 160, 220
    scene = default_scene(num_objects=5, seed=3)
    poses = ring_poses(7, radius=4.5, height=1.3, target=(0, 0.4, 0))
    frames = [render_scene(scene, p, h, w, focal) for p in poses]
    detector = ColorRegionDetector(min_area=80, floor_colors=[scene.floor_color])
    embed = get_embedder("color")
    memory = ObjectMemory(detector=detector, camera_focal_lenth_x=focal,
                          camera_focal_lenth_y=focal,
                          get_embeddings_func=embed, log_enabled=False)
    for i in range(6):
        rgb, depth, _ = frames[i]
        memory.process_image(rgb, depth, poses[i], consider_floor=True,
                             min_points=200, outlier_removal_config=None)
    memory.downsample_all_objects(voxel_size=0.02)
    memory.recluster_objects_with_dbscan(eps=0.1, min_points_per_cluster=40)

    clip_mem = ClipLocObjectMemory.from_object_memory(memory, log_enabled=False)
    assert len(clip_mem) == len(memory.memory)
    # every ellipsoid contains its own cloud
    for o in clip_mem.memory:
        r = np.linalg.norm((o.points - o.ellipsoid_center) @ o.ellipsoid_axes
                           / o.ellipsoid_lengths, axis=1)
        assert (r <= 1.0 + 1e-3).all()

    # our renderer's camera frame has y UP; CV pixel rows grow DOWN, so the
    # equivalent intrinsics flip fy
    k_cv = np.array([[focal, 0, w / 2], [0, -focal, h / 2], [0, 0, 1]],
                    np.float32)
    rgb, depth, _ = frames[6]
    true_pose = poses[6]
    est = clip_mem.localize(rgb, k_cv, detector, embed, k=3, rounds=200)
    assert est is not None
    trans_err = np.linalg.norm(est[:3] - true_pose[:3])
    rot_err = float(quaternion_error(jnp.asarray(true_pose[3:]),
                                     jnp.asarray(est[3:].astype(np.float32))))
    print(f"clip_loc: trans_err={trans_err:.3f} rot_err={rot_err:.3f}")
    # RGB-only bbox-center P3P is coarse (the reference's accuracy class)
    assert trans_err < 1.0, f"trans {trans_err}"
    assert rot_err < 0.4, f"rot {rot_err}"


def test_clip_loc_save_load(tmp_path, rng):
    from instance_based_loc_tpu.memory.clip_loc import (
        ClipLocObjectInfo, ClipLocObjectMemory)
    obj = ClipLocObjectInfo(
        id=0, text="chair", embedding=rng.normal(size=8).astype(np.float32),
        points=rng.normal(size=(50, 3)).astype(np.float32),
        colors=np.zeros((50, 3), np.float32),
        ellipsoid_center=np.zeros(3), ellipsoid_axes=np.eye(3),
        ellipsoid_lengths=np.ones(3))
    mem = ClipLocObjectMemory([obj], log_enabled=False)
    mem.save(str(tmp_path))
    loaded = ClipLocObjectMemory.load(str(tmp_path), log_enabled=False)
    assert len(loaded) == 1
    np.testing.assert_allclose(loaded.memory[0].points, obj.points)
    assert loaded.memory[0].text == "chair"


@pytest.mark.slow
def test_clip_loc_trial_cli(tmp_path):
    """The clip_loc trial CLI end-to-end on a tiny TUM-layout dataset:
    memory build -> ClipLoc conversion (saved + reloaded) -> P3P-RANSAC
    localisation -> results report (reference synth_clip_loc_trial role)."""
    from instance_based_loc_tpu.data.synthetic import (write_tum_dataset,
                                                       default_scene)
    from instance_based_loc_tpu.cli.clip_loc_trial import (
        main, make_clip_loc_parser)
    from instance_based_loc_tpu.cli.localisation_trial import (
        apply_convention_defaults)

    scene = default_scene(num_objects=5, seed=3)
    data = str(tmp_path / "tum")
    write_tum_dataset(data, scene=scene, n_views=7, height=120, width=160,
                      focal_length=150.0)
    args = apply_convention_defaults(make_clip_loc_parser().parse_args([
        "--convention", "tum", "--data-path", data,
        "--embeddings", "color", "--detector", "depth",
        "-e", "5", "--consider-floor", "--min-points", "150",
        "--no-outlier-removal", "--focal-length", "150",
        "--sampling-period", "1",
        "--downsample-voxel-size", "0.02", "--dbscan-eps", "0.1",
        "--dbscan-min-points", "40",
        "--clip-loc-save-path", str(tmp_path / "clipmem"),
        "--out-dir", str(tmp_path / "out"),
        "--testname", "cli_smoke", "--quiet"]))
    from instance_based_loc_tpu.memory import ColorRegionDetector
    query_detector = ColorRegionDetector(min_area=80,
                                         floor_colors=[scene.floor_color])
    trans_errors, rot_errors = main(args, query_detector=query_detector)
    assert (tmp_path / "out" / "cli_smoke_results.txt").exists()
    assert (tmp_path / "clipmem" / "clip_loc_memory.pkl").exists()
    # bbox-center P3P from RGB alone is the reference's coarse accuracy class
    assert trans_errors[0] < 1.5, trans_errors
