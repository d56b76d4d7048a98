"""Synthetic fixture renderer + unified dataloader tests.

The key invariant: backprojecting a rendered depth image and transforming by
the render pose must land points exactly on the scene geometry (the renderer
is the inverse of ops.backprojection by construction)."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from instance_based_loc_tpu.data.synthetic import (
    default_scene, render_scene, ring_poses, write_synth_dataset)
from instance_based_loc_tpu.data.loader import RGBDDataset, natsort_key
from instance_based_loc_tpu.ops.backprojection import backproject
from instance_based_loc_tpu.ops.transforms import transform_points


@pytest.fixture(scope="module")
def scene():
    return default_scene(num_objects=4, seed=0)


def test_render_backproject_roundtrip(scene):
    pose = ring_poses(8)[0]
    rgb, depth, inst = render_scene(scene, pose, height=120, width=160,
                                    focal_length=150.0)
    assert (depth > 0).sum() > 1000  # scene actually visible

    pts_cam, valid = backproject(jnp.asarray(depth), 150.0, 150.0)
    pts_world = np.asarray(transform_points(pts_cam, jnp.asarray(pose)))

    flat_inst = inst.reshape(-1)
    for i, box in enumerate(scene.boxes):
        sel = (flat_inst == i) & np.asarray(valid)
        if sel.sum() == 0:
            continue
        frac_inside = np.mean(box.contains(pts_world[sel], tol=2e-3))
        assert frac_inside > 0.99, f"box {i}: only {frac_inside:.2%} on geometry"

    floor_sel = (flat_inst == -2) & np.asarray(valid)
    if floor_sel.sum():
        y = pts_world[floor_sel][:, 1]
        np.testing.assert_allclose(y, scene.floor_y, atol=1e-3)


def test_instances_visible_from_all_ring_poses(scene):
    for pose in ring_poses(4):
        _, depth, inst = render_scene(scene, pose, height=96, width=128,
                                      focal_length=120.0)
        assert (inst >= 0).sum() > 50  # some object visible from every view


def test_natsort_key():
    files = ["frame_10.png", "frame_2.png", "frame_1.png"]
    assert sorted(files, key=natsort_key) == ["frame_1.png", "frame_2.png", "frame_10.png"]


def test_write_and_load_synth_dataset(tmp_path, scene):
    out = str(tmp_path / "synthset")
    write_synth_dataset(out, scene, n_views=4, height=96, width=128,
                        focal_length=120.0)
    assert os.path.exists(os.path.join(out, "poses.json"))

    ds = RGBDDataset(out, evaluation_indices=[3], convention="synth",
                     focal_length_x=120.0, focal_length_y=120.0,
                     build_map=False)
    assert ds.environment_indices == [0, 1, 2]
    rgb_path, depth_path, pose = ds.get_image_data(0)
    assert rgb_path.endswith(".png") and depth_path.endswith(".npy")
    # poses survive the euler-degrees round trip
    expected = ring_poses(4)[0]
    np.testing.assert_allclose(pose[:3], expected[:3], atol=1e-5)
    assert abs(np.dot(pose[3:], expected[3:])) > 1 - 1e-5


def test_map_pointcloud_build_and_cache(tmp_path, scene):
    out = str(tmp_path / "synthset")
    write_synth_dataset(out, scene, n_views=3, height=64, width=96,
                        focal_length=80.0)
    cache = str(tmp_path / "map.npz")
    # sparse low-res synthetic depth: the default radius-outlier config would
    # wipe everything (pixel footprint > radius), so disable it for the map
    ds = RGBDDataset(out, evaluation_indices=[], convention="synth",
                     focal_length_x=80.0, focal_length_y=80.0,
                     map_pointcloud_cache_path=cache, map_outlier_config=None)
    pts, _ = ds.map_pointcloud.to_numpy()
    assert len(pts) > 500
    assert os.path.exists(cache)
    # all points on floor or on a box (world-frame consistency across views)
    on_floor = np.abs(pts[:, 1] - scene.floor_y) < 5e-3
    on_box = np.zeros(len(pts), bool)
    for box in scene.boxes:
        on_box |= box.contains(pts, tol=5e-3)
    assert np.mean(on_floor | on_box) > 0.99

    # cached load must reproduce the same cloud
    ds2 = RGBDDataset(out, evaluation_indices=[], convention="synth",
                      focal_length_x=80.0, focal_length_y=80.0,
                      map_pointcloud_cache_path=cache, map_outlier_config=None)
    pts2, _ = ds2.map_pointcloud.to_numpy()
    np.testing.assert_allclose(np.sort(pts, axis=0), np.sort(pts2, axis=0), atol=1e-6)


def test_tum_pose_parsing(tmp_path):
    """TUM groundtruth parsing incl. the Kinect frame fix (tum_dataloader.py:56-78)."""
    from scipy.spatial.transform import Rotation
    os.makedirs(tmp_path / "rgb")
    os.makedirs(tmp_path / "depth")
    # one dummy frame pair (16-bit depth png + rgb png)
    from PIL import Image
    Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(tmp_path / "rgb" / "0.png")
    Image.fromarray(np.zeros((8, 8), np.uint16)).save(tmp_path / "depth" / "0.png")
    q = Rotation.from_euler("xyz", [0.1, 0.2, 0.3]).as_quat()
    with open(tmp_path / "groundtruth.txt", "w") as f:
        f.write(f"1.0 2.0 3.0 {q[0]} {q[1]} {q[2]} {q[3]}\n")

    ds = RGBDDataset(str(tmp_path), evaluation_indices=[], convention="tum",
                     build_map=False, sampling_period=1)
    pose = ds._poses[0]
    np.testing.assert_allclose(pose[:3], [-1.0, -2.0, -3.0], atol=1e-6)
    r2 = Rotation.from_euler("xyz", [0, np.pi, 0]).as_matrix()
    expected_q = Rotation.from_matrix(Rotation.from_quat(q).as_matrix() @ r2).as_quat()
    assert abs(np.dot(pose[3:], expected_q)) > 1 - 1e-6
    assert ds.depth_factor == 5000.0


def test_hm3d_episode_generator_roundtrip(tmp_path):
    """gen_hm3d_episode writes the hm3d layout; the loader's sign-fix
    round-trips poses back to the true render poses."""
    from instance_based_loc_tpu.cli.gen_hm3d_episode import generate_episode
    from instance_based_loc_tpu.data.loader import RGBDDataset

    out = str(tmp_path / "ep")
    generate_episode(out, timesteps=6, seed=1, height=60, width=80,
                     focal=60.0)
    ds = RGBDDataset(data_path=out, evaluation_indices=[5],
                     convention="hm3d", focal_length_x=60.0,
                     focal_length_y=60.0)
    assert len(ds.environment_indices) == 5
    rgb_path, depth_path, pose = ds.get_image_data(0)
    assert rgb_path.endswith(".png") and depth_path.endswith(".npy")
    depth = ds.load_depth_scaled(0)
    assert depth.ndim == 2 and np.isfinite(depth).all()
    assert np.asarray(pose).shape == (7,)
    # quaternion stays unit after the pose[-2] fix
    assert abs(np.linalg.norm(np.asarray(pose)[3:]) - 1.0) < 1e-5


def test_real_pose_parsing(tmp_path):
    """real convention: poses_odom.txt with a header row, cols [1:-1] as the
    7-vec pose, depth factor 1000 (reference real_dataloader.py:59-66,94)."""
    import numpy as np
    from PIL import Image
    from instance_based_loc_tpu.data.loader import RGBDDataset

    (tmp_path / "rgb").mkdir()
    (tmp_path / "depth").mkdir()
    rng = np.random.default_rng(0)
    rows = ["timestamp tx ty tz qx qy qz qw extra"]
    truth = []
    for i in range(3):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        pose = np.concatenate([rng.uniform(-2, 2, 3), q])
        truth.append(pose)
        rows.append(f"{i}.0 " + " ".join(f"{v:.6f}" for v in pose) + " 99")
        Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(
            tmp_path / "rgb" / f"frame_{i:04d}.png")
        Image.fromarray(np.zeros((8, 8), np.uint16)).save(
            tmp_path / "depth" / f"frame_{i:04d}.png")
    (tmp_path / "poses_odom.txt").write_text("\n".join(rows) + "\n")

    ds = RGBDDataset(str(tmp_path), evaluation_indices=[], convention="real",
                     focal_length_x=100.0, focal_length_y=100.0,
                     build_map=False)
    assert ds.depth_factor == 1000.0
    assert len(ds) == 3
    for i in range(3):
        _, _, pose = ds.get_image_data(i)
        np.testing.assert_allclose(pose, truth[i], atol=1e-5)


def test_8room_pose_parsing(tmp_path):
    """8room convention: per-frame ast-literal pose files with euler degrees
    + rot_correction on x, map build disabled
    (reference eightroom_dataloader.py:68-106)."""
    import numpy as np
    from PIL import Image
    from scipy.spatial.transform import Rotation
    from instance_based_loc_tpu.data.loader import RGBDDataset

    for sub in ("rgb", "depth", "pose"):
        (tmp_path / sub).mkdir()
    rng = np.random.default_rng(1)
    truth_t, truth_e = [], []
    for i in range(3):
        t = rng.uniform(-3, 3, 3)
        e = rng.uniform(-40, 40, 3)
        truth_t.append(t)
        truth_e.append(e)
        pose_repr = repr([
            {"x": float(t[0]), "y": float(t[1]), "z": float(t[2])},
            {"x": float(e[0]), "y": float(e[1]), "z": float(e[2])},
        ])
        (tmp_path / "pose" / f"frame_{i:04d}.txt").write_text(pose_repr)
        Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(
            tmp_path / "rgb" / f"frame_{i:04d}.png")
        Image.fromarray(np.zeros((8, 8), np.uint16)).save(
            tmp_path / "depth" / f"frame_{i:04d}.png")

    rc = 5.0
    ds = RGBDDataset(str(tmp_path), evaluation_indices=[],
                     convention="8room", focal_length_x=100.0,
                     focal_length_y=100.0, rot_correction=rc)
    assert ds.map_pointcloud is None      # map build disabled for 8room
    for i in range(3):
        _, _, pose = ds.get_image_data(i)
        np.testing.assert_allclose(pose[:3], truth_t[i], atol=1e-6)
        e = truth_e[i]
        q = Rotation.from_euler(
            "xyz", [e[0] + rc, e[1], e[2]], degrees=True).as_quat()
        np.testing.assert_allclose(
            np.abs(np.dot(pose[3:], q)), 1.0, atol=1e-6)
