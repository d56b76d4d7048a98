"""Stage-6 milestone: the minimum end-to-end slice (SURVEY.md §7.6) —
synthetic scene -> memory build (detect/embed/backproject/transform) ->
consolidation -> localisation of a held-out view, with weights-free
detector/embedder (the reference's dummy-embedder pattern,
synth_object_memory_trial.py)."""

import numpy as np
import pytest

from instance_based_loc_tpu.data.synthetic import (
    default_scene, render_scene, ring_poses)
from instance_based_loc_tpu.memory import ObjectMemory, ColorRegionDetector
from instance_based_loc_tpu.models.embedders import get_embedder
from instance_based_loc_tpu.ops.transforms import quaternion_error
import jax.numpy as jnp

pytestmark = pytest.mark.slow

FOCAL = 200.0
H, W = 160, 220


@pytest.fixture(scope="module")
def world():
    scene = default_scene(num_objects=5, seed=3)
    poses = ring_poses(7, radius=4.5, height=1.3, target=(0, 0.4, 0))
    frames = [render_scene(scene, p, H, W, FOCAL) for p in poses]
    return scene, poses, frames


@pytest.fixture(scope="module")
def built_memory(world):
    scene, poses, frames = world
    detector = ColorRegionDetector(min_area=80,
                                   floor_colors=[scene.floor_color])
    memory = ObjectMemory(
        detector=detector,
        camera_focal_lenth_x=FOCAL,
        camera_focal_lenth_y=FOCAL,
        get_embeddings_func=get_embedder("color"),
        log_enabled=False,
    )
    for i in range(len(poses) - 1):  # last view held out for localisation
        rgb, depth, _ = frames[i]
        memory.process_image(rgb, depth, poses[i], consider_floor=True,
                             min_points=200, outlier_removal_config=None)
    return scene, poses, frames, memory


def test_memory_build_finds_objects(built_memory):
    scene, poses, frames, memory = built_memory
    assert len(memory.memory) > len(scene.boxes)  # multiple views, pre-cluster
    assert memory.floors is not None              # floor routed separately


def test_memory_objects_on_geometry(built_memory):
    scene, poses, frames, memory = built_memory
    for obj in memory.memory:
        pts = obj.points()
        on_box = np.zeros(len(pts), bool)
        for box in scene.boxes:
            on_box |= box.contains(pts, tol=2e-2)
        assert on_box.mean() > 0.95


def test_recluster_consolidates_to_object_count(built_memory):
    scene, poses, frames, memory = built_memory
    import copy
    mem = copy.deepcopy(memory)
    mem.downsample_all_objects(voxel_size=0.02)
    mem.recluster_objects_with_dbscan(eps=0.1, min_points_per_cluster=40)
    # 5 boxes in the scene; dbscan over world points should merge views
    assert len(mem.memory) == len(scene.boxes)
    # each cluster sits on exactly one box
    for obj in mem.memory:
        centroid = obj.centroid
        dists = [np.linalg.norm(centroid - b.center) for b in scene.boxes]
        assert min(dists) < 0.5


def test_embedding_reclustering_path(built_memory):
    scene, poses, frames, memory = built_memory
    import copy
    mem = copy.deepcopy(memory)
    mem.downsample_all_objects(voxel_size=0.02)
    mem.recluster_via_clustering_and_IoU(embedding_distance_threshold=0.4,
                                         eps=0.1, min_points_per_cluster=40,
                                         IoU_threshold=0.25)
    assert 1 <= len(mem.memory) <= len(scene.boxes) + 2


def test_save_load_roundtrip(built_memory, tmp_path):
    scene, poses, frames, memory = built_memory
    path = str(tmp_path / "mem.pkl")
    memory.save_to_pkl(path)
    detector = ColorRegionDetector(min_area=80)
    fresh = ObjectMemory(detector=detector, camera_focal_lenth_x=FOCAL,
                         camera_focal_lenth_y=FOCAL,
                         get_embeddings_func=get_embedder("color"),
                         log_enabled=False)
    fresh.load(path)
    assert len(fresh.memory) == len(memory.memory)
    np.testing.assert_allclose(fresh.memory[0].mean_emb, memory.memory[0].mean_emb)
    np.testing.assert_allclose(fresh.memory[0].points(), memory.memory[0].points(),
                               atol=1e-6)

    # dir-tree save also works
    memory.save(str(tmp_path / "memdir"))
    import os
    assert os.path.exists(tmp_path / "memdir" / "memory.txt")
    assert os.path.exists(tmp_path / "memdir" / "combined_pointcloud.ply")


def test_localise_held_out_view(built_memory):
    """The end-to-end check: localising the held-out view recovers its pose
    within the reference's success thresholds (trans < 0.6 m, rot < 0.3 rad —
    tum_localisation_trial.py:274)."""
    scene, poses, frames, memory = built_memory
    import copy
    mem = copy.deepcopy(memory)
    mem.downsample_all_objects(voxel_size=0.02)
    mem.recluster_objects_with_dbscan(eps=0.1, min_points_per_cluster=40)

    eval_idx = len(poses) - 1
    rgb, depth, _ = frames[eval_idx]
    true_pose = poses[eval_idx]

    est_pose, (assn, _) = mem.localise(rgb, depth, outlier_removal_config=None)

    trans_err = np.linalg.norm(est_pose[:3] - true_pose[:3])
    rot_err = float(quaternion_error(jnp.asarray(true_pose[3:]),
                                     jnp.asarray(est_pose[3:])))
    print(f"trans_err={trans_err:.3f} rot_err={rot_err:.3f} assn={assn}")
    assert trans_err < 0.6, f"translation error {trans_err:.3f}"
    assert rot_err < 0.3, f"rotation error {rot_err:.3f}"


def test_tum_format_end_to_end(tmp_path):
    """TUM-layout sequence (uint16 png depth /5000, groundtruth.txt with the
    Kinect frame fix) round-trips through the tum convention: memory build +
    localisation succeed with the plain-transform semantics the reference
    uses (object_memory.py:221; VERDICT r1 item 8's TUM half)."""
    from instance_based_loc_tpu.data.synthetic import (
        write_tum_dataset, default_scene)
    from instance_based_loc_tpu.data.loader import RGBDDataset
    from instance_based_loc_tpu.utils.metrics import pose_errors, is_success

    scene = default_scene(num_objects=4, seed=5)
    data = str(tmp_path / "tum")
    write_tum_dataset(data, scene=scene, n_views=7, height=120, width=160,
                      focal_length=150.0)
    ds = RGBDDataset(data_path=data, evaluation_indices=[5],
                     convention="tum", focal_length_x=150.0,
                     focal_length_y=150.0)
    assert ds.depth_factor == 5000.0
    memory = ObjectMemory(
        detector=ColorRegionDetector(min_area=80,
                                     floor_colors=[scene.floor_color]),
        camera_focal_lenth_x=150.0, camera_focal_lenth_y=150.0,
        get_embeddings_func=get_embedder("color"), log_enabled=False)
    for idx in ds.environment_indices:
        rgb_path, depth_path, pose = ds.get_image_data(idx)
        memory.process_image(rgb_path, depth_path, pose, consider_floor=True,
                             depth_factor=ds.depth_factor, min_points=150,
                             outlier_removal_config=None)
    memory.downsample_all_objects(voxel_size=0.02)
    memory.recluster_objects_with_dbscan(eps=0.1, min_points_per_cluster=40)

    rgb_path, depth_path, target = ds.get_image_data(5)
    est, _ = memory.localise(rgb_path, depth_path,
                             depth_factor=ds.depth_factor,
                             outlier_removal_config=None)
    te, re_ = pose_errors(target, est)
    assert is_success(te, re_), (te, re_)


def test_localisation_trial_cli(tmp_path):
    """The main trial CLI end-to-end on a tiny TUM-layout dataset through
    the shared build_memory phase: build -> save pkl -> localise -> report
    (reference tum_localisation_trial.py flow)."""
    from instance_based_loc_tpu.data.synthetic import (write_tum_dataset,
                                                       default_scene)
    from instance_based_loc_tpu.cli.localisation_trial import (
        main, make_parser, apply_convention_defaults)

    scene = default_scene(num_objects=4, seed=5)
    data = str(tmp_path / "tum")
    write_tum_dataset(data, scene=scene, n_views=7, height=120, width=160,
                      focal_length=150.0)
    args = apply_convention_defaults(make_parser().parse_args([
        "--convention", "tum", "--data-path", data,
        "--embeddings", "color", "--detector", "color",
        "-e", "5", "--consider-floor", "--min-points", "150",
        "--no-outlier-removal", "--focal-length", "150",
        "--sampling-period", "1",
        "--downsample-voxel-size", "0.02", "--dbscan-eps", "0.1",
        "--dbscan-min-points", "40",
        # the tum convention defaults mirror the reference's mm-scale
        # sensor tuning (local factor 1.5); coarse synthetic depth wants
        # the synth factors (same situation as --no-outlier-removal)
        "--fpfh-global-dist-factor", "2.0",
        "--fpfh-local-dist-factor", "0.4",
        "--memory-save-path", str(tmp_path / "mem.pkl"),
        "--out-dir", str(tmp_path / "out"),
        "--testname", "cli_smoke", "--quiet"]))
    # floor suppression needs the scene's floor color (the weights-free
    # detector has no scene knowledge; main() accepts an injected detector)
    detector = ColorRegionDetector(min_area=80,
                                   floor_colors=[scene.floor_color])
    trans_errors, rot_errors = main(args, detector=detector)
    assert (tmp_path / "out" / "cli_smoke_results.txt").exists()
    assert (tmp_path / "mem.pkl").exists()
    assert trans_errors[0] < 0.6 and rot_errors[0] < 0.3, (
        trans_errors, rot_errors)


def test_localisation_trial_cli_serving_mode(tmp_path):
    """The trial CLI's throughput serving mode: --serve-batch chunks eval
    queries through one vmapped device program and --serve-data-axis shards
    each chunk over the mesh "data" axis (SPMD multi-chip serving on the
    8-device virtual CPU mesh). Same data/flags as the latency-mode CLI
    test; the serving path must reach the same success gate."""
    from instance_based_loc_tpu.data.synthetic import (write_tum_dataset,
                                                       default_scene)
    from instance_based_loc_tpu.cli.localisation_trial import (
        main, make_parser, apply_convention_defaults)

    scene = default_scene(num_objects=4, seed=5)
    data = str(tmp_path / "tum")
    # 12 views so holding out 4 eval poses still leaves 8 build views of
    # ring coverage (with only 3 build views every query misses its basin
    # in latency mode too — the gate below needs a well-built memory)
    write_tum_dataset(data, scene=scene, n_views=12, height=120, width=160,
                      focal_length=150.0)
    args = apply_convention_defaults(make_parser().parse_args([
        "--convention", "tum", "--data-path", data,
        "--embeddings", "color", "--detector", "color",
        "-e", "3", "5", "7", "9", "--consider-floor", "--min-points", "150",
        "--no-outlier-removal", "--focal-length", "150",
        "--sampling-period", "1",
        "--downsample-voxel-size", "0.02", "--dbscan-eps", "0.1",
        "--dbscan-min-points", "40",
        "--fpfh-global-dist-factor", "2.0",
        "--fpfh-local-dist-factor", "0.4",
        "--serve-batch", "4", "--serve-data-axis", "4",
        "--out-dir", str(tmp_path / "out"),
        "--testname", "cli_serve", "--quiet"]))
    detector = ColorRegionDetector(min_area=80,
                                   floor_colors=[scene.floor_color])
    trans_errors, rot_errors = main(args, detector=detector)
    assert (tmp_path / "out" / "cli_serve_results.txt").exists()
    ok = sum(t < 0.6 and r < 0.3
             for t, r in zip(trans_errors, rot_errors))
    assert ok >= 3, (trans_errors, rot_errors)
