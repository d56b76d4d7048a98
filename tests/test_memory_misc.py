"""Coverage for the remaining ObjectMemory paths: noise injection (the
reference's fault-injection mechanism, object_memory.py:189-219), floor
removal (:265-291), and the per-instance save layout."""

import numpy as np
import pytest
import jax.numpy as jnp

from instance_based_loc_tpu.memory import ObjectMemory, ColorRegionDetector
from instance_based_loc_tpu.memory.object_info import ObjectInfo
from instance_based_loc_tpu.models.embedders import get_embedder
from instance_based_loc_tpu.ops.pointcloud import PointCloud
from instance_based_loc_tpu.data.synthetic import (
    default_scene, render_scene, ring_poses)


def _mem():
    return ObjectMemory(
        detector=ColorRegionDetector(min_area=80),
        camera_focal_lenth_x=150.0, camera_focal_lenth_y=150.0,
        get_embeddings_func=get_embedder("color"), log_enabled=False)


def test_process_image_noise_injection(rng):
    scene = default_scene(num_objects=3, seed=1)
    pose = ring_poses(4, radius=4.0)[0]
    rgb, depth, _ = render_scene(scene, pose, 120, 160, 150.0)

    clean = _mem()
    clean.process_image(rgb, depth, pose.copy(), consider_floor=False,
                        min_points=100, outlier_removal_config=None)
    noisy = _mem()
    noisy.process_image(rgb, depth, pose.copy(), consider_floor=False,
                        min_points=100, outlier_removal_config=None,
                        add_noise=True,
                        pose_noise={"trans": 0.01, "rot": 0.01},
                        depth_noise=0.01)
    assert len(noisy.memory) == len(clean.memory)
    # noise actually perturbed the world points
    d = np.abs(noisy.memory[0].points().mean(0)
               - clean.memory[0].points().mean(0))
    assert d.max() > 1e-4


def test_remove_points_below_floor(rng):
    mem = _mem()
    mem.dataset_floor_thickness = 0.1
    # object A spans y in [0, 1]; object B sits at y ~ 0 (floor junk)
    pts_a = rng.uniform(0, 1, size=(200, 3)).astype(np.float32)
    pts_b = rng.uniform(0, 0.05, size=(100, 3)).astype(np.float32)
    emb = np.ones(4, np.float32)
    mem.memory = [
        ObjectInfo(0, "tall", emb, PointCloud.from_numpy(pts_a)),
        ObjectInfo(1, "flat", emb, PointCloud.from_numpy(pts_b)),
    ]
    mem.remove_points_below_floor()
    # floor height = 0 (min over objects); points with y <= 0.1 removed
    for obj in mem.memory:
        assert (obj.points()[:, 1] > 0.1).all()
    # the flat object should have been dropped entirely
    assert len(mem.memory) == 1
    assert mem.memory[0].names == ["tall"]


def test_object_info_save_layout(tmp_path, rng):
    pts = rng.normal(size=(50, 3)).astype(np.float32)
    obj = ObjectInfo(3, "chair", np.ones(4, np.float32),
                     PointCloud.from_numpy(pts))
    obj.save(str(tmp_path / "obj"))
    assert (tmp_path / "obj" / "pointcloud.ply").exists()
    assert (tmp_path / "obj" / "info.pkl").exists()
    from instance_based_loc_tpu.utils.ply import read_ply
    loaded, _ = read_ply(str(tmp_path / "obj" / "pointcloud.ply"))
    np.testing.assert_allclose(np.sort(loaded, axis=0), np.sort(pts, axis=0),
                               atol=1e-6)


def test_localise_empty_memory_returns_zero_pose(rng):
    mem = _mem()
    scene = default_scene(num_objects=2, seed=0)
    rgb, depth, _ = render_scene(scene, ring_poses(4)[0], 100, 120, 150.0)
    pose, (assn, _) = mem.localise(rgb, depth, outlier_removal_config=None)
    np.testing.assert_array_equal(pose, [0., 0., 0., 0., 0., 0., 1.])
    assert assn == []


def test_localise_batched_matches_single():
    """The one-program batched serving path returns the same poses as the
    single-query path."""
    scene = default_scene(num_objects=4, seed=3)
    poses = ring_poses(8, radius=4.5, height=1.3, target=(0, 0.4, 0))
    frames = [render_scene(scene, p, 120, 160, 150.0) for p in poses]
    memory = _mem()
    for i in range(6):
        rgb, depth, _ = frames[i]
        memory.process_image(rgb, depth, poses[i], consider_floor=True,
                             min_points=150, outlier_removal_config=None)
    memory.downsample_all_objects(voxel_size=0.02)
    memory.recluster_objects_with_dbscan(eps=0.1, min_points_per_cluster=40)
    eval_frames = [(frames[i][0], frames[i][1]) for i in (6, 7)]
    singles = [memory.localise(rgb, depth, outlier_removal_config=None)
               for rgb, depth in eval_frames]
    # the overlapped pipelined path runs the identical per-query program
    memory._frame_counter = memory._frame_counter - len(eval_frames)
    many = memory.localise_many(eval_frames, overlap=True,
                                outlier_removal_config=None)
    for (p1, a1), (p2, a2) in zip(singles, many):
        np.testing.assert_allclose(p1, p2, atol=0)
        assert a1[0] == a2[0]
    # vmap lowering reproduces the single-query program bit-for-bit
    memory._frame_counter = memory._frame_counter - len(eval_frames)
    batched = memory.localise_batched(eval_frames, batch_mode="vmap",
                                      outlier_removal_config=None)
    for (p1, a1), (p2, a2) in zip(singles, batched):
        np.testing.assert_allclose(p1, p2, atol=0)
        assert a1[0] == a2[0]
    # scan mode drifts ~1 ulp in backprojection (XLA loop fusion rounding,
    # PERF.md), which registration can amplify into a different
    # similarly-scored assignment — so it only contracts to produce a
    # decodable, finite result, not bitwise equality with single queries
    memory._frame_counter = memory._frame_counter - len(eval_frames)
    scanned = memory.localise_batched(eval_frames, batch_mode="scan",
                                      outlier_removal_config=None)
    for p, (assn, _) in scanned:
        assert np.all(np.isfinite(p)) and len(assn) >= 1
    # chunked-batched serving (one vmapped program per chunk, padded to the
    # chunk size) is also bit-identical to single queries — including when
    # the padding path triggers (batch=3 over 2 frames)
    for batch in (2, 3):
        memory._frame_counter = memory._frame_counter - len(eval_frames)
        chunked = memory.localise_many(eval_frames, batch=batch,
                                       outlier_removal_config=None)
        for (p1, a1), (p2, a2) in zip(singles, chunked):
            np.testing.assert_allclose(p1, p2, atol=0)
            assert a1[0] == a2[0]


@pytest.mark.slow
def test_ransac_partition_knob_quality():
    """The statically-partitioned registration (FPFH+RANSAC only on 1-pair
    assignment slots, centroid-Kabsch init elsewhere — IBL_RANSAC_PAIRS=1,
    the opt-in perf mode) and the reference-grade all-slots-RANSAC program
    (IBL_RANSAC_PAIRS=3, the default) both localise a held-out view within
    the reference's success thresholds (tum_localisation_trial.py:274)."""
    from instance_based_loc_tpu.memory import object_memory as om
    from instance_based_loc_tpu.ops.transforms import quaternion_error

    # the proven-accuracy world of test_memory_e2e.py::test_localise_held_out_view
    focal = 200.0
    scene = default_scene(num_objects=5, seed=3)
    poses = ring_poses(7, radius=4.5, height=1.3, target=(0, 0.4, 0))
    frames = [render_scene(scene, p, 160, 220, focal) for p in poses]
    memory = ObjectMemory(
        detector=ColorRegionDetector(min_area=80,
                                     floor_colors=[scene.floor_color]),
        camera_focal_lenth_x=focal, camera_focal_lenth_y=focal,
        get_embeddings_func=get_embedder("color"), log_enabled=False)
    for i in range(6):
        rgb, depth, _ = frames[i]
        memory.process_image(rgb, depth, poses[i], consider_floor=True,
                             min_points=200, outlier_removal_config=None)
    memory.downsample_all_objects(voxel_size=0.02)
    memory.recluster_objects_with_dbscan(eps=0.1, min_points_per_cluster=40)

    rgb, depth, _ = frames[6]
    true_pose = poses[6]
    saved = om.RANSAC_PAIRS_MAX
    results = {}
    try:
        for knob in (1, 3):
            om.RANSAC_PAIRS_MAX = knob
            memory._frame_counter = 100  # identical per-query keys
            pose, (assn, _) = memory.localise(rgb, depth,
                                              outlier_removal_config=None)
            results[knob] = (pose, assn)
    finally:
        om.RANSAC_PAIRS_MAX = saved

    for knob, (pose, assn) in results.items():
        trans_err = np.linalg.norm(pose[:3] - true_pose[:3])
        rot_err = float(quaternion_error(jnp.asarray(true_pose[3:]),
                                         jnp.asarray(pose[3:])))
        assert trans_err < 0.6, (knob, trans_err)
        assert rot_err < 0.3, (knob, rot_err)
        assert len(assn) >= 1


def test_masked_subsample_linear_contract(rng):
    """The O(P) linear compaction path (image-scale pools) must honor the
    _masked_subsample contract: uniform cap-subset of the valid rows when
    count > cap, ALL valid rows when count <= cap, valid-first output."""
    import jax
    from instance_based_loc_tpu.ops.localise_kernels import (
        _masked_subsample_linear)

    n = 1 << 16
    key = jax.random.PRNGKey(7)

    # sparse: fewer valid rows than the budget -> every one kept exactly
    valid = np.zeros(n, bool)
    chosen = rng.choice(n, size=100, replace=False)
    valid[chosen] = True
    idx, keep = jax.jit(
        lambda v, k: _masked_subsample_linear(v, 256, k))(
            jnp.asarray(valid), key)
    idx, keep = np.asarray(idx), np.asarray(keep)
    assert keep.sum() == 100
    assert keep[:100].all() and not keep[100:].any()   # valid rows first
    assert set(idx[keep]) == set(chosen)

    # dense: more valid than budget -> exactly cap distinct valid rows
    valid = rng.random(n) < 0.5
    idx, keep = jax.jit(
        lambda v, k: _masked_subsample_linear(v, 256, k))(
            jnp.asarray(valid), key)
    idx, keep = np.asarray(idx), np.asarray(keep)
    assert keep.all()
    assert valid[idx].all()
    assert len(set(idx.tolist())) == 256

    # key-dependence: different keys draw different subsets
    idx2, _ = jax.jit(
        lambda v, k: _masked_subsample_linear(v, 256, k))(
            jnp.asarray(valid), jax.random.PRNGKey(8))
    assert set(np.asarray(idx2).tolist()) != set(idx.tolist())


def test_dpad_host_cap(monkeypatch):
    """The host stages at most top_n + IBL_DPAD_MARGIN mask slots, ranked
    by pixel count (one jit bucket regardless of detection count), and the
    pose survives the cap — the dropped masks are exactly the ones the
    device's own top-7 selection would discard."""
    from instance_based_loc_tpu.memory import object_memory as om
    scene = default_scene(num_objects=9, seed=3)
    poses = ring_poses(9, radius=4.5, height=1.3, target=(0, 0.4, 0))
    mem = ObjectMemory(
        detector=ColorRegionDetector(min_area=40,
                                     floor_colors=[scene.floor_color]),
        camera_focal_lenth_x=200.0, camera_focal_lenth_y=200.0,
        get_embeddings_func=get_embedder("color"), log_enabled=False)
    frames = [render_scene(scene, p, 160, 220, 200.0) for p in poses]
    for i in range(6):
        rgb, depth, _ = frames[i]
        mem.process_image(rgb, depth, poses[i], consider_floor=True,
                          min_points=150, outlier_removal_config=None)
    mem.downsample_all_objects(voxel_size=0.02)
    mem.recluster_objects_with_dbscan(eps=0.1, min_points_per_cluster=40)

    rgb, depth, _ = frames[7]
    det = mem.detector.find(rgb, True)
    if len(det) <= 8:
        pytest.skip(f"scene produced only {len(det)} detections")

    hh = mem._localise_host(rgb, depth, outlier_removal_config=None)
    assert hh["dims"][2] == 8          # capped to one pow2 bucket

    monkeypatch.setattr(om, "DPAD_MARGIN", -1)
    hh_full = mem._localise_host(rgb, depth, outlier_removal_config=None)
    assert hh_full["dims"][2] == 16    # stage-everything restores buckets

    pose_cap, _ = mem.localise(rgb, depth, outlier_removal_config=None)
    err = np.linalg.norm(np.asarray(pose_cap[:3])
                         - np.asarray(poses[7][:3]))
    assert err < 0.6, f"capped staging broke localisation ({err:.3f} m)"
