"""Mesh-sharded object memory: the memory-side buffers shard over the
mesh's data axis (the workload's scale dimension — SURVEY.md §2.10) and
localisation results match the unsharded path exactly."""

import numpy as np
import jax
import jax.numpy as jnp

from instance_based_loc_tpu.parallel.mesh import make_mesh
from instance_based_loc_tpu.memory import ObjectMemory, ColorRegionDetector
from instance_based_loc_tpu.models.embedders import get_embedder
from instance_based_loc_tpu.data.synthetic import (
    default_scene, render_scene, ring_poses)


def _build(mesh=None):
    scene = default_scene(num_objects=4, seed=3)
    poses = ring_poses(8, radius=4.5, height=1.3, target=(0, 0.4, 0))
    frames = [render_scene(scene, p, 120, 160, 150.0) for p in poses]
    mem = ObjectMemory(
        detector=ColorRegionDetector(min_area=80,
                                     floor_colors=[scene.floor_color]),
        camera_focal_lenth_x=150.0, camera_focal_lenth_y=150.0,
        get_embeddings_func=get_embedder("color"), log_enabled=False,
        mesh=mesh)
    for i in range(6):
        rgb, depth, _ = frames[i]
        mem.process_image(rgb, depth, poses[i], consider_floor=True,
                          min_points=150, outlier_removal_config=None)
    mem.downsample_all_objects(voxel_size=0.02)
    mem.recluster_objects_with_dbscan(eps=0.1, min_points_per_cluster=40)
    return mem, frames


def test_sharded_memory_matches_unsharded():
    mesh = make_mesh(n_data=8, n_model=1)
    plain, frames = _build(mesh=None)
    sharded, _ = _build(mesh=mesh)
    rgb, depth, _ = frames[6]

    pose_a, assn_a = plain.localise(rgb, depth, outlier_removal_config=None)
    sharded._frame_counter = plain._frame_counter - 1  # same PRNG key
    pose_b, assn_b = sharded.localise(rgb, depth, outlier_removal_config=None)

    pack = sharded._pack_memory()
    # the big buffers really live across all 8 devices
    assert len(pack["mem_ex"].sharding.device_set) == 8
    assert len(pack["mem_pts"].sharding.device_set) == 8
    np.testing.assert_allclose(pose_a, pose_b, atol=1e-4)
    assert assn_a[0] == assn_b[0]


def test_m_pad_respects_axis_divisibility():
    mesh = make_mesh(n_data=8, n_model=1)
    sharded, _ = _build(mesh=mesh)
    pack = sharded._pack_memory()
    assert pack["m_pad"] % 8 == 0
