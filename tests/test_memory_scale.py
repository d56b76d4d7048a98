"""Serving at production memory sizes: the localise kernels must keep
working (and choosing the RIGHT objects) when the memory holds ~100
instances — the m_pad=128 capacity bucket, a SimVolume over 129^3-entry
subvolumes, and a detections x memory similarity with heavy distractor
mass. The reference was only ever run with tens of objects; scale in this
workload means more memory objects, not longer sequences (SURVEY.md §2.10).
"""

import numpy as np
import pytest

from instance_based_loc_tpu.data.synthetic import (default_scene,
                                                   render_scene, ring_poses)
from instance_based_loc_tpu.memory import ObjectMemory, ColorRegionDetector
from instance_based_loc_tpu.memory.object_info import ObjectInfo
from instance_based_loc_tpu.models.embedders import get_embedder
from instance_based_loc_tpu.utils.metrics import pose_errors, is_success

pytestmark = pytest.mark.slow


def test_localise_with_100_object_memory():
    rng = np.random.default_rng(7)
    focal, h, w = 200.0, 160, 220
    scene = default_scene(num_objects=5, seed=3)
    poses = ring_poses(8, radius=4.5, height=1.3, target=(0, 0.4, 0))
    frames = [render_scene(scene, p, h, w, focal) for p in poses]
    detector = ColorRegionDetector(min_area=80,
                                   floor_colors=[scene.floor_color])
    memory = ObjectMemory(detector=detector, camera_focal_lenth_x=focal,
                          camera_focal_lenth_y=focal,
                          get_embeddings_func=get_embedder("color"),
                          log_enabled=False)
    for i in range(6):
        rgb, depth, _ = frames[i]
        memory.process_image(rgb, depth, poses[i], consider_floor=True,
                             min_points=200, outlier_removal_config=None)
    memory.downsample_all_objects(voxel_size=0.02)
    memory.recluster_objects_with_dbscan(eps=0.1, min_points_per_cluster=40)
    n_real = len(memory.memory)
    assert n_real >= 3

    # inflate with far-away distractor instances: random clouds 40-80 m out
    # with random embeddings — the similarity search and SimVolume must not
    # route assignments through them
    e_dim = memory.memory[0].mean_emb.shape[0]
    next_id = max(o.id for o in memory.memory) + 1
    while len(memory.memory) + 1 <= 100:
        center = rng.uniform(-1, 1, 3) * 60 + np.array([0, 0, -80])
        pts = (center + rng.normal(0, 0.3, (300, 3))).astype(np.float32)
        cols = rng.uniform(0, 1, (300, 3)).astype(np.float32)
        emb = rng.normal(0, 1, e_dim).astype(np.float32)
        memory.memory.append(ObjectInfo(next_id, f"distractor_{next_id}",
                                        emb, (pts, cols)))
        next_id += 1
    memory._invalidate_pack()
    assert len(memory.memory) == 100

    rgb, depth, _ = frames[6]
    est, (assn, _) = memory.localise(rgb, depth,
                                     outlier_removal_config=None)
    te, re_ = pose_errors(poses[6], est)
    # every assigned memory object must be one of the real scene instances
    real_ids = set(range(n_real))
    assert assn and all(m in real_ids for _, m in assn), assn
    assert is_success(te, re_), (te, re_)
