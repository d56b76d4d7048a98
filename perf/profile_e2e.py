import os, sys
sys.path.insert(0, "/root/repo")
import numpy as np
from instance_based_loc_tpu.data.synthetic import (default_scene, render_scene,
                                                   ring_poses)
from instance_based_loc_tpu.memory import ObjectMemory, ColorRegionDetector
from instance_based_loc_tpu.models.embedders import get_embedder
from instance_based_loc_tpu.utils.profiling import device_trace

focal, h, w = 200.0, 160, 220
scene = default_scene(num_objects=5, seed=3)
poses = ring_poses(9, radius=4.5, height=1.3, target=(0, 0.4, 0))
frames = [render_scene(scene, p, h, w, focal) for p in poses]
memory = ObjectMemory(detector=ColorRegionDetector(min_area=80,
                                                   floor_colors=[scene.floor_color]),
                      camera_focal_lenth_x=focal, camera_focal_lenth_y=focal,
                      get_embeddings_func=get_embedder("color"),
                      log_enabled=False)
for i in range(6):
    rgb, depth, _ = frames[i]
    memory.process_image(rgb, depth, poses[i], consider_floor=True,
                         min_points=200, outlier_removal_config=None)
memory.downsample_all_objects(voxel_size=0.02)
memory.recluster_objects_with_dbscan(eps=0.1, min_points_per_cluster=40)
stream = [(frames[i][0], frames[i][1]) for i in (6, 7, 8)] * 2
for rgb, depth, _ in (frames[i] for i in (6, 7, 8)):
    memory.localise(rgb, depth, outlier_removal_config=None)   # compile
with device_trace("/tmp/trace_r2"):
    memory.localise_many(stream, outlier_removal_config=None)
print("trace written")
