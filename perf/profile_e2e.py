"""jax.profiler trace of the e2e localisation serving path (VERDICT r4
item 3: attribute the reference-scale device program — 1.9 s/batch-of-6 at
640x480/9obj vs ~36 ms/query at toy scale).

    python perf/profile_e2e.py [--scale small|ref] [--batch 6] [--out DIR]

Decompose the written trace with perf/analyze_trace.py.
"""

import argparse
import os
import sys

sys.path.insert(0, "/root/repo")
import numpy as np  # noqa: E402

from instance_based_loc_tpu.data.synthetic import (default_scene,  # noqa: E402
                                                   render_scene, ring_poses)
from instance_based_loc_tpu.memory import (ObjectMemory,  # noqa: E402
                                           ColorRegionDetector)
from instance_based_loc_tpu.models.embedders import get_embedder  # noqa: E402
from instance_based_loc_tpu.utils.profiling import device_trace  # noqa: E402

p = argparse.ArgumentParser()
p.add_argument("--scale", default="ref", choices=("small", "ref"))
p.add_argument("--batch", type=int, default=6)
p.add_argument("--out", default="/tmp/trace_e2e")
args = p.parse_args()

if args.scale == "small":
    focal, h, w, n_obj, min_area = 200.0, 160, 220, 5, 80
else:
    focal, h, w, n_obj, min_area = 525.0, 480, 640, 9, 500

scene = default_scene(num_objects=n_obj, seed=3)
poses = ring_poses(9, radius=4.5, height=1.3, target=(0, 0.4, 0))
frames = [render_scene(scene, p_, h, w, focal) for p_ in poses]
memory = ObjectMemory(detector=ColorRegionDetector(min_area=min_area,
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
stream = [(frames[i][0], frames[i][1]) for i in (6, 7, 8)] * 4
# compile pass outside the trace (covers the batched program shape)
memory.localise_many(stream[:args.batch], batch=args.batch,
                     outlier_removal_config=None)
memory.timer.totals.clear()
memory.timer.counts.clear()
with device_trace(args.out):
    memory.localise_many(stream, batch=args.batch,
                         outlier_removal_config=None)
print(memory.timer.report())
print(f"trace written to {args.out}")
