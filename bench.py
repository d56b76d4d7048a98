"""End-to-end localisation benchmark (driver contract: ONE JSON line).

Metric: RGB-D localisation frames/sec/chip — detect + embed + assignment
search + registration against a built object memory (the reference pipeline's
serve() path, SURVEY.md §3.2). Baseline: the BASELINE.json north star of
30 fps/chip on TPU v5e.

Uses the procedural synthetic world with the weights-free detector/embedder so
the benchmark measures the TPU compute path (backprojection, outlier removal,
assignment top-k, FPFH+RANSAC+ICP registration, pose evaluation) without
model-download dependencies.
"""

from __future__ import annotations

import json
import time

import numpy as np

NORTH_STAR_FPS = 30.0


def main():
    from instance_based_loc_tpu.data.synthetic import (
        default_scene, render_scene, ring_poses)
    from instance_based_loc_tpu.memory import ObjectMemory, ColorRegionDetector
    from instance_based_loc_tpu.models.embedders import get_embedder

    focal, h, w = 200.0, 160, 220
    scene = default_scene(num_objects=5, seed=3)
    poses = ring_poses(9, radius=4.5, height=1.3, target=(0, 0.4, 0))
    frames = [render_scene(scene, p, h, w, focal) for p in poses]

    detector = ColorRegionDetector(min_area=80, floor_colors=[scene.floor_color])
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

    eval_frames = [frames[i] for i in (6, 7, 8)]

    # warmup (compiles every kernel in the pipeline)
    rgb, depth, _ = eval_frames[0]
    memory.localise(rgb, depth, outlier_removal_config=None)

    t0 = time.perf_counter()
    n_runs = 0
    for _ in range(2):
        for rgb, depth, _ in eval_frames:
            memory.localise(rgb, depth, outlier_removal_config=None)
            n_runs += 1
    elapsed = time.perf_counter() - t0
    fps = n_runs / elapsed

    print(json.dumps({
        "metric": "e2e_localisation_fps_per_chip",
        "value": round(fps, 3),
        "unit": "frames/sec",
        "vs_baseline": round(fps / NORTH_STAR_FPS, 4),
    }))


if __name__ == "__main__":
    main()
