"""Serving-mode perf experiment (PERF.md evidence): measures ms/frame for
the pipelined (overlap on/off), scan-batched and vmap-batched localisation
paths on the bench workload, at the current knob defaults and at
reference-grade knobs.

Run on the tunneled chip:   python perf/serving_modes.py
Run on CPU (sanity only):   PYTHONPATH=. JAX_PLATFORMS=cpu python perf/serving_modes.py

One TPU job at a time — see .claude/skills/verify/SKILL.md.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import instance_based_loc_tpu.memory.object_memory as om
from instance_based_loc_tpu.data.synthetic import (default_scene, render_scene,
                                                   ring_poses)
from instance_based_loc_tpu.memory import ObjectMemory, ColorRegionDetector
from instance_based_loc_tpu.models.embedders import get_embedder
from instance_based_loc_tpu.utils.metrics import pose_errors


def build_memory():
    focal, h, w = 200.0, 160, 220
    scene = default_scene(num_objects=5, seed=3)
    poses = ring_poses(9, radius=4.5, height=1.3, target=(0, 0.4, 0))
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
    return memory, frames, poses


def measure(memory, frames, poses, tag):
    stream = [(frames[i][0], frames[i][1]) for i in (6, 7, 8)] * 4
    n = len(stream)
    for rgb, depth, _ in (frames[i] for i in (6, 7, 8)):   # warm compiles
        memory.localise(rgb, depth, outlier_removal_config=None)
    runs = [
        ("many+overlap", lambda: memory.localise_many(
            stream, overlap=True, outlier_removal_config=None)),
        ("many", lambda: memory.localise_many(
            stream, overlap=False, outlier_removal_config=None)),
        ("vmap", lambda: memory.localise_batched(
            stream, batch_mode="vmap", outlier_removal_config=None)),
        ("scan", lambda: memory.localise_batched(
            stream, batch_mode="scan", outlier_removal_config=None)),
        # chunked-batched + overlap: per-program tunnel overhead amortized
        # over the chunk while host prep overlaps the previous chunk's fetch
        ("chunk4+overlap", lambda: memory.localise_many(
            stream, batch=4, outlier_removal_config=None)),
        ("chunk6+overlap", lambda: memory.localise_many(
            stream, batch=6, outlier_removal_config=None)),
    ]
    for name, run in runs:
        best, res = np.inf, None
        for _ in range(3):
            t0 = time.perf_counter()
            r = run()
            dt = time.perf_counter() - t0
            if dt < best:
                best, res = dt, r
        errs = [round(pose_errors(poses[i], p)[0], 3)
                for (p, _), i in zip(res[:3], (6, 7, 8))]
        print(f"{tag:22s} {name:13s} {best / n * 1000:6.1f} ms/frame "
              f"{n / best:5.1f} fps  trans_errs={errs}", flush=True)


def main():
    memory, frames, poses = build_memory()
    measure(memory, frames, poses, "trimmed-defaults")
    om.ICP_FINE_ITERS = 20
    om.NUM_HYPOTHESES = 1024
    om.EVAL_CAPACITY = 4096
    measure(memory, frames, poses, "reference-grade")


if __name__ == "__main__":
    main()
