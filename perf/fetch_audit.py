"""Audit the localise packed-output fetch at reference scale (VERDICT r4
item 7: loc.fetch was 367.7 ms/batch-of-6 at 640x480/9-obj vs 155 ms at toy
scale). Prints every leaf of the packed spec with its byte count, so the
trim targets are measured, not guessed.

    JAX_PLATFORMS=cpu python perf/fetch_audit.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    from instance_based_loc_tpu.data.synthetic import (default_scene,
                                                       render_scene,
                                                       ring_poses)
    from instance_based_loc_tpu.memory import (ObjectMemory,
                                               ColorRegionDetector)
    from instance_based_loc_tpu.models.embedders import get_embedder

    focal, h, w, n_obj, min_area = 525.0, 480, 640, 9, 500
    scene = default_scene(num_objects=n_obj, seed=3)
    poses = ring_poses(9, radius=4.5, height=1.3, target=(0, 0.4, 0))
    frames = [render_scene(scene, p, h, w, focal) for p in poses]

    detector = ColorRegionDetector(min_area=min_area,
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

    rgb, depth, _ = frames[6]
    handle = memory.localise_dispatch(rgb, depth,
                                      outlier_removal_config=None)
    total = 0
    rows = []
    for (shape, dtype) in handle["specs"]:
        n = int(np.prod(shape)) if shape else 1
        b = n * 4  # everything travels f32-packed
        total += b
        rows.append((b, shape, str(dtype)))
    # leaf names come from the treedef (dict keys in sorted order)
    import jax
    names = []

    def walk(td):
        # rebuild key order: packed output is a flat dict -> sorted keys
        pass

    # decode names by rebuilding the tree with indices
    idx_tree = jax.tree_util.tree_unflatten(
        handle["treedef"], list(range(len(handle["specs"]))))
    flat_names = {}
    if isinstance(idx_tree, dict):
        for k, v in idx_tree.items():
            leaves = jax.tree_util.tree_leaves(v)
            for leaf in leaves:
                flat_names[leaf] = k
    print(f"packed fetch leaves ({len(rows)}), one frame, "
          f"{w}x{h}/{n_obj}obj:")
    for i, (b, shape, dt) in sorted(enumerate(rows),
                                    key=lambda t: -t[1][0]):
        name = flat_names.get(i, "?")
        print(f"  {name:16s} {str(shape):22s} {dt:8s} {b/1024:9.1f} KiB")
    print(f"TOTAL {total/1024:.1f} KiB/frame -> "
          f"{6*total/1024:.1f} KiB/batch-of-6 "
          f"(~{6*total/1024/1024/30*1000:.0f} ms at 30 MB/s tunnel)")


if __name__ == "__main__":
    main()
