"""In-domain neural quality loop (VERDICT r3 item 2): localisation scene
whose objects wear procedural ReID identities from the SAME generator as
the DATOR training set — retiring the r3 domain-gap excuse — evaluated with
`--embeddings dator --embedder-checkpoint <converged>` through the standard
localisation trial CLI and the reference's own success gate
(trans < 0.6 m AND rot < 0.3 rad, reference tum_localisation_trial.py:274).

Stages:
  1. render the textured scene to the reference synth dataset layout
     (24 ring views; even = memory build, odd = eval)
  2. (--dump-crops) dump dir-per-instance crops from a THIRD pose ring
     (disjoint from build/eval rings) -> extra in-domain training ids
  3. run the localisation trial with the DATOR embedder
  4. print the results.txt success fraction

    python scripts/neural_quality_loop.py --checkpoint /tmp/dator_r4_long/step_240 \
        [--dump-crops /tmp/reid300/train] [--testname neural_loop_r4]
"""

from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", type=str, required=True,
                   help="orbax dir of the trained FourDNet (step_N)")
    p.add_argument("--scene-dir", type=str, default="/tmp/neural_scene_r4")
    p.add_argument("--num-objects", type=int, default=9)
    p.add_argument("--n-views", type=int, default=24)
    p.add_argument("--height", type=int, default=240)
    p.add_argument("--width", type=int, default=320)
    p.add_argument("--focal", type=float, default=300.0)
    p.add_argument("--testname", type=str, default="neural_loop_r4")
    p.add_argument("--dump-crops", type=str, default=None,
                   help="ALSO dump in-domain crops from a disjoint pose "
                        "ring into this ReID train root (dir-per-instance)")
    p.add_argument("--embeddings", type=str, default="dator")
    p.add_argument("--scene-seed", type=int, default=3)
    p.add_argument("--id-seed", type=int, default=0,
                   help="identity-latent stream seed for the scene "
                        "textures. 0 = the training generator's stream "
                        "(in-domain); any other value draws identities the "
                        "embedder has NEVER seen (held-out-scene "
                        "generalisation, VERDICT r4 item 5)")
    args = p.parse_args()

    from instance_based_loc_tpu.data.synthetic import (textured_scene,
                                                       write_synth_dataset)

    scene = textured_scene(num_objects=args.num_objects,
                           seed=args.scene_seed, id_seed=args.id_seed)
    write_synth_dataset(args.scene_dir, scene=scene, n_views=args.n_views,
                        height=args.height, width=args.width,
                        focal_length=args.focal)
    print(f"scene written: {args.scene_dir} ({args.n_views} views, "
          f"{args.num_objects} textured identities)")

    if args.dump_crops:
        _dump_crops(args, scene)

    eval_idx = [str(i) for i in range(1, args.n_views, 2)]
    from instance_based_loc_tpu.cli.localisation_trial import (
        apply_convention_defaults, main as trial, make_parser)
    targs = apply_convention_defaults(make_parser().parse_args(
        ["--convention", "synth", "--data-path", args.scene_dir,
         "--embeddings", args.embeddings,
         "--embedder-checkpoint", args.checkpoint,
         "--detector", "depth", "-e", *eval_idx,
         "--consider-floor", "--min-points", "500",
         "--no-outlier-removal", "--testname", args.testname]))
    trial(targs)

    res = os.path.join("out", f"{args.testname}_results.txt")
    if os.path.exists(res):
        with open(res) as f:
            for line in f:
                if "Success" in line:
                    print(line.rstrip())


def _dump_crops(args, scene):
    """Crops from a pose ring disjoint from both the trial's build (even)
    and eval (odd) rings: different radius/height so no trial frame is in
    the training set."""
    import numpy as np
    from instance_based_loc_tpu.data.synthetic import render_scene, ring_poses
    from instance_based_loc_tpu.memory import DepthRegionDetector
    from instance_based_loc_tpu.memory.dataset_memory import (
        ObjectDatasetMemory)
    from instance_based_loc_tpu.models.embedders import get_embedder

    detector = DepthRegionDetector(args.focal, args.focal, min_area=200)
    memory = ObjectDatasetMemory(
        detector=detector, camera_focal_lenth_x=args.focal,
        camera_focal_lenth_y=args.focal,
        get_embeddings_func=get_embedder("color"), log_enabled=False)
    poses = (ring_poses(10, radius=3.9, height=1.0, target=(0, 0.4, 0))
             + ring_poses(10, radius=5.1, height=1.7, target=(0, 0.4, 0)))
    for pose in poses:
        rgb, depth, _ = render_scene(scene, pose, args.height, args.width,
                                     args.focal)
        memory.process_image(rgb, depth, pose, consider_floor=True,
                             min_points=300, outlier_removal_config=None)
    memory.downsample_all_objects(voxel_size=0.02)
    memory.recluster_objects_with_dbscan(eps=0.1, min_points_per_cluster=40)
    memory.dump_dataset(args.dump_crops)
    import glob
    n = len(glob.glob(os.path.join(args.dump_crops, "*", "*_rgb.png")))
    print(f"dumped in-domain crops: {len(memory.memory)} instances -> "
          f"{args.dump_crops} ({n} total rgb crops in root)")


if __name__ == "__main__":
    main()
