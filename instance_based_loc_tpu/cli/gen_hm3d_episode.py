"""HM3D-layout episode generator (reference `hm3d_data_generation.py` /
`hm3d_data_testing.py` role).

The reference renders Habitat-Sim InstanceImageNav episodes (HM3D scenes,
ShortestPathFollower trajectories) into `rgb/ depth/ poses.npy` directories.
habitat-sim is a GL simulator with no build in this environment, so real
HM3D scene rendering is N/A here; this CLI reproduces the PIPELINE role —
generate agent-trajectory episodes in the exact directory layout the hm3d
loader convention consumes (`data/loader.py` hm3d spec: poses.npy with the
pose[-2] sign flip, .npy depth, depth factor 1) — from the procedural
synthetic renderer, so the hm3d data path is exercisable end to end. Point
`--data-path` at real habitat-generated episodes for production runs.

    python -m instance_based_loc_tpu.cli.gen_hm3d_episode \
        --out /tmp/hm3d_ep --timesteps 40
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def generate_episode(out_dir: str, timesteps: int = 40, seed: int = 0,
                     height: int = 240, width: int = 320,
                     focal: float = 300.0):
    """Random-walk agent trajectory (move forward / turn, like the shortest
    path follower's action space) rendered to the hm3d layout."""
    from PIL import Image
    from ..data.synthetic import default_scene, render_scene, look_at_pose

    rng = np.random.default_rng(seed)
    scene = default_scene(num_objects=6, seed=seed)
    os.makedirs(os.path.join(out_dir, "rgb"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "depth"), exist_ok=True)

    poses = []
    pos = np.array([0.0, 1.2, 4.5])
    yaw = np.pi
    for t in range(timesteps):
        action = rng.choice(["forward", "left", "right"], p=[0.6, 0.2, 0.2])
        if action == "forward":
            step = 0.25 * np.array([np.sin(yaw), 0.0, np.cos(yaw)])
            nxt = pos + step
            if np.linalg.norm(nxt[[0, 2]]) < 5.5:     # stay in the room
                pos = nxt
        elif action == "left":
            yaw += np.deg2rad(15)
        else:
            yaw -= np.deg2rad(15)
        target = pos + np.array([np.sin(yaw), -0.05, np.cos(yaw)])
        pose = look_at_pose(pos, target)
        rgb, depth, _ = render_scene(scene, pose, height, width, focal)
        Image.fromarray(rgb).save(
            os.path.join(out_dir, "rgb", f"frame_{t:05d}.png"))
        np.save(os.path.join(out_dir, "depth", f"frame_{t:05d}.npy"),
                depth.astype(np.float32))
        stored = np.asarray(pose, np.float64).copy()
        stored[-2] *= -1   # inverse of the loader's hm3d sign fix
        poses.append(stored)
    np.save(os.path.join(out_dir, "poses.npy"), np.stack(poses))
    with open(os.path.join(out_dir, "episode_info.txt"), "w") as f:
        f.write(f"synthetic hm3d-layout episode\ntimesteps={timesteps}\n"
                f"focal={focal}\nheight={height}\nwidth={width}\nseed={seed}\n")
    return out_dir


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--out", type=str, required=True)
    p.add_argument("--timesteps", type=int, default=40)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--height", type=int, default=240)
    p.add_argument("--width", type=int, default=320)
    p.add_argument("--focal", type=float, default=300.0)
    args = p.parse_args(argv)
    generate_episode(args.out, args.timesteps, args.seed, args.height,
                     args.width, args.focal)
    print(f"episode written to {args.out}")


if __name__ == "__main__":
    main()
