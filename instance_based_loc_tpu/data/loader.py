"""One parameterised RGB-D dataset loader covering the five reference dataset
conventions (SURVEY.md §2.1 — the reference has five near-identical loader
classes; the TPU build folds them into a convention table):

| convention | poses | depth | pose quirks | map build |
|---|---|---|---|---|
| synth  | poses.json euler-degrees (`synthetic_dataloader.py:47-58`) | .npy, /1     | — | every frame |
| tum    | groundtruth.txt (`tum_dataloader.py:59-78`) | 16-bit png, /5000 | R1@R2 kinect fix, negated t, kinect transform | every 50th, voxel 0.025 |
| real   | poses_odom.txt skip header, cols 1:-1 (`real_dataloader.py:58-69`) | png, /1000 | — | every frame |
| 8room  | per-frame pose/ files, `ast.literal_eval` (`eightroom_dataloader.py:67-90`) | png, /1000 | rot_correction on euler x | disabled |
| hm3d   | poses.npy (`hm3d_dataloder.py:70-75`) | .npy squeezed, /1 | pose[-2] *= -1 | every frame |

The map pointcloud is built with the jitted geometry kernels and cached as
.npz (the reference caches .pcd via Open3D — `tum_dataloader.py:80-93`).
"""

from __future__ import annotations

import ast
import json
import os
import re
from typing import Optional, Sequence

import numpy as np

from ..ops.pointcloud import PointCloud
from ..ops.backprojection import pointcloud_from_depth
from ..ops.transforms import transform_pointcloud, transform_pointcloud_kinect
from ..ops.voxel import voxel_downsample
from ..ops.frustum import get_visible_pointcloud
from ..ops.outliers import DEFAULT_OUTLIER_REMOVAL_CONFIG


def natsort_key(s: str):
    """Natural sort key (replacement for the natsort dependency)."""
    return [int(tok) if tok.isdigit() else tok.lower()
            for tok in re.split(r"(\d+)", os.path.basename(s))]


def _listdir_sorted(path: str) -> list[str]:
    return [os.path.join(path, f) for f in sorted(os.listdir(path), key=natsort_key)]


def load_rgb(path: str) -> np.ndarray:
    from PIL import Image
    img = np.asarray(Image.open(path))
    if img.ndim == 2:
        img = np.stack([img] * 3, axis=-1)
    return img[..., :3]


def load_depth(path: str) -> np.ndarray:
    if path.endswith(".npy"):
        return np.squeeze(np.load(path)).astype(np.float32)
    from PIL import Image
    return np.asarray(Image.open(path)).astype(np.float32)


CONVENTIONS = {
    "synth": dict(depth_factor=1.0, kinect=False, map_every=1, map_voxel=None),
    "tum": dict(depth_factor=5000.0, kinect=True, map_every=50, map_voxel=0.025),
    "real": dict(depth_factor=1000.0, kinect=False, map_every=1, map_voxel=None),
    "8room": dict(depth_factor=1000.0, kinect=False, map_every=1, map_voxel=None,
                  map_disabled=True),
    "hm3d": dict(depth_factor=1.0, kinect=False, map_every=1, map_voxel=None),
}


class RGBDDataset:
    """Reference `BaseDataLoader` equivalent (base_dataloader.py:7-90) with the
    per-dataset subclasses folded into a `convention` parameter."""

    def __init__(
        self,
        data_path: str,
        evaluation_indices: Optional[Sequence[int]],
        convention: str = "synth",
        focal_length_x: Optional[float] = None,
        focal_length_y: Optional[float] = None,
        map_pointcloud_cache_path: Optional[str] = None,
        start_file_index: int = 0,
        last_file_index: Optional[int] = None,
        sampling_period: int = 1,
        rot_correction: float = 0.0,
        build_map: bool = True,
        map_outlier_config: Optional[dict] = DEFAULT_OUTLIER_REMOVAL_CONFIG,
    ):
        assert convention in CONVENTIONS, f"unknown convention {convention}"
        self.convention = convention
        self.spec = CONVENTIONS[convention]
        self.data_path = data_path
        self.evaluation_indices = list(evaluation_indices or [])
        self.focal_length_x = focal_length_x
        self.focal_length_y = focal_length_y
        self.map_outlier_config = map_outlier_config
        self.depth_factor = self.spec["depth_factor"]

        self._rgb_images_paths = _listdir_sorted(os.path.join(data_path, "rgb"))
        self._depth_images_paths = _listdir_sorted(os.path.join(data_path, "depth"))
        assert len(self._rgb_images_paths) == len(self._depth_images_paths), \
            "No. of depth and RGB images are not the same!"

        self._poses = self._parse_poses(rot_correction)

        sl = slice(start_file_index, last_file_index, sampling_period)
        self._rgb_images_paths = self._rgb_images_paths[sl]
        self._depth_images_paths = self._depth_images_paths[sl]
        self._poses = self._poses[sl]

        self.map_pointcloud: Optional[PointCloud] = None
        if build_map and not self.spec.get("map_disabled", False):
            cache = map_pointcloud_cache_path
            if cache is not None and os.path.exists(cache):
                data = np.load(cache)
                self.map_pointcloud = PointCloud.from_numpy(data["points"], data["colors"])
            else:
                self.setup_map_pointcloud()
                if cache is not None:
                    pts, cols = self.map_pointcloud.to_numpy()
                    os.makedirs(os.path.dirname(os.path.abspath(cache)), exist_ok=True)
                    np.savez(cache, points=pts, colors=cols)

    # ------------------------------------------------------------------ #
    # pose parsing per convention
    # ------------------------------------------------------------------ #
    def _parse_poses(self, rot_correction: float) -> list[np.ndarray]:
        from scipy.spatial.transform import Rotation

        conv = self.convention
        poses: list[np.ndarray] = []
        if conv == "synth":
            with open(os.path.join(self.data_path, "poses.json")) as f:
                for view in json.load(f)["views"]:
                    t = np.array([view["position"]["x"], view["position"]["y"],
                                  view["position"]["z"]])
                    e = [view["rotation"]["x"], view["rotation"]["y"], view["rotation"]["z"]]
                    q = Rotation.from_euler("xyz", e, degrees=True).as_quat()
                    poses.append(np.concatenate([t, q]))
        elif conv == "tum":
            r2 = Rotation.from_euler("xyz", [0, np.pi, 0]).as_matrix()
            with open(os.path.join(self.data_path, "groundtruth.txt")) as f:
                for line in f:
                    line = line.strip()
                    if not line or line.startswith("#"):
                        continue
                    vals = line.split()
                    # reference treats columns [0:3] as t and [3:] as quat
                    # (tum_dataloader.py:63-75); kinect frame fix: R1 @ R2, -t
                    r1 = Rotation.from_quat([float(v) for v in vals[3:7]]).as_matrix()
                    q = Rotation.from_matrix(r1 @ r2).as_quat()
                    t = -np.array([float(v) for v in vals[0:3]])
                    poses.append(np.concatenate([t, q]))
        elif conv == "real":
            with open(os.path.join(self.data_path, "poses_odom.txt")) as f:
                for line in f.readlines()[1:]:
                    vals = line.split()
                    poses.append(np.array([float(v) for v in vals[1:-1]]))
        elif conv == "8room":
            pose_paths = _listdir_sorted(os.path.join(self.data_path, "pose"))
            for path in pose_paths:
                with open(path) as f:
                    pose_dict = ast.literal_eval(f.read())
                t = np.array([pose_dict[0]["x"], pose_dict[0]["y"], pose_dict[0]["z"]])
                e = [pose_dict[1]["x"] + rot_correction, pose_dict[1]["y"], pose_dict[1]["z"]]
                q = Rotation.from_euler("xyz", e, degrees=True).as_quat()
                poses.append(np.concatenate([t, q]))
        elif conv == "hm3d":
            for pose in np.load(os.path.join(self.data_path, "poses.npy")):
                adjusted = np.array(pose, dtype=np.float64)
                adjusted[-2] *= -1  # hm3d_dataloder.py:70-75
                poses.append(adjusted)
        return poses

    # ------------------------------------------------------------------ #
    # BaseDataLoader API (base_dataloader.py:27-90)
    # ------------------------------------------------------------------ #
    @property
    def environment_indices(self) -> list[int]:
        return [i for i in range(len(self._rgb_images_paths))
                if i not in self.evaluation_indices]

    def __len__(self) -> int:
        return len(self._rgb_images_paths)

    def get_image_data(self, index: int):
        return (self._rgb_images_paths[index], self._depth_images_paths[index],
                self._poses[index])

    def load_depth_scaled(self, index: int) -> np.ndarray:
        return load_depth(self._depth_images_paths[index]) / self.depth_factor

    def _transform(self, cloud: PointCloud, pose: np.ndarray) -> PointCloud:
        import jax.numpy as jnp
        pose = jnp.asarray(pose, jnp.float32)
        if self.spec["kinect"]:
            return transform_pointcloud_kinect(cloud, pose)
        return transform_pointcloud(cloud, pose)

    def setup_map_pointcloud(self) -> None:
        """Build the environment map: backproject every map_every-th env frame,
        transform to world, merge, optionally voxel-downsample
        (tum_dataloader.py:95-112 and synth equivalent)."""
        from ..ops.native import radius_outlier_native

        pts_acc, col_acc = [], []
        env = self.environment_indices[:: self.spec["map_every"]]
        for idx in env:
            rgb = load_rgb(self._rgb_images_paths[idx])
            depth = self.load_depth_scaled(idx)
            # outlier removal runs on the native host helper here: map
            # building is one-off host-side prep on full frames (~300k
            # points), where the O(N^2) device kernel is right for TPU
            # object clouds but pathological on the CPU fallback platform
            cloud = pointcloud_from_depth(
                depth, self.focal_length_x, self.focal_length_y, rgb=rgb,
                outlier_removal_config=None)
            world = self._transform(cloud, self._poses[idx])
            p, c = world.to_numpy()
            if self.map_outlier_config is not None and len(p):
                keep = radius_outlier_native(
                    p, self.map_outlier_config["radius"],
                    self.map_outlier_config["radius_nb_points"])
                if keep is None:   # no native lib: keep the device kernel
                    from ..ops.outliers import radius_outlier_keep_mask
                    import jax.numpy as jnp
                    keep = np.asarray(radius_outlier_keep_mask(
                        jnp.asarray(p), jnp.ones(len(p), bool),
                        radius=self.map_outlier_config["radius"],
                        nb_points=self.map_outlier_config["radius_nb_points"]))
                p, c = p[keep], c[keep]
            pts_acc.append(p)
            col_acc.append(c)
        pts = np.concatenate(pts_acc) if pts_acc else np.zeros((0, 3), np.float32)
        cols = np.concatenate(col_acc) if col_acc else np.zeros((0, 3), np.float32)
        merged = PointCloud.from_numpy(pts, cols)
        if self.spec["map_voxel"] is not None:
            merged = voxel_downsample(merged, self.spec["map_voxel"]).compact()
        self.map_pointcloud = merged

    def get_pointcloud(self, bounding_box=None) -> PointCloud:
        if bounding_box is not None:
            raise NotImplementedError
        return self.map_pointcloud

    def get_visible_pointcloud(self, pose, fov, near_clip, far_clip) -> PointCloud:
        return get_visible_pointcloud(self.map_pointcloud, np.asarray(pose, np.float32),
                                      fov, near_clip, far_clip)
