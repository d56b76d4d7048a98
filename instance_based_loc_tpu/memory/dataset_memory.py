"""ObjectDatasetMemory — ReID training-data collection (reference
`object_memory/data_collection.py`, SURVEY.md §2.5): an ObjectMemory variant
that additionally keeps the RGB and depth crops of every observation per
instance and can dump them as a dir-per-instance ReID dataset
(`{name}_{id}/..._rgb.png` + `..._depth.npy` — data_collection.py:208-225),
the format `models.dator.data.scan_instance_dirs` consumes. This closes the
loop: memory build -> ReID dataset -> DATOR training -> better embedder.
"""

from __future__ import annotations

import os

import numpy as np

from .object_memory import ObjectMemory
from .object_info import ObjectInfo
from .phrases import check_if_floor
from ..ops.pointcloud import PointCloud
from ..ops.transforms import transform_pointcloud, transform_pointcloud_kinect
import jax.numpy as jnp


class ObjectDatasetInfo(ObjectInfo):
    """ObjectInfo + per-observation RGB/depth crops
    (data_collection.py:33-56)."""

    def __init__(self, id, name, emb, cloud, max_embeddings_num,
                 rgb_crop, depth_crop):
        super().__init__(id, name, emb, cloud, max_embeddings_num)
        self.rgb_imgs: list[np.ndarray] = [np.asarray(rgb_crop)]
        self.depth_imgs: list[np.ndarray] = [np.asarray(depth_crop)]

    def __add__(self, other):
        super().__add__(other)
        self.rgb_imgs += list(getattr(other, "rgb_imgs", []))
        self.depth_imgs += list(getattr(other, "depth_imgs", []))
        return self

    def __repr__(self):
        return (f"TRAINING INFO OBJ == Names: {self.names}, "
                f"Num. Points: {self.num_points()}, "
                f"Num images: {len(self.rgb_imgs)},{len(self.depth_imgs)}")


class ObjectDatasetMemory(ObjectMemory):
    """process_image keeps crops; dump_dataset writes the ReID training tree."""

    def process_image(self, rgb_image_path, depth_image_path, pose,
                      consider_floor: bool, min_points: int = 500,
                      outlier_removal_config=None, depth_factor: float = 1.0,
                      kinect_frame: bool = False, **kwargs):
        from ..ops.backprojection import mask_pointclouds_from_depth

        rgb, depth = self._load_images(rgb_image_path, depth_image_path,
                                       depth_factor)
        det = (self.detector.find(rgb, consider_floor, depth=depth)
               if getattr(self.detector, "wants_depth", False)
               else self.detector.find(rgb, consider_floor))
        if len(det) == 0:
            self._log("ObjectDatasetMemory.process_image found nothing")
            return
        embs = np.asarray(self.get_embeddings_func(
            detections=det, full_rgb_image=rgb, full_depth_image=depth,
            consider_floor=consider_floor))
        cfg = outlier_removal_config
        batched = mask_pointclouds_from_depth(
            jnp.asarray(depth), jnp.asarray(rgb), jnp.asarray(det.masks),
            jnp.float32(self.camera_focal_lenth_x),
            jnp.float32(self.camera_focal_lenth_y),
            apply_outlier_removal=cfg is not None,
            radius=cfg["radius"] if cfg else 0.05,
            radius_nb_points=cfg["radius_nb_points"] if cfg else 0)
        phrases = det.phrases
        clouds = [PointCloud(batched.points[i], batched.colors[i],
                             batched.mask[i]) for i in range(len(det))]

        pose_j = jnp.asarray(np.asarray(pose, np.float32))
        for i, (phrase, emb, cloud) in enumerate(zip(phrases, embs, clouds)):
            world = (transform_pointcloud_kinect(cloud, pose_j) if kinect_frame
                     else transform_pointcloud(cloud, pose_j))
            if int(np.asarray(world.mask).sum()) < min_points:
                continue
            x1, y1, x2, y2 = det.boxes_xyxy[i].astype(int)
            depth_crop = depth[max(y1, 0):max(y2, y1 + 1),
                               max(x1, 0):max(x2, x1 + 1)]
            new_obj = ObjectDatasetInfo(
                len(self.memory), phrase, emb, world.compact(),
                self.object_info_max_embeddings_num,
                rgb_crop=det.crops[i], depth_crop=depth_crop)
            if check_if_floor(new_obj.names):
                self.floors = new_obj if self.floors is None else self.floors + new_obj
            else:
                self.memory.append(new_obj)
                self._log(f"\tObject Added: {new_obj}")

    def dump_dataset(self, save_dir: str):
        """Write {name}_{id}/obs{k}_rgb.png + obs{k}_depth.npy per instance
        (data_collection.py:208-225)."""
        from PIL import Image
        os.makedirs(save_dir, exist_ok=True)
        for obj in self.memory:
            inst_dir = os.path.join(save_dir, f"{obj.names[0]}_{obj.id}")
            os.makedirs(inst_dir, exist_ok=True)
            for k, (rgb, dep) in enumerate(zip(obj.rgb_imgs, obj.depth_imgs)):
                Image.fromarray(np.asarray(rgb).astype(np.uint8)).save(
                    os.path.join(inst_dir, f"obs{k}_rgb.png"))
                np.save(os.path.join(inst_dir, f"obs{k}_depth.npy"),
                        np.asarray(dep))
        self._log(f"Dumped ReID dataset to {save_dir}")
