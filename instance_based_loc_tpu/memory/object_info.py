"""Per-instance record (reference `object_memory/object_info.py`).

Host-side container: names, exemplar embeddings (with a budget), and a padded
PointCloud. Geometry ops (downsample, masking, centroid) call the jitted
kernels; bookkeeping stays numpy.
"""

from __future__ import annotations

import os
import pickle

import numpy as np

from ..ops.pointcloud import PointCloud, round_up_pow2
from ..ops.voxel import voxel_downsample


class ObjectInfo:
    """One object instance in memory (object_info.py:7-118)."""

    def __init__(self, id: int, name: str, emb: np.ndarray,
                 cloud: PointCloud, max_embeddings_num: int = 1_000_000):
        self.id = id
        self.names: list[str] = [name]
        self.embeddings: list[np.ndarray] = [np.asarray(emb)]
        self.cloud = cloud
        self.max_embeddings_num = int(max_embeddings_num)
        self.mean_emb: np.ndarray | None = None
        self.centroid: np.ndarray | None = None
        self._compute_means()

    # ------------------------------------------------------------------ #
    def __repr__(self):
        return (f"ObjectInfo == ID: {self.id}, Names: {self.names}, "
                f"Mean_Emb: {self.mean_emb.shape}, Num. Points: {self.num_points()}")

    def _numpy_cloud(self):
        """Cached host copy — localise touches every memory object per query
        and a device->host fetch costs ~30 ms of tunnel latency each."""
        if getattr(self, "_np_src", None) is not self.cloud:
            self._np_cache = self.cloud.to_numpy()
            self._np_src = self.cloud
        return self._np_cache

    def num_points(self) -> int:
        return len(self._numpy_cloud()[0])

    def points(self) -> np.ndarray:
        return self._numpy_cloud()[0]

    # ------------------------------------------------------------------ #
    def _add_name(self, new_name: str):
        if new_name not in self.names:
            self.names.append(new_name)

    def _add_embedding(self, new_emb: np.ndarray):
        """Budgeted exemplar set. Below budget: append (the reference default
        budget of 1e6 makes this the only live path — object_info.py:38-41).
        At budget: replace the most redundant exemplar (smallest distance to
        another exemplar) if the new embedding is more diverse; this is a
        cleaned-up version of the reference's KNN eviction whose
        second-nearest bookkeeping always replaced (object_info.py:43-57)."""
        new_emb = np.asarray(new_emb)
        if len(self.embeddings) < self.max_embeddings_num:
            self.embeddings.append(new_emb)
            return
        arr = np.stack(self.embeddings)
        d = np.linalg.norm(arr[:, None] - arr[None, :], axis=-1)
        np.fill_diagonal(d, np.inf)
        redundancy = d.min(1)
        victim = int(np.argmin(redundancy))
        new_min_dist = np.linalg.norm(arr - new_emb, axis=-1).min()
        if new_min_dist > redundancy[victim]:
            self.embeddings[victim] = new_emb

    def _add_embeddings(self, new_embs: list[np.ndarray]):
        self.embeddings += [np.asarray(e) for e in new_embs]

    def _add_cloud(self, new_cloud: PointCloud):
        p1, c1 = self.cloud.to_numpy()
        p2, c2 = new_cloud.to_numpy()
        pts = np.concatenate([p1, p2])
        cols = np.concatenate([c1, c2])
        self.cloud = PointCloud.from_numpy(pts, cols)

    def _compute_means(self):
        self.mean_emb = np.mean(np.stack(self.embeddings), axis=0).squeeze()
        pts = self.points()
        self.centroid = pts.mean(0) if len(pts) else np.zeros(3)

    # ------------------------------------------------------------------ #
    def __add__(self, other: "ObjectInfo") -> "ObjectInfo":
        """Merge `other` into self (object_info.py:81-85 mutates self too)."""
        for name in other.names:
            self._add_name(name)
        self._add_embeddings(other.embeddings)
        self._add_cloud(other.cloud)
        self._compute_means()
        return self

    def add_info(self, new_name: str, new_emb: np.ndarray, new_cloud: PointCloud):
        self._add_name(new_name)
        self._add_embedding(new_emb)
        self._add_cloud(new_cloud)
        self._compute_means()

    def downsample(self, voxel_size: float):
        ds = voxel_downsample(self.cloud, voxel_size)
        self.cloud = ds.compact()
        self._compute_means()

    def update_pointcloud_with_mask(self, keep: np.ndarray):
        """Keep only valid rows where `keep` is True; `keep` indexes the
        object's VALID points in order (reference semantics:
        object_info.py:101-107 applies a boolean mask to the point list)."""
        pts, cols = self.cloud.to_numpy()
        keep = np.asarray(keep, bool)
        self.cloud = PointCloud.from_numpy(pts[keep], cols[keep],
                                           capacity=round_up_pow2(max(int(keep.sum()), 1)))
        self._compute_means()

    # ------------------------------------------------------------------ #
    def save(self, save_directory: str):
        from ..utils.ply import write_ply
        os.makedirs(save_directory, exist_ok=True)
        pts, cols = self.cloud.to_numpy()
        write_ply(os.path.join(save_directory, "pointcloud.ply"), pts, cols)
        with open(os.path.join(save_directory, "info.pkl"), "wb") as f:
            pickle.dump({
                "names": self.names,
                "embeddings": self.embeddings,
                "max_embeddings_num": self.max_embeddings_num,
            }, f)

    def to_tuple(self):
        """Pickle-friendly form (object_memory.py save_to_pkl strips device
        handles into (meta, points, colors) tuples)."""
        pts, cols = self.cloud.to_numpy()
        meta = {
            "id": self.id,
            "names": self.names,
            "embeddings": [np.asarray(e) for e in self.embeddings],
            "max_embeddings_num": self.max_embeddings_num,
        }
        return meta, pts, cols

    @staticmethod
    def from_tuple(tup) -> "ObjectInfo":
        meta, pts, cols = tup
        cloud = PointCloud.from_numpy(pts, cols)
        obj = ObjectInfo(meta["id"], meta["names"][0], meta["embeddings"][0],
                         cloud, meta["max_embeddings_num"])
        obj.names = list(meta["names"])
        obj.embeddings = [np.asarray(e) for e in meta["embeddings"]]
        obj._compute_means()
        return obj
