"""ObjectMemory: build / consolidate / persist / localise.

Reference: `object_memory/object_memory.py` (SURVEY.md §2.5, §3.1-3.2).
TPU-first differences from the reference:

* detection + embedding are *batched per frame* (one detector call, one
  embedder call over all crops) instead of the reference's per-crop loop
  (object_memory.py:131-145);
* per-mask backprojection + outlier removal is one jitted kernel for all
  masks (ops.backprojection.mask_pointclouds_from_depth);
* the assignment search runs as a batched device top-k
  (ops.assignment.SimVolume);
* per-assignment registration pads union clouds to a fixed capacity so every
  assignment reuses one compiled FPFH+RANSAC+ICP program;
* the final pose is composed from the BEST assignment's means — the
  reference composes it from the means of whichever assignment iterated last
  (object_memory.py:1124-1131 uses loop-leaked `memory_mean`/`detected_mean`),
  which is a bug we fix, not replicate.
"""

from __future__ import annotations

import os
import pickle

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.pointcloud import PointCloud, round_up_pow2
from ..ops.backprojection import mask_pointclouds_from_depth
from ..ops.transforms import transform_pointcloud, rotmat_to_quat_xyzw
from ..ops.outliers import DEFAULT_OUTLIER_REMOVAL_CONFIG, radius_outlier_keep_mask
from ..ops.voxel import voxel_downsample
from ..ops.iou3d import pairwise_obb_iou
from ..ops.kabsch import kabsch_transform, kabsch_numpy
from ..ops.registration import (register_point_clouds, refine_registration,
                                register_assignments_batched,
                                evaluate_transform)
from ..ops.assignment import SimVolume
from ..ops.clustering import dbscan, agglomerative_precomputed
from ..utils.logging import conditional_log
from .object_info import ObjectInfo
from .phrases import check_if_floor
from .detection import Detections


LOCALISE_OUTLIER_CONFIG = {"radius_nb_points": 8, "radius": 0.05}  # object_memory.py:880-884
REGISTRATION_CAPACITY = 2048     # per-side point budget for assignment registration
EVAL_CAPACITY = 4096             # budget for full-memory evaluate_transform


def _subsample_points(pts: np.ndarray, cols: np.ndarray, cap: int, seed: int = 0):
    if len(pts) <= cap:
        return pts, cols
    idx = np.random.default_rng(seed).choice(len(pts), cap, replace=False)
    return pts[idx], cols[idx]


class ObjectMemory:
    """Reference ObjectMemory (object_memory.py:41-1169) with a pluggable
    detector and a *batched* embedding callback:

        get_embeddings_func(detections: Detections, full_rgb, full_depth,
                            consider_floor) -> np.ndarray (M, E)
    """

    def __init__(
        self,
        detector,
        camera_focal_lenth_x: float,
        camera_focal_lenth_y: float,
        get_embeddings_func,
        log_enabled: bool = True,
        mem_formation_bounding_box_threshold: float = 0.3,
        mem_formation_occlusion_overlap_threshold: float = 0.9,
        object_info_max_embeddings_num: int = 1_000_000,
        load_rgb_image_func=None,
        load_depth_image_func=None,
        dataset_floor_thickness: float = 0.1,
    ):
        from ..data.loader import load_rgb, load_depth

        if get_embeddings_func is None:
            raise NotImplementedError("Need to pass in get_embeddings_func")
        self.detector = detector
        self.camera_focal_lenth_x = camera_focal_lenth_x
        self.camera_focal_lenth_y = camera_focal_lenth_y
        self.get_embeddings_func = get_embeddings_func
        self.log_enabled = log_enabled
        self.mem_formation_bounding_box_threshold = mem_formation_bounding_box_threshold
        self.mem_formation_occlusion_overlap_threshold = mem_formation_occlusion_overlap_threshold
        self.object_info_max_embeddings_num = object_info_max_embeddings_num
        self.load_rgb_image_func = load_rgb_image_func or load_rgb
        self.load_depth_image_func = load_depth_image_func or load_depth
        self.dataset_floor_thickness = dataset_floor_thickness

        self.memory: list[ObjectInfo] = []
        self.floors: ObjectInfo | None = None

    # ------------------------------------------------------------------ #
    def _log(self, statement):
        conditional_log(statement, self.log_enabled)

    def __repr__(self):
        rep = "".join(f"\t{obj}\n" for obj in self.memory)
        return rep if rep else "\tNo objects in memory yet."

    # ------------------------------------------------------------------ #
    # build (§3.1)
    # ------------------------------------------------------------------ #
    def _load_images(self, rgb_image_path, depth_image_path, depth_factor):
        rgb = (rgb_image_path if isinstance(rgb_image_path, np.ndarray)
               else self.load_rgb_image_func(rgb_image_path))
        depth = (depth_image_path if isinstance(depth_image_path, np.ndarray)
                 else self.load_depth_image_func(depth_image_path))
        return rgb, np.asarray(depth, np.float32) / depth_factor

    @staticmethod
    def _pad_masks(masks: np.ndarray) -> np.ndarray:
        """Pad the detection axis to a power-of-two bucket: every distinct
        detection count otherwise triggers a fresh XLA compile of the whole
        backprojection kernel (tens of seconds through a remote-compile
        tunnel). Padded rows are all-False masks that yield empty clouds and
        are dropped downstream."""
        m = len(masks)
        bucket = max(4, 1 << (m - 1).bit_length())
        if bucket == m:
            return np.asarray(masks)
        pad = np.zeros((bucket - m,) + masks.shape[1:], masks.dtype)
        return np.concatenate([masks, pad])

    def _get_object_info(self, rgb_image_path, depth_image_path, consider_floor,
                         outlier_removal_config=DEFAULT_OUTLIER_REMOVAL_CONFIG,
                         depth_factor: float = 1.0):
        """Detect + embed + backproject one frame
        (reference object_memory.py:125-161, batched)."""
        rgb, depth = self._load_images(rgb_image_path, depth_image_path, depth_factor)
        det: Detections = self.detector.find(rgb, consider_floor)
        if len(det) == 0:
            return None, None, None

        embs = np.asarray(self.get_embeddings_func(
            detections=det, full_rgb_image=rgb, full_depth_image=depth,
            consider_floor=consider_floor))
        assert len(embs) == len(det)

        cfg = outlier_removal_config
        batched = mask_pointclouds_from_depth(
            jnp.asarray(depth), jnp.asarray(rgb),
            jnp.asarray(self._pad_masks(det.masks)),
            jnp.float32(self.camera_focal_lenth_x),
            jnp.float32(self.camera_focal_lenth_y),
            apply_outlier_removal=cfg is not None,
            radius=cfg["radius"] if cfg else 0.05,
            radius_nb_points=cfg["radius_nb_points"] if cfg else 0)
        clouds = [PointCloud(batched.points[i], batched.colors[i], batched.mask[i])
                  for i in range(len(det))]
        return det.phrases, embs, clouds

    def process_image(self, rgb_image_path, depth_image_path, pose,
                      consider_floor: bool,
                      outlier_removal_config=DEFAULT_OUTLIER_REMOVAL_CONFIG,
                      add_noise: bool = False,
                      pose_noise: dict = {"trans": 0.0005, "rot": 0.0005},
                      depth_noise: float = 0.003,
                      min_points: int = 500,
                      will_cluster_later: bool = True,
                      depth_factor: float = 1.0,
                      kinect_frame: bool = False):
        """Reference process_image (object_memory.py:163-256): detect, embed,
        backproject, (optional noise injection), world transform, min-points
        filter, floor routing, append."""
        phrases, embs, clouds = self._get_object_info(
            rgb_image_path, depth_image_path, consider_floor,
            outlier_removal_config, depth_factor)
        if phrases is None:
            self._log("ObjectMemory.process_image did NOT find any objects")
            return
        self._log(f"ObjectMemory.process_image found: {phrases}")

        pose = np.array(pose, np.float64)
        rng = np.random.default_rng(0)
        if add_noise:
            pose[:3] += rng.normal(0, pose_noise["trans"], 3)
            q = pose[3:] + rng.normal(0, pose_noise["rot"], 4)
            pose[3:] = q / max(np.linalg.norm(q), 1e-12)

        pose_j = jnp.asarray(pose, jnp.float32)
        for phrase, emb, cloud in zip(phrases, embs, clouds):
            if add_noise:
                noisy = np.asarray(cloud.points) + rng.normal(
                    0, depth_noise, cloud.points.shape).astype(np.float32)
                cloud = PointCloud(jnp.asarray(noisy), cloud.colors, cloud.mask)
            if kinect_frame:
                from ..ops.transforms import transform_pointcloud_kinect
                world = transform_pointcloud_kinect(cloud, pose_j)
            else:
                world = transform_pointcloud(cloud, pose_j)

            n_pts = int(np.asarray(world.mask).sum())
            self._log(f"\tCurrent Object Phrase under consideration: {phrase}")
            if n_pts < min_points:
                self._log(f"\t\tSkipping as number of points {n_pts} < min_points = {min_points}.")
                continue

            new_obj = ObjectInfo(len(self.memory), phrase, emb,
                                 world.compact(), self.object_info_max_embeddings_num)
            if check_if_floor(new_obj.names):
                self.floors = new_obj if self.floors is None else self.floors + new_obj
                self._log(f"\tFloor Added: {new_obj}")
            else:
                self.memory.append(new_obj)
                self._log(f"\tObject Added: {new_obj}")

    # ------------------------------------------------------------------ #
    # consolidation (§2.5)
    # ------------------------------------------------------------------ #
    def downsample_all_objects(self, voxel_size: float):
        self._log("Downsampling all objects")
        for obj in self.memory:
            obj.downsample(voxel_size)
        if self.floors is not None:
            self.floors.downsample(voxel_size)

    def remove_points_below_floor(self):
        """Reference object_memory.py:265-291: min object height + thickness."""
        self._log("Removing points below floor")
        if not self.memory:
            return
        floor_height = min(float(obj.points()[:, 1].min())
                           for obj in self.memory if obj.num_points())
        surviving = []
        for obj in self.memory:
            pts = obj.points()
            keep = pts[:, 1] > floor_height + self.dataset_floor_thickness
            obj.update_pointcloud_with_mask(keep)
            if obj.num_points() > 0:
                surviving.append(obj)
        self.memory = surviving

    def _merge_by_labels(self, objects: list[ObjectInfo], labels: np.ndarray,
                         drop_noise: bool = True) -> list[ObjectInfo]:
        merged: dict[int, ObjectInfo] = {}
        for label, obj in zip(labels, objects):
            if label == -1 and drop_noise:
                continue
            if label in merged:
                merged[label] = merged[label] + obj
            else:
                merged[label] = obj
        out = list(merged.values())
        for i, obj in enumerate(out):
            obj.id = i
        return out

    def _dbscan_object_labels(self, objects: list[ObjectInfo], eps, min_points):
        """Label each OBJECT by the DBSCAN cluster of its points (reference
        assigns via the object's first point — object_memory.py:326-338; we
        track point->object provenance directly, same result, no O(N^2)
        membership scans)."""
        pts = [obj.points() for obj in objects]
        owners = np.concatenate([np.full(len(p), i) for i, p in enumerate(pts)])
        all_points = np.concatenate(pts)
        labels = dbscan(all_points, eps=eps, min_points=min_points)
        obj_labels = np.full(len(objects), -1)
        offset = 0
        for i, p in enumerate(pts):
            obj_labels[i] = labels[offset]  # first point of the object
            offset += len(p)
        return obj_labels

    def recluster_objects_with_dbscan(self, eps=0.2, min_points_per_cluster=300,
                                      visualize: bool = False):
        self._log("Clustering using DBSCAN")
        if not self.memory:
            return
        labels = self._dbscan_object_labels(self.memory, eps, min_points_per_cluster)
        self.memory = self._merge_by_labels(self.memory, labels)

    def _embedding_distance_matrix(self) -> np.ndarray:
        """Reference df + normalization (object_memory.py:444-465): cosine
        similarity of normalized mean embeddings, min-max normalized, flipped."""
        embs = np.stack([obj.mean_emb for obj in self.memory]).astype(np.float64)
        embs = embs / np.maximum(np.linalg.norm(embs, axis=1, keepdims=True), 1e-12)
        sim = embs @ embs.T
        sim = sim - sim.min()
        denom = sim.max()
        if denom > 0:
            sim = sim / denom
        return 1.0 - sim

    def recluster_via_agglomerative_clustering(self, embedding_distance_threshold=0.4,
                                               **_ignored):
        if len(self.memory) < 2:
            return
        self._log("Clustering agglomeratively")
        dist = self._embedding_distance_matrix()
        labels = agglomerative_precomputed(dist, embedding_distance_threshold,
                                           linkage="average")
        self.memory = self._merge_by_labels(self.memory, labels, drop_noise=False)

    def recluster_via_combined(self, embedding_distance_threshold=0.4, eps=0.4,
                               min_points_per_cluster=150):
        """Reference object_memory.py:444-556: agglomerative on embeddings,
        then DBSCAN within each embedding cluster."""
        if len(self.memory) < 2:
            return
        self._log("Clustering agglomeratively")
        dist = self._embedding_distance_matrix()
        labels = agglomerative_precomputed(dist, embedding_distance_threshold,
                                           linkage="average")
        new_memory: list[ObjectInfo] = []
        for u in np.unique(labels):
            group = [obj for lab, obj in zip(labels, self.memory) if lab == u]
            sub_labels = self._dbscan_object_labels(group, eps, min_points_per_cluster)
            new_memory += self._merge_by_labels(group, sub_labels)
        self.memory = new_memory
        for i, obj in enumerate(self.memory):
            obj.id = i

    def _recluster_IoU(self, IoU_threshold=0.6):
        """Reference object_memory.py:710-747: agglomerative (average) on
        1 - pairwise OBB IoU — here ONE vmapped device kernel for the matrix."""
        k = len(self.memory)
        if k < 2:
            return
        cap = round_up_pow2(max(max(o.num_points() for o in self.memory), 8))
        pts = np.zeros((k, cap, 3), np.float32)
        msk = np.zeros((k, cap), bool)
        for i, obj in enumerate(self.memory):
            p = obj.points()
            pts[i, :len(p)] = p
            msk[i, :len(p)] = True
        ious = np.asarray(pairwise_obb_iou(jnp.asarray(pts), jnp.asarray(msk)))
        dist = 1.0 - ious
        np.fill_diagonal(dist, 0.0)
        labels = agglomerative_precomputed(dist, 1.0 - IoU_threshold, linkage="average")
        self._log("Clustering agglomeratively")
        self.memory = self._merge_by_labels(self.memory, labels, drop_noise=False)
        for obj in self.memory:
            obj._compute_means()

    def recluster_via_clustering_and_IoU(self, embedding_distance_threshold=0.4,
                                         eps=0.4, min_points_per_cluster=150,
                                         IoU_threshold=0.25):
        """Reference object_memory.py:562-708: IoU pass, then combined pass."""
        self._recluster_IoU(IoU_threshold)
        self.recluster_via_combined(embedding_distance_threshold, eps,
                                    min_points_per_cluster)

    # ------------------------------------------------------------------ #
    # persistence (§2.5; reference object_memory.py:750-846)
    # ------------------------------------------------------------------ #
    def save(self, save_directory: str):
        from ..utils.ply import write_ply
        os.makedirs(save_directory, exist_ok=True)
        obj_dir = os.path.join(save_directory, "objects")
        floor_dir = os.path.join(save_directory, "floors")
        os.makedirs(obj_dir, exist_ok=True)
        os.makedirs(floor_dir, exist_ok=True)

        with open(os.path.join(save_directory, "memory.txt"), "w") as f:
            f.write(repr(self))

        all_pts = [o.cloud.to_numpy() for o in self.memory]
        if all_pts:
            pts = np.concatenate([p for p, _ in all_pts])
            cols = np.concatenate([c for _, c in all_pts])
            write_ply(os.path.join(save_directory, "combined_pointcloud.ply"), pts, cols)
            if self.floors is not None:
                fp, fc = self.floors.cloud.to_numpy()
                write_ply(os.path.join(save_directory, "combined_pointcloud_with_floor.ply"),
                          np.concatenate([pts, fp]), np.concatenate([cols, fc]))
        for obj in self.memory:
            obj.save(os.path.join(obj_dir, str(obj.id)))
        if self.floors is not None:
            self.floors.save(os.path.join(floor_dir, "all_floors"))
        self._log(f"Saved memory to {save_directory}")

    def save_to_pkl(self, save_path: str):
        payload = {
            "memory": [obj.to_tuple() for obj in self.memory],
            "floors": self.floors.to_tuple() if self.floors is not None else None,
        }
        with open(save_path, "wb") as f:
            pickle.dump(payload, f)

    def load(self, load_path: str):
        with open(load_path, "rb") as f:
            payload = pickle.load(f)
        self.memory = [ObjectInfo.from_tuple(t) for t in payload["memory"]]
        self.floors = (ObjectInfo.from_tuple(payload["floors"])
                       if payload["floors"] is not None else None)

    # ------------------------------------------------------------------ #
    # localise (§3.2; reference object_memory.py:852-1169)
    # ------------------------------------------------------------------ #
    def localise(self, image_path, depth_image_path,
                 testname: str = "", subtest_name: str = "",
                 save_point_clouds: bool = False,
                 outlier_removal_config=None,
                 fpfh_global_dist_factor: float = 2.0,
                 fpfh_local_dist_factor: float = 0.4,
                 fpfh_voxel_size: float = 0.05,
                 consider_floor: bool = False,
                 depth_factor: float = 1.0,
                 max_detected_object_num: int = 7,
                 centroid_gate: float = 1.0,
                 save_root: str = "pcds"):
        """Returns (pose7 [x,y,z,qx,qy,qz,qw], [assignment, moved])."""
        # note: unlike the reference (object_memory.py:880-884, which swaps in
        # its localise default), passing outlier_removal_config=None here
        # means NO outlier removal — needed for coarse-resolution depth where
        # the mm-scale default wipes entire clouds. Pass
        # LOCALISE_OUTLIER_CONFIG explicitly for the reference behavior.

        consider_floor = False  # reference hard-disables this (object_memory.py:886)
        rgb, depth = self._load_images(image_path, depth_image_path, depth_factor)
        det = self.detector.find(rgb, consider_floor)
        if len(det) == 0 or len(self.memory) == 0:
            return np.array([0., 0., 0., 0., 0., 0., 1.]), [[], []]
        detected_embs = np.asarray(self.get_embeddings_func(
            detections=det, full_rgb_image=rgb, full_depth_image=depth,
            consider_floor=consider_floor))
        detected_phrases = list(det.phrases)

        # ONE device call for backprojection + both outlier passes (the
        # per-detection loop costs a ~30 ms tunnel round-trip per call), then
        # ONE host fetch of the batched arrays.
        cfg = outlier_removal_config
        batched = mask_pointclouds_from_depth(
            jnp.asarray(depth), jnp.asarray(rgb),
            jnp.asarray(self._pad_masks(det.masks)),
            jnp.float32(self.camera_focal_lenth_x),
            jnp.float32(self.camera_focal_lenth_y),
            apply_outlier_removal=cfg is not None,
            radius=cfg["radius"] if cfg else 0.05,
            radius_nb_points=cfg["radius_nb_points"] if cfg else 0)
        valid_masks = batched.mask
        if cfg is not None:
            # the reference cleans detections AGAIN before registration
            # (object_memory.py:992-998)
            keep2 = jax.vmap(lambda p, m: radius_outlier_keep_mask(
                p, m, radius=cfg["radius"],
                nb_points=cfg["radius_nb_points"]))(batched.points, valid_masks)
            valid_masks = valid_masks & keep2
        np_pts = np.asarray(batched.points)
        np_cols = np.asarray(batched.colors)
        np_msk = np.asarray(valid_masks)
        det_np_all = [(np_pts[i][np_msk[i]], np_cols[i][np_msk[i]])
                      for i in range(len(det))]

        # top max_detected_object_num largest clouds (object_memory.py:900-908)
        sizes = [len(p) for p, _ in det_np_all]
        order = np.argsort(sizes)[::-1][:max_detected_object_num]
        detected_phrases = [detected_phrases[i] for i in order]
        detected_embs = np.stack([detected_embs[i] for i in order])
        det_np_all = [det_np_all[i] for i in order]

        for m in self.memory:
            m._compute_means()

        # drop detections whose clouds got (nearly) emptied by the cleanup:
        # empty clouds produce NaN centroids downstream
        keep_idx = [i for i, (p, _) in enumerate(det_np_all) if len(p) >= 16]
        if not keep_idx:
            return np.array([0., 0., 0., 0., 0., 0., 1.]), [[], []]
        det_np = [det_np_all[i] for i in keep_idx]
        detected_phrases = [detected_phrases[i] for i in keep_idx]
        detected_embs = detected_embs[keep_idx]

        if len(detected_embs) > len(self.memory):
            self._log("Not enough memory objects")
            detected_embs = detected_embs[: len(self.memory)]
            detected_phrases = detected_phrases[: len(self.memory)]
            det_np = det_np[: len(self.memory)]

        # per-exemplar max cosine similarity (object_memory.py:933-936)
        d_norm = detected_embs / np.maximum(
            np.linalg.norm(detected_embs, axis=-1, keepdims=True), 1e-12)
        closest = np.zeros((len(d_norm), len(self.memory)), np.float32)
        for j, m in enumerate(self.memory):
            ex = np.stack(m.embeddings).reshape(len(m.embeddings), -1)
            ex = ex / np.maximum(np.linalg.norm(ex, axis=-1, keepdims=True), 1e-12)
            closest[:, j] = (d_norm @ ex.T).max(-1)

        self._log(f"Getting assignments, sims shape {closest.shape}")
        sv = SimVolume(closest)
        sv.fast_construct_volume(min(len(det_np), 3))
        assns = sv.get_top_indices_from_subvolumes(num_per_length=4)
        self._log(f"Assignments being considered: {assns}")

        mem_np = [o._numpy_cloud() for o in self.memory]

        # full clouds for global evaluation (object_memory.py:1000-1016)
        all_det_pts = np.concatenate([p for p, _ in det_np])
        all_det_cols = np.concatenate([c for _, c in det_np])
        all_mem_pts = np.concatenate([p for p, _ in mem_np])
        all_mem_cols = np.concatenate([c for _, c in mem_np])
        sd_pts, sd_cols = _subsample_points(all_det_pts, all_det_cols, EVAL_CAPACITY)
        sm_pts, sm_cols = _subsample_points(all_mem_pts, all_mem_cols, EVAL_CAPACITY)
        all_det = PointCloud.from_numpy(sd_pts, sd_cols, capacity=EVAL_CAPACITY)
        all_mem = PointCloud.from_numpy(sm_pts, sm_cols, capacity=EVAL_CAPACITY)

        # --- batch ALL assignment registrations into one device call --------
        # (the TPU-first restructuring of the reference's per-assignment loop,
        # object_memory.py:1020-1106: A assignments vmap across the chip)
        batch_entries = []
        for assn in assns:
            chosen_det = np.concatenate([det_np[d][0] for d, _ in assn])
            chosen_det_c = np.concatenate([det_np[d][1] for d, _ in assn])
            chosen_mem = np.concatenate([mem_np[m][0] for _, m in assn])
            chosen_mem_c = np.concatenate([mem_np[m][1] for _, m in assn])
            if len(chosen_det) < 3 or len(chosen_mem) < 3:
                continue
            detected_mean = chosen_det.mean(0)
            memory_mean = chosen_mem.mean(0)
            cd, cdc = _subsample_points(chosen_det - detected_mean, chosen_det_c,
                                        REGISTRATION_CAPACITY)
            cm, cmc = _subsample_points(chosen_mem - memory_mean, chosen_mem_c,
                                        REGISTRATION_CAPACITY)
            # candidate init: Kabsch on the assigned objects' centroids —
            # correspondence-free coarse alignment where FPFH is degenerate
            if len(assn) >= 2:
                det_cent = np.stack([det_np[d][0].mean(0) - detected_mean
                                     for d, _ in assn])
                mem_cent = np.stack([mem_np[m][0].mean(0) - memory_mean
                                     for _, m in assn])
                init_T = kabsch_numpy(det_cent, mem_cent)
                has_init = True
            else:
                init_T = np.eye(4, dtype=np.float32)
                has_init = False
            batch_entries.append(dict(
                assn=assn, cd=cd, cdc=cdc, cm=cm, cmc=cmc,
                detected_mean=detected_mean, memory_mean=memory_mean,
                init_T=init_T, has_init=has_init))

        if not batch_entries:
            return np.array([0., 0., 0., 0., 0., 0., 1.]), [[], []]

        cap = REGISTRATION_CAPACITY
        a_real = len(batch_entries)
        a_pad = max(4, 1 << (a_real - 1).bit_length())  # jit-cache bucket

        def pack(key_pts, key_cols):
            pts = np.zeros((a_pad, cap, 3), np.float32)
            cols = np.zeros((a_pad, cap, 3), np.float32)
            msk = np.zeros((a_pad, cap), bool)
            for i, e in enumerate(batch_entries):
                n = len(e[key_pts])
                pts[i, :n] = e[key_pts]
                cols[i, :n] = e[key_cols]
                msk[i, :n] = True
            return PointCloud(jnp.asarray(pts), jnp.asarray(cols),
                              jnp.asarray(msk))

        src_b = pack("cd", "cdc")
        tgt_b = pack("cm", "cmc")
        init_b = np.stack([e["init_T"] for e in batch_entries]
                          + [np.eye(4, dtype=np.float32)] * (a_pad - a_real))
        has_init_b = np.array([e["has_init"] for e in batch_entries]
                              + [False] * (a_pad - a_real))
        dmeans = np.stack([e["detected_mean"] for e in batch_entries]
                          + [np.zeros(3)] * (a_pad - a_real)).astype(np.float32)
        mmeans = np.stack([e["memory_mean"] for e in batch_entries]
                          + [np.zeros(3)] * (a_pad - a_real)).astype(np.float32)

        transforms, rmses, fitnesses, full_rmses, full_fitnesses = \
            register_assignments_batched(
                src_b, tgt_b, init_b, has_init_b, dmeans, mmeans,
                all_det, all_mem, voxel_size=fpfh_voxel_size,
                global_dist_factor=fpfh_global_dist_factor,
                local_dist_factor=fpfh_local_dist_factor)

        # host-side: global consistency gate + result records
        top1 = np.argmax(closest, axis=1)
        det_cents_all = np.stack([det_np[d][0].mean(0) for d in range(len(det_np))])
        mem_cents_top1 = np.stack([mem_np[top1[d]][0].mean(0)
                                   for d in range(len(det_np))])
        results = []
        for i, e in enumerate(batch_entries):
            transform = transforms[i]
            fitness = float(fitnesses[i])
            # geometric consistency gate (TPU build extra): a valid pose must
            # map EVERY detection's centroid near its top-1 embedding match
            # (median over detections — robust to a minority of bad matches);
            # it also constrains single-pair assignments whose own
            # registration is underdetermined.
            R_g = transform[:3, :3]
            t_g = transform[:3, 3]
            moved = (det_cents_all - e["detected_mean"]) @ R_g.T + t_g
            cen_errs = np.linalg.norm(
                moved - (mem_cents_top1 - e["memory_mean"]), axis=1)
            full_fitness = float(full_fitnesses[i])
            if float(np.median(cen_errs)) > centroid_gate:
                fitness = -1.0
                full_fitness = -1.0
            results.append(dict(assn=e["assn"], transform=transform,
                                detected_mean=e["detected_mean"],
                                memory_mean=e["memory_mean"],
                                rmse=float(rmses[i]), fitness=fitness,
                                full_rmse=float(full_rmses[i]),
                                full_fitness=full_fitness))

        if not results:
            return np.array([0., 0., 0., 0., 0., 0., 1.]), [[], []]

        results.sort(key=lambda r: r["full_fitness"], reverse=True)  # :1111-1119
        for r in results:
            self._log(f"Assn: {r['assn']} | chosen RMSE: {r['rmse']:.4f} | "
                      f"full RMSE: {r['full_rmse']:.4f} | chosen fitness: {r['fitness']:.4f} | "
                      f"full fitness: {r['full_fitness']:.4f}")

        best = results[0]
        R = best["transform"][:3, :3]
        t = best["transform"][:3, 3]
        # compose with the BEST assignment's means (reference bug fixed — see
        # module docstring)
        tAvg = t + best["memory_mean"] - R @ best["detected_mean"]
        from scipy.spatial.transform import Rotation as _Rot
        qAvg = _Rot.from_matrix(np.asarray(R, np.float64)).as_quat()
        localised_pose = np.concatenate([tAvg, qAvg])

        best_assn = best["assn"]
        moved = [n for n in range(len(det_np))
                 if n not in [d for d, _ in best_assn]]

        if save_point_clouds:
            from ..utils.ply import write_ply
            subsave = os.path.join(save_root, testname, str(subtest_name))
            os.makedirs(subsave, exist_ok=True)
            write_ply(os.path.join(subsave, "_init_pcd.ply"),
                      np.concatenate([all_det_pts, all_mem_pts]),
                      np.concatenate([all_det_cols, all_mem_cols]))
            moved_det = ((all_det_pts - best["detected_mean"]) @ R.T + t
                         + best["memory_mean"])
            write_ply(os.path.join(subsave, f"_best_full_pcd{best_assn}.ply"),
                      np.concatenate([all_mem_pts, moved_det]))

        self._log(f"Best assn: {best_assn}")
        return localised_pose, [best_assn, None]
