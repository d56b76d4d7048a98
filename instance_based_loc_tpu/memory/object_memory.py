"""ObjectMemory: build / consolidate / persist / localise.

Reference: `object_memory/object_memory.py` (SURVEY.md §2.5, §3.1-3.2).
TPU-first differences from the reference:

* detection + embedding are *batched per frame* (one detector call, one
  embedder call over all crops) instead of the reference's per-crop loop
  (object_memory.py:131-145);
* the ENTIRE localise query runs as two fused device programs with one tiny
  fetch each (ops/localise_kernels.py): backproject + outlier + top-N +
  similarities + SimVolume top-k, then union-gather + FPFH + RANSAC +
  multi-scale colored ICP + full-cloud evaluation + pose composition. Point
  clouds never leave the device; memory-side buffers are packed/uploaded
  once per memory version (`_pack_memory`);
* memory-build frames run as one fused program too (process_frame):
  backprojection, outlier removal, noise injection and the world transform
  compile into a single kernel, with one compacted fetch per frame;
* instance bookkeeping (ObjectInfo, clustering, merging) is host numpy —
  small irregular work that would otherwise pay ~32 ms of tunnel latency
  per touch;
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
from ..ops.outliers import DEFAULT_OUTLIER_REMOVAL_CONFIG
from ..ops.iou3d import pairwise_obb_iou
from ..ops.localise_kernels import (localise_frame_packed,
                                    localise_frames_batched,
                                    localise_frames_scanned,
                                    localise_packed_spec, process_frame,
                                    make_subsets)
from ..ops.clustering import dbscan, agglomerative_precomputed
from ..utils.logging import conditional_log
from ..utils.profiling import StageTimer
from .object_info import ObjectInfo
from .phrases import check_if_floor
from .detection import Detections


def _env_int(name: str, default: int) -> int:
    return int(os.environ.get(name, default))


LOCALISE_OUTLIER_CONFIG = {"radius_nb_points": 8, "radius": 0.05}  # object_memory.py:880-884
# Registration quality/speed knobs. The IBL_* env overrides exist so the
# full quality-gate suite can be replayed against a candidate knob set
# without editing source (PERF.md knob-ablation methodology).
REGISTRATION_CAPACITY = _env_int("IBL_REG_CAP", 1024)   # per-side point budget for assignment registration
FPFH_CAPACITY = _env_int("IBL_FPFH_CAP", 256)    # feature subsample for the RANSAC coarse stage
EVAL_CAPACITY = _env_int("IBL_EVAL_CAP", 2048)   # budget for full-memory evaluate_transform
MEM_OBJECT_CAPACITY = 2048       # per-memory-object resident point budget
PROCESS_CAPACITY = 8192          # per-detection point budget kept at build time
NUM_HYPOTHESES = _env_int("IBL_NUM_HYP", 512)    # ablation: 2048 -> 512 costs no gate
ICP_COARSE_ITERS = _env_int("IBL_ICP_COARSE", 8)   # every e2e/scale gate green at
ICP_FINE_ITERS = _env_int("IBL_ICP_FINE", 10)      # 8+10; trace-exact -1.1 ms/query
                                 # vs 10+12 (Kabsch/RANSAC init means few
                                 # iterations are spent far from the optimum)
ICP_EARLY_EXIT = bool(_env_int("IBL_ICP_EARLY_EXIT", 0))
                                 # while_loop + Open3D convergence criteria
                                 # instead of fixed-length scan (ops/icp.py)
FPFH_MAX_NN = _env_int("IBL_FPFH_NN", 50)   # FPFH hybrid-KNN neighbor cap.
                                 # Open3D KDTreeSearchParamHybrid uses 100;
                                 # the (N, k, 33) gather tensors scale with
                                 # it and 100 -> 50 cuts the fused query
                                 # from 19.3 to 16.4 ms (trace-exact) with
                                 # every quality gate green — FPFH only
                                 # seeds the coarse basin here (Kabsch init
                                 # competes, ICP refines). IBL_FPFH_NN=100
                                 # restores the reference neighborhood.
REG_SEEDS = _env_int("IBL_REG_SEEDS", 1)   # independent registration seeds
                                 # per assignment (extra vmap lanes; best
                                 # copy wins). Opt-in robustness against
                                 # unlucky RANSAC/subsample draws at ~no
                                 # wall cost (lanes are parallel); default 1
                                 # = exact reference semantics — a 36-draw
                                 # CPU sweep measured 0 seed failures either
                                 # way, so there is no evidence basis for
                                 # shipping redundancy on by default
DPAD_MARGIN = _env_int("IBL_DPAD_MARGIN", 1)
                                 # host-side detection staging cap:
                                 # top_n + margin mask slots staged per
                                 # query (ranked by pixel count), keeping
                                 # d_pad at ONE power-of-2 specialization.
                                 # -1 = stage every detection (reference
                                 # behavior; alternates jit buckets at
                                 # busy scenes)
RANSAC_PAIRS_MAX = _env_int("IBL_RANSAC_PAIRS", 3)
                                 # run the FPFH+RANSAC coarse stage for
                                 # assignments with <= this many pairs; the
                                 # rest seed ICP from the centroid-Kabsch
                                 # init alone. Default 3 = RANSAC on every
                                 # assignment, matching the reference's
                                 # pipeline (object_memory.py:1020-1106).
                                 # IBL_RANSAC_PAIRS=1 is the measured perf
                                 # mode (7.07 vs 11.85 ms/query trace-exact,
                                 # PERF.md lever (c)) but a 36-pose CPU
                                 # replay showed it flips one marginal pose
                                 # (#15, 0.40 -> 0.69 m) through candidate
                                 # selection, so speed-over-parity is opt-in


@jax.jit
def _pack_f32(leaves):
    """Flatten heterogeneous outputs into one f32 vector so fetching costs a
    single host<->device round trip. Ints/bools round-trip exactly through
    f32 (all are small indices/flags/counts < 2^24)."""
    return jnp.concatenate([jnp.ravel(x).astype(jnp.float32) for x in leaves])


def _decode_packed(flat: np.ndarray, specs, treedef):
    """Inverse of the on-device output packing (localise_frame_packed)."""
    leaves, pos = [], 0
    for shape, dtype in specs:
        n = int(np.prod(shape)) if shape else 1
        leaves.append(flat[pos:pos + n].reshape(shape).astype(dtype))
        pos += n
    return jax.tree_util.tree_unflatten(treedef, leaves)


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
        mesh=None,
        mem_axis: str = "data",
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
        # optional jax.sharding.Mesh: the memory-side buffers (object point
        # banks, exemplar embeddings, the evaluation cloud) shard over
        # `mem_axis`, so memories larger than one chip's HBM spread across
        # the slice and the detections x memory similarity + registration
        # math runs SPMD (the workload's scale dimension — SURVEY.md §2.10:
        # many-objects batching replaces sequence parallelism here).
        self.mesh = mesh
        self.mem_axis = mem_axis
        # optional jax.sharding.Mesh for SPMD batch serving: localise_many
        # chunks shard their query-stacked buffers over "data" while the
        # (read-only at serve time) object memory replicates — each device
        # runs the identical single-query program on its shard with zero
        # collectives (parallel/serving.py). Mutually exclusive with `mesh`
        # (which instead shards the memory itself over `mem_axis`).
        self.serving_mesh = None

        self.memory: list[ObjectInfo] = []
        self.floors: ObjectInfo | None = None
        self.timer = StageTimer()
        self._pack = None          # resident device buffers (localise)
        self._frame_counter = 0

    # ------------------------------------------------------------------ #
    def _log(self, statement):
        conditional_log(statement, self.log_enabled)

    def _invalidate_pack(self):
        self._pack = None

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
    def _pad_masks(masks: np.ndarray, minimum: int = 8) -> np.ndarray:
        """Pad the detection axis to a power-of-two bucket: every distinct
        detection count otherwise triggers a fresh XLA compile of the whole
        frame kernel (tens of seconds through a remote-compile tunnel).
        Padded rows are all-False masks that yield empty clouds and are
        dropped downstream."""
        m = len(masks)
        bucket = max(minimum, 1 << (m - 1).bit_length())
        if bucket == m:
            return np.asarray(masks)
        pad = np.zeros((bucket - m,) + masks.shape[1:], masks.dtype)
        return np.concatenate([masks, pad])

    def process_image(self, rgb_image_path, depth_image_path, pose,
                      consider_floor: bool,
                      outlier_removal_config=DEFAULT_OUTLIER_REMOVAL_CONFIG,
                      add_noise: bool = False,
                      pose_noise: dict = {"trans": 0.0005, "rot": 0.0005},
                      depth_noise: float = 0.003,
                      min_points: int = 500,
                      will_cluster_later: bool = True,
                      depth_factor: float = 1.0,
                      kinect_frame: bool = False,
                      process_capacity: int = PROCESS_CAPACITY,
                      detections: Detections | None = None):
        """Reference process_image (object_memory.py:163-256): detect, embed,
        backproject, (optional noise injection), world transform, min-points
        filter, floor routing, append — with everything between detection and
        the host bookkeeping fused into ONE device program.

        `detections` short-circuits the detect stage with precomputed results
        — the chunked build path (CascadeDetector.find_batch) detects a whole
        frame chunk as batched device programs, then feeds each frame through
        here."""
        timer = self.timer
        with timer.stage("build.load"):
            rgb, depth = self._load_images(rgb_image_path, depth_image_path,
                                           depth_factor)
        with timer.stage("build.detect"):
            if detections is not None:
                det: Detections = detections
            elif getattr(self.detector, "wants_depth", False):
                det = self.detector.find(rgb, consider_floor, depth=depth)
            else:
                det = self.detector.find(rgb, consider_floor)
        if len(det) == 0:
            self._log("ObjectMemory.process_image did NOT find any objects")
            return
        with timer.stage("build.embed"):
            embs = np.asarray(self.get_embeddings_func(
                detections=det, full_rgb_image=rgb, full_depth_image=depth,
                consider_floor=consider_floor))
            assert len(embs) == len(det)

        pose = np.array(pose, np.float64)
        rng = np.random.default_rng(0)
        if add_noise:
            pose[:3] += rng.normal(0, pose_noise["trans"], 3)
            q = pose[3:] + rng.normal(0, pose_noise["rot"], 4)
            pose[3:] = q / max(np.linalg.norm(q), 1e-12)

        cfg = outlier_removal_config
        self._frame_counter += 1
        with timer.stage("build.device"):
            pc6, raw_counts, sub_counts = process_frame(
                jnp.asarray(depth), jnp.asarray(rgb),
                jnp.asarray(self._pad_masks(det.masks)),
                jnp.asarray(pose, jnp.float32),
                jnp.float32(self.camera_focal_lenth_x),
                jnp.float32(self.camera_focal_lenth_y),
                jnp.float32(cfg["radius"] if cfg else 0.05),
                jnp.float32(depth_noise),
                jax.random.PRNGKey(self._frame_counter),
                proc_cap=process_capacity,
                apply_outlier=cfg is not None,
                nb_points=cfg["radius_nb_points"] if cfg else 0,
                kinect=kinect_frame, add_noise=add_noise)
            pc6, raw_counts, sub_counts = jax.device_get(
                (pc6, raw_counts, sub_counts))

        with timer.stage("build.bookkeeping"):
            self._log(f"ObjectMemory.process_image found: {det.phrases}")
            for i, (phrase, emb) in enumerate(zip(det.phrases, embs)):
                n_raw = int(raw_counts[i])
                self._log(f"\tCurrent Object Phrase under consideration: {phrase}")
                if n_raw < min_points:
                    self._log(f"\t\tSkipping as number of points {n_raw} "
                              f"< min_points = {min_points}.")
                    continue
                n = int(sub_counts[i])
                pts = pc6[i, :n, :3].copy()
                cols = pc6[i, :n, 3:].copy()
                new_obj = ObjectInfo(len(self.memory), phrase, emb, (pts, cols),
                                     self.object_info_max_embeddings_num)
                if check_if_floor(new_obj.names):
                    self.floors = (new_obj if self.floors is None
                                   else self.floors + new_obj)
                    self._log(f"\tFloor Added: {new_obj}")
                else:
                    self.memory.append(new_obj)
                    self._log(f"\tObject Added: {new_obj}")
        self._invalidate_pack()

    # ------------------------------------------------------------------ #
    # consolidation (§2.5)
    # ------------------------------------------------------------------ #
    def downsample_all_objects(self, voxel_size: float):
        self._log("Downsampling all objects")
        for obj in self.memory:
            obj.downsample(voxel_size)
        if self.floors is not None:
            self.floors.downsample(voxel_size)
        self._invalidate_pack()

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
        self._invalidate_pack()

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
        self._invalidate_pack()

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
        self._invalidate_pack()

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
        self._invalidate_pack()

    def _recluster_IoU(self, IoU_threshold=0.6):
        """Reference object_memory.py:710-747: agglomerative (average) on
        1 - pairwise OBB IoU — here ONE vmapped device kernel for the matrix."""
        k = len(self.memory)
        if k < 2:
            return
        # The OBB fit (PCA) is statistically identical on a subsample; padding
        # every object to the LARGEST object's point count makes the device
        # array K x max_points (a floor cloud at 600^2 is ~300k points ->
        # multi-GB). Cap per-object points for the fit.
        cap = round_up_pow2(
            min(max(max(o.num_points() for o in self.memory), 8), 2048))
        rng = np.random.default_rng(0)
        pts = np.zeros((k, cap, 3), np.float32)
        msk = np.zeros((k, cap), bool)
        for i, obj in enumerate(self.memory):
            p = obj.points()
            if len(p) > cap:
                p = p[rng.choice(len(p), cap, replace=False)]
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
        self._invalidate_pack()

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

        if self.memory:
            pts = np.concatenate([o.pts for o in self.memory])
            cols = np.concatenate([o.cols for o in self.memory])
            write_ply(os.path.join(save_directory, "combined_pointcloud.ply"), pts, cols)
            if self.floors is not None:
                write_ply(os.path.join(save_directory, "combined_pointcloud_with_floor.ply"),
                          np.concatenate([pts, self.floors.pts]),
                          np.concatenate([cols, self.floors.cols]))
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
        self._invalidate_pack()

    # ------------------------------------------------------------------ #
    # memory packing: host instances -> resident device buffers
    # ------------------------------------------------------------------ #
    def _pack_memory(self):
        """Upload the memory side of localise ONCE per memory version:
        per-object point banks, centroids, unit-norm exemplar embeddings and
        the full-memory evaluation cloud. All localise queries reuse these
        device buffers until the memory mutates."""
        if self._pack is not None:
            return self._pack
        m = len(self.memory)
        assert m > 0
        axis = (self.mesh.shape[self.mem_axis]
                if self.mesh is not None else 1)
        m_pad = round_up_pow2(m, minimum=max(4, axis))
        mcap = min(MEM_OBJECT_CAPACITY,
                   round_up_pow2(max(o.num_points() for o in self.memory)))
        e_dim = int(np.asarray(self.memory[0].mean_emb).size)
        e_pad = round_up_pow2(max(len(o.embeddings) for o in self.memory),
                              minimum=1)

        pts = np.zeros((m_pad, mcap, 3), np.float32)
        cols = np.zeros((m_pad, mcap, 3), np.float32)
        msk = np.zeros((m_pad, mcap), bool)
        cent = np.zeros((m_pad, 3), np.float32)
        ex = np.zeros((m_pad, e_pad, e_dim), np.float32)
        ex_valid = np.zeros((m_pad, e_pad), bool)
        valid = np.zeros((m_pad,), bool)
        for i, obj in enumerate(self.memory):
            p, c = _subsample_points(obj.pts, obj.cols, mcap, seed=i)
            pts[i, :len(p)] = p
            cols[i, :len(p)] = c
            msk[i, :len(p)] = True
            cent[i] = obj.pts.mean(0)
            e = np.stack([np.asarray(x).reshape(-1) for x in obj.embeddings])
            e = e / np.maximum(np.linalg.norm(e, axis=1, keepdims=True), 1e-12)
            ex[i, :len(e)] = e
            ex_valid[i, :len(e)] = True
            valid[i] = True

        all_pts = np.concatenate([o.pts for o in self.memory])
        all_cols = np.concatenate([o.cols for o in self.memory])
        ev_pts, _ = _subsample_points(all_pts, all_cols, EVAL_CAPACITY)
        ev = np.zeros((EVAL_CAPACITY, 3), np.float32)
        ev_msk = np.zeros((EVAL_CAPACITY,), bool)
        ev[:len(ev_pts)] = ev_pts
        ev_msk[:len(ev_pts)] = True

        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            row = NamedSharding(self.mesh, P(self.mem_axis))
            rep = NamedSharding(self.mesh, P())
            put = jax.device_put
            self._pack = dict(
                m_pad=m_pad, e_dim=e_dim,
                mem_pts=put(pts, row), mem_cols=put(cols, row),
                mem_msk=put(msk, row), mem_cent=put(cent, rep),
                mem_ex=put(ex, row), mem_ex_valid=put(ex_valid, row),
                mem_valid=put(valid, rep),
                eval_pts=put(ev, row), eval_msk=put(ev_msk, row),
            )
        else:
            self._pack = dict(
                m_pad=m_pad, e_dim=e_dim,
                mem_pts=jnp.asarray(pts), mem_cols=jnp.asarray(cols),
                mem_msk=jnp.asarray(msk), mem_cent=jnp.asarray(cent),
                mem_ex=jnp.asarray(ex), mem_ex_valid=jnp.asarray(ex_valid),
                mem_valid=jnp.asarray(valid),
                eval_pts=jnp.asarray(ev), eval_msk=jnp.asarray(ev_msk),
            )
        return self._pack

    # ------------------------------------------------------------------ #
    # localise (§3.2; reference object_memory.py:852-1169)
    # ------------------------------------------------------------------ #
    def localise(self, image_path, depth_image_path, **kwargs):
        """Returns (pose7 [x,y,z,qx,qy,qz,qw], [assignment, moved])."""
        return self.localise_finish(self.localise_dispatch(
            image_path, depth_image_path, **kwargs))

    def localise_many(self, frames, overlap: bool = True, batch: int = 1,
                      batch_mode: str = "vmap", **kwargs):
        """Pipelined batch localisation: dispatch every frame's fused device
        program before fetching any result (the throughput mode;
        single-frame `localise` is the latency mode). `frames` is a list of
        (image_path_or_rgb, depth_path_or_depth).

        overlap=True additionally fetches finished results on a consumer
        thread while the main thread preps/dispatches the next frames.
        Dispatch alone does NOT overlap host work with device compute on
        every backend (the axon tunnel starts executing a program when its
        first output is fetched — measured: per-frame wall was exactly
        host + compute, PERF.md); the blocking fetch on the side thread
        forces execution while the GIL is released, hiding the ~13 ms/frame
        of host detect/embed/pack under device compute. Results and
        per-frame semantics are identical either way.

        batch=G (with overlap) serves frames in chunks of G through ONE
        vmapped device program per chunk (localise_frames_batched), so the
        per-program launch/fetch overhead — ~25 ms over the axon tunnel,
        the largest per-frame cost after the compute itself — is paid once
        per G frames instead of once per frame, while the consumer thread
        still hides host prep under device execution. Partial/heterogeneous
        chunks are padded to G by repeating their last frame (padding rows
        are computed and dropped), keeping one compiled program per shape
        bucket. vmap lowering reproduces the single-query program
        bit-for-bit, so results are identical to batch=1."""
        if batch > 1:
            return self._localise_many_chunked(frames, batch, batch_mode,
                                               overlap, **kwargs)
        if not overlap:
            handles = [self.localise_dispatch(rgb, depth, **kwargs)
                       for rgb, depth in frames]
            return [self.localise_finish(h) for h in handles]

        import queue
        import threading

        results: list = []
        errors: list = []
        q: "queue.Queue" = queue.Queue(maxsize=8)

        def consumer():
            while True:
                h = q.get()
                if h is None:
                    return
                try:
                    results.append(self.localise_finish(h))
                except BaseException as e:   # surface on the caller's thread
                    errors.append(e)

        t = threading.Thread(target=consumer, daemon=True)
        t.start()
        try:
            for rgb, depth in frames:
                q.put(self.localise_dispatch(rgb, depth, **kwargs))
        finally:
            q.put(None)
            t.join()
        if errors:
            raise errors[0]
        return results

    def _localise_many_chunked(self, frames, batch, batch_mode, overlap,
                               **kwargs):
        import queue
        import threading

        results: list = [None] * len(frames)
        errors: list = []
        q: "queue.Queue" = queue.Queue(maxsize=4)

        def consumer():
            while True:
                h = q.get()
                if h is None:
                    return
                try:
                    self._finish_batch(h, results)
                except BaseException as e:
                    errors.append(e)

        t = threading.Thread(target=consumer, daemon=True)
        if overlap:
            t.start()
        pending: list = []
        try:
            for start in range(0, len(frames), batch):
                chunk = frames[start:start + batch]
                hosts = {start + j: self._localise_host(rgb, depth, **kwargs)
                         for j, (rgb, depth) in enumerate(chunk)}
                groups: dict = {}
                for i, hh in hosts.items():
                    if "result" in hh:
                        results[i] = hh["result"]
                        continue
                    gkey = (hh["qbuf"].shape, hh["dims"], hh["keep_debug"],
                            tuple(sorted(hh["statics"].items())))
                    groups.setdefault(gkey, []).append(i)
                for idxs in groups.values():
                    h = self._dispatch_batch(hosts, idxs, batch_mode,
                                             pad_to=batch)
                    if overlap:
                        q.put(h)
                    else:
                        pending.append(h)
        finally:
            if overlap:
                q.put(None)
                t.join()
        for h in pending:
            self._finish_batch(h, results)
        if errors:
            raise errors[0]
        return results

    def _dispatch_batch(self, hosts, idxs, batch_mode, pad_to=None):
        """Stack the host handles at `idxs` (a dict or list of handles) into
        one batched device dispatch; returns a handle for _finish_batch.
        pad_to=N repeats the last frame so every chunk compiles at one
        batch shape (extra rows are dropped at decode)."""
        batched_fn = (localise_frames_scanned if batch_mode == "scan"
                      else localise_frames_batched)
        take = list(idxs)
        if pad_to is not None and len(take) < pad_to:
            take += [take[-1]] * (pad_to - len(take))
        h0 = hosts[idxs[0]]
        bufs = jnp.asarray(np.stack([hosts[i]["qbuf"] for i in take]))
        byte_bufs = jnp.asarray(
            np.stack([hosts[i]["qbytes"] for i in take]))
        keys = jnp.stack([jax.random.PRNGKey(hosts[i]["frame_id"])
                          for i in take])
        mem_args, scalars = h0["mem_args"], h0["scalars"]
        if self.serving_mesh is not None:
            if self.mesh is not None:
                raise ValueError(
                    "serving_mesh (queries shard, memory replicates) and "
                    "mesh (memory shards over mem_axis) are mutually "
                    "exclusive — the packed memory buffers already carry "
                    f"{self.mem_axis!r}-sharded placements")
            from ..parallel.serving import place_sharded
            bufs, byte_bufs, keys, mem_args, scalars = place_sharded(
                self.serving_mesh, bufs, byte_bufs, keys, mem_args,
                scalars, cache=h0["pack"])
        hh, ww, d_pad, e_dim = h0["dims"]
        with self.timer.stage("loc.device"):
            packed = batched_fn(
                bufs, byte_bufs, *mem_args, *scalars, keys,
                h=hh, w=ww, d_pad=d_pad, e_dim=e_dim,
                keep_debug=h0["keep_debug"], **h0["statics"])
        return {"packed": packed, "idxs": list(idxs),
                "hosts": {i: hosts[i] for i in idxs}}

    def _finish_batch(self, handle, results):
        """ONE fetch for the whole batched program, then per-row decode into
        `results` at each frame's original index (padding rows trail the
        real ones and are ignored)."""
        with self.timer.stage("loc.fetch"):
            flat = np.asarray(handle["packed"])
        for row, i in zip(flat, handle["idxs"]):
            out = _decode_packed(row, handle["hosts"][i]["specs"],
                                 handle["hosts"][i]["treedef"])
            results[i] = self._finish_out(out, handle["hosts"][i])

    def localise_batched(self, frames, batch_mode: str = "vmap", **kwargs):
        """Batch localisation: all queries with matching shape/config
        buckets run as ONE device program with one upload and one fetch —
        amortizing per-launch overhead. `frames` is a list of (rgb, depth)
        like localise_many.

        batch_mode "vmap" (default) runs them as one batched program,
        bit-identical to the single-query path; "scan" runs them
        sequentially on device (lax.scan) — measured equal speed on the
        tunneled chip (the pipeline is compute-bound, PERF.md) but its loop
        context shifts backprojection by ~1 ulp, which registration can
        amplify into a different similarly-scored assignment, so it is an
        experimental option, not the default."""
        if batch_mode not in ("vmap", "scan"):
            raise ValueError(f"batch_mode must be 'vmap' or 'scan', "
                             f"got {batch_mode!r}")
        hosts = [self._localise_host(rgb, depth, **kwargs)
                 for rgb, depth in frames]
        results: list = [None] * len(hosts)
        groups: dict = {}
        for i, hh in enumerate(hosts):
            if "result" in hh:
                results[i] = hh["result"]
                continue
            key = (hh["qbuf"].shape, hh["dims"], hh["keep_debug"],
                   tuple(sorted(hh["statics"].items())))
            groups.setdefault(key, []).append(i)
        for idxs in groups.values():
            self._finish_batch(
                self._dispatch_batch(hosts, idxs, batch_mode), results)
        return results

    def localise_dispatch(self, image_path, depth_image_path, **kwargs):
        """Host stages + async single-query device dispatch. Returns an
        opaque handle for localise_finish (jax dispatch is async — the
        device program runs in the background while the host moves on)."""
        hh = self._localise_host(image_path, depth_image_path, **kwargs)
        if "result" in hh:
            return hh
        h, w, d_pad, e_dim = hh["dims"]
        with self.timer.stage("loc.device"):
            hh["packed"] = localise_frame_packed(
                jnp.asarray(hh["qbuf"]), jnp.asarray(hh["qbytes"]),
                *hh["mem_args"], *hh["scalars"],
                jax.random.PRNGKey(hh["frame_id"]),
                h=h, w=w, d_pad=d_pad, e_dim=e_dim,
                keep_debug=hh["keep_debug"], **hh["statics"])
        return hh

    def _localise_host(self, image_path, depth_image_path,
                 outlier_removal_config=None,
                 fpfh_global_dist_factor: float = 2.0,
                 fpfh_local_dist_factor: float = 0.4,
                 fpfh_voxel_size: float = 0.05,
                 consider_floor: bool = False,
                 depth_factor: float = 1.0,
                 max_detected_object_num: int = 7,
                 centroid_gate: float = 1.0,
                 testname: str = "", subtest_name: str = "",
                 save_point_clouds: bool = False,
                 save_root: str = "pcds"):
        """Host stages + async device dispatch. Returns an opaque handle for
        localise_finish (jax dispatch is async — the device program runs in
        the background while the host moves on)."""
        # note: unlike the reference (object_memory.py:880-884, which swaps in
        # its localise default), passing outlier_removal_config=None here
        # means NO outlier removal — needed for coarse-resolution depth where
        # the mm-scale default wipes entire clouds. Pass
        # LOCALISE_OUTLIER_CONFIG explicitly for the reference behavior.
        timer = self.timer
        consider_floor = False  # reference hard-disables this (object_memory.py:886)
        with timer.stage("loc.load"):
            rgb, depth = self._load_images(image_path, depth_image_path,
                                           depth_factor)
        with timer.stage("loc.detect"):
            det = (self.detector.find(rgb, consider_floor, depth=depth)
                   if getattr(self.detector, "wants_depth", False)
                   else self.detector.find(rgb, consider_floor))
        zero = (np.array([0., 0., 0., 0., 0., 0., 1.]), [[], []])
        if len(det) == 0 or len(self.memory) == 0:
            return {"result": zero}
        with timer.stage("loc.embed"):
            detected_embs = np.asarray(self.get_embeddings_func(
                detections=det, full_rgb_image=rgb, full_depth_image=depth,
                consider_floor=consider_floor))

        pack = self._pack_memory()
        m_pad = pack["m_pad"]
        top_n = max_detected_object_num
        k = min(top_n, 3)
        subsets_key = (top_n, k)
        if pack.get("subsets_key") != subsets_key:
            pack["subsets"] = jnp.asarray(make_subsets(top_n, k=k))
            pack["subsets_key"] = subsets_key   # cached device upload
        a_pad = round_up_pow2(sum(max(1, L) for L in range(1, k + 1)),
                              minimum=4)
        cfg = outlier_removal_config
        self._frame_counter += 1

        # ---- ONE upload, ONE program launch, ONE small fetch --------------
        # (over the tunneled chip every extra host<->device touch costs
        # ~30 ms; the query's heterogeneous inputs ship as one f32 buffer
        # and all outputs come back in one — localise_frame_packed)
        with timer.stage("loc.hostpack"):
            # Host d_pad cap: only the top_n biggest detections ever reach
            # registration (the device ranks by 3D point count,
            # _prepare_body top_k), so staging every cascade detection just
            # doubles the pixel-scaled prepare work AND flips d_pad across
            # power-of-2 buckets per frame — each bucket is a fresh remote
            # compile (the reference-scale scenes alternate 8/16,
            # perf/e2e_cpu_decompose.py r5). Rank by pixel count on host (a
            # proxy for point count — it can differ only through
            # depth-invalid pixels, hence the +margin slack) and keep
            # original relative order. IBL_DPAD_MARGIN=-1 restores
            # stage-everything.
            det_masks = np.asarray(det.masks)
            if 0 <= DPAD_MARGIN and len(det_masks) > top_n + DPAD_MARGIN:
                areas = np.count_nonzero(det_masks.reshape(
                    len(det_masks), -1), axis=1)
                keep = np.sort(np.argsort(-areas, kind="stable")
                               [:top_n + DPAD_MARGIN])
                det_masks = det_masks[keep]
                detected_embs = detected_embs[keep]
            n_det = len(det_masks)
            masks = self._pad_masks(det_masks, minimum=round_up_pow2(top_n))
            d_pad = len(masks)
            h, w = depth.shape
            e_dim = detected_embs.shape[1]
            embs_pad = np.zeros((d_pad, e_dim), np.float32)
            embs_pad[:n_det] = detected_embs
            det_valid = np.zeros((d_pad,), np.float32)
            det_valid[:n_det] = 1.0
            # small f32 section + byte section (rgb u8, u16 depth,
            # bit-packed masks): the all-f32 layout cost ~1.7 MB/query
            # ≈ 56 ms over the tunnel; depth ships as per-frame-scaled u16
            # (error <= max_depth/65535/2, ~0.1 mm at 10 m — far below the
            # 2 cm registration voxel)
            darr = np.nan_to_num(np.asarray(depth, np.float32),
                                 nan=0.0, posinf=0.0, neginf=0.0)
            dmax = float(darr.max())
            scale = (65535.0 / dmax) if dmax > 0 else 1.0
            d16 = np.round(darr.astype(np.float64) * scale).astype("<u2")
            qbuf = np.concatenate([
                np.float32([1.0 / scale]),
                embs_pad.ravel(), det_valid])
            qbytes = np.concatenate([
                np.asarray(rgb, np.uint8).ravel(),
                d16.ravel().view(np.uint8),
                np.packbits(np.asarray(masks, bool).ravel())])
            budget = 4 * top_n * 4  # reference pop budget: num_per_length*D*4
            statics = dict(
                top_n=top_n, budget=min(budget, (m_pad + 1) ** k),
                outlier_passes=2 if cfg else 0,
                nb_points=cfg["radius_nb_points"] if cfg else 0,
                min_det_points=16, a_pad=a_pad,
                reg_cap=REGISTRATION_CAPACITY, fpfh_cap=FPFH_CAPACITY,
                eval_cap=EVAL_CAPACITY, num_hyp=NUM_HYPOTHESES,
                icp_coarse_iters=ICP_COARSE_ITERS,
                icp_fine_iters=ICP_FINE_ITERS,
                icp_early_exit=ICP_EARLY_EXIT,
                reg_seeds=REG_SEEDS, fpfh_nn=FPFH_MAX_NN,
                ransac_pairs_max=RANSAC_PAIRS_MAX)
            scalars = (jnp.float32(self.camera_focal_lenth_x),
                       jnp.float32(self.camera_focal_lenth_y),
                       jnp.float32(cfg["radius"] if cfg else 0.05),
                       jnp.float32(fpfh_voxel_size),
                       jnp.float32(fpfh_global_dist_factor),
                       jnp.float32(fpfh_local_dist_factor),
                       jnp.float32(centroid_gate))
            mem_args = (pack["mem_pts"], pack["mem_cols"], pack["mem_msk"],
                        pack["mem_cent"], pack["mem_ex"],
                        pack["mem_ex_valid"], pack["mem_valid"],
                        pack["eval_pts"], pack["eval_msk"], pack["subsets"])
            spec_args = (jax.ShapeDtypeStruct((h, w), jnp.float32),
                         jax.ShapeDtypeStruct((h, w, 3), jnp.float32),
                         jax.ShapeDtypeStruct((d_pad, h, w), jnp.bool_),
                         jax.ShapeDtypeStruct((d_pad, e_dim), jnp.float32),
                         jax.ShapeDtypeStruct((d_pad,), jnp.bool_),
                         *mem_args, *scalars,
                         jax.random.PRNGKey(0))
            treedef, specs = localise_packed_spec(
                spec_args, statics, keep_debug=save_point_clouds)
        return {"qbuf": qbuf, "qbytes": qbytes,
                "statics": statics, "scalars": scalars,
                "mem_args": mem_args, "dims": (h, w, d_pad, e_dim),
                "keep_debug": save_point_clouds,
                "frame_id": self._frame_counter,
                "treedef": treedef, "specs": specs,
                "pack": pack, "zero": zero,
                "testname": testname, "subtest_name": subtest_name,
                "save_point_clouds": save_point_clouds,
                "save_root": save_root}

    def localise_finish(self, handle):
        """Fetch + decode a dispatched localisation (the only host sync)."""
        if "result" in handle:
            return handle["result"]
        with self.timer.stage("loc.fetch"):
            flat = np.asarray(handle["packed"])
        out = _decode_packed(flat, handle["specs"], handle["treedef"])
        return self._finish_out(out, handle)

    def _finish_out(self, out, handle):
        timer = self.timer
        pack = handle["pack"]
        zero = handle["zero"]
        testname = handle["testname"]
        subtest_name = handle["subtest_name"]
        save_point_clouds = handle["save_point_clouds"]
        save_root = handle["save_root"]

        with timer.stage("loc.finish"):
            n_active = int(out["active"].sum())
            assn_valid = out["assn_valid"]
            if n_active == 0 or not assn_valid.any():
                return zero

            def decode(i):
                pv = out["pair_valid"][i]
                return [[int(d), int(m)] for d, m in
                        zip(out["assn_det"][i][pv], out["assn_mem"][i][pv])]

            valid_idx = np.nonzero(assn_valid)[0]
            if self.log_enabled:
                self._log("Assignments being considered: "
                          f"{[decode(i) for i in valid_idx]}")
                for i in sorted(valid_idx,
                                key=lambda i: out["full_fitness"][i],
                                reverse=True):
                    self._log(
                        f"Assn: {decode(i)} | chosen RMSE: {out['rmse'][i]:.4f} | "
                        f"full RMSE: {out['full_rmse'][i]:.4f} | "
                        f"chosen fitness: {out['fitness'][i]:.4f} | "
                        f"full fitness: {out['full_fitness'][i]:.4f}")

            best = int(out["best"])
            if not assn_valid[best]:
                return zero
            best_assn = decode(best)
            localised_pose = np.asarray(out["pose7"], np.float64)

            if save_point_clouds:
                self._save_debug_clouds(pack, out, best, best_assn,
                                        testname, subtest_name, save_root)

        self._log(f"Best assn: {best_assn}")
        return localised_pose, [best_assn, None]

    def _save_debug_clouds(self, pack, out, best, best_assn,
                           testname, subtest_name, save_root):
        """Debug ply dumps (reference object_memory.py:946-966,1139-1161);
        uses the evaluation subsample of the detected cloud that the fused
        program already returns — opt-in only."""
        from ..utils.ply import write_ply

        subsave = os.path.join(save_root, testname, str(subtest_name))
        os.makedirs(subsave, exist_ok=True)
        det_pts = out["eval_det_pts"][out["eval_det_msk"]]
        mem_pts = np.asarray(pack["eval_pts"])[np.asarray(pack["eval_msk"])]
        write_ply(os.path.join(subsave, "_init_pcd.ply"),
                  np.concatenate([det_pts, mem_pts]))
        gT = out["transform"][best]
        moved_det = det_pts @ gT[:3, :3].T + gT[:3, 3]
        write_ply(os.path.join(subsave, f"_best_full_pcd{best_assn}.ply"),
                  np.concatenate([mem_pts, moved_det]))
