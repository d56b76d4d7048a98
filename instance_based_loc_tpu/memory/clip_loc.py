"""clip_loc — the alternative text/appearance-based localisation pipeline
(reference `clip_loc/`, SURVEY.md §2.7):

    ObjectMemory -> ClipLocObjectMemory (per object: joined-name text
    embedding + fitted ellipsoid) -> localize(img, K): detect -> embed crops
    -> cosine vs stored embeddings -> top-k candidates per detection ->
    RANSAC over 3-correspondence samples -> P3P poses -> score by projecting
    memory clouds into the image against the detection-bbox mask -> best pose.

TPU-native differences:
* all RANSAC rounds' P3P problems solve in ONE vmapped device call
  (ops.p3p.batched_p3p) instead of 100 sequential OpenCV calls;
* projection scoring is a batched point-in-bbox test, not a rasterized image;
* the winning pose gets a Gauss-Newton reprojection refinement (the reference
  returns the raw P3P pose);
* the embedding space is pluggable: with a CLIP text encoder the stored
  embedding is text (reference behavior, clip_loc_object_memory.py:70-84);
  without one, the mean exemplar crop embedding is stored so the pipeline
  stays runnable weights-free.
"""

from __future__ import annotations

import dataclasses
import os
import pickle

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.pointcloud import PointCloud
from ..ops.ellipsoid import fit_ellipsoid
from ..ops.p3p import batched_p3p, refine_pnp, project_points
from ..ops.transforms import rotmat_to_quat_xyzw
from ..utils.logging import conditional_log


@dataclasses.dataclass
class ClipLocObjectInfo:
    """Reference clip_loc_object_info.py: id, text, text emb, pcd, ellipsoid."""
    id: int
    text: str
    embedding: np.ndarray
    points: np.ndarray
    colors: np.ndarray
    ellipsoid_center: np.ndarray
    ellipsoid_axes: np.ndarray
    ellipsoid_lengths: np.ndarray

    @property
    def centroid(self) -> np.ndarray:
        return self.points.mean(0)


class ClipLocObjectMemory:
    def __init__(self, objects: list[ClipLocObjectInfo], log_enabled: bool = True):
        self.memory = objects
        self.log_enabled = log_enabled

    def _log(self, s):
        conditional_log(s, self.log_enabled)

    def __len__(self):
        return len(self.memory)

    # ------------------------------------------------------------------ #
    @staticmethod
    def from_object_memory(object_memory, text_embed_fn=None,
                           log_enabled: bool = True) -> "ClipLocObjectMemory":
        """Convert an ObjectMemory (clip_loc_object_memory.py:33-87). With a
        text encoder the stored embedding is CLIP-text of the joined names;
        otherwise the mean exemplar embedding (weights-free mode)."""
        objects = []
        for obj in object_memory.memory:
            pts, cols = obj.cloud.to_numpy()
            if len(pts) < 4:
                continue
            cloud = PointCloud.from_numpy(pts, cols)
            center, axes, lengths = fit_ellipsoid(cloud.points, cloud.mask)
            text = " ".join(obj.names)
            if text_embed_fn is not None:
                emb = np.asarray(text_embed_fn(text))
            else:
                emb = np.asarray(obj.mean_emb)
            objects.append(ClipLocObjectInfo(
                id=obj.id, text=text, embedding=emb,
                points=pts, colors=cols,
                ellipsoid_center=np.asarray(center),
                ellipsoid_axes=np.asarray(axes),
                ellipsoid_lengths=np.asarray(lengths)))
        return ClipLocObjectMemory(objects, log_enabled)

    def save(self, save_dir: str):
        os.makedirs(save_dir, exist_ok=True)
        with open(os.path.join(save_dir, "clip_loc_memory.pkl"), "wb") as f:
            pickle.dump([dataclasses.asdict(o) for o in self.memory], f)

    @staticmethod
    def load(save_dir: str, log_enabled: bool = True) -> "ClipLocObjectMemory":
        with open(os.path.join(save_dir, "clip_loc_memory.pkl"), "rb") as f:
            dicts = pickle.load(f)
        return ClipLocObjectMemory([ClipLocObjectInfo(**d) for d in dicts],
                                   log_enabled)

    # ------------------------------------------------------------------ #
    def localize(self, rgb_image, intrinsic_matrix, detector, embed_fn,
                 k: int = 3, rounds: int = 100, seed: int = 0,
                 points_per_object: int = 256):
        """Reference localize (clip_loc_object_memory.py:134-216). Returns a
        7-vec pose [t, q_xyzw] (camera-to-world) or None."""
        img = np.asarray(rgb_image)
        det = detector.find(img, consider_floor=False)
        self._log(f"\tDetected {len(det)} objects in the current image")
        if len(det) == 0 or len(self.memory) == 0:
            return None

        emb = np.asarray(embed_fn(detections=det, full_rgb_image=img,
                                  full_depth_image=np.zeros(img.shape[:2])))
        emb = emb / np.maximum(np.linalg.norm(emb, axis=1, keepdims=True), 1e-12)
        mem_emb = np.stack([o.embedding for o in self.memory])
        mem_emb = mem_emb / np.maximum(
            np.linalg.norm(mem_emb, axis=1, keepdims=True), 1e-12)
        sims = emb @ mem_emb.T                            # (D, M)
        k_eff = min(k, len(self.memory))
        top_k = np.argsort(-sims, axis=1)[:, :k_eff]       # (D, k)

        # candidate correspondence list (det_idx, mem_idx), best-first
        # (reference prosac_sampling_list, :160-168)
        pairs = [(d, int(top_k[d, i]))
                 for i in range(k_eff) for d in range(len(det))]

        centers_2d = np.stack([
            [(b[0] + b[2]) // 2, (b[1] + b[3]) // 2] for b in det.boxes_xyxy
        ]).astype(np.float32)

        rng = np.random.default_rng(seed)
        n_pairs = len(pairs)
        # P3P needs 3 correspondences with DISTINCT detections — with fewer
        # than 3 detections the sampling condition below is unsatisfiable
        # (reference behavior: solveP3P simply fails, :179-188)
        if n_pairs < 3 or len(det) < 3:
            return None
        # similarity-guided sampling (the PROSAC ordering the reference builds
        # but never exploits — clip_loc_object_memory.py:160-168): samples
        # with distinct detections, weighted by pair similarity
        pair_sims = np.array([max(sims[d, m], 1e-3) for d, m in pairs])
        pair_det = np.array([d for d, _ in pairs])
        probs = pair_sims / pair_sims.sum()
        samples = []
        attempts = 0
        while len(samples) < rounds and attempts < rounds * 20:
            attempts += 1
            cand = rng.choice(n_pairs, size=3, replace=False, p=probs)
            if len(set(pair_det[cand])) == 3:  # three distinct detections
                samples.append(cand)
        if not samples:
            return None
        samples = np.stack(samples)                        # (R, 3)
        det_idx = np.array([[pairs[i][0] for i in row] for row in samples])
        mem_idx = np.array([[pairs[i][1] for i in row] for row in samples])
        sample_sim = np.stack([pair_sims[row] for row in samples]).prod(1)

        world_pts = np.stack([[self.memory[m].centroid for m in row]
                              for row in mem_idx]).astype(np.float32)
        pixel_pts = centers_2d[det_idx]                    # (R, 3, 2)

        K = jnp.asarray(intrinsic_matrix, jnp.float32)
        poses, valid = batched_p3p(jnp.asarray(world_pts),
                                   jnp.asarray(pixel_pts), K)
        poses = np.asarray(poses).reshape(-1, 4, 4)        # (R*4, 4, 4)
        valid = np.asarray(valid).reshape(-1)
        sample_of_pose = np.repeat(np.arange(rounds), 4)

        # scoring: project each sampled memory object's subsampled cloud and
        # count hits inside the union of the 3 chosen detection bboxes
        sub_clouds = []
        for o in self.memory:
            pts = o.points
            if len(pts) > points_per_object:
                sel = rng.choice(len(pts), points_per_object, replace=False)
                pts = pts[sel]
            else:
                reps = int(np.ceil(points_per_object / max(len(pts), 1)))
                pts = np.tile(pts, (reps, 1))[:points_per_object]
            sub_clouds.append(pts)
        sub_clouds = jnp.asarray(np.stack(sub_clouds).astype(np.float32))  # (M, P, 3)

        boxes_j = jnp.asarray(det.boxes_xyxy)               # (D, 4)
        h_img, w_img = img.shape[:2]

        # Score every pose against ALL detections' top-1 memory matches.
        # The 3 sampled constraints are satisfied EXACTLY by every P3P root,
        # so only the remaining detections can disambiguate roots/mirrors —
        # the reference scores only the 3 chosen objects
        # (clip_loc_object_memory.py:190-210), which cannot.
        top1 = jnp.asarray(top_k[:, 0])
        all_dets = jnp.arange(len(det))

        def score_pose(pose):
            # DISTINCT-pixel count, like the reference's rasterized
            # logical_and of images (loc_utils.py:45-88): a degenerate pose
            # that clusters every point into a few pixels must score low.
            pts = sub_clouds[top1].reshape(-1, 3)           # (D*P, 3)
            per = sub_clouds.shape[1]
            owner_det = jnp.repeat(all_dets, per)
            px, in_front = project_points(pts, K, pose)
            bx = boxes_j                                     # (D, 4)
            x, y = px[:, 0], px[:, 1]
            ob = bx[owner_det]
            inside_own = ((x >= ob[:, 0]) & (x < ob[:, 2])
                          & (y >= ob[:, 1]) & (y < ob[:, 3]))
            on_image = (x >= 0) & (x < w_img) & (y >= 0) & (y < h_img)
            hit = inside_own & in_front & on_image
            xi = jnp.clip(x.astype(jnp.int32), 0, w_img - 1)
            yi = jnp.clip(y.astype(jnp.int32), 0, h_img - 1)
            flat = jnp.where(hit, yi * w_img + xi, h_img * w_img)  # dropped
            img = jnp.zeros(h_img * w_img, bool).at[flat].set(True, mode="drop")
            hits = jnp.sum(img.astype(jnp.float32))
            areas = jnp.maximum(bx[:, 2] - bx[:, 0], 1.0) * \
                jnp.maximum(bx[:, 3] - bx[:, 1], 1.0)
            return hits / jnp.sum(areas)

        score_batch = jax.jit(jax.vmap(score_pose))
        scores = np.asarray(score_batch(jnp.asarray(poses)))
        # weight geometric overlap by the sample's embedding similarity
        scores = scores * np.maximum(sample_sim[sample_of_pose], 1e-3)
        scores = np.where(valid, scores, -1.0)
        best = int(np.argmax(scores))
        if scores[best] < 0:
            return None
        best_pose = poses[best]

        # Gauss-Newton reprojection refinement over ALL inlier
        # correspondences: top-1 (detection, memory) pairs whose memory
        # centroid projects near the detection center under the winning pose
        # (improvement over the reference, which returns the raw P3P pose)
        cents_all = np.stack([o.centroid for o in self.memory]).astype(np.float32)
        top1 = top_k[:, 0]
        px_all, front_all = project_points(jnp.asarray(cents_all[top1]), K,
                                           jnp.asarray(best_pose, jnp.float32))
        px_all = np.asarray(px_all)
        reproj = np.linalg.norm(px_all - centers_2d, axis=1)
        inlier = np.asarray(front_all) & (reproj < 0.15 * max(h_img, w_img))
        if inlier.sum() >= 3:
            refined = refine_pnp(jnp.asarray(best_pose),
                                 jnp.asarray(cents_all[top1][inlier]),
                                 jnp.asarray(centers_2d[inlier]),
                                 jnp.ones(int(inlier.sum())), K)
        else:
            s = sample_of_pose[best]
            refined = refine_pnp(jnp.asarray(best_pose),
                                 jnp.asarray(world_pts[s]),
                                 jnp.asarray(pixel_pts[s]),
                                 jnp.ones(3), K)
        refined = np.asarray(refined)

        t = refined[:3, 3]
        q = np.asarray(rotmat_to_quat_xyzw(jnp.asarray(refined[:3, :3])))
        return np.concatenate([t, q])
