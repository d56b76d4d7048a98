"""ReID data pipeline (reference `dator/datasets/`):

* directory-per-instance RGB/depth dataset scan (realsense.py:29-96 layout:
  root/{train,val,test}/{instance_id}/..._rgb.png + ..._depth.npy|png);
* the reference's depth preprocessing contract (bases.py:93-135): depth ->
  grayscale -> resize to (H=256, W=128) -> clip [0, 50] -> scale to [-1, 1],
  replicated to 3 channels; RGB: resize + normalize mean/std 0.5;
* P x K identity sampling (sampler.py:7-25): each batch holds P identities
  with K instances each. The DDP variant's gloo seed broadcast
  (sampler_ddp.py:12-35) is replaced by deterministic
  `fold_in(key, epoch)` — all hosts derive identical permutations.
"""

from __future__ import annotations

import dataclasses
import os
from collections import defaultdict

import numpy as np


@dataclasses.dataclass
class ReIDSample:
    rgb_path: str
    depth_path: str
    pid: int
    cam_id: int = 0


def scan_instance_dirs(root: str) -> list[ReIDSample]:
    """Scan dir-per-instance layout: root/<instance>/<name>_rgb.png pairs with
    <name>_depth.npy (the format ObjectDatasetMemory.dump_dataset writes —
    data_collection.py:208-225)."""
    samples = []
    pids = sorted(d for d in os.listdir(root)
                  if os.path.isdir(os.path.join(root, d)))
    for pid_idx, pid_dir in enumerate(pids):
        full = os.path.join(root, pid_dir)
        for f in sorted(os.listdir(full)):
            if f.endswith("_rgb.png") or f.endswith("_rgb.jpg"):
                stem = f.rsplit("_rgb.", 1)[0]
                for ext in ("npy", "png"):
                    dp = os.path.join(full, f"{stem}_depth.{ext}")
                    if os.path.exists(dp):
                        samples.append(ReIDSample(os.path.join(full, f), dp, pid_idx))
                        break
    return samples


def preprocess_rgb(rgb: np.ndarray, height: int = 256, width: int = 128) -> np.ndarray:
    """Resize + normalize mean/std .5 (val_transforms — get_embeds.py:80-87)."""
    from PIL import Image
    img = Image.fromarray(np.asarray(rgb).astype(np.uint8)).resize(
        (width, height), Image.BILINEAR)
    arr = np.asarray(img, np.float32) / 255.0
    return (arr - 0.5) / 0.5


def preprocess_depth(depth: np.ndarray, height: int = 256, width: int = 128,
                     clip_max: float = 50.0) -> np.ndarray:
    """The reference depth recipe (bases.py:93-135): grayscale -> resize ->
    clip [0, clip_max] -> scale to [-1, 1] -> 3 channels."""
    from PIL import Image
    d = np.asarray(depth, np.float32)
    if d.ndim == 3:
        d = d.mean(-1)
    img = Image.fromarray(d).resize((width, height), Image.BILINEAR)
    d = np.clip(np.asarray(img, np.float32), 0.0, clip_max)
    d = d / clip_max * 2.0 - 1.0
    return np.repeat(d[..., None], 3, axis=-1)


class PKSampler:
    """P identities x K instances per batch (datasets/sampler.py:7-25),
    deterministic across hosts via key folding."""

    def __init__(self, samples: list[ReIDSample], batch_size: int,
                 num_instances: int, seed: int = 0):
        assert batch_size % num_instances == 0
        self.samples = samples
        self.k = num_instances
        self.p = batch_size // num_instances
        self.seed = seed
        self.by_pid: dict[int, list[int]] = defaultdict(list)
        for i, s in enumerate(samples):
            self.by_pid[s.pid].append(i)

    def epoch_batches(self, epoch: int) -> list[list[int]]:
        rng = np.random.default_rng((self.seed, epoch))
        buckets = {}
        for pid, idxs in self.by_pid.items():
            idxs = list(idxs)
            rng.shuffle(idxs)
            # pad to a multiple of K by resampling (reference resamples with
            # replacement when an identity has < K instances)
            while len(idxs) % self.k != 0 or len(idxs) < self.k:
                idxs.append(int(rng.choice(self.by_pid[pid])))
            buckets[pid] = [idxs[i:i + self.k] for i in range(0, len(idxs), self.k)]
        # reference semantics (sampler.py:7-25): each batch draws P DISTINCT
        # identities and takes one K-chunk from each
        remaining = {pid: list(cs) for pid, cs in buckets.items()}
        batches = []
        while sum(1 for cs in remaining.values() if cs) >= self.p:
            avail = sorted(pid for pid, cs in remaining.items() if cs)
            chosen = rng.choice(len(avail), size=self.p, replace=False)
            batch = []
            for ci in chosen:
                pid = avail[ci]
                batch += remaining[pid].pop()
            batches.append(batch)
        return batches

    def load_all(self, height: int = 256, width: int = 128):
        """Preload the WHOLE dataset once as quantized arrays (u8 rgb
        (N, H, W, 3), u16 depth (N, H, W), i32 pids) for device-resident
        training (`train.make_pjit_dataset_train_step`): the dataset lives
        in HBM (~163 KB per 256x128 sample) and each step uploads only a
        (B,) index array."""
        return self.load_batch(list(range(len(self.samples))), height,
                               width, quantize=True)

    def load_batch(self, batch_idxs: list[int],
                   height: int = 256, width: int = 128,
                   quantize: bool = False):
        """quantize=True returns u8 rgb (B, H, W, 3) and single-channel u16
        depth (B, H, W) for device-side dequantization
        (`train.dequantize_batch`) — a ~4.8x smaller upload than the
        normalized f32 tensors (786 KB -> 163 KB per 256x128 sample), which
        is the binding constraint for on-chip training over the tunnel."""
        from PIL import Image
        rgbs, depths, pids = [], [], []
        for i in batch_idxs:
            s = self.samples[i]
            rgb = np.asarray(Image.open(s.rgb_path))[..., :3]
            if s.depth_path.endswith(".npy"):
                depth = np.load(s.depth_path)
            else:
                depth = np.asarray(Image.open(s.depth_path))
            if quantize:
                rgbs.append(np.asarray(
                    Image.fromarray(rgb.astype(np.uint8)).resize(
                        (width, height), Image.BILINEAR), np.uint8))
                d = np.asarray(depth, np.float32)
                if d.ndim == 3:
                    d = d.mean(-1)
                d = np.clip(np.asarray(
                    Image.fromarray(d).resize((width, height),
                                              Image.BILINEAR), np.float32),
                    0.0, 50.0)
                depths.append(np.round(d * (65535.0 / 50.0)).astype(np.uint16))
            else:
                rgbs.append(preprocess_rgb(rgb, height, width))
                depths.append(preprocess_depth(depth, height, width))
            pids.append(s.pid)
        return (np.stack(rgbs), np.stack(depths),
                np.asarray(pids, np.int32))
