"""SPMD helpers for perception-cascade batch serving.

The reference runs its RAM -> GroundingDINO -> SAM cascade strictly
one-frame-at-a-time on one GPU (`object_memory/object_finder.py:259-299`,
driven per frame from `object_memory.py:163`). The TPU-native scaling story
mirrors `parallel/serving.py`'s localisation serving: a chunk of F frames is
stacked into fixed-shape batches (RAM inputs, SAM canvases+padded boxes,
GroundingDINO padded token tensors), the stacked axis shards over the mesh
"data" axis, and the read-only model parameters replicate — zero
cross-device collectives, every frame's program is independent.

The stage builders (`build_ram_tagger`, `build_gdino_grounder`,
`build_sam_segmenter`) accept `serving_mesh=` and route their `*_batch`
entry points through these helpers; `CascadeDetector.find_batch` is the
orchestration that uses them.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def device_preprocess(raw, size: int, mean, std, scale255: bool = True):
    """Traced helper: raw u8 frames (..., H, W, 3) -> square-resized,
    normalized f32 (..., size, size, 3) ON DEVICE. Replaces the host PIL
    resize+normalize the reference's torchvision transforms do per frame:
    the host then uploads only the raw u8 frame (~0.9 MB at 480x640)
    instead of the resized f32 tensor (1.8-12.6 MB per stage), and the
    resize runs as part of the model's own program. jax.image.resize
    antialiases its downscale like PIL/torchvision inference transforms."""
    img = raw.astype(jnp.float32)
    if scale255:
        img = img / 255.0
    img = jax.image.resize(img, raw.shape[:-3] + (size, size, 3), "bilinear")
    return (img - jnp.asarray(mean)) / jnp.asarray(std)


def padded_count(n: int, mesh: Mesh | None) -> int:
    """Frames per chunk after padding to a multiple of the mesh's data axis
    (stacked buffers must divide evenly across devices). No mesh: n."""
    if mesh is None:
        return n
    m = mesh.shape["data"]
    return -(-n // m) * m


def pad_stacked(arr: np.ndarray, n_padded: int) -> np.ndarray:
    """Pad a frame-stacked array along axis 0 by repeating the last row
    (padding rows compute real-but-discarded work; repeating the final frame
    keeps every lane's shapes and value ranges realistic)."""
    n = arr.shape[0]
    if n_padded == n:
        return arr
    reps = np.repeat(arr[-1:], n_padded - n, axis=0)
    return np.concatenate([arr, reps], axis=0)


def shard_stacked(mesh: Mesh, *arrays):
    """Place frame-stacked arrays sharded over the mesh "data" axis."""
    dsh = NamedSharding(mesh, P("data"))
    placed = tuple(jax.device_put(a, dsh) for a in arrays)
    return placed if len(placed) != 1 else placed[0]


def replicate_params(mesh: Mesh, params, cache: dict):
    """Replicate a read-only param tree over the mesh, broadcast once per
    (params, mesh) — cached so each serving chunk reuses the placement."""
    if cache.get("mesh") is mesh and cache.get("src") is params:
        return cache["placed"]
    placed = jax.device_put(params, NamedSharding(mesh, P()))
    cache["mesh"] = mesh
    cache["src"] = params
    cache["placed"] = placed
    return placed
