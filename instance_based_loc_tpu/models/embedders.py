"""Embedder registry (reference `utils/embeddings.py` + SURVEY.md §2.3).

The reference loads three HF models at *import time* and embeds one crop per
call (`utils/embeddings.py:13-28,31-120`). Here embedders are lazy factories
returning a single **batched** callable:

    embed(detections, full_rgb_image, full_depth_image, consider_floor)
        -> np.ndarray (M, E)

so a frame's M crops are one padded batch through one jitted apply.

Registry keys mirror the reference CLI contract (`--embeddings
{clip,dino,vit,dator}` — tum_localisation_trial.py:63-72) plus the
weights-free test embedders (`dummy`, `color`) that play the role of the
reference's `dummy_get_embs` pattern (synth_object_memory_trial.py:21-24).
"""

from __future__ import annotations

import numpy as np

_REGISTRY = {}


def register(name):
    def deco(fn):
        _REGISTRY[name] = fn
        return fn
    return deco


def get_embedder(name: str, **kwargs):
    """Build the named embedder; returns the batched callable."""
    if name not in _REGISTRY:
        raise KeyError(f"unknown embedder '{name}'; have {sorted(_REGISTRY)}")
    return _REGISTRY[name](**kwargs)


@register("dummy")
def _dummy(**_kwargs):
    """Constant embedding per detection — the reference's dummy_get_embs
    ([1,2,3] for every crop)."""
    def embed(detections, **_):
        return np.tile(np.array([1.0, 2.0, 3.0], np.float32),
                       (len(detections), 1))
    return embed


@register("color")
def _color(bins: int = 8, **_kwargs):
    """Masked color histogram (bins^3-dim, soft-assigned, L2-normalized):
    view-invariant and highly discriminative on the synthetic fixture — the
    weights-free embedder used by E2E tests. A plain 3-dim mean color is NOT
    enough: cosine similarities of all-positive 3-vectors cluster in
    [0.75, 1.0], too flat to disambiguate the near-rotationally-symmetric
    ring scenes the fixture generates."""
    def embed(detections, full_rgb_image, **_):
        img = np.asarray(full_rgb_image, np.float32) / 255.0
        dim = bins ** 3
        out = np.zeros((len(detections), dim), np.float32)
        for i, mask in enumerate(np.asarray(detections.masks)):
            sel = img[mask.astype(bool)]
            if not len(sel):
                continue
            idx = np.clip((sel * bins).astype(int), 0, bins - 1)
            flat = idx[:, 0] * bins * bins + idx[:, 1] * bins + idx[:, 2]
            hist = np.bincount(flat, minlength=dim).astype(np.float32)
            # small mean-color component keeps similar-but-distinct colors
            # in nearby-but-separate directions
            out[i] = hist / max(np.linalg.norm(hist), 1e-6)
        return out
    return embed


@register("vit")
def _vit(checkpoint_path: str | None = None, **kwargs):
    from .vit_embedder import build_vit_embedder
    return build_vit_embedder(variant="vit", checkpoint_path=checkpoint_path, **kwargs)


@register("dino")
def _dino(checkpoint_path: str | None = None, **kwargs):
    from .vit_embedder import build_vit_embedder
    return build_vit_embedder(variant="dino", checkpoint_path=checkpoint_path, **kwargs)


@register("clip")
def _clip(checkpoint_path: str | None = None, **kwargs):
    from .vit_embedder import build_vit_embedder
    return build_vit_embedder(variant="clip", checkpoint_path=checkpoint_path, **kwargs)


@register("dator")
def _dator(checkpoint_path: str | None = None, **kwargs):
    from .dator.embedder import build_dator_embedder
    return build_dator_embedder(checkpoint_path=checkpoint_path, **kwargs)
