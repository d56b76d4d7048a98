"""DATOR as a localisation embedder — the `dator_wrapper` the reference
*imports but never ships* (utils/embeddings.py:101-120 imports a missing
module; the intended recipe lives in dator/get_embeds.py:80-159). This module
closes that gap: load a trained FourDNet checkpoint, and embed (rgb crop,
depth crop) pairs batched."""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .fourdnet import FourDNet, FourDNetConfig
from .data import preprocess_rgb, preprocess_depth

MAX_CROPS = 16


def build_dator_embedder(checkpoint_path: str | None = None,
                         model_cfg: FourDNetConfig | None = None,
                         height: int = 256, width: int = 128,
                         max_crops: int = MAX_CROPS,
                         feature: str | None = None):
    """Batched embed callable for ObjectMemory. The depth crop is taken from
    the full depth image by the detection's bounding box, exactly as the
    reference does (utils/embeddings.py:112-117).

    feature: "embedding" (default — the reference's 128-d FourDNet output,
    get_embeds.py:159) or "cls" — the L2-normalized concat of the two
    towers' CLS tokens. "cls" is an opt-in for from-scratch checkpoints:
    the train-time aux heads supervise exactly these tokens, so they become
    discriminative long before the fusion head's diluted gradient path does
    (out/dator_r4_floor_bisect.md). Also settable via IBL_DATOR_FEATURE."""
    import os
    feature = feature or os.environ.get("IBL_DATOR_FEATURE", "embedding")
    cfg = model_cfg or FourDNetConfig()
    model = FourDNet(cfg)
    rng = jax.random.PRNGKey(0)
    dummy = jnp.zeros((1, height, width, 3), jnp.float32)

    def _template(model):
        # model.init is a fresh REMOTE compile over the axon tunnel
        # (minutes at dual-ViT-B scale — the r3 cascade cold-start lesson,
        # models/init_utils.py); the template values are overwritten by the
        # checkpoint load (or are benchmark-grade randoms), so host-side
        # synthesis is always sufficient here
        from ..init_utils import host_train_init
        return host_train_init(model, 0, dummy, dummy, training=False,
                               rngs={"params": rng, "dropout": rng})

    params = _template(model)
    if checkpoint_path is not None and checkpoint_path.endswith(".npz"):
        # flat params-only npz (train.save_params_npz) — the committed
        # cross-round checkpoint format. Adopt the npz's head geometry
        # before loading: the template tree must match exactly.
        import dataclasses
        from .train import load_params_npz
        flat = np.load(checkpoint_path)
        for key in flat.files:
            if "classifier" in key and "kernel" in key:
                n_cls = int(flat[key].shape[-1])
                if n_cls != cfg.num_classes:
                    cfg = dataclasses.replace(cfg, num_classes=n_cls)
                    model = FourDNet(cfg)
                    params = _template(model)
                break
        # strict=False: pre-BNNeck npz checkpoints lack the bottleneck
        # params; fresh init there is identity BN (mean 0 / var 1 / scale 1)
        params = load_params_npz(params, checkpoint_path, strict=False)
    elif checkpoint_path is not None:
        import orbax.checkpoint as ocp
        with ocp.StandardCheckpointer() as ckptr:
            try:
                # template-free restore handles trainer checkpoints whose
                # head geometry (num_classes) differs from the default
                # config — the 128-d feature path never reads the head
                raw = ckptr.restore(checkpoint_path)
                params = raw["params"] if "params" in raw else raw
            except Exception:
                restored = ckptr.restore(checkpoint_path,
                                         {"params": params})
                params = restored["params"]
        # adopt the checkpoint's head geometry (flax validates param
        # shapes at apply time even though the feature path ignores them)
        import dataclasses
        try:
            ck = params["params"]["classifier"]["kernel"]
            n_cls = int(ck.shape[-1])
            if n_cls != cfg.num_classes:
                cfg = dataclasses.replace(cfg, num_classes=n_cls)
                model = FourDNet(cfg)
        except (KeyError, TypeError):
            pass

    # params travel as an explicit jit argument, device-resident: baking them
    # in as closure constants serializes the full tree into the program body,
    # which blew the axon remote-compile 413 body limit at ViT-B scale for
    # vit_embedder (FourDNet is two ViT-B-class towers)
    params = jax.device_put(params)

    @jax.jit
    def apply(p, rgb_batch, depth_batch):
        if feature == "cls":
            _, _, (rc, dc) = model.apply(p, rgb_batch, depth_batch,
                                         training=False,
                                         return_cls_tokens=True)
            rc = rc / (jnp.linalg.norm(rc, axis=-1, keepdims=True) + 1e-8)
            dc = dc / (jnp.linalg.norm(dc, axis=-1, keepdims=True) + 1e-8)
            return jnp.concatenate([rc, dc], axis=-1)
        _, feat = model.apply(p, rgb_batch, depth_batch, training=False)
        return feat

    def embed(detections, full_rgb_image=None, full_depth_image=None, **_):
        n = len(detections)
        if n == 0:
            return np.zeros((0, cfg.reduced_dim), np.float32)
        rgbs = np.zeros((max_crops, height, width, 3), np.float32)
        depths = np.zeros((max_crops, height, width, 3), np.float32)
        outs = []
        full_depth = np.asarray(full_depth_image)
        for start in range(0, n, max_crops):
            idxs = range(start, min(start + max_crops, n))
            rgbs[:] = 0
            depths[:] = 0
            for slot, i in enumerate(idxs):
                crop = detections.crops[i]
                x1, y1, x2, y2 = detections.boxes_xyxy[i].astype(int)
                depth_crop = full_depth[max(y1, 0):max(y2, y1 + 1),
                                        max(x1, 0):max(x2, x1 + 1)]
                if depth_crop.size == 0:
                    depth_crop = np.zeros((2, 2), np.float32)
                rgbs[slot] = preprocess_rgb(crop, height, width)
                depths[slot] = preprocess_depth(depth_crop, height, width)
            feats = np.asarray(apply(params, jnp.asarray(rgbs),
                                     jnp.asarray(depths)))
            outs.append(feats[: len(list(idxs))])
        return np.concatenate(outs)[:n]

    return embed
