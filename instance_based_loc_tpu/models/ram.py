"""RAM (Recognize Anything) open-set tagger — the cascade's stage 1
(reference: `recognize-anything` submodule, `ram_swin_large_14m` at 384^2,
producing an 'a | b | c' tag caption split on '|' — object_finder.py:48-59,
272-277).

Full inference architecture (Zhang et al., 2023 — query2label tagging):

* Swin-L vision tower at 384^2 (models/swin.py, timm window semantics) —
  final-stage tokens are LayerNorm'd and a global mean token is prepended
  (145 x 1536 for Swin-L/384);
* `image_proj` Linear 1536 -> 512 produces the cross-attention memory;
* per-tag label embeddings (num_tags x 512, shipped inside the official
  checkpoint as CLIP-text-derived vectors) pass `wordvec_proj` + relu into
  768-d query tokens;
* a 2-layer Q2L decoder (bidirectional self-attention over the tag queries,
  cross-attention to the image memory, FFN — BERT post-LN layout); layer
  math is parity-tested against torch BertLayer in
  tests/test_ram.py;
* a shared Linear 768 -> 1 scores every tag; sigmoid > per-class threshold
  (default 0.68) selects the caption tags.

The tag vocabulary (4,585 strings, index-aligned with the checkpoint's
label_embed rows) is data: pass `tag_list_path` pointing at the official
`ram_tag_list.txt`. Weights-free runs return an empty caption, which the
cascade handles by accepting an explicit caption, matching the reference's
`caption` override."""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .swin import SwinTransformer, SwinConfig

# A compact indoor-object vocabulary standing in for RAM's 4585-tag list
# when no checkpoint/tag list is provided (weights-free structural runs).
DEFAULT_TAG_VOCAB = (
    "chair table sofa lamp plant bed cabinet shelf monitor keyboard cup "
    "bottle book box bag pillow curtain door window sink toilet bathtub "
    "refrigerator oven microwave television couch desk stool bench vase "
    "bin crate barrel toy floor ground wall ceiling person"
).split()

RAM_SWIN_L = SwinConfig(embed_dim=192, num_heads=(6, 12, 24, 48), window=12,
                        img_size=384, adapt_window=True)


@dataclasses.dataclass(frozen=True)
class RamConfig:
    backbone: SwinConfig = RAM_SWIN_L
    num_tags: int = 4585
    label_dim: int = 512          # label embedding / image memory width
    hidden: int = 768             # decoder query width
    heads: int = 4
    layers: int = 2
    mlp_dim: int = 3072


class TagDecoderLayer(nn.Module):
    """One Q2L layer: self-attn over tag queries, cross-attn to image
    memory, FFN; post-LayerNorm (BertLayer with add_cross_attention)."""
    cfg: RamConfig

    @nn.compact
    def __call__(self, queries, memory):
        c = self.cfg
        b, q, d = queries.shape
        dh = d // c.heads

        def attend(x_q, x_kv, prefix):
            qh = nn.Dense(d, name=f"{prefix}_query")(x_q).reshape(
                b, -1, c.heads, dh)
            kh = nn.Dense(d, name=f"{prefix}_key")(x_kv).reshape(
                b, -1, c.heads, dh)
            vh = nn.Dense(d, name=f"{prefix}_value")(x_kv).reshape(
                b, -1, c.heads, dh)
            attn = jax.nn.softmax(
                jnp.einsum("bqhd,bkhd->bhqk", qh, kh) * (dh ** -0.5), axis=-1)
            out = jnp.einsum("bhqk,bkhd->bqhd", attn, vh).reshape(b, -1, d)
            return nn.Dense(d, name=f"{prefix}_out")(out)

        queries = nn.LayerNorm(epsilon=1e-12, name="self_norm")(
            queries + attend(queries, queries, "self"))
        queries = nn.LayerNorm(epsilon=1e-12, name="cross_norm")(
            queries + attend(queries, memory, "cross"))
        h = nn.Dense(c.mlp_dim, name="fc1")(queries)
        h = jax.nn.gelu(h, approximate=False)
        h = nn.Dense(d, name="fc2")(h)
        return nn.LayerNorm(epsilon=1e-12, name="out_norm")(queries + h)


class Ram(nn.Module):
    cfg: RamConfig

    @nn.compact
    def __call__(self, images):
        """images (B, S, S, 3) normalized -> per-tag logits (B, num_tags)."""
        c = self.cfg
        b = images.shape[0]
        feats = SwinTransformer(c.backbone, name="backbone")(images)
        last = feats[f"c{len(c.backbone.depths) + 1}"]
        # RAM's swin forward: final norm, then prepend the global mean token
        tokens = nn.LayerNorm(epsilon=1e-5, name="vis_norm")(
            last.reshape(b, -1, last.shape[-1]))
        tokens = jnp.concatenate([tokens.mean(axis=1, keepdims=True), tokens],
                                 axis=1)
        memory = nn.Dense(c.label_dim, name="image_proj")(tokens)

        label_embed = self.param("label_embed", nn.initializers.normal(0.02),
                                 (c.num_tags, c.label_dim))
        queries = jax.nn.relu(
            nn.Dense(c.hidden, name="wordvec_proj")(label_embed))
        queries = jnp.broadcast_to(queries[None], (b,) + queries.shape)
        for i in range(c.layers):
            queries = TagDecoderLayer(c, name=f"layer{i}")(queries, memory)
        return nn.Dense(1, name="fc")(queries)[..., 0]


IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def port_ram_params(checkpoint_path: str, cfg: RamConfig):
    """Map the official `ram_swin_large_14m.pth` state dict (timm-layout
    Swin keys under `visual_encoder.*`, Q2L head under `tagging_head.*`)
    into `Ram` flax params. Returns (params, class_thresholds or None)."""
    import torch
    raw = torch.load(checkpoint_path, map_location="cpu", weights_only=True)
    sd = raw.get("model", raw)
    sd = {k: np.asarray(v.numpy() if hasattr(v, "numpy") else v, np.float32)
          for k, v in sd.items()}

    def lin(k):
        return {"kernel": sd[k + ".weight"].T, "bias": sd[k + ".bias"]}

    def ln(k):
        return {"scale": sd[k + ".weight"], "bias": sd[k + ".bias"]}

    bb = {
        "patch_embed": {"kernel": sd["visual_encoder.patch_embed.proj.weight"]
                        .transpose(2, 3, 1, 0),
                        "bias": sd["visual_encoder.patch_embed.proj.bias"]},
        "patch_norm": ln("visual_encoder.patch_embed.norm"),
    }
    for s, depth in enumerate(cfg.backbone.depths):
        for i in range(depth):
            base = f"visual_encoder.layers.{s}.blocks.{i}."
            bb[f"stage{s}_block{i}"] = {
                "norm1": ln(base + "norm1"),
                "attn": {"qkv": lin(base + "attn.qkv"),
                         "proj": lin(base + "attn.proj"),
                         "rel_bias_table": sd[
                             base + "attn.relative_position_bias_table"]},
                "norm2": ln(base + "norm2"),
                "fc1": lin(base + "mlp.fc1"),
                "fc2": lin(base + "mlp.fc2"),
            }
        if s < len(cfg.backbone.depths) - 1:
            base = f"visual_encoder.layers.{s}.downsample."
            bb[f"merge{s}"] = {
                "norm": ln(base + "norm"),
                "reduction": {"kernel": sd[base + "reduction.weight"].T}}
    fshape = (cfg.backbone.embed_dim * 2 ** (len(cfg.backbone.depths) - 1),)
    bb["final_norm"] = {"scale": np.ones(fshape, np.float32),
                        "bias": np.zeros(fshape, np.float32)}

    p = {"backbone": bb,
         "vis_norm": ln("visual_encoder.norm"),
         "image_proj": lin("image_proj"),
         "label_embed": sd["label_embed"],
         "wordvec_proj": lin("wordvec_proj"),
         "fc": lin("fc")}
    for i in range(cfg.layers):
        base = f"tagging_head.encoder.layer.{i}."
        p[f"layer{i}"] = {
            "self_query": lin(base + "attention.self.query"),
            "self_key": lin(base + "attention.self.key"),
            "self_value": lin(base + "attention.self.value"),
            "self_out": lin(base + "attention.output.dense"),
            "self_norm": ln(base + "attention.output.LayerNorm"),
            "cross_query": lin(base + "crossattention.self.query"),
            "cross_key": lin(base + "crossattention.self.key"),
            "cross_value": lin(base + "crossattention.self.value"),
            "cross_out": lin(base + "crossattention.output.dense"),
            "cross_norm": ln(base + "crossattention.output.LayerNorm"),
            "fc1": lin(base + "intermediate.dense"),
            "fc2": lin(base + "output.dense"),
            "out_norm": ln(base + "output.LayerNorm"),
        }
    thresholds = None
    if "class_threshold" in sd:
        thresholds = np.asarray(sd["class_threshold"], np.float32)
    return {"params": p}, thresholds


def build_ram_tagger(checkpoint_path: str | None = None,
                     tag_vocab: list[str] | None = None,
                     tag_list_path: str | None = None,
                     threshold: float = 0.68,
                     image_size: int = 384,
                     cfg: RamConfig | None = None,
                     compute_dtype=None,
                     serving_mesh=None,
                     random_init: bool = False):
    """tagger(rgb) -> list[str] for CascadeDetector (reference
    object_finder.py:272-277 contract). Also exposes
    `tagger.tag_batch(frames) -> list[list[str]]`, which runs a chunk of
    frames as ONE batched device program; with `serving_mesh` the frame
    batch shards over the mesh "data" axis (parallel/cascade_serving.py).

    `random_init=True` initializes the real model without a checkpoint
    (benchmarks / batch-parity tests at the true program shapes)."""
    if tag_list_path is not None:
        with open(tag_list_path, encoding="utf-8") as f:
            vocab = [line.strip() for line in f if line.strip()]
    else:
        vocab = list(tag_vocab or DEFAULT_TAG_VOCAB)

    if checkpoint_path is None and not random_init:
        # cascade falls back to an explicit caption
        def tagger(rgb):
            return []

        tagger.tag_batch = lambda frames: [[] for _ in frames]
        return tagger

    # bf16 inference by default (models/precision.py); per-tag sigmoid
    # thresholding happens after an f32 upcast of the logits. The Swin
    # backbone threads its own dtype config, the Q2L decoder follows
    # operand promotion from the cast params.
    from .precision import resolve_compute_dtype, cast_params
    dt = resolve_compute_dtype(compute_dtype)

    cfg = cfg or dataclasses.replace(
        RamConfig(), num_tags=len(vocab),
        backbone=dataclasses.replace(RAM_SWIN_L, img_size=image_size))
    cfg = dataclasses.replace(
        cfg, backbone=dataclasses.replace(cfg.backbone, dtype=dt))
    model = Ram(cfg)
    if checkpoint_path is not None:
        params, class_thresholds = port_ram_params(checkpoint_path, cfg)
    else:
        # random_init path: host-synthesized params — model.init is a
        # remote compile over the tunnel (390 s at Swin-L@384,
        # perf/cascade_compile_probe.py) and the values are arbitrary here
        from .init_utils import host_random_params
        params = host_random_params(
            model, 0,
            jnp.zeros((1, cfg.backbone.img_size, cfg.backbone.img_size, 3),
                      jnp.float32))
        class_thresholds = None
    if class_thresholds is None:
        class_thresholds = np.full((cfg.num_tags,), threshold, np.float32)
    # device_put: porter/host trees are numpy — as bare jit args they
    # would re-upload the full weights EVERY call (~100 s/call for
    # H-scale trees over the tunnel)
    params = jax.device_put(cast_params(params, dt))

    @jax.jit
    def apply(p, raw):
        # u8 frames in; resize+normalize fused into the model program
        # (parallel/cascade_serving.py device_preprocess)
        from ..parallel.cascade_serving import device_preprocess
        img = device_preprocess(raw, image_size, IMAGENET_MEAN, IMAGENET_STD)
        return jax.nn.sigmoid(
            model.apply(p, img.astype(dt)).astype(jnp.float32))

    mesh_cache: dict = {}

    def _probs(raw: np.ndarray) -> np.ndarray:
        x = jnp.asarray(raw)
        p = params
        if serving_mesh is not None and raw.shape[0] > 1:
            from ..parallel.cascade_serving import (shard_stacked,
                                                    replicate_params)
            x = shard_stacked(serving_mesh, x)
            p = replicate_params(serving_mesh, params, mesh_cache)
        return np.asarray(apply(p, x))

    def _tags(probs: np.ndarray) -> list[str]:
        return [vocab[i] for i in np.nonzero(probs > class_thresholds)[0]
                if i < len(vocab)]

    def tagger(rgb: np.ndarray) -> list[str]:
        return _tags(_probs(np.asarray(rgb, np.uint8)[None])[0])

    def tag_batch(frames) -> list[list[str]]:
        if not len(frames):
            return []
        from ..parallel.cascade_serving import padded_count, pad_stacked
        frames = [np.asarray(f, np.uint8) for f in frames]
        if any(f.shape != frames[0].shape for f in frames):
            return [tagger(f) for f in frames]   # mixed sizes: per-frame
        imgs = pad_stacked(np.stack(frames),
                           padded_count(len(frames), serving_mesh))
        probs = _probs(imgs)[:len(frames)]
        return [_tags(p) for p in probs]

    def tag_batch_dispatch(frames):
        """Async half of tag_batch: queue the device program and return an
        opaque handle (jax dispatch is async — the chip computes while the
        host moves on; see CascadeDetector.find_stream's pipeline)."""
        if not len(frames):
            return ("empty", 0)
        from ..parallel.cascade_serving import padded_count, pad_stacked
        frames = [np.asarray(f, np.uint8) for f in frames]
        if any(f.shape != frames[0].shape for f in frames):
            return ("host", [tagger(f) for f in frames])
        imgs = pad_stacked(np.stack(frames),
                           padded_count(len(frames), serving_mesh))
        x = jnp.asarray(imgs)
        p = params
        if serving_mesh is not None and imgs.shape[0] > 1:
            from ..parallel.cascade_serving import (shard_stacked,
                                                    replicate_params)
            x = shard_stacked(serving_mesh, x)
            p = replicate_params(serving_mesh, params, mesh_cache)
        out = apply(p, x)
        # consumer thread: the tunneled device only executes a dispatched
        # program when an output is fetched (see .claude/skills/verify) —
        # a background fetch makes the dispatch truly asynchronous on both
        # tunneled and local devices
        import threading
        box: dict = {}

        def _pull():
            box["probs"] = np.asarray(out)

        t = threading.Thread(target=_pull, daemon=True)
        t.start()
        return ("device", t, box, len(frames))

    def tag_batch_finish(handle) -> list[list[str]]:
        if handle[0] == "empty":
            return []
        if handle[0] == "host":
            return handle[1]
        _, t, box, n = handle
        t.join()
        return [_tags(p) for p in box["probs"][:n]]

    tagger.tag_batch = tag_batch
    tagger.tag_batch_dispatch = tag_batch_dispatch
    tagger.tag_batch_finish = tag_batch_finish
    return tagger
