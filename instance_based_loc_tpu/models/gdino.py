"""GroundingDINO-style grounded detector skeleton — the cascade's stage 2
(reference: GroundingDINO SwinB, invoked per keyword with box 0.35 / text
0.55 thresholds — object_finder.py:98-106,180-207).

Architecture here (text-conditioned deformable DETR):

* Swin-B image tower (models/swin.py) -> 3-scale feature pyramid, projected
  to a shared model dim;
* text keyword encoded with the CLIP-text fallback tokenizer/encoder
  (GroundingDINO uses BERT; the contract — a text embedding that conditions
  the decoder and scores boxes — is identical);
* a deformable decoder: learned queries cross-attend to the multi-scale image
  memory through `ops.pallas.msda.multi_scale_deformable_attention` (the
  reference's custom CUDA op) with text-conditioned query refinement;
* heads: 4-d sigmoid box (cxcywh, normalized) + text-alignment logit per
  query; boxes above box_threshold with alignment above text_threshold return.

Weight porting for the official checkpoint is round-2 work; weights-free the
module runs structurally (random boxes), so the cascade's default grounder
remains the fallback unless a checkpoint is supplied.
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .swin import SwinTransformer, SWIN_B
from ..ops.pallas.msda import multi_scale_deformable_attention


@dataclasses.dataclass(frozen=True)
class GDinoConfig:
    img_size: int = 224          # pad-to-square input side
    model_dim: int = 256
    num_queries: int = 100
    num_heads: int = 8
    num_points: int = 4
    decoder_layers: int = 6
    text_dim: int = 512
    dtype: jnp.dtype = jnp.float32


class DeformableDecoderLayer(nn.Module):
    cfg: GDinoConfig
    spatial_shapes: tuple

    @nn.compact
    def __call__(self, queries, ref_points, memory, text_emb):
        """queries (B, Q, D), ref_points (B, Q, 2) in [0,1], memory (B, S, D),
        text_emb (B, D_text)."""
        c = self.cfg
        b, q, d = queries.shape
        l = len(self.spatial_shapes)
        h = c.num_heads
        k = c.num_points

        # text conditioning (GroundingDINO's cross-modality fusion, reduced
        # to FiLM-style gain/shift)
        t = nn.Dense(2 * d, name="text_film")(text_emb)      # (B, 2D)
        gain, shift = t[:, :d], t[:, d:]
        x = queries * (1 + gain[:, None]) + shift[:, None]

        # query self attention
        hsa = nn.LayerNorm(name="ln_sa")(x)
        hsa = nn.SelfAttention(num_heads=h, name="self_attn")(hsa)
        x = x + hsa

        # deformable cross attention via MSDA
        hca = nn.LayerNorm(name="ln_ca")(x)
        offsets = nn.Dense(h * l * k * 2, name="offsets")(hca)
        offsets = offsets.reshape(b, q, h, l, k, 2)
        weights = nn.Dense(h * l * k, name="weights")(hca)
        weights = jax.nn.softmax(weights.reshape(b, q, h, l * k), axis=-1)
        weights = weights.reshape(b, q, h, l, k)
        # sampling locations around the reference point; offsets are scaled
        # per level by 1/size inside the normalized space
        loc = ref_points[:, :, None, None, None, :] + offsets * 0.1
        loc = jnp.clip(loc, 0.0, 1.0)
        value = nn.Dense(d, name="value_proj")(memory)
        value = value.reshape(b, -1, h, d // h)
        sampled = multi_scale_deformable_attention(
            value, self.spatial_shapes, loc, weights)
        x = x + nn.Dense(d, name="ca_out")(sampled)

        # FFN
        hf = nn.LayerNorm(name="ln_ffn")(x)
        hf = nn.Dense(4 * d, name="fc1")(hf)
        hf = jax.nn.relu(hf)
        x = x + nn.Dense(d, name="fc2")(hf)
        return x


class GroundingDetector(nn.Module):
    cfg: GDinoConfig

    @nn.compact
    def __call__(self, images, text_emb):
        """images (B, S, S, 3); text_emb (B, text_dim).
        Returns (boxes (B, Q, 4) normalized cxcywh, scores (B, Q))."""
        c = self.cfg
        b = images.shape[0]
        feats = SwinTransformer(SWIN_B, name="backbone")(images)
        pyramid = [feats["c3"], feats["c4"], feats["c5"]]   # strides 8/16/32
        shapes = tuple((f.shape[1], f.shape[2]) for f in pyramid)
        memory = jnp.concatenate(
            [nn.Dense(c.model_dim, name=f"proj{i}")(f).reshape(b, -1, c.model_dim)
             for i, f in enumerate(pyramid)], axis=1)

        text = nn.Dense(c.model_dim, name="text_proj")(text_emb)

        queries = self.param("queries", nn.initializers.normal(0.02),
                             (c.num_queries, c.model_dim))
        ref_init = self.param("ref_points", nn.initializers.uniform(1.0),
                              (c.num_queries, 2))
        x = jnp.broadcast_to(queries[None], (b,) + queries.shape)
        ref = jnp.broadcast_to(jax.nn.sigmoid(ref_init)[None],
                               (b, c.num_queries, 2))
        for i in range(c.decoder_layers):
            x = DeformableDecoderLayer(c, shapes, name=f"layer{i}")(
                x, ref, memory, text)

        boxes = jax.nn.sigmoid(nn.Dense(4, name="box_head")(x))
        align = nn.Dense(c.model_dim, name="align_head")(x)
        scores = jax.nn.sigmoid(jnp.einsum("bqd,bd->bq", align, text)
                                / np.sqrt(c.model_dim))
        return boxes, scores


def build_gdino_grounder(checkpoint_path: str | None = None,
                         text_embed_fn=None,
                         box_threshold: float = 0.35,
                         cfg: GDinoConfig | None = None):
    """grounder(rgb, keyword) -> (boxes_cxcywh_norm, scores) for the cascade.
    Weights-free (no checkpoint): returns None so the cascade's fallback
    applies — random query boxes would only pollute dedup."""
    cfg = cfg or GDinoConfig()
    if text_embed_fn is None:
        from .clip_text import build_clip_text_embedder
        text_embed_fn = build_clip_text_embedder()
    model = GroundingDetector(cfg)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, cfg.img_size, cfg.img_size, 3), jnp.float32),
        jnp.zeros((1, cfg.text_dim), jnp.float32))
    have_weights = checkpoint_path is not None
    if have_weights:
        import pickle
        with open(checkpoint_path, "rb") as f:
            params = pickle.load(f)

    @jax.jit
    def apply(img, text):
        return model.apply(params, img, text)

    def grounder(rgb: np.ndarray, keyword: str):
        if not have_weights:
            return None, None
        from PIL import Image
        s = cfg.img_size
        img = np.asarray(Image.fromarray(rgb.astype(np.uint8)).resize(
            (s, s), Image.BILINEAR), np.float32) / 255.0
        text = np.asarray(text_embed_fn(keyword), np.float32)[None]
        boxes, scores = apply(jnp.asarray(img[None]), jnp.asarray(text))
        boxes = np.asarray(boxes)[0]
        scores = np.asarray(scores)[0]
        keep = scores > box_threshold
        return boxes[keep], scores[keep]

    return grounder
