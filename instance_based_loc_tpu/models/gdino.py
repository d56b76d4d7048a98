"""GroundingDINO in flax — the cascade's detection stage (reference:
`object_memory/object_finder.py:98-106` loads the SwinB checkpoint from the
HF hub and calls gd_predict per keyword with box 0.35 / text 0.55 thresholds,
`:147-219`).

Full architecture, numerically matching Hugging Face
`GroundingDinoForObjectDetection` (the distribution format of the official
checkpoints) so `port_hf_gdino_params` round-trips real weights:

* Swin image backbone (models/swin.py, HF-exact) -> 3-scale pyramid + one
  extra stride-2 conv level, 1x1 conv + GroupNorm(32) projections;
* BERT text backbone (models/bert.py) with GroundingDINO's block-diagonal
  per-phrase self-attention mask and per-phrase position ids;
* feature-enhancer encoder: per layer, bi-directional image<->text fusion
  (GLIP-style BiMultiHeadAttention with layer-scale residuals), text
  self-attention enhancer, and multi-scale deformable self-attention over
  the flattened pyramid (ops/msda.py — the reference's custom CUDA
  op, here one fused XLA gather program);
* language-guided query selection (two-stage): encoder outputs scored by
  contrastive similarity with the enhanced text, top num_queries proposals
  become decoder reference boxes;
* decoder: self-attention, text cross-attention, deformable cross-attention
  per layer with sine reference-point query embeddings and iterative box
  refinement through one shared 3-layer MLP box head;
* heads: contrastive (dot-product with enhanced text) class logits padded to
  max_text_len, sigmoid cxcywh boxes.

Inference is batched, static-shape, jit-compiled; no pixel padding masks
(inputs are resized, not padded — TPU-first static shapes; the HF mask path
degenerates to all-ones which this implementation hard-codes)."""

from __future__ import annotations

import dataclasses
import math

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .swin import SwinTransformer, SwinConfig, port_hf_swin_params
from .bert import BertEncoder, BertConfig, port_hf_bert_params
from ..ops.msda import multi_scale_deformable_attention

# [CLS], [SEP], '.', '?' in the BERT vocab — phrase delimiters
SPECIAL_TOKEN_IDS = (101, 102, 1012, 1029)


@dataclasses.dataclass(frozen=True)
class GDinoConfig:
    # Deployment backbone = the grounding-dino-base checkpoint's Swin-B-384:
    # embed 128, depths [2,2,18,2], heads [4,8,16,32], WINDOW 12 (not the
    # Swin-B-224 window 7 — rel-bias tables are (2w-1)^2 x heads, so a
    # window-7 config cannot load the real weights; caught at deployment
    # scale by tests/test_fullscale_parity.py).
    backbone: SwinConfig = dataclasses.field(
        default_factory=lambda: SwinConfig(backbone_norms=True, window=12))
    text: BertConfig = dataclasses.field(default_factory=BertConfig)
    img_size: int = 800                 # square resize side
    d_model: int = 256
    num_queries: int = 900
    encoder_layers: int = 6
    decoder_layers: int = 6
    encoder_heads: int = 8
    decoder_heads: int = 8
    ffn_dim: int = 2048
    encoder_n_points: int = 4
    decoder_n_points: int = 4
    num_feature_levels: int = 4
    max_text_len: int = 256
    pos_temperature: float = 20.0
    out_stages: tuple = (1, 2, 3)       # swin stages feeding the pyramid
    dtype: jnp.dtype = jnp.float32


def make_text_masks(input_ids: np.ndarray):
    """GroundingDINO's block-diagonal text self-attention mask + per-phrase
    position ids (HF `generate_masks_with_special_tokens_and_transfer_map`).
    input_ids (B, T) -> (allowed (B, T, T) bool, position_ids (B, T) int)."""
    input_ids = np.asarray(input_ids)
    b, t = input_ids.shape
    special = np.zeros((b, t), bool)
    for sid in SPECIAL_TOKEN_IDS:
        special |= input_ids == sid
    allowed = np.broadcast_to(np.eye(t, dtype=bool), (b, t, t)).copy()
    position_ids = np.zeros((b, t), np.int64)
    for row in range(b):
        previous_col = 0
        for col in np.nonzero(special[row])[0]:
            if col == 0 or col == t - 1:
                allowed[row, col, col] = True
                position_ids[row, col] = 0
            else:
                allowed[row, previous_col + 1:col + 1,
                        previous_col + 1:col + 1] = True
                position_ids[row, previous_col + 1:col + 1] = np.arange(
                    0, col - previous_col)
            previous_col = col
    return allowed, position_ids


def sine_pos_2d(h: int, w: int, d_model: int, temperature: float):
    """(h*w, d_model) sine position embedding, HF GroundingDino convention
    (cumsum of an all-ones mask, eps 1e-6, scale 2*pi, y then x)."""
    half = d_model // 2
    eps = 1e-6
    scale = 2 * math.pi
    y = (np.arange(h, dtype=np.float32) + 1.0) / (h + eps) * scale
    x = (np.arange(w, dtype=np.float32) + 1.0) / (w + eps) * scale
    dim_t = np.arange(half, dtype=np.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / half)
    py = y[:, None] / dim_t                               # (h, half)
    px = x[:, None] / dim_t
    py = np.stack([np.sin(py[:, 0::2]), np.cos(py[:, 1::2])], -1).reshape(h, -1)
    px = np.stack([np.sin(px[:, 0::2]), np.cos(px[:, 1::2])], -1).reshape(w, -1)
    pos = np.concatenate(
        [np.broadcast_to(py[:, None], (h, w, half)),
         np.broadcast_to(px[None, :], (h, w, half))], axis=-1)
    return jnp.asarray(pos.reshape(h * w, d_model))


def get_sine_pos_embed(pos, num_pos_feats: int, temperature: float = 10000.0,
                       exchange_xy: bool = True):
    """(..., n) positions -> (..., n*num_pos_feats) sine embeddings (HF
    `get_sine_pos_embed`): per scalar, interleaved sin(even)/cos(odd)."""
    scale = 2 * math.pi
    dim_t = np.arange(num_pos_feats, dtype=np.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / num_pos_feats)
    dim_t = jnp.asarray(dim_t)

    def one(x):                                           # (...,) -> (..., F)
        sx = x[..., None] * scale / dim_t
        return jnp.stack([jnp.sin(sx[..., 0::2]), jnp.cos(sx[..., 1::2])],
                         axis=-1).reshape(sx.shape[:-1] + (num_pos_feats,))

    embs = [one(pos[..., i]) for i in range(pos.shape[-1])]
    if exchange_xy and len(embs) >= 2:
        embs[0], embs[1] = embs[1], embs[0]
    return jnp.concatenate(embs, axis=-1)


def _logit(x, eps=1e-5):
    x = jnp.clip(x, eps, 1 - eps)
    return jnp.log(x / (1 - x))


class MultiheadAttention(nn.Module):
    """HF GroundingDinoMultiheadAttention: separate q/k/v/out linears,
    additive float mask, 1/sqrt(head_dim) scaling."""
    heads: int

    @nn.compact
    def __call__(self, queries, keys, values, attn_bias=None):
        d = queries.shape[-1]
        dh = d // self.heads

        def split(y, n):
            return y.reshape(y.shape[0], n, self.heads, dh)

        q = split(nn.Dense(d, name="query")(queries), queries.shape[1])
        k = split(nn.Dense(d, name="key")(keys), keys.shape[1])
        v = split(nn.Dense(d, name="value")(values), values.shape[1])
        # dh ** -0.5 is a WEAK Python float: np.sqrt would be a strong f64
        # scalar and silently promote bf16 scores (and everything downstream,
        # incl. the fused vision stream) to f32 — see PERF.md bf16 audit
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) * (dh ** -0.5)
        if attn_bias is not None:
            scores = scores + attn_bias
        probs = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v)
        out = out.reshape(queries.shape[0], queries.shape[1], d)
        return nn.Dense(d, name="out_proj")(out)


class BiMultiHeadAttention(nn.Module):
    """GLIP-style bi-directional image<->text cross attention."""
    cfg: GDinoConfig

    @nn.compact
    def __call__(self, vision, text, text_pad_mask=None):
        """vision (B, S, D), text (B, T, D); text_pad_mask (B, T) True=pad.
        Returns (delta_vision, delta_text)."""
        c = self.cfg
        embed_dim = c.ffn_dim // 2
        heads = c.encoder_heads // 2
        dh = embed_dim // heads
        b, s, _ = vision.shape
        t = text.shape[1]

        def split(y):
            return y.reshape(b, -1, heads, dh).transpose(0, 2, 1, 3)

        vq = split(nn.Dense(embed_dim, name="vision_proj")(vision) * dh ** -0.5)
        tk = split(nn.Dense(embed_dim, name="text_proj")(text))
        vv = split(nn.Dense(embed_dim, name="values_vision_proj")(vision))
        tv = split(nn.Dense(embed_dim, name="values_text_proj")(text))

        attn = jnp.einsum("bhsd,bhtd->bhst", vq, tk)       # (B, H, S, T)
        attn = attn - jnp.max(attn)
        attn = jnp.clip(attn, -50000, 50000)
        attn_t = attn.transpose(0, 1, 3, 2)                # (B, H, T, S)
        attn_t = attn_t - jnp.max(attn_t, axis=-1, keepdims=True)
        attn_t = jnp.clip(attn_t, -50000, 50000)

        if text_pad_mask is not None:
            attn = jnp.where(text_pad_mask[:, None, None, :], -jnp.inf, attn)
        v_probs = jax.nn.softmax(attn, axis=-1)
        t_probs = jax.nn.softmax(attn_t, axis=-1)

        v_out = jnp.einsum("bhst,bhtd->bhsd", v_probs, tv)
        t_out = jnp.einsum("bhts,bhsd->bhtd", t_probs, vv)
        v_out = v_out.transpose(0, 2, 1, 3).reshape(b, s, embed_dim)
        t_out = t_out.transpose(0, 2, 1, 3).reshape(b, t, embed_dim)
        return (nn.Dense(c.d_model, name="out_vision_proj")(v_out),
                nn.Dense(c.d_model, name="out_text_proj")(t_out))


class FusionLayer(nn.Module):
    cfg: GDinoConfig

    @nn.compact
    def __call__(self, vision, text, text_pad_mask=None):
        c = self.cfg
        vision = nn.LayerNorm(epsilon=1e-5, name="layer_norm_vision")(vision)
        text = nn.LayerNorm(epsilon=1e-5, name="layer_norm_text")(text)
        dv, dt = BiMultiHeadAttention(c, name="attn")(vision, text,
                                                      text_pad_mask)
        vision_scale = self.param("vision_param",
                                  nn.initializers.constant(1e-4), (c.d_model,))
        text_scale = self.param("text_param",
                                nn.initializers.constant(1e-4), (c.d_model,))
        return vision + vision_scale * dv, text + text_scale * dt


class TextEnhancerLayer(nn.Module):
    cfg: GDinoConfig

    @nn.compact
    def __call__(self, text, attn_bias, pos_embed):
        c = self.cfg
        qk = text + pos_embed
        attn = MultiheadAttention(c.encoder_heads // 2, name="self_attn")(
            qk, qk, text, attn_bias)
        text = nn.LayerNorm(epsilon=1e-5, name="layer_norm_before")(text + attn)
        h = jax.nn.relu(nn.Dense(c.ffn_dim // 2, name="fc1")(text))
        h = nn.Dense(c.d_model, name="fc2")(h)
        return nn.LayerNorm(epsilon=1e-5, name="layer_norm_after")(text + h)


class DeformableAttention(nn.Module):
    """Multi-scale deformable attention block (HF
    GroundingDinoMultiscaleDeformableAttention)."""
    cfg: GDinoConfig
    heads: int
    n_points: int
    spatial_shapes: tuple

    @nn.compact
    def __call__(self, queries, value_src, reference_points):
        """queries (B, Q, D) WITH position embeddings already added;
        value_src (B, S, D); reference_points (B, Q, L, 2 or 4)."""
        c = self.cfg
        b, q, d = queries.shape
        h, k, l = self.heads, self.n_points, len(self.spatial_shapes)
        value = nn.Dense(d, name="value_proj")(value_src)
        value = value.reshape(b, -1, h, d // h)
        offsets = nn.Dense(h * l * k * 2, name="sampling_offsets")(queries)
        offsets = offsets.reshape(b, q, h, l, k, 2)
        weights = nn.Dense(h * l * k, name="attention_weights")(queries)
        weights = jax.nn.softmax(weights.reshape(b, q, h, l * k), axis=-1)
        weights = weights.reshape(b, q, h, l, k)
        if reference_points.shape[-1] == 2:
            normalizer = jnp.asarray(
                [(w_, h_) for (h_, w_) in self.spatial_shapes], jnp.float32)
            loc = (reference_points[:, :, None, :, None, :]
                   + offsets / normalizer[None, None, None, :, None, :])
        else:
            loc = (reference_points[:, :, None, :, None, :2]
                   + offsets / k * reference_points[:, :, None, :, None, 2:]
                   * 0.5)
        out = multi_scale_deformable_attention(value, self.spatial_shapes,
                                               loc, weights)
        # MSDA accumulates in f32 by design; return to the stream dtype so
        # one deformable block doesn't promote every later layer (and their
        # MSDA value gathers) to f32 in bf16 deployment
        return nn.Dense(d, name="output_proj")(out.astype(queries.dtype))


class DeformableLayer(nn.Module):
    cfg: GDinoConfig
    spatial_shapes: tuple

    @nn.compact
    def __call__(self, vision, pos_embed, reference_points):
        c = self.cfg
        attn = DeformableAttention(c, c.encoder_heads, c.encoder_n_points,
                                   self.spatial_shapes, name="self_attn")(
            vision + pos_embed, vision, reference_points)
        vision = nn.LayerNorm(epsilon=1e-5, name="self_attn_layer_norm")(vision + attn)
        h = jax.nn.relu(nn.Dense(c.ffn_dim, name="fc1")(vision))
        h = nn.Dense(c.d_model, name="fc2")(h)
        return nn.LayerNorm(epsilon=1e-5, name="final_layer_norm")(vision + h)


class EncoderLayer(nn.Module):
    cfg: GDinoConfig
    spatial_shapes: tuple

    @nn.compact
    def __call__(self, vision, text, vision_pos, vision_ref, text_attn_bias,
                 text_pos, text_pad_mask):
        vision, text = FusionLayer(self.cfg, name="fusion_layer")(
            vision, text, text_pad_mask)
        text = TextEnhancerLayer(self.cfg, name="text_enhancer_layer")(
            text, text_attn_bias, text_pos)
        vision = DeformableLayer(self.cfg, self.spatial_shapes,
                                 name="deformable_layer")(
            vision, vision_pos, vision_ref)
        return vision, text


class DecoderLayer(nn.Module):
    cfg: GDinoConfig
    spatial_shapes: tuple

    @nn.compact
    def __call__(self, hidden, query_pos, reference_points, vision, text,
                 text_cross_bias):
        c = self.cfg
        qk = hidden + query_pos
        attn = MultiheadAttention(c.decoder_heads, name="self_attn")(
            qk, qk, hidden)
        hidden = nn.LayerNorm(epsilon=1e-5, name="self_attn_layer_norm")(hidden + attn)

        attn = MultiheadAttention(c.decoder_heads, name="encoder_attn_text")(
            hidden + query_pos, text, text, text_cross_bias)
        hidden = nn.LayerNorm(epsilon=1e-5, name="encoder_attn_text_layer_norm")(
            hidden + attn)

        attn = DeformableAttention(c, c.decoder_heads, c.decoder_n_points,
                                   self.spatial_shapes, name="encoder_attn")(
            hidden + query_pos, vision, reference_points)
        hidden = nn.LayerNorm(epsilon=1e-5, name="encoder_attn_layer_norm")(hidden + attn)

        h = jax.nn.relu(nn.Dense(c.ffn_dim, name="fc1")(hidden))
        h = nn.Dense(c.d_model, name="fc2")(h)
        return nn.LayerNorm(epsilon=1e-5, name="final_layer_norm")(hidden + h)


class MLPHead(nn.Module):
    hidden_dim: int
    output_dim: int
    num_layers: int

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers):
            out = self.output_dim if i == self.num_layers - 1 else self.hidden_dim
            x = nn.Dense(out, name=f"layers_{i}")(x)
            if i < self.num_layers - 1:
                x = jax.nn.relu(x)
        return x


class GroundingDino(nn.Module):
    """Full two-stage grounded detector. Returns (logits (B, Q, max_text_len),
    boxes (B, Q, 4) normalized cxcywh)."""
    cfg: GDinoConfig

    @staticmethod
    def _encoder_reference_points(shapes):
        """(S, L, 2) normalized per-level center grids (valid ratios = 1)."""
        pts = []
        for (h, w) in shapes:
            ry = (np.arange(h, dtype=np.float32) + 0.5) / h
            rx = (np.arange(w, dtype=np.float32) + 0.5) / w
            g = np.stack(np.meshgrid(rx, ry, indexing="xy"), -1)  # (h, w, 2)
            pts.append(g.reshape(-1, 2))
        ref = np.concatenate(pts, axis=0)                          # (S, 2)
        return jnp.asarray(np.broadcast_to(ref[:, None],
                                           (ref.shape[0], len(shapes), 2)))

    @staticmethod
    def _proposals(shapes):
        """(S, 4) logit-space proposal boxes per HF
        generate_encoder_output_proposals, plus validity (S,) bool."""
        out = []
        for lvl, (h, w) in enumerate(shapes):
            gy, gx = np.meshgrid(np.arange(h, dtype=np.float32),
                                 np.arange(w, dtype=np.float32), indexing="ij")
            grid = np.stack([gx, gy], -1)
            grid = (grid + 0.5) / np.asarray([w, h], np.float32)
            wh = np.ones_like(grid) * 0.05 * 2.0 ** lvl
            out.append(np.concatenate([grid, wh], -1).reshape(-1, 4))
        props = np.concatenate(out, axis=0)
        valid = ((props > 0.01) & (props < 0.99)).all(-1)
        logits = np.log(props / (1 - props))
        logits[~valid] = np.inf
        return jnp.asarray(logits), jnp.asarray(valid)

    @nn.compact
    def __call__(self, images, input_ids, text_allowed, position_ids,
                 text_token_mask, text_embeds=None):
        """images (B, H, W, 3) normalized; input_ids (B, T);
        text_allowed (B, T, T) bool (make_text_masks); position_ids (B, T);
        text_token_mask (B, T) bool, True = real token. `text_embeds`
        (B, T, D_bert): host-side word-embedding rows — the serving path
        passes these so the 30522x768 vocab table never enters the device
        program (saves ~11 ms/forward of table staging, gdino_trace.py)."""
        c = self.cfg
        b = images.shape[0]

        text = BertEncoder(c.text, name="text_backbone")(
            input_ids, text_allowed.astype(jnp.float32),
            jnp.zeros_like(input_ids), position_ids,
            word_embeds=text_embeds)
        text = nn.Dense(c.d_model, name="text_projection")(text)
        # keep text in the deployment compute dtype: BERT runs f32 internally
        # and an f32 `text` would promote the whole fusion encoder (and thus
        # the MSDA value maps) back to f32 after the first fusion layer —
        # measured as the dominant GDINO@800 cost (f32 gathers; PERF.md).
        # No-op in f32 mode.
        text = text.astype(c.backbone.dtype)
        t = text.shape[1]

        # --- backbone + multi-scale projections ---
        level_embed = self.param("level_embed", nn.initializers.normal(1.0),
                                 (c.num_feature_levels, c.d_model))
        feats = SwinTransformer(c.backbone, name="backbone")(images)
        sources = [feats[f"c{s + 2}"] for s in c.out_stages]
        maps = []
        for i in range(c.num_feature_levels):
            if i < len(sources):
                src = sources[i]
            elif i == len(sources):
                src = sources[-1]      # extra level convolves the backbone out
            else:
                src = maps[-1]         # further levels chain the projected map
            if i < len(sources):
                proj = nn.Conv(c.d_model, (1, 1), padding="VALID",
                               name=f"input_proj_{i}")
            else:
                proj = nn.Conv(c.d_model, (3, 3), strides=(2, 2),
                               padding=((1, 1), (1, 1)),
                               name=f"input_proj_{i}")
            maps.append(nn.GroupNorm(num_groups=32, epsilon=1e-5,
                                     name=f"input_norm_{i}")(proj(src)))
        flat, pos_list, shapes = [], [], []
        for lvl, m in enumerate(maps):
            _, h, w, d = m.shape
            shapes.append((h, w))
            flat.append(m.reshape(b, h * w, d))
            pos_list.append(sine_pos_2d(h, w, c.d_model, c.pos_temperature)
                            + level_embed[lvl][None, :])
        memory = jnp.concatenate(flat, axis=1)
        # positional tables and attention biases follow the activation dtype
        # so bf16 inference (models/precision.py) doesn't silently promote
        # the encoder/decoder back to f32 (no-op casts in f32 mode)
        adt = memory.dtype
        vision_pos = jnp.concatenate(pos_list, axis=0).astype(adt)
        shapes = tuple(shapes)
        vision_ref = self._encoder_reference_points(shapes)[None]

        neg = jnp.finfo(adt).min
        text_attn_bias = jnp.where(text_allowed[:, None], 0.0, neg).astype(adt)
        text_pad_mask = ~text_token_mask
        text_pos = get_sine_pos_embed(
            position_ids[..., None].astype(jnp.float32), c.d_model,
            exchange_xy=False).astype(adt)

        for i in range(c.encoder_layers):
            memory, text = EncoderLayer(c, shapes, name=f"encoder_layer{i}")(
                memory, text, vision_pos[None], vision_ref, text_attn_bias,
                text_pos, text_pad_mask)

        bbox_head = MLPHead(c.d_model, 4, 3, name="bbox_head")  # shared
        ref_point_head = MLPHead(c.d_model, c.d_model, 2, name="ref_point_head")
        decoder_norm = nn.LayerNorm(epsilon=1e-5, name="decoder_norm")
        query_embed = self.param("query_embed", nn.initializers.normal(1.0),
                                 (c.num_queries, c.d_model))

        # --- language-guided query selection (two-stage) ---
        proposals, valid = self._proposals(shapes)
        oq = jnp.where(valid[None, :, None], memory, 0.0)
        oq = nn.LayerNorm(epsilon=1e-5, name="enc_output_norm")(
            nn.Dense(c.d_model, name="enc_output")(oq))
        enc_class = jnp.einsum("bsd,btd->bst", oq, text)
        enc_class = jnp.where(text_token_mask[:, None, :], enc_class, -jnp.inf)
        enc_coord = MLPHead(c.d_model, 4, 3, name="enc_bbox_head")(oq) \
            + proposals[None]
        # NOTE: HF does NOT exclude invalid proposals from top-k (their class
        # scores stay finite); reproduce exactly for checkpoint parity.
        topk_scores = jnp.max(enc_class, axis=-1)          # (B, S)
        _, topk_idx = jax.lax.top_k(topk_scores, c.num_queries)
        topk_coords = jnp.take_along_axis(enc_coord, topk_idx[..., None],
                                          axis=1)
        reference = jax.nn.sigmoid(topk_coords)             # (B, Q, 4)
        hidden = jnp.broadcast_to(query_embed[None], (b,) + query_embed.shape)

        text_cross_bias = jnp.where(text_token_mask[:, None, None, :],
                                    0.0, neg).astype(adt)

        # --- decoder with iterative box refinement ---
        intermediate, inter_refs = [], []
        init_reference = reference
        for i in range(c.decoder_layers):
            ref_input = jnp.broadcast_to(
                reference[:, :, None], reference.shape[:2]
                + (len(shapes), 4))
            query_sine = get_sine_pos_embed(reference, c.d_model // 2,
                                            exchange_xy=True)
            query_pos = ref_point_head(query_sine.astype(adt))
            hidden = DecoderLayer(c, shapes, name=f"decoder_layer{i}")(
                hidden, query_pos, ref_input, memory, text, text_cross_bias)
            reference = jax.nn.sigmoid(bbox_head(hidden) + _logit(reference))
            intermediate.append(decoder_norm(hidden))
            inter_refs.append(reference)

        # --- heads (last decoder level) ---
        h_last = intermediate[-1]
        ref_last = init_reference if c.decoder_layers == 1 else inter_refs[-2]
        logits = jnp.einsum("bqd,btd->bqt", h_last, text)
        logits = jnp.where(text_token_mask[:, None, :], logits, -jnp.inf)
        pad = c.max_text_len - t
        if pad > 0:
            logits = jnp.pad(logits, ((0, 0), (0, 0), (0, pad)),
                             constant_values=-jnp.inf)
        boxes = jax.nn.sigmoid(bbox_head(h_last) + _logit(ref_last))
        return logits, boxes


# ---------------------------------------------------------------------------
# weight porting from the HF checkpoint layout
# ---------------------------------------------------------------------------

def _lin(sd, name):
    return {"kernel": np.asarray(sd[name + ".weight"], np.float32).T,
            "bias": np.asarray(sd[name + ".bias"], np.float32)}


def _ln(sd, name):
    return {"scale": np.asarray(sd[name + ".weight"], np.float32),
            "bias": np.asarray(sd[name + ".bias"], np.float32)}


def _conv(sd, name):
    return {"kernel": np.asarray(sd[name + ".weight"],
                                 np.float32).transpose(2, 3, 1, 0),
            "bias": np.asarray(sd[name + ".bias"], np.float32)}


def _gn(sd, name):
    return {"scale": np.asarray(sd[name + ".weight"], np.float32),
            "bias": np.asarray(sd[name + ".bias"], np.float32)}


def _mha(sd, base):
    return {n: _lin(sd, f"{base}.{n}") for n in
            ("query", "key", "value", "out_proj")}


def _mlp_head(sd, base, n):
    return {f"layers_{i}": _lin(sd, f"{base}.layers.{i}") for i in range(n)}


def _deformable_attn(sd, base):
    return {n: _lin(sd, f"{base}.{n}") for n in
            ("sampling_offsets", "attention_weights", "value_proj",
             "output_proj")}


def port_hf_gdino_params(state_dict, cfg: GDinoConfig):
    """Map a HF `GroundingDinoForObjectDetection` state_dict into
    `GroundingDino` flax params (numpy leaves)."""
    sd = {k: v for k, v in state_dict.items()}
    p = {}
    stage_names = [f"stage{s + 1}" for s in cfg.out_stages]
    p["backbone"] = port_hf_swin_params(
        sd, cfg.backbone, prefix="model.backbone.conv_encoder.model.",
        stage_names=None)
    # hidden_states_norms only exist for out_features; map them to the
    # out_stages' outnorm slots
    for s, sn in zip(cfg.out_stages, stage_names):
        key = f"model.backbone.conv_encoder.model.hidden_states_norms.{sn}"
        if key + ".weight" in sd:
            p["backbone"][f"outnorm{s}"] = _ln(
                sd, key)
    # Stages outside out_stages (stage 0 for the deployment SwinB config,
    # whose out_features are stage2-4) have no norm in the checkpoint; the
    # flax module still owns an outnorm slot for them. Their features are
    # never consumed by GroundingDino (sources read only out_stages), so an
    # identity fill is exact — XLA prunes the dead compute under jit.
    # Caught by tests/test_fullscale_parity.py (invisible at tiny scale
    # where out_stages covered every stage).
    if cfg.backbone.backbone_norms:
        for s in range(len(cfg.backbone.depths)):
            if f"outnorm{s}" not in p["backbone"]:
                dim = cfg.backbone.embed_dim * 2 ** s
                p["backbone"][f"outnorm{s}"] = {
                    "scale": np.ones((dim,), np.float32),
                    "bias": np.zeros((dim,), np.float32)}
    p["text_backbone"] = port_hf_bert_params(sd, cfg.text,
                                             prefix="model.text_backbone.")
    p["text_projection"] = _lin(sd, "model.text_projection")
    for i in range(cfg.num_feature_levels):
        p[f"input_proj_{i}"] = _conv(sd, f"model.input_proj_vision.{i}.0")
        p[f"input_norm_{i}"] = _gn(sd, f"model.input_proj_vision.{i}.1")
    p["level_embed"] = np.asarray(sd["model.level_embed"], np.float32)
    p["query_embed"] = np.asarray(sd["model.query_position_embeddings.weight"],
                                  np.float32)
    for i in range(cfg.encoder_layers):
        base = f"model.encoder.layers.{i}"
        p[f"encoder_layer{i}"] = {
            "fusion_layer": {
                "layer_norm_vision": _ln(sd, base + ".fusion_layer.layer_norm_vision"),
                "layer_norm_text": _ln(sd, base + ".fusion_layer.layer_norm_text"),
                "attn": {n: _lin(sd, base + f".fusion_layer.attn.{n}") for n in
                         ("vision_proj", "text_proj", "values_vision_proj",
                          "values_text_proj", "out_vision_proj",
                          "out_text_proj")},
                "vision_param": np.asarray(
                    sd[base + ".fusion_layer.vision_param"], np.float32),
                "text_param": np.asarray(
                    sd[base + ".fusion_layer.text_param"], np.float32),
            },
            "text_enhancer_layer": {
                "self_attn": _mha(sd, base + ".text_enhancer_layer.self_attn"),
                "fc1": _lin(sd, base + ".text_enhancer_layer.fc1"),
                "fc2": _lin(sd, base + ".text_enhancer_layer.fc2"),
                "layer_norm_before": _ln(
                    sd, base + ".text_enhancer_layer.layer_norm_before"),
                "layer_norm_after": _ln(
                    sd, base + ".text_enhancer_layer.layer_norm_after"),
            },
            "deformable_layer": {
                "self_attn": _deformable_attn(
                    sd, base + ".deformable_layer.self_attn"),
                "self_attn_layer_norm": _ln(
                    sd, base + ".deformable_layer.self_attn_layer_norm"),
                "fc1": _lin(sd, base + ".deformable_layer.fc1"),
                "fc2": _lin(sd, base + ".deformable_layer.fc2"),
                "final_layer_norm": _ln(
                    sd, base + ".deformable_layer.final_layer_norm"),
            },
        }
    for i in range(cfg.decoder_layers):
        base = f"model.decoder.layers.{i}"
        p[f"decoder_layer{i}"] = {
            "self_attn": _mha(sd, base + ".self_attn"),
            "self_attn_layer_norm": _ln(sd, base + ".self_attn_layer_norm"),
            "encoder_attn_text": _mha(sd, base + ".encoder_attn_text"),
            "encoder_attn_text_layer_norm": _ln(
                sd, base + ".encoder_attn_text_layer_norm"),
            "encoder_attn": _deformable_attn(sd, base + ".encoder_attn"),
            "encoder_attn_layer_norm": _ln(sd, base + ".encoder_attn_layer_norm"),
            "fc1": _lin(sd, base + ".fc1"),
            "fc2": _lin(sd, base + ".fc2"),
            "final_layer_norm": _ln(sd, base + ".final_layer_norm"),
        }
    p["decoder_norm"] = _ln(sd, "model.decoder.layer_norm")
    p["ref_point_head"] = _mlp_head(sd, "model.decoder.reference_points_head", 2)
    p["enc_output"] = _lin(sd, "model.enc_output")
    p["enc_output_norm"] = _ln(sd, "model.enc_output_norm")
    p["enc_bbox_head"] = _mlp_head(sd, "model.encoder_output_bbox_embed", 3)
    p["bbox_head"] = _mlp_head(sd, "bbox_embed.0", 3)
    return {"params": p}


# ---------------------------------------------------------------------------
# inference wrapper for the cascade
# ---------------------------------------------------------------------------

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def build_gdino_grounder(checkpoint_path: str | None = None,
                         vocab_path: str | None = None,
                         box_threshold: float = 0.35,
                         text_threshold: float = 0.25,
                         cfg: GDinoConfig | None = None,
                         compute_dtype=None,
                         random_init: bool = False):
    """grounder(rgb, keyword) -> (boxes_cxcywh_norm, scores) for the cascade
    (reference gd_predict semantics: score = max sigmoid logit over the
    phrase's text tokens, keep boxes above box_threshold).

    checkpoint_path: torch .pth/.bin of HF GroundingDinoForObjectDetection,
    or a .npz/.pkl of already-ported flax params. Weights-free (None):
    returns (None, None) so the cascade's fallback applies — random query
    boxes would only pollute dedup. `random_init=True` instead initializes
    the real model without a checkpoint (benchmarks / batch-parity tests at
    the true program shapes)."""
    # IBL_GDINO_SIZE (default 800) is the measured serving relaxation: the
    # pyramid (and so the MSDA gather work, the #1 cascade cost) scales with
    # the square of the resize side while every weight is size-independent
    # (sine pyramid pos embeds, window-relative Swin bias), so a 640 bucket
    # reuses the checkpoint unchanged. Box deltas quantified in
    # perf/cascade_relaxations.py; boxes are normalized cxcywh either way.
    import os
    cfg = cfg or GDinoConfig(
        img_size=int(os.environ.get("IBL_GDINO_SIZE", "800")))
    if checkpoint_path is None and not random_init:
        return lambda rgb, keyword: (None, None)

    from .precision import resolve_compute_dtype, cast_params
    dt = resolve_compute_dtype(compute_dtype)
    # the Swin backbone threads dtype via its config; the fusion encoder /
    # decoder follow operand promotion from the cast params
    cfg = dataclasses.replace(
        cfg, backbone=dataclasses.replace(cfg.backbone, dtype=dt))

    from .wordpiece import WordPieceTokenizer
    tokenizer = WordPieceTokenizer(vocab_path)
    model = GroundingDino(cfg)

    if checkpoint_path is None:
        # random_init: host-synthesized params — model.init is a remote
        # compile over the tunnel (668 s at SwinB@800,
        # perf/cascade_compile_probe.py) and the values are arbitrary here
        from .init_utils import host_random_params
        ids0 = np.zeros((1, 8), np.int32)
        ids0[0, :3] = [tokenizer.cls_id, 1000, tokenizer.sep_id]
        allowed0, position_ids0 = make_text_masks(ids0)
        params = host_random_params(
            model, 0,
            jnp.zeros((1, cfg.img_size, cfg.img_size, 3), jnp.float32),
            jnp.asarray(ids0), jnp.asarray(allowed0),
            jnp.asarray(position_ids0), jnp.asarray(ids0 != 0))
    elif checkpoint_path.endswith((".pth", ".bin", ".pt")):
        import torch
        sd = torch.load(checkpoint_path, map_location="cpu",
                        weights_only=True)
        sd = {k: v.numpy() for k, v in sd.items()}
        params = port_hf_gdino_params(sd, cfg)
    else:
        import pickle
        with open(checkpoint_path, "rb") as f:
            params = pickle.load(f)

    # host-side word-embedding lookup: keep the f32 table on host, DROP it
    # from the device tree (the on-device lookup staged the 47 MB table
    # through slow memory every forward, ~11 ms + upload/HBM cost;
    # gdino_trace.py copy-starts). T is ~16 rows — the lookup is free here.
    vocab_table = np.asarray(
        params["params"]["text_backbone"]["word_embeddings"]["embedding"],
        np.float32)
    params = {"params": {**params["params"],
                         "text_backbone": {
                             k: v for k, v in
                             params["params"]["text_backbone"].items()
                             if k != "word_embeddings"}}}

    # bf16 inference by default (models/precision.py); box-score
    # thresholding reads f32-upcast sigmoids
    params = cast_params(params, dt)

    # params as an EXPLICIT jit argument, not a closure constant: closure
    # consts are serialized into the program body, which blows the axon
    # remote-compile HTTP body limit (413) at SwinB+BERT scale
    params = jax.device_put(params)

    @jax.jit
    def apply(p, raw, input_ids, allowed, position_ids, token_mask,
              text_embeds):
        # u8 frames in; resize+normalize fused into the model program
        # (parallel/cascade_serving.py device_preprocess)
        from ..parallel.cascade_serving import device_preprocess
        images = device_preprocess(raw, cfg.img_size,
                                   IMAGENET_MEAN, IMAGENET_STD)
        logits, boxes = model.apply(p, images.astype(dt), input_ids,
                                    allowed, position_ids, token_mask,
                                    text_embeds=text_embeds)
        return logits.astype(jnp.float32), boxes.astype(jnp.float32)

    def _run(raw_batch, ids):
        # bucket the text length to a multiple of 16: each distinct ids
        # length is a fresh jit specialization of the whole SwinB@800
        # program (minutes of remote compile over the tunnel), and RAM
        # captions vary per frame. Pad ids (0 = PAD) are parity-exact:
        # detect_all always ends phrases with a period directly before SEP
        # so make_text_masks yields the identical blocks for real tokens
        # (pads self-attend only), and token_mask=-inf removes pads from
        # fusion, query selection, logits, and decoder cross-attention —
        # matching HF's own padded-batch semantics.
        t = ids.shape[1]
        tp = -(-t // 16) * 16
        if tp != t:
            ids = np.pad(ids, ((0, 0), (0, tp - t)))
        allowed, position_ids = make_text_masks(ids)
        token_mask = ids != 0
        text_embeds = vocab_table[np.clip(ids, 0, len(vocab_table) - 1)]
        logits, boxes = apply(params, jnp.asarray(raw_batch),
                              jnp.asarray(ids),
                              jnp.asarray(allowed), jnp.asarray(position_ids),
                              jnp.asarray(token_mask),
                              jnp.asarray(text_embeds))
        return (np.asarray(jax.nn.sigmoid(logits[..., :t])),
                np.asarray(boxes))

    def _prep(rgb):
        return np.asarray(rgb, np.uint8)

    def grounder(rgb: np.ndarray, keyword: str):
        ids = np.asarray(tokenizer.encode(keyword + "."), np.int32)[None]
        probs, boxes = _run(_prep(rgb)[None], ids)
        scores = probs[0].max(axis=-1)
        keep = scores > box_threshold
        return boxes[0][keep], scores[keep]

    def detect_all(rgb: np.ndarray, keywords: list[str]):
        """ONE forward for ALL keywords (the reference loops gd_predict per
        keyword — object_finder.py:180-207, the pipeline's #1 hot loop;
        GroundingDINO natively takes 'a. b. c.' prompts with per-phrase
        block-diagonal text masks). Returns [(boxes, scores)] per keyword:
        each query is attributed to the phrase owning its argmax token and
        scored by the max sigmoid logit over that phrase's tokens."""
        if not keywords:
            return []
        pieces = [tokenizer.encode(k + ".", add_special_tokens=False)
                  for k in keywords]
        ids = [tokenizer.cls_id]
        spans = []
        for p in pieces:
            spans.append((len(ids), len(ids) + len(p)))
            ids.extend(p)
        ids.append(tokenizer.sep_id)
        ids = np.asarray(ids, np.int32)[None]
        probs, boxes = _run(_prep(rgb)[None], ids)
        probs, boxes = probs[0], boxes[0]                 # (Q, T), (Q, 4)
        owner = np.argmax(probs, axis=-1)                 # (Q,)
        out = []
        for (lo, hi) in spans:
            in_span = (owner >= lo) & (owner < hi)
            scores = probs[:, lo:hi].max(axis=-1)
            keep = in_span & (scores > box_threshold)
            out.append((boxes[keep], scores[keep]))
        return out

    grounder.detect_all = detect_all
    grounder.multi_phrase = True
    return grounder
