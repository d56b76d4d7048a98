"""Segment Anything (SAM) in flax — the cascade's box-prompted segmenter
(reference uses `segment-anything`'s ViT-H predictor with box prompts,
`object_finder.py:222-256`, multimask_output=False).

Components (Kirillov et al., 2023):

* **Image encoder**: ViT with 16x16 patches, windowed attention (window 14)
  in all but a few global blocks, decomposed relative position embeddings,
  and a conv "neck" projecting to 256 channels.
* **Prompt encoder**: random-Fourier positional encoding of box corners plus
  learned corner-type embeddings (the reference passes boxes only, no
  points/masks).
* **Mask decoder**: IoU token + mask tokens + prompt tokens run a two-way
  transformer against image tokens (token->image and image->token cross
  attention), masks come from per-token hypernetwork MLPs dotted with the
  2x-upscaled image embedding, multimask_output=False takes mask 0.

The structure/state-dict layout mirrors the official `sam_vit_*.pth`
checkpoints so `port_sam_params` can load them when a file is provided; no
weights are downloadable in this environment, so tests cover shapes,
determinism and prompt-sensitivity with random init, and the layer-level math
(windowing, rel-pos, two-way attention) against hand computations.
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class SamConfig:
    img_size: int = 1024
    patch_size: int = 16
    encoder_dim: int = 1280          # ViT-H
    encoder_depth: int = 32
    encoder_heads: int = 16
    window_size: int = 14
    global_blocks: tuple = (7, 15, 23, 31)
    prompt_dim: int = 256
    decoder_depth: int = 2
    decoder_heads: int = 8
    decoder_mlp_dim: int = 2048
    iou_head_hidden: int = 256
    num_mask_tokens: int = 4
    dtype: jnp.dtype = jnp.float32
    # Fused Pallas attention for the GLOBAL encoder blocks (4096 tokens):
    # avoids materializing the (heads, S, S) scores AND the broadcast
    # rel-pos bias (~800 MB f32 per block) in HBM. Windowed blocks (196
    # tokens per window) stay on XLA, where fusion is already resident.
    # Default ON: only activates on the TPU backend (CPU runs are
    # bit-identical to the XLA path) and its bf16-MXU contractions match
    # the package's bf16 inference policy (~2e-3 vs f32 attention;
    # measured 64 vs 92 ms/frame on SAM-B@1024, perf/cascade_stages.py).
    # Set False for f32-exact attention on TPU.
    use_pallas_attention: bool = True

    @property
    def grid(self) -> int:
        return self.img_size // self.patch_size


def _window_partition(x, win):
    """(B, H, W, C) -> (B*nW, win, win, C) with padding."""
    b, h, w, c = x.shape
    pad_h = (-h) % win
    pad_w = (-w) % win
    x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    hp, wp = h + pad_h, w + pad_w
    x = x.reshape(b, hp // win, win, wp // win, win, c)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, win, win, c)
    return x, (hp, wp)


def _window_unpartition(x, win, padded, orig):
    hp, wp = padded
    h, w = orig
    b = x.shape[0] // (hp // win * wp // win)
    x = x.reshape(b, hp // win, wp // win, win, win, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, -1)
    return x[:, :h, :w]


def _rel_pos_bias(q_size, k_size, rel_pos):
    """Decomposed relative position lookup (SAM's get_rel_pos)."""
    max_rel = 2 * max(q_size, k_size) - 1
    # rel_pos is (max_rel, head_dim); interpolate if needed (sizes match here)
    q_coords = jnp.arange(q_size)[:, None] * max(k_size / q_size, 1.0)
    k_coords = jnp.arange(k_size)[None, :] * max(q_size / k_size, 1.0)
    rel = (q_coords - k_coords) + (k_size - 1) * max(q_size / k_size, 1.0)
    return rel_pos[rel.astype(jnp.int32)]   # (q, k, dim)


class SamAttention(nn.Module):
    cfg: SamConfig
    input_size: tuple

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        b, h, w, _ = x.shape
        dim = x.shape[-1]
        heads = c.encoder_heads
        d_head = dim // heads
        qkv = nn.Dense(dim * 3, name="qkv")(x).reshape(b, h * w, 3, heads, d_head)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]

        # decomposed relative positions (SAM add_decomposed_rel_pos)
        rel_h = self.param("rel_pos_h", nn.initializers.zeros,
                           (2 * self.input_size[0] - 1, d_head))
        rel_w = self.param("rel_pos_w", nn.initializers.zeros,
                           (2 * self.input_size[1] - 1, d_head))
        rh = _rel_pos_bias(h, h, rel_h)     # (h, h, d)
        rw = _rel_pos_bias(w, w, rel_w)     # (w, w, d)
        q_sp = q.reshape(b, h, w, heads, d_head)
        bias_h = jnp.einsum("bhwnd,hkd->bnhwk", q_sp, rh)  # (b, heads, h, w, h_k)
        bias_w = jnp.einsum("bhwnd,wkd->bnhwk", q_sp, rw)  # (b, heads, h, w, w_k)

        s = h * w
        if (c.use_pallas_attention and s % 128 == 0
                and jax.default_backend() == "tpu"):
            # fused kernel: scores + rel-pos bias + softmax + PV with
            # VMEM-resident KV; the (S, S) intermediates never hit HBM
            from ..ops.pallas.sam_attention import sam_flash_attention
            out = sam_flash_attention(
                q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                v.transpose(0, 2, 1, 3),
                bias_h.reshape(b, heads, s, h), bias_w.reshape(b, heads, s, w))
            out = out.transpose(0, 2, 1, 3).reshape(b, h, w, dim)
            return nn.Dense(dim, name="proj")(out)

        attn = jnp.einsum("bqhd,bkhd->bhqk", q * (d_head ** -0.5), k)
        bias = bias_h[..., :, None] + bias_w[..., None, :]  # (b,n,h,w,hk,wk)
        attn = attn + bias.reshape(b, heads, h * w, h * w)

        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, h, w, dim)
        return nn.Dense(dim, name="proj")(out)


class SamBlock(nn.Module):
    cfg: SamConfig
    use_window: bool
    # pre_partitioned: the residual stream arrives ALREADY in window layout
    # (B*nW, win, win, C) with `pad_mask` marking real cells. Consecutive
    # windowed blocks then skip the per-block partition/unpartition
    # transposes — ~2 full-map layout copies per block at H-scale
    # (the dominant SAM-H cost in perf/sam_trace.py: dozens of
    # bf16[1,64,64,1280] copy-starts). Bit-exact with the official
    # semantics: pads are re-zeroed POST-norm each block (official pads the
    # normed map with zeros at every partition), pad-cell residuals are
    # garbage but never read back into real cells (windows are
    # independent), and the group is unpartitioned before any global block.
    pre_partitioned: bool = False

    @nn.compact
    def __call__(self, x, pad_mask=None):
        c = self.cfg
        shortcut = x
        h = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        if self.use_window and self.pre_partitioned:
            if pad_mask is not None:
                h = jnp.where(pad_mask, h, jnp.zeros((), h.dtype))
            h = SamAttention(c, (c.window_size, c.window_size),
                             name="attn")(h)
        elif self.use_window:
            win = c.window_size
            orig = h.shape[1:3]
            h, padded = _window_partition(h, win)
            h = SamAttention(c, (win, win), name="attn")(h)
            h = _window_unpartition(h, win, padded, orig)
        else:
            h = SamAttention(c, (h.shape[1], h.shape[2]), name="attn")(h)
        x = shortcut + h
        h = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        h = nn.Dense(x.shape[-1] * 4, name="fc1")(h)
        h = jax.nn.gelu(h, approximate=False)
        h = nn.Dense(x.shape[-1], name="fc2")(h)
        return x + h


class SamImageEncoder(nn.Module):
    cfg: SamConfig

    @nn.compact
    def __call__(self, images):
        c = self.cfg
        x = nn.Conv(c.encoder_dim, (c.patch_size, c.patch_size),
                    strides=(c.patch_size, c.patch_size), padding="VALID",
                    name="patch_embed")(images)
        pos = self.param("pos_embed", nn.initializers.zeros,
                         (1, c.grid, c.grid, c.encoder_dim))
        x = x + pos
        # runs of consecutive windowed blocks execute in window layout with
        # ONE partition/unpartition per run (see SamBlock.pre_partitioned)
        win = c.window_size
        i = 0
        while i < c.encoder_depth:
            if i in c.global_blocks:
                x = SamBlock(c, use_window=False, name=f"block{i}")(x)
                i += 1
                continue
            j = i
            while j < c.encoder_depth and j not in c.global_blocks:
                j += 1
            orig = x.shape[1:3]
            xp, padded = _window_partition(x, win)
            mask = None
            if padded != tuple(orig):
                ones = jnp.ones((1,) + tuple(orig) + (1,), x.dtype)
                mask = _window_partition(ones, win)[0] > 0.5
                reps = xp.shape[0] // mask.shape[0]   # batch repeats
                if reps > 1:
                    mask = jnp.tile(mask, (reps, 1, 1, 1))
            for k in range(i, j):
                xp = SamBlock(c, use_window=True, pre_partitioned=True,
                              name=f"block{k}")(xp, pad_mask=mask)
            x = _window_unpartition(xp, win, padded, orig)
            i = j
        # neck: 1x1 conv -> LN -> 3x3 conv -> LN, to prompt_dim channels
        x = nn.Conv(c.prompt_dim, (1, 1), use_bias=False, name="neck0")(x)
        x = nn.LayerNorm(epsilon=1e-6, name="neck_ln0")(x)
        x = nn.Conv(c.prompt_dim, (3, 3), padding="SAME", use_bias=False,
                    name="neck1")(x)
        x = nn.LayerNorm(epsilon=1e-6, name="neck_ln1")(x)
        return x   # (B, grid, grid, prompt_dim)


class PromptEncoder(nn.Module):
    cfg: SamConfig

    def setup(self):
        c = self.cfg
        self.pe_gaussian = self.param(
            "pe_gaussian", nn.initializers.normal(1.0), (2, c.prompt_dim // 2))
        self.corner_embed_1 = self.param("corner1", nn.initializers.normal(0.02),
                                         (c.prompt_dim,))
        self.corner_embed_2 = self.param("corner2", nn.initializers.normal(0.02),
                                         (c.prompt_dim,))
        self.no_mask_embed = self.param("no_mask", nn.initializers.normal(0.02),
                                        (c.prompt_dim,))

    def _pe(self, coords_01):
        """Random-Fourier positional encoding of [0,1]^2 coords."""
        proj = (2.0 * coords_01 - 1.0) @ self.pe_gaussian
        proj = 2.0 * jnp.pi * proj
        return jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], axis=-1)

    def encode_boxes(self, boxes_xyxy, img_size):
        """(M, 4) pixel boxes -> (M, 2, prompt_dim) corner tokens
        (+0.5 pixel-center shift per the official prompt encoder)."""
        corners = (boxes_xyxy + 0.5).reshape(-1, 2, 2) / img_size
        pe = self._pe(corners)
        pe = pe.at[:, 0].add(self.corner_embed_1)
        pe = pe.at[:, 1].add(self.corner_embed_2)
        return pe

    def dense_pe(self, grid):
        ys = (jnp.arange(grid) + 0.5) / grid
        xs = (jnp.arange(grid) + 0.5) / grid
        gx, gy = jnp.meshgrid(xs, ys)
        return self._pe(jnp.stack([gx, gy], axis=-1))   # (g, g, dim)

    def __call__(self, boxes_xyxy, img_size, grid):
        return (self.encode_boxes(boxes_xyxy, img_size), self.dense_pe(grid),
                self.no_mask_embed)


class TwoWayBlock(nn.Module):
    cfg: SamConfig
    skip_first_pe: bool = False

    @nn.compact
    def __call__(self, tokens, image, token_pe, image_pe):
        c = self.cfg

        def attention(q, k, v, name, downsample=1):
            dim = c.prompt_dim // downsample
            heads = c.decoder_heads
            qh = nn.Dense(dim, name=f"{name}_q")(q).reshape(
                *q.shape[:-1], heads, dim // heads)
            kh = nn.Dense(dim, name=f"{name}_k")(k).reshape(
                *k.shape[:-1], heads, dim // heads)
            vh = nn.Dense(dim, name=f"{name}_v")(v).reshape(
                *v.shape[:-1], heads, dim // heads)
            attn = jnp.einsum("...qhd,...khd->...hqk",
                              qh * ((dim // heads) ** -0.5), kh)
            attn = jax.nn.softmax(attn, axis=-1)
            o = jnp.einsum("...hqk,...khd->...qhd", attn, vh)
            o = o.reshape(*q.shape[:-1], dim)
            return nn.Dense(c.prompt_dim, name=f"{name}_out")(o)

        # 1. token self-attention. skip_first_pe (decoder block 0) REPLACES
        # the tokens with the attention output — official TwoWayAttentionBlock
        # has no residual on that branch (caught by the full-scale parity
        # test; the residual variant was within tiny-scale tolerance).
        if self.skip_first_pe:
            tokens = nn.LayerNorm(epsilon=1e-5, name="ln1")(
                attention(tokens, tokens, tokens, "self"))
        else:
            q = tokens + token_pe
            tokens = nn.LayerNorm(epsilon=1e-5, name="ln1")(
                tokens + attention(q, q, tokens, "self"))
        # 2. token -> image cross attention
        q = tokens + token_pe
        k = image + image_pe
        tokens = nn.LayerNorm(epsilon=1e-5, name="ln2")(
            tokens + attention(q, k, image, "t2i", downsample=2))
        # 3. MLP
        h = nn.Dense(c.decoder_mlp_dim, name="fc1")(tokens)
        h = jax.nn.relu(h)
        tokens = nn.LayerNorm(epsilon=1e-5, name="ln3")(tokens + nn.Dense(
            c.prompt_dim, name="fc2")(h))
        # 4. image -> token cross attention
        q = image + image_pe
        k = tokens + token_pe
        image = nn.LayerNorm(epsilon=1e-5, name="ln4")(
            image + attention(q, k, tokens, "i2t", downsample=2))
        return tokens, image


class MaskDecoder(nn.Module):
    cfg: SamConfig

    @nn.compact
    def __call__(self, image_embedding, image_pe, prompt_tokens):
        """image_embedding (g, g, D); prompt_tokens (M, P, D).
        Returns (masks (M, num_mask_tokens, 4g, 4g), iou_pred (M, n))."""
        c = self.cfg
        g = image_embedding.shape[0]
        m = prompt_tokens.shape[0]

        iou_token = self.param("iou_token", nn.initializers.normal(0.02),
                               (1, c.prompt_dim))
        mask_tokens = self.param("mask_tokens", nn.initializers.normal(0.02),
                                 (c.num_mask_tokens, c.prompt_dim))
        fixed = jnp.concatenate([iou_token, mask_tokens])[None]
        tokens = jnp.concatenate(
            [jnp.broadcast_to(fixed, (m,) + fixed.shape[1:]), prompt_tokens],
            axis=1)                                       # (M, 1+n+P, D)

        image = jnp.broadcast_to(image_embedding.reshape(1, g * g, c.prompt_dim),
                                 (m, g * g, c.prompt_dim))
        img_pe = jnp.broadcast_to(image_pe.reshape(1, g * g, c.prompt_dim),
                                  (m, g * g, c.prompt_dim))

        tok, img = tokens, image
        for i in range(c.decoder_depth):
            tok, img = TwoWayBlock(c, skip_first_pe=(i == 0),
                                   name=f"block{i}")(tok, img, tokens, img_pe)

        # final token->image attention (official TwoWayTransformer tail)
        heads = c.decoder_heads
        fdim = c.prompt_dim // 2
        fq = nn.Dense(fdim, name="final_q")(tok + tokens).reshape(
            m, -1, heads, fdim // heads)
        fk = nn.Dense(fdim, name="final_k")(img + img_pe).reshape(
            m, -1, heads, fdim // heads)
        fv = nn.Dense(fdim, name="final_v")(img).reshape(
            m, -1, heads, fdim // heads)
        fattn = jax.nn.softmax(jnp.einsum(
            "mqhd,mkhd->mhqk", fq * ((fdim // heads) ** -0.5), fk), axis=-1)
        fout = jnp.einsum("mhqk,mkhd->mqhd", fattn, fv).reshape(
            m, tok.shape[1], fdim)
        tok = tok + nn.Dense(c.prompt_dim, name="final_out")(fout)
        tok = nn.LayerNorm(epsilon=1e-5, name="final_ln")(tok)

        iou_out = tok[:, 0]
        mask_tok_out = tok[:, 1:1 + c.num_mask_tokens]   # (M, n, D)

        # upscale image embedding 4x
        img_sp = img.reshape(m, g, g, c.prompt_dim)
        up = nn.ConvTranspose(c.prompt_dim // 4, (2, 2), strides=(2, 2),
                              transpose_kernel=True, name="up1")(img_sp)
        up = nn.LayerNorm(epsilon=1e-5, name="up_ln")(up)
        up = jax.nn.gelu(up, approximate=False)
        up = nn.ConvTranspose(c.prompt_dim // 8, (2, 2), strides=(2, 2),
                              transpose_kernel=True, name="up2")(up)
        up = jax.nn.gelu(up, approximate=False)           # (M, 4g, 4g, D/8)

        # hypernetwork MLPs per mask token
        hyper = []
        for i in range(c.num_mask_tokens):
            h = mask_tok_out[:, i]
            for j in range(2):
                h = jax.nn.relu(nn.Dense(c.prompt_dim, name=f"hyper{i}_{j}")(h))
            hyper.append(nn.Dense(c.prompt_dim // 8, name=f"hyper{i}_out")(h))
        hyper = jnp.stack(hyper, axis=1)                  # (M, n, D/8)

        masks = jnp.einsum("mnc,mhwc->mnhw", hyper, up)
        h = jax.nn.relu(nn.Dense(c.iou_head_hidden, name="iou_fc0")(iou_out))
        h = jax.nn.relu(nn.Dense(c.iou_head_hidden, name="iou_fc1")(h))
        iou_pred = nn.Dense(c.num_mask_tokens, name="iou_head")(h)
        return masks, iou_pred


class Sam(nn.Module):
    cfg: SamConfig

    def setup(self):
        self.image_encoder = SamImageEncoder(self.cfg)
        self.prompt_encoder = PromptEncoder(self.cfg)
        self.mask_decoder = MaskDecoder(self.cfg)

    def __call__(self, image, boxes_xyxy):
        """image (H, W, 3) normalized; boxes in the model input pixel frame.
        Returns (masks (M, 4g, 4g) logits, iou (M,)) with
        multimask_output=False semantics (mask token 0)."""
        emb = self.image_encoder(image[None])[0]
        prompts, dense_pe, no_mask = self.prompt_encoder(
            boxes_xyxy, self.cfg.img_size, self.cfg.grid)
        # prompt PEs are computed from f32 coordinate grids; return them to
        # the encoder stream dtype so one `image + image_pe` add doesn't
        # promote the whole two-way decoder to f32 in bf16 deployment
        prompts = prompts.astype(emb.dtype)
        dense_pe = dense_pe.astype(emb.dtype)
        emb = emb + no_mask[None, None, :]   # dense "no mask" prompt
        masks, iou = self.mask_decoder(emb, dense_pe, prompts)
        return masks[:, 0], iou[:, 0]


SAM_MEAN = np.array([123.675, 116.28, 103.53], np.float32)
SAM_STD = np.array([58.395, 57.12, 57.375], np.float32)


def build_sam_segmenter(checkpoint_path: str | None = None,
                        cfg: SamConfig | None = None, max_boxes: int = 16,
                        compute_dtype=None, serving_mesh=None):
    """segmenter(rgb, boxes_xyxy) -> (M, H, W) bool, the cascade's stage-3
    callable. Handles the reference predictor's resize-longest-side-1024
    transform + mask un-resizing (object_finder.py:243-249).

    Also exposes `segmenter.segment_batch(frames, boxes_list) ->
    list[(Mi, Hi, Wi) bool]`, which runs a chunk of frames as ONE vmapped
    device program — the measured ~25% per-frame SAM win over per-frame
    dispatch (perf/cascade_batch_probe.py). With `serving_mesh` the frame
    batch shards over the mesh "data" axis and the parameters replicate
    (parallel/cascade_serving.py) — zero collectives, each chip runs the
    identical per-frame program on its shard.

    Runs bf16 inference by default (models/precision.py): the ViT-B image
    encoder — ~95% of SAM's FLOPs — executes as bf16 MXU matmuls; box-prompt
    coordinates stay f32 (bf16 rounds 1024-scale pixels to ~4 px) and mask
    logits are compared against 0 after an f32 upcast."""
    from .precision import resolve_compute_dtype, cast_params
    dt = resolve_compute_dtype(compute_dtype)
    if checkpoint_path and cfg is None:
        # size the model from the checkpoint: the reference deploys ViT-H
        # (sam_vit_h_4b8939) but B/L files must load identically.
        # IBL_SAM_SIZE (default 1024) is the measured serving relaxation:
        # a smaller canvas reuses the checkpoint with interpolated position
        # tables (perf/cascade_relaxations.py quantifies the mask deltas).
        import os
        import torch
        sd = torch.load(checkpoint_path, map_location="cpu",
                        weights_only=True)
        sd = {k: v.numpy() for k, v in sd.items()}
        cfg = sam_config_from_state_dict(
            sd, img_size=int(os.environ.get("IBL_SAM_SIZE", "1024")))
        params = _sam_flax_params(sd, cfg, _OFFICIAL_NAMES)
        model = Sam(cfg)
    elif checkpoint_path:
        cfg_ = cfg
        params = port_sam_params(checkpoint_path, cfg_)
        model = Sam(cfg_)
        cfg = cfg_
    else:
        # ViT-B sizing by default when running weights-free (H is 32 deep);
        # params synthesized on host — model.init is a remote compile over
        # the tunnel (290 s for H-scale, perf/cascade_compile_probe.py)
        # and its values are arbitrary here
        from .init_utils import host_random_params
        cfg = cfg or SamConfig(encoder_dim=768, encoder_depth=12,
                               encoder_heads=12, global_blocks=(2, 5, 8, 11))
        model = Sam(cfg)
        dummy_img = jnp.zeros((cfg.img_size, cfg.img_size, 3), jnp.float32)
        dummy_boxes = jnp.zeros((max_boxes, 4), jnp.float32)
        params = host_random_params(model, 0, dummy_img, dummy_boxes)
    # device_put: porter/host trees are numpy — as bare jit args they
    # would re-upload the full weights EVERY call
    params = jax.device_put(cast_params(params, dt))

    def _canvas_jax(raw):
        """Traced: raw u8 frames (..., H, W, 3) -> normalized 1024-canvas
        f32 (..., S, S, 3) ON DEVICE — the reference predictor's
        resize-longest-side + pad transform, fused into the forward program
        so the host uploads only the raw u8 frame (0.9 MB at 480x640 vs
        12.6 MB for the f32 canvas) and does no PIL work."""
        h, w = raw.shape[-3], raw.shape[-2]
        scale = cfg.img_size / max(h, w)
        nh, nw = round(h * scale), round(w * scale)
        img = jax.image.resize(raw.astype(jnp.float32),
                               raw.shape[:-3] + (nh, nw, 3), "bilinear")
        img = (img - SAM_MEAN) / SAM_STD
        canvas = jnp.zeros(raw.shape[:-3] + (cfg.img_size, cfg.img_size, 3),
                           jnp.float32)
        return canvas.at[..., :nh, :nw, :].set(img)

    def _unresize_jax(logits, h, w, nh, nw):
        """Mask un-resize ON DEVICE — the reference predictor's two-step
        postprocess (interpolate to the full canvas, crop the valid region,
        interpolate to the original frame; torch F.interpolate is not
        antialiased, hence antialias=False). The per-mask host PIL loop this
        replaces costs ~66 ms/frame at deployment scale (8 masks,
        1024-canvas -> 480x640) — a ~30% hidden tax next to SAM-H's
        ~110-150 ms/frame device time. Fused into the SAM forward programs
        below so latency mode pays no extra program dispatch."""
        s = logits.shape
        full = jax.image.resize(logits, s[:-2] + (cfg.img_size, cfg.img_size),
                                "bilinear", antialias=False)
        crop = full[..., :nh, :nw]
        small = jax.image.resize(crop, s[:-2] + (h, w), "bilinear",
                                 antialias=False)
        return small > 0

    @jax.jit
    def apply_masks(p, raw, boxes):
        h, w = raw.shape[-3], raw.shape[-2]
        logits, iou = model.apply(p, _canvas_jax(raw).astype(dt), boxes)
        scale = cfg.img_size / max(h, w)
        geom = (h, w, round(h * scale), round(w * scale))
        return (_unresize_jax(logits.astype(jnp.float32), *geom),
                iou.astype(jnp.float32))

    @jax.jit
    def apply_batch_masks(p, raws, boxes):
        h, w = raws.shape[-3], raws.shape[-2]
        scale = cfg.img_size / max(h, w)
        geom = (h, w, round(h * scale), round(w * scale))

        def one(raw, bx):
            logits, iou = model.apply(p, _canvas_jax(raw).astype(dt), bx)
            return (_unresize_jax(logits.astype(jnp.float32), *geom),
                    iou.astype(jnp.float32))

        return jax.vmap(one)(raws, boxes)

    def _prep_boxes(rgb, boxes_xyxy):
        scale = cfg.img_size / max(rgb.shape[:2])
        boxes = np.zeros((max_boxes, 4), np.float32)
        n = min(len(boxes_xyxy), max_boxes)
        boxes[:n] = np.asarray(boxes_xyxy[:n]) * scale
        return boxes

    def segmenter(rgb, boxes_xyxy):
        raw = np.asarray(rgb, np.uint8)
        raw_j = jnp.asarray(raw)
        # chunk over the static max_boxes prompt slots: a detector can emit
        # hundreds of proposals (e.g. a low-threshold grounder keeps ~200
        # of GDINO's 900 queries) and the (max_boxes, 4) program shape is
        # fixed — crashed here before chunking (round-3 full-scale e2e run)
        outs = []
        bx = np.asarray(boxes_xyxy, np.float32).reshape(-1, 4)
        for start in range(0, len(bx), max_boxes):
            chunk = bx[start:start + max_boxes]
            boxes = jnp.asarray(_prep_boxes(raw, chunk))
            masks, _ = apply_masks(params, raw_j, boxes)
            outs.append(np.asarray(masks)[: len(chunk)])
        if not outs:
            return np.zeros((0,) + raw.shape[:2], bool)
        return np.concatenate(outs)

    mesh_cache: dict = {}

    def segment_batch(frames, boxes_list):
        from ..parallel.cascade_serving import (padded_count, pad_stacked,
                                                replicate_params,
                                                shard_stacked)
        if not len(frames):
            return []
        frames = [np.asarray(f, np.uint8) for f in frames]
        if (any(f.shape != frames[0].shape for f in frames)
                or any(len(b) > max_boxes for b in boxes_list)):
            # mixed frame geometry (shapes are static) or a frame whose
            # proposal count exceeds the prompt slots: per-frame programs
            # (segmenter chunks over max_boxes)
            return [segmenter(f, b) for f, b in zip(frames, boxes_list)]
        n = padded_count(len(frames), serving_mesh)
        raws = pad_stacked(np.stack(frames), n)
        boxes = pad_stacked(np.stack([_prep_boxes(f, b) for f, b
                                      in zip(frames, boxes_list)]), n)
        x, bx = jnp.asarray(raws), jnp.asarray(boxes)
        pp = params
        if serving_mesh is not None and len(raws) > 1:
            x, bx = shard_stacked(serving_mesh, x, bx)
            pp = replicate_params(serving_mesh, params, mesh_cache)
        # canvas prep + forward + mask un-resize: ONE device program
        masks = np.asarray(apply_batch_masks(pp, x, bx)[0])
        return [masks[i][: len(boxes_list[i])] for i in range(len(frames))]

    def segment_batch_dispatch(frames, boxes_list):
        """Async half of segment_batch: queue the vmapped device program,
        return a handle for segment_batch_finish (find_stream pipeline)."""
        from ..parallel.cascade_serving import (padded_count, pad_stacked,
                                                replicate_params,
                                                shard_stacked)
        if not len(frames):
            return ("empty",)
        frames = [np.asarray(f, np.uint8) for f in frames]
        if (any(f.shape != frames[0].shape for f in frames)
                or any(len(b) > max_boxes for b in boxes_list)):
            return ("host", [segmenter(f, b)
                             for f, b in zip(frames, boxes_list)])
        n = padded_count(len(frames), serving_mesh)
        raws = pad_stacked(np.stack(frames), n)
        boxes = pad_stacked(np.stack([_prep_boxes(f, b) for f, b
                                      in zip(frames, boxes_list)]), n)
        x, bx = jnp.asarray(raws), jnp.asarray(boxes)
        pp = params
        if serving_mesh is not None and len(raws) > 1:
            x, bx = shard_stacked(serving_mesh, x, bx)
            pp = replicate_params(serving_mesh, params, mesh_cache)
        out = apply_batch_masks(pp, x, bx)[0]
        # consumer thread — same tunnel-execution rationale as the tagger's
        # dispatch half (a dispatched program only runs once fetched)
        import threading
        box: dict = {}

        def _pull():
            box["masks"] = np.asarray(out)

        t = threading.Thread(target=_pull, daemon=True)
        t.start()
        return ("device", t, box, [len(b) for b in boxes_list])

    def segment_batch_finish(handle):
        if handle[0] == "empty":
            return []
        if handle[0] == "host":
            return handle[1]
        _, t, box, counts = handle
        t.join()
        return [box["masks"][i][:n] for i, n in enumerate(counts)]

    segmenter.segment_batch = segment_batch
    segmenter.segment_batch_dispatch = segment_batch_dispatch
    segmenter.segment_batch_finish = segment_batch_finish
    return segmenter


def _sam_flax_params(sd, cfg: SamConfig, n):
    """Build the full flax param tree from a SAM state dict. `n` is a naming
    table abstracting the two checkpoint layouts (official segment-anything
    .pth and HF SamModel)."""
    import numpy as np

    def t(k):
        return np.asarray(sd[k], np.float32)

    def lin(k):
        return {"kernel": t(k + ".weight").T, "bias": t(k + ".bias")}

    def ln(k):
        return {"scale": t(k + ".weight"), "bias": t(k + ".bias")}

    def conv(k):
        return {"kernel": t(k + ".weight").transpose(2, 3, 1, 0),
                "bias": t(k + ".bias")}

    def convT(k):
        # flax ConvTranspose(transpose_kernel=True) kernel is (kh, kw, out, in)
        return {"kernel": t(k + ".weight").transpose(2, 3, 1, 0),
                "bias": t(k + ".bias")}

    def _resize_pos_embed(pe):
        """Bicubic-resize the absolute pos embed to cfg.grid — serving SAM
        below its native 1024 canvas (e.g. IBL_SAM_SIZE=768) reuses the
        checkpoint with interpolated position tables, SAM's own
        interpolate_pos_encoding recipe."""
        g = cfg.grid
        if pe.shape[1] == g:
            return pe
        import jax.image
        return np.asarray(jax.image.resize(
            jnp.asarray(pe), (pe.shape[0], g, g, pe.shape[-1]), "bicubic"),
            np.float32)

    def _resize_rel_pos(table, is_global):
        """Linear-resize a decomposed rel-pos table to the serving grid.
        Windowed blocks keep their 2*14-1 rows at any canvas; global blocks
        need 2*grid-1 rows."""
        want = 2 * cfg.grid - 1 if is_global else 2 * cfg.window_size - 1
        if table.shape[0] == want:
            return table
        import jax.image
        return np.asarray(jax.image.resize(
            jnp.asarray(table), (want, table.shape[1]), "linear"),
            np.float32)

    enc = {
        "patch_embed": conv(n["patch_embed"]),
        "pos_embed": _resize_pos_embed(t(n["enc"] + "pos_embed")),
    }
    for i in range(cfg.encoder_depth):
        b = n["block"].format(i=i)
        is_global = i in cfg.global_blocks
        enc[f"block{i}"] = {
            "norm1": ln(b + n["bnorm1"]),
            "norm2": ln(b + n["bnorm2"]),
            "attn": {"qkv": lin(b + "attn.qkv"),
                     "proj": lin(b + "attn.proj"),
                     "rel_pos_h": _resize_rel_pos(
                         t(b + "attn.rel_pos_h"), is_global),
                     "rel_pos_w": _resize_rel_pos(
                         t(b + "attn.rel_pos_w"), is_global)},
            "fc1": lin(b + "mlp.lin1"),
            "fc2": lin(b + "mlp.lin2"),
        }
    for dst, key in (("neck0", n["neck0"]), ("neck1", n["neck1"])):
        enc[dst] = {"kernel": t(key + ".weight").transpose(2, 3, 1, 0)}
    enc["neck_ln0"] = ln(n["neck_ln0"])
    enc["neck_ln1"] = ln(n["neck_ln1"])

    prompt = {
        "pe_gaussian": t(n["pe_gaussian"]),
        "corner1": t(n["point_embed"].format(i=2) + ".weight")[0],
        "corner2": t(n["point_embed"].format(i=3) + ".weight")[0],
        "no_mask": t(n["prompt"] + "no_mask_embed.weight")[0],
    }

    dec = {
        "iou_token": t(n["dec"] + "iou_token.weight"),
        "mask_tokens": t(n["dec"] + "mask_tokens.weight"),
        "up1": convT(n["dec"] + n["up1"]),
        "up_ln": ln(n["dec"] + n["up_ln"]),
        "up2": convT(n["dec"] + n["up2"]),
        "final_ln": ln(n["dec"] + "transformer." + n["final_ln"]),
    }
    fa = n["dec"] + "transformer.final_attn_token_to_image."
    for dst, srcname in (("final_q", "q_proj"), ("final_k", "k_proj"),
                         ("final_v", "v_proj"), ("final_out", "out_proj")):
        dec[dst] = lin(fa + srcname)
    for i in range(cfg.decoder_depth):
        b = n["dec"] + f"transformer.layers.{i}."
        blk = {}
        for pre, name in (("self", "self_attn"),
                          ("t2i", "cross_attn_token_to_image"),
                          ("i2t", "cross_attn_image_to_token")):
            for dst, srcname in ((f"{pre}_q", "q_proj"), (f"{pre}_k", "k_proj"),
                                 (f"{pre}_v", "v_proj"),
                                 (f"{pre}_out", "out_proj")):
                blk[dst] = lin(b + f"{name}.{srcname}")
        for j in range(1, 5):
            blk[f"ln{j}"] = ln(b + n["dnorm"].format(j=j))
        blk["fc1"] = lin(b + "mlp.lin1")
        blk["fc2"] = lin(b + "mlp.lin2")
        dec[f"block{i}"] = blk
    for i in range(cfg.num_mask_tokens):
        h = n["dec"] + f"output_hypernetworks_mlps.{i}."
        dec[f"hyper{i}_0"] = lin(h + n["ff0"])
        dec[f"hyper{i}_1"] = lin(h + n["ff1"])
        dec[f"hyper{i}_out"] = lin(h + n["ff2"])
    iou = n["dec"] + "iou_prediction_head."
    dec["iou_fc0"] = lin(iou + n["ff0"])
    dec["iou_fc1"] = lin(iou + n["ff1"])
    dec["iou_head"] = lin(iou + n["ff2"])

    return {"params": {"image_encoder": enc, "prompt_encoder": prompt,
                       "mask_decoder": dec}}


_OFFICIAL_NAMES = dict(
    enc="image_encoder.", patch_embed="image_encoder.patch_embed.proj",
    block="image_encoder.blocks.{i}.", bnorm1="norm1", bnorm2="norm2",
    neck0="image_encoder.neck.0", neck_ln0="image_encoder.neck.1",
    neck1="image_encoder.neck.2", neck_ln1="image_encoder.neck.3",
    prompt="prompt_encoder.",
    pe_gaussian="prompt_encoder.pe_layer.positional_encoding_gaussian_matrix",
    point_embed="prompt_encoder.point_embeddings.{i}",
    dec="mask_decoder.", dnorm="norm{j}", final_ln="norm_final_attn",
    up1="output_upscaling.0", up_ln="output_upscaling.1",
    up2="output_upscaling.3",
    ff0="layers.0", ff1="layers.1", ff2="layers.2")

_HF_NAMES = dict(
    enc="vision_encoder.", patch_embed="vision_encoder.patch_embed.projection",
    block="vision_encoder.layers.{i}.", bnorm1="layer_norm1",
    bnorm2="layer_norm2",
    neck0="vision_encoder.neck.conv1", neck_ln0="vision_encoder.neck.layer_norm1",
    neck1="vision_encoder.neck.conv2", neck_ln1="vision_encoder.neck.layer_norm2",
    prompt="prompt_encoder.",
    pe_gaussian="prompt_encoder.shared_embedding.positional_embedding",
    point_embed="prompt_encoder.point_embed.{i}",
    dec="mask_decoder.", dnorm="layer_norm{j}",
    final_ln="layer_norm_final_attn",
    up1="upscale_conv1", up_ln="upscale_layer_norm", up2="upscale_conv2",
    ff0="proj_in", ff1="layers.0", ff2="proj_out")


def port_sam_params(checkpoint_path: str, cfg: SamConfig, init_params=None):
    """Load an official `sam_vit_*.pth` state dict (the checkpoint the
    reference downloads, object_finder.py:116) into flax params."""
    import torch
    sd = torch.load(checkpoint_path, map_location="cpu", weights_only=True)
    sd = {k: v.numpy() for k, v in sd.items()}
    return _sam_flax_params(sd, cfg, _OFFICIAL_NAMES)


def sam_config_from_state_dict(sd, img_size: int = 1024,
                               **overrides) -> SamConfig:
    """Infer the encoder variant (B/L/H) from an official-layout state
    dict: width from patch_embed, depth from the block count, global blocks
    from rel-pos table length (windowed blocks carry 2*14-1=27 rows; global
    blocks are sized by the full grid). Deployment-path requirement: the
    reference ships sam_vit_h_4b8939 (object_finder.py:116) while the
    weights-free default here is ViT-B — without inference a real H
    checkpoint would be ported into B-shaped params and fail."""
    import re
    dim = int(sd["image_encoder.patch_embed.proj.weight"].shape[0])
    blocks = sorted({int(m.group(1)) for k in sd
                     if (m := re.match(r"image_encoder\.blocks\.(\d+)\.", k))})
    depth = blocks[-1] + 1
    window_rows = 2 * 14 - 1
    global_blocks = tuple(
        i for i in blocks
        if sd[f"image_encoder.blocks.{i}.attn.rel_pos_h"].shape[0]
        != window_rows)
    heads = {768: 12, 1024: 16, 1280: 16}.get(dim, max(1, dim // 80))
    return SamConfig(img_size=img_size, encoder_dim=dim,
                     encoder_depth=depth, encoder_heads=heads,
                     global_blocks=global_blocks, **overrides)


def port_hf_sam_params(state_dict, cfg: SamConfig):
    """Map a HF `SamModel` torch state_dict into flax params."""
    return _sam_flax_params(state_dict, cfg, _HF_NAMES)
