"""Swin Transformer backbone in flax — shared by the cascade's two neural
towers: RAM tagging uses Swin-L at 384^2 and GroundingDINO detection uses
Swin-B (reference `object_finder.py:98-106`; SURVEY.md §2.2).

Numerically matches the Hugging Face `SwinModel`/`SwinBackbone`
implementation (the layout the official GroundingDINO/RAM checkpoints are
distributed in), so `port_hf_swin_params` round-trips real weights:

* per-BLOCK zero-padding of the feature map to window multiples (pad values
  are reset each block, not carried through a stage);
* `always_partition` semantics — window size and shift are never shrunk to
  the input resolution (the backbone path used by GroundingDINO);
* shifted-window attention mask built on the PADDED dims with fill -100.0;
* patch-merge quadrant order (r0c0, r1c0, r0c1, r1c1) then LayerNorm(4C)
  then Linear(4C->2C, no bias);
* separate per-out-stage LayerNorms (`hidden_states_norms`) applied to the
  pyramid features when `backbone_norms=True`.

All shapes are static under jit; padding decisions happen at trace time.
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class SwinConfig:
    img_size: int = 224
    patch_size: int = 4
    embed_dim: int = 128                       # Swin-B (192 for Swin-L)
    depths: tuple = (2, 2, 18, 2)
    num_heads: tuple = (4, 8, 16, 32)
    window: int = 7
    mlp_ratio: float = 4.0
    backbone_norms: bool = False               # per-stage output LayerNorms
    # HF SwinModel/timm semantics: when min(h, w) <= window, disable the
    # shift and shrink the window to min(h, w). The SwinBackbone path used
    # by GroundingDINO runs with always_partition=True instead (False here).
    adapt_window: bool = False
    dtype: jnp.dtype = jnp.float32


SWIN_B = SwinConfig()
SWIN_L = SwinConfig(embed_dim=192, num_heads=(6, 12, 24, 48), window=12,
                    img_size=384)
SWIN_T = SwinConfig(embed_dim=96, depths=(2, 2, 6, 2), num_heads=(3, 6, 12, 24))


def _rel_bias_index(window: int) -> np.ndarray:
    """(win^2, win^2) indices into the (2w-1)^2 relative bias table."""
    coords = np.stack(np.meshgrid(np.arange(window), np.arange(window),
                                  indexing="ij")).reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]
    rel = rel.transpose(1, 2, 0) + (window - 1)
    return (rel[..., 0] * (2 * window - 1) + rel[..., 1]).astype(np.int32)


class WindowAttention(nn.Module):
    dim: int
    heads: int
    window: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x, attn_mask=None):
        """x: (nW*B, win*win, C); attn_mask (nW, win*win, win*win) or None."""
        bnw, n, c = x.shape
        d_head = c // self.heads
        qkv = nn.Dense(3 * c, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(bnw, n, 3, self.heads, d_head)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        attn = jnp.einsum("bqhd,bkhd->bhqk", q * (d_head ** -0.5), k)

        table = self.param("rel_bias_table", nn.initializers.truncated_normal(0.02),
                           ((2 * self.window - 1) ** 2, self.heads))
        idx = _rel_bias_index(self.window)   # host numpy, static
        bias = jnp.asarray(table)[idx.reshape(-1)].reshape(n, n, self.heads)
        attn = attn + bias.transpose(2, 0, 1)[None]

        if attn_mask is not None:
            nw = attn_mask.shape[0]
            attn = attn.reshape(bnw // nw, nw, self.heads, n, n)
            attn = attn + attn_mask[None, :, None]
            attn = attn.reshape(bnw, self.heads, n, n)

        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(bnw, n, c)
        return nn.Dense(c, dtype=self.dtype, name="proj")(out)


def _shift_attn_mask(h: int, w: int, window: int, shift: int) -> jnp.ndarray:
    """Mask so shifted windows don't attend across wrap boundaries.
    h, w are the PADDED dims; fill value -100.0 matches HF Swin."""
    img = np.zeros((h, w), np.int32)
    cnt = 0
    for hs in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
        for ws in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
            img[hs, ws] = cnt
            cnt += 1
    img = img.reshape(h // window, window, w // window, window)
    img = img.transpose(0, 2, 1, 3).reshape(-1, window * window)
    diff = img[:, :, None] != img[:, None, :]
    return jnp.where(jnp.asarray(diff), -100.0, 0.0)


class SwinBlock(nn.Module):
    dim: int
    heads: int
    window: int
    shift: int
    mlp_ratio: float
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        """x: (B, H, W, C). Pads to window multiples internally (per block,
        matching HF Swin where pad values never persist across blocks)."""
        b, h, w, c = x.shape
        win = self.window
        shortcut = x
        x = nn.LayerNorm(epsilon=1e-5, name="norm1")(x)
        pad_h = (-h) % win
        pad_w = (-w) % win
        hp, wp = h + pad_h, w + pad_w
        if pad_h or pad_w:
            x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
        if self.shift:
            x = jnp.roll(x, (-self.shift, -self.shift), axis=(1, 2))
            mask = _shift_attn_mask(hp, wp, win, self.shift)
        else:
            mask = None
        xw = x.reshape(b, hp // win, win, wp // win, win, c)
        xw = xw.transpose(0, 1, 3, 2, 4, 5).reshape(-1, win * win, c)
        xw = WindowAttention(self.dim, self.heads, win, self.dtype,
                             name="attn")(xw, mask)
        x = xw.reshape(b, hp // win, wp // win, win, win, c)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, c)
        if self.shift:
            x = jnp.roll(x, (self.shift, self.shift), axis=(1, 2))
        if pad_h or pad_w:
            x = x[:, :h, :w]
        x = shortcut + x

        y = nn.LayerNorm(epsilon=1e-5, name="norm2")(x)
        y = nn.Dense(int(c * self.mlp_ratio), dtype=self.dtype, name="fc1")(y)
        y = jax.nn.gelu(y, approximate=False)
        y = nn.Dense(c, dtype=self.dtype, name="fc2")(y)
        return x + y


class PatchMerging(nn.Module):
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        if h % 2 or w % 2:
            x = jnp.pad(x, ((0, 0), (0, h % 2), (0, w % 2), (0, 0)))
        # HF Swin quadrant order: (r0c0, r1c0, r0c1, r1c1)
        x = jnp.concatenate([x[:, 0::2, 0::2], x[:, 1::2, 0::2],
                             x[:, 0::2, 1::2], x[:, 1::2, 1::2]], axis=-1)
        x = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
        return nn.Dense(2 * c, use_bias=False, dtype=self.dtype,
                        name="reduction")(x)


class SwinTransformer(nn.Module):
    cfg: SwinConfig

    @nn.compact
    def __call__(self, images):
        """images (B, H, W, 3) -> dict with per-stage pyramids
        ("c2".."c5", strides 4/8/16/32, features BEFORE downsampling,
        per-stage LayerNorm applied when cfg.backbone_norms) and "pooled"
        (B, C_final)."""
        c = self.cfg
        b, ih, iw, _ = images.shape
        pad_h = (-ih) % c.patch_size
        pad_w = (-iw) % c.patch_size
        if pad_h or pad_w:
            images = jnp.pad(images, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
        x = nn.Conv(c.embed_dim, (c.patch_size, c.patch_size),
                    strides=(c.patch_size, c.patch_size), padding="VALID",
                    dtype=c.dtype, name="patch_embed")(images.astype(c.dtype))
        x = nn.LayerNorm(epsilon=1e-5, name="patch_norm")(x)

        feats = {}
        dim = c.embed_dim
        for stage, (depth, heads) in enumerate(zip(c.depths, c.num_heads)):
            win = c.window
            if c.adapt_window and min(x.shape[1], x.shape[2]) <= win:
                win = min(x.shape[1], x.shape[2])
            for i in range(depth):
                shift = 0 if i % 2 == 0 else win // 2
                if c.adapt_window and min(x.shape[1], x.shape[2]) <= c.window:
                    shift = 0
                x = SwinBlock(dim, heads, win, shift, c.mlp_ratio,
                              c.dtype, name=f"stage{stage}_block{i}")(x)
            out = x
            if c.backbone_norms:
                out = nn.LayerNorm(epsilon=1e-5, name=f"outnorm{stage}")(out)
            feats[f"c{stage + 2}"] = out
            if stage < len(c.depths) - 1:
                x = PatchMerging(c.dtype, name=f"merge{stage}")(x)
                dim *= 2

        pooled = nn.LayerNorm(epsilon=1e-5, name="final_norm")(x)
        feats["pooled"] = jnp.mean(pooled, axis=(1, 2))
        return feats


def port_hf_swin_params(state_dict, cfg: SwinConfig, prefix: str = "",
                        stage_names=None):
    """Map a Hugging Face SwinModel/SwinBackbone torch state_dict into this
    module's flax params (values as numpy). `prefix` addresses nested dicts
    (e.g. "model.backbone.conv_encoder.model." inside a GroundingDINO
    checkpoint). HF stores separate query/key/value Linears; this module uses
    one fused qkv Dense — weights are concatenated. Torch Linear weights are
    (out, in) and transpose to flax (in, out); conv kernels OIHW -> HWIO."""

    def t(name):
        w = np.asarray(state_dict[prefix + name], np.float32)
        return w

    def lin(name):
        return {"kernel": t(name + ".weight").T, "bias": t(name + ".bias")}

    def ln(name):
        return {"scale": t(name + ".weight"), "bias": t(name + ".bias")}

    p = {
        "patch_embed": {
            "kernel": t("embeddings.patch_embeddings.projection.weight")
            .transpose(2, 3, 1, 0),
            "bias": t("embeddings.patch_embeddings.projection.bias")},
        "patch_norm": ln("embeddings.norm"),
    }
    for s, depth in enumerate(cfg.depths):
        for i in range(depth):
            base = f"encoder.layers.{s}.blocks.{i}."
            qkv_w = np.concatenate(
                [t(base + f"attention.self.{n}.weight") for n in
                 ("query", "key", "value")], axis=0)
            qkv_b = np.concatenate(
                [t(base + f"attention.self.{n}.bias") for n in
                 ("query", "key", "value")], axis=0)
            p[f"stage{s}_block{i}"] = {
                "norm1": ln(base + "layernorm_before"),
                "attn": {
                    "qkv": {"kernel": qkv_w.T, "bias": qkv_b},
                    "rel_bias_table": t(
                        base + "attention.self.relative_position_bias_table"),
                    "proj": lin(base + "attention.output.dense"),
                },
                "norm2": ln(base + "layernorm_after"),
                "fc1": lin(base + "intermediate.dense"),
                "fc2": lin(base + "output.dense"),
            }
        if s < len(cfg.depths) - 1:
            base = f"encoder.layers.{s}.downsample."
            p[f"merge{s}"] = {
                "norm": ln(base + "norm"),
                "reduction": {"kernel": t(base + "reduction.weight").T},
            }
    if cfg.backbone_norms:
        if stage_names is None:
            stage_names = [f"stage{s + 1}" for s in range(len(cfg.depths))]
        for s, sn in enumerate(stage_names):
            key = f"hidden_states_norms.{sn}"
            if prefix + key + ".weight" in state_dict:
                p[f"outnorm{s}"] = ln(key)
    if prefix + "layernorm.weight" in state_dict:
        p["final_norm"] = ln("layernorm")
    else:
        shape = (cfg.embed_dim * 2 ** (len(cfg.depths) - 1),)
        p["final_norm"] = {"scale": np.ones(shape, np.float32),
                           "bias": np.zeros(shape, np.float32)}
    return p
