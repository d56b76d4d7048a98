"""Swin Transformer backbone in flax — shared by the cascade's two remaining
neural stages: RAM tagging uses Swin-L at 384^2 and GroundingDINO detection
uses Swin-B (reference `object_finder.py:98-106`; SURVEY.md §2.2).

Standard Swin v1: 4x4 patch embed, stages of shifted-window attention blocks
with learned relative-position bias tables, patch-merging downsampling
between stages. Returns the per-stage feature pyramids GroundingDINO's
deformable encoder consumes, plus the pooled feature RAM's tagging head uses.
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
    dtype: jnp.dtype = jnp.float32


SWIN_B = SwinConfig()
SWIN_L = SwinConfig(embed_dim=192, num_heads=(6, 12, 24, 48), window=12,
                    img_size=384)


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
        idx = jnp.asarray(_rel_bias_index(self.window))
        bias = table[idx.reshape(-1)].reshape(n, n, self.heads)
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
    """Mask so shifted windows don't attend across wrap boundaries."""
    img = np.zeros((h, w), np.int32)
    cnt = 0
    for hs in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
        for ws in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
            img[hs, ws] = cnt
            cnt += 1
    img = img.reshape(h // window, window, w // window, window)
    img = img.transpose(0, 2, 1, 3).reshape(-1, window * window)
    diff = img[:, :, None] != img[:, None, :]
    return jnp.where(jnp.asarray(diff), -1e9, 0.0)


class SwinBlock(nn.Module):
    dim: int
    heads: int
    window: int
    shift: int
    mlp_ratio: float
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        """x: (B, H, W, C) with H, W multiples of window."""
        b, h, w, c = x.shape
        win = self.window
        shortcut = x
        x = nn.LayerNorm(name="norm1")(x)
        if self.shift:
            x = jnp.roll(x, (-self.shift, -self.shift), axis=(1, 2))
            mask = _shift_attn_mask(h, w, win, self.shift)
        else:
            mask = None
        xw = x.reshape(b, h // win, win, w // win, win, c)
        xw = xw.transpose(0, 1, 3, 2, 4, 5).reshape(-1, win * win, c)
        xw = WindowAttention(self.dim, self.heads, win, self.dtype,
                             name="attn")(xw, mask)
        x = xw.reshape(b, h // win, w // win, win, win, c)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, c)
        if self.shift:
            x = jnp.roll(x, (self.shift, self.shift), axis=(1, 2))
        x = shortcut + x

        y = nn.LayerNorm(name="norm2")(x)
        y = nn.Dense(int(c * self.mlp_ratio), dtype=self.dtype, name="fc1")(y)
        y = jax.nn.gelu(y, approximate=False)
        y = nn.Dense(c, dtype=self.dtype, name="fc2")(y)
        return x + y


class PatchMerging(nn.Module):
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x = x.reshape(b, h // 2, 2, w // 2, 2, c)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)
        x = nn.LayerNorm(name="norm")(x)
        return nn.Dense(2 * c, use_bias=False, dtype=self.dtype,
                        name="reduction")(x)


class SwinTransformer(nn.Module):
    cfg: SwinConfig

    @nn.compact
    def __call__(self, images):
        """images (B, H, W, 3) -> dict with per-stage pyramids
        ("c2".."c5", strides 4/8/16/32) and "pooled" (B, C_final)."""
        c = self.cfg
        x = nn.Conv(c.embed_dim, (c.patch_size, c.patch_size),
                    strides=(c.patch_size, c.patch_size), padding="VALID",
                    dtype=c.dtype, name="patch_embed")(images.astype(c.dtype))
        x = nn.LayerNorm(name="patch_norm")(x)

        feats = {}
        dim = c.embed_dim
        for stage, (depth, heads) in enumerate(zip(c.depths, c.num_heads)):
            # pad spatial dims to window multiples for this stage
            b, h, w, _ = x.shape
            pad_h = (-h) % c.window
            pad_w = (-w) % c.window
            if pad_h or pad_w:
                x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
            for i in range(depth):
                shift = 0 if i % 2 == 0 else c.window // 2
                x = SwinBlock(dim, heads, c.window, shift, c.mlp_ratio,
                              c.dtype, name=f"stage{stage}_block{i}")(x)
            x = x[:, :h, :w]
            feats[f"c{stage + 2}"] = x
            if stage < len(c.depths) - 1:
                x = PatchMerging(c.dtype, name=f"merge{stage}")(x)
                dim *= 2

        pooled = nn.LayerNorm(name="final_norm")(feats[f"c{len(c.depths) + 1}"])
        feats["pooled"] = jnp.mean(pooled, axis=(1, 2))
        return feats
