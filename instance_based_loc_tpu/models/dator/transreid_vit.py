"""TransReID-style ViT backbone in flax (reference
`dator/model/backbones/vit_pytorch.py`):

* overlapping patch embedding — conv with kernel = patch_size and a smaller
  stride (PatchEmbed_overlap, :286-330);
* class token + learned position embedding + optional SIE camera/view
  embedding scaled by `sie_xishu` (:422-436);
* pre-norm transformer blocks, the LAST TWO carrying a rank-4 LoRA adapter on
  the qkv projection (AttentionWithLoRA :167-196: qkv(x) + x @ (down @ up)) —
  the only trainable weights when fine-tuning DATOR (make_model.py:466-477);
* `local_feature` mode returns the tokens before the final block and norm
  (:441-444), which FourDNet consumes.

TPU-first: bf16 matmuls, params f32; LoRA params live in a separate
collection ("lora") so the optimizer can mask everything else frozen without
walking the tree by name.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class TransReIDConfig:
    img_height: int = 256
    img_width: int = 128
    patch_size: int = 16
    stride_size: int = 16
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    lora_layers: int = 2
    lora_rank: int = 4
    sie_xishu: float = 3.0
    cameras: int = 0
    views: int = 0
    local_feature: bool = False
    dtype: jnp.dtype = jnp.bfloat16

    @property
    def num_y(self) -> int:
        return (self.img_height - self.patch_size) // self.stride_size + 1

    @property
    def num_x(self) -> int:
        return (self.img_width - self.patch_size) // self.stride_size + 1

    @property
    def num_patches(self) -> int:
        return self.num_x * self.num_y


class LoRAAttention(nn.Module):
    cfg: TransReIDConfig
    use_lora: bool

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        d = c.hidden_size
        d_head = d // c.num_heads
        qkv = nn.Dense(3 * d, use_bias=True, dtype=c.dtype, name="qkv")(x)
        if self.use_lora:
            # rank-r adapter on the fused qkv projection; gaussian down, zero up
            down = self.param("lora_down", nn.initializers.normal(1.0),
                              (d, c.lora_rank))
            up = self.param("lora_up", nn.initializers.zeros, (c.lora_rank, 3 * d))
            qkv = qkv + (x.astype(jnp.float32) @ down @ up).astype(c.dtype)
        b, n, _ = x.shape
        qkv = qkv.reshape(b, n, 3, c.num_heads, d_head)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        attn = jnp.einsum("bqhd,bkhd->bhqk", q, k) * (d_head ** -0.5)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(c.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, n, d)
        return nn.Dense(d, dtype=c.dtype, name="proj")(out)


class TransReIDBlock(nn.Module):
    cfg: TransReIDConfig
    use_lora: bool

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        h = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm1")(x)
        x = x + LoRAAttention(c, self.use_lora, name="attn")(h)
        h = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm2")(x)
        h = nn.Dense(int(c.hidden_size * c.mlp_ratio), dtype=c.dtype, name="fc1")(h)
        h = jax.nn.gelu(h, approximate=False)
        h = nn.Dense(c.hidden_size, dtype=c.dtype, name="fc2")(h)
        return x + h


class TransReIDViT(nn.Module):
    """Returns tokens (B, 1 + num_patches, hidden) — pre-final-block when
    cfg.local_feature (FourDNet mode), else post-norm."""
    cfg: TransReIDConfig

    @nn.compact
    def __call__(self, images, cam_ids: Optional[jax.Array] = None,
                 view_ids: Optional[jax.Array] = None):
        c = self.cfg
        b = images.shape[0]
        x = nn.Conv(c.hidden_size, (c.patch_size, c.patch_size),
                    strides=(c.stride_size, c.stride_size), padding="VALID",
                    dtype=c.dtype, name="patch_embed")(images.astype(c.dtype))
        x = x.reshape(b, -1, c.hidden_size)

        cls = self.param("cls_token",
                         nn.initializers.truncated_normal(0.02),
                         (1, 1, c.hidden_size))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls, (b, 1, c.hidden_size)).astype(c.dtype), x], axis=1)
        pos = self.param("pos_embed", nn.initializers.truncated_normal(0.02),
                         (1, c.num_patches + 1, c.hidden_size))
        x = x + pos.astype(c.dtype)

        # SIE camera/view embedding (vit_pytorch.py:422-436)
        if c.cameras > 0 or c.views > 0:
            num_sie = max(c.cameras, 1) * max(c.views, 1)
            sie = self.param("sie_embed", nn.initializers.truncated_normal(0.02),
                             (num_sie, 1, c.hidden_size))
            if c.cameras > 0 and c.views > 0:
                idx = cam_ids * c.views + view_ids
            elif c.cameras > 0:
                idx = cam_ids
            else:
                idx = view_ids
            x = x + (c.sie_xishu * sie[idx]).astype(c.dtype)

        n_blocks = c.num_layers - (1 if c.local_feature else 0)
        for i in range(n_blocks):
            use_lora = i >= c.num_layers - c.lora_layers
            x = TransReIDBlock(c, use_lora, name=f"block{i}")(x)
        if not c.local_feature:
            x = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm")(x)
        return x.astype(jnp.float32)


def lora_param_mask(params) -> dict:
    """Pytree of bools: True for LoRA params (the only trainable weights when
    the towers are frozen — make_model.py:466-477)."""
    def mask(path, _leaf):
        return any("lora" in str(p) for p in path)
    return jax.tree_util.tree_map_with_path(mask, params)


def resize_pos_embed(pos: np.ndarray, num_y: int, num_x: int) -> np.ndarray:
    """Bilinear pos-embed grid resize, reference
    `vit_pytorch.py:484-499` (cls token kept, grid F.interpolate'd
    bilinear / align_corners=False)."""
    tok, grid = pos[:, :1], pos[0, 1:]
    gs = int(np.sqrt(grid.shape[0]))
    grid = grid.reshape(gs, gs, -1)
    grid = jax.image.resize(jnp.asarray(grid), (num_y, num_x, grid.shape[-1]),
                            method="bilinear")
    grid = np.asarray(grid).reshape(1, num_y * num_x, -1)
    return np.concatenate([tok, grid], axis=1)


def port_hf_vit_to_transreid(state_dict, cfg: TransReIDConfig, init_params):
    """Load pretrained ViT weights (HF ViTModel layout, e.g.
    google/vit-base-patch16-224-in21k — the ImageNet init the reference
    gives both DATOR towers, make_model.py:466-477) into TransReIDViT.

    Handles: fused qkv concat, pos-embed bilinear resize to the
    (num_y, num_x) overlap-stride grid (vit_pytorch.py:484-499), the final
    norm only when not local_feature. LoRA adapters and SIE embeddings keep
    their init (they are the trainable part). Returns a full params dict."""
    import flax
    sd = {k: np.asarray(v, np.float32) for k, v in state_dict.items()}
    p = flax.core.unfreeze(init_params)["params"]

    def lin(k):
        return {"kernel": sd[k + ".weight"].T, "bias": sd[k + ".bias"]}

    def ln(k):
        return {"scale": sd[k + ".weight"], "bias": sd[k + ".bias"]}

    p["patch_embed"] = {
        "kernel": sd["embeddings.patch_embeddings.projection.weight"]
        .transpose(2, 3, 1, 0),
        "bias": sd["embeddings.patch_embeddings.projection.bias"]}
    p["cls_token"] = sd["embeddings.cls_token"]
    pos = sd["embeddings.position_embeddings"]
    if pos.shape[1] != cfg.num_patches + 1:
        pos = resize_pos_embed(pos, cfg.num_y, cfg.num_x)
    p["pos_embed"] = pos

    n_blocks = cfg.num_layers - (1 if cfg.local_feature else 0)
    for i in range(n_blocks):
        pre = f"encoder.layer.{i}."
        qkv_w = np.concatenate(
            [sd[pre + f"attention.attention.{n}.weight"] for n in
             ("query", "key", "value")], axis=0)
        qkv_b = np.concatenate(
            [sd[pre + f"attention.attention.{n}.bias"] for n in
             ("query", "key", "value")], axis=0)
        blk = p[f"block{i}"]
        blk["norm1"] = ln(pre + "layernorm_before")
        blk["norm2"] = ln(pre + "layernorm_after")
        blk["attn"]["qkv"] = {"kernel": qkv_w.T, "bias": qkv_b}
        blk["attn"]["proj"] = lin(pre + "attention.output.dense")
        blk["fc1"] = lin(pre + "intermediate.dense")
        blk["fc2"] = lin(pre + "output.dense")
    if not cfg.local_feature and "norm" in p:
        p["norm"] = ln("layernorm")
    return {"params": p}
