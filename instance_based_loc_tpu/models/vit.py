"""One flax ViT trunk covering the three reference embedder backbones
(reference `utils/embeddings.py`: HF ViT-B/16-in21k, DINOv2-base, open_clip
ViT-B/32 visual — SURVEY.md §2.3). The variants differ only in small flags:

| variant | patch | cls | quirks |
|---|---|---|---|
| vit    | 16 | yes | HF ViTModel: pre-LN blocks, final LayerNorm |
| dinov2 | 14 | yes | + LayerScale per block |
| clip   | 32 | yes | + ln_pre before blocks, ln_post + linear projection |

TPU-first: all matmuls run in bf16 (params stay f32), the attention uses one
fused einsum path (swapped for the Pallas flash kernel in ops/pallas when the
sequence is long enough to matter — ViT-B sequences are <= 257 tokens, where
XLA's fused softmax is already near roofline).

Weight porting from HF torch checkpoints: `port_hf_vit_params` /
`port_hf_dinov2_params` / `port_hf_clip_vision_params` map state dicts onto
this module 1:1 (verified numerically in tests against randomly-initialized
HF torch models, since no pretrained weights can be downloaded here).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    image_size: int = 224
    patch_size: int = 16
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    mlp_dim: int = 3072
    layernorm_eps: float = 1e-12
    use_layerscale: bool = False      # dinov2
    use_ln_pre: bool = False          # clip
    use_quick_gelu: bool = False      # openai clip
    projection_dim: Optional[int] = None  # clip visual projection
    use_pallas_attention: bool = False    # fused VMEM-resident attention
    dtype: jnp.dtype = jnp.bfloat16

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2


VARIANTS = {
    "vit": ViTConfig(patch_size=16, layernorm_eps=1e-12),
    "dinov2": ViTConfig(patch_size=14, layernorm_eps=1e-6, use_layerscale=True),
    "clip": ViTConfig(patch_size=32, layernorm_eps=1e-5, use_ln_pre=True,
                      projection_dim=512),
}


class Attention(nn.Module):
    cfg: ViTConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        d_head = c.hidden_size // c.num_heads
        qkv = nn.DenseGeneral((3, c.num_heads, d_head), dtype=c.dtype, name="qkv")(x)
        q, k, v = qkv[..., 0, :, :], qkv[..., 1, :, :], qkv[..., 2, :, :]
        if c.use_pallas_attention and jax.default_backend() == "tpu":
            from ..ops.pallas.attention import fused_attention
            # (B, S, H, D) -> (B, H, S, D); pad S to a multiple of 8
            s = q.shape[-3]
            pad = (-s) % 8
            def bhsd(t):
                t = t.swapaxes(-2, -3)
                if pad:
                    t = jnp.pad(t, ((0, 0),) * (t.ndim - 2)
                                + ((0, pad), (0, 0)))
                return t
            out = fused_attention(bhsd(q), bhsd(k), bhsd(v),
                                  valid_len=jnp.int32(s))
            out = out[..., :s, :].swapaxes(-2, -3).astype(c.dtype)
        else:
            # weak Python float: np.sqrt is a strong f64 scalar and would
            # promote the QK matmul off the bf16 MXU path
            scale = d_head ** -0.5
            attn = jnp.einsum("...qhd,...khd->...hqk", q * scale, k)
            attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(c.dtype)
            out = jnp.einsum("...hqk,...khd->...qhd", attn, v)
        return nn.DenseGeneral(c.hidden_size, axis=(-2, -1), dtype=c.dtype,
                               name="out")(out)


class Mlp(nn.Module):
    cfg: ViTConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        x = nn.Dense(c.mlp_dim, dtype=c.dtype, name="fc1")(x)
        if c.use_quick_gelu:
            x = x * jax.nn.sigmoid(1.702 * x)
        else:
            x = jax.nn.gelu(x, approximate=False)
        return nn.Dense(c.hidden_size, dtype=c.dtype, name="fc2")(x)


class Block(nn.Module):
    cfg: ViTConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        h = nn.LayerNorm(epsilon=c.layernorm_eps, dtype=jnp.float32, name="ln1")(x)
        h = Attention(c, name="attn")(h)
        if c.use_layerscale:
            gamma1 = self.param("layerscale1", nn.initializers.ones, (c.hidden_size,))
            h = h * gamma1
        x = x + h
        h = nn.LayerNorm(epsilon=c.layernorm_eps, dtype=jnp.float32, name="ln2")(x)
        h = Mlp(c, name="mlp")(h)
        if c.use_layerscale:
            gamma2 = self.param("layerscale2", nn.initializers.ones, (c.hidden_size,))
            h = h * gamma2
        return x + h


class ViT(nn.Module):
    """Returns (cls_embedding, tokens). cls_embedding is post-final-LN (and
    post-projection for clip), matching what the reference extracts
    (`last_hidden_state[:, 0]` / `encode_image`)."""
    cfg: ViTConfig

    @nn.compact
    def __call__(self, images):
        c = self.cfg
        b = images.shape[0]
        x = nn.Conv(c.hidden_size, (c.patch_size, c.patch_size),
                    strides=(c.patch_size, c.patch_size), padding="VALID",
                    use_bias=not c.use_ln_pre or True, dtype=c.dtype,
                    name="patch_embed")(images.astype(c.dtype))
        x = x.reshape(b, -1, c.hidden_size)

        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, c.hidden_size))
        x = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, c.hidden_size)).astype(c.dtype), x],
                            axis=1)
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, c.num_patches + 1, c.hidden_size))
        x = x + pos.astype(c.dtype)

        if c.use_ln_pre:
            x = nn.LayerNorm(epsilon=c.layernorm_eps, dtype=jnp.float32, name="ln_pre")(x)
        for i in range(c.num_layers):
            x = Block(c, name=f"block{i}")(x)
        x = nn.LayerNorm(epsilon=c.layernorm_eps, dtype=jnp.float32, name="ln_final")(x)

        cls_out = x[:, 0]
        if c.projection_dim is not None:
            cls_out = nn.Dense(c.projection_dim, use_bias=False, dtype=c.dtype,
                               name="proj")(cls_out)
        return cls_out.astype(jnp.float32), x.astype(jnp.float32)


# --------------------------------------------------------------------------- #
# HF torch -> flax weight porting
# --------------------------------------------------------------------------- #
def _t(x):
    return jnp.asarray(np.asarray(x))


def _split_qkv(wq, wk, wv, bq, bk, bv, num_heads, hidden):
    d_head = hidden // num_heads
    # torch Linear weight is (out, in); DenseGeneral kernel is (in, 3, h, d)
    w = np.stack([np.asarray(wq).T, np.asarray(wk).T, np.asarray(wv).T], axis=1)
    w = w.reshape(hidden, 3, num_heads, d_head)
    b = np.stack([np.asarray(bq), np.asarray(bk), np.asarray(bv)], axis=0)
    b = b.reshape(3, num_heads, d_head)
    return _t(w), _t(b)


def port_hf_vit_params(state_dict: dict, cfg: ViTConfig) -> dict:
    """Map transformers.ViTModel state_dict (prefix 'vit.' absent) onto ViT."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    p: dict = {}
    p["patch_embed"] = {
        "kernel": _t(sd["embeddings.patch_embeddings.projection.weight"]
                     .transpose(2, 3, 1, 0)),
        "bias": _t(sd["embeddings.patch_embeddings.projection.bias"]),
    }
    p["cls_token"] = _t(sd["embeddings.cls_token"])
    p["pos_embed"] = _t(sd["embeddings.position_embeddings"])
    for i in range(cfg.num_layers):
        pre = f"encoder.layer.{i}."
        wq, bq = sd[pre + "attention.attention.query.weight"], sd[pre + "attention.attention.query.bias"]
        wk, bk = sd[pre + "attention.attention.key.weight"], sd[pre + "attention.attention.key.bias"]
        wv, bv = sd[pre + "attention.attention.value.weight"], sd[pre + "attention.attention.value.bias"]
        qkv_w, qkv_b = _split_qkv(wq, wk, wv, bq, bk, bv, cfg.num_heads, cfg.hidden_size)
        out_w = sd[pre + "attention.output.dense.weight"].T.reshape(
            cfg.num_heads, cfg.hidden_size // cfg.num_heads, cfg.hidden_size)
        p[f"block{i}"] = {
            "ln1": {"scale": _t(sd[pre + "layernorm_before.weight"]),
                    "bias": _t(sd[pre + "layernorm_before.bias"])},
            "ln2": {"scale": _t(sd[pre + "layernorm_after.weight"]),
                    "bias": _t(sd[pre + "layernorm_after.bias"])},
            "attn": {"qkv": {"kernel": qkv_w, "bias": qkv_b},
                     "out": {"kernel": _t(out_w),
                             "bias": _t(sd[pre + "attention.output.dense.bias"])}},
            "mlp": {"fc1": {"kernel": _t(sd[pre + "intermediate.dense.weight"].T),
                            "bias": _t(sd[pre + "intermediate.dense.bias"])},
                    "fc2": {"kernel": _t(sd[pre + "output.dense.weight"].T),
                            "bias": _t(sd[pre + "output.dense.bias"])}},
        }
    p["ln_final"] = {"scale": _t(sd["layernorm.weight"]),
                     "bias": _t(sd["layernorm.bias"])}
    return {"params": p}


def port_hf_dinov2_params(state_dict: dict, cfg: ViTConfig) -> dict:
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    p: dict = {}
    p["patch_embed"] = {
        "kernel": _t(sd["embeddings.patch_embeddings.projection.weight"]
                     .transpose(2, 3, 1, 0)),
        "bias": _t(sd["embeddings.patch_embeddings.projection.bias"]),
    }
    p["cls_token"] = _t(sd["embeddings.cls_token"])
    p["pos_embed"] = _t(sd["embeddings.position_embeddings"])
    for i in range(cfg.num_layers):
        pre = f"encoder.layer.{i}."
        qkv_w, qkv_b = _split_qkv(
            sd[pre + "attention.attention.query.weight"],
            sd[pre + "attention.attention.key.weight"],
            sd[pre + "attention.attention.value.weight"],
            sd[pre + "attention.attention.query.bias"],
            sd[pre + "attention.attention.key.bias"],
            sd[pre + "attention.attention.value.bias"],
            cfg.num_heads, cfg.hidden_size)
        out_w = sd[pre + "attention.output.dense.weight"].T.reshape(
            cfg.num_heads, cfg.hidden_size // cfg.num_heads, cfg.hidden_size)
        p[f"block{i}"] = {
            "ln1": {"scale": _t(sd[pre + "norm1.weight"]),
                    "bias": _t(sd[pre + "norm1.bias"])},
            "ln2": {"scale": _t(sd[pre + "norm2.weight"]),
                    "bias": _t(sd[pre + "norm2.bias"])},
            "attn": {"qkv": {"kernel": qkv_w, "bias": qkv_b},
                     "out": {"kernel": _t(out_w),
                             "bias": _t(sd[pre + "attention.output.dense.bias"])}},
            "mlp": {"fc1": {"kernel": _t(sd[pre + "mlp.fc1.weight"].T),
                            "bias": _t(sd[pre + "mlp.fc1.bias"])},
                    "fc2": {"kernel": _t(sd[pre + "mlp.fc2.weight"].T),
                            "bias": _t(sd[pre + "mlp.fc2.bias"])}},
            "layerscale1": _t(sd[pre + "layer_scale1.lambda1"]),
            "layerscale2": _t(sd[pre + "layer_scale2.lambda1"]),
        }
    p["ln_final"] = {"scale": _t(sd["layernorm.weight"]),
                     "bias": _t(sd["layernorm.bias"])}
    return {"params": p}


def port_hf_clip_vision_params(state_dict: dict, cfg: ViTConfig,
                               visual_projection: np.ndarray | None = None) -> dict:
    """transformers.CLIPVisionModel state_dict (prefix 'vision_model.')."""
    sd = {k.removeprefix("vision_model."): np.asarray(v)
          for k, v in state_dict.items()}
    p: dict = {}
    p["patch_embed"] = {
        "kernel": _t(sd["embeddings.patch_embedding.weight"].transpose(2, 3, 1, 0)),
        "bias": _t(np.zeros(cfg.hidden_size, np.float32)
                   if "embeddings.patch_embedding.bias" not in sd
                   else sd["embeddings.patch_embedding.bias"]),
    }
    p["cls_token"] = _t(sd["embeddings.class_embedding"].reshape(1, 1, -1))
    p["pos_embed"] = _t(sd["embeddings.position_embedding.weight"][None])
    p["ln_pre"] = {"scale": _t(sd["pre_layrnorm.weight"]),
                   "bias": _t(sd["pre_layrnorm.bias"])}
    for i in range(cfg.num_layers):
        pre = f"encoder.layers.{i}."
        qkv_w, qkv_b = _split_qkv(
            sd[pre + "self_attn.q_proj.weight"], sd[pre + "self_attn.k_proj.weight"],
            sd[pre + "self_attn.v_proj.weight"], sd[pre + "self_attn.q_proj.bias"],
            sd[pre + "self_attn.k_proj.bias"], sd[pre + "self_attn.v_proj.bias"],
            cfg.num_heads, cfg.hidden_size)
        out_w = sd[pre + "self_attn.out_proj.weight"].T.reshape(
            cfg.num_heads, cfg.hidden_size // cfg.num_heads, cfg.hidden_size)
        p[f"block{i}"] = {
            "ln1": {"scale": _t(sd[pre + "layer_norm1.weight"]),
                    "bias": _t(sd[pre + "layer_norm1.bias"])},
            "ln2": {"scale": _t(sd[pre + "layer_norm2.weight"]),
                    "bias": _t(sd[pre + "layer_norm2.bias"])},
            "attn": {"qkv": {"kernel": qkv_w, "bias": qkv_b},
                     "out": {"kernel": _t(out_w),
                             "bias": _t(sd[pre + "self_attn.out_proj.bias"])}},
            "mlp": {"fc1": {"kernel": _t(sd[pre + "mlp.fc1.weight"].T),
                            "bias": _t(sd[pre + "mlp.fc1.bias"])},
                    "fc2": {"kernel": _t(sd[pre + "mlp.fc2.weight"].T),
                            "bias": _t(sd[pre + "mlp.fc2.bias"])}},
        }
    p["ln_final"] = {"scale": _t(sd["post_layernorm.weight"]),
                     "bias": _t(sd["post_layernorm.bias"])}
    if cfg.projection_dim is not None:
        if visual_projection is not None:
            p["proj"] = {"kernel": _t(np.asarray(visual_projection).T)}
        else:
            p["proj"] = {"kernel": _t(np.zeros((cfg.hidden_size, cfg.projection_dim),
                                               np.float32))}
    return {"params": p}
