"""CLIP text encoder in flax (reference `clip_loc/clip_utils.py:8-54` encodes
object-name strings with CLIP ViT-L/14's text tower to match against crop
embeddings).

Architecture: token embedding + learned positions -> pre-LN causal
transformer -> final LN -> take the EOT token's features -> linear projection
to the shared space. Weight porting from transformers.CLIPTextModel is verified
numerically in tests against randomly-initialized torch models.

Tokenization: the full CLIP BPE needs its merges file (not downloadable
here), so `SimpleTokenizer` falls back to a deterministic hash-bucket
word-piece scheme — embeddings stay deterministic and distinct per name,
which is what the weights-free pipelines need. When real CLIP weights and
vocab files are provided, pass a real tokenizer callable instead.
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from instance_based_loc_tpu.models.bert import OneHotEmbed


@dataclasses.dataclass(frozen=True)
class ClipTextConfig:
    vocab_size: int = 49408
    max_length: int = 77
    hidden_size: int = 512
    num_layers: int = 12
    num_heads: int = 8
    mlp_dim: int = 2048
    projection_dim: int = 512
    layernorm_eps: float = 1e-5
    use_quick_gelu: bool = True
    dtype: jnp.dtype = jnp.float32


class _TextBlock(nn.Module):
    cfg: ClipTextConfig

    @nn.compact
    def __call__(self, x, causal_mask):
        c = self.cfg
        d_head = c.hidden_size // c.num_heads
        h = nn.LayerNorm(epsilon=c.layernorm_eps, name="ln1")(x)
        qkv = nn.DenseGeneral((3, c.num_heads, d_head), dtype=c.dtype,
                              name="qkv")(h)
        q, k, v = qkv[..., 0, :, :], qkv[..., 1, :, :], qkv[..., 2, :, :]
        attn = jnp.einsum("...qhd,...khd->...hqk", q * (d_head ** -0.5), k)
        attn = jnp.where(causal_mask, attn, -1e30)
        attn = jax.nn.softmax(attn, axis=-1)
        o = jnp.einsum("...hqk,...khd->...qhd", attn, v)
        x = x + nn.DenseGeneral(c.hidden_size, axis=(-2, -1), dtype=c.dtype,
                                name="out")(o)
        h = nn.LayerNorm(epsilon=c.layernorm_eps, name="ln2")(x)
        h = nn.Dense(c.mlp_dim, dtype=c.dtype, name="fc1")(h)
        h = h * jax.nn.sigmoid(1.702 * h) if c.use_quick_gelu \
            else jax.nn.gelu(h, approximate=False)
        return x + nn.Dense(c.hidden_size, dtype=c.dtype, name="fc2")(h)


class ClipTextEncoder(nn.Module):
    cfg: ClipTextConfig

    @nn.compact
    def __call__(self, token_ids):
        """token_ids (B, L) int32 -> (B, projection_dim). The EOT position is
        taken as argmax(token_ids) per CLIP convention (EOT has the largest
        token id in a padded sequence)."""
        c = self.cfg
        b, l = token_ids.shape
        # one-hot-matmul lookup: XLA TPU stages the whole 49408-row table
        # through slow memory for a tiny take (perf/bert_embed_probe.py)
        emb = OneHotEmbed(c.vocab_size, c.hidden_size,
                          name="token_embedding")(token_ids)
        pos = self.param("pos_embed", nn.initializers.normal(0.01),
                         (c.max_length, c.hidden_size))
        x = emb + pos[None, :l]
        mask = jnp.tril(jnp.ones((l, l), bool))[None, None]
        for i in range(c.num_layers):
            x = _TextBlock(c, name=f"block{i}")(x, mask)
        x = nn.LayerNorm(epsilon=c.layernorm_eps, name="ln_final")(x)
        eot = jnp.argmax(token_ids, axis=-1)
        feats = x[jnp.arange(b), eot]
        return nn.Dense(c.projection_dim, use_bias=False, name="proj")(feats)


def port_hf_clip_text_params(state_dict: dict, cfg: ClipTextConfig,
                             text_projection: np.ndarray | None = None) -> dict:
    """Map transformers.CLIPTextModel state_dict (prefix 'text_model.')."""
    sd = {k.removeprefix("text_model."): np.asarray(v)
          for k, v in state_dict.items()}
    d_head = cfg.hidden_size // cfg.num_heads

    def qkv(pre):
        w = np.stack([sd[pre + "self_attn.q_proj.weight"].T,
                      sd[pre + "self_attn.k_proj.weight"].T,
                      sd[pre + "self_attn.v_proj.weight"].T], axis=1)
        b = np.stack([sd[pre + "self_attn.q_proj.bias"],
                      sd[pre + "self_attn.k_proj.bias"],
                      sd[pre + "self_attn.v_proj.bias"]], axis=0)
        return (jnp.asarray(w.reshape(cfg.hidden_size, 3, cfg.num_heads, d_head)),
                jnp.asarray(b.reshape(3, cfg.num_heads, d_head)))

    p: dict = {
        "token_embedding": {"embedding": jnp.asarray(sd["embeddings.token_embedding.weight"])},
        "pos_embed": jnp.asarray(sd["embeddings.position_embedding.weight"]),
        "ln_final": {"scale": jnp.asarray(sd["final_layer_norm.weight"]),
                     "bias": jnp.asarray(sd["final_layer_norm.bias"])},
    }
    for i in range(cfg.num_layers):
        pre = f"encoder.layers.{i}."
        w, b = qkv(pre)
        out_w = sd[pre + "self_attn.out_proj.weight"].T.reshape(
            cfg.num_heads, d_head, cfg.hidden_size)
        p[f"block{i}"] = {
            "ln1": {"scale": jnp.asarray(sd[pre + "layer_norm1.weight"]),
                    "bias": jnp.asarray(sd[pre + "layer_norm1.bias"])},
            "ln2": {"scale": jnp.asarray(sd[pre + "layer_norm2.weight"]),
                    "bias": jnp.asarray(sd[pre + "layer_norm2.bias"])},
            "qkv": {"kernel": w, "bias": b},
            "out": {"kernel": jnp.asarray(out_w),
                    "bias": jnp.asarray(sd[pre + "self_attn.out_proj.bias"])},
            "fc1": {"kernel": jnp.asarray(sd[pre + "mlp.fc1.weight"].T),
                    "bias": jnp.asarray(sd[pre + "mlp.fc1.bias"])},
            "fc2": {"kernel": jnp.asarray(sd[pre + "mlp.fc2.weight"].T),
                    "bias": jnp.asarray(sd[pre + "mlp.fc2.bias"])},
        }
    if text_projection is not None:
        p["proj"] = {"kernel": jnp.asarray(np.asarray(text_projection).T)}
    else:
        p["proj"] = {"kernel": jnp.eye(cfg.hidden_size, cfg.projection_dim,
                                       dtype=jnp.float32)}
    return {"params": p}


class SimpleTokenizer:
    """Deterministic hash-bucket fallback tokenizer (see module docstring)."""

    def __init__(self, vocab_size: int = 49408, max_length: int = 77):
        self.vocab_size = vocab_size
        self.max_length = max_length
        self.sot = vocab_size - 2
        self.eot = vocab_size - 1

    def __call__(self, texts: list[str]) -> np.ndarray:
        import hashlib
        out = np.zeros((len(texts), self.max_length), np.int32)
        for i, text in enumerate(texts):
            ids = [self.sot]
            for word in text.lower().split()[: self.max_length - 2]:
                h = int(hashlib.md5(word.encode()).hexdigest(), 16)
                ids.append(h % (self.vocab_size - 3) + 1)
            ids.append(self.eot)
            out[i, : len(ids)] = ids
        return out


def build_clip_text_embedder(checkpoint_path: str | None = None,
                             tokenizer=None, cfg: ClipTextConfig | None = None,
                             vocab_path: str | None = None,
                             merges_path: str | None = None):
    """Returns text_embed_fn(text: str) -> (projection_dim,) np array, the
    callable ClipLocObjectMemory.from_object_memory consumes. With
    vocab_path + merges_path the real CLIP byte-level BPE (models/bpe.py,
    parity-tested vs HF CLIPTokenizer) is used; otherwise the deterministic
    hash fallback keeps weights-free pipelines running."""
    cfg = cfg or ClipTextConfig()
    model = ClipTextEncoder(cfg)
    if tokenizer is None and vocab_path and merges_path:
        from .bpe import ClipBPETokenizer
        bpe = ClipBPETokenizer(vocab_path, merges_path,
                               context_length=cfg.max_length)
        tokenizer = lambda texts: np.asarray(
            [bpe.encode(t) for t in texts], np.int32)
    tok = tokenizer or SimpleTokenizer(cfg.vocab_size, cfg.max_length)
    dummy = jnp.zeros((1, cfg.max_length), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), dummy)
    if checkpoint_path:
        import torch
        sd = torch.load(checkpoint_path, map_location="cpu", weights_only=True)
        params = port_hf_clip_text_params(
            {k: v.numpy() for k, v in sd.items()}, cfg)

    @jax.jit
    def apply(ids):
        return model.apply(params, ids)

    def embed(text: str) -> np.ndarray:
        ids = tok([text])
        return np.asarray(apply(jnp.asarray(ids)))[0]

    return embed
