"""BERT text encoder in flax — GroundingDINO's text backbone (the reference
loads `bert-base-uncased` inside GroundingDINO; `object_finder.py:98-106`).

Numerically matches Hugging Face `BertModel` (post-LayerNorm encoder, exact
gelu, no pooler) so `port_hf_bert_params` round-trips real checkpoints.
Supports GroundingDINO's per-phrase block-diagonal (B, T, T) self-attention
mask and explicit position_ids (each phrase restarts positions at 0)."""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 30522
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    dtype: jnp.dtype = jnp.float32


class OneHotEmbed(nn.Module):
    """Embedding lookup lowered as one_hot(ids) @ table on the MXU.

    XLA TPU stages the WHOLE table through slow memory for a tiny
    `jnp.take` from a large operand — ~22 ms device for 16 rows of the
    30522x768 bf16 BERT vocab table vs ~11 ms as a matmul
    (perf/bert_embed_probe.py; the `%copy-start bf16[30522,768] S(1)`
    pairs in perf/gdino_trace.py). Exact: each output row sums exactly one
    nonzero term. Param path matches nn.Embed ("embedding") so porters are
    unaffected."""

    num_embeddings: int
    features: int

    @nn.compact
    def __call__(self, ids):
        table = self.param(
            "embedding", nn.initializers.normal(0.02),
            (self.num_embeddings, self.features))
        # clip like jnp.take/nn.Embed (out-of-range ids -> last row), not
        # one_hot's silent zero row
        ids = jnp.clip(ids, 0, self.num_embeddings - 1)
        oh = jax.nn.one_hot(ids, self.num_embeddings, dtype=table.dtype)
        # HIGHEST precision: with an f32 table the default TPU matmul
        # precision would run bf16 MXU passes and break f32-mode parity
        # with jnp.take; exactness of the lookup must not depend on the
        # precision flag of the surrounding program
        return jnp.dot(oh, table, precision=jax.lax.Precision.HIGHEST)


class BertLayer(nn.Module):
    cfg: BertConfig

    @nn.compact
    def __call__(self, x, attn_bias):
        """x (B, T, D); attn_bias (B, 1 or H, T, T) additive float mask."""
        c = self.cfg
        b, t, d = x.shape
        dh = d // c.num_heads

        def heads(y):
            return y.reshape(b, t, c.num_heads, dh)

        q = heads(nn.Dense(d, name="query")(x))
        k = heads(nn.Dense(d, name="key")(x))
        v = heads(nn.Dense(d, name="value")(x))
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) * (dh ** -0.5)
        if attn_bias is not None:
            scores = scores + attn_bias
        probs = jax.nn.softmax(scores, axis=-1)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, t, d)
        attn_out = nn.Dense(d, name="attn_out")(ctx)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, name="attn_norm")(x + attn_out)

        h = nn.Dense(c.intermediate_size, name="fc1")(x)
        h = jax.nn.gelu(h, approximate=False)
        h = nn.Dense(d, name="fc2")(h)
        return nn.LayerNorm(epsilon=c.layer_norm_eps, name="out_norm")(x + h)


class BertEncoder(nn.Module):
    cfg: BertConfig

    @nn.compact
    def __call__(self, input_ids, attention_mask=None, token_type_ids=None,
                 position_ids=None, word_embeds=None):
        """input_ids (B, T) int32. attention_mask: (B, T) 1=real, or
        (B, T, T) bool allowed-pairs (GroundingDINO's block-diagonal mask).
        `word_embeds` (B, T, D): pre-looked-up word embeddings — the serving
        path computes the (tiny) vocab lookup on HOST and feeds rows in,
        which drops the whole vocab table from the device program (the
        on-device alternatives both stage the 30522x768 table through slow
        memory: ~22 ms for jnp.take, ~11 ms as one-hot matmul — measured in
        perf/bert_embed_probe.py / gdino_trace.py copy-starts).
        Returns last hidden state (B, T, D)."""
        c = self.cfg
        b, t = input_ids.shape
        if position_ids is None:
            position_ids = jnp.broadcast_to(jnp.arange(t), (b, t))
        if token_type_ids is None:
            token_type_ids = jnp.zeros((b, t), jnp.int32)

        if word_embeds is not None:
            word = word_embeds
        else:
            word = OneHotEmbed(c.vocab_size, c.hidden_size,
                               name="word_embeddings")(input_ids)
        pos = nn.Embed(c.max_position_embeddings, c.hidden_size,
                       name="position_embeddings")(position_ids)
        typ = nn.Embed(c.type_vocab_size, c.hidden_size,
                       name="token_type_embeddings")(token_type_ids)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, name="embed_norm")(
            word + pos + typ)

        attn_bias = None
        if attention_mask is not None:
            if attention_mask.ndim == 2:
                allowed = attention_mask[:, None, None, :]
            else:
                allowed = attention_mask[:, None, :, :]
            attn_bias = (1.0 - allowed.astype(x.dtype)) * jnp.finfo(x.dtype).min

        for i in range(c.num_layers):
            x = BertLayer(c, name=f"layer{i}")(x, attn_bias)
        return x


def port_hf_bert_params(state_dict, cfg: BertConfig, prefix: str = ""):
    """Map a HF BertModel torch state_dict (keys `embeddings.*`,
    `encoder.layer.{i}.*`) into BertEncoder flax params."""

    def t(name):
        return np.asarray(state_dict[prefix + name], np.float32)

    def lin(name):
        return {"kernel": t(name + ".weight").T, "bias": t(name + ".bias")}

    def ln(name):
        return {"scale": t(name + ".weight"), "bias": t(name + ".bias")}

    p = {
        "word_embeddings": {"embedding": t("embeddings.word_embeddings.weight")},
        "position_embeddings": {
            "embedding": t("embeddings.position_embeddings.weight")},
        "token_type_embeddings": {
            "embedding": t("embeddings.token_type_embeddings.weight")},
        "embed_norm": ln("embeddings.LayerNorm"),
    }
    for i in range(cfg.num_layers):
        base = f"encoder.layer.{i}."
        p[f"layer{i}"] = {
            "query": lin(base + "attention.self.query"),
            "key": lin(base + "attention.self.key"),
            "value": lin(base + "attention.self.value"),
            "attn_out": lin(base + "attention.output.dense"),
            "attn_norm": ln(base + "attention.output.LayerNorm"),
            "fc1": lin(base + "intermediate.dense"),
            "fc2": lin(base + "output.dense"),
            "out_norm": ln(base + "output.LayerNorm"),
        }
    return p
