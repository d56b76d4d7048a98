"""RAM tagger tests: Q2L decoder-layer parity vs torch BertLayer, and an
official-checkpoint-layout porter round-trip on a tiny config."""

import dataclasses

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from instance_based_loc_tpu.models.ram import (
    Ram, RamConfig, TagDecoderLayer, port_ram_params, build_ram_tagger)
from instance_based_loc_tpu.models.swin import SwinConfig

pytestmark = pytest.mark.slow

transformers = pytest.importorskip("transformers")


def test_tag_decoder_layer_matches_bertlayer():
    """My Q2L layer == HF BertLayer(is_decoder, add_cross_attention) called
    without masks (bidirectional self-attn + cross-attn + post-LN FFN)."""
    from transformers.models.bert.modeling_bert import BertLayer
    cfg = transformers.BertConfig(
        hidden_size=32, num_attention_heads=2, intermediate_size=64,
        is_decoder=True, add_cross_attention=True,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        attn_implementation="eager")
    torch.manual_seed(0)
    layer = BertLayer(cfg)
    layer.eval()
    with torch.no_grad():
        for p in layer.parameters():
            p.uniform_(-0.25, 0.25)
    sd = {k: v.detach().numpy() for k, v in layer.state_dict().items()}

    rng = np.random.default_rng(0)
    queries = rng.normal(size=(1, 5, 32)).astype(np.float32)
    memory = rng.normal(size=(1, 7, 32)).astype(np.float32)
    with torch.no_grad():
        ref = layer(torch.as_tensor(queries),
                    encoder_hidden_states=torch.as_tensor(memory))[0].numpy()

    def lin(k):
        return {"kernel": sd[k + ".weight"].T, "bias": sd[k + ".bias"]}

    def ln(k):
        return {"scale": sd[k + ".weight"], "bias": sd[k + ".bias"]}

    params = {
        "self_query": lin("attention.self.query"),
        "self_key": lin("attention.self.key"),
        "self_value": lin("attention.self.value"),
        "self_out": lin("attention.output.dense"),
        "self_norm": ln("attention.output.LayerNorm"),
        "cross_query": lin("crossattention.self.query"),
        "cross_key": lin("crossattention.self.key"),
        "cross_value": lin("crossattention.self.value"),
        "cross_out": lin("crossattention.output.dense"),
        "cross_norm": ln("crossattention.output.LayerNorm"),
        "fc1": lin("intermediate.dense"),
        "fc2": lin("output.dense"),
        "out_norm": ln("output.LayerNorm"),
    }
    rcfg = RamConfig(hidden=32, heads=2, mlp_dim=64)
    out = TagDecoderLayer(rcfg).apply({"params": params},
                                      jnp.asarray(queries),
                                      jnp.asarray(memory))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5)


TINY = RamConfig(
    backbone=SwinConfig(img_size=32, patch_size=4, embed_dim=8,
                        depths=(1, 1), num_heads=(1, 2), window=4,
                        adapt_window=True),
    num_tags=12, label_dim=16, hidden=24, heads=2, layers=2, mlp_dim=32)


def _synthetic_official_sd(cfg, rng):
    """A state dict with the official ram_swin_large_14m key layout."""
    sd = {}

    def lin(k, i, o):
        sd[k + ".weight"] = rng.normal(size=(o, i)).astype(np.float32) * 0.1
        sd[k + ".bias"] = rng.normal(size=(o,)).astype(np.float32) * 0.1

    def ln(k, d):
        sd[k + ".weight"] = np.ones((d,), np.float32)
        sd[k + ".bias"] = np.zeros((d,), np.float32)

    bb = cfg.backbone
    sd["visual_encoder.patch_embed.proj.weight"] = rng.normal(
        size=(bb.embed_dim, 3, bb.patch_size, bb.patch_size)).astype(np.float32) * 0.1
    sd["visual_encoder.patch_embed.proj.bias"] = np.zeros(
        (bb.embed_dim,), np.float32)
    ln("visual_encoder.patch_embed.norm", bb.embed_dim)
    dim = bb.embed_dim
    for s, depth in enumerate(bb.depths):
        for i in range(depth):
            base = f"visual_encoder.layers.{s}.blocks.{i}."
            ln(base + "norm1", dim)
            ln(base + "norm2", dim)
            lin(base + "attn.qkv", dim, 3 * dim)
            lin(base + "attn.proj", dim, dim)
            sd[base + "attn.relative_position_bias_table"] = rng.normal(
                size=((2 * bb.window - 1) ** 2, bb.num_heads[s])
            ).astype(np.float32) * 0.1
            lin(base + "mlp.fc1", dim, int(dim * bb.mlp_ratio))
            lin(base + "mlp.fc2", int(dim * bb.mlp_ratio), dim)
        if s < len(bb.depths) - 1:
            base = f"visual_encoder.layers.{s}.downsample."
            ln(base + "norm", 4 * dim)
            sd[base + "reduction.weight"] = rng.normal(
                size=(2 * dim, 4 * dim)).astype(np.float32) * 0.1
            dim *= 2
    ln("visual_encoder.norm", dim)
    lin("image_proj", dim, cfg.label_dim)
    sd["label_embed"] = rng.normal(
        size=(cfg.num_tags, cfg.label_dim)).astype(np.float32)
    lin("wordvec_proj", cfg.label_dim, cfg.hidden)
    lin("fc", cfg.hidden, 1)
    for i in range(cfg.layers):
        base = f"tagging_head.encoder.layer.{i}."
        for n in ("attention.self.query", "attention.self.key",
                  "attention.self.value", "attention.output.dense",
                  "crossattention.self.query", "crossattention.self.key",
                  "crossattention.self.value", "crossattention.output.dense"):
            io = (cfg.label_dim, cfg.hidden) if "crossattention.self.k" in n \
                or "crossattention.self.v" in n else (cfg.hidden, cfg.hidden)
            lin(base + n, *io)
        ln(base + "attention.output.LayerNorm", cfg.hidden)
        ln(base + "crossattention.output.LayerNorm", cfg.hidden)
        lin(base + "intermediate.dense", cfg.hidden, cfg.mlp_dim)
        lin(base + "output.dense", cfg.mlp_dim, cfg.hidden)
        ln(base + "output.LayerNorm", cfg.hidden)
    sd["class_threshold"] = np.full((cfg.num_tags,), 0.5, np.float32)
    return sd


def test_ram_porter_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    sd = _synthetic_official_sd(TINY, rng)
    path = str(tmp_path / "ram_tiny.pth")
    torch.save({k: torch.as_tensor(v) for k, v in sd.items()}, path)

    params, thresholds = port_ram_params(path, TINY)
    assert thresholds is not None and thresholds.shape == (TINY.num_tags,)
    logits = Ram(TINY).apply(
        params, jnp.asarray(rng.normal(size=(1, 32, 32, 3)), jnp.float32))
    assert logits.shape == (1, TINY.num_tags)
    assert np.isfinite(np.asarray(logits)).all()


def test_ram_tagger_end_to_end(tmp_path):
    rng = np.random.default_rng(1)
    sd = _synthetic_official_sd(TINY, rng)
    path = str(tmp_path / "ram_tiny.pth")
    torch.save({k: torch.as_tensor(v) for k, v in sd.items()}, path)
    vocab = [f"tag{i}" for i in range(TINY.num_tags)]
    tagger = build_ram_tagger(path, tag_vocab=vocab, image_size=32, cfg=TINY)
    tags = tagger((rng.random((48, 64, 3)) * 255).astype(np.uint8))
    assert isinstance(tags, list)
    assert all(t in vocab for t in tags)
