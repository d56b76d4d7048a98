"""CLIP text encoder porting parity + LoraRevolver adapter swapping."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from instance_based_loc_tpu.models.clip_text import (
    ClipTextConfig, ClipTextEncoder, port_hf_clip_text_params,
    SimpleTokenizer, build_clip_text_embedder)


TINY_TXT = ClipTextConfig(vocab_size=100, max_length=16, hidden_size=32,
                          num_layers=2, num_heads=4, mlp_dim=64,
                          projection_dim=8)


def test_clip_text_port_matches_hf_torch(rng):
    import torch
    from transformers import CLIPTextModel, CLIPTextConfig as HFCfg

    hf_cfg = HFCfg(vocab_size=100, max_position_embeddings=16, hidden_size=32,
                   num_hidden_layers=2, num_attention_heads=4,
                   intermediate_size=64, hidden_act="quick_gelu",
                   attention_dropout=0.0, eos_token_id=99, bos_token_id=98)
    torch_model = CLIPTextModel(hf_cfg).eval()

    model = ClipTextEncoder(TINY_TXT)
    params = port_hf_clip_text_params(torch_model.state_dict(), TINY_TXT)

    ids = np.zeros((2, 16), np.int64)
    ids[0, :4] = [98, 5, 7, 99]
    ids[1, :6] = [98, 11, 12, 13, 14, 99]
    with torch.no_grad():
        ref = torch_model(torch.from_numpy(ids)).pooler_output.numpy()

    # our encoder applies the projection; compare pre-projection by using an
    # identity projection (the tiny config's default port sets eye)
    out = model.apply(params, jnp.asarray(ids.astype(np.int32)))
    np.testing.assert_allclose(np.asarray(out), ref[:, :8], atol=2e-4)


def test_simple_tokenizer_deterministic_and_distinct():
    tok = SimpleTokenizer(vocab_size=1000, max_length=12)
    a = tok(["red chair"])
    b = tok(["red chair"])
    c = tok(["blue sofa"])
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)
    assert a[0, 0] == 998 and 999 in a[0]  # SOT / EOT present


def test_text_embedder_end_to_end():
    embed = build_clip_text_embedder(cfg=TINY_TXT)
    e1 = embed("wooden chair")
    e2 = embed("wooden chair")
    e3 = embed("metal lamp")
    assert e1.shape == (8,)
    np.testing.assert_allclose(e1, e2)
    assert np.abs(e1 - e3).max() > 1e-6


def test_lora_revolver_swapping(rng):
    from instance_based_loc_tpu.models.lora import LoraRevolver
    import dataclasses
    from instance_based_loc_tpu.models import vit as vit_mod

    # shrink the trunk for test speed
    tiny = dataclasses.replace(vit_mod.VARIANTS["vit"], image_size=32,
                               patch_size=8, hidden_size=32, num_layers=2,
                               num_heads=4, mlp_dim=64, dtype=jnp.float32)
    vit_mod.VARIANTS["tiny"] = tiny
    rev = LoraRevolver(variant="tiny")

    batch = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)
    base_out = rev.encode_image(batch)
    assert base_out.shape == (2, 32)

    adapter = {"block0": (rng.normal(size=(32, 4)).astype(np.float32) * 0.1,
                          rng.normal(size=(4, 96)).astype(np.float32) * 0.1)}
    rev.register_adapter("test5x40", adapter)
    rev.switch_to_ckpt("test5x40")
    lora_out = rev.encode_image(batch)
    assert np.abs(lora_out - base_out).max() > 1e-4  # adapter changes output

    rev.switch_to_ckpt(None)
    np.testing.assert_allclose(rev.encode_image(batch), base_out, atol=1e-6)


def test_lora_ckpt_roundtrip(tmp_path, rng):
    from instance_based_loc_tpu.models.lora import LoraRevolver
    import dataclasses
    from instance_based_loc_tpu.models import vit as vit_mod
    tiny = dataclasses.replace(vit_mod.VARIANTS["vit"], image_size=32,
                               patch_size=8, hidden_size=32, num_layers=2,
                               num_heads=4, mlp_dim=64, dtype=jnp.float32)
    vit_mod.VARIANTS["tiny2"] = tiny
    rev = LoraRevolver(variant="tiny2")
    adapter = {"block1": (rng.normal(size=(32, 4)).astype(np.float32),
                          rng.normal(size=(4, 96)).astype(np.float32))}
    rev.register_adapter("a", adapter)
    path = str(tmp_path / "adapter.npz")
    rev.save_lora_ckpt("a", path)

    rev2 = LoraRevolver(variant="tiny2")
    rev2.load_lora_ckpt_from_file(path, "restored")
    got = rev2.ckpt_library["restored"]["block1"]
    np.testing.assert_allclose(got[0], adapter["block1"][0])
    np.testing.assert_allclose(got[1], adapter["block1"][1])
