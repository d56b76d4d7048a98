"""Flax ViT trunk parity vs HF torch models (randomly initialized — no
downloads available; porting correctness is what's under test) and batched
embedder behavior."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from instance_based_loc_tpu.models.vit import (
    ViT, ViTConfig, port_hf_vit_params, port_hf_dinov2_params,
    port_hf_clip_vision_params)

pytestmark = pytest.mark.slow


TINY = dict(image_size=32, patch_size=8, hidden_size=32, num_layers=2,
            num_heads=4, mlp_dim=64)


def _f32(cfg_kwargs):
    return ViTConfig(dtype=jnp.float32, **cfg_kwargs)


def test_vit_port_matches_hf_torch(rng):
    import torch
    from transformers import ViTModel, ViTConfig as HFViTConfig

    hf_cfg = HFViTConfig(image_size=32, patch_size=8, hidden_size=32,
                         num_hidden_layers=2, num_attention_heads=4,
                         intermediate_size=64, hidden_dropout_prob=0.0,
                         attention_probs_dropout_prob=0.0)
    torch_model = ViTModel(hf_cfg, add_pooling_layer=False).eval()

    cfg = _f32(dict(TINY, layernorm_eps=1e-12))
    model = ViT(cfg)
    params = port_hf_vit_params(torch_model.state_dict(), cfg)

    x = rng.uniform(-1, 1, size=(2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        ref = torch_model(torch.from_numpy(x.transpose(0, 3, 1, 2))
                          ).last_hidden_state.numpy()
    cls, tokens = model.apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(tokens), ref, atol=2e-4)
    np.testing.assert_allclose(np.asarray(cls), ref[:, 0], atol=2e-4)


def test_dinov2_port_matches_hf_torch(rng):
    import torch
    from transformers import Dinov2Model, Dinov2Config

    hf_cfg = Dinov2Config(image_size=32, patch_size=8, hidden_size=32,
                          num_hidden_layers=2, num_attention_heads=4,
                          mlp_ratio=2, hidden_dropout_prob=0.0,
                          attention_probs_dropout_prob=0.0,
                          layerscale_value=0.5)
    torch_model = Dinov2Model(hf_cfg).eval()

    cfg = _f32(dict(TINY, layernorm_eps=1e-6, use_layerscale=True))
    model = ViT(cfg)
    params = port_hf_dinov2_params(torch_model.state_dict(), cfg)

    x = rng.uniform(-1, 1, size=(2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        ref = torch_model(torch.from_numpy(x.transpose(0, 3, 1, 2))
                          ).last_hidden_state.numpy()
    cls, tokens = model.apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(cls), ref[:, 0], atol=2e-4)


def test_clip_vision_port_matches_hf_torch(rng):
    import torch
    from transformers import CLIPVisionModel, CLIPVisionConfig

    hf_cfg = CLIPVisionConfig(image_size=32, patch_size=8, hidden_size=32,
                              num_hidden_layers=2, num_attention_heads=4,
                              intermediate_size=64, hidden_act="gelu",
                              attention_dropout=0.0, projection_dim=16)
    torch_model = CLIPVisionModel(hf_cfg).eval()

    cfg = _f32(dict(TINY, layernorm_eps=1e-5, use_ln_pre=True, projection_dim=None))
    model = ViT(cfg)
    params = port_hf_clip_vision_params(torch_model.state_dict(), cfg)

    x = rng.uniform(-1, 1, size=(2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        out = torch_model(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        # pooler_output = ln_post(cls) — our ln_final(x)[:, 0]
        ref = out.pooler_output.numpy()
    cls, _ = model.apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(cls), ref, atol=2e-4)


def test_embedder_batched_and_deterministic(rng):
    from instance_based_loc_tpu.models.vit_embedder import build_vit_embedder
    from instance_based_loc_tpu.memory.detection import Detections

    # random-init trunk: still a deterministic embedder
    embed = build_vit_embedder("vit")
    crops = [rng.integers(0, 255, size=(40 + 7 * i, 30 + 5 * i, 3),
                          dtype=np.uint8).astype(np.uint8) for i in range(3)]
    det = Detections(crops, np.zeros((3, 4), np.float32),
                     np.zeros((3, 8, 8), bool), ["a", "b", "c"])
    e1 = embed(det)
    e2 = embed(det)
    assert e1.shape == (3, 768)
    np.testing.assert_allclose(e1, e2)
    # different crops -> different embeddings
    assert np.abs(e1[0] - e1[1]).max() > 1e-3
