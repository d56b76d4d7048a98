"""TransReID pretrained-tower porting parity (VERDICT r1 item 6):
HF ViTModel weights -> TransReIDViT, incl. pos-embed bilinear resize to the
overlap-stride grid and stacked-tower loading for FourDNet."""

import dataclasses

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from instance_based_loc_tpu.models.dator.transreid_vit import (
    TransReIDViT, TransReIDConfig, port_hf_vit_to_transreid, resize_pos_embed)

pytestmark = pytest.mark.slow

transformers = pytest.importorskip("transformers")


def test_port_matches_hf_vit():
    """stride == patch (no overlap), square input, no SIE: TransReIDViT with
    ported weights must equal torch ViTModel.last_hidden_state."""
    hf_cfg = transformers.ViTConfig(
        image_size=32, patch_size=8, hidden_size=32, num_hidden_layers=3,
        num_attention_heads=4, intermediate_size=128,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    torch.manual_seed(0)
    hf = transformers.ViTModel(hf_cfg, add_pooling_layer=False)
    hf.eval()
    with torch.no_grad():
        for p in hf.parameters():
            p.uniform_(-0.25, 0.25)
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}

    cfg = TransReIDConfig(img_height=32, img_width=32, patch_size=8,
                          stride_size=8, hidden_size=32, num_layers=3,
                          num_heads=4, local_feature=False,
                          dtype=jnp.float32)
    model = TransReIDViT(cfg)
    x = np.random.default_rng(0).normal(size=(2, 32, 32, 3)).astype(np.float32)
    init = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = port_hf_vit_to_transreid(sd, cfg, init)
    out = model.apply(params, jnp.asarray(x))
    with torch.no_grad():
        ref = hf(torch.as_tensor(x).permute(0, 3, 1, 2)).last_hidden_state
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=2e-5)


def test_resize_pos_embed_matches_torch_interpolate():
    rng = np.random.default_rng(0)
    pos = rng.normal(size=(1, 1 + 7 * 7, 16)).astype(np.float32)
    got = resize_pos_embed(pos, 16, 8)
    grid = torch.as_tensor(pos[0, 1:]).reshape(1, 7, 7, 16).permute(0, 3, 1, 2)
    ref = torch.nn.functional.interpolate(grid, size=(16, 8), mode="bilinear")
    ref = ref.permute(0, 2, 3, 1).reshape(1, 128, 16).numpy()
    np.testing.assert_allclose(got[0, 1:], ref[0], atol=1e-5)
    np.testing.assert_allclose(got[0, :1], pos[0, :1])


def test_resize_applied_for_overlap_grid():
    """Porting 224-style weights into a rectangular overlap-stride grid
    resizes the pos embed and preserves LoRA init."""
    hf_cfg = transformers.ViTConfig(
        image_size=32, patch_size=8, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=128)
    torch.manual_seed(1)
    hf = transformers.ViTModel(hf_cfg, add_pooling_layer=False)
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}

    cfg = TransReIDConfig(img_height=48, img_width=24, patch_size=8,
                          stride_size=4, hidden_size=32, num_layers=2,
                          num_heads=4, local_feature=True, dtype=jnp.float32)
    model = TransReIDViT(cfg)
    x = jnp.zeros((1, 48, 24, 3), jnp.float32)
    init = model.init(jax.random.PRNGKey(0), x)
    params = port_hf_vit_to_transreid(sd, cfg, init)
    assert params["params"]["pos_embed"].shape == (1, 1 + cfg.num_patches, 32)
    # LoRA up stays zero-init (the trainable adapter is untouched)
    lora_up = params["params"]["block0"]["attn"]["lora_up"]
    assert np.all(np.asarray(lora_up) == 0)
    out = model.apply(params, x)
    assert out.shape == (1, 1 + cfg.num_patches, 32)


def test_fourdnet_stacked_tower_loading():
    from instance_based_loc_tpu.models.dator.fourdnet import (
        FourDNet, FourDNetConfig)
    from instance_based_loc_tpu.models.dator.train import (
        load_pretrained_towers)
    hf_cfg = transformers.ViTConfig(
        image_size=32, patch_size=8, hidden_size=32, num_hidden_layers=3,
        num_attention_heads=4, intermediate_size=128)
    torch.manual_seed(2)
    hf = transformers.ViTModel(hf_cfg, add_pooling_layer=False)
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}

    cfg = FourDNetConfig(
        backbone=TransReIDConfig(img_height=32, img_width=16, patch_size=8,
                                 stride_size=8, hidden_size=32, num_layers=3,
                                 num_heads=4, local_feature=True,
                                 dtype=jnp.float32),
        reduced_dim=16, num_classes=5, dtype=jnp.float32)
    model = FourDNet(cfg)
    rng = jax.random.PRNGKey(0)
    rgb = jnp.ones((2, 32, 16, 3), jnp.float32)
    depth = jnp.ones((2, 32, 16, 3), jnp.float32)
    params = model.init({"params": rng, "dropout": rng}, rgb, depth,
                        training=False)
    before = model.apply(params, rgb, depth, training=False)[1]
    loaded = load_pretrained_towers(params, sd, cfg.backbone)
    towers = loaded["params"]["towers"]
    qkv = np.asarray(towers["block0"]["attn"]["qkv"]["kernel"])
    assert qkv.shape[0] == 2
    np.testing.assert_array_equal(qkv[0], qkv[1])  # same init in both towers
    after = model.apply(loaded, rgb, depth, training=False)[1]
    assert np.abs(np.asarray(after) - np.asarray(before)).max() > 1e-6
