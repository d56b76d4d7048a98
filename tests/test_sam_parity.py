"""SAM flax parity vs Hugging Face torch SamModel (random weights — porter
and architecture correctness, per VERDICT r1 item 5). Exercises the windowed
ViT encoder with decomposed rel-pos, the box prompt encoder (+0.5 shift,
corner embeddings), the two-way transformer incl. the final token->image
attention, mask upscaling, hypernetwork heads and the IoU head."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from instance_based_loc_tpu.models.sam import (
    Sam, SamConfig, port_hf_sam_params)

pytestmark = pytest.mark.slow

transformers = pytest.importorskip("transformers")


def tiny_pair():
    vc = transformers.SamVisionConfig(
        hidden_size=32, num_hidden_layers=3, num_attention_heads=2,
        image_size=64, patch_size=16, window_size=2, global_attn_indexes=[1],
        output_channels=16, num_pos_feats=8)
    pc = transformers.SamPromptEncoderConfig(
        hidden_size=16, image_embedding_size=4, image_size=64)
    mc = transformers.SamMaskDecoderConfig(
        hidden_size=16, num_attention_heads=2, num_hidden_layers=2,
        iou_head_depth=3, iou_head_hidden_dim=16, mlp_dim=32)
    hf_cfg = transformers.SamConfig(vision_config=vc.to_dict(),
                                    prompt_encoder_config=pc.to_dict(),
                                    mask_decoder_config=mc.to_dict())
    cfg = SamConfig(img_size=64, patch_size=16, encoder_dim=32,
                    encoder_depth=3, encoder_heads=2, window_size=2,
                    global_blocks=(1,), prompt_dim=16, decoder_depth=2,
                    decoder_heads=2, decoder_mlp_dim=32, iou_head_hidden=16)
    return hf_cfg, cfg


def test_sam_parity_boxes():
    torch.manual_seed(0)
    hf_cfg, cfg = tiny_pair()
    hf = transformers.SamModel(hf_cfg)
    hf.eval()
    # HF inits with std 0.02, which makes every head output ~1e-4 — noise
    # scale for an atol comparison. Re-randomize to O(0.1) weights (the
    # LayerNorms keep activations bounded) so mismatches are visible.
    with torch.no_grad():
        for p in hf.parameters():
            p.uniform_(-0.25, 0.25)
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}

    rng = np.random.default_rng(0)
    img = rng.normal(size=(1, 64, 64, 3)).astype(np.float32)
    boxes = np.array([[4.0, 6.0, 40.0, 50.0],
                      [10.0, 12.0, 30.0, 28.0]], np.float32)

    with torch.no_grad():
        ref = hf(pixel_values=torch.as_tensor(img).permute(0, 3, 1, 2),
                 input_boxes=torch.as_tensor(boxes)[None],
                 multimask_output=False)
    ref_masks = ref.pred_masks.numpy()[0, :, 0]      # (2, 16, 16)
    ref_iou = ref.iou_scores.numpy()[0, :, 0]        # (2,)

    params = port_hf_sam_params(sd, cfg)
    masks, iou = Sam(cfg).apply(params, jnp.asarray(img[0]),
                                jnp.asarray(boxes))
    np.testing.assert_allclose(np.asarray(masks), ref_masks, atol=2e-4)
    np.testing.assert_allclose(np.asarray(iou), ref_iou, atol=2e-4)
