"""Swin backbone + RAM/GroundingDINO structural tests."""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from instance_based_loc_tpu.models.swin import (
    SwinTransformer, SwinConfig, _shift_attn_mask, _rel_bias_index)

pytestmark = pytest.mark.slow


TINY_SWIN = SwinConfig(img_size=32, patch_size=4, embed_dim=16,
                       depths=(2, 2), num_heads=(2, 4), window=4)


def test_swin_pyramid_shapes(rng):
    model = SwinTransformer(TINY_SWIN)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    feats = model.apply(params, x)
    assert feats["c2"].shape == (2, 8, 8, 16)    # stride 4
    assert feats["c3"].shape == (2, 4, 4, 32)    # stride 8, dim doubled
    assert feats["pooled"].shape == (2, 32)
    # deterministic
    feats2 = model.apply(params, x)
    np.testing.assert_allclose(np.asarray(feats["pooled"]),
                               np.asarray(feats2["pooled"]))


def test_swin_shift_mask_blocks_cross_region():
    mask = np.asarray(_shift_attn_mask(8, 8, 4, 2))
    assert mask.shape == (4, 16, 16)
    assert (mask == 0).any() and (mask == -100.0).any()  # HF Swin fill value
    # mask is symmetric per window
    np.testing.assert_allclose(mask, mask.transpose(0, 2, 1))


def test_rel_bias_index_bounds():
    idx = _rel_bias_index(4)
    assert idx.shape == (16, 16)
    assert idx.min() >= 0 and idx.max() < 49  # (2*4-1)^2
    # relative index is translation-consistent: diagonal constant
    assert len(np.unique(np.diag(idx))) == 1


def test_ram_tagger_weights_free_contract():
    from instance_based_loc_tpu.models.ram import build_ram_tagger
    tagger = build_ram_tagger(image_size=64)  # weights-free
    tags = tagger(np.zeros((48, 64, 3), np.uint8))
    assert tags == []  # cascade then relies on explicit captions


def test_gdino_weights_free_contract():
    """Without a checkpoint the grounder returns (None, None) so the cascade
    falls back (full architecture parity lives in test_gdino_parity.py)."""
    from instance_based_loc_tpu.models.gdino import build_gdino_grounder
    grounder = build_gdino_grounder(None)
    boxes, scores = grounder(np.zeros((48, 64, 3), np.uint8), "chair")
    assert boxes is None and scores is None
