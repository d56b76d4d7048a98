"""Deployment-scale porter parity (VERDICT r2 item 1 + stretch item 9).

The tiny-config parity tests (test_gdino_parity / test_sam_parity /
test_ram) prove the architecture math; THESE tests prove the config/porter
mapping at the scale the reference actually deploys
(reference object_memory/object_finder.py:92-144: RAM swin_l @384,
GroundingDINO SwinB + BERT-base + 900 queries, SAM ViT-H):

* forward parity runs at the full architecture scale — real depths, widths,
  head counts, window sizes, query counts, tag counts — the knobs whose
  mis-mapping only shows at deployment scale. Where noted, the *input
  resolution* is reduced to fit a single-CPU-core torch reference forward:
  every resolution-dependent parameter shape (rel-pos tables sized by
  window, conv kernels, head dims) is identical at either resolution, and
  the exact deployment resolution is still covered by the eval_shape
  porter-shape tests below.
* the .pth/.bin -> flax path is rehearsed end-to-end with torch.save'd
  full-scale state dicts (the exact file format a real checkpoint arrives
  in), at the exact deployment resolution, via jax.eval_shape (zero-FLOP
  shape validation of the ported tree against model.init).

Runtime: minutes per test on the 1-core CPU box — marked slow + fullscale;
run with `-m fullscale`.
"""

import dataclasses

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

pytestmark = [pytest.mark.slow, pytest.mark.fullscale]

transformers = pytest.importorskip("transformers")


def _tree_shapes(tree):
    """{joined/path: shape} for comparing a ported tree vs model.init."""
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    out = {}
    for path, leaf in flat:
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", p)))
                       for p in path)
        out[key] = tuple(leaf.shape)
    return out


def _assert_same_shapes(ported, init_shapes):
    got, want = _tree_shapes(ported), _tree_shapes(init_shapes)
    missing = sorted(set(want) - set(got))
    extra = sorted(set(got) - set(want))
    assert not missing and not extra, (
        f"tree mismatch: missing={missing[:5]} extra={extra[:5]}")
    bad = {k: (got[k], want[k]) for k in want if got[k] != want[k]}
    assert not bad, f"shape mismatch: {dict(list(bad.items())[:5])}"


# --------------------------------------------------------------------------
# RAM: Swin-L with the official checkpoint's timm layout, 4585 tags
# --------------------------------------------------------------------------


def test_ram_fullscale_porter_roundtrip(tmp_path):
    """Full-scale RamConfig (Swin-L @384, num_tags=4585, label_dim 512,
    hidden 768) through the official-layout .pth porter: the exact
    deployment config of reference object_finder.py:98 (ram_swin_large_14m
    @384). Synthetic state dict, real shapes; forward at the real 384."""
    from instance_based_loc_tpu.models.ram import Ram, RamConfig, \
        port_ram_params
    from tests.test_ram import _synthetic_official_sd

    cfg = RamConfig()             # deployment defaults: Swin-L@384, 4585
    assert cfg.num_tags == 4585 and cfg.backbone.img_size == 384
    assert cfg.backbone.depths == (2, 2, 18, 2)
    rng = np.random.default_rng(0)
    sd = _synthetic_official_sd(cfg, rng)
    path = str(tmp_path / "ram_swin_large_14m.pth")
    torch.save({k: torch.as_tensor(v) for k, v in sd.items()}, path)

    params, thresholds = port_ram_params(path, cfg)
    assert thresholds is not None and thresholds.shape == (4585,)
    _assert_same_shapes(
        params,
        jax.eval_shape(Ram(cfg).init, jax.random.PRNGKey(0),
                       jnp.zeros((1, 384, 384, 3), jnp.float32)))
    logits = Ram(cfg).apply(
        params, jnp.asarray(rng.normal(size=(1, 384, 384, 3)), jnp.float32))
    assert logits.shape == (1, 4585)
    assert np.isfinite(np.asarray(logits)).all()


def test_swin_l_384_fullscale_parity():
    """Swin-L @384 (RAM's backbone at its deployment scale: embed 192,
    depths [2,2,18,2], heads [6,12,24,48], window 12 — the last stage runs
    at window==resolution, the adapt_window/no-shift edge case) vs HF
    SwinModel, full resolution, all 24 blocks."""
    from instance_based_loc_tpu.models.swin import (
        SwinConfig, SwinTransformer, port_hf_swin_params)

    hf_cfg = transformers.SwinConfig(
        image_size=384, patch_size=4, embed_dim=192, depths=[2, 2, 18, 2],
        num_heads=[6, 12, 24, 48], window_size=12, drop_path_rate=0.0,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    torch.manual_seed(0)
    hf = transformers.SwinModel(hf_cfg, add_pooling_layer=False)
    hf.eval()
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}

    cfg = SwinConfig(img_size=384, patch_size=4, embed_dim=192,
                     depths=(2, 2, 18, 2), num_heads=(6, 12, 24, 48),
                     window=12, adapt_window=True)
    x = np.random.default_rng(0).normal(
        size=(1, 384, 384, 3)).astype(np.float32)
    with torch.no_grad():
        ref = hf(torch.as_tensor(x).permute(0, 3, 1, 2)).last_hidden_state

    params = port_hf_swin_params(sd, cfg)
    feats = SwinTransformer(cfg).apply({"params": params}, jnp.asarray(x))
    got = np.asarray(feats["c5"]).reshape(1, -1, 1536).astype(np.float64)
    # HF last_hidden_state is post-final-LayerNorm; c5 is the raw stage
    # output (the module folds final_norm into "pooled"/the RAM vis_norm
    # path). Apply the ported final_norm here for an apples-to-apples
    # comparison.
    fn = params["final_norm"]
    mu = got.mean(-1, keepdims=True)
    var = got.var(-1, keepdims=True)
    got = (got - mu) / np.sqrt(var + 1e-5) * fn["scale"] + fn["bias"]
    np.testing.assert_allclose(got, ref.numpy(), atol=5e-4)


# --------------------------------------------------------------------------
# SAM ViT-H
# --------------------------------------------------------------------------


def _sam_h_hf_config(image_size: int):
    vc = transformers.SamVisionConfig(
        hidden_size=1280, num_hidden_layers=32, num_attention_heads=16,
        image_size=image_size, patch_size=16, window_size=14,
        global_attn_indexes=[7, 15, 23, 31], output_channels=256,
        mlp_dim=5120)
    pc = transformers.SamPromptEncoderConfig(
        hidden_size=256, image_embedding_size=image_size // 16,
        image_size=image_size)
    mc = transformers.SamMaskDecoderConfig(
        hidden_size=256, num_attention_heads=8, num_hidden_layers=2,
        iou_head_depth=3, iou_head_hidden_dim=256, mlp_dim=2048)
    return transformers.SamConfig(vision_config=vc.to_dict(),
                                  prompt_encoder_config=pc.to_dict(),
                                  mask_decoder_config=mc.to_dict())


def test_sam_h_fullscale_parity():
    """SAM ViT-H at full architecture scale — 32 layers x 1280 x 16 heads,
    window 14, global blocks (7,15,23,31), 256-d two-way decoder — forward
    parity vs HF SamModel. Resolution 512 (not 1024) so the single-core
    torch reference stays a few minutes: the window/global layout, rel-pos
    table shapes per block kind, and every weight shape except pos_embed /
    global rel-pos lengths are resolution-independent; @1024 shapes are
    covered by test_sam_h_official_layout_fullscale_1024."""
    from instance_based_loc_tpu.models.sam import (
        Sam, SamConfig, port_hf_sam_params)

    torch.manual_seed(0)
    hf = transformers.SamModel(_sam_h_hf_config(512))
    hf.eval()
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}

    cfg = SamConfig(img_size=512, use_pallas_attention=False)
    rng = np.random.default_rng(0)
    img = rng.normal(size=(1, 512, 512, 3)).astype(np.float32)
    boxes = np.array([[40.0, 60.0, 400.0, 500.0],
                      [100.0, 120.0, 300.0, 280.0]], np.float32)
    with torch.no_grad():
        ref = hf(pixel_values=torch.as_tensor(img).permute(0, 3, 1, 2),
                 input_boxes=torch.as_tensor(boxes)[None],
                 multimask_output=False)
    ref_masks = ref.pred_masks.numpy()[0, :, 0]
    ref_iou = ref.iou_scores.numpy()[0, :, 0]

    params = port_hf_sam_params(sd, cfg)
    masks, iou = Sam(cfg).apply(params, jnp.asarray(img[0]),
                                jnp.asarray(boxes))
    # 32 pre-norm residual blocks accumulate f32 reassociation differences;
    # scale-aware tolerance
    tol = 2e-4 * max(1.0, float(np.abs(ref_masks).max()))
    np.testing.assert_allclose(np.asarray(masks), ref_masks, atol=tol)
    np.testing.assert_allclose(np.asarray(iou), ref_iou, atol=2e-3)


def _hf_to_official_sam_key(k: str) -> str:
    """Rename one HF SamModel state-dict key to the official
    segment-anything `sam_vit_h_4b8939.pth` layout (the checkpoint the
    reference downloads, object_finder.py:116)."""
    if k.startswith("vision_encoder."):
        k = k.replace("vision_encoder.", "image_encoder.", 1)
        k = k.replace(".layers.", ".blocks.", 1)
        k = k.replace("patch_embed.projection", "patch_embed.proj")
        k = k.replace("neck.conv1", "neck.0")
        k = k.replace("neck.layer_norm1", "neck.1")
        k = k.replace("neck.conv2", "neck.2")
        k = k.replace("neck.layer_norm2", "neck.3")
        k = k.replace(".layer_norm1.", ".norm1.")
        k = k.replace(".layer_norm2.", ".norm2.")
        return k
    if k.startswith("prompt_encoder."):
        k = k.replace("shared_embedding.positional_embedding",
                      "pe_layer.positional_encoding_gaussian_matrix")
        k = k.replace("point_embed.", "point_embeddings.")
        return k
    if k.startswith("mask_decoder."):
        k = k.replace("layer_norm_final_attn", "norm_final_attn")
        for j in (1, 2, 3, 4):
            k = k.replace(f".layer_norm{j}.", f".norm{j}.")
        k = k.replace("upscale_conv1", "output_upscaling.0")
        k = k.replace("upscale_layer_norm", "output_upscaling.1")
        k = k.replace("upscale_conv2", "output_upscaling.3")
        # official MLP packs proj_in/layers.0/proj_out as layers.0/1/2 —
        # ONLY inside the hypernet/iou-head MLPs (transformer.layers must
        # stay untouched)
        if "output_hypernetworks_mlps" in k or "iou_prediction_head" in k:
            k = k.replace(".layers.0.", ".layers.1.")
            k = k.replace(".proj_in.", ".layers.0.")
            k = k.replace(".proj_out.", ".layers.2.")
        return k
    return k


def test_sam_h_official_layout_fullscale_1024(tmp_path):
    """The official sam_vit_h_4b8939 .pth layout at the EXACT deployment
    scale (ViT-H @1024): a full-scale state dict is torch.save'd in the
    official key layout, loaded through port_sam_params (the deployment
    code path, torch.load included), and must (a) equal the HF-layout port
    tree value-for-value and (b) shape-match Sam(SamConfig()).init @1024
    (zero-FLOP eval_shape — no forward at 1024 on 1 CPU core)."""
    from instance_based_loc_tpu.models.sam import (
        Sam, SamConfig, port_sam_params, port_hf_sam_params)

    torch.manual_seed(1)
    hf = transformers.SamModel(_sam_h_hf_config(1024))
    sd_hf = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    official = {_hf_to_official_sam_key(k): torch.as_tensor(v)
                for k, v in sd_hf.items()}
    path = str(tmp_path / "sam_vit_h_synthetic.pth")
    torch.save(official, path)

    cfg = SamConfig()             # deployment defaults: ViT-H @1024
    assert cfg.encoder_depth == 32 and cfg.img_size == 1024

    # variant auto-sizing: a real sam_vit_h file must reconstruct the H
    # geometry (build_sam_segmenter's weights-free default is B — without
    # inference the deployment load would shape-crash)
    from instance_based_loc_tpu.models.sam import sam_config_from_state_dict
    inferred = sam_config_from_state_dict(
        {k: v.numpy() for k, v in official.items()})
    assert (inferred.encoder_dim, inferred.encoder_depth,
            inferred.encoder_heads, inferred.global_blocks) == (
        1280, 32, 16, (7, 15, 23, 31))

    got = port_sam_params(path, cfg)
    want = port_hf_sam_params(sd_hf, cfg)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(a, b), got, want)
    _assert_same_shapes(
        got,
        jax.eval_shape(Sam(cfg).init, jax.random.PRNGKey(0),
                       jnp.zeros((1024, 1024, 3), jnp.float32),
                       jnp.zeros((8, 4), jnp.float32)))


# --------------------------------------------------------------------------
# GroundingDINO SwinB + BERT-base + 900 queries
# --------------------------------------------------------------------------


def _gdino_fullscale_hf_config(image_size: int):
    swin = transformers.SwinConfig(
        image_size=image_size, patch_size=4, embed_dim=128,
        depths=[2, 2, 18, 2], num_heads=[4, 8, 16, 32], window_size=12,
        drop_path_rate=0.0, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
        out_features=["stage2", "stage3", "stage4"])
    bert = transformers.BertConfig(   # bert-base-uncased geometry
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    return transformers.GroundingDinoConfig(
        backbone_config=swin, text_config=bert,
        dropout=0.0, activation_dropout=0.0, attention_dropout=0.0,
        fusion_dropout=0.0, fusion_droppath=0.0, text_enhancer_dropout=0.0)


def _gdino_fullscale_flax_config(image_size: int):
    from instance_based_loc_tpu.models.gdino import GDinoConfig
    from instance_based_loc_tpu.models.swin import SwinConfig
    from instance_based_loc_tpu.models.bert import BertConfig
    return GDinoConfig(
        backbone=SwinConfig(img_size=image_size, backbone_norms=True,
                            window=12),
        text=BertConfig(), img_size=image_size)


INPUT_IDS = np.array(
    [[101, 4937, 1012, 3899, 1012, 14141, 5953, 1012, 102]], np.int64)


def test_gdino_fullscale_parity(tmp_path):
    """GroundingDINO at the reference deployment architecture — SwinB
    [2,2,18,2] window 12, BERT-base text tower (30522 vocab / 12 layers /
    768), d_model 256, 900 queries, 6 fusion-encoder + 6 decoder layers —
    vs HF GroundingDinoForObjectDetection. Resolution 320 (not 800) to fit
    a single-core torch reference: every weight shape incl. the level
    embeddings, rel-pos tables and query banks is resolution-independent
    (the @800 ported tree is shape-checked in
    test_gdino_fullscale_porter_shapes_at_800). Weights arrive through a
    torch.save'd .bin — the exact real-checkpoint path (VERDICT item 9)."""
    from instance_based_loc_tpu.models.gdino import (
        GroundingDino, make_text_masks, port_hf_gdino_params)

    torch.manual_seed(0)
    hf = transformers.GroundingDinoForObjectDetection(
        _gdino_fullscale_hf_config(320))
    hf.eval()
    path = str(tmp_path / "gdino_swinb_synthetic.bin")
    torch.save(hf.state_dict(), path)

    x = np.random.default_rng(0).normal(
        size=(1, 320, 320, 3)).astype(np.float32)
    ids_t = torch.as_tensor(INPUT_IDS)
    with torch.no_grad():
        ref = hf(pixel_values=torch.as_tensor(x).permute(0, 3, 1, 2),
                 input_ids=ids_t)

    sd = {k: v.numpy() for k, v in torch.load(
        path, map_location="cpu", weights_only=True).items()}
    cfg = _gdino_fullscale_flax_config(320)
    params = port_hf_gdino_params(sd, cfg)
    allowed, pos_ids = make_text_masks(INPUT_IDS)
    logits, boxes = GroundingDino(cfg).apply(
        params, jnp.asarray(x), jnp.asarray(INPUT_IDS.astype(np.int32)),
        jnp.asarray(allowed), jnp.asarray(pos_ids.astype(np.int32)),
        jnp.asarray(np.ones_like(INPUT_IDS, bool)))

    t = INPUT_IDS.shape[1]
    ref_logits = ref.logits.numpy()
    got_logits = np.asarray(logits)
    assert got_logits.shape == (1, 900, cfg.max_text_len)
    assert np.isneginf(got_logits[..., t:]).all()
    np.testing.assert_allclose(got_logits[..., :t], ref_logits[..., :t],
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(boxes), ref.pred_boxes.numpy(),
                               atol=1e-3)


def test_gdino_fullscale_porter_shapes_at_800():
    """The ported full-scale tree must shape-match GroundingDino.init at
    the exact deployment resolution (800, reference object_finder.py's
    gd_predict input contract) — zero-FLOP eval_shape check; catches any
    resolution-dependent param the @320 forward could mask."""
    from instance_based_loc_tpu.models.gdino import (
        GroundingDino, make_text_masks, port_hf_gdino_params)

    torch.manual_seed(1)
    hf = transformers.GroundingDinoForObjectDetection(
        _gdino_fullscale_hf_config(800))
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    cfg = _gdino_fullscale_flax_config(800)
    params = port_hf_gdino_params(sd, cfg)

    ids = INPUT_IDS.astype(np.int32)
    allowed, pos_ids = make_text_masks(ids)
    init_shapes = jax.eval_shape(
        GroundingDino(cfg).init, jax.random.PRNGKey(0),
        jnp.zeros((1, 800, 800, 3), jnp.float32), jnp.asarray(ids),
        jnp.asarray(allowed), jnp.asarray(pos_ids.astype(np.int32)),
        jnp.asarray(np.ones_like(ids, bool)))
    _assert_same_shapes(params, init_shapes)
