"""GroundingDINO flax parity vs Hugging Face torch (randomly initialized —
no downloads in this environment; porting + architecture correctness is what
is under test, exactly like tests/test_vit.py). Covers the full two-stage
pipeline: Swin backbone, BERT text tower, fusion encoder, language-guided
query selection, box-refining decoder, contrastive heads."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from instance_based_loc_tpu.models.gdino import (
    GroundingDino, GDinoConfig, make_text_masks, port_hf_gdino_params)
from instance_based_loc_tpu.models.swin import (
    SwinConfig, SwinTransformer, port_hf_swin_params)
from instance_based_loc_tpu.models.bert import (
    BertConfig, BertEncoder, port_hf_bert_params)

pytestmark = pytest.mark.slow

transformers = pytest.importorskip("transformers")


def tiny_hf_config():
    swin = transformers.SwinConfig(
        image_size=64, patch_size=4, embed_dim=8, depths=[2, 2, 2],
        num_heads=[1, 2, 4], window_size=4, drop_path_rate=0.0,
        out_features=["stage1", "stage2", "stage3"])
    bert = transformers.BertConfig(
        vocab_size=1100, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=37,
        max_position_embeddings=64,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    return transformers.GroundingDinoConfig(
        backbone_config=swin, text_config=bert, d_model=32,
        encoder_layers=2, decoder_layers=2, encoder_attention_heads=4,
        decoder_attention_heads=4, encoder_ffn_dim=64, decoder_ffn_dim=64,
        num_queries=10, max_text_len=16, num_feature_levels=4,
        dropout=0.0, activation_dropout=0.0, attention_dropout=0.0,
        fusion_dropout=0.0, fusion_droppath=0.0, text_enhancer_dropout=0.0)


def tiny_flax_config():
    return GDinoConfig(
        backbone=SwinConfig(img_size=64, patch_size=4, embed_dim=8,
                            depths=(2, 2, 2), num_heads=(1, 2, 4), window=4,
                            backbone_norms=True),
        text=BertConfig(vocab_size=1100, hidden_size=32, num_layers=2,
                        num_heads=2, intermediate_size=37,
                        max_position_embeddings=64),
        img_size=64, d_model=32, num_queries=10, encoder_layers=2,
        decoder_layers=2, encoder_heads=4, decoder_heads=4, ffn_dim=64,
        max_text_len=16, out_stages=(0, 1, 2))


INPUT_IDS = np.array([[101, 7, 8, 1012, 9, 1012, 102]], np.int64)


def test_text_masks_match_hf():
    from transformers.models.grounding_dino.modeling_grounding_dino import (
        generate_masks_with_special_tokens_and_transfer_map)
    ref_mask, ref_pos = generate_masks_with_special_tokens_and_transfer_map(
        torch.as_tensor(INPUT_IDS))
    allowed, pos = make_text_masks(INPUT_IDS)
    np.testing.assert_array_equal(allowed, ref_mask.numpy())
    np.testing.assert_array_equal(pos, ref_pos.numpy())


def test_swin_backbone_parity():
    torch.manual_seed(0)
    hf_cfg = tiny_hf_config()
    backbone = transformers.AutoBackbone.from_config(hf_cfg.backbone_config)
    backbone.eval()
    sd = {k: v.detach().numpy() for k, v in backbone.state_dict().items()}

    cfg = tiny_flax_config().backbone
    x = np.random.default_rng(0).normal(size=(2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        ref = backbone(torch.as_tensor(x).permute(0, 3, 1, 2)).feature_maps

    params = port_hf_swin_params(sd, cfg)
    feats = SwinTransformer(cfg).apply({"params": params}, jnp.asarray(x))
    for i, (stage, r) in enumerate(zip(("c2", "c3", "c4"), ref)):
        got = np.asarray(feats[stage]).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(got, r.numpy(), atol=2e-5,
                                   err_msg=f"stage {stage}")


def test_bert_parity_with_block_mask():
    torch.manual_seed(1)
    hf_cfg = tiny_hf_config().text_config
    bert = transformers.BertModel(hf_cfg, add_pooling_layer=False)
    bert.eval()
    sd = {k: v.detach().numpy() for k, v in bert.state_dict().items()}

    allowed, pos_ids = make_text_masks(INPUT_IDS)
    with torch.no_grad():
        ref = bert(torch.as_tensor(INPUT_IDS),
                   attention_mask=torch.as_tensor(allowed),
                   token_type_ids=torch.zeros_like(torch.as_tensor(INPUT_IDS)),
                   position_ids=torch.as_tensor(pos_ids)).last_hidden_state

    cfg = tiny_flax_config().text
    params = port_hf_bert_params(sd, cfg)
    out = BertEncoder(cfg).apply(
        {"params": params}, jnp.asarray(INPUT_IDS.astype(np.int32)),
        jnp.asarray(allowed.astype(np.float32)),
        jnp.zeros_like(jnp.asarray(INPUT_IDS), jnp.int32),
        jnp.asarray(pos_ids.astype(np.int32)))
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=2e-5)


def test_gdino_full_parity():
    torch.manual_seed(2)
    hf = transformers.GroundingDinoForObjectDetection(tiny_hf_config())
    hf.eval()
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}

    x = np.random.default_rng(1).normal(size=(1, 64, 64, 3)).astype(np.float32)
    ids_t = torch.as_tensor(INPUT_IDS)
    with torch.no_grad():
        ref = hf(pixel_values=torch.as_tensor(x).permute(0, 3, 1, 2),
                 input_ids=ids_t)

    cfg = tiny_flax_config()
    params = port_hf_gdino_params(sd, cfg)
    allowed, pos_ids = make_text_masks(INPUT_IDS)
    token_mask = np.ones_like(INPUT_IDS, bool)
    logits, boxes = GroundingDino(cfg).apply(
        params, jnp.asarray(x), jnp.asarray(INPUT_IDS.astype(np.int32)),
        jnp.asarray(allowed), jnp.asarray(pos_ids.astype(np.int32)),
        jnp.asarray(token_mask))

    ref_logits = ref.logits.numpy()
    got_logits = np.asarray(logits)
    t = INPUT_IDS.shape[1]
    # -inf padding beyond the real tokens on both sides
    assert np.isneginf(got_logits[..., t:]).all()
    assert np.isneginf(ref_logits[..., t:]).all()
    np.testing.assert_allclose(got_logits[..., :t], ref_logits[..., :t],
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(boxes), ref.pred_boxes.numpy(),
                               atol=2e-4)


def test_multi_phrase_detect_all(tmp_path):
    """detect_all (one forward for all keywords) attributes each query to the
    phrase owning its argmax token and returns per-keyword boxes."""
    import pickle
    from instance_based_loc_tpu.models.gdino import build_gdino_grounder
    from instance_based_loc_tpu.models.wordpiece import WordPieceTokenizer

    cfg = tiny_flax_config()
    model = GroundingDino(cfg)
    ids = np.array([[101, 7, 8, 1012, 102]], np.int32)
    allowed, pos = make_text_masks(ids)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 64, 64, 3), jnp.float32),
                        jnp.asarray(ids), jnp.asarray(allowed),
                        jnp.asarray(pos), jnp.ones_like(ids, bool))
    ckpt = tmp_path / "params.pkl"
    ckpt.write_bytes(pickle.dumps(params))
    vocab = tmp_path / "vocab.txt"
    vocab.write_text("\n".join(
        ["[PAD]"] * 101 + ["[CLS]", "[SEP]"] + ["[UNK]"] * 909 +
        ["chair", "table", "."]))

    g = build_gdino_grounder(str(ckpt), vocab_path=str(vocab),
                             box_threshold=0.0, cfg=cfg)
    assert getattr(g, "multi_phrase", False)
    rgb = (np.random.default_rng(0).random((48, 64, 3)) * 255).astype(np.uint8)
    out = g.detect_all(rgb, ["chair", "table"])
    assert len(out) == 2
    total = sum(len(b) for b, s in out)
    assert total <= cfg.num_queries
    for boxes, scores in out:
        assert boxes.shape[1] == 4 if len(boxes) else True
        assert (scores >= 0).all()
    # single-keyword path still works
    b1, s1 = g(rgb, "chair")
    assert b1.shape[0] == s1.shape[0]


def test_text_length_bucketing_parity(tmp_path):
    """The grounder pads input_ids to a multiple of 16 (one jit
    specialization per bucket, not one per caption length — each length is
    a full SwinB recompile in deployment). Padded results must match an
    unpadded forward exactly."""
    import pickle
    from instance_based_loc_tpu.models.gdino import (
        build_gdino_grounder, IMAGENET_MEAN, IMAGENET_STD)
    from instance_based_loc_tpu.parallel.cascade_serving import (
        device_preprocess)

    cfg = tiny_flax_config()
    model = GroundingDino(cfg)
    ids0 = np.array([[101, 7, 8, 1012, 102]], np.int32)
    allowed0, pos0 = make_text_masks(ids0)
    params = model.init(jax.random.PRNGKey(3),
                        jnp.zeros((1, 64, 64, 3), jnp.float32),
                        jnp.asarray(ids0), jnp.asarray(allowed0),
                        jnp.asarray(pos0), jnp.ones_like(ids0, bool))
    ckpt = tmp_path / "params.pkl"
    ckpt.write_bytes(pickle.dumps(params))
    # "." must land on id 1012 (make_text_masks' SPECIAL_TOKEN_IDS, like the
    # real bert-base-uncased vocab): padding is only parity-exact because
    # the grounder always ends phrases with a special "." before SEP.
    vocab = tmp_path / "vocab.txt"
    vocab.write_text("\n".join(
        ["[PAD]"] * 101 + ["[CLS]", "[SEP]"] + ["[UNK]"] * 909 +
        [".", "chair"]))

    g = build_gdino_grounder(str(ckpt), vocab_path=str(vocab),
                             box_threshold=0.0, cfg=cfg,
                             compute_dtype="float32")
    rgb = (np.random.default_rng(2).random((64, 64, 3)) * 255).astype(np.uint8)
    got_boxes, got_scores = g(rgb, "chair")          # ids len 4 -> padded 16

    # unpadded reference forward through identical preprocessing
    ids = np.array([[101, 1013, 1012, 102]], np.int32)   # [CLS] chair . [SEP]
    allowed, pos = make_text_masks(ids)
    img = device_preprocess(jnp.asarray(rgb[None]), cfg.img_size,
                            IMAGENET_MEAN, IMAGENET_STD)
    logits, boxes = model.apply(params, img, jnp.asarray(ids),
                                jnp.asarray(allowed), jnp.asarray(pos),
                                jnp.asarray(ids != 0))
    probs = np.asarray(jax.nn.sigmoid(logits))[0, :, :ids.shape[1]]
    ref_scores = probs.max(axis=-1)
    assert got_boxes.shape[0] == cfg.num_queries      # threshold 0 keeps all
    np.testing.assert_allclose(got_scores, ref_scores, atol=1e-5)
    np.testing.assert_allclose(got_boxes, np.asarray(boxes)[0], atol=1e-5)


def test_host_text_embeds_path_parity():
    """The serving path feeds host-looked-up word-embedding rows
    (text_embeds) instead of shipping the vocab table to the device; the
    two paths must be bit-identical in f32."""
    cfg = tiny_flax_config()
    model = GroundingDino(cfg)
    ids = INPUT_IDS.astype(np.int32)
    allowed, pos = make_text_masks(ids)
    args = (jnp.zeros((1, 64, 64, 3), jnp.float32), jnp.asarray(ids),
            jnp.asarray(allowed), jnp.asarray(pos.astype(np.int32)),
            jnp.asarray(np.ones_like(ids, bool)))
    params = model.init(jax.random.PRNGKey(5), *args)
    table = np.asarray(
        params["params"]["text_backbone"]["word_embeddings"]["embedding"])
    ref_logits, ref_boxes = model.apply(params, *args)
    embeds = jnp.asarray(table[np.clip(ids, 0, len(table) - 1)])
    logits, boxes = model.apply(params, *args, text_embeds=embeds)
    np.testing.assert_array_equal(np.asarray(logits), np.asarray(ref_logits))
    np.testing.assert_array_equal(np.asarray(boxes), np.asarray(ref_boxes))


def test_cascade_uses_multi_phrase_grounder():
    from instance_based_loc_tpu.models.cascade import CascadeDetector
    calls = {"single": 0, "multi": 0}

    def single(img, kw):
        calls["single"] += 1
        return np.array([[0.5, 0.5, 0.4, 0.4]], np.float32), np.array([0.9])

    def detect_all(img, kws):
        calls["multi"] += 1
        return [(np.array([[0.3 + 0.1 * i, 0.5, 0.2, 0.2]], np.float32),
                 np.array([0.9])) for i, _ in enumerate(kws)]

    single.detect_all = detect_all
    single.multi_phrase = True

    def segmenter(img, boxes):
        return np.ones((len(boxes),) + img.shape[:2], bool)

    det = CascadeDetector(lambda img: ["chair", "table"], single, segmenter)
    out = det.find(np.zeros((40, 60, 3), np.uint8), consider_floor=False)
    assert calls["multi"] == 1 and calls["single"] == 0
    assert len(out) == 2
