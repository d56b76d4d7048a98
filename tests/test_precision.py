"""bf16 inference policy (models/precision.py): deployment default for the
perception cascade. Checks that bf16-cast inference stays numerically in the
bf16-epsilon class of the f32 reference computation and that the builders
honor the compute_dtype knob / IBL_MODEL_DTYPE env."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from instance_based_loc_tpu.models.precision import (resolve_compute_dtype,
                                                     cast_params)


def test_resolve_compute_dtype(monkeypatch):
    assert resolve_compute_dtype() == jnp.bfloat16
    assert resolve_compute_dtype("float32") == jnp.float32
    assert resolve_compute_dtype(jnp.float32) == jnp.float32
    monkeypatch.setenv("IBL_MODEL_DTYPE", "float32")
    assert resolve_compute_dtype() == jnp.float32
    assert resolve_compute_dtype("bf16") == jnp.bfloat16


def test_cast_params_leaves_ints_alone():
    tree = {"w": jnp.ones((2, 2), jnp.float32), "idx": jnp.arange(3),
            "flag": jnp.asarray([True])}
    out = cast_params(tree, jnp.bfloat16)
    assert out["w"].dtype == jnp.bfloat16
    assert out["idx"].dtype == jnp.int32
    assert out["flag"].dtype == jnp.bool_


def test_swin_bf16_close_to_f32():
    """Swin threads cfg.dtype into its layers; features must agree with f32
    to bf16-epsilon order (~0.5% relative on random weights)."""
    import dataclasses
    from instance_based_loc_tpu.models.swin import SwinTransformer, SwinConfig

    cfg32 = SwinConfig(backbone_norms=True, embed_dim=24, depths=(1, 1, 2, 1),
                       num_heads=(2, 2, 2, 2))
    cfg16 = dataclasses.replace(cfg32, dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (1, 224, 224, 3), jnp.float32)
    p = SwinTransformer(cfg32).init(rng, x)
    f32 = SwinTransformer(cfg32).apply(p, x)
    f16 = SwinTransformer(cfg16).apply(cast_params(p, jnp.bfloat16),
                                       x.astype(jnp.bfloat16))
    for k in f32:
        a = np.asarray(f32[k], np.float32)
        b = np.asarray(f16[k], np.float32)
        rel = np.abs(a - b).max() / (np.abs(a).max() + 1e-9)
        assert rel < 0.03, (k, rel)


def test_sam_bf16_masks_agree():
    """Param+input casting (no model changes — SAM follows operand
    promotion): bf16 mask logits threshold to nearly the same masks."""
    from instance_based_loc_tpu.models.sam import Sam, SamConfig

    cfg = SamConfig(img_size=256, encoder_dim=64, encoder_depth=2,
                    encoder_heads=2, global_blocks=(1,))
    sam = Sam(cfg)
    rng = jax.random.PRNGKey(0)
    img = jax.random.normal(rng, (256, 256, 3), jnp.float32)
    boxes = jnp.asarray([[20., 20., 120., 140.], [60., 30., 200., 200.]],
                        jnp.float32)
    p = sam.init(rng, img, boxes)
    lo32, _ = sam.apply(p, img, boxes)
    lo16, _ = sam.apply(cast_params(p, jnp.bfloat16),
                        img.astype(jnp.bfloat16), boxes)
    m32 = np.asarray(lo32) > 0
    m16 = np.asarray(lo16.astype(jnp.float32)) > 0
    iou = (m32 & m16).sum() / max((m32 | m16).sum(), 1)
    # random weights are the worst case (logits hover near the threshold);
    # real checkpoints produce confident margins
    assert iou > 0.9, iou


def test_gdino_bf16_finite_and_f32_outputs(tmp_path):
    """The bf16 grounder must return finite f32 logits/boxes end-to-end
    (pos-embed/bias casts in GroundingDino keep the fused program in bf16
    without NaN-ing the masked softmax rows)."""
    import pickle
    from instance_based_loc_tpu.models.gdino import (GroundingDino,
                                                     GDinoConfig,
                                                     make_text_masks,
                                                     build_gdino_grounder)
    from instance_based_loc_tpu.models.swin import SwinConfig
    from instance_based_loc_tpu.models.bert import BertConfig

    cfg = GDinoConfig(
        backbone=SwinConfig(backbone_norms=True, embed_dim=24,
                            depths=(1, 1, 2, 1), num_heads=(2, 2, 2, 2)),
        text=BertConfig(hidden_size=64, num_layers=1, num_heads=4,
                        intermediate_size=128),
        img_size=64, d_model=64, num_queries=8,
        encoder_layers=1, decoder_layers=1, ffn_dim=128)
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

    rgb = (np.random.default_rng(0).random((48, 64, 3)) * 255).astype(np.uint8)
    for dt in ("bfloat16", "float32"):
        g = build_gdino_grounder(str(ckpt), vocab_path=str(vocab),
                                 box_threshold=0.0, cfg=cfg, compute_dtype=dt)
        boxes, scores = g(rgb, "chair")
        assert boxes.dtype == np.float32
        assert np.isfinite(boxes).all() and np.isfinite(scores).all()
        assert (scores >= 0).all() and (scores <= 1).all()
