"""Detection cascade tests: orchestration/dedup logic with fake backends
(exactly the reference's rules), MSDA vs the torch reference formula, and the
SAM flax model's structural behavior."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from instance_based_loc_tpu.models.cascade import (
    CascadeDetector, box_min_area_overlap, box_area_ratio, cxcywh_to_xyxy)


# --------------------------------------------------------------------------- #
# cascade orchestration with fakes
# --------------------------------------------------------------------------- #
def make_fake_cascade(boxes_by_word, tags):
    def tagger(img):
        return tags

    def grounder(img, word):
        boxes = boxes_by_word.get(word)
        if boxes is None:
            return None, None
        return np.asarray(boxes, np.float32), np.ones(len(boxes))

    def segmenter(img, boxes_xyxy):
        h, w = img.shape[:2]
        masks = np.zeros((len(boxes_xyxy), h, w), bool)
        for i, b in enumerate(boxes_xyxy.astype(int)):
            masks[i, b[1]:b[3], b[0]:b[2]] = True
        return masks

    return CascadeDetector(tagger, grounder, segmenter)


def test_cascade_dedup_rules():
    """A near-identical box under a second keyword must be dropped; a
    same-position much-smaller box must be kept (area ratio gate)."""
    big = [0.5, 0.5, 0.4, 0.4]
    dup = [0.5, 0.5, 0.41, 0.39]       # overlaps big, similar size -> dropped
    small = [0.5, 0.5, 0.1, 0.1]       # inside big but much smaller -> kept
    far = [0.15, 0.15, 0.2, 0.2]
    cascade = make_fake_cascade(
        {"chair": [big], "seat": [dup, far], "cup": [small]},
        tags=["chair", "seat", "cup"])
    det = cascade.find(np.zeros((100, 120, 3), np.uint8), consider_floor=False)
    assert det.phrases == ["chair", "seat", "cup"]
    assert len(det) == 3  # big, far, small — dup removed


def test_cascade_caption_filtering_and_floor():
    cascade = make_fake_cascade(
        {"chair": [[0.5, 0.5, 0.3, 0.3]], "floor": [[0.5, 0.8, 0.9, 0.2]]},
        tags=["chair", "wall", "ceiling", "person"])  # wall/ceiling/person ignored
    det = cascade.find(np.zeros((60, 80, 3), np.uint8), consider_floor=True)
    assert "floor" in det.phrases and "chair" in det.phrases
    det2 = cascade.find(np.zeros((60, 80, 3), np.uint8), consider_floor=False)
    assert "floor" not in det2.phrases


def test_cascade_explicit_caption_bypasses_tagger():
    cascade = make_fake_cascade({"lamp": [[0.3, 0.3, 0.2, 0.2]]}, tags=["chair"])
    det = cascade.find(np.zeros((50, 50, 3), np.uint8), consider_floor=False,
                       caption=["lamp"])
    assert det.phrases == ["lamp"]


def test_min_area_overlap_reference_semantics():
    a = (0.0, 0.0, 2.0, 2.0)   # cxcywh-style (x, y, w, h) as the reference uses
    b = (0.0, 0.0, 1.0, 1.0)   # fully inside a
    assert box_min_area_overlap(a, b) == pytest.approx(1.0)
    assert box_area_ratio(a, b) == pytest.approx(0.25)
    c = (5.0, 5.0, 1.0, 1.0)
    assert box_min_area_overlap(a, c) == 0.0


def test_cxcywh_to_xyxy():
    out = cxcywh_to_xyxy(np.array([[0.5, 0.5, 0.5, 0.5]]), 200, 100)
    np.testing.assert_allclose(out[0], [50, 25, 150, 75])


# --------------------------------------------------------------------------- #
# MSDA vs torch reference formula
# --------------------------------------------------------------------------- #
@pytest.mark.parametrize("shapes", [
    ((8, 12), (4, 6)),        # both levels take the MXU matmul lowering
    ((70, 70), (4, 6)),       # 4900 > MATMUL_MAX_S: level 0 takes flat-gather
])
def test_msda_matches_torch_reference(rng, shapes):
    import torch
    import torch.nn.functional as F
    from instance_based_loc_tpu.ops.msda import \
        multi_scale_deformable_attention

    b, heads, d = 2, 4, 8
    s = sum(h * w for h, w in shapes)
    q, l, k = 10, len(shapes), 3
    value = rng.normal(size=(b, s, heads, d)).astype(np.float32)
    # spill past [0, 1] to pin zero-padding semantics in both lowerings
    loc = rng.uniform(-0.05, 1.05, size=(b, q, heads, l, k, 2)).astype(np.float32)
    weights = rng.uniform(size=(b, q, heads, l, k)).astype(np.float32)
    weights /= weights.reshape(b, q, heads, -1).sum(-1)[..., None, None]

    ours = np.asarray(multi_scale_deformable_attention(
        jnp.asarray(value), shapes, jnp.asarray(loc), jnp.asarray(weights)))

    # the standard pure-pytorch MSDA reference (deformable DETR repo)
    value_t = torch.from_numpy(value)
    loc_t = torch.from_numpy(loc)
    w_t = torch.from_numpy(weights)
    splits = [h * w for h, w in shapes]
    value_list = value_t.split(splits, dim=1)
    out = torch.zeros(b, q, heads, d)
    for lvl, (hh, ww) in enumerate(shapes):
        v_l = value_list[lvl].reshape(b, hh, ww, heads, d).permute(
            0, 3, 4, 1, 2).reshape(b * heads, d, hh, ww)
        grid = loc_t[:, :, :, lvl] * 2 - 1                      # (b,q,h,k,2)
        grid = grid.permute(0, 2, 1, 3, 4).reshape(b * heads, q, k, 2)
        sampled = F.grid_sample(v_l, grid, mode="bilinear",
                                padding_mode="zeros", align_corners=False)
        sampled = sampled.reshape(b, heads, d, q, k)
        w_l = w_t[:, :, :, lvl].permute(0, 2, 1, 3)             # (b,h,q,k)
        out += (sampled * w_l[:, :, None]).sum(-1).permute(0, 3, 1, 2)
    ref = out.reshape(b, q, heads * d).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


# --------------------------------------------------------------------------- #
# SAM structural behavior (random init — no downloadable weights here)
# --------------------------------------------------------------------------- #
def test_sam_shapes_and_prompt_sensitivity(rng):
    from instance_based_loc_tpu.models.sam import Sam, SamConfig

    cfg = SamConfig(img_size=64, patch_size=16, encoder_dim=32,
                    encoder_depth=2, encoder_heads=4, window_size=2,
                    global_blocks=(1,), prompt_dim=32, decoder_heads=4)
    model = Sam(cfg)
    img = jnp.asarray(rng.normal(size=(64, 64, 3)), jnp.float32)
    boxes = jnp.asarray([[4.0, 4.0, 30.0, 30.0], [30.0, 30.0, 60.0, 60.0]])
    params = model.init(jax.random.PRNGKey(0), img, boxes)
    masks, iou = model.apply(params, img, boxes)
    g = cfg.grid
    assert masks.shape == (2, 4 * g, 4 * g)
    assert iou.shape == (2,)
    # different prompts -> different masks
    assert np.abs(np.asarray(masks[0]) - np.asarray(masks[1])).max() > 1e-6
    # deterministic
    masks2, _ = model.apply(params, img, boxes)
    np.testing.assert_allclose(np.asarray(masks), np.asarray(masks2))


def test_sam_pallas_flag_inert_off_tpu(rng):
    """use_pallas_attention=True must be a no-op on CPU (backend gate):
    same params tree, same outputs as the XLA path."""
    from instance_based_loc_tpu.models.sam import Sam, SamConfig

    kw = dict(img_size=64, patch_size=16, encoder_dim=32, encoder_depth=2,
              encoder_heads=4, window_size=2, global_blocks=(1,),
              prompt_dim=32, decoder_heads=4)
    img = jnp.asarray(rng.normal(size=(64, 64, 3)), jnp.float32)
    boxes = jnp.asarray([[4.0, 4.0, 30.0, 30.0]])
    m0 = Sam(SamConfig(**kw))
    m1 = Sam(SamConfig(use_pallas_attention=True, **kw))
    params = m0.init(jax.random.PRNGKey(0), img, boxes)
    masks0, _ = m0.apply(params, img, boxes)
    masks1, _ = m1.apply(params, img, boxes)
    np.testing.assert_allclose(np.asarray(masks0), np.asarray(masks1))


def test_sam_window_partition_roundtrip(rng):
    from instance_based_loc_tpu.models.sam import (_window_partition,
                                                   _window_unpartition)
    x = jnp.asarray(rng.normal(size=(2, 10, 14, 8)), jnp.float32)
    wins, padded = _window_partition(x, 4)
    back = _window_unpartition(wins, 4, padded, (10, 14))
    np.testing.assert_allclose(np.asarray(back), np.asarray(x))
