"""Chunked + SPMD cascade serving (parallel/cascade_serving.py).

The reference runs its RAM -> GroundingDINO -> SAM cascade strictly one
frame at a time (`object_memory/object_finder.py:259-299`). Here a chunk of
frames runs the tagger and segmenter as ONE batched device program each
(`tag_batch` / `segment_batch`), optionally sharded over the mesh "data"
axis. These tests assert the batched paths are bit-identical to per-frame
serving — the batch axis must never mix frames — on the 8-device virtual
CPU mesh (conftest).
"""

import numpy as np
import pytest

from instance_based_loc_tpu.models.cascade import CascadeDetector
from instance_based_loc_tpu.memory.detection import Detections
from instance_based_loc_tpu.parallel import make_mesh
from instance_based_loc_tpu.parallel.cascade_serving import (padded_count,
                                                             pad_stacked)


def test_padded_count_and_pad_stacked():
    mesh = make_mesh(n_data=4, n_model=1)
    assert padded_count(3, None) == 3
    assert padded_count(3, mesh) == 4
    assert padded_count(4, mesh) == 4
    assert padded_count(5, mesh) == 8
    arr = np.arange(6, dtype=np.float32).reshape(3, 2)
    out = pad_stacked(arr, 4)
    np.testing.assert_array_equal(out[:3], arr)
    np.testing.assert_array_equal(out[3], arr[2])
    assert pad_stacked(arr, 3) is arr


def _frames(rng, n, h=40, w=48):
    return [(rng.random((h, w, 3)) * 255).astype(np.uint8) for _ in range(n)]


def test_device_preprocess_matches_pil(rng):
    """The fused on-device resize+normalize must reproduce the host PIL
    transform it replaced (both antialias their downscale; PIL additionally
    u8-rounds, so exact equality is impossible)."""
    import jax
    from PIL import Image
    from instance_based_loc_tpu.parallel.cascade_serving import (
        device_preprocess)

    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    rgb = (rng.random((48, 64, 3)) * 255).astype(np.uint8)
    want = (np.asarray(Image.fromarray(rgb).resize((32, 32), Image.BILINEAR),
                       np.float32) / 255.0 - mean) / std
    got = np.asarray(jax.jit(
        lambda r: device_preprocess(r, 32, mean, std))(rgb))
    assert np.abs(got - want).max() < 0.05      # measured 0.016
    assert np.abs(got - want).mean() < 0.01     # measured 0.005
    # batched leading axis
    got2 = np.asarray(jax.jit(
        lambda r: device_preprocess(r, 32, mean, std))(rgb[None]))
    np.testing.assert_allclose(got2[0], got, atol=1e-5)


@pytest.fixture(scope="module")
def tiny_ram_tagger():
    from instance_based_loc_tpu.models.ram import RamConfig, build_ram_tagger
    from instance_based_loc_tpu.models.swin import SwinConfig

    cfg = RamConfig(
        backbone=SwinConfig(img_size=32, patch_size=4, embed_dim=8,
                            depths=(1, 1), num_heads=(1, 2), window=4,
                            adapt_window=True),
        num_tags=12, label_dim=16, hidden=24, heads=2, layers=2, mlp_dim=32)

    def build(**kw):
        return build_ram_tagger(cfg=cfg, image_size=32, random_init=True,
                                threshold=0.5,
                                tag_vocab=[f"tag{i}" for i in range(12)],
                                **kw)

    return build


def test_ram_tag_batch_matches_single(rng, tiny_ram_tagger):
    tagger = tiny_ram_tagger()
    frames = _frames(rng, 3)
    single = [tagger(f) for f in frames]
    # random init at threshold 0.5: the parity must be over real tags
    assert any(single), single
    assert tagger.tag_batch(frames) == single
    assert tagger.tag_batch([]) == []


def test_ram_tag_batch_sharded_matches_single(rng, tiny_ram_tagger):
    mesh = make_mesh(n_data=4, n_model=1)
    tagger = tiny_ram_tagger(serving_mesh=mesh)
    frames = _frames(rng, 3)          # pads 3 -> 4 over the mesh
    assert tagger.tag_batch(frames) == [tagger(f) for f in frames]


def test_gdino_random_init_grounder(rng):
    """random_init builds the real grounder without a checkpoint (probe /
    bench use); weights-free stays the (None, None) fallback."""
    from instance_based_loc_tpu.models.bert import BertConfig
    from instance_based_loc_tpu.models.gdino import (GDinoConfig,
                                                     build_gdino_grounder)
    from instance_based_loc_tpu.models.swin import SwinConfig

    cfg = GDinoConfig(
        backbone=SwinConfig(backbone_norms=True, embed_dim=24,
                            depths=(1, 1, 2, 1), num_heads=(2, 2, 2, 2)),
        text=BertConfig(hidden_size=64, num_layers=1, num_heads=4,
                        intermediate_size=128),
        img_size=64, d_model=64, num_queries=8,
        encoder_layers=1, decoder_layers=1, ffn_dim=128)
    assert build_gdino_grounder(None, cfg=cfg)(
        np.zeros((8, 8, 3), np.uint8), "chair") == (None, None)
    g = build_gdino_grounder(None, cfg=cfg, random_init=True,
                             box_threshold=0.0)
    rgb = (rng.random((48, 64, 3)) * 255).astype(np.uint8)
    boxes, scores = g(rgb, "chair")
    assert boxes.shape[-1] == 4 and np.isfinite(boxes).all()
    (b2, s2), = g.detect_all(rgb, ["chair"])
    assert np.isfinite(b2).all() and len(b2) == len(s2)


def test_weightsfree_ram_tagger_has_tag_batch():
    from instance_based_loc_tpu.models.ram import build_ram_tagger

    tagger = build_ram_tagger(None)
    assert tagger(np.zeros((8, 8, 3), np.uint8)) == []
    assert tagger.tag_batch([np.zeros((8, 8, 3), np.uint8)] * 2) == [[], []]


@pytest.fixture(scope="module")
def tiny_sam_builder():
    from instance_based_loc_tpu.models.sam import SamConfig, build_sam_segmenter

    cfg = SamConfig(img_size=64, patch_size=16, encoder_dim=32,
                    encoder_depth=2, encoder_heads=4, window_size=2,
                    global_blocks=(1,), prompt_dim=32, decoder_heads=4)

    def build(**kw):
        return build_sam_segmenter(cfg=cfg, max_boxes=4, **kw)

    return build


def _assert_masks_close(got, want, tol=0.02):
    """The vmapped batch program is a different XLA compilation than the
    single-frame program, so logits differ at float-rounding level; on a
    random-init model that flips a few boundary pixels of the >0 threshold.
    Assert near-parity: tiny disagreement fraction, non-degenerate masks."""
    assert got.shape == want.shape
    assert want.any(), "degenerate all-empty masks prove nothing"
    disagree = (got != want).mean()
    assert disagree <= tol, f"mask disagreement {disagree:.4f} > {tol}"


def test_sam_segment_batch_matches_single(rng, tiny_sam_builder):
    segmenter = tiny_sam_builder()
    # uniform frame geometry: the whole batch un-resizes in ONE device
    # program (the common one-camera case)
    frames = _frames(rng, 3, h=40, w=48)
    boxes = [np.array([[4, 4, 30, 30], [10, 8, 40, 36]], np.float32),
             np.array([[2, 2, 20, 20]], np.float32),
             np.array([[1, 1, 30, 30], [5, 5, 25, 25], [8, 2, 30, 18]],
                      np.float32)]
    batched = segmenter.segment_batch(frames, boxes)
    assert segmenter.segment_batch([], []) == []
    for f, b, got in zip(frames, boxes, batched):
        assert got.shape == (len(b),) + f.shape[:2]
        _assert_masks_close(got, segmenter(f, b))


def test_sam_segment_batch_mixed_geometry(rng, tiny_sam_builder):
    """Mixed frame sizes fall back to the host PIL un-resize per frame;
    PIL antialiases its downscale while the device path (reference torch
    F.interpolate semantics) does not, so on a random-init model the >0
    threshold flips more boundary pixels — looser tolerance."""
    segmenter = tiny_sam_builder()
    frames = _frames(rng, 2, h=40, w=48) + _frames(rng, 1, h=32, w=32)
    boxes = [np.array([[4, 4, 30, 30], [10, 8, 40, 36]], np.float32),
             np.array([[2, 2, 20, 20]], np.float32),
             np.array([[1, 1, 30, 30]], np.float32)]
    batched = segmenter.segment_batch(frames, boxes)
    for f, b, got in zip(frames, boxes, batched):
        assert got.shape == (len(b),) + f.shape[:2]
        _assert_masks_close(got, segmenter(f, b), tol=0.06)


def test_sam_segment_batch_sharded_matches_unsharded(rng, tiny_sam_builder):
    """Sharding the frame axis over the mesh must not change the batch
    program's results (same program, partitioned execution)."""
    mesh = make_mesh(n_data=4, n_model=1)
    sharded = tiny_sam_builder(serving_mesh=mesh)
    plain = tiny_sam_builder()
    frames = _frames(rng, 3, h=40, w=48)   # pads 3 -> 4 over the mesh
    boxes = [np.array([[4, 4, 30, 30]], np.float32) for _ in frames]
    batched = sharded.segment_batch(frames, boxes)
    for got, want in zip(batched, plain.segment_batch(frames, boxes)):
        _assert_masks_close(got, want)
    for f, b, got in zip(frames, boxes, batched):
        _assert_masks_close(got, sharded(f, b))


# --------------------------------------------------------------------------- #
# find_batch orchestration (fake stages — same pattern as test_cascade.py)
# --------------------------------------------------------------------------- #
class _FakeStages:
    """Tagger/grounder/segmenter fakes with call counters. Boxes depend on
    the frame's mean intensity so different frames yield different results."""

    def __init__(self):
        self.tag_calls = 0
        self.tag_batch_calls = 0
        self.seg_calls = 0
        self.seg_batch_calls = 0

    def tagger(self, img):
        self.tag_calls += 1
        return ["chair", "table"] if img.mean() > 96 else ["lamp"]

    def tag_batch(self, frames):
        self.tag_batch_calls += 1
        return [["chair", "table"] if f.mean() > 96 else ["lamp"]
                for f in frames]

    def grounder(self, img, keyword):
        if keyword == "lamp":      # one frame grounds nothing at all
            return np.zeros((0, 4), np.float32), np.zeros((0,))
        off = 0.05 if keyword == "chair" else 0.25
        return (np.array([[0.3 + off, 0.3, 0.2, 0.2]], np.float32),
                np.array([0.9]))

    def segmenter(self, img, boxes_xyxy):
        self.seg_calls += 1
        return self._masks(img, boxes_xyxy)

    def segment_batch(self, frames, boxes_list):
        self.seg_batch_calls += 1
        return [self._masks(f, b) for f, b in zip(frames, boxes_list)]

    @staticmethod
    def _masks(img, boxes_xyxy):
        h, w = img.shape[:2]
        out = np.zeros((len(boxes_xyxy), h, w), bool)
        for i, (x1, y1, x2, y2) in enumerate(boxes_xyxy.astype(int)):
            out[i, y1:y2, x1:x2] = True
        return out


def _assert_detections_equal(a: Detections, b: Detections):
    assert a.phrases == b.phrases
    np.testing.assert_array_equal(a.boxes_xyxy, b.boxes_xyxy)
    np.testing.assert_array_equal(a.masks, b.masks)
    assert len(a.crops) == len(b.crops)
    for ca, cb in zip(a.crops, b.crops):
        np.testing.assert_array_equal(ca, cb)


def test_find_batch_matches_find(rng):
    frames = [(rng.random((40, 48, 3)) * 255).astype(np.uint8),
              np.full((40, 48, 3), 20, np.uint8),       # tags only "lamp"
              (rng.random((32, 40, 3)) * 255).astype(np.uint8)]

    st = _FakeStages()
    det = CascadeDetector(st.tagger, st.grounder, st.segmenter)
    singles = [det.find(f, consider_floor=False) for f in frames]
    assert len(singles[0]) > 0 and len(singles[1]) == 0

    # batched stages present -> one tag_batch + one segment_batch call
    bt = _FakeStages()

    def tag(img):
        return bt.tagger(img)

    def seg(img, boxes):
        return bt.segmenter(img, boxes)

    tag.tag_batch = bt.tag_batch
    seg.segment_batch = bt.segment_batch
    det_b = CascadeDetector(tag, bt.grounder, seg)
    batched = det_b.find_batch(frames, consider_floor=False)
    for s, b in zip(singles, batched):
        _assert_detections_equal(s, b)
    assert bt.tag_batch_calls == 1 and bt.tag_calls == 0
    assert bt.seg_batch_calls == 1 and bt.seg_calls == 0

    # no batched stages -> falls back to per-frame stage calls, same result
    st2 = _FakeStages()
    det_f = CascadeDetector(st2.tagger, st2.grounder, st2.segmenter)
    for s, b in zip(singles, det_f.find_batch(frames, consider_floor=False)):
        _assert_detections_equal(s, b)
    assert st2.tag_calls == 3
    assert st2.seg_calls == 2           # the "lamp" frame grounds nothing


def test_find_batch_respects_captions(rng):
    st = _FakeStages()
    frames = [(rng.random((40, 48, 3)) * 255).astype(np.uint8)] * 2

    def tag(img):
        return st.tagger(img)
    tag.tag_batch = st.tag_batch
    det = CascadeDetector(tag, st.grounder, st.segmenter)
    out = det.find_batch(frames, consider_floor=False,
                         captions=[["chair"], ["table"]])
    assert st.tag_calls == 0 and st.tag_batch_calls == 0
    assert out[0].phrases == ["chair"] and out[1].phrases == ["table"]
    # mixed: one explicit caption, one tagged
    out = det.find_batch(frames, consider_floor=False,
                         captions=[["chair"], None])
    assert st.tag_batch_calls == 1
    assert out[0].phrases == ["chair"]


def test_build_memory_detect_batch_parity(tmp_path, rng):
    """build_memory --detect-batch F: chunked detection (find_batch) must
    produce the same memory as the per-frame path, and detectors without
    find_batch (ColorRegionDetector) must work under any chunk size."""
    from instance_based_loc_tpu.cli.localisation_trial import (
        apply_convention_defaults, build_memory, make_parser)
    from instance_based_loc_tpu.data.loader import RGBDDataset
    from instance_based_loc_tpu.data.synthetic import (default_scene,
                                                       write_tum_dataset)
    from instance_based_loc_tpu.memory import ColorRegionDetector, ObjectMemory
    from instance_based_loc_tpu.models.embedders import get_embedder

    scene = default_scene(num_objects=4, seed=5)
    data = str(tmp_path / "tum")
    write_tum_dataset(data, scene=scene, n_views=5, height=120, width=160,
                      focal_length=150.0)

    def run(detect_batch, detector):
        args = apply_convention_defaults(make_parser().parse_args([
            "--convention", "tum", "--data-path", data,
            "--embeddings", "color", "--detector", "color",
            "-e", "4", "--consider-floor", "--min-points", "150",
            "--no-outlier-removal", "--focal-length", "150",
            "--sampling-period", "1", "--downsample-voxel-size", "0.02",
            "--dbscan-eps", "0.1", "--dbscan-min-points", "40",
            "--detect-batch", str(detect_batch), "--quiet"]))
        ds = RGBDDataset(data_path=data, evaluation_indices=[4],
                         convention="tum", focal_length_x=150.0,
                         focal_length_y=150.0)
        memory = ObjectMemory(
            detector=detector, camera_focal_lenth_x=150.0,
            camera_focal_lenth_y=150.0,
            get_embeddings_func=get_embedder("color"), log_enabled=False)
        build_memory(args, memory, ds, None, recluster="dbscan")
        return memory

    def make_detector(wrap_batch):
        base = ColorRegionDetector(min_area=80,
                                   floor_colors=[scene.floor_color])
        if not wrap_batch:
            return base
        calls = []

        class Batched:
            def find(self, rgb, consider_floor):
                return base.find(rgb, consider_floor)

            def find_batch(self, frames, consider_floor):
                calls.append(len(frames))
                return [base.find(f, consider_floor) for f in frames]

        det = Batched()
        det.calls = calls
        return det

    m1 = run(1, make_detector(False))
    det_b = make_detector(True)
    m2 = run(2, det_b)
    assert det_b.calls == [2, 2]         # 4 env frames in chunks of 2
    m3 = run(2, make_detector(False))    # no find_batch: per-frame fallback
    for other in (m2, m3):
        assert len(other.memory) == len(m1.memory)
        for a, b in zip(m1.memory, other.memory):
            np.testing.assert_allclose(a.centroid, b.centroid, atol=1e-6)


def test_find_stream_matches_find_batch(rng):
    """The software-pipelined stream (dispatch skew across chunks) must be
    result-identical to find_batch — the pipeline reorders dispatch, never
    computation inputs. Covers: multi-chunk streams, a chunk with zero
    groundings (no segment dispatch), and a ragged final chunk."""
    frames = [(rng.random((40, 48, 3)) * 255).astype(np.uint8)
              for _ in range(5)]
    frames[2] = np.full((40, 48, 3), 20, np.uint8)   # tags only "lamp"

    st = _FakeStages()

    def tag(img):
        return st.tagger(img)

    def seg(img, boxes):
        return st.segmenter(img, boxes)

    tag.tag_batch = st.tag_batch
    tag.tag_batch_dispatch = lambda fs: ("h", st.tag_batch(fs))
    tag.tag_batch_finish = lambda h: h[1]
    seg.segment_batch = st.segment_batch
    seg.segment_batch_dispatch = lambda fs, bs: ("h", st.segment_batch(fs, bs))
    seg.segment_batch_finish = lambda h: h[1]

    det = CascadeDetector(tag, st.grounder, seg)
    want = det.find_batch(frames, consider_floor=False)
    got = det.find_stream(frames, consider_floor=False, chunk=2)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        _assert_detections_equal(g, w)

    # all-empty stream chunk ordering: every frame grounds nothing
    empty_frames = [np.full((40, 48, 3), 20, np.uint8)] * 3
    got = det.find_stream(empty_frames, consider_floor=False, chunk=2)
    assert all(len(g) == 0 for g in got)


def test_find_stream_real_tiny_models(rng, tiny_ram_tagger, tiny_sam_builder):
    """find_stream through the REAL tagger/segmenter dispatch/finish halves
    (device handles, not host fakes) equals find_batch."""
    tagger = tiny_ram_tagger()
    segmenter = tiny_sam_builder()

    def grounder(img, keyword):
        return (np.array([[0.5, 0.5, 0.4, 0.4]], np.float32),
                np.array([0.9]))

    det = CascadeDetector(tagger, grounder, segmenter)
    frames = [(rng.random((24, 24, 3)) * 255).astype(np.uint8)
              for _ in range(3)]
    want = det.find_batch(frames, consider_floor=False)
    got = det.find_stream(frames, consider_floor=False, chunk=2)
    for g, w in zip(got, want):
        _assert_detections_equal(g, w)
