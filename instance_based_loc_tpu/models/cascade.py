"""The perception cascade: open-set tagging -> caption filtering -> grounded
box detection (per keyword, with cross-keyword dedup) -> box-prompted
segmentation -> grounded crops.

Reference: `object_memory/object_finder.py` (ObjectFinder classmethod
singleton). Here the cascade is an object with three pluggable stages:

    tagger(rgb) -> list[str]                         (RAM's role, :272-277)
    grounder(rgb, keyword) -> (boxes_cxcywh_norm, scores)
                                                     (GroundingDINO, :147-219)
    segmenter(rgb, boxes_xyxy) -> (M, H, W) bool     (SAM, :222-256)

so the neural backends (flax ports in models/sam.py etc.) and the
weights-free test fakes run through identical orchestration. The dedup rule
reproduces the reference exactly (object_finder.py:158-207): a box is a
duplicate iff its min-area-normalized overlap with an accepted box exceeds
`intersection_threshold` AND the min/max area ratio exceeds `size_threshold`.
"""

from __future__ import annotations

import numpy as np

from ..memory.detection import Detections
from ..memory.phrases import filter_caption


DEFAULTS = dict(
    box_threshold=0.35,          # object_finder.py setup: gd box 0.35
    text_threshold=0.55,         # text 0.55
    intersection_threshold=0.7,  # box-merge overlap 0.7
    size_threshold=0.75,         # area-ratio 0.75
)


def box_min_area_overlap(rect1, rect2) -> float:
    """Overlap normalized by the SMALLER box's area — the reference's
    'get_box_iou' (object_finder.py:158-170), boxes as (cx, cy, w, h)."""
    a1 = rect1[2] * rect1[3]
    a2 = rect2[2] * rect2[3]
    tl = (max(rect1[0], rect2[0]), max(rect1[1], rect2[1]))
    br = (min(rect1[0] + rect1[2], rect2[0] + rect2[2]),
          min(rect1[1] + rect1[3], rect2[1] + rect2[3]))
    if br[0] <= tl[0] or br[1] <= tl[1]:
        return 0.0
    overlap = abs((br[0] - tl[0]) * (br[1] - tl[1]))
    return overlap / min(a1, a2)


def box_area_ratio(rect1, rect2) -> float:
    a1 = rect1[2] * rect1[3]
    a2 = rect2[2] * rect2[3]
    return min(a1, a2) / max(a1, a2)


def cxcywh_to_xyxy(boxes: np.ndarray, width: int, height: int) -> np.ndarray:
    """Normalized cxcywh -> pixel xyxy (gd_box_cxcywh_to_xyxy * [W,H,W,H])."""
    cx, cy, w, h = boxes.T
    return np.stack([(cx - w / 2) * width, (cy - h / 2) * height,
                     (cx + w / 2) * width, (cy + h / 2) * height], axis=1)


class CascadeDetector:
    """RAM -> GroundingDINO -> SAM orchestration with pluggable stages."""

    def __init__(self, tagger, grounder, segmenter,
                 intersection_threshold: float = DEFAULTS["intersection_threshold"],
                 size_threshold: float = DEFAULTS["size_threshold"],
                 log_enabled: bool = False):
        self.tagger = tagger
        self.grounder = grounder
        self.segmenter = segmenter
        self.intersection_threshold = intersection_threshold
        self.size_threshold = size_threshold
        self.log_enabled = log_enabled

    def _keywords(self, caption, consider_floor: bool) -> list[str]:
        keywords = filter_caption(caption)
        if consider_floor:
            keywords += ["floor", "ground"]
        if self.log_enabled:
            print(f"Filtered caption post tagging: {keywords}")
        return keywords

    def _ground(self, img: np.ndarray, keywords: list[str]):
        """Per-keyword grounding with cross-keyword dedup
        (object_finder.py:180-207) -> (kept cxcywh boxes, kept phrases)."""
        if getattr(self.grounder, "multi_phrase", False):
            # ONE multi-phrase forward for all keywords (TPU-fast path;
            # dedup semantics below are identical — keyword order preserved)
            per_keyword = self.grounder.detect_all(img,
                                                   [str(w) for w in keywords])
        else:
            per_keyword = [self.grounder(img, str(w)) for w in keywords]
        kept_boxes: list[np.ndarray] = []
        kept_phrases: list[str] = []
        for word, (boxes, _scores) in zip(keywords, per_keyword):
            if boxes is None or len(boxes) == 0:
                continue
            for box in np.asarray(boxes):
                unique = True
                for prev in kept_boxes:
                    if (box_min_area_overlap(box, prev) > self.intersection_threshold
                            and box_area_ratio(box, prev) > self.size_threshold):
                        unique = False
                        break
                if unique:
                    kept_boxes.append(box)
                    kept_phrases.append(word)
        return kept_boxes, kept_phrases

    @staticmethod
    def _pixel_boxes(kept_boxes, w: int, h: int) -> np.ndarray:
        boxes_xyxy = cxcywh_to_xyxy(np.stack(kept_boxes), w, h)
        boxes_xyxy[:, 0::2] = np.clip(boxes_xyxy[:, 0::2], 0, w)
        boxes_xyxy[:, 1::2] = np.clip(boxes_xyxy[:, 1::2], 0, h)
        return boxes_xyxy

    @staticmethod
    def _detections(img, boxes_xyxy, masks, phrases) -> Detections:
        crops = [img[int(b[1]):max(int(b[3]), int(b[1]) + 1),
                     int(b[0]):max(int(b[2]), int(b[0]) + 1)]
                 for b in boxes_xyxy]
        return Detections(crops, boxes_xyxy.astype(np.float32),
                          np.asarray(masks).astype(bool), phrases)

    def find(self, rgb_image: np.ndarray, consider_floor: bool,
             caption: list[str] | None = None) -> Detections:
        img = np.asarray(rgb_image)
        h, w = img.shape[:2]

        if caption is None or len(caption) == 0:
            caption = list(self.tagger(img))
        keywords = self._keywords(caption, consider_floor)
        kept_boxes, kept_phrases = self._ground(img, keywords)
        if not kept_boxes:
            return Detections.empty(h, w)

        boxes_xyxy = self._pixel_boxes(kept_boxes, w, h)
        masks = self.segmenter(img, boxes_xyxy)
        return self._detections(img, boxes_xyxy, masks, kept_phrases)

    def find_batch(self, frames, consider_floor: bool,
                   captions=None) -> list[Detections]:
        """Batched `find` over a chunk of frames — per-frame results are
        identical (the batch axis never mixes frames), but the tagger runs
        the whole chunk as one device program (`tag_batch`) and the
        segmenter runs every non-empty frame as one vmapped program
        (`segment_batch`); grounding stays per-frame (GroundingDINO
        frame-batching measured flat — perf/cascade_batch_probe.py). This is
        the memory-build analog of `localise_many`'s chunked serving."""
        frames = [np.asarray(f) for f in frames]
        caps = (list(captions) if captions is not None
                else [None] * len(frames))
        need = [i for i, c in enumerate(caps) if c is None or len(c) == 0]
        if need:
            if hasattr(self.tagger, "tag_batch"):
                tagged = self.tagger.tag_batch([frames[i] for i in need])
            else:
                tagged = [self.tagger(frames[i]) for i in need]
            for i, tags in zip(need, tagged):
                caps[i] = list(tags)

        results: list[Detections | None] = [None] * len(frames)
        pend: list[tuple[int, np.ndarray, list[str]]] = []
        for i, (img, cap) in enumerate(zip(frames, caps)):
            h, w = img.shape[:2]
            keywords = self._keywords(cap, consider_floor)
            kept_boxes, kept_phrases = self._ground(img, keywords)
            if not kept_boxes:
                results[i] = Detections.empty(h, w)
            else:
                pend.append((i, self._pixel_boxes(kept_boxes, w, h),
                             kept_phrases))

        if pend:
            if hasattr(self.segmenter, "segment_batch"):
                masks_list = self.segmenter.segment_batch(
                    [frames[i] for i, _, _ in pend],
                    [b for _, b, _ in pend])
            else:
                masks_list = [self.segmenter(frames[i], b)
                              for i, b, _ in pend]
            for (i, boxes_xyxy, phrases), masks in zip(pend, masks_list):
                results[i] = self._detections(frames[i], boxes_xyxy, masks,
                                              phrases)
        return results

    def find_stream(self, frames, consider_floor: bool,
                    chunk: int = 4) -> list[Detections]:
        """Software-pipelined find over a frame stream (VERDICT r4 item 4:
        "the cascade is a pipeline — serve it like one"). find_batch runs
        its three stages strictly in sequence, so every host fetch/prep
        (RAM tag decode -> keyword filter, GDINO box fetch -> SAM prompt
        prep) leaves the device idle — ~2-3 tunnel round-trips per chunk.
        Here chunk i+1's tagger program is dispatched BEFORE chunk i is
        grounded, and chunk i's segmenter program is fetched only after
        chunk i+1's work is queued: jax dispatch is async, so the device
        always has a program in flight while the host decodes.

        Per-frame results are bit-identical to find_batch (the pipeline
        reorders dispatch, never computation inputs)."""
        frames = [np.asarray(f) for f in frames]
        if not frames:
            return []
        can_pipeline = (hasattr(self.tagger, "tag_batch_dispatch")
                        and hasattr(self.segmenter, "segment_batch_dispatch"))
        if not can_pipeline:
            return self.find_batch(frames, consider_floor)

        chunks = [frames[i:i + chunk] for i in range(0, len(frames), chunk)]
        results: list[Detections | None] = []
        tag_h = self.tagger.tag_batch_dispatch(chunks[0])
        sam_pending = None   # (pend, chunk_frames, handle, base_index)
        for ci, cframes in enumerate(chunks):
            if ci + 1 < len(chunks):   # keep the device fed
                next_tag_h = self.tagger.tag_batch_dispatch(chunks[ci + 1])
            tags = self.tagger.tag_batch_finish(tag_h)

            chunk_res: list[Detections | None] = [None] * len(cframes)
            pend = []
            for i, (img, cap) in enumerate(zip(cframes, tags)):
                h, w = img.shape[:2]
                keywords = self._keywords(list(cap), consider_floor)
                kept_boxes, kept_phrases = self._ground(img, keywords)
                if not kept_boxes:
                    chunk_res[i] = Detections.empty(h, w)
                else:
                    pend.append((i, self._pixel_boxes(kept_boxes, w, h),
                                 kept_phrases))

            sam_h = (self.segmenter.segment_batch_dispatch(
                [cframes[i] for i, _, _ in pend], [b for _, b, _ in pend])
                if pend else None)

            if sam_pending is not None:
                p_pend, p_frames, p_h, p_res = sam_pending
                for (i, boxes_xyxy, phrases), masks in zip(
                        p_pend, self.segmenter.segment_batch_finish(p_h)):
                    p_res[i] = self._detections(p_frames[i], boxes_xyxy,
                                                masks, phrases)
                results.extend(p_res)
            sam_pending = (pend, cframes, sam_h, chunk_res) \
                if sam_h is not None else None
            if sam_h is None:
                results.extend(chunk_res)
            if ci + 1 < len(chunks):
                tag_h = next_tag_h
        if sam_pending is not None:
            p_pend, p_frames, p_h, p_res = sam_pending
            for (i, boxes_xyxy, phrases), masks in zip(
                    p_pend, self.segmenter.segment_batch_finish(p_h)):
                p_res[i] = self._detections(p_frames[i], boxes_xyxy,
                                            masks, phrases)
            results.extend(p_res)
        return results


def build_cascade_detector(ram_checkpoint: str | None = None,
                           gdino_checkpoint: str | None = None,
                           sam_checkpoint: str | None = None,
                           gdino_vocab: str | None = None,
                           ram_tag_list: str | None = None,
                           serving_mesh=None,
                           **kwargs) -> CascadeDetector:
    """Assemble the neural cascade: RAM tagger (models/ram.py) ->
    GroundingDINO-style grounder (models/gdino.py) -> SAM segmenter
    (models/sam.py). Without checkpoints the flax models run randomly
    initialized or weights-free (no pretrained weights are downloadable in
    this environment): the tagger returns [] (pass explicit captions), the
    grounder falls back to a single full-image proposal, SAM still produces
    structural masks. Pass local checkpoint paths for real deployments.

    `serving_mesh` enables SPMD batch serving for `find_batch`: the RAM and
    SAM frame batches shard over the mesh "data" axis
    (parallel/cascade_serving.py); GroundingDINO stays per-frame."""
    from .sam import build_sam_segmenter
    from .ram import build_ram_tagger
    from .gdino import build_gdino_grounder

    segmenter = build_sam_segmenter(sam_checkpoint, serving_mesh=serving_mesh)
    ram_tagger = build_ram_tagger(ram_checkpoint, tag_list_path=ram_tag_list,
                                  serving_mesh=serving_mesh)
    gdino = (build_gdino_grounder(gdino_checkpoint, vocab_path=gdino_vocab)
             if gdino_checkpoint else None)

    def tagger(img):
        tags = ram_tagger(img)
        return tags if tags else ["object"]

    tagger.tag_batch = lambda frames: [
        tags if tags else ["object"]
        for tags in ram_tagger.tag_batch(frames)]

    def grounder(img, keyword):
        if gdino is not None:
            boxes, scores = gdino(img, keyword)
            if boxes is not None:
                return boxes, scores
        # weights-free fallback: one near-full-image proposal
        return np.array([[0.5, 0.5, 0.9, 0.9]], np.float32), np.array([1.0])

    if gdino is not None and getattr(gdino, "multi_phrase", False):
        grounder.detect_all = gdino.detect_all
        grounder.multi_phrase = True

    return CascadeDetector(tagger, grounder, segmenter, **kwargs)
