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

    def find(self, rgb_image: np.ndarray, consider_floor: bool,
             caption: list[str] | None = None) -> Detections:
        img = np.asarray(rgb_image)
        h, w = img.shape[:2]

        if caption is None or len(caption) == 0:
            caption = list(self.tagger(img))
        keywords = filter_caption(caption)
        if consider_floor:
            keywords += ["floor", "ground"]
        if self.log_enabled:
            print(f"Filtered caption post tagging: {keywords}")

        # per-keyword grounding with cross-keyword dedup (object_finder.py:180-207)
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

        if not kept_boxes:
            return Detections.empty(h, w)

        boxes_xyxy = cxcywh_to_xyxy(np.stack(kept_boxes), w, h)
        boxes_xyxy[:, 0::2] = np.clip(boxes_xyxy[:, 0::2], 0, w)
        boxes_xyxy[:, 1::2] = np.clip(boxes_xyxy[:, 1::2], 0, h)
        masks = np.asarray(self.segmenter(img, boxes_xyxy)).astype(bool)

        crops = [img[int(b[1]):max(int(b[3]), int(b[1]) + 1),
                     int(b[0]):max(int(b[2]), int(b[0]) + 1)]
                 for b in boxes_xyxy]
        return Detections(crops, boxes_xyxy.astype(np.float32), masks,
                          kept_phrases)


def build_cascade_detector(ram_checkpoint: str | None = None,
                           gdino_checkpoint: str | None = None,
                           sam_checkpoint: str | None = None,
                           gdino_vocab: str | None = None,
                           ram_tag_list: str | None = None,
                           **kwargs) -> CascadeDetector:
    """Assemble the neural cascade: RAM tagger (models/ram.py) ->
    GroundingDINO-style grounder (models/gdino.py) -> SAM segmenter
    (models/sam.py). Without checkpoints the flax models run randomly
    initialized or weights-free (no pretrained weights are downloadable in
    this environment): the tagger returns [] (pass explicit captions), the
    grounder falls back to a single full-image proposal, SAM still produces
    structural masks. Pass local checkpoint paths for real deployments."""
    from .sam import build_sam_segmenter
    from .ram import build_ram_tagger
    from .gdino import build_gdino_grounder

    segmenter = build_sam_segmenter(sam_checkpoint)
    ram_tagger = build_ram_tagger(ram_checkpoint, tag_list_path=ram_tag_list)
    gdino = (build_gdino_grounder(gdino_checkpoint, vocab_path=gdino_vocab)
             if gdino_checkpoint else None)

    def tagger(img):
        tags = ram_tagger(img)
        return tags if tags else ["object"]

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
