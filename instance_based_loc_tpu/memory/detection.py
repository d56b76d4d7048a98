"""Detection interface for the perception cascade (reference layer L2).

The reference's `ObjectFinder` (object_memory/object_finder.py) is a
classmethod singleton wrapping RAM tagging -> caption filter -> GroundingDINO
boxes -> SAM masks, returning `(grounded_crops, boxes_xyxy, masks, phrases)`
(object_finder.py:259-299). Here detection is a pluggable object with one
method:

    detector.find(rgb_image, consider_floor) -> Detections

so the memory core is decoupled from any specific model stack. Two
implementations live in this package:

* `ColorRegionDetector` — a weights-free geometric detector (color
  quantisation + connected components) used by the synthetic fixture tests
  and as the fallback when no model weights are available. It plays the role
  of the reference's `dummy_get_embs` testing pattern, but for detection.
* the neural cascade in `models/` (RAM/GroundingDINO/SAM flax ports) exposes
  the same interface.
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass
class Detections:
    """One frame's detections, batched (M = number of instances)."""
    crops: list[np.ndarray]        # M grounded RGB crops (ragged sizes)
    boxes_xyxy: np.ndarray         # (M, 4) pixel xyxy
    masks: np.ndarray              # (M, H, W) bool
    phrases: list[str]             # M phrase strings

    def __len__(self) -> int:
        return len(self.phrases)

    @staticmethod
    def empty(h: int = 1, w: int = 1) -> "Detections":
        return Detections([], np.zeros((0, 4), np.float32),
                          np.zeros((0, h, w), bool), [])


class ColorRegionDetector:
    """Weights-free instance detector for fixture scenes: quantise colors,
    split into connected components, emit one detection per large region.

    `floor_colors` marks colors whose regions get the phrase "floor" so the
    floor-routing path (`check_if_floor` -> ObjectMemory.floors) is exercised
    exactly as with the neural cascade.
    """

    def __init__(self, min_area: int = 120, quant: float = 32.0,
                 floor_colors: list[tuple] | None = None,
                 background_color: tuple = (0, 0, 0)):
        self.min_area = min_area
        self.quant = quant
        self.floor_colors = [np.asarray(c, np.float32) for c in (floor_colors or [])]
        self.background = np.asarray(background_color, np.float32)

    def find(self, rgb_image: np.ndarray, consider_floor: bool) -> Detections:
        from scipy import ndimage

        img = np.asarray(rgb_image)[..., :3].astype(np.float32)
        h, w = img.shape[:2]
        keys = np.floor(img / self.quant).astype(np.int32)
        flat = keys[..., 0] * 10000 + keys[..., 1] * 100 + keys[..., 2]

        crops, boxes, masks, phrases = [], [], [], []
        for key in np.unique(flat):
            region = flat == key
            if region.sum() < self.min_area:
                continue
            mean_color = img[region].mean(0)
            if np.linalg.norm(mean_color - self.background) < self.quant / 2:
                continue
            is_floor = any(np.linalg.norm(mean_color - fc * 255.0) < self.quant
                           for fc in self.floor_colors)
            if is_floor and not consider_floor:
                continue
            labeled, num = ndimage.label(region)
            for comp in range(1, num + 1):
                mask = labeled == comp
                if mask.sum() < self.min_area:
                    continue
                ys, xs = np.nonzero(mask)
                x1, x2 = xs.min(), xs.max() + 1
                y1, y2 = ys.min(), ys.max() + 1
                crops.append(np.ascontiguousarray(rgb_image[y1:y2, x1:x2]))
                boxes.append([x1, y1, x2, y2])
                masks.append(mask)
                phrases.append("floor" if is_floor
                               else f"object_{int(mean_color[0]) // 16}_{int(mean_color[1]) // 16}_{int(mean_color[2]) // 16}")

        if not crops:
            return Detections.empty(h, w)
        return Detections(crops, np.asarray(boxes, np.float32),
                          np.stack(masks), phrases)
