"""clip_loc class-vocabulary detector (YOLOv8 role — reference
yolo_utils.py:27-57 filters) and per-convention CLI defaults."""

import numpy as np

from instance_based_loc_tpu.models.class_detector import (
    ClassVocabularyDetector, COCO_CLASSES)


def test_coco_vocabulary():
    assert len(COCO_CLASSES) == 80
    assert COCO_CLASSES[0] == "person" and COCO_CLASSES[-1] == "toothbrush"


def test_conf_and_area_filters():
    h, w = 100, 200

    def grounder(img, keyword):
        if keyword == "chair":
            # big+confident (keep), confident-but-tiny (drop area<=1%),
            # big-but-unconfident (drop conf<=0.1)
            return (np.array([[0.5, 0.5, 0.4, 0.4],
                              [0.5, 0.5, 0.05, 0.02],
                              [0.3, 0.3, 0.5, 0.5]], np.float32),
                    np.array([0.9, 0.95, 0.05], np.float32))
        if keyword == "cup":
            return (np.array([[0.25, 0.25, 0.2, 0.3]], np.float32),
                    np.array([0.2], np.float32))
        return None, None

    det = ClassVocabularyDetector(grounder, classes=["chair", "cup", "dog"])
    out = det.find(np.zeros((h, w, 3), np.uint8))
    assert len(out) == 2
    assert out.phrases == ["chair", "cup"]
    b = out.boxes_xyxy[0]
    np.testing.assert_allclose(b, [0.3 * w, 0.3 * h, 0.7 * w, 0.7 * h],
                               atol=1e-4)
    assert out.masks.shape == (2, h, w)
    assert out.masks[0].any()


def test_empty_when_nothing_passes():
    det = ClassVocabularyDetector(lambda img, kw: (None, None),
                                  classes=["chair"])
    out = det.find(np.zeros((50, 50, 3), np.uint8))
    assert len(out) == 0


def test_convention_defaults_fill_only_unset():
    from instance_based_loc_tpu.cli.localisation_trial import (
        make_parser, apply_convention_defaults, CONVENTION_DEFAULTS)
    args = make_parser().parse_args(
        ["--convention", "tum", "--data-path", "/tmp/x"])
    args = apply_convention_defaults(args)
    assert args.focal_length_x == 525.0
    assert args.sampling_period == 30
    assert args.fpfh_local_dist_factor == 1.5

    args = make_parser().parse_args(
        ["--convention", "tum", "--data-path", "/tmp/x",
         "--focal-length", "111", "--sampling-period", "7"])
    args = apply_convention_defaults(args)
    assert args.focal_length_x == 111.0          # explicit flag wins
    assert args.focal_length_y == 111.0
    assert args.sampling_period == 7
    assert set(CONVENTION_DEFAULTS) == {"tum", "real", "8room", "hm3d",
                                        "synth"}


def test_depth_region_detector_segments_geometry():
    """Synthetic room: floor plane + two boxes at different depths; the
    geometric detector must separate the boxes and tag the floor."""
    from instance_based_loc_tpu.memory.detection import DepthRegionDetector
    h, w, f = 120, 160, 100.0
    depth = np.zeros((h, w), np.float32)
    # floor: lower half, depth grows towards the bottom edge (camera level)
    ys = np.arange(h, dtype=np.float32)
    for r in range(h // 2, h):
        depth[r, :] = 2.0 * f / max(ys[r] - h / 2, 1)   # y*z/f = const height
    depth[:h // 2, :] = 6.0                              # far wall
    depth[30:70, 20:60] = 2.0                            # box A
    depth[40:80, 100:140] = 3.0                          # box B
    rgb = np.full((h, w, 3), 128, np.uint8)
    det = DepthRegionDetector(f, min_area=300, floor_area_frac=0.1)
    out = det.find(rgb, consider_floor=True, depth=depth)
    assert len(out) >= 2
    # boxes A and B are separate detections
    centers = [(int((b[0] + b[2]) / 2), int((b[1] + b[3]) / 2))
               for b in out.boxes_xyxy]
    assert any(abs(cx - 40) < 15 for cx, cy in centers)
    assert any(abs(cx - 120) < 15 for cx, cy in centers)


def test_depth_region_detector_empty_without_depth():
    from instance_based_loc_tpu.memory.detection import DepthRegionDetector
    det = DepthRegionDetector(100.0)
    out = det.find(np.zeros((50, 50, 3), np.uint8), consider_floor=True)
    assert len(out) == 0
