"""Deployment-path probe for the perception cascade: measures the REAL
`CascadeDetector.find_batch` serving path — raw u8 frames in, host
orchestration (caption filter, box dedup, crops), u8 upload, device-side
preprocessing fused into each stage's program, device compute, mask
fetch — unlike bench.py's cascade metric, which times the device programs
alone on device-resident inputs.

Stage composition is pinned so every frame exercises all three stages at
reference deployment scale (RAM Swin-L@384, GroundingDINO SwinB@800,
SAM ViT-H@1024): the tagger and grounder run their REAL random-init
compute, then the probe substitutes fixed keywords / canned boxes (random
logits would otherwise yield empty or degenerate detections and skip
stages).

Run on the tunneled chip: python -u perf/cascade_deploy_probe.py
(one TPU job at a time; remote compiles take minutes — be patient.)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

from instance_based_loc_tpu.models.cascade import CascadeDetector
from instance_based_loc_tpu.models.gdino import build_gdino_grounder
from instance_based_loc_tpu.models.ram import build_ram_tagger
from instance_based_loc_tpu.models.sam import SamConfig, build_sam_segmenter

CANNED_BOXES = np.array([[0.40, 0.40, 0.30, 0.30],
                         [0.65, 0.60, 0.20, 0.25],
                         [0.30, 0.70, 0.15, 0.20],
                         [0.70, 0.30, 0.20, 0.15]], np.float32)


def build_probe_detector(tiny: bool = False):
    """tiny=True shrinks every model (CPU smoke test of the probe's own
    orchestration; real measurements use the full deployment shapes)."""
    tag_kw, gd_kw, sam_cfg = {}, {}, SamConfig()
    if tiny:
        from instance_based_loc_tpu.models.gdino import GDinoConfig
        from instance_based_loc_tpu.models.ram import RamConfig
        from instance_based_loc_tpu.models.swin import SwinConfig
        tag_kw = dict(cfg=RamConfig(
            backbone=SwinConfig(img_size=32, patch_size=4, embed_dim=8,
                                depths=(1, 1), num_heads=(1, 2), window=4,
                                adapt_window=True),
            num_tags=12, label_dim=16, hidden=24, heads=2, layers=2,
            mlp_dim=32), image_size=32,
            tag_vocab=[f"tag{i}" for i in range(12)])
        from instance_based_loc_tpu.models.bert import BertConfig
        gd_kw = dict(cfg=GDinoConfig(
            backbone=SwinConfig(backbone_norms=True, embed_dim=24,
                                depths=(1, 1, 2, 1), num_heads=(2, 2, 2, 2)),
            text=BertConfig(hidden_size=64, num_layers=1, num_heads=4,
                            intermediate_size=128),
            img_size=64, d_model=64, num_queries=8,
            encoder_layers=1, decoder_layers=1, ffn_dim=128))
        sam_cfg = SamConfig(img_size=64, patch_size=16, encoder_dim=32,
                            encoder_depth=2, encoder_heads=4, window_size=2,
                            global_blocks=(1,), prompt_dim=32,
                            decoder_heads=4)

    raw_tag = build_ram_tagger(random_init=True, **tag_kw)

    def tagger(img):
        raw_tag(img)                       # real RAM compute
        return ["chair", "table"]

    def tag_batch(frames):
        raw_tag.tag_batch(frames)          # real batched RAM compute
        return [["chair", "table"]] * len(frames)

    tagger.tag_batch = tag_batch

    raw_gdino = build_gdino_grounder(random_init=True, **gd_kw)

    def detect_all(img, keywords):
        raw_gdino.detect_all(img, keywords)   # real GDINO compute
        outs = [(np.zeros((0, 4), np.float32), np.zeros((0,), np.float32))
                for _ in keywords]
        outs[0] = (CANNED_BOXES, np.ones((len(CANNED_BOXES),), np.float32))
        return outs

    def grounder(img, keyword):
        boxes, scores = raw_gdino(img, keyword)
        return CANNED_BOXES, np.ones((len(CANNED_BOXES),), np.float32)

    grounder.detect_all = detect_all
    grounder.multi_phrase = True

    # reference deployment scale: SAM ViT-H (SamConfig's default; the
    # builder's own weights-free default is ViT-B)
    segmenter = build_sam_segmenter(cfg=sam_cfg, max_boxes=8)
    return CascadeDetector(tagger, grounder, segmenter)


def main():
    print(f"devices: {jax.devices()}", flush=True)
    tiny = os.environ.get("IBL_PROBE_TINY") == "1"
    det = build_probe_detector(tiny=tiny)
    rng = np.random.default_rng(0)
    hw = (48, 64) if tiny else (480, 640)
    frames = [(rng.random(hw + (3,)) * 255).astype(np.uint8)
              for _ in range(8)]

    for chunk in (1, 4):
        stream = [frames[i:i + chunk] for i in range(0, len(frames), chunk)]
        # pass 1 pays the remote compiles
        t0 = time.perf_counter()
        for ch in stream:
            det.find_batch(ch, consider_floor=False)
        print(f"chunk={chunk} compile+run pass: "
              f"{time.perf_counter() - t0:.1f} s", flush=True)
        best = np.inf
        for _ in range(2):
            t0 = time.perf_counter()
            n_det = 0
            for ch in stream:
                for d in det.find_batch(ch, consider_floor=False):
                    n_det += len(d)
            best = min(best, (time.perf_counter() - t0) / len(frames))
        print(f"chunk={chunk}: {best * 1000:.1f} ms/frame = "
              f"{1.0 / best:.3f} fps ({n_det // len(frames)} det/frame)",
              flush=True)


if __name__ == "__main__":
    main()
