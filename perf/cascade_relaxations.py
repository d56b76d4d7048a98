"""Measure the cascade serving relaxations as OPT-INS with quantified cost
(VERDICT r3 item 3b): GDINO 640-bucketing and SAM sub-1024 canvases against
the parity baseline (GDINO@800 + SAM-H@1024), at full deployment scale.

Uses the synthetic full-scale checkpoints (scripts/gen_fullscale_ckpts.py)
so shapes/FLOPs are exactly deployment's; the *same* weights run at every
size (GDINO weights are size-independent; SAM position tables are
interpolated by the porter), so output deltas between sizes measure the
true cost of the knob, not weight noise.

Reported per config:
  - cascade fps (RAM + GDINO + SAM serialized per frame, chunk=1)
  - GDINO box delta vs baseline: mean |cxcywh| L1 over the 20 top-scoring
    queries (normalized units) + score correlation
  - SAM mask delta vs baseline: mean IoU of the 8 prompted masks

Run ON TPU, ONE tunnel client:  python perf/cascade_relaxations.py
~10 min/config (remote compiles dominate). Results -> PERF.md.
"""

from __future__ import annotations

import os
import time

import numpy as np

CKPT = os.environ.get("IBL_FULLSCALE_CKPTS", "/tmp/ibl_fullscale_ckpts")


def build(gdino_size: int, sam_size: int):
    import dataclasses
    import jax.numpy as jnp
    from instance_based_loc_tpu.models.gdino import (build_gdino_grounder,
                                                     GDinoConfig)
    from instance_based_loc_tpu.models.sam import build_sam_segmenter

    cfg = GDinoConfig(img_size=gdino_size)
    gdino = build_gdino_grounder(
        os.path.join(CKPT, "gdino_swinb_synthetic.bin"),
        cfg=cfg, vocab_path=os.path.join(CKPT, "vocab.txt"))
    os.environ["IBL_SAM_SIZE"] = str(sam_size)
    sam = build_sam_segmenter(os.path.join(CKPT, "sam_vit_h_synthetic.pth"))
    return gdino, sam


def run_config(label, gdino_size, sam_size, frames, boxes_px, n_time=6):
    import jax
    gdino, sam = build(gdino_size, sam_size)
    keywords = ["thing0100", "thing0200", "thing0300"]

    # warm both programs (remote compile)
    t0 = time.perf_counter()
    dets = gdino.detect_all(frames[0], keywords)
    masks = sam(frames[0], boxes_px)
    compile_s = time.perf_counter() - t0

    # per-frame serialized timing
    t0 = time.perf_counter()
    for i in range(n_time):
        dets = gdino.detect_all(frames[i % len(frames)], keywords)
        masks = sam(frames[i % len(frames)], boxes_px)
    dt = (time.perf_counter() - t0) / n_time
    print(f"[{label}] gdino@{gdino_size} sam@{sam_size}: "
          f"{dt * 1000:.1f} ms/frame ({1 / dt:.2f} fps, "
          f"compile {compile_s:.0f}s) [RAM excluded here]")

    # quality probes on frame 0
    all_boxes = np.concatenate([b for b, s in dets]) if dets else np.zeros((0, 4))
    all_scores = np.concatenate([s for b, s in dets]) if dets else np.zeros((0,))
    order = np.argsort(-all_scores)
    return {"label": label, "ms": dt * 1000,
            "boxes": all_boxes[order][:20], "scores": all_scores[order][:20],
            "masks": np.asarray(masks)}


def mask_iou(a, b):
    inter = np.logical_and(a, b).sum(axis=(-2, -1))
    union = np.logical_or(a, b).sum(axis=(-2, -1))
    return np.where(union > 0, inter / np.maximum(union, 1), 1.0)


def main():
    rng = np.random.default_rng(0)
    frames = [rng.integers(0, 255, (480, 640, 3), np.uint8)
              for _ in range(3)]
    boxes_px = np.asarray(
        [[40 + 60 * i, 40 + 40 * i, 200 + 60 * i, 220 + 40 * i]
         for i in range(8)], np.float32)

    configs = [("baseline", 800, 1024), ("gdino640", 640, 1024),
               ("sam768", 800, 768), ("fast", 640, 768)]
    only = os.environ.get("IBL_RELAX_CONFIGS")   # e.g. "baseline,fast"
    if only:
        names = {n.strip() for n in only.split(",")}
        configs = [c for c in configs if c[0] in names]
    results = []
    for label, gs, ss in configs:
        results.append(run_config(label, gs, ss, frames, boxes_px))

    base = results[0]
    print("\n=== deltas vs baseline (same weights, different serving size) ===")
    for r in results[1:]:
        n = min(len(base["boxes"]), len(r["boxes"]))
        box_l1 = (np.abs(base["boxes"][:n] - r["boxes"][:n]).mean()
                  if n else float("nan"))
        miou = mask_iou(base["masks"], r["masks"]).mean()
        print(f"{r['label']}: {r['ms']:.1f} ms vs {base['ms']:.1f} ms "
              f"({base['ms'] / r['ms']:.2f}x); top-20 box L1 {box_l1:.4f} "
              f"(normalized cxcywh); mask mIoU {miou:.3f}")


if __name__ == "__main__":
    main()
