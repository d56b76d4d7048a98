"""Frame-batching probe for the two heavy cascade stages: does stacking F
frames in one device program amortize per-op overhead / raise MXU
utilization at the reference deployment scale?

- GroundingDINO SwinB@800: true batch dim (batch=F).
- SAM ViT-H@1024, 8 box prompts/frame: vmap over frames.

Run on the tunneled chip: python -u perf/cascade_batch_probe.py
(one TPU job at a time; remote compiles take minutes — be patient.)
"""

import os
import sys
import time
import dataclasses

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from instance_based_loc_tpu.models.gdino import (GroundingDino, GDinoConfig,
                                                 make_text_masks)
from instance_based_loc_tpu.models.sam import Sam, SamConfig
from instance_based_loc_tpu.models.precision import (resolve_compute_dtype,
                                                     cast_params)


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.ravel()[0])


def bench(name, fn, n=6):
    _sync(fn(0))
    t0 = time.perf_counter()
    for i in range(1, n + 1):
        _sync(fn(i))
    dt = (time.perf_counter() - t0) / n * 1000
    print(f"{name:18s} {dt:8.1f} ms/call", flush=True)
    return dt


def main():
    cdt = resolve_compute_dtype()
    print(f"compute dtype: {np.dtype(cdt).name}", flush=True)
    print(f"devices: {jax.devices()}", flush=True)
    rng = jax.random.PRNGKey(0)
    only = sys.argv[1] if len(sys.argv) > 1 else "all"

    if only in ("all", "gdino"):
        gd_cfg = GDinoConfig(img_size=800)
        gd_cfg = dataclasses.replace(
            gd_cfg, backbone=dataclasses.replace(gd_cfg.backbone, dtype=cdt))
        gdino = GroundingDino(gd_cfg)
        ids = np.zeros((1, 16), np.int32)
        ids[0, :6] = [101, 4937, 1012, 3899, 1012, 102]
        allowed, position_ids = make_text_masks(ids)
        gd_args = (jnp.zeros((1, 800, 800, 3), cdt), jnp.asarray(ids),
                   jnp.asarray(allowed), jnp.asarray(position_ids),
                   jnp.asarray(ids != 0))
        gd_params = cast_params(gdino.init(rng, *gd_args), cdt)
        gd_apply = jax.jit(gdino.apply)
        for f in (1, 2, 4):
            gdb = tuple(jnp.concatenate([a] * f, 0) for a in gd_args)
            dt = bench(f"gdino@800 x{f}",
                       lambda i, gdb=gdb: gd_apply(gd_params, gdb[0] + i,
                                                   *gdb[1:]))
            print(f"{'':18s} {dt / f:8.1f} ms/frame amortized", flush=True)
        del gd_params

    if only in ("all", "sam"):
        sam_cfg = SamConfig()   # ViT-H
        sam = Sam(sam_cfg)
        n_boxes = 8
        sam_img = jnp.zeros((sam_cfg.img_size, sam_cfg.img_size, 3), cdt)
        sam_boxes = jnp.zeros((n_boxes, 4), jnp.float32)
        sam_params = cast_params(sam.init(rng, sam_img, sam_boxes), cdt)
        sam_apply = jax.jit(sam.apply)
        bench("sam-h@1024 x1", lambda i: sam_apply(sam_params, sam_img + i,
                                                   sam_boxes))
        vapply = jax.jit(jax.vmap(sam.apply, in_axes=(None, 0, 0)))
        for f in (2, 4):
            imgs = jnp.stack([sam_img] * f)
            boxes = jnp.stack([sam_boxes] * f)
            dt = bench(f"sam-h@1024 x{f}",
                       lambda i, imgs=imgs, boxes=boxes: vapply(
                           sam_params, imgs + i, boxes))
            print(f"{'':18s} {dt / f:8.1f} ms/frame amortized", flush=True)


if __name__ == "__main__":
    main()
