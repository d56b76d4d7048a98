"""Per-stage cascade throughput vs frames-per-program (chunk) on the chip.

The e2e metric's big win came from chunked-batched serving; the cascade
metric still runs every stage at batch 1, where GDINO@800 measured "near its
structural floor" (PERF.md) — per-query work can't amortize fixed per-program
cost. A steady-state cascade deployment batches G frames per program exactly
like localise_many does for queries. This probe measures RAM Swin-L@384,
GroundingDINO@800 and SAM ViT-H@1024 (8 boxes) at G in {1, 2, 4} to pick the
bench serving chunk.

Run on the tunneled chip: python perf/cascade_batch_probe.py
(one TPU job at a time; each (stage, G) pays a remote compile — be patient.)
"""

import os
import sys
import time
import dataclasses

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from instance_based_loc_tpu.models.ram import Ram, RamConfig
from instance_based_loc_tpu.models.gdino import (GroundingDino, GDinoConfig,
                                                 make_text_masks)
from instance_based_loc_tpu.models.sam import Sam, SamConfig
from instance_based_loc_tpu.models.precision import (resolve_compute_dtype,
                                                     cast_params)

CHUNKS = tuple(int(g) for g in
               os.environ.get("PROBE_CHUNKS", "1,2,4").split(","))
# comma list from {ram,gdino,sam}: remote compiles for all 9 (stage, G)
# programs don't fit one driver window — run one stage per invocation
STAGES = os.environ.get("PROBE_STAGES", "ram,gdino,sam").split(",")


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.ravel()[0])


def bench(name, fn, g, n_frames=8):
    """fn(i) runs one G-frame program; reports ms/frame."""
    n_calls = max(1, n_frames // g)
    try:
        _sync(fn(0))
    except Exception as e:  # RESOURCE_EXHAUSTED at big G is a result too
        print(f"{name:14s} G={g}  FAILED: {type(e).__name__}", flush=True)
        return None
    best = None
    for _ in range(2):
        t0 = time.perf_counter()
        out = None
        for i in range(1, n_calls + 1):
            out = fn(i)
        _sync(out)
        dt = (time.perf_counter() - t0) / (n_calls * g) * 1000
        best = dt if best is None else min(best, dt)
    print(f"{name:14s} G={g} {best:8.1f} ms/frame "
          f"({1000.0 / best:6.2f} fps)", flush=True)
    return best


def main():
    cdt = resolve_compute_dtype()
    print(f"compute dtype: {np.dtype(cdt).name}", flush=True)
    rng = jax.random.PRNGKey(0)

    if "ram" in STAGES:
        _ram(cdt, rng)
    if "gdino" in STAGES:
        _gdino(cdt, rng)
    if "sam" in STAGES:
        _sam(cdt, rng)


def _ram(cdt, rng):
    ram_cfg = RamConfig()
    ram_cfg = dataclasses.replace(
        ram_cfg, backbone=dataclasses.replace(ram_cfg.backbone, dtype=cdt))
    ram = Ram(ram_cfg)
    sz = ram_cfg.backbone.img_size
    ram_params = cast_params(
        ram.init(rng, jnp.zeros((1, sz, sz, 3), cdt)), cdt)
    ram_apply = jax.jit(lambda p, x: jax.nn.sigmoid(
        ram.apply(p, x).astype(jnp.float32)))
    for g in CHUNKS:
        x = jnp.zeros((g, sz, sz, 3), cdt)
        bench("ram@384", lambda i: ram_apply(ram_params, x + i), g)
    del ram_params


def _gdino(cdt, rng):
    gd_cfg = GDinoConfig(img_size=800)
    gd_cfg = dataclasses.replace(
        gd_cfg, backbone=dataclasses.replace(gd_cfg.backbone, dtype=cdt))
    gdino = GroundingDino(gd_cfg)
    gd_apply = jax.jit(gdino.apply)
    ids1 = np.zeros((1, 16), np.int32)
    ids1[0, :6] = [101, 4937, 1012, 3899, 1012, 102]
    gd_params = None
    for g in CHUNKS:
        ids = np.repeat(ids1, g, axis=0)
        allowed, position_ids = make_text_masks(ids)
        args = (jnp.zeros((g, 800, 800, 3), cdt), jnp.asarray(ids),
                jnp.asarray(allowed), jnp.asarray(position_ids),
                jnp.asarray(ids != 0))
        if gd_params is None:
            gd_params = cast_params(gdino.init(rng, *args), cdt)
        bench("gdino@800", lambda i: gd_apply(gd_params, args[0] + i,
                                              *args[1:]), g)
    del gd_params


def _sam(cdt, rng):
    sam_cfg = SamConfig()      # ViT-H, the reference deployment scale
    sam = Sam(sam_cfg)
    n_boxes = 8
    img1 = jnp.zeros((sam_cfg.img_size, sam_cfg.img_size, 3), cdt)
    boxes1 = jnp.zeros((n_boxes, 4), jnp.float32)
    sam_params = cast_params(sam.init(rng, img1, boxes1), cdt)
    sam_single = jax.jit(sam.apply)
    sam_batched = jax.jit(jax.vmap(sam.apply, in_axes=(None, 0, 0)))
    for g in CHUNKS:
        if g == 1:
            bench("sam-h@1024", lambda i: sam_single(sam_params, img1 + i,
                                                     boxes1), g)
            continue
        imgs = jnp.zeros((g, sam_cfg.img_size, sam_cfg.img_size, 3), cdt)
        boxes = jnp.zeros((g, n_boxes, 4), jnp.float32)
        bench("sam-h@1024", lambda i: sam_batched(sam_params, imgs + i,
                                                  boxes), g)


if __name__ == "__main__":
    main()
